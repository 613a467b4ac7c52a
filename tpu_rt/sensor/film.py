"""Film accumulation with reconstruction filters (box / tent / gaussian).

TPU-native replacement for Mitsuba's hdrfilm + rfilter splatting
(scenes/cbox.xml:25-31 tent, simple.xml box, cbox_pol.xml gaussian —
SURVEY.md §2b sensor/film row).  Samples scatter-add into (H, W, C) value
and weight planes; ``develop`` normalizes.  Scatter-add is XLA's native
associative accumulation — race-free by construction on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_rt.scene.types import FILTER_BOX, FILTER_GAUSSIAN, FILTER_TENT

_FOOTPRINT = {FILTER_BOX: 1, FILTER_TENT: 2, FILTER_GAUSSIAN: 4}


def filter_weight(filter_type: int, x):
    """1-D filter kernel (separable), x = distance in pixels."""
    ax = jnp.abs(x)
    if filter_type == FILTER_BOX:
        return (ax <= 0.5).astype(jnp.float32)
    if filter_type == FILTER_TENT:
        return jnp.maximum(0.0, 1.0 - ax)
    # Mitsuba gaussian: stddev 0.5, radius 2, offset subtracted
    sigma = 0.5
    r = 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2) - jnp.exp(-0.5 * (r / sigma) ** 2)
    return jnp.maximum(0.0, g) * (ax <= r)


def splat(film_vals, film_wts, film_xy, values, active, filter_type: int):
    """Scatter-add samples into the film.

    Args:
      film_vals: [H, W, C]; film_wts: [H, W].
      film_xy: [N, 2] continuous film position (pixel units).
      values: [N, C] sample values.
      active: [N] bool.
      filter_type: static filter enum.
    Returns updated (film_vals, film_wts).
    """
    H, W = film_wts.shape
    k = _FOOTPRINT[filter_type]
    # Discrete coordinates of the top-left pixel of the footprint.
    x, y = film_xy[..., 0], film_xy[..., 1]
    base_x = jnp.floor(x - 0.5 * (k - 1) - 0.5 + 0.5).astype(jnp.int32)
    base_y = jnp.floor(y - 0.5 * (k - 1) - 0.5 + 0.5).astype(jnp.int32)
    for dy in range(k):
        py = base_y + dy
        wy = filter_weight(filter_type, (py.astype(jnp.float32) + 0.5) - y)
        for dx in range(k):
            px = base_x + dx
            wx = filter_weight(filter_type, (px.astype(jnp.float32) + 0.5) - x)
            w = wx * wy
            ok = active & (px >= 0) & (px < W) & (py >= 0) & (py < H) & (w > 0)
            w = jnp.where(ok, w, 0.0)
            idx = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
            film_vals = film_vals.reshape(H * W, -1).at[idx].add(
                w[..., None] * values, mode="drop"
            ).reshape(H, W, -1)
            film_wts = film_wts.reshape(H * W).at[idx].add(w, mode="drop").reshape(H, W)
    return film_vals, film_wts


def develop(film_vals, film_wts):
    """Normalize accumulated samples by filter weights."""
    return film_vals / jnp.maximum(film_wts[..., None], 1e-12)
