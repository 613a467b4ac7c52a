"""End-to-end ultrasound pipeline: acquisition -> DAS -> B-mode.

Mirrors /root/reference/USMain.py us_render (:92-252): simulate the
acquisition, beamform over a lambda/4 grid spanning x in [-4, 4] cm and
z in [0.1, 50] mm (:182-199), envelope-detect and 60 dB log-compress
(:213-219).  Returns the display image (depth down) plus the raw buffers.
"""

from __future__ import annotations

import weakref

import jax
import jax.numpy as jnp

from tpu_rt.integrator.ultrasound import simulate_acquisition
from tpu_rt.scene.types import Scene
from tpu_rt.us.beamform import bmode_pipeline, grid_scan


def us_render(scene: Scene, seed=0, rays_per_pair=1, visualize=False,
              x_bounds=(-0.04, 0.04), z_bounds=(0.001, 0.05),
              dynamic_range=60.0, use_pallas=False, _forward_only=False):
    """Returns (display_image [Nz, Nx], channel_buf, tx_delays).

    ``use_pallas`` routes the acquisition through the Pallas megakernel
    (ops/pallas_us.py, ~6-16x faster on chip) when the scene is in its
    scope.  Differentiable either way: the kernel route pairs its primal
    with the XLA path's VJP (simulate_acquisition_fastgrad).
    ``_forward_only`` skips the custom_vjp wrapper (its primitive would
    lift the closure-captured scene to tracers under an outer jit,
    breaking bake_us_scene's concrete scope checks) — us_render_fast's
    route, forward values identical."""
    us = scene.ultrasound
    if use_pallas:
        from tpu_rt.ops.pallas_us import (
            bake_us_scene,
            simulate_acquisition_fastgrad,
            simulate_acquisition_pallas,
        )

        if bake_us_scene(scene) is not None:
            # Mosaic kernels only run on TPU; interpret elsewhere (CPU CI).
            interpret = jax.default_backend() != "tpu"
            acq = (simulate_acquisition_pallas if _forward_only
                   else simulate_acquisition_fastgrad)
            channel_buf, tx = acq(
                scene, seed, rays_per_pair, interpret=interpret
            )
        else:
            channel_buf, tx = simulate_acquisition(
                scene, seed=seed, rays_per_pair=rays_per_pair
            )
    else:
        channel_buf, tx = simulate_acquisition(scene, seed=seed, rays_per_pair=rays_per_pair)

    c = float(us.sound_speed)
    fc = float(us.frequency)
    wavelength = c / fc
    step = wavelength / 4.0
    x_grid, z_grid = grid_scan(x_bounds[0], x_bounds[1], z_bounds[0], z_bounds[1], step, step)

    # True element (x, z) positions — a convex probe's arc geometry flows
    # into the rx delays (reference convex geometry: CustomEmmitter.py:41-47).
    from tpu_rt.sensor.transducer import element_geometry

    pos, _ = element_geometry(us.n_elements, us.pitch, us.radius,
                              us.opening_angle)
    img = bmode_pipeline(
        channel_buf, us.angles, pos[:, 0], us.sampling_rate, us.sound_speed,
        x_grid, z_grid, dynamic_range, elem_z=pos[:, 2],
    )
    if visualize:
        _show(img, x_grid, z_grid)
    return img, channel_buf, tx


def us_render_jit(scene: Scene, seed=0, rays_per_pair=1):
    """jit-compiled forward (scene params stay traceable for jax.grad)."""

    @jax.jit
    def fwd(sc):
        img, ch, tx = us_render(sc, seed=seed, rays_per_pair=rays_per_pair)
        return img

    return fwd(scene)


# One jitted closure per (scene object, config): the scene is captured
# CONCRETE (host-side float()s / bake_us_scene / DAS window autosizing all
# see real arrays), only the seed is traced.  Mirrors the optical path's
# _RENDER_FN_CACHE (ops/pallas_path.py) — rebuilding a jitted closure per
# call retraces the whole pipeline, and running it eager dispatches every
# op over the ~35 ms-latency tunnel (measured 8.3 s/frame for the USMain
# config vs ~0.27 s through this cache).  Keyed by id(scene) and guarded
# by a weakref identity check so a GC'd id can never serve a stale scene.
_US_RENDER_CACHE = {}


def us_render_fast(scene: Scene, seed=0, rays_per_pair=1,
                   x_bounds=(-0.04, 0.04), z_bounds=(0.001, 0.05),
                   dynamic_range=60.0, use_pallas=True):
    """us_render through one cached jitted dispatch (repeat-render path).

    Same outputs as ``us_render``; use this for frame loops / benchmarks.
    For gradients through scene parameters use ``us_render`` (eager,
    traceable) or ``us_render_jit``.
    """
    key = (id(scene), rays_per_pair, use_pallas, x_bounds, z_bounds,
           float(dynamic_range))
    entry = _US_RENDER_CACHE.get(key)
    fn = None
    if entry is not None:
        ref, cached = entry
        if ref() is scene:
            fn = cached
    if fn is None:
        @jax.jit
        def fn(seed_):
            return us_render(
                scene, seed=seed_, rays_per_pair=rays_per_pair,
                x_bounds=x_bounds, z_bounds=z_bounds,
                dynamic_range=dynamic_range, use_pallas=use_pallas,
                _forward_only=True,
            )

        _US_RENDER_CACHE[key] = (weakref.ref(scene), fn)
    return fn(jnp.int32(seed))


def _show(img, x_grid, z_grid):  # pragma: no cover - display helper
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    plt.figure(figsize=(10, 8))
    extent = [
        float(x_grid[0]) * 1e3,
        float(x_grid[-1]) * 1e3,
        float(z_grid[-1]) * 1e3,
        float(z_grid[0]) * 1e3,
    ]
    plt.imshow(np.asarray(img), extent=extent, cmap="gray", origin="upper",
               vmin=0, vmax=1)
    plt.xlabel("Lateral (mm)")
    plt.ylabel("Axial/Depth (mm)")
    plt.title("Simulated Ultrasound B-mode Image")
    plt.colorbar(label="Relative Echo Intensity (Normalized)")
    plt.gca().invert_yaxis()
    plt.tight_layout()
    plt.savefig("/tmp/bmode.png", dpi=100)
    plt.close()
