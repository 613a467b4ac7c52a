"""Perspective camera ray generation (TPU equivalent of Mitsuba's
perspective sensor used by the optical scenes, cf. scenes/cbox.xml:11-32).

Convention checks (tests/test_render_optical.py): with Mitsuba's look_at
(X = cross(up, dir) = "left"), film u (left->right) increases along
+X_camera, film v (top->bottom) decreases along +Y_camera, so the cbox red
wall (world x=+1, cbox_redwall.obj) lands on the image left.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_rt.core.math import normalize, transform_point, transform_vector
from tpu_rt.scene.types import Camera


def sample_ray(cam: Camera, film_xy):
    """Generate world-space camera rays.

    Args:
      cam: Camera.
      film_xy: [N, 2] continuous film positions in pixels ([0,W) x [0,H),
        (0,0) = top-left).
    Returns (o [N,3], d [N,3]).
    """
    u = film_xy[..., 0] / cam.width
    v = film_xy[..., 1] / cam.height
    d_cam = jnp.stack(
        [
            (2.0 * u - 1.0) * cam.tan_fov_x,
            (1.0 - 2.0 * v) * cam.tan_fov_y,
            jnp.ones_like(u),
        ],
        axis=-1,
    )
    d = normalize(transform_vector(cam.to_world, d_cam))
    o = jnp.broadcast_to(cam.to_world[:3, 3], d.shape)
    return o, d
