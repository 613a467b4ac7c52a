"""Projective (visibility-discontinuity) gradients for curve occluders.

Validates the soft-curve-shadow estimator (tpu_rt/integrator/projective.py
— the TPU-native equivalent of Mitsuba's direct_projective visibility
derivatives, /root/reference/scenes/shadow_art.xml:10): jax.grad of the
soft render is compared against central finite differences of the HARD
Monte-Carlo render on an occluder translation and radius change.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tpu_rt
from tpu_rt.integrator import projective
from tpu_rt.integrator.path import render as render_xla


def _write_rod(path, x, z, r, y0=-0.8, y1=0.8, n=7):
    """Straight vertical rod (constant x, z) as a cubic B-spline control
    file (rows of `x y z r` — scene/curves.py): a spline with collinear
    control points IS the straight segment."""
    ys = np.linspace(y0, y1, n)
    rows = [f"{x:.8f} {y:.8f} {z:.8f} {r:.8f}" for y in ys]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def _rod_scene(tmp_path, dx=0.0, dr=0.0, res=64, spp=16):
    """Receiver wall at z=0 seen from an off-axis camera at (2.5, 0, 4);
    a small bright area light at (0, 0, 3); a vertical rod occluder near
    (0.25, *, 2.0).  The shadow falls at wall x ~= 0.75 (image columns
    ~15-26 of 64) while the rod itself images onto columns ~49-55 — the
    loss band (_loss_region) covers the shadow only."""
    curve_file = os.path.join(tmp_path, f"rod_{dx:.5f}_{dr:.5f}.txt")
    _write_rod(curve_file, 0.25 + dx, 2.0, 0.08 + dr)
    d = {
        "type": "scene",
        "integrator": {"type": "direct_projective"},
        "sensor": {
            "type": "perspective",
            "fov": 50,
            "to_world": tpu_rt.ScalarTransform4f().look_at(
                origin=[2.5, 0, 4], target=[0, 0, 0], up=[0, 1, 0]
            ),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "wall": {
            "type": "rectangle",
            "to_world": tpu_rt.ScalarTransform4f().scale([2.5, 2.5, 1]),
            "bsdf": {"type": "diffuse", "reflectance": 0.8 * np.ones(3)},
        },
        "light": {
            "type": "rectangle",
            # facing -z (toward the wall): rotate the +z rectangle normal
            "to_world": tpu_rt.ScalarTransform4f().translate([0, 0, 3])
            @ tpu_rt.ScalarTransform4f().rotate([0, 1, 0], 180)
            @ tpu_rt.ScalarTransform4f().scale([0.02, 0.02, 1]),
            "emitter": {"type": "area", "radiance": 4.0e4 * np.ones(3)},
        },
        "rod": {"type": "bsplinecurve", "filename": curve_file},
    }
    return tpu_rt.load_dict(d)


def _loss_region(img):
    """Mean over the image band where the shadow falls (diagnosed on the
    rendered scene: shadow spans columns ~15-26 of 64, the rod's own
    silhouette images at columns ~49-55, and columns >=56 are off-wall
    background — soft gradients only cover the shadow boundary, so the
    loss must exclude the occluder's silhouette)."""
    W = img.shape[1]
    return img[:, W // 8: W // 2, :].mean()


def test_soft_primal_matches_hard_render(tmp_path):
    """width -> 0 convergence: the soft render with a small width must be
    close to the hard render (same seed/sample pattern) everywhere, and
    the scene must actually contain a shadow in the loss region."""
    scene = _rod_scene(str(tmp_path))
    curves = projective.curve_segments(scene.geometry)
    hard = np.asarray(render_xla(scene, spp=32, seed=5, max_depth=2))
    soft = np.asarray(
        projective.render_soft(scene, curves, spp=32, seed=5, width=1e-4)
    )
    # shadow present: the darkest loss-band column is well below the mean
    W = hard.shape[1]
    band = hard[:, W // 8: W // 2, 0]
    assert band.min() < 0.25 * band.mean()
    assert np.abs(soft - hard).mean() < 0.02 * hard.mean()


@pytest.mark.slow
def test_translation_gradient_matches_fd(tmp_path):
    """jax.grad of the soft render vs central finite differences of the
    hard render on the rod's x translation (VERDICT r3 #4: <5%)."""
    scene = _rod_scene(str(tmp_path))
    curves0 = projective.curve_segments(scene.geometry)
    shadow_geom = projective.geometry_without_curves(scene.geometry)

    spp_ad, width = 512, 0.015

    @jax.jit
    def loss_soft(theta):
        shift = jnp.stack([theta, jnp.zeros_like(theta),
                           jnp.zeros_like(theta)])
        curves = dict(curves0, a=curves0["a"] + shift,
                      b=curves0["b"] + shift)
        img = projective.render_soft(scene, curves, spp=spp_ad, seed=7,
                                     width=width, shadow_geom=shadow_geom)
        return _loss_region(img)

    g_ad = float(jax.grad(loss_soft)(jnp.float32(0.0)))

    # FD of the hard renderer: scenes rebuilt at theta +- delta, common
    # random numbers (same seed -> identical sample pattern; differences
    # come only from visibility flips in the moved penumbra band).
    delta, spp_fd = 0.02, 1024

    def loss_hard(dx):
        sc = _rod_scene(str(tmp_path), dx=dx)
        return float(_loss_region(np.asarray(
            render_xla(sc, spp=spp_fd, seed=7, max_depth=2))))

    g_fd = (loss_hard(+delta) - loss_hard(-delta)) / (2 * delta)

    assert abs(g_ad) > 1e-4  # non-zero: the no-op is gone
    assert abs(g_ad - g_fd) / max(abs(g_fd), 1e-9) < 0.05, (g_ad, g_fd)


@pytest.mark.slow
def test_radius_gradient_matches_fd(tmp_path):
    """Same validation for the swept radius (shadow grows with r: the
    shadow-region loss must DECREASE, and match FD of the hard render)."""
    scene = _rod_scene(str(tmp_path))
    curves0 = projective.curve_segments(scene.geometry)
    shadow_geom = projective.geometry_without_curves(scene.geometry)

    @jax.jit
    def loss_soft(dr):
        curves = dict(curves0, r0=curves0["r0"] + dr,
                      r1=curves0["r1"] + dr)
        img = projective.render_soft(scene, curves, spp=512, seed=7,
                                     width=0.015, shadow_geom=shadow_geom)
        return _loss_region(img)

    g_ad = float(jax.grad(loss_soft)(jnp.float32(0.0)))

    delta = 0.015

    def loss_hard(dr):
        sc = _rod_scene(str(tmp_path), dr=dr)
        return float(_loss_region(np.asarray(
            render_xla(sc, spp=1024, seed=7, max_depth=2))))

    g_fd = (loss_hard(+delta) - loss_hard(-delta)) / (2 * delta)

    assert g_ad < 0  # bigger rod -> darker shadow region
    assert abs(g_ad - g_fd) / max(abs(g_fd), 1e-9) < 0.05, (g_ad, g_fd)


def test_shadow_art_gradient_nonzero(ref_scenes):
    """The real shadow_art.xml curve: translation gradients through the
    soft estimator are finite and non-zero (reference
    scenes/shadow_art.xml:60-62)."""
    scene = tpu_rt.load_file(
        os.path.join(ref_scenes, "shadow_art.xml"), resx=64, resy=32
    )
    curves0 = projective.curve_segments(scene.geometry)
    shadow_geom = projective.geometry_without_curves(scene.geometry)

    def loss(theta):
        shift = jnp.stack([theta, jnp.zeros_like(theta),
                           jnp.zeros_like(theta)])
        curves = dict(curves0, a=curves0["a"] + shift,
                      b=curves0["b"] + shift)
        img = projective.render_soft(scene, curves, spp=4, seed=1,
                                     width=0.02,
                                     shadow_geom=shadow_geom)
        return img.mean()

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    assert np.isfinite(g) and abs(g) > 0.0
