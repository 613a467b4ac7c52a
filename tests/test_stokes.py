"""Polarized transport tests: Mueller algebra closed forms (Malus's law,
Fresnel), renderer-level polarizer behavior, and Stokes-I parity with the
scalar path tracer (cbox_pol.xml conformance, SURVEY.md §7 step 6)."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpu_rt
from tpu_rt.bsdf import mueller as mu
from tpu_rt.integrator.path import render
from tpu_rt.integrator.stokes import render_stokes


def test_malus_law_mueller():
    S0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    for delta_deg in (0.0, 30.0, 45.0, 60.0, 90.0):
        d = np.deg2rad(delta_deg)
        S = mu.linear_polarizer(jnp.asarray(d)) @ (mu.linear_polarizer(jnp.asarray(0.0)) @ S0)
        np.testing.assert_allclose(float(S[0]), 0.5 * np.cos(d) ** 2, atol=1e-6)


def test_rotator_group():
    R1 = mu.rotator(jnp.asarray(0.7))
    R2 = mu.rotator(jnp.asarray(-0.7))
    np.testing.assert_allclose(np.asarray(R1 @ R2), np.eye(4), atol=1e-6)
    # composition
    R3 = mu.rotator(jnp.asarray(0.3)) @ mu.rotator(jnp.asarray(0.4))
    np.testing.assert_allclose(np.asarray(R3), np.asarray(R1), atol=1e-6)


def test_fresnel_mueller_normal_incidence():
    M = np.asarray(mu.specular_reflection(jnp.asarray(1.0), jnp.asarray(1.5)))
    F0 = ((1.5 - 1) / (1.5 + 1)) ** 2
    np.testing.assert_allclose(M[0, 0], F0, rtol=1e-5)
    np.testing.assert_allclose(M[1, 1], F0, rtol=1e-5)
    np.testing.assert_allclose(M[0, 1], 0.0, atol=1e-7)


def test_fresnel_mueller_brewster_fully_polarized():
    """At Brewster's angle, dielectric reflection is fully polarized:
    Rp = 0 so M00 == |M01|."""
    brewster = np.arctan(1.5)
    M = np.asarray(mu.specular_reflection(jnp.asarray(np.cos(brewster)), jnp.asarray(1.5)))
    assert M[0, 0] > 0
    np.testing.assert_allclose(abs(M[0, 1]) / M[0, 0], 1.0, rtol=1e-3)


def _polarizer_scene(angles_deg, z_positions, res=16, theta_props=None):
    d = {
        "type": "scene",
        "integrator": {"type": "stokes"},
        "sensor": {
            "type": "perspective",
            "fov": 30,
            "to_world": tpu_rt.ScalarTransform4f().look_at(
                origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]
            ),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16},
        },
        "env": {"type": "constant", "radiance": np.ones(3)},
    }
    for i, (ang, z) in enumerate(zip(angles_deg, z_positions)):
        bsdf = {"type": "polarizer"}
        if theta_props is not None:
            bsdf["theta"] = theta_props[i]
        d[f"pol{i}"] = {
            "type": "rectangle",
            "to_world": tpu_rt.ScalarTransform4f().translate([0, 0, z])
            @ tpu_rt.ScalarTransform4f().rotate([0, 0, 1], ang)
            @ tpu_rt.ScalarTransform4f().scale([3.0, 3.0, 1.0]),
            "bsdf": bsdf,
        }
    return tpu_rt.load_dict(d)


def test_single_polarizer_halves_and_polarizes():
    scene = _polarizer_scene([0.0], [0.0])
    S = np.asarray(render_stokes(scene, spp=16))
    center = S[6:10, 6:10]  # through the sheet
    I = center[..., 0, :].mean()
    dop = np.sqrt(
        center[..., 1, :].mean() ** 2
        + center[..., 2, :].mean() ** 2
        + center[..., 3, :].mean() ** 2
    ) / max(I, 1e-9)
    np.testing.assert_allclose(I, 0.5, atol=0.03)
    assert dop > 0.95, f"transmitted light not fully polarized (DOP={dop})"


@pytest.mark.parametrize("delta", [0.0, 45.0, 90.0])
def test_two_polarizers_malus(delta):
    scene = _polarizer_scene([0.0, delta], [0.5, 0.0])
    S = np.asarray(render_stokes(scene, spp=16))
    I = S[6:10, 6:10, 0, :].mean()
    expected = 0.5 * np.cos(np.deg2rad(delta)) ** 2
    np.testing.assert_allclose(I, expected, atol=0.04)


def test_theta_prop_rotates_axis():
    """BSDF theta property must act like a geometric rotation
    (polarizers.xml:36-39 sets theta via spectrum)."""
    geo = _polarizer_scene([0.0, 60.0], [0.5, 0.0])
    via_theta = _polarizer_scene([0.0, 0.0], [0.5, 0.0], theta_props=[0.0, 60.0])
    Ig = np.asarray(render_stokes(geo, spp=16))[6:10, 6:10, 0, :].mean()
    It = np.asarray(render_stokes(via_theta, spp=16))[6:10, 6:10, 0, :].mean()
    np.testing.assert_allclose(Ig, It, atol=0.04)


def test_cbox_pol_stokes_output(ref_scenes):
    import os

    scene = tpu_rt.load_file(os.path.join(ref_scenes, "cbox_pol.xml"), spp=4, res=24)
    S = np.asarray(render_stokes(scene, spp=4, seed=0))
    assert S.shape == (24, 24, 4, 3)
    assert np.isfinite(S).all()
    I = S[..., 0, :]
    img = np.asarray(render(scene, spp=4, seed=0))
    # Stokes-I equals the unpolarized render by construction (M00-normalized
    # Mueller chain); small diff allowed for RR decision divergence.
    assert np.abs(I - img).mean() / max(img.mean(), 1e-9) < 0.05
    # Polarization by reflection: conductor/glass spheres produce nonzero Q/U.
    assert np.sqrt((S[..., 1, :] ** 2).mean()) > 0.01
    assert np.sqrt((S[..., 2, :] ** 2).mean()) > 0.01


def test_polarizers_scene_renders(ref_scenes):
    import os

    scene = tpu_rt.load_file(os.path.join(ref_scenes, "polarizers.xml"), spp=4, res=24)
    S = np.asarray(render_stokes(scene, spp=4))
    assert np.isfinite(S).all()
    assert S[..., 0, :].mean() > 0.01  # envmap light gets through
    assert np.sqrt((S[..., 1, :] ** 2).mean()) > 0.01  # polarized by sheets
