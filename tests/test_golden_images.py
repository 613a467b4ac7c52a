"""Golden-image RMSE tests: tpu_rt vs the independent NumPy reference
renderer (tests/golden_reference.py) on controlled direct-illumination
scenes — the cross-implementation check demanded by SURVEY.md §4/§7
(BASELINE config 1 class: CPU-runnable direct illumination)."""

import numpy as np
import pytest

import tpu_rt
from tpu_rt.integrator.path import render

from golden_reference import Quad, Sphere, render_direct_aa


def _rel_rmse(a, b):
    return np.sqrt(((a - b) ** 2).mean()) / max(b.mean(), 1e-9)


def test_point_light_sphere_on_floor():
    """Sphere on a floor quad lit by a point light: depth-2 path render must
    match the analytic direct-illumination reference within MC noise."""
    albedo_s = [0.6, 0.3, 0.2]
    albedo_f = [0.5, 0.5, 0.5]
    light_pos = [2.0, 3.0, -2.0]
    light_int = [30.0, 30.0, 30.0]
    res = 48

    scene = tpu_rt.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "direct"},
            "sensor": {
                "type": "perspective",
                "fov": 45,
                "to_world": tpu_rt.ScalarTransform4f().look_at(
                    origin=[0, 1.0, -5.0], target=[0, 0.5, 0], up=[0, 1, 0]
                ),
                "film": {"type": "hdrfilm", "width": res, "height": res,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 64},
            },
            "ball": {
                "type": "sphere",
                "center": np.asarray([0.0, 0.5, 0.0]),
                "radius": 0.5,
                "bsdf": {"type": "diffuse", "reflectance": np.asarray(albedo_s)},
            },
            "floor": {
                "type": "rectangle",
                # rectangle is [-1,1]^2 at z=0 with +z normal; rotate to y-up
                "to_world": tpu_rt.ScalarTransform4f().translate([0, 0, 0])
                @ tpu_rt.ScalarTransform4f().rotate([1, 0, 0], -90)
                @ tpu_rt.ScalarTransform4f().scale([4.0, 4.0, 1.0]),
                "bsdf": {"type": "diffuse", "reflectance": np.asarray(albedo_f)},
            },
            "light": {"type": "point", "position": np.asarray(light_pos),
                      "intensity": np.asarray(light_int)},
        }
    )
    img = np.asarray(render(scene, spp=64))

    golden = render_direct_aa(
        shapes=[
            Sphere([0, 0.5, 0], 0.5, albedo_s),
            Quad([-4, 0, -4], [8, 0, 0], [0, 0, 8], albedo_f),
        ],
        point_lights=[(light_pos, light_int)],
        width=res, height=res,
        cam_origin=[0, 1.0, -5.0], cam_target=[0, 0.5, 0], cam_up=[0, 1, 0],
        fov_deg=45,
    )
    err = _rel_rmse(img, golden)
    assert err < 0.02, f"relative RMSE vs golden reference = {err:.4f}"


def test_area_light_noise_free_regions():
    """Quad area light over a floor: MC render vs grid-integrated reference
    (checks NEE area sampling, one-sided emission, emitter visibility)."""
    res = 40
    rad = [8.0, 6.0, 4.0]
    scene = tpu_rt.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "direct"},
            "sensor": {
                "type": "perspective",
                "fov": 50,
                "to_world": tpu_rt.ScalarTransform4f().look_at(
                    origin=[0, 2.0, -4.0], target=[0, 0, 0], up=[0, 1, 0]
                ),
                "film": {"type": "hdrfilm", "width": res, "height": res,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 128},
            },
            "floor": {
                "type": "rectangle",
                "to_world": tpu_rt.ScalarTransform4f().rotate([1, 0, 0], -90)
                @ tpu_rt.ScalarTransform4f().scale([3.0, 3.0, 1.0]),
                "bsdf": {"type": "diffuse", "reflectance": np.full(3, 0.7)},
            },
            "lamp": {
                "type": "rectangle",
                # emits along its +z normal; rotate so it faces down (-y up
                # direction: +z -> -y means rotate +90 about x)
                "to_world": tpu_rt.ScalarTransform4f().translate([0, 2.0, 0])
                @ tpu_rt.ScalarTransform4f().rotate([1, 0, 0], 90)
                @ tpu_rt.ScalarTransform4f().scale([0.5, 0.5, 1.0]),
                "bsdf": {"type": "diffuse", "reflectance": np.zeros(3)},
                "emitter": {"type": "area", "radiance": np.asarray(rad)},
            },
        }
    )
    img = np.asarray(render(scene, spp=128))

    # golden: the lamp quad faces -y. corner/e1/e2 chosen so n = -y.
    lamp = Quad([-0.5, 2.0, -0.5], [1.0, 0, 0], [0, 0, 1.0], np.zeros(3), emission=rad)
    assert np.allclose(lamp.n, [0, -1, 0])
    golden = render_direct_aa(
        shapes=[
            Quad([-3, 0, -3], [6, 0, 0], [0, 0, 6], np.full(3, 0.7)),
            lamp,
        ],
        point_lights=[],
        width=res, height=res,
        cam_origin=[0, 2.0, -4.0], cam_target=[0, 0, 0], cam_up=[0, 1, 0],
        fov_deg=50, light_grid=12,
    )
    err = _rel_rmse(img, golden)
    assert err < 0.03, f"relative RMSE vs golden reference = {err:.4f}"


def test_cbox_full_gi_vs_independent_golden():
    """Full-GI cbox against the committed INDEPENDENT golden
    (tests/golden/cbox_128_gi_independent.npy: standalone NumPy path tracer,
    8192 spp, box filter — provenance in the sibling .json).  This is the
    fidelity-contract check (SURVEY §7: cbox within 1% RMSE) running in the
    suite rather than only in bench.py."""
    import os

    import tpu_rt
    from tpu_rt.integrator.path import render

    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "cbox_128_gi_independent.npy")
    golden = np.load(golden_path)  # (128, 128, 3)

    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=64, spp=1)
    scene = scene.replace(camera=scene.camera.replace(filter_type=0))
    img = np.asarray(render(scene, spp=768, seed=11, spp_per_pass=64))

    # block-average both to 16x16 so per-pixel MC noise (golden ~8k spp,
    # render 768 spp) divides out and the comparison measures transport bias
    g16 = golden.reshape(16, 8, 16, 8, 3).mean(axis=(1, 3))
    i16 = img.reshape(16, 4, 16, 4, 3).mean(axis=(1, 3))
    rel = np.sqrt(((i16 - g16) ** 2).mean()) / g16.mean()
    # 768 spp at 64^2 leaves ~1.5-2% of MC noise in 16x16 blocks; the
    # tighter 0.54% bias figure comes from bench.py's 2048-spp TPU render
    assert rel < 0.025, f"block rel-RMSE {rel:.4f} vs independent golden"
