"""End-to-end smoke: every reference scene loads AND renders through the
public dispatch (the full fidelity-contract loop, SURVEY.md §7)."""

import os

import numpy as np
import pytest

import tpu_rt


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("cbox.xml", dict(spp=2, res=16)),
        ("cbox_pol.xml", dict(spp=2, res=16)),
        ("simple.xml", dict(spp=2, res=16)),
        ("polarizers.xml", dict(spp=2, res=16)),
        ("shadow_art.xml", dict(resx=16, resy=8)),
    ],
)
def test_optical_scene_renders(ref_scenes, name, kwargs):
    scene = tpu_rt.load_file(os.path.join(ref_scenes, name), **kwargs)
    img = np.asarray(tpu_rt.render(scene, spp=2))
    assert np.isfinite(img).all()
    assert img.shape[0] > 0 and img.max() >= 0.0


@pytest.mark.parametrize(
    "name",
    ["Sphere_Box", "Sphere_Floating", "Cone_Box", "Cone_FLoating",
     "Plate_Box", "Plane_Floating"],
)
def test_ultrasound_scene_renders(ref_us_scenes, name):
    scene = tpu_rt.load_file(os.path.join(ref_us_scenes, f"{name}.xml"))
    img = np.asarray(
        tpu_rt.render(scene, x_bounds=(-0.01, 0.01), z_bounds=(0.005, 0.03))
    )
    assert np.isfinite(img).all()
    assert img.shape[0] > 0
