"""Ultrasound megakernel (ops/pallas_us) vs the XLA acquisition integrator.

The kernel fuses the reference's acquisition bounce loop
(/root/reference/CustomIntegrator.py:60-232) into one Pallas program with
per-bounce (pressure, time, receive-element) outputs + one XLA scatter.
Different RNG streams, so agreement is statistical.  Interpret mode on CPU.
"""

import numpy as np
import pytest

import tpu_rt
from tpu_rt.integrator.ultrasound import simulate_acquisition
from tpu_rt.ops.pallas_us import bake_us_scene, simulate_acquisition_pallas


@pytest.mark.parametrize(
    "name", ["Sphere_Floating", "Cone_FLoating", "Plane_Floating"]
)
def test_us_kernel_matches_xla(ref_us_scenes, name):
    import os

    scene = tpu_rt.load_file(os.path.join(ref_us_scenes, f"{name}.xml"))
    bs = bake_us_scene(scene)
    assert bs is not None, "reference US scene must be in kernel scope"

    ch_x, tx_x = simulate_acquisition(scene, seed=0, rays_per_pair=8)
    ch_p, tx_p = simulate_acquisition_pallas(
        scene, seed=0, rays_per_pair=8, interpret=True
    )
    ch_x = np.asarray(ch_x)
    ch_p = np.asarray(ch_p)
    np.testing.assert_allclose(np.asarray(tx_x), np.asarray(tx_p), atol=1e-9)

    ex, ep = np.abs(ch_x).sum(), np.abs(ch_p).sum()
    assert ex > 0 and ep > 0
    # total deposited |pressure| agrees within MC noise
    assert abs(ep - ex) / ex < 0.10

    # first echo lands within a few samples (geometry/time law identical)
    fx = np.nonzero(np.abs(ch_x).sum(axis=(0, 1)))[0].min()
    fp = np.nonzero(np.abs(ch_p).sum(axis=(0, 1)))[0].min()
    assert abs(int(fx) - int(fp)) <= 16

    # axial energy profiles correlate strongly
    ax = np.abs(ch_x).sum(axis=(0, 1))
    ap = np.abs(ch_p).sum(axis=(0, 1))
    corr = np.corrcoef(ax, ap)[0, 1]
    assert corr > 0.6, corr


def test_us_kernel_scope_guard():
    """Optical scenes (non-ultrasound BSDFs) are out of scope."""
    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=16, spp=1)
    assert bake_us_scene(scene) is None
    with pytest.raises(ValueError):
        simulate_acquisition_pallas(scene, interpret=True)
