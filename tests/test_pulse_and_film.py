"""Pulse-model (UltraRay Eq. 14) and film-splat equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_rt
from tpu_rt.sensor import film as fm
from tpu_rt.us.beamform import apply_pulse, hilbert_envelope, pulse_kernel


@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_splat_aligned_matches_scatter(filter_type):
    """The dense shifted-add splat must equal the scatter splat exactly for
    the pixel-aligned sample pattern."""
    H = W = 17
    key = jax.random.PRNGKey(0)
    jit2 = jax.random.uniform(key, (H, W, 2))
    vals = jax.random.normal(jax.random.fold_in(key, 1), (H, W, 3))
    act = jax.random.uniform(jax.random.fold_in(key, 2), (H, W)) > 0.2
    xy_int = jnp.stack(
        jnp.meshgrid(jnp.arange(W), jnp.arange(H), indexing="xy"), -1
    ).astype(jnp.float32)
    fv1, fw1 = fm.splat(
        jnp.zeros((H, W, 3)), jnp.zeros((H, W)),
        (xy_int + jit2).reshape(-1, 2), vals.reshape(-1, 3), act.reshape(-1),
        filter_type,
    )
    fv2, fw2 = fm.splat_aligned(
        jnp.zeros((H, W, 3)), jnp.zeros((H, W)), jit2, vals, act, filter_type
    )
    np.testing.assert_allclose(np.asarray(fv1), np.asarray(fv2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fw1), np.asarray(fw2), atol=1e-5)


def test_pulse_kernel_shape():
    fs, f0, cycles = 50e6, 5e6, 5
    k = np.asarray(pulse_kernel(fs, f0, cycles))
    assert k.shape[0] % 2 == 1
    # duration ~ cycles / f0 -> cycles * fs/f0 samples
    assert abs(k.shape[0] - cycles * fs / f0) <= 2
    # odd symmetry of sin * even gaussian
    np.testing.assert_allclose(k, -k[::-1], atol=1e-6)
    # contains ~`cycles` zero crossings pairs
    crossings = np.sum(np.abs(np.diff(np.sign(k[np.abs(k) > 1e-12]))) > 0)
    assert cycles <= crossings <= 2 * cycles + 2


def test_apply_pulse_impulse_response():
    """Convolving a unit impulse reproduces the pulse at the impulse time,
    and the envelope peaks there."""
    fs, f0, cycles = 50e6, 5e6, 5
    T = 1024
    t0 = 400
    ch = jnp.zeros((1, 1, T)).at[0, 0, t0].set(1.0)
    y = np.asarray(apply_pulse(ch, fs, f0, cycles))
    assert y.shape == (1, 1, T)
    env = np.asarray(hilbert_envelope(jnp.asarray(y), axis=-1))[0, 0]
    assert abs(int(np.argmax(env)) - t0) <= 2
    k = np.asarray(pulse_kernel(fs, f0, cycles))
    n = len(k)
    np.testing.assert_allclose(
        y[0, 0, t0 - n // 2 : t0 + n // 2 + 1], k, atol=1e-4
    )


def test_acquisition_pulse_mode():
    """deposit_sin=False + apply_pulse produces echoes with ~wave_cycles
    oscillations around the arrival time."""
    from tpu_rt.integrator.ultrasound import simulate_acquisition

    z0 = 0.015
    scene = tpu_rt.load_dict(
        {
            "type": "scene",
            "integrator": {
                "type": "ultrasound_integrator",
                "max_depth": 1,
                "n_elements": 8,
                "time_samples": 1600,
                "pitch": 0.0004,
                "frequency": 5e6,
                "sampling_rate": 50e6,
                "attenuation": 0.0,
                "wave_cycles": 4,
                "angles": np.asarray([0.0], np.float32),
            },
            "sensor": {
                "type": "ultrasound_sensor",
                "num_elements_lateral": 8,
                "pitch": 0.0004,
                "radius": float("inf"),
                "to_world": tpu_rt.ScalarTransform4f(),
            },
            "plate": {
                "type": "rectangle",
                "to_world": tpu_rt.ScalarTransform4f().translate([0, 0, z0])
                @ tpu_rt.ScalarTransform4f().rotate([0, 1, 0], 180)
                @ tpu_rt.ScalarTransform4f().scale([0.02, 0.02, 1]),
                "bsdf": {"type": "ultrasound_bsdf", "impedance": 7.8, "roughness": 0.01},
            },
        }
    )
    ch, _ = simulate_acquisition(scene, seed=0, deposit_sin=False)
    us = scene.ultrasound
    rf = np.asarray(apply_pulse(ch, us.sampling_rate, us.frequency, us.wave_cycles))
    sig = rf[0].sum(axis=0)
    assert np.abs(sig).sum() > 0
    t_expect = 2 * z0 / 1540.0 * 50e6
    peak = int(np.argmax(np.abs(sig)))
    assert abs(peak - t_expect) < 30
    # oscillatory: several sign changes near the peak
    win = sig[peak - 30 : peak + 30]
    sign_changes = np.sum(np.abs(np.diff(np.sign(win[np.abs(win) > 1e-9]))) > 0)
    assert sign_changes >= 4
