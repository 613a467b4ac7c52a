"""Checkpoint/resume and observability tests (SURVEY.md §5 aux subsystems)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import tpu_rt
from tpu_rt.integrator.path import path_trace
from tpu_rt.sensor import camera as cam


def _simple_scene():
    return tpu_rt.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 4},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": tpu_rt.ScalarTransform4f().look_at(
                    origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]
                ),
                "film": {"type": "hdrfilm", "width": 8, "height": 8,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 2},
            },
            "s": {"type": "sphere", "bsdf": {"type": "diffuse"}},
            "env": {"type": "constant", "radiance": np.ones(3)},
        }
    )


def test_checkpoint_roundtrip():
    from tpu_rt.opt.checkpoint import load_checkpoint, save_checkpoint

    params = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(3.0)}
    opt_state = (jnp.zeros(2), {"m": jnp.ones(3)})
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ck.pkl")
        save_checkpoint(p, params, opt_state, [0.5, 0.4], 7)
        params2, opt2, losses, it = load_checkpoint(p)
        np.testing.assert_allclose(np.asarray(params2["a"]), [1.0, 2.0])
        np.testing.assert_allclose(np.asarray(opt2[1]["m"]), np.ones(3))
        assert losses == [0.5, 0.4] and it == 7
        assert load_checkpoint(p + ".nope") is None


def test_optimize_resumes_from_checkpoint():
    from tpu_rt.integrator.ultrasound import simulate_acquisition
    from tpu_rt.opt.inverse import get_param, optimize, set_param

    scene = tpu_rt.load_dict(
        {
            "type": "scene",
            "integrator": {
                "type": "ultrasound_integrator",
                "max_depth": 1, "n_elements": 8, "time_samples": 400,
                "pitch": 0.0005, "angles": np.asarray([0.0], np.float32),
            },
            "sensor": {
                "type": "ultrasound_sensor", "num_elements_lateral": 8,
                "pitch": 0.0005, "radius": float("inf"),
                "to_world": tpu_rt.ScalarTransform4f(),
            },
            "plate": {
                "type": "rectangle",
                "to_world": tpu_rt.ScalarTransform4f().translate([0, 0, 0.005])
                @ tpu_rt.ScalarTransform4f().rotate([0, 1, 0], 180)
                @ tpu_rt.ScalarTransform4f().scale([0.01, 0.01, 1]),
                "bsdf": {"type": "ultrasound_bsdf", "impedance": 3.0, "roughness": 0.3},
            },
        }
    )
    key = "plate.bsdf.impedance"
    target = set_param(scene, key, 6.0)
    ch_t, _ = simulate_acquisition(target, seed=0)

    def loss_fn(sc):
        ch, _ = simulate_acquisition(sc, seed=0)
        return jnp.mean((ch - ch_t) ** 2) * 1e6

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "opt.ckpt")
        # run 6 iters with checkpointing every 3
        _, losses1 = optimize(scene, [key], loss_fn, n_iters=6, lr=0.2,
                              bounds=(1.0, 10.0), checkpoint_path=p,
                              checkpoint_every=3)
        assert os.path.exists(p)
        # resume to 10 iters: must continue, not restart (losses extend)
        _, losses2 = optimize(scene, [key], loss_fn, n_iters=10, lr=0.2,
                              bounds=(1.0, 10.0), checkpoint_path=p,
                              checkpoint_every=3)
        assert len(losses2) == 10
        assert losses2[:6] == losses1


def test_occupancy_stats():
    scene = _simple_scene()
    c = scene.camera
    xy = (
        jnp.stack(jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing="xy"), -1)
        .reshape(-1, 2).astype(jnp.float32) + 0.5
    )
    o, d = cam.sample_ray(c, xy)
    L, n_rays, occ = path_trace(scene, o, d, jax.random.PRNGKey(0),
                                return_occupancy=True)
    occ = np.asarray(occ)
    assert occ.shape == (4,)
    # monotone non-increasing active lanes; misses die after bounce 0
    assert (np.diff(occ) <= 0).all()
    assert occ[0] <= 64
    assert int(n_rays) >= occ.sum()
