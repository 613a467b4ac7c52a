"""TPU-grade Pallas-vs-XLA transport-bias gate (VERDICT r2 weak #6).

The CI suite's CPU gate (tests/test_pallas_kernel.py::
test_pallas_vs_xla_cbox_statistical) runs at small resolution in interpret
mode and would pass a few-percent systematic bias; THIS script is the
variant that actually constrains bias, run on the real chip:

  cbox 64^2, 64 spp, N seeds per renderer ->
  per-8x8-block means, seed-spread standard errors, Welch-style z-gate,
  plus a global-mean agreement bound.

Prints one JSON line; commit the result (PARITY.md quotes it) so the
claim is artifact-backed.  Usage:  python tools/bias_gate_tpu.py [N_seeds]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def main():
    import numpy as np

    import tpu_rt
    from tpu_rt.integrator.path import render as render_xla
    from tpu_rt.ops.pallas_path import render_pallas

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    res, spp = 64, 64
    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=res, spp=1)
    scene = scene.replace(max_depth=4)

    imgs_p = np.stack([
        np.asarray(render_pallas(scene, spp=spp, seed=1000 + i,
                                 spp_per_pass=spp))
        for i in range(n_seeds)
    ])
    imgs_x = np.stack([
        np.asarray(render_xla(scene, spp=spp, seed=2000 + i, spp_per_pass=32))
        for i in range(n_seeds)
    ])

    b = 8  # 8x8 blocks -> 8x8 grid

    def blocks(imgs):
        return imgs.reshape(imgs.shape[0], res // b, b, res // b, b, 3).mean(
            axis=(2, 4)
        )

    bp, bx = blocks(imgs_p), blocks(imgs_x)
    mp, mx = bp.mean(axis=0), bx.mean(axis=0)
    # standard error of each block mean from the seed spread
    se_p = bp.std(axis=0, ddof=1) / np.sqrt(n_seeds)
    se_x = bx.std(axis=0, ddof=1) / np.sqrt(n_seeds)
    se = np.sqrt(se_p**2 + se_x**2) + 1e-4  # absolute floor for dark blocks
    z = np.abs(mp - mx) / se

    rel_mean = abs(mp.mean() - mx.mean()) / max(mx.mean(), 1e-9)
    # With ~192 block-channels, max |z| under H0 is ~2.9; gate at 5 to
    # leave room for the heavy-tailed caustic blocks.
    ok = bool((z.max() < 5.0) and (rel_mean < 0.01))
    print(json.dumps({
        "check": "pallas_vs_xla_bias_gate_tpu",
        "res": res, "spp": spp, "n_seeds": n_seeds,
        "z_max": round(float(z.max()), 2),
        "z_p99": round(float(np.quantile(z, 0.99)), 2),
        "rel_mean_diff": round(float(rel_mean), 5),
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
