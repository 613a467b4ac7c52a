"""Headline benchmark: cbox.xml at 512x512, 256 spp — rays/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline denominator is the BASELINE.json north-star target of 1e9 rays/sec
on a v5p-8 slice (vs_baseline = value / 1e9).
Runs on the real TPU chip (no platform override).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp


def main():
    import tpu_rt
    from tpu_rt.integrator.path import render_sample_batch
    from tpu_rt.sensor import film as film_mod

    res = int(os.environ.get("BENCH_RES", "512"))
    spp = int(os.environ.get("BENCH_SPP", "256"))
    timed_passes = int(os.environ.get("BENCH_TIMED_PASSES", "24"))

    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=res, spp=spp)
    c = scene.camera

    @jax.jit
    def one_pass(film_vals, film_wts, key):
        film_xy, L, n_rays = render_sample_batch(scene, key)
        ok = jnp.all(jnp.isfinite(L), axis=-1)
        L = jnp.where(ok[:, None], L, 0.0)
        fv, fw = film_mod.splat(film_vals, film_wts, film_xy, L, ok, c.filter_type)
        return fv, fw, n_rays

    fv = jnp.zeros((c.height, c.width, 3), jnp.float32)
    fw = jnp.zeros((c.height, c.width), jnp.float32)
    root = jax.random.PRNGKey(0)

    # Warmup / compile.
    fv, fw, n0 = one_pass(fv, fw, jax.random.fold_in(root, 0))
    jax.block_until_ready(fv)

    n_timed = min(timed_passes, spp - 1)
    t0 = time.perf_counter()
    counts = []
    for i in range(1, 1 + n_timed):
        fv, fw, n_rays = one_pass(fv, fw, jax.random.fold_in(root, i))
        counts.append(n_rays)
    jax.block_until_ready(fv)
    dt = time.perf_counter() - t0
    total_rays = int(sum(int(x) for x in jax.device_get(counts)))

    rays_per_sec = total_rays / dt
    print(
        json.dumps(
            {
                "metric": f"cbox {res}^2 {spp}spp path-tracing throughput (1 chip)",
                "value": rays_per_sec,
                "unit": "rays/sec",
                "vs_baseline": rays_per_sec / 1e9,
            }
        )
    )


if __name__ == "__main__":
    main()
