"""A/B measurement: regeneration film loop + per-sample early exit vs the
unrolled kernels, on the real TPU.

Configs:
  cbox @ its native max_depth 6 (bench headline) — box/tent film path
  cbox @ max_depth 16 (deep-scan proxy: RR from depth 5 empties the tail)
  cbox_pol @ native depth 16 (gaussian -> per-sample Stokes kernel):
      unrolled vs while-loop early exit

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_regen.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

import tpu_rt
from tpu_rt.ops import pallas_path as pp


def timed(label, fn, counter, reps=5):
    out = jax.block_until_ready(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    nr = int(counter.last_ray_count)
    print(f"{label:44s} {med*1e3:9.1f} ms   {nr/med/1e9:7.2f} Grays/s",
          flush=True)
    return np.asarray(out), med


def main():
    res, spp = 512, 256
    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=res,
                             spp=spp)
    print(f"cbox {res}^2 spp={spp} max_depth={scene.max_depth}", flush=True)

    for depth in (6, 16):
        sc = scene.replace(max_depth=depth)
        outs = {}
        for mode in ("0", "1"):
            pp.REGEN_MODE = mode
            tag = "regen" if mode == "1" else "unroll"
            img, _ = timed(f"cbox d={depth} {tag}",
                           lambda sc=sc: pp.render_pallas(sc, spp=spp,
                                                          seed=3),
                           pp.render_pallas)
            outs[mode] = img
        d = np.abs(outs["0"] - outs["1"]).max()
        print(f"  max |diff| unroll vs regen: {d:.2e}", flush=True)

    # per-sample Stokes early exit (cbox_pol native config is 256^2
    # spp 512 gaussian; use a reduced-spp probe at the native depth)
    pol = tpu_rt.load_file("/root/reference/scenes/cbox_pol.xml", res=256,
                           spp=64)
    print(f"cbox_pol 256^2 spp=64 max_depth={pol.max_depth}", flush=True)
    souts = {}
    for mode in ("0", "1"):
        pp.EARLY_EXIT_MODE = mode
        tag = "early-exit" if mode == "1" else "unroll"
        S, med = timed(f"cbox_pol {tag}",
                       lambda: pp.render_stokes_pallas(pol, spp=64, seed=3),
                       pp.render_stokes_pallas)
        souts[mode] = S
    d = np.abs(souts["0"] - souts["1"]).max()
    print(f"  max |diff| unroll vs early-exit: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
