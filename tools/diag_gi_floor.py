"""Floor analysis: can ONE megakernel beat the hybrid 2x on bunny GI?

VERDICT r4 #3 asks to stream cluster-table segments through the path
megakernel so bunny-class GI runs in one kernel, gated at >= 2x the
hybrid.  This tool measures the bound that decides the question without
building the kernel: a one-kernel form runs the SAME cluster sweeps (the
mesh tables and the per-block culls are identical physics); what it can
remove is everything else — the XLA glue between per-bounce kernel
launches (interaction reconstruction, BSDF eval/sampling, NEE, splats)
and the launch overheads.  It also ADDS costs the hybrid doesn't pay:
per-(tile, bounce, segment) ray-state streaming through HBM (the segment
loop must be outer, so the full state re-streams S times per bounce
instead of the hybrid's once) and in-kernel shading for rays the hybrid
shades with XLA's fused elementwise pipeline.

So:  max speedup  <=  wall / kernel_sweep_time  =  1 / kernel_frac,
measured from a jax.profiler device trace of the real render
(utils/profiling.measure_device_trace — the same machinery bench.py
uses).  If kernel_frac >= 0.5 the >= 2x gate is unreachable by
restructuring alone, and the honest verdict is "sweep-bound: make the
sweep faster, not the packaging" (which r5 attacked directly: SMEM
segment sizing 85.4M rays/s, the BW triangle test, and the measured
coherence-sort dead end — tools/bench_gi_sort.py).

Run on the real TPU.  Env: GI_RES (256), GI_SPP (16), GI_DEPTH (3).
"""

import importlib.util as _u
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

_spec = _u.spec_from_file_location(
    "bench_gi_sort", os.path.join(os.path.dirname(__file__),
                                  "bench_gi_sort.py"))
_bgs = _u.module_from_spec(_spec)
_spec.loader.exec_module(_bgs)


def main():
    import jax

    import tpu_rt
    from tpu_rt.utils.profiling import measure_device_trace

    res = int(os.environ.get("GI_RES", "256"))
    spp = int(os.environ.get("GI_SPP", "16"))
    depth = int(os.environ.get("GI_DEPTH", "3"))
    scene = _bgs.make_scene(res, depth)

    # warm-up (compile)
    jax.block_until_ready(tpu_rt.render(scene, spp=spp, seed=0))

    m = measure_device_trace(
        lambda: tpu_rt.render(scene, spp=spp, seed=1))
    bound = 1.0 / max(m["kernel_frac"], 1e-9)
    glue_frac = m["device_busy_frac"] - m["kernel_frac"]
    print(f"bunny GI {res}^2 spp{spp} d{depth}: wall {m['wall_s']*1e3:.0f} ms, "
          f"device busy {m['device_busy_frac']:.3f}, "
          f"Pallas sweep share {m['kernel_frac']:.3f}, "
          f"XLA glue share {glue_frac:.3f}", flush=True)
    print(f"one-kernel speedup bound (removes ALL glue+idle, keeps the "
          f"sweeps, ignores its own added state-DMA): {bound:.2f}x "
          f"vs the >= 2x gate -> "
          f"{'REACHABLE' if bound >= 2.0 else 'UNREACHABLE'}", flush=True)
    print(json.dumps({
        "metric": "bunny_gi_onekernel_bound", "value": round(bound, 2),
        "unit": "x", "kernel_frac": round(m["kernel_frac"], 3),
        "device_busy_frac": round(m["device_busy_frac"], 3),
        "wall_s": round(m["wall_s"], 3),
        "config": f"{res}^2 spp{spp} d{depth}",
    }))


if __name__ == "__main__":
    main()
