"""Per-bounce vector-op audit of the cbox optical megakernel (VERDICT r4
weak #4 / next #4: "open the kernel's arithmetic hood").

Counts VPU vector operations per (8,128)-lane tile by tracing the SAME
functions the kernel lowers (`_make_bounce_step`, `_sweep`, `_rng_next`,
`_camera_ray`, `_film_w1d` accumulation) to jaxprs and counting equations
whose outputs are (8,128) planes — on a v5e each such equation is one
vreg instruction (native f32 vreg = 8 sublanes x 128 lanes).

Families:
  raygen        in-kernel camera ray + jitter draws
  sweep         closest-hit analytic/tri sweep (per bounce)
  shadow        NEE any-hit occlusion sweep (per bounce w/ lights)
  rng           SplitMix32 draws (9 per bounce + 2 raygen)
  shade         everything else in the bounce: emitter-hit MIS, per-lane
                BSDF constant selects, NEE shading math, BSDF sampling, RR
  film          in-kernel filter accumulation per sample (box/tent/gauss)

Roofline: the v5e VPU is an (8,128) vector unit with 4 independent ALUs
per lane slot (scaling-book hardware model), i.e. up to 4 vreg ops/cycle
at ~1.67 GHz = 6.68e9 vreg ops/s; a pessimistic 2-ALU bound is printed
alongside.  Transcendentals (exp/log/rsqrt/sqrt) cost multiple passes;
they are counted separately and weighted LOW=1 / HIGH=6 to bracket the
prediction.

MEASURED CONCLUSION (r5, this tool + BENCH r4/r5): 18.1k vreg ops/sample
(lo) -> 4-ALU issue bound 2.25B rays/s; the measured 2.0B streaming
figure is ~89%% of that bound (and above the 2-ALU bound entirely), so
the megakernel is within ~10%% of the VPU issue ceiling for its current
op mix.  The trace-derived est_vpu_utilization 0.587 in BENCH_r04 is an
artifact of that estimator's normalization, not 40%% idle issue slots.
The remaining lever is fewer ops/sample (top sinks below: the 64-prim
analytic sweep (1063) and the NEE shadow sweep (1064) dominate at ~59%%
of bounce cost; select_n (664/bounce) is the biggest single non-mul
family — per-prim constant selects in shading).

Run on CPU (no TPU needed): PYTHONPATH=/root/repo python tools/audit_kernel_ops.py
"""

import os
import sys
from collections import Counter

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import tpu_rt
from tpu_rt.ops import pallas_path as pp

SHAPE = (8, 128)

# Primitives that are bookkeeping, not VPU issue slots.
_FREE = {
    "reshape", "broadcast_in_dim", "squeeze", "slice", "concatenate",
    "transpose", "copy", "stop_gradient", "convert_element_type",
}
# Multi-pass vector ops (polynomial/iterative on the VPU).
_TRANS = {"exp", "log", "rsqrt", "sqrt", "sin", "cos", "tanh", "pow",
          "atan2", "div"}


def _count(jaxpr, acc=None):
    acc = Counter() if acc is None else acc
    for eqn in jaxpr.eqns:
        for sub in jax.core.jaxprs_in_params(eqn.params) if hasattr(
                jax.core, "jaxprs_in_params") else []:
            _count(sub, acc)
        if eqn.primitive.name in ("pjit", "jit", "closed_call",
                                  "custom_jvp_call", "custom_vjp_call",
                                  "remat"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                _count(inner.jaxpr if hasattr(inner, "jaxpr") else inner, acc)
            continue
        if eqn.primitive.name in ("scan", "while", "cond"):
            for k in ("jaxpr", "body_jaxpr", "cond_jaxpr", "branches"):
                v = eqn.params.get(k)
                if v is None:
                    continue
                vs = v if isinstance(v, (tuple, list)) else [v]
                for x in vs:
                    _count(x.jaxpr if hasattr(x, "jaxpr") else x, acc)
            continue
        out_shapes = [getattr(o.aval, "shape", ()) for o in eqn.outvars]
        if any(s == SHAPE for s in out_shapes):
            acc[eqn.primitive.name] += 1
    return acc


def vops(counter):
    lo = hi = 0
    for name, n in counter.items():
        if name in _FREE:
            continue
        if name in _TRANS:
            lo += n
            hi += 6 * n
        else:
            lo += n
            hi += n
    return lo, hi


def trace_counts(fn, *args):
    return _count(jax.make_jaxpr(fn)(*args).jaxpr)


def main():
    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=512,
                             spp=256)
    bs = pp.bake_scene(scene)
    assert bs is not None
    rg = pp._make_raygen(scene.camera, scene.camera.width * scene.camera.height)

    zeros = jnp.zeros(SHAPE, jnp.float32)
    rngv = jnp.zeros(SHAPE, jnp.uint32)
    pid = zeros

    # ---- component families -------------------------------------------------
    def f_rng(r):
        for _ in range(9):
            r, u = pp._rng_next(r)
        return r, u

    c_rng9 = trace_counts(f_rng, rngv)

    def f_raygen(r):
        r, jx = pp._rng_next(r)
        r, jy = pp._rng_next(r)
        return pp._camera_ray(rg, SHAPE, pid, jx, jy)

    c_raygen = trace_counts(f_raygen, rngv)

    o3 = (zeros, zeros + 0.1, zeros + 0.2)
    d3 = (zeros + 0.3, zeros + 0.4, zeros + 0.5)
    c_sweep = trace_counts(lambda o, d: pp._sweep(bs, o, d, 1e-4, pp._BIG),
                           o3, d3)
    c_shadow = trace_counts(
        lambda o, d, tm: pp._sweep(bs, o, d, 1e-4, tm, any_hit=True),
        o3, d3, zeros + 1.0)

    # ---- full bounce at each static depth ------------------------------------
    step = pp._make_bounce_step(bs, raygen=rg)
    st0, _ = pp._sample_state_init(bs, rg, rngv, pid=pid)
    per_depth = []
    for depth in range(bs.max_depth):
        c = trace_counts(lambda s, dep=depth: step(dep, s), st0)
        per_depth.append(c)

    # ---- film accumulation (tent = 9 offsets) --------------------------------
    filt = pp._filter_name(scene.camera.filter_type)
    foot = pp._FILTER_FOOT[filt]
    offs = [(dy, dx) for dy in range(-foot, foot + 1)
            for dx in range(-foot, foot + 1)]

    def f_film(jx, jy, L0):
        acc = []
        for dy, dx in offs:
            w = pp._film_w1d(filt, dx, jx) * pp._film_w1d(filt, dy, jy) \
                if filt != "box" else jnp.ones_like(jx)
            acc.append((L0[0] * w, L0[1] * w, L0[2] * w, w))
        return acc

    c_film = trace_counts(f_film, zeros, zeros, (zeros, zeros + 0.1, zeros))

    # ---- report ---------------------------------------------------------------
    fam = {}
    fam["raygen/sample"] = vops(c_raygen)
    fam["rng9/bounce"] = vops(c_rng9)
    fam["sweep/bounce"] = vops(c_sweep)
    fam["shadow/bounce"] = vops(c_shadow)
    fam[f"film({filt})/sample"] = vops(c_film)

    print(f"cbox megakernel op audit: {len(bs.prims)} prims, "
          f"max_depth {bs.max_depth}, filter {filt}")
    print(f"{'family':<22}{'vreg ops (lo)':>14}{'(hi w/ trans x6)':>18}")
    tot_lo = tot_hi = 0
    for depth, c in enumerate(per_depth):
        lo, hi = vops(c)
        tot_lo += lo
        tot_hi += hi
        sw_lo, sw_hi = vops(c_sweep)
        sh_lo, sh_hi = vops(c_shadow)
        r_lo, r_hi = vops(c_rng9)
        shade_lo = lo - sw_lo - r_lo - (sh_lo if depth + 2 <= bs.max_depth
                                        else 0)
        print(f"bounce[{depth}] total     {lo:>12}{hi:>16}   "
              f"(shade-only ~{shade_lo})")
    for k, (lo, hi) in fam.items():
        print(f"{k:<22}{lo:>14}{hi:>18}")

    ops_per_sample_lo = vops(c_raygen)[0] + tot_lo + vops(c_film)[0]
    ops_per_sample_hi = vops(c_raygen)[1] + tot_hi + vops(c_film)[1]
    print(f"\nper SAMPLE (raygen + {bs.max_depth} bounces + film): "
          f"{ops_per_sample_lo} .. {ops_per_sample_hi} vreg ops")

    # rays counted per sample on cbox (bench convention: segments + NEE)
    # measured from the kernel's own lazy counters at 512^2x256spp:
    rays_per_sample = 398073680 / (512 * 512 * 256)
    lanes = 8 * 128
    for alus in (4, 2):
        issue = alus * 1.67e9  # vreg ops/s
        for tag, opsn in (("lo", ops_per_sample_lo), ("hi", ops_per_sample_hi)):
            t_tile = opsn / issue
            rps = lanes * rays_per_sample / t_tile
            print(f"  roofline[{alus}-ALU,{tag}]: {rps/1e9:.2f}B rays/s at "
                  f"100% VPU issue -> measured 2.0B = "
                  f"{2.0e9/rps*100:.0f}% of this bound")

    # dump top primitives of the busiest bounce for the attack list
    busiest = max(per_depth, key=lambda c: vops(c)[0])
    print("\ntop primitives in busiest bounce:")
    for name, n in busiest.most_common(18):
        print(f"  {name:<24}{n}")


if __name__ == "__main__":
    main()
