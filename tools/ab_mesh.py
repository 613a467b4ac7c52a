"""Interleaved same-process A/B of mesh-kernel variants on the real TPU.

The tunnel device's state drifts +/-20% BETWEEN processes even minutes
apart (r5: same-binary bunny medians spanned 2.66-3.85 ms/wave across one
day), so separate-process comparisons under ~20% are noise.  This tool
compiles every requested variant up front in ONE process and interleaves
their slope measurements rep-by-rep, which cancels the drift and resolves
~0.2-0.4 ms effects.  This is the methodology behind the r5 decisions
recorded in PARITY.md: fused one-call sweep kept default-off, tm=32 and
unroll 2/8 dead ends, root-cull cost.

Usage: python tools/ab_mesh.py [fused|tm|unroll]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

import tpu_rt
from tpu_rt.integrator.path import _tile_perm
from tpu_rt.ops import pallas_mesh as pm
from tpu_rt.sensor import camera as cam

RES = 512


def _rays(path, origin, target):
    scene = tpu_rt.load_dict({
        "type": "scene", "integrator": {"type": "path"},
        "sensor": {"type": "perspective", "fov": 40,
                   "to_world": tpu_rt.ScalarTransform4f().look_at(
                       origin=origin, target=target, up=[0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": RES, "height": RES}},
        "mesh": {"type": "ply", "filename": path,
                 "bsdf": {"type": "diffuse"}},
    })
    g = scene.geometry
    cl = {"tris": g.cl_tris, "trisw": g.cl_trisw, "bounds": g.cl_bounds,
          "prim": g.cl_prim, "n_tris": g.n_tris}
    perm, _ = _tile_perm(RES, RES)
    xy = jnp.stack(jnp.meshgrid(jnp.arange(RES), jnp.arange(RES),
                                indexing="xy"), -1).reshape(-1, 2)
    o, d = cam.sample_ray(scene.camera, (xy.astype(jnp.float32) + 0.5)[perm])
    return cl, o, d


def make(cl, o, d, *, fused="0", tm=pm.DEFAULT_TM, unroll=None):
    pm._FUSED_MODE = fused
    if unroll is not None:
        pm._UNROLL = unroll

    @functools.partial(jax.jit, static_argnames=("reps",))
    def sweep_n(o, d, reps):
        def body(carry, _):
            o2 = o + carry * 1e-30  # data dep defeats CSE across reps
            t, prim, u, v = pm.mesh_intersect(cl, o2, d, tm=tm)
            return carry + jnp.sum(t) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    jax.block_until_ready(sweep_n(o, d, 1))
    jax.block_until_ready(sweep_n(o, d, 16))
    return sweep_n


def run(fns, o, d, n=5):
    slopes = {k: [] for k in fns}
    for _ in range(n):
        for nm, fn in fns.items():  # interleaved: one rep of each per pass
            t0 = time.perf_counter()
            jax.block_until_ready(fn(o, d, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(fn(o, d, 16))
            t16 = time.perf_counter() - t0
            slopes[nm].append((t16 - t1) / 15)
    for nm, ss in sorted(slopes.items()):
        ss.sort()
        med = ss[len(ss) // 2]
        print(f"{nm}: median {med*1e3:.2f} ms/wave "
              f"({RES*RES/med/1e6:.1f}M rays/s) "
              f"[{ss[0]*1e3:.2f}..{ss[-1]*1e3:.2f}] n={len(ss)}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fused"
    cl, o, d = _rays("/root/reference/scenes/meshes/bunny.ply",
                     [0, 0.12, 0.35], [0, 0.1, 0])
    if which == "fused":
        fns = {"chained": make(cl, o, d, fused="0"),
               "fused": make(cl, o, d, fused="1")}
    elif which == "tm":
        fns = {"tm16": make(cl, o, d), "tm32": make(cl, o, d, tm=32)}
    elif which == "unroll":
        fns = {"u4": make(cl, o, d), "u2": make(cl, o, d, unroll=2),
               "u8": make(cl, o, d, unroll=8)}
    else:
        raise SystemExit(f"unknown mode {which!r}")
    run(fns, o, d)
