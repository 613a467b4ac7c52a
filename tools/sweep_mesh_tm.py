"""Sweep the mesh-kernel ray-tile height (tm) on the real TPU.

The committed tm=16 default was measured before per-block cluster
compaction and quarter-span sweeps landed; smaller blocks give the host
interval cull tighter o/d ranges, so the optimum may have moved.
Methodology matches tools/bench_mesh.py (512^2 tile-ordered primaries,
slope timing, median-of-5).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

import tpu_rt
from tpu_rt.integrator.path import _tile_perm
from tpu_rt.ops import pallas_mesh
from tpu_rt.sensor import camera as cam


def sweep(path, origin, target, tms, res=512):
    scene = tpu_rt.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": tpu_rt.ScalarTransform4f().look_at(
                origin=origin, target=target, up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res},
        },
        "mesh": {"type": "ply", "filename": path,
                 "bsdf": {"type": "diffuse"}},
    })
    g = scene.geometry
    clusters = {"tris": g.cl_tris, "trisw": g.cl_trisw, "bounds": g.cl_bounds,
                "prim": g.cl_prim, "n_tris": g.n_tris}
    perm, _ = _tile_perm(res, res)
    xy = jnp.stack(jnp.meshgrid(jnp.arange(res), jnp.arange(res),
                                indexing="xy"), -1).reshape(-1, 2)
    o, d = cam.sample_ray(scene.camera, (xy.astype(jnp.float32) + 0.5)[perm])
    name = path.split("/")[-1]

    for tm in tms:
        @functools.partial(jax.jit, static_argnames=("reps", "tm"))
        def sweep_n(o, d, reps, tm):
            def body(carry, _):
                o2 = o + carry * 1e-30
                t, prim, u, v = pallas_mesh.mesh_intersect(
                    clusters, o2, d, tm=tm)
                return carry + jnp.sum(t) * 1e-12, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return acc

        jax.block_until_ready(sweep_n(o, d, 1, tm))

        def med(reps, n=5):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                jax.block_until_ready(sweep_n(o, d, reps, tm))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2]

        per = (med(4) - med(1)) / 3
        print(f"{name} tm={tm}: {res*res/per/1e6:.1f}M rays/s "
              f"({per*1e3:.2f} ms/wave)", flush=True)


if __name__ == "__main__":
    tms = [int(x) for x in (sys.argv[2:] or [4, 8, 16, 32])]
    which = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    if which in ("bunny", "both"):
        sweep("/root/reference/scenes/meshes/bunny.ply",
              [0, 0.12, 0.35], [0, 0.1, 0], tms)
    if which in ("teapot", "both"):
        sweep("/root/reference/scenes/meshes/teapot.ply",
              [0, 1.5, 5], [0, 0.5, 0], tms)
