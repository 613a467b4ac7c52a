"""Sweep the treelet size cap (build_clusters max_count) on the real TPU.

Methodology matches tools/bench_mesh.py (512^2 tile-ordered primaries,
slope timing, median-of-5 per config).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import tpu_rt
from tpu_rt.geometry.bvh import build_bvh
from tpu_rt.integrator.path import _tile_perm
from tpu_rt.ops import pallas_mesh
from tpu_rt.sensor import camera as cam


def sweep(path, origin, target, mcs, res=512, tm=pallas_mesh.DEFAULT_TM):
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
    perm, _ = _tile_perm(res, res)
    xy = jnp.stack(jnp.meshgrid(jnp.arange(res), jnp.arange(res),
                                indexing="xy"), -1).reshape(-1, 2)
    o, d = cam.sample_ray(scene.camera, (xy.astype(jnp.float32) + 0.5)[perm])
    name = path.split("/")[-1]

    p0 = np.asarray(g.tri_p0)
    e1 = np.asarray(g.tri_e1)
    e2 = np.asarray(g.tri_e2)
    bvh = build_bvh(p0 + np.minimum(0, np.minimum(e1, e2)),
                    p0 + np.maximum(0, np.maximum(e1, e2)))

    for mc in mcs:
        cl = pallas_mesh.build_clusters(p0, e1, e2, bvh=bvh, max_count=mc)
        clusters = {k: jnp.asarray(v) if not np.isscalar(v) else v
                    for k, v in cl.items()}

        @functools.partial(jax.jit, static_argnames=("reps",))
        def sweep_n(o, d, reps):
            def body(carry, _):
                o2 = o + carry * 1e-30
                t, prim, u, v = pallas_mesh.mesh_intersect(
                    clusters, o2, d, tm=tm)
                return carry + jnp.sum(t) * 1e-12, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return acc

        jax.block_until_ready(sweep_n(o, d, 1))

        def med(reps, n=5):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                jax.block_until_ready(sweep_n(o, d, reps))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2]

        per = (med(4) - med(1)) / 3
        C = cl["bounds"].shape[0]
        print(f"{name} max_count={mc}: {res*res/per/1e6:.1f}M rays/s "
              f"({per*1e3:.2f} ms/wave, {C} clusters, "
              f"{-(-C // pallas_mesh.SEGMENT_C)} segments)", flush=True)


if __name__ == "__main__":
    mcs = [int(x) for x in (sys.argv[2:] or [128, 64, 32])]
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("teapot", "both"):
        sweep("/root/reference/scenes/meshes/teapot.ply",
              [0, 1.5, 5], [0, 0.5, 0], mcs)
    if which in ("bunny", "both"):
        sweep("/root/reference/scenes/meshes/bunny.ply",
              [0, 0.12, 0.35], [0, 0.1, 0], mcs)
