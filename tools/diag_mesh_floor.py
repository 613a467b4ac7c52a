"""Split the mesh-kernel wave into fixed overhead vs real sweep work.

Times the bunny intersect wave twice on the real TPU with the SAME program
shape: (a) normal tmax (full sweep) and (b) tmax ~ tmin (the host interval
cull retires every cluster, nlive=0 everywhere, so the kernel's grid steps
run empty).  (b) is the floor: pallas dispatch chain + XLA glue (per-segment
host cull, best-merges) + empty grid-step cost; (a)-(b) is the actual
slab-test + triangle-sweep time.  Slope timing as tools/bench_mesh.py.
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


def run(path, origin, target, res=512):
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

    @functools.partial(jax.jit, static_argnames=("reps",))
    def sweep_n(o, d, tmax, reps):
        def body(carry, _):
            o2 = o + carry * 1e-30
            t, prim, u, v = pallas_mesh.mesh_intersect(
                clusters, o2, d, tmax=tmax)
            return carry + jnp.sum(t) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    n = o.shape[0]
    full = jnp.full((n,), 0.99e8, jnp.float32)
    empty = jnp.full((n,), 2e-4, jnp.float32)  # > tmin, kills every cluster

    for label, tmax in (("full", full), ("empty", empty)):
        jax.block_until_ready(sweep_n(o, d, tmax, 1))
        jax.block_until_ready(sweep_n(o, d, tmax, 16))

        def med(reps, n_s=5):
            ts = []
            for _ in range(n_s):
                t0 = time.perf_counter()
                jax.block_until_ready(sweep_n(o, d, tmax, reps))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2]

        per = (med(16) - med(1)) / 15
        print(f"{name} [{label}]: {per*1e3:.3f} ms/wave "
              f"({res*res/per/1e6:.1f}M rays/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    if which in ("bunny", "both"):
        run("/root/reference/scenes/meshes/bunny.ply",
            [0, 0.12, 0.35], [0, 0.1, 0])
    if which in ("teapot", "both"):
        run("/root/reference/scenes/meshes/teapot.ply",
            [0, 1.5, 5], [0, 0.5, 0])
