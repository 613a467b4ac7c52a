"""Diagnostic: where does the bunny mesh sweep spend its work?

Reports, per 64-cluster segment, the per-block live-cluster statistics from
the host-side interval cull (_block_live_clusters) plus the implied
triangle-sweep work, so kernel tuning targets the real bottleneck.
Runs fine on CPU (pure XLA, no Pallas).
"""

import sys

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import tpu_rt
from tpu_rt.integrator.path import _tile_perm
from tpu_rt.ops import pallas_mesh
from tpu_rt.sensor import camera as cam


def diag(path, origin, target, res=512, tm=pallas_mesh.DEFAULT_TM):
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

    n = o.shape[0]
    rows = n // 128
    grid = rows // tm
    tmax = jnp.full((n,), 0.99e8, jnp.float32)
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmax]
    comps = [c.reshape(rows, 128) for c in comps]

    bounds = np.asarray(g.cl_bounds)
    C = bounds.shape[0]
    name = path.split("/")[-1]
    print(f"{name}: {C} clusters, {grid} blocks of {tm}x128 rays, "
          f"{g.n_tris} tris")
    tot_live = 0
    tot_tris = 0.0
    for s0 in range(0, C, pallas_mesh.SEGMENT_C):
        s1 = min(s0 + pallas_mesh.SEGMENT_C, C)
        b = jnp.asarray(bounds[s0:s1])
        ids, nlive = pallas_mesh._block_live_clusters(
            b, comps, grid, tm, 1e-4)
        nl = np.asarray(nlive)[:, 0]
        # per-live-cluster sweep length: use the cluster tri count (col 6);
        # quarter-span refines this in-kernel but count is the upper bound
        k = bounds[s0:s1, 6]
        ids_np = np.asarray(ids)
        ksum = np.zeros(grid)
        for gi in range(grid):
            ksum[gi] = k[ids_np[gi, :nl[gi]]].sum()
        tot_live += nl.sum()
        tot_tris += ksum.sum()
        print(f"  seg {s0:4d}-{s1:4d}: nlive/block mean {nl.mean():6.2f} "
              f"max {nl.max():3d} zero-blocks {(nl == 0).mean():5.1%}  "
              f"tris-swept/block mean {ksum.mean():7.1f}")
    print(f"  TOTAL live cluster-visits {tot_live} "
          f"({tot_live / (grid * C):.1%} of {grid}x{C}), "
          f"tri-tests {tot_tris * tm * 128 / 1e9:.2f}G lane-tests "
          f"(upper bound, pre-quarter-span)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    tm = int(sys.argv[2]) if len(sys.argv) > 2 else pallas_mesh.DEFAULT_TM
    if which in ("bunny", "both"):
        diag("/root/reference/scenes/meshes/bunny.ply",
             [0, 0.12, 0.35], [0, 0.1, 0], tm=tm)
    if which in ("teapot", "both"):
        diag("/root/reference/scenes/meshes/teapot.ply",
             [0, 1.5, 5], [0, 0.5, 0], tm=tm)
