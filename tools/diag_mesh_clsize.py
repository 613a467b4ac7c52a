"""Model the treelet-size tradeoff for the clustered mesh kernel.

Smaller treelets (max_count < 128) leave table lanes empty but give
tighter AABBs: fewer live (block, cluster) visits and shorter sweeps, at
the cost of more slab tests and more segments.  This rebuilds the cluster
table at several max_count values and reports the host-cull work model.
Pure XLA, runs on CPU.
"""

import sys

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import tpu_rt
from tpu_rt.geometry.bvh import build_bvh
from tpu_rt.integrator.path import _tile_perm
from tpu_rt.ops import pallas_mesh
from tpu_rt.sensor import camera as cam

SLAB_OPS = 4 * 36      # four quarter sub-box tests per live cluster visit
MT_OPS = 44            # scalar-splat Moller-Trumbore per tri-lane
VPU = 3.4e12


def model(path, origin, target, max_counts, res=512,
          tm=pallas_mesh.DEFAULT_TM):
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

    p0 = np.asarray(g.tri_p0)
    e1 = np.asarray(g.tri_e1)
    e2 = np.asarray(g.tri_e2)
    bvh = build_bvh(p0 + np.minimum(0, np.minimum(e1, e2)),
                    p0 + np.maximum(0, np.maximum(e1, e2)))
    name = path.split("/")[-1]
    print(f"{name} tm={tm}: {p0.shape[0]} tris")

    for mc in max_counts:
        cl = pallas_mesh.build_clusters(p0, e1, e2, bvh=bvh, max_count=mc)
        bounds = cl["bounds"]
        C = bounds.shape[0]
        k = bounds[:, 6]
        lanes = tm * 128
        tot_live = 0
        tot_tris = 0.0
        for s0 in range(0, C, pallas_mesh.SEGMENT_C):
            s1 = min(s0 + pallas_mesh.SEGMENT_C, C)
            ids, nlive = pallas_mesh._block_live_clusters(
                jnp.asarray(bounds[s0:s1]), comps, grid, tm, 1e-4)
            nl = np.asarray(nlive)[:, 0]
            ids_np = np.asarray(ids)
            for gi in range(grid):
                tot_tris += k[s0:s1][ids_np[gi, :nl[gi]]].sum()
            tot_live += nl.sum()
        est_ms = (tot_live * lanes * SLAB_OPS
                  + tot_tris * lanes * MT_OPS) / VPU * 1e3
        print(f"  max_count={mc:4d}: {C:5d} clusters "
              f"({-(-C // pallas_mesh.SEGMENT_C)} segments), "
              f"{tot_live:6d} visits, "
              f"{tot_tris * lanes / 1e9:6.3f}G tri-lane-tests, "
              f"est {est_ms:5.2f} ms/wave -> "
              f"{res * res / est_ms * 1e3 / 1e6:6.1f}M rays/s model")


if __name__ == "__main__":
    mcs = [int(x) for x in (sys.argv[2:] or [128, 64, 48, 32])]
    which = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    if which in ("bunny", "both"):
        model("/root/reference/scenes/meshes/bunny.ply",
              [0, 0.12, 0.35], [0, 0.1, 0], mcs)
    if which in ("teapot", "both"):
        model("/root/reference/scenes/meshes/teapot.ply",
              [0, 1.5, 5], [0, 0.5, 0], mcs)
