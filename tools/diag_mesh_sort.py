"""Estimate the benefit of sorting rays by mesh-AABB entry point before the
clustered mesh sweep.

The kernel charges every live (block, cluster) visit to all tm*128 lanes;
tile-ordered rays put silhouette-crossing tiles in blocks whose union of
per-ray live clusters is large.  Sorting rays by the Morton code of their
entry point into the whole-mesh AABB groups rays that need the SAME
clusters, shrinking the per-block live unions.  Pure XLA/NumPy, runs on CPU.
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


def morton3(q):  # q: (N, 3) uint32 in [0, 1024)
    def spread(x):
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))


def entry_keys(o, d, lo, hi, tmin=1e-4):
    """Morton key of each ray's entry point into [lo, hi]; misses get the
    max key so they sort to the back (and stay in tile order there)."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    invd = 1.0 / np.where(np.abs(d) < 1e-12,
                          np.where(d < 0, -1e-12, 1e-12), d)
    t0 = (lo[None] - o) * invd
    t1 = (hi[None] - o) * invd
    tn = np.maximum(np.minimum(t0, t1).max(1), tmin)
    tf = np.maximum(t0, t1).min(1)
    hi_t = tn <= tf
    p = o + tn[:, None] * d
    q = (p - lo[None]) / np.maximum(hi - lo, 1e-12)[None]
    q = np.clip((q * 1024).astype(np.int64), 0, 1023).astype(np.uint32)
    key = morton3(q).astype(np.int64)
    return np.where(hi_t, key, np.int64(1) << 40)


def work(bounds, comps, grid, tm):
    tot_live = 0
    tot_tris = 0.0
    C = bounds.shape[0]
    k = np.asarray(bounds[:, 6])
    for s0 in range(0, C, pallas_mesh.SEGMENT_C):
        s1 = min(s0 + pallas_mesh.SEGMENT_C, C)
        ids, nlive = pallas_mesh._block_live_clusters(
            jnp.asarray(bounds[s0:s1]), comps, grid, tm, 1e-4)
        nl = np.asarray(nlive)[:, 0]
        ids_np = np.asarray(ids)
        for gi in range(grid):
            tot_tris += k[s0:s1][ids_np[gi, :nl[gi]]].sum()
        tot_live += nl.sum()
    return tot_live, tot_tris


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
    bounds = np.asarray(g.cl_bounds)
    real = bounds[:, 6] > 0  # pad clusters carry far-point boxes
    lo = bounds[real, 0:3].min(0)
    hi = bounds[real, 3:6].max(0)
    name = path.split("/")[-1]

    def comps_of(o, d):
        tmax = jnp.full((o.shape[0],), 0.99e8, jnp.float32)
        cs = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmax]
        return [c.reshape(rows, 128) for c in cs]

    lv0, tt0 = work(bounds, comps_of(o, d), grid, tm)

    key = entry_keys(o, d, lo, hi)
    order = np.argsort(key, kind="stable")
    o_s = jnp.asarray(np.asarray(o)[order])
    d_s = jnp.asarray(np.asarray(d)[order])
    lv1, tt1 = work(bounds, comps_of(o_s, d_s), grid, tm)

    print(f"{name} tm={tm}:")
    print(f"  tile order : {lv0} cluster-visits, "
          f"{tt0 * tm * 128 / 1e9:.3f}G tri-lane-tests")
    print(f"  morton sort: {lv1} cluster-visits, "
          f"{tt1 * tm * 128 / 1e9:.3f}G tri-lane-tests "
          f"({tt0 / max(tt1, 1):.2f}x less sweep work)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    tm = int(sys.argv[2]) if len(sys.argv) > 2 else pallas_mesh.DEFAULT_TM
    if which in ("bunny", "both"):
        diag("/root/reference/scenes/meshes/bunny.ply",
             [0, 0.12, 0.35], [0, 0.1, 0], tm=tm)
    if which in ("teapot", "both"):
        diag("/root/reference/scenes/meshes/teapot.ply",
             [0, 1.5, 5], [0, 0.5, 0], tm=tm)
