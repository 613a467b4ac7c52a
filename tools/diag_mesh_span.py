"""Model the mesh kernel's sweep work under finer span granularities.

The kernel sweeps, per live (ray-block, cluster), the contiguous span of
live QUARTER sub-boxes, unioned over the whole (tm, 128) block.  This tool
replays the host cull + quarter slab tests in NumPy and reports total
lane-tests (span length x block lanes) for:

  block-q4   : union quarter-span per 16-row block (today's kernel)
  vreg-q4    : independent quarter-span per 8-row vreg group (2 per block)
  block-q8   : union EIGHTH-span per block (8 sub-boxes, finer bounds)
  vreg-q8    : eighth-span per 8-row group
  lane-q4    : per-lane quarter-span (unreachable floor for span sweeps)
  hit-need   : lanes whose ray enters the cluster AABB at all (work floor)

Run on CPU; ignores in-kernel best_t shrinking (F2B), so absolute numbers
are upper bounds — the RATIOS guide kernel design.
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


def _slab(bmin, bmax, o, d, tmin=1e-4, tmax=0.99e8):
    """o,d: (L,3); bmin,bmax: (3,). Returns (L,) live bool + entry t."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.where(np.abs(d) < 1e-12,
                             np.where(d < 0, -1e-12, 1e-12), d)
    t0 = (bmin[None] - o) * inv
    t1 = (bmax[None] - o) * inv
    tn = np.maximum(np.minimum(t0, t1).max(1), tmin)
    tf = np.minimum(np.maximum(t0, t1).min(1), tmax)
    return tn <= tf, tn


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
    o = np.asarray(o)
    d = np.asarray(d)

    n = o.shape[0]
    rows = n // 128
    grid = rows // tm
    blk = tm * 128
    tmax = jnp.full((n,), 0.99e8, jnp.float32)
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.asarray(tmax)]
    comps = [jnp.asarray(c).reshape(rows, 128) for c in comps]

    bounds = np.asarray(g.cl_bounds)
    tris = np.asarray(g.cl_tris)  # (C, 9, 128)
    C = bounds.shape[0]
    counts = bounds[:, 6].astype(np.int64)
    name = path.split("/")[-1]
    print(f"{name}: {C} clusters, {grid} blocks of {tm}x128, {g.n_tris} tris")

    # Eighth sub-boxes from the raw tri table (same recipe as quarters).
    p0 = tris[:, 0:3].transpose(0, 2, 1)  # (C,128,3)
    e1 = tris[:, 3:6].transpose(0, 2, 1)
    e2 = tris[:, 6:9].transpose(0, 2, 1)
    emin = np.full((C, 8, 3), 1e30, np.float32)
    emax = np.full((C, 8, 3), 1e30, np.float32)
    for c in range(C):
        k = counts[c]
        for qi in range(8):
            s, e = (qi * k) // 8, ((qi + 1) * k) // 8
            if e <= s:
                continue
            v = np.concatenate([p0[c, s:e], p0[c, s:e] + e1[c, s:e],
                                p0[c, s:e] + e2[c, s:e]], 0)
            emin[c, qi] = v.min(0)
            emax[c, qi] = v.max(0)
    qmin = bounds[:, 8:32].reshape(C, 4, 6)[:, :, 0:3]
    qmax = bounds[:, 8:32].reshape(C, 4, 6)[:, :, 3:6]

    tot = dict.fromkeys(
        ["block-q4", "vreg-q4", "block-q8", "vreg-q8", "lane-q4",
         "hit-need"], 0.0)
    ob = o.reshape(grid, blk, 3)
    db = d.reshape(grid, blk, 3)
    for s0 in range(0, C, pallas_mesh.SEGMENT_C):
        s1 = min(s0 + pallas_mesh.SEGMENT_C, C)
        ids, nlive = pallas_mesh._block_live_clusters(
            jnp.asarray(bounds[s0:s1]), comps, grid, tm, 1e-4)
        ids_np = np.asarray(ids)
        nl = np.asarray(nlive)[:, 0]
        for gi in range(grid):
            for c_loc in ids_np[gi, : nl[gi]]:
                c = s0 + int(c_loc)
                k = counts[c]
                qs = np.array([0, (k // 4), (k // 2), (3 * k) // 4, k])
                es = np.array([(i * k) // 8 for i in range(9)])

                def spans(nsub, smin, smax, qbound, group_rows):
                    """Sum over row-groups of span-length x group lanes."""
                    ngrp = tm // group_rows
                    og = ob[gi].reshape(ngrp, group_rows * 128, 3)
                    dg = db[gi].reshape(ngrp, group_rows * 128, 3)
                    total = 0
                    lane_total = 0
                    for gr in range(ngrp):
                        live = np.zeros(nsub, bool)
                        for qi in range(nsub):
                            if smin[c, qi, 0] > 9e29:
                                continue
                            lv, _ = _slab(smin[c, qi], smax[c, qi],
                                          og[gr], dg[gr])
                            live[qi] = lv.any()
                        if live.any():
                            first = int(np.argmax(live))
                            last = nsub - 1 - int(np.argmax(live[::-1]))
                            total += (qbound[last + 1] - qbound[first]) \
                                * group_rows * 128
                    return total

                tot["block-q4"] += spans(4, qmin, qmax, qs, tm)
                tot["vreg-q4"] += spans(4, qmin, qmax, qs, 8)
                tot["block-q8"] += spans(8, emin, emax, es, tm)
                tot["vreg-q8"] += spans(8, emin, emax, es, 8)
                # per-lane quarter span + hit-need floor
                lane_live = np.zeros((blk, 4), bool)
                for qi in range(4):
                    if qmin[c, qi, 0] > 9e29:
                        continue
                    lv, _ = _slab(qmin[c, qi], qmax[c, qi], ob[gi], db[gi])
                    lane_live[:, qi] = lv
                any_l = lane_live.any(1)
                first = np.argmax(lane_live, 1)
                last = 3 - np.argmax(lane_live[:, ::-1], 1)
                ln = np.where(any_l, qs[last + 1] - qs[first], 0)
                tot["lane-q4"] += ln.sum()
                tot["hit-need"] += any_l.sum() * k
    base = tot["block-q4"]
    for kk, v in tot.items():
        print(f"  {kk:9s}: {v/1e9:7.3f} G lane-tests  ({v/base:5.1%})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    if which in ("bunny", "both"):
        diag("/root/reference/scenes/meshes/bunny.ply",
             [0, 0.12, 0.35], [0, 0.1, 0])
    if which in ("teapot", "both"):
        diag("/root/reference/scenes/meshes/teapot.ply",
             [0, 1.5, 5], [0, 0.5, 0])
