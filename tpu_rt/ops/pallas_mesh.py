"""Pallas TPU mesh-intersection kernel: clustered triangle sweep in SMEM/VMEM.

TPU-native replacement for Embree BVH traversal on triangle meshes
(/root/reference/CustomIntegrator.py:146,159 consumes scene.ray_intersect;
mesh scenes: /root/reference/scenes/simple.xml:23 teapot PLY,
scenes/meshes/bunny.ply et al — SURVEY.md §2b "ray_intersect / BVH" row).

Design (chosen over a per-ray short-stack BVH, which is divergence-bound on
TPU — round-1 measured 0.44M rays/s on teapot):

  * Triangles are grouped into spatial *clusters* of 128 (ordered by the
    binned-SAH BVH's prim_order, so consecutive tris are spatially local),
    stored as one (C, 9, 128) SoA table: 9 components (p0, e1, e2) xyz with
    the triangle index in the lane dimension.
  * Rays are processed in (TM, 128) VMEM tiles (TM*128 rays per grid block).
  * The kernel loops clusters; per cluster it first slab-tests the whole ray
    tile against the cluster AABB (bounds live in SMEM via scalar prefetch)
    and skips dead clusters with lax.cond — coherent primary tiles
    intersect only a handful of clusters.
  * Live clusters run a scalar-splat Moller-Trumbore sweep: triangle
    components are read as scalars from SMEM (Mosaic forbids dynamic-lane
    scalar loads from VMEM) and broadcast against the full ray tile — the
    highest-arithmetic-intensity form (~44 VPU ops amortized over TM*128
    rays per triangle).
  * Large meshes stream through a 2D grid (ray blocks x cluster chunks):
    the triangle table is delivered as *blocked SMEM inputs* which the
    Pallas pipeline double-buffers automatically (HBM->SMEM), and the
    running best hit accumulates in the output block across chunk steps.
    SMEM is 1 MiB on v5e; chunks of 16 clusters (73 KiB) leave headroom.

Intersection results are (t, local-id, u, v); the local id is remapped to
global prim ids outside the kernel with one XLA gather, after which the
existing ``geometry.trace.compute_interaction`` reconstructs normals/uv.

Differentiation: hit parameters are exposed through a custom_vjp that
treats (t, u, v) as locally constant w.r.t. the ray ("detached" estimator,
the standard convention for MC path tracers; the reference differentiates
only BSDF parameters — /root/reference/USMain.py:264).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER = 128          # triangles per cluster (lane dim)
# Clusters per kernel call: the whole (SEGMENT_C, 9, 128) table rides the
# scalar-prefetch operand, SMEM-resident across ALL grid steps.  Streaming
# it as blocked SMEM inputs instead (round-2 first attempt) bottlenecked on
# SMEM DMA bandwidth: a do-nothing kernel took as long as the full sweep.
# 64 clusters = 288 KiB (SMEM is 1 MiB on v5e; >=128 clusters OOMs).
SEGMENT_C = 64
CHUNK_C = 16           # cluster-count padding granularity
# Ray-tile rows: 32 rows x 128 lanes = 4096 rays/block.  Measured on v5e
# (teapot, 512^2 primary rays, chained timing): tm=32 beats tm=8 (2.16 vs
# 5.2 ms/sweep) by amortizing the per-cluster cull/branch over more rays;
# tm=64 loses cull selectivity.  With 64x64-pixel tile-ordered raygen one
# block = one screen tile -> 152M rays/s vs 90M for scanline order.
DEFAULT_TM = 32
_BIG = 1e8             # finite miss sentinel (see geometry.trace.INF)

# Tests on the CPU backend set this to run the kernel in interpret mode.
INTERPRET = False


# ---------------------------------------------------------------------------
# Host-side cluster build
# ---------------------------------------------------------------------------

def _treelet_ranges(bvh, T, max_count=CLUSTER):
    """Cut the BVH into maximal subtrees of <= max_count triangles.

    Every subtree of the binned-SAH builder owns a *contiguous* range of
    prim_order (the builder partitions order[s:e] in place), so each treelet
    becomes one cluster with the subtree's tight AABB — far tighter than
    slicing prim_order into fixed runs, which produced loose overlapping
    boxes (round-2 measurement: fixed runs culled only 2.2x over brute).

    Returns list of (start, end) ranges over prim_order, in tree order.
    """
    a = np.asarray(bvh["a"])
    b = np.asarray(bvh["b"])
    count = np.asarray(bvh["count"])
    order = np.asarray(bvh["prim_order"])
    M = a.shape[0]

    # Per-node prim_order range via post-order accumulation.
    lo = np.full(M, 1 << 30, np.int64)
    hi = np.full(M, -1, np.int64)
    # iterative post-order: children of internal node ni are a[ni], b[ni]
    post = []
    stack = [0]
    while stack:
        ni = stack.pop()
        post.append(ni)
        if count[ni] == 0:
            stack.append(int(a[ni]))
            stack.append(int(b[ni]))
    for ni in reversed(post):
        if count[ni] > 0:
            lo[ni] = a[ni]
            hi[ni] = a[ni] + count[ni]
        else:
            la, lb = int(a[ni]), int(b[ni])
            lo[ni] = min(lo[la], lo[lb])
            hi[ni] = max(hi[la], hi[lb])

    # Count of *triangles* (ids < T) per node range.
    is_tri = (order < T).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(is_tri)])

    ranges = []
    stack = [0]
    while stack:
        ni = stack.pop()
        n_tris_here = csum[hi[ni]] - csum[lo[ni]]
        if n_tris_here == 0:
            continue
        if n_tris_here <= max_count or count[ni] > 0:
            ranges.append((int(lo[ni]), int(hi[ni])))
        else:
            stack.append(int(b[ni]))
            stack.append(int(a[ni]))
    return ranges


def build_clusters(tri_p0, tri_e1, tri_e2, prim_order=None, bvh=None):
    """Group triangles into spatial clusters of <= CLUSTER, padded.

    Args:
      tri_p0, tri_e1, tri_e2: [T, 3] float32 (world-space, e = p_i - p0).
      prim_order: optional [>=T] spatial permutation; only entries < T are
        used.  Identity when None.
      bvh: optional BVH dict (geometry.bvh.build_bvh output) — when given,
        clusters are maximal BVH treelets (tight bounds); prim_order is
        taken from it.
    Returns dict:
      tris:   (Cp, 9, 128) f32 — components (p0x..p0z, e1x..e1z, e2x..e2z)
      bounds: (Cp, 8) f32 — cluster AABB (minx,miny,minz,maxx,maxy,maxz,0,0)
      prim:   (Cp * 128,) i32 — local id -> global triangle id (0 for pads;
              pads are degenerate tris that can never hit)
      where Cp is the cluster count padded up to a multiple of CHUNK_C.
    """
    p0 = np.asarray(tri_p0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    T = p0.shape[0]

    # Per-cluster triangle id lists (<= CLUSTER each).
    if bvh is not None:
        order = np.asarray(bvh["prim_order"]).astype(np.int32)
        groups = []
        for s, e in _treelet_ranges(bvh, T):
            ids = order[s:e]
            ids = ids[ids < T]
            groups.append(ids)
    else:
        if prim_order is not None:
            order = np.asarray(prim_order)
            order = order[order < T].astype(np.int32)
            assert order.shape[0] == T
        else:
            order = np.arange(T, dtype=np.int32)
        groups = [order[i : i + CLUSTER] for i in range(0, T, CLUSTER)]

    C = max(len(groups), 1)
    Cp = -(-C // CHUNK_C) * CHUNK_C

    tris = np.zeros((Cp, 9, CLUSTER), np.float32)
    prim = np.zeros((Cp, CLUSTER), np.int32)
    bmin = np.full((Cp, 3), 1e30, np.float32)  # pads: far point box — an
    bmax = np.full((Cp, 3), 1e30, np.float32)  # inverted box would pass the
    # min/max slab test (it re-normalizes into an all-space box).
    for c, ids in enumerate(groups):
        k = ids.shape[0]
        if k == 0:
            continue
        cp0, ce1, ce2 = p0[ids], e1[ids], e2[ids]
        tris[c, 0, :k] = cp0[:, 0]
        tris[c, 1, :k] = cp0[:, 1]
        tris[c, 2, :k] = cp0[:, 2]
        tris[c, 3, :k] = ce1[:, 0]
        tris[c, 4, :k] = ce1[:, 1]
        tris[c, 5, :k] = ce1[:, 2]
        tris[c, 6, :k] = ce2[:, 0]
        tris[c, 7, :k] = ce2[:, 1]
        tris[c, 8, :k] = ce2[:, 2]
        prim[c, :k] = ids
        allv = np.concatenate([cp0, cp0 + ce1, cp0 + ce2], 0)
        bmin[c] = allv.min(axis=0)
        bmax[c] = allv.max(axis=0)

    bounds = np.concatenate(
        [bmin, bmax, np.zeros((Cp, 2), np.float32)], axis=1
    ).astype(np.float32)

    return {
        "tris": tris,
        "bounds": bounds,
        "prim": prim.reshape(-1),
        "n_tris": T,
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(bounds_ref, tri_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
            t_out, lid_out, u_out, v_out, *, tmin, n_clusters):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])

    # Safe reciprocal direction for the slab test (sign-preserving clamp).
    def inv(x):
        return 1.0 / jnp.where(jnp.abs(x) < 1e-12,
                               jnp.where(x < 0, -1e-12, 1e-12), x)

    invd = (inv(d[0]), inv(d[1]), inv(d[2]))

    zeros = jnp.zeros(o[0].shape, jnp.float32)
    best = (tmax_ref[:], jnp.full(o[0].shape, -1, jnp.int32), zeros, zeros)

    def cluster_body(ci, best):
        c = ci
        bx0 = bounds_ref[c, 0]
        by0 = bounds_ref[c, 1]
        bz0 = bounds_ref[c, 2]
        bx1 = bounds_ref[c, 3]
        by1 = bounds_ref[c, 4]
        bz1 = bounds_ref[c, 5]

        best_t = best[0]
        t0x = (bx0 - o[0]) * invd[0]
        t1x = (bx1 - o[0]) * invd[0]
        t0y = (by0 - o[1]) * invd[1]
        t1y = (by1 - o[1]) * invd[1]
        t0z = (bz0 - o[2]) * invd[2]
        t1z = (bz1 - o[2]) * invd[2]
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tmin),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), best_t),
        )
        live = jnp.sum(jnp.where(tn <= tf, 1.0, 0.0)) > 0.0

        def process(best):
            def intersect_one(k, bt):
                """One scalar-splat Moller-Trumbore test; returns
                (ok, t, u, v, lid) without the select chain (so unrolled
                iterations run as independent instruction chains)."""
                p0x = tri_ref[ci, 0, k]
                p0y = tri_ref[ci, 1, k]
                p0z = tri_ref[ci, 2, k]
                e1x = tri_ref[ci, 3, k]
                e1y = tri_ref[ci, 4, k]
                e1z = tri_ref[ci, 5, k]
                e2x = tri_ref[ci, 6, k]
                e2y = tri_ref[ci, 7, k]
                e2z = tri_ref[ci, 8, k]

                pvx = d[1] * e2z - d[2] * e2y
                pvy = d[2] * e2x - d[0] * e2z
                pvz = d[0] * e2y - d[1] * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                det_safe = jnp.where(
                    jnp.abs(det) < 1e-12,
                    jnp.where(det < 0, -1e-12, 1e-12), det,
                )
                invdet = 1.0 / det_safe
                tvx = o[0] - p0x
                tvy = o[1] - p0y
                tvz = o[2] - p0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * invdet
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * invdet
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * invdet
                ok = (
                    (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > tmin) & (t < bt)
                )
                return ok, t, u, v, c * CLUSTER + k

            def tri_body(kk, best):
                # 2-wide unroll: the two MT chains are independent, filling
                # the VPU pipeline; selects merge them afterwards.
                bt, bl, bu, bv = best
                k0 = kk * 2
                ok0, t0, u0, v0, l0 = intersect_one(k0, bt)
                ok1, t1, u1, v1, l1 = intersect_one(k0 + 1, bt)
                # prefer the closer of the two when both hit
                take1 = ok1 & (~ok0 | (t1 < t0))
                ok = ok0 | ok1
                t = jnp.where(take1, t1, t0)
                u = jnp.where(take1, u1, u0)
                v = jnp.where(take1, v1, v0)
                lid = jnp.where(take1, l1, l0)
                return (
                    jnp.where(ok, t, bt),
                    jnp.where(ok, lid, bl),
                    jnp.where(ok, u, bu),
                    jnp.where(ok, v, bv),
                )

            return jax.lax.fori_loop(0, CLUSTER // 2, tri_body, best)

        return jax.lax.cond(live, process, lambda b: b, best)

    best = jax.lax.fori_loop(0, n_clusters, cluster_body, best)
    t_out[:] = best[0]
    lid_out[:] = best[1]
    u_out[:] = best[2]
    v_out[:] = best[3]


@functools.partial(jax.jit, static_argnames=("tm", "tmin", "interpret"))
def _mesh_sweep(bounds, tris, o, d, tmax, *, tm, tmin, interpret):
    """Sweep rays against one segment's clusters (all SMEM-resident).

    o, d: [N, 3] with N % (tm*128) == 0; tmax [N] doubles as the incoming
    best-t (segment chaining).  Returns (t, lid, u, v) flat [N]; lid is
    segment-local (the caller adds the segment offset).
    """
    n = o.shape[0]
    rows = n // 128
    grid = rows // tm
    n_clusters = tris.shape[0]

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.broadcast_to(tmax, (n,))]
    comps = [c.reshape(rows, 128) for c in comps]

    ray_block = pl.BlockSpec((tm, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # bounds + tri table: SMEM-resident, loaded once
        grid=(grid,),
        in_specs=[ray_block] * 7,
        out_specs=[ray_block] * 4,
    )
    out_shape = [
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    ]
    kern = functools.partial(_kernel, tmin=tmin, n_clusters=n_clusters)
    t, lid, u, v = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(bounds, tris, *comps)
    return t.reshape(-1), lid.reshape(-1), u.reshape(-1), v.reshape(-1)


# ---------------------------------------------------------------------------
# Public entry: padding, remap, detached-gradient wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mesh_intersect_core(tm, tmin, interpret, bounds, tris, o, d, tmax):
    """Segmented sweep: each SEGMENT_C-cluster slice gets its own kernel
    call (tables SMEM-resident per call); segments chain through tmax and
    merge with elementwise selects."""
    C = tris.shape[0]
    best = None
    for s0 in range(0, C, SEGMENT_C):
        s1 = min(s0 + SEGMENT_C, C)
        cur_tmax = tmax if best is None else best[0]
        t, lid, u, v = _mesh_sweep(
            bounds[s0:s1], tris[s0:s1], o, d, cur_tmax,
            tm=tm, tmin=tmin, interpret=interpret,
        )
        lid = jnp.where(lid >= 0, lid + s0 * CLUSTER, lid)
        if best is None:
            best = (t, lid, u, v)
        else:
            # within the segment t was initialized from best[0], so any
            # improvement shows up as t < best[0]
            closer = lid >= 0
            best = (
                jnp.where(closer, t, best[0]),
                jnp.where(closer, lid, best[1]),
                jnp.where(closer, u, best[2]),
                jnp.where(closer, v, best[3]),
            )
    return best


def _core_fwd(tm, tmin, interpret, bounds, tris, o, d, tmax):
    return _mesh_intersect_core(tm, tmin, interpret, bounds, tris, o, d, tmax), None


def _core_bwd(tm, tmin, interpret, _res, _g):
    # Detached estimator: (t, lid, u, v) treated as locally constant w.r.t.
    # geometry and ray — matches the reference's scope (only BSDF params are
    # differentiated, USMain.py:264); hit positions still get gradients via
    # p = o + t*d with t detached.
    return (None, None, None, None, None)


_mesh_intersect_core.defvjp(_core_fwd, _core_bwd)


def mesh_intersect(clusters, o, d, tmin=1e-4, tmax=None, tm=DEFAULT_TM,
                   interpret=None):
    """Closest-hit query against a clustered triangle table.

    Args:
      clusters: dict from build_clusters (arrays may be jnp or np).
      o, d: [N, 3] ray origins/directions (any N; padded internally).
      tmax: scalar or [N] max distance (default: miss sentinel).
    Returns:
      (t [N], prim [N] global tri id (-1 miss), u [N], v [N]).
    """
    if interpret is None:
        interpret = INTERPRET
    n = o.shape[0]
    tile = tm * 128
    pad = (-n) % tile
    if tmax is None:
        tmax = jnp.full((n,), 0.99 * _BIG, jnp.float32)
    else:
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], 0)
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 3))], 0
        )
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), jnp.float32)], 0)

    bounds = jnp.asarray(clusters["bounds"])
    tris = jnp.asarray(clusters["tris"])
    t, lid, u, v = _mesh_intersect_core(
        tm, float(tmin), bool(interpret), bounds, tris, o, d, tmax
    )
    t, lid, u, v = t[:n], lid[:n], u[:n], v[:n]
    prim_map = jnp.asarray(clusters["prim"])
    prim = jnp.where(lid >= 0, prim_map[jnp.maximum(lid, 0)], -1)
    return t, prim, u, v
