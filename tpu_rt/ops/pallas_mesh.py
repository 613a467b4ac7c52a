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
# Clusters per kernel call: the whole (SEGMENT_C*rows, 128) table rides the
# scalar-prefetch operand, SMEM-resident across ALL grid steps.  Streaming
# it as blocked SMEM inputs instead (round-2 first attempt) bottlenecked on
# SMEM DMA bandwidth: a do-nothing kernel took as long as the full sweep.
# Tables are flattened to 2D at the pallas_call boundary (r5): Mosaic
# stores each 2D slice of a 3D operand in (8,128) tiles, so the old
# (C, 9, 128) layout padded 9 rows to 16 — the "64 clusters = 288 KiB"
# r2 estimate was actually 512 KiB on-chip.  Flat: 64 BW clusters = 384K,
# 128 = 768K of the 1 MiB (v5e).  128 measured bunny 85.4M vs 77.9M at
# 64 (fewer per-segment launches + host culls; teapot single-segment
# either way, r5 A/B on v5e).
SEGMENT_C = int(os.environ.get("TPU_RT_MESH_SEGMENT_C", "128"))
# Fused segmented sweep (multi-segment meshes): ONE pallas_call over a
# (segments, ray-blocks) grid with the tables streamed as blocked SMEM
# inputs and the running best in VMEM scratch — built to remove the
# serial per-segment SMEM table loads (the "empty" floor drops 0.80 ->
# 0.28 ms on bunny, tools/diag_mesh_floor.py).  Measured r5 (v5e,
# interleaved same-process A/B, tools/ab_mesh.py): bunny full wave
# fused 3.4-3.7 ms vs chained 2.9-3.2 ms — the floor win is offset by
# the finer 64-cluster segment granularity (13 vs 7 segment visits per
# block) and the loss of tmax chaining in the host cull, and the tunnel's
# ±0.4 ms slope noise swallows the difference.  Default OFF ("auto");
# TPU_RT_MESH_FUSED=1 forces it on (bit-identical results, see
# tests/test_pallas_mesh.py::test_fused_segmented_sweep_matches_per_segment_calls).
_FUSED_MODE = os.environ.get("TPU_RT_MESH_FUSED", "auto")
FUSED_C = int(os.environ.get("TPU_RT_MESH_FUSED_C", "64"))


def _fused_on(n_clusters: int) -> bool:
    return _FUSED_MODE == "1"
# The fused DIRECT kernel carries tris (9 rows) + shade (12 rows) + the
# shadow live-lists together, so its single-segment scope keeps the
# tighter 64-cluster cap (9216 B/cluster -> 128 would OOM the 1 MiB).
DIRECT_C = 64
CHUNK_C = 16           # cluster-count padding granularity
# Ray-tile rows: 16 rows x 128 lanes = 2048 rays/block.  Measured on v5e
# (512^2 tile-ordered primary rays, slope timing, tools/bench_mesh.py,
# superclusters on): bunny tm=8/16/32 = 20.8/30.1/23.3M rays/s and teapot
# tm=16 87.4M vs tm=32 79.5M — the smaller tile footprint culls more
# clusters than the extra per-cluster branch overhead costs (round 2 only
# compared 32 vs 8 and picked 32).
DEFAULT_TM = 16
_BIG = 1e8             # finite miss sentinel (see geometry.trace.INF)

# Tests on the CPU backend set this to run the kernel in interpret mode.
INTERPRET = False

# Per-block front-to-back live-cluster ordering (see _block_live_clusters).
_F2B = os.environ.get("TPU_RT_MESH_F2B", "1") == "1"

# Rows per host-cull interval group (see _block_live_clusters).
_SUBCULL_ROWS = int(os.environ.get("TPU_RT_MESH_SUBCULL_ROWS", "1"))

# Triangle-test form: "bw" = precomputed-transform 12-row table
# (_bw_table), "mt" = Moller-Trumbore 9-row p0/e1/e2 table.  The table
# shape selects the in-kernel formula; this knob selects the table.
_TRI_MODE = os.environ.get("TPU_RT_MESH_TRI", "bw")

# Sub-tile span granularity: split each (tm, 128) ray block into `halves`
# independent 8-row sub-tiles, each with its OWN host live-cluster list and
# its own quarter-span sweep.  Tile lanes are divergent (bunny model,
# tools/diag_mesh_span.py: per-8-row spans are 62.8% of the block-level
# lane-tests; the per-lane floor is 3.7%), so finer granularity cuts VPU
# *data* work — but MEASURED SLOWER on v5e (bunny 69.7 -> 63.5M, teapot
# 470 -> 407M): the sweep loop is latency/issue-bound per iteration, not
# vector-width-bound, so halving the operand height leaves iteration cost
# flat while doubling cluster visits.  Default 1; knob kept for re-testing
# on future TPU generations where the VPU/scalar balance differs.
_HALVES_MODE = os.environ.get("TPU_RT_MESH_HALVES", "1")

# Triangle tests per sweep-loop iteration.  Each test is one long
# dependency chain (~12 sequential vector ops); the chains are independent
# across triangles, so a wider unroll fills the VPU pipeline (the r3
# 2-wide unroll bought the first step of this).
_UNROLL = int(os.environ.get("TPU_RT_MESH_UNROLL", "4"))


def _halves_for(tm: int, n_segments: int) -> int:
    hv = max(1, int(_HALVES_MODE)) if _HALVES_MODE not in ("", "auto") else 1
    while hv > 1 and (tm % hv or (tm // hv) % 8):
        hv -= 1
    return max(1, hv)

# Hierarchical in-kernel cull: slab-test the treelet ROOT box (cols 0-5)
# first and branch into the four quarter tests only when some lane can hit
# it.  Clusters the root rejects pay 1 slab test instead of 4; clusters it
# admits pay 5.  Measured (v5e, tools/bench_mesh.py): teapot 606 -> 726M
# (F2B + shrinking best_t root-kill far clusters) but bunny 64.3 -> 60.2M
# (its host-live clusters mostly pass the root, so the extra test is pure
# overhead) — "auto" enables it only for single-segment (teapot-class)
# meshes, where the whole table is hot and F2B ordering makes root kills
# common.  TPU_RT_MESH_ROOT_CULL=0/1 forces.
_ROOT_CULL_MODE = os.environ.get("TPU_RT_MESH_ROOT_CULL", "auto")


def _root_cull_on(n_segments: int) -> bool:
    if _ROOT_CULL_MODE == "1":
        return True
    if _ROOT_CULL_MODE == "0":
        return False
    return n_segments <= 1


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


def build_shading_table(clusters, tri_n0, tri_n1, tri_n2, tri_albedo):
    """Per-cluster shading rows for the fused direct-illumination kernel.

    Returns (Cp, 12, 128) f32: rows 0-8 = vertex normals n0/n1/n2 xyz
    (matching the cluster triangle order), rows 9-11 = diffuse albedo rgb.
    """
    prim = np.asarray(clusters["prim"]).reshape(-1, CLUSTER)
    Cp = prim.shape[0]
    n0 = np.asarray(tri_n0, np.float32)[prim]  # (Cp, 128, 3)
    n1 = np.asarray(tri_n1, np.float32)[prim]
    n2 = np.asarray(tri_n2, np.float32)[prim]
    alb = np.asarray(tri_albedo, np.float32)[prim]
    out = np.empty((Cp, 12, CLUSTER), np.float32)
    for j in range(3):
        out[:, 0 + j] = n0[..., j]
        out[:, 3 + j] = n1[..., j]
        out[:, 6 + j] = n2[..., j]
        out[:, 9 + j] = alb[..., j]
    return out


def build_clusters(tri_p0, tri_e1, tri_e2, prim_order=None, bvh=None,
                   max_count=CLUSTER):
    """Group triangles into spatial clusters of <= CLUSTER, padded.

    Args:
      tri_p0, tri_e1, tri_e2: [T, 3] float32 (world-space, e = p_i - p0).
      prim_order: optional [>=T] spatial permutation; only entries < T are
        used.  Identity when None.
      bvh: optional BVH dict (geometry.bvh.build_bvh output) — when given,
        clusters are maximal BVH treelets (tight bounds); prim_order is
        taken from it.
      max_count: treelet size cap (<= CLUSTER).  Smaller treelets leave
        table lanes empty but give tighter AABBs; with dynamic trip counts
        the sweep only pays for real triangles, so divergence-bound meshes
        can win (the r2 CLUSTER=64 experiment narrowed the TABLE and lost
        lane occupancy — this knob keeps the (9, 128) layout).
    Returns dict:
      tris:   (Cp, 9, 128) f32 — components (p0x..p0z, e1x..e1z, e2x..e2z)
      bounds: (Cp, 32) f32 — cols 0-5 cluster AABB (minx..maxz), col 6 the
              unpadded triangle count (kernels sweep only live lanes —
              treelet clusters average ~87/128 full; bunny pads were 32% of
              sweep work), col 7 zero; cols 8-31 four QUARTER AABBs (tris
              [i*k/4, (i+1)*k/4) in cluster order, 6 cols each) — the
              intersect kernel slab-tests quarters and sweeps only the
              contiguous live span (empty quarters get far-point boxes)
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
        for s, e in _treelet_ranges(bvh, T, max_count=max_count):
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
    # Quarter sub-boxes (far-point boxes for empty quarters/pad clusters).
    qmin = np.full((Cp, 4, 3), 1e30, np.float32)
    qmax = np.full((Cp, 4, 3), 1e30, np.float32)
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
        for qi in range(4):
            s, e = (qi * k) // 4, ((qi + 1) * k) // 4
            if e <= s:
                continue
            qv = np.concatenate(
                [cp0[s:e], cp0[s:e] + ce1[s:e], cp0[s:e] + ce2[s:e]], 0
            )
            qmin[c, qi] = qv.min(axis=0)
            qmax[c, qi] = qv.max(axis=0)

    counts = np.zeros((Cp, 1), np.float32)
    for c, ids in enumerate(groups):
        counts[c, 0] = ids.shape[0]
    qboxes = np.concatenate([qmin, qmax], axis=2).reshape(Cp, 24)
    bounds = np.concatenate(
        [bmin, bmax, counts, np.zeros((Cp, 1), np.float32), qboxes], axis=1
    ).astype(np.float32)

    return {
        "tris": tris,
        "trisw": _bw_table(tris),
        "bounds": bounds,
        "prim": prim.reshape(-1),
        "n_tris": T,
    }


def _bw_table(tris):
    """Precomputed-transform (Baldwin-Weber style) triangle table from the
    (Cp, 9, 128) p0/e1/e2 layout: rows 0-2 the (unnormalized) plane normal
    n = e1 x e2, rows 3-5 p0, rows 6-8 r1 and 9-11 r2 — the barycentric
    rows of [e1 e2 n]^-1.  In-kernel:
        tv = o - p0;  t = -(n.tv)/(n.d);  q = tv + t d  (hit rel. p0);
        u = r1.q;  v = r2.q
    ~25 VPU ops/tri vs ~45 for Moller-Trumbore, and n doubles as the
    geometric normal (no in-kernel cross product).  The subtract-first
    form keeps MT-grade f32 precision (a c0 = n.p0 plane-offset variant
    measured ~1e-4 absolute error from large-constant cancellation).
    Constants are computed in float64 and rounded once.  Degenerate pad
    triangles produce all-zero rows: den clamps, t = 0 fails t > tmin,
    so pads can never hit (same contract as the MT path).
    """
    p0 = tris[:, 0:3].astype(np.float64)  # (Cp, 3, 128)
    e1 = tris[:, 3:6].astype(np.float64)
    e2 = tris[:, 6:9].astype(np.float64)
    n = np.cross(e1, e2, axis=1)
    det = (n * n).sum(axis=1, keepdims=True)  # |n|^2 = det[e1 e2 n]
    good = det > 1e-30
    inv = np.where(good, 1.0 / np.where(good, det, 1.0), 0.0)
    r1 = np.cross(e2, n, axis=1) * inv
    r2 = np.cross(n, e1, axis=1) * inv
    out = np.concatenate([n, np.where(good, p0, 0.0), r1, r2], axis=1)
    return np.where(np.broadcast_to(good, out.shape) & (out == out),
                    out, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(ids_ref, nlive_ref, bounds_ref, tri_ref, ox, oy, oz, dx, dy, dz,
            tmax_ref, t_out, lid_out, u_out, v_out, *, tmin, n_clusters,
            root_cull, halves, tri_rows):
    # Hoisted: pl.program_id cannot be lowered inside fori bodies in
    # interpret mode (r3 note).
    pid = pl.program_id(0)
    hr = ox.shape[0] // halves
    # Each 8-row sub-tile sweeps independently: its own live-cluster list
    # (host cull at sub-tile granularity) and its own quarter spans — tile
    # lanes are divergent, so finer granularity skips real VPU work
    # (tools/diag_mesh_span.py).  Python loop = unrolled in the program.
    for h in range(halves):
        _kernel_half(ids_ref, nlive_ref, bounds_ref, tri_ref,
                     ox, oy, oz, dx, dy, dz, tmax_ref,
                     t_out, lid_out, u_out, v_out,
                     pid * halves + h, slice(h * hr, (h + 1) * hr),
                     tmin=tmin, root_cull=root_cull, tri_rows=tri_rows)


def _kernel_half(ids_ref, nlive_ref, bounds_ref, tri_ref, ox, oy, oz, dx, dy,
                 dz, tmax_ref, t_out, lid_out, u_out, v_out, list_i, sl, *,
                 tmin, root_cull, tri_rows):
    o = (ox[sl], oy[sl], oz[sl])
    d = (dx[sl], dy[sl], dz[sl])
    zeros = jnp.zeros(o[0].shape, jnp.float32)
    best = (tmax_ref[sl], jnp.full(o[0].shape, -1, jnp.int32), zeros, zeros)
    best = _sweep_live(ids_ref, nlive_ref, bounds_ref, tri_ref, o, d, best,
                       list_i, tmin=tmin, root_cull=root_cull,
                       tri_rows=tri_rows)
    t_out[sl] = best[0]
    lid_out[sl] = best[1]
    u_out[sl] = best[2]
    v_out[sl] = best[3]


def _sweep_live(ids_ref, nlive_ref, bounds_ref, tri_ref, o, d, best, list_i,
                *, tmin, root_cull, tri_rows, cid_off=0, packed_c=0):
    """Sweep one ray (sub-)tile against its live-cluster list; returns the
    updated (t, lid, u, v) best tuple.  ``cid_off`` offsets the reported
    local id by a cluster count (the fused segmented kernel passes the
    traced segment base so lids come out table-global).

    ``packed_c`` (the fused kernel's segment size, 0 = direct 2D layout):
    blocked SMEM operands pad their lane dimension to 128, so the fused
    path flattens ids/nlive/bounds to exact-size (rows, 128) tables and
    indexes them through flat div/mod accessors (powers of two -> shifts).
    """
    if packed_c:
        def get_id(j):
            f = list_i * packed_c + j
            return ids_ref[f // 128, f % 128]

        def get_n():
            return nlive_ref[list_i // 128, list_i % 128]

        def bget(c, col):
            f = c * 32 + col
            return bounds_ref[f // 128, f % 128]
    else:
        def get_id(j):
            return ids_ref[list_i, j]

        def get_n():
            return nlive_ref[list_i, 0]

        def bget(c, col):
            return bounds_ref[c, col]

    # Safe reciprocal direction for the slab test (sign-preserving clamp).
    def inv(x):
        return 1.0 / jnp.where(jnp.abs(x) < 1e-12,
                               jnp.where(x < 0, -1e-12, 1e-12), x)

    invd = (inv(d[0]), inv(d[1]), inv(d[2]))

    def cluster_body(ci, best):
        c = ci
        best_t = best[0]

        def slab_live(col):
            """Tile-level slab test of the AABB at bounds cols
            [col, col+6) against all rays, bounded by each lane's
            current best_t; returns a scalar 'any lane can hit'."""
            t0x = (bget(c, col + 0) - o[0]) * invd[0]
            t1x = (bget(c, col + 3) - o[0]) * invd[0]
            t0y = (bget(c, col + 1) - o[1]) * invd[1]
            t1y = (bget(c, col + 4) - o[1]) * invd[1]
            t0z = (bget(c, col + 2) - o[2]) * invd[2]
            t1z = (bget(c, col + 5) - o[2]) * invd[2]
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), best_t),
            )
            return jnp.sum(jnp.where(tn <= tf, 1.0, 0.0)) > 0.0

        # Quarter-resolution cull: slab-test the four quarter sub-boxes
        # (cols 8..31) and sweep only the contiguous live span — a ray
        # tile clipping a treelet's corner sweeps ~k/4 tris instead of k
        # (bunny live tiles are sweep-bound; per-lane masking can't skip
        # VPU work, but the span bounds can).
        def quarters(best):
            l0 = slab_live(8)
            l1 = slab_live(14)
            l2 = slab_live(20)
            l3 = slab_live(26)
            live = l0 | l1 | l2 | l3

            def process(best):
                # Cluster tables are FLATTENED to (C*rows, 128) at the
                # pallas_call boundary: Mosaic stores each 2D SMEM slice in
                # (8, 128) tiles, so a (C, 9, 128) operand pads 9 -> 16 rows
                # per cluster (+78% SMEM; the r4 treelet auto-tune pushed the
                # direct kernel to 1.13 MiB and OOMed simple.xml on
                # hardware).  The flat layout is exact-size.
                base = ci * tri_rows

                def intersect_one_bw(k, bt):
                    """One precomputed-transform (Baldwin-Weber) test from
                    the 12-row table (_bw_table): ~25 VPU ops vs ~45 for
                    Moller-Trumbore; returns (ok, t, u, v, lid)."""
                    nx = tri_ref[base + 0, k]
                    ny = tri_ref[base + 1, k]
                    nz = tri_ref[base + 2, k]
                    tvx = o[0] - tri_ref[base + 3, k]
                    tvy = o[1] - tri_ref[base + 4, k]
                    tvz = o[2] - tri_ref[base + 5, k]
                    den = nx * d[0] + ny * d[1] + nz * d[2]
                    den_safe = jnp.where(
                        jnp.abs(den) < 1e-12,
                        jnp.where(den < 0, -1e-12, 1e-12), den,
                    )
                    t = -(nx * tvx + ny * tvy + nz * tvz) / den_safe
                    qx = tvx + t * d[0]
                    qy = tvy + t * d[1]
                    qz = tvz + t * d[2]
                    u = (tri_ref[base + 6, k] * qx + tri_ref[base + 7, k] * qy
                         + tri_ref[base + 8, k] * qz)
                    v = (tri_ref[base + 9, k] * qx + tri_ref[base + 10, k] * qy
                         + tri_ref[base + 11, k] * qz)
                    ok = (
                        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > tmin) & (t < bt)
                    )
                    return ok, t, u, v, (cid_off + c) * CLUSTER + k

                def intersect_one_mt(k, bt):
                    """One scalar-splat Moller-Trumbore test; returns
                    (ok, t, u, v, lid) without the select chain (so unrolled
                    iterations run as independent instruction chains)."""
                    p0x = tri_ref[base + 0, k]
                    p0y = tri_ref[base + 1, k]
                    p0z = tri_ref[base + 2, k]
                    e1x = tri_ref[base + 3, k]
                    e1y = tri_ref[base + 4, k]
                    e1z = tri_ref[base + 5, k]
                    e2x = tri_ref[base + 6, k]
                    e2y = tri_ref[base + 7, k]
                    e2z = tri_ref[base + 8, k]

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
                    return ok, t, u, v, (cid_off + c) * CLUSTER + k

                # static row count picks the formula: 12 rows = BW, 9 = MT
                intersect_one = (intersect_one_bw if tri_rows == 12
                                 else intersect_one_mt)

                U = max(1, _UNROLL)

                def tri_body(kk, best):
                    # U-wide unroll: the U test chains are independent
                    # (each ~12 sequential vector ops deep), so a wide
                    # unroll keeps the VPU pipeline full; a select
                    # tournament merges them afterwards.
                    bt, bl, bu, bv = best
                    k0 = kk * U
                    res = [intersect_one(k0 + i, bt) for i in range(U)]
                    # pairwise closer-hit tournament
                    while len(res) > 1:
                        nxt = []
                        for i in range(0, len(res) - 1, 2):
                            oa, ta, ua, va, la = res[i]
                            ob, tb, ub, vb, lb = res[i + 1]
                            tkb = ob & (~oa | (tb < ta))
                            nxt.append((
                                oa | ob,
                                jnp.where(tkb, tb, ta),
                                jnp.where(tkb, ub, ua),
                                jnp.where(tkb, vb, va),
                                jnp.where(tkb, lb, la),
                            ))
                        if len(res) % 2:
                            nxt.append(res[-1])
                        res = nxt
                    ok, t, u, v, lid = res[0]
                    return (
                        jnp.where(ok, t, bt),
                        jnp.where(ok, lid, bl),
                        jnp.where(ok, u, bu),
                        jnp.where(ok, v, bv),
                    )

                # Sweep only the contiguous live-quarter span of the live
                # lanes (quarter boundaries q_i = i*k//4 derive from the
                # count; pads at the tail can never hit — degenerate, t=0).
                k = bget(c, 6).astype(jnp.int32)
                q1 = k // 4
                q2 = k // 2
                q3 = (3 * k) // 4
                s_tri = jnp.where(l0, 0, jnp.where(l1, q1,
                                  jnp.where(l2, q2, q3)))
                e_tri = jnp.where(l3, k, jnp.where(l2, q3,
                                  jnp.where(l1, q2, q1)))
                # U-wide iterations: kk covers tris {U*kk .. U*kk+U-1};
                # start floors so a boundary-straddling group is still
                # tested (extra tests are correct, never skipped ones).
                return jax.lax.fori_loop(s_tri // U, (e_tri + U - 1) // U,
                                         tri_body, best)

            return jax.lax.cond(live, process, lambda b: b, best)

        if not root_cull:
            return quarters(best)
        # Root-box gate: one slab test decides whether the four quarter
        # tests (and everything below) run at all.
        return jax.lax.cond(slab_live(0), quarters, lambda b: b, best)

    # Sweep only this ray block's conservatively-live clusters: the host
    # pre-pass (interval slab test over the block's o/d/tmax ranges,
    # _block_live_clusters) compacted their ids to the front of
    # ids_ref[pid] in cluster order, so results stay bit-identical while
    # dead clusters cost NOTHING in-kernel (r3 measurement: bunny spent
    # 2.94 of 7.99 ms/wave on in-kernel cull alone).
    def live_body(j, best):
        return cluster_body(get_id(j), best)

    return jax.lax.fori_loop(0, get_n(), live_body, best)


def _kernel_fused(ids_ref, nlive_ref, bounds_ref, tri_ref, ox, oy, oz, dx,
                  dy, dz, tmax_ref, t_out, lid_out, u_out, v_out,
                  ts, ls, us, vs, *, tmin, root_cull, halves, tri_rows,
                  tm, seg_c):
    """Fused segmented sweep: ONE pallas_call over a (segments, ray-blocks)
    grid.  The per-segment cluster tables arrive as blocked SMEM inputs the
    pipeline streams HBM->SMEM (segment-outer order: one table DMA per
    segment, overlapped with the previous segment's ray blocks), and the
    running best hit lives in VMEM scratch across grid steps — replacing
    the per-segment python loop of pallas calls whose serial SMEM table
    loads were 29% of the bunny wave (tools/diag_mesh_floor.py: 0.80 of
    2.73 ms; r5).  Results are bit-identical to the chained form: each
    segment's host live list here is a superset (no tmax chaining), and
    the extra clusters all fail the same in-kernel best_t slab gates."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    row0 = b * tm

    @pl.when(s == 0)
    def _init():
        ts[pl.ds(row0, tm)] = tmax_ref[:]
        ls[pl.ds(row0, tm)] = jnp.full((tm, 128), -1, jnp.int32)
        us[pl.ds(row0, tm)] = jnp.zeros((tm, 128), jnp.float32)
        vs[pl.ds(row0, tm)] = jnp.zeros((tm, 128), jnp.float32)

    hr = tm // halves
    cid_off = s * seg_c
    for h in range(halves):
        sl = slice(h * hr, (h + 1) * hr)
        ssl = pl.ds(row0 + h * hr, hr)
        o = (ox[sl], oy[sl], oz[sl])
        d = (dx[sl], dy[sl], dz[sl])
        best = (ts[ssl], ls[ssl], us[ssl], vs[ssl])
        best = _sweep_live(ids_ref, nlive_ref, bounds_ref, tri_ref, o, d,
                           best, b * halves + h, tmin=tmin,
                           root_cull=root_cull, tri_rows=tri_rows,
                           cid_off=cid_off, packed_c=seg_c)
        ts[ssl] = best[0]
        ls[ssl] = best[1]
        us[ssl] = best[2]
        vs[ssl] = best[3]
        # Out blocks are revisited once per segment (write-only, full
        # overwrite): earlier segments' write-backs are dead stores the
        # final segment's values overwrite in grid order.
        t_out[sl] = best[0]
        lid_out[sl] = best[1]
        u_out[sl] = best[2]
        v_out[sl] = best[3]


def _block_live_clusters(bounds, comps, grid, tm, tmin, halves=1):
    """Conservative per-ray-block cluster cull on the XLA side.

    For each (tm, 128) ray block, interval arithmetic over the block's
    origin/direction/tmax component ranges bounds the slab test for every
    cluster AABB: a cluster whose lower-bounded t_near exceeds its
    upper-bounded t_far for the WHOLE block can be hit by no ray in it.
    Live cluster ids are compacted to the front (stable, preserving
    cluster order so kernel results are bit-identical) and the kernel
    loops only over them.  Replaces the round-2 in-kernel supercluster
    level: same idea, but the decision is made once per block in batched
    XLA instead of per grid step in scalar SMEM code.

    Returns (ids (grid, C) i32, nlive (grid, 1) i32).
    """
    # Sub-block granularity: interval-test groups of `sr` rows and OR the
    # group results into the block decision.  Intervals over 128-2048
    # coherent tile-order rays are loose (a block's direction cone is
    # wide); per-row intervals are near-exact, so fewer tile-dead clusters
    # reach the kernel's 4-slab-test loop.  Host cost is trivial
    # (grid*nsub x C scalar interval tests in batched XLA).
    hr = tm // halves  # rows per independent sub-tile (kernel halves)
    sr = max(1, min(_SUBCULL_ROWS, hr))
    while hr % sr:
        sr -= 1
    nsub = tm // sr

    def rng(x):  # (rows, 128) -> per-sub-block (grid*nsub, 1) lo/hi
        xb = x.reshape(grid * nsub, sr * 128)
        return xb.min(1, keepdims=True), xb.max(1, keepdims=True)

    olo, ohi = zip(*(rng(c) for c in comps[0:3]))
    dlo, dhi = zip(*(rng(c) for c in comps[3:6]))
    _, tmx = rng(comps[6])
    live_s, tn_s = _interval_slab_live(bounds, olo, ohi, dlo, dhi, tmx, tmin,
                                       return_tn=True)
    C = live_s.shape[1]
    live = live_s.reshape(grid * halves, nsub // halves, C).any(1)
    tn_lb = jnp.where(live_s, tn_s, jnp.float32(np.inf)) \
        .reshape(grid * halves, nsub // halves, C).min(1)
    # Front-to-back per-block ordering (r4): the kernel bounds every slab
    # test by the lanes' running best_t, so visiting a block's live
    # clusters by their conservative entry distance lets a near hit kill
    # far clusters at the cheap scalar cull.  Per-BLOCK id ordering only —
    # segment grouping (which the r3 global-sort dead end disturbed) is
    # untouched.  Closest-hit results are order-independent except for
    # exact-t ties (strict t < best keeps the first visited).
    return _compact_live(live, order_key=tn_lb if _F2B else None)


def _compact_live(live, order_key=None):
    """(grid, C) bool -> (ids compacted-to-front (grid, C) i32, counts).

    ``order_key`` (grid, C) sorts each block's LIVE ids ascending (dead
    ids sink to the tail); None keeps stable cluster order."""
    if order_key is None:
        ids = jnp.argsort(~live, axis=1, stable=True).astype(jnp.int32)
    else:
        key = jnp.where(live, order_key, jnp.float32(np.inf))
        ids = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    nlive = live.sum(1, keepdims=True).astype(jnp.int32)
    return ids, nlive


def _interval_slab_live(bounds, olo, ohi, dlo, dhi, tmx, tmin,
                        return_tn=False):
    """Interval-arithmetic slab test: per (block, cluster) liveness for rays
    with per-block component intervals o in [olo, ohi], d in [dlo, dhi] and
    parameter range [tmin, tmx].  All inputs broadcast as (grid, 1); returns
    (grid, C) bool, a conservative superset of the kernel's per-lane test."""
    # Interval reciprocal matching the kernel's sign-preserving clamp
    # (|d| < 1e-12 -> +/-1e-12): an interval touching 0 spans +/-1e12.
    def inv_iv(lo, hi):
        spans = (lo < 1e-12) & (hi > -1e-12)
        safe = lambda x: jnp.where(jnp.abs(x) < 1e-12,
                                   jnp.where(x < 0, -1e-12, 1e-12), x)
        return (jnp.where(spans, -1e12, 1.0 / safe(hi)),
                jnp.where(spans, 1e12, 1.0 / safe(lo)))

    tn_lb = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32),
                             olo[0].shape).astype(jnp.float32)
    tf_ub = tmx
    for a in range(3):
        il, ih = inv_iv(dlo[a], dhi[a])
        b0 = bounds[None, :, a]      # (1, C)
        b1 = bounds[None, :, 3 + a]
        lo_t, hi_t = None, None
        for b in (b0, b1):
            s_lo, s_hi = b - ohi[a], b - olo[a]
            p = (s_lo * il, s_lo * ih, s_hi * il, s_hi * ih)
            t_lo = jnp.minimum(jnp.minimum(p[0], p[1]),
                               jnp.minimum(p[2], p[3]))
            t_hi = jnp.maximum(jnp.maximum(p[0], p[1]),
                               jnp.maximum(p[2], p[3]))
            lo_t = t_lo if lo_t is None else jnp.minimum(lo_t, t_lo)
            hi_t = t_hi if hi_t is None else jnp.maximum(hi_t, t_hi)
        # per-ray tn takes min(t0, t1) per axis: lower bound = lo_t;
        # tf takes max(t0, t1): upper bound = hi_t
        tn_lb = jnp.maximum(tn_lb, lo_t)
        tf_ub = jnp.minimum(tf_ub, hi_t)

    live = tn_lb <= tf_ub           # (grid, C), conservative superset
    if return_tn:
        return live, tn_lb
    return live


def _shadow_live_clusters(bounds, comps, grid, tm, lights, mesh_lo, mesh_hi):
    """Per-block cluster cull for the fused direct kernel's SHADOW sweeps.

    Shadow origins are hit points known only in-kernel, but they are
    conservatively bounded host-side: a hit lies on the mesh AND on its
    primary ray, so per block the hit region H is (ray reach region, from
    the block's o/d intervals over t in [0, T]) intersected with the mesh
    AABB (T = farthest mesh-box corner from the block's origin box; camera
    directions are unit so t is distance).  Every shadow segment then goes
    from somewhere in H to the light point: parametrized p(u) = h + u(L-h),
    u in [0,1], its component intervals are origin H and direction L - H,
    which feed the same interval slab test as the closest sweep.  Purely
    conservative: real segments are a subset, interval arithmetic only adds
    false positives.

    Returns (ids (n_lights*grid, C) i32, nlive (n_lights*grid, 1) i32),
    flattened so the kernel indexes [li*grid + pid].
    """
    blk = tm * 128

    def rng(x):
        xb = x.reshape(grid, blk)
        return xb.min(1, keepdims=True), xb.max(1, keepdims=True)

    olo, ohi = zip(*(rng(c) for c in comps[0:3]))
    dlo, dhi = zip(*(rng(c) for c in comps[3:6]))

    # farthest distance from the origin box to the mesh box, per component
    T2 = None
    for a in range(3):
        span = jnp.maximum(jnp.abs(mesh_hi[a] - olo[a]),
                           jnp.abs(ohi[a] - mesh_lo[a]))
        T2 = span * span if T2 is None else T2 + span * span
    T = jnp.sqrt(T2)

    hit_lo, hit_hi, empty = [], [], None
    for a in range(3):
        # t*d over t in [0, T]: products of interval endpoints
        p0, p1 = T * dlo[a], T * dhi[a]
        td_lo = jnp.minimum(jnp.minimum(p0, p1), 0.0)
        td_hi = jnp.maximum(jnp.maximum(p0, p1), 0.0)
        lo = jnp.maximum(olo[a] + td_lo, mesh_lo[a])
        hi = jnp.minimum(ohi[a] + td_hi, mesh_hi[a])
        e = lo > hi  # block's rays cannot reach the mesh box at all
        empty = e if empty is None else (empty | e)
        hit_lo.append(lo)
        hit_hi.append(hi)

    ids_l, n_l = [], []
    one = jnp.ones_like(T)
    for (lpos, _i) in lights:
        slo = [lpos[a] - hit_hi[a] for a in range(3)]
        shi = [lpos[a] - hit_lo[a] for a in range(3)]
        live = _interval_slab_live(bounds, hit_lo, hit_hi, slo, shi,
                                   one, 0.0)
        live = live & ~empty
        ids, nlive = _compact_live(live)
        ids_l.append(ids)
        n_l.append(nlive)
    return jnp.concatenate(ids_l, 0), jnp.concatenate(n_l, 0)


@functools.partial(jax.jit, static_argnames=("tm", "tmin", "interpret",
                                              "root_cull", "halves"))
def _mesh_sweep(bounds, tris, o, d, tmax, *, tm, tmin, interpret,
                root_cull=False, halves=1):
    """Sweep rays against one segment's clusters (all SMEM-resident).

    o, d: [N, 3] with N % (tm*128) == 0; tmax [N] doubles as the incoming
    best-t (segment chaining).  Returns (t, lid, u, v) flat [N]; lid is
    segment-local (the caller adds the segment offset).
    """
    n = o.shape[0]
    rows = n // 128
    grid = rows // tm
    n_clusters = tris.shape[0]
    tri_rows = tris.shape[1]
    # Flat (C*rows, 128) SMEM layout: exact-size (see _kernel_half note).
    tris = tris.reshape(n_clusters * tri_rows, 128)

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.broadcast_to(tmax, (n,))]
    comps = [c.reshape(rows, 128) for c in comps]

    ids, nlive = _block_live_clusters(bounds, comps, grid, tm, tmin,
                                      halves=halves)

    ray_block = pl.BlockSpec((tm, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # live ids + counts + bounds + tris (SMEM)
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
    kern = functools.partial(_kernel, tmin=tmin, n_clusters=n_clusters,
                             root_cull=root_cull, halves=halves,
                             tri_rows=tri_rows)
    t, lid, u, v = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, nlive, bounds, tris, *comps)
    return t.reshape(-1), lid.reshape(-1), u.reshape(-1), v.reshape(-1)


def _mesh_sweep_fused(bounds, tris, o, d, tmax, *, tm, tmin, interpret,
                      halves=1):
    """All segments in ONE pallas_call (see _kernel_fused).

    o, d: [N, 3] with N % (tm*128) == 0; tmax [N] is the incoming best-t.
    Returns (t, lid, u, v) flat [N] with lid table-global.
    """
    n = o.shape[0]
    rows = n // 128
    grid = rows // tm
    C = tris.shape[0]
    tri_rows = tris.shape[1]
    seg_c = FUSED_C
    S = -(-C // seg_c)
    Cp = S * seg_c
    if Cp > C:
        # Pad clusters: zero tris (degenerate, t=0 fails t>tmin), far-point
        # AABBs (an inverted box would PASS the slab test), zero counts.
        pad = Cp - C
        tris = jnp.concatenate(
            [tris, jnp.zeros((pad,) + tris.shape[1:], tris.dtype)], 0)
        pb = jnp.full((pad, bounds.shape[1]), 1e30, jnp.float32)
        pb = pb.at[:, 6:8].set(0.0)
        bounds = jnp.concatenate([bounds, pb], 0)

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.broadcast_to(tmax, (n,))]
    comps = [c.reshape(rows, 128) for c in comps]

    # Per-segment host cull with the UNCHAINED tmax (superset of the
    # per-segment-call lists; extras die at the in-kernel best_t gates).
    # Blocked SMEM operands pad lanes to 128, so each per-segment table is
    # flattened row-major into exact-size (rows, 128) blocks and indexed
    # through _sweep_live's packed accessors.
    def pack128(x):
        # (rows, 128) with rows a multiple of 8 (Mosaic block constraint).
        flat = x.reshape(-1)
        p = (-flat.shape[0]) % (8 * 128)
        if p:
            flat = jnp.concatenate([flat, jnp.zeros((p,), flat.dtype)], 0)
        return flat.reshape(-1, 128)

    ids_l, nlive_l, bounds_l = [], [], []
    for s0 in range(0, Cp, seg_c):
        ids_s, nlive_s = _block_live_clusters(
            bounds[s0:s0 + seg_c], comps, grid, tm, tmin, halves=halves)
        ids_l.append(pack128(ids_s))
        nlive_l.append(pack128(nlive_s))
        bounds_l.append(pack128(bounds[s0:s0 + seg_c]))
    r_ids = ids_l[0].shape[0]
    r_n = nlive_l[0].shape[0]
    assert bounds.shape[1] == 32, "packed bget assumes 32-col bounds rows"
    r_b = bounds_l[0].shape[0]
    ids = jnp.concatenate(ids_l, 0)
    nlive = jnp.concatenate(nlive_l, 0)
    bounds_f = jnp.concatenate(bounds_l, 0)

    tris_f = tris.reshape(Cp * tri_rows, 128)

    ray_block = pl.BlockSpec((tm, 128), lambda s, b: (b, 0),
                             memory_space=pltpu.VMEM)
    seg_smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s, b: (s, 0), memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S, grid),
        in_specs=[
            seg_smem((r_ids, 128)),             # live ids (packed)
            seg_smem((r_n, 128)),               # live counts (packed)
            seg_smem((r_b, 128)),               # cluster AABBs (packed)
            seg_smem((seg_c * tri_rows, 128)),  # triangle table
        ] + [ray_block] * 7,
        out_specs=[ray_block] * 4,
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.int32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    ]
    # Root-box gate off, as in the chained multi-segment form: interleaved
    # A/B on v5e measured the extra root cond ~0.4 ms SLOWER on bunny
    # (same direction as the old-path root-cull measurement; the unchained
    # host lists' extra clusters are too few to pay for it — 1242 vs 871
    # live entries, host-side live-list count r5).
    kern = functools.partial(_kernel_fused, tmin=tmin,
                             root_cull=_ROOT_CULL_MODE == "1",
                             halves=halves, tri_rows=tri_rows, tm=tm,
                             seg_c=seg_c)
    t, lid, u, v = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, nlive, bounds_f, tris_f, *comps)
    return t.reshape(-1), lid.reshape(-1), u.reshape(-1), v.reshape(-1)


# ---------------------------------------------------------------------------
# Public entry: padding, remap, detached-gradient wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mesh_intersect_core(tm, tmin, interpret, bounds, tris, o, d, tmax):
    """Segmented sweep.  Multi-segment meshes default to the FUSED form
    (one pallas_call, segment-outer grid, SMEM-streamed tables — see
    _kernel_fused); otherwise each SEGMENT_C-cluster slice gets its own
    kernel call (tables SMEM-resident per call), segments chain through
    tmax and merge with elementwise selects."""
    C = tris.shape[0]
    n_segments = -(-C // SEGMENT_C)
    if n_segments > 1 and _fused_on(C):
        halves = _halves_for(tm, -(-C // FUSED_C))
        return _mesh_sweep_fused(bounds, tris, o, d, tmax, tm=tm, tmin=tmin,
                                 interpret=interpret, halves=halves)
    root_cull = _root_cull_on(n_segments)
    halves = _halves_for(tm, n_segments)
    best = None
    for s0 in range(0, C, SEGMENT_C):
        s1 = min(s0 + SEGMENT_C, C)
        cur_tmax = tmax if best is None else best[0]
        t, lid, u, v = _mesh_sweep(
            bounds[s0:s1], tris[s0:s1], o, d, cur_tmax,
            tm=tm, tmin=tmin, interpret=interpret, root_cull=root_cull,
            halves=halves,
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
    use_bw = _TRI_MODE == "bw" and clusters.get("trisw") is not None
    tris = jnp.asarray(clusters["trisw"] if use_bw else clusters["tris"])
    t, lid, u, v = _mesh_intersect_core(
        tm, float(tmin), bool(interpret), bounds, tris, o, d, tmax
    )
    t, lid, u, v = t[:n], lid[:n], u[:n], v[:n]
    prim_map = jnp.asarray(clusters["prim"])
    prim = jnp.where(lid >= 0, prim_map[jnp.maximum(lid, 0)], -1)
    return t, prim, u, v


# ---------------------------------------------------------------------------
# Fused direct-illumination megakernel (mesh + diffuse + point lights)
# ---------------------------------------------------------------------------
#
# For direct-integrator mesh scenes (simple.xml: teapot + two point lights,
# /root/reference/scenes/simple.xml:23-38) the two-phase path (kernel
# intersect -> XLA shade -> kernel shadow) spent ~80% of its time in the
# XLA glue between sweeps (round-2 measurement: 13M rays/s end-to-end vs
# 152M in-kernel).  This kernel keeps everything on-core: closest-hit sweep
# with inline shading-normal/albedo selection, then one shadow sweep per
# point light, then Lambert shading.  All lights are summed (the XLA path
# samples 1-of-L; equal in expectation).
#
# Scope: single-segment cluster tables (<= DIRECT_C clusters = 8192 tris),
# all-diffuse BSDFs, point lights only.  Outside that, callers fall back to
# the two-phase path.

def _build_direct_kernel(lights, tmin, n_clusters, grid):
    from tpu_rt.ops.pallas_path import _add, _dot, _normalize, _scale

    def kernel(ids_ref, nlive_ref, ids_s_ref, nlive_s_ref, bounds_ref,
               tri_ref, shade_ref, ox, oy, oz, dx, dy, dz, lr, lg, lb, nc):
        # Hoisted: pl.program_id cannot be lowered inside fori bodies in
        # interpret mode (r3 note).
        pid = pl.program_id(0)
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        shape = o[0].shape
        zeros = jnp.zeros(shape, jnp.float32)

        def inv(x):
            return 1.0 / jnp.where(jnp.abs(x) < 1e-12,
                                   jnp.where(x < 0, -1e-12, 1e-12), x)

        def cull(o, d, invd, best_t, c, col=0):
            t0x = (bounds_ref[c, col + 0] - o[0]) * invd[0]
            t1x = (bounds_ref[c, col + 3] - o[0]) * invd[0]
            t0y = (bounds_ref[c, col + 1] - o[1]) * invd[1]
            t1y = (bounds_ref[c, col + 4] - o[1]) * invd[1]
            t0z = (bounds_ref[c, col + 2] - o[2]) * invd[2]
            t1z = (bounds_ref[c, col + 5] - o[2]) * invd[2]
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), best_t),
            )
            return tn <= tf

        def quarter_span(o, d, invd, best_t, c):
            """Slab-test the four quarter sub-boxes (bounds cols 8..31,
            build_clusters) and return (any_live, tri_start, tri_end): the
            contiguous live span of the cluster's triangle list (quarter
            boundaries i*k//4 derive from the count col 6)."""
            def ql(qi):
                return jnp.sum(jnp.where(
                    cull(o, d, invd, best_t, c, col=8 + 6 * qi),
                    1.0, 0.0)) > 0.0

            l0, l1, l2, l3 = ql(0), ql(1), ql(2), ql(3)
            k = bounds_ref[c, 6].astype(jnp.int32)
            q1, q2, q3 = k // 4, k // 2, (3 * k) // 4
            s_tri = jnp.where(l0, 0, jnp.where(l1, q1,
                              jnp.where(l2, q2, q3)))
            e_tri = jnp.where(l3, k, jnp.where(l2, q3,
                              jnp.where(l1, q2, q1)))
            return l0 | l1 | l2 | l3, s_tri, e_tri

        def mt_one(o, d, ci, k, bt):
            # tables ride flattened (C*rows, 128) — see _kernel_half note
            tb = ci * 9
            p0x = tri_ref[tb + 0, k]
            p0y = tri_ref[tb + 1, k]
            p0z = tri_ref[tb + 2, k]
            e1x = tri_ref[tb + 3, k]
            e1y = tri_ref[tb + 4, k]
            e1z = tri_ref[tb + 5, k]
            e2x = tri_ref[tb + 6, k]
            e2y = tri_ref[tb + 7, k]
            e2z = tri_ref[tb + 8, k]
            pvx = d[1] * e2z - d[2] * e2y
            pvy = d[2] * e2x - d[0] * e2z
            pvz = d[0] * e2y - d[1] * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            det_safe = jnp.where(jnp.abs(det) < 1e-12,
                                 jnp.where(det < 0, -1e-12, 1e-12), det)
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
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t > tmin) & (t < bt))
            return ok, t, u, v, (e1x, e1y, e1z, e2x, e2y, e2z)

        # ---- closest-hit sweep with inline shading attributes -------------
        invd = (inv(d[0]), inv(d[1]), inv(d[2]))
        big = jnp.full(shape, 0.99 * _BIG)

        def closest_body(c, best):
            def quarters(best):
                live, s_tri, e_tri = quarter_span(o, d, invd, best[0], c)

                def process(best):
                    def tri_body(k, best):
                        bt, hx, hy, hz = best[0], best[1], best[2], best[3]
                        ok, t, u, v, (e1x, e1y, e1z, e2x, e2y, e2z) = mt_one(o, d, c, k, bt)
                        # shading normal interpolated AT hit time from scalar
                        # vertex normals (3 vector carries instead of 9+uv)
                        w0 = 1.0 - u - v
                        sb = c * 12
                        nsx = (w0 * shade_ref[sb + 0, k]
                               + u * shade_ref[sb + 3, k]
                               + v * shade_ref[sb + 6, k])
                        nsy = (w0 * shade_ref[sb + 1, k]
                               + u * shade_ref[sb + 4, k]
                               + v * shade_ref[sb + 7, k])
                        nsz = (w0 * shade_ref[sb + 2, k]
                               + u * shade_ref[sb + 5, k]
                               + v * shade_ref[sb + 8, k])
                        # geometric normal from scalar edges (scalar-unit math)
                        gx = e1y * e2z - e1z * e2y
                        gy = e1z * e2x - e1x * e2z
                        gz = e1x * e2y - e1y * e2x
                        return (
                            jnp.where(ok, t, bt),
                            jnp.where(ok, nsx, hx),
                            jnp.where(ok, nsy, hy),
                            jnp.where(ok, nsz, hz),
                            jnp.where(ok, gx, best[4]),
                            jnp.where(ok, gy, best[5]),
                            jnp.where(ok, gz, best[6]),
                            jnp.where(ok, shade_ref[sb + 9, k], best[7]),
                            jnp.where(ok, shade_ref[sb + 10, k], best[8]),
                            jnp.where(ok, shade_ref[sb + 11, k], best[9]),
                        )

                    return jax.lax.fori_loop(s_tri, e_tri, tri_body, best)

                return jax.lax.cond(live, process, lambda b: b, best)

            # Root-box gate (single-segment scope; intersect-kernel A/B
            # measured +20% on teapot — tools/bench_mesh.py, r4)
            root = jnp.sum(jnp.where(
                cull(o, d, invd, best[0], c, col=0), 1.0, 0.0)) > 0.0
            return jax.lax.cond(root, quarters, lambda b: b, best)

        # Closest sweep walks only this ray block's conservatively-live
        # clusters (host interval cull, _block_live_clusters — the same
        # compaction that took the intersect kernel 87->321M on teapot).
        # Shadow sweeps walk per-(block, light) live lists from the
        # segment-interval cull (_shadow_live_clusters).
        init = (big,) + (zeros,) * 9

        def closest_live_body(j, best):
            return closest_body(ids_ref[pid, j], best)

        best = jax.lax.fori_loop(0, nlive_ref[pid, 0], closest_live_body,
                                 init)
        t = best[0]
        hit = t < 0.9 * _BIG
        ns = _normalize((best[1], best[2], best[3]))
        ng = _normalize((best[4], best[5], best[6]))
        albedo = (best[7], best[8], best[9])

        p_hit = _add(o, _scale(d, jnp.where(hit, t, 0.0)))
        cos_i = -_dot(ns, d)  # wi = -d; front side requires cos_i > 0
        # spawn offset along the geometric normal (trace.Interaction
        # convention: sign toward the outgoing direction, |p| scale)
        pscale = jnp.maximum(
            1.0, jnp.maximum(jnp.abs(p_hit[0]),
                             jnp.maximum(jnp.abs(p_hit[1]), jnp.abs(p_hit[2])))
        )

        L = (zeros, zeros, zeros)
        # honest ray counting (ADVICE r2): one primary per lane plus one
        # shadow ray per light ONLY where the shadow ray is actually cast
        # (hit + front-facing), matching the XLA renderer's convention
        ray_n = jnp.ones(shape, jnp.float32)
        inv_pi = 1.0 / np.pi
        for li, (lpos, lint) in enumerate(lights):
            to_l = (lpos[0] - p_hit[0], lpos[1] - p_hit[1], lpos[2] - p_hit[2])
            dist2 = jnp.maximum(_dot(to_l, to_l), 1e-20)
            dist = jnp.sqrt(dist2)
            wl = _scale(to_l, 1.0 / dist)
            cos_o = _dot(ns, wl)
            valid = hit & (cos_i > 0.0) & (cos_o > 0.0)
            ray_n = ray_n + jnp.where(valid, 1.0, 0.0)

            sgn = jnp.where(_dot(ng, wl) >= 0.0, 1.0, -1.0)
            so = _add(p_hit, _scale(ng, 1e-4 * pscale * sgn))
            invwl = (inv(wl[0]), inv(wl[1]), inv(wl[2]))
            tmax_s = dist * (1.0 - 1e-3)

            # Occlusion carried as f32 0/1: Mosaic (v5e) crashes on
            # multi-vreg boolean loop carries at TM=32 (tpu.unroll_vectors
            # on vector<32x128xi1> emits an invalid 8x128x32xi1 type).
            def shadow_body(c, occ_f, so=so, wl=wl, invwl=invwl,
                            tmax_s=tmax_s, valid=valid):
                need = valid & (occ_f < 0.5)
                bound = jnp.where(need, tmax_s, tmin)

                def quarters(occ_f):
                    live, s_tri, e_tri = quarter_span(
                        so, wl, invwl, bound, c)

                    def process(occ_f):
                        def tri_body(k, occ_f):
                            ok, _t, _u, _v, _e = mt_one(so, wl, c, k, tmax_s)
                            return jnp.maximum(occ_f, jnp.where(ok, 1.0, 0.0))
                        return jax.lax.fori_loop(s_tri, e_tri, tri_body, occ_f)

                    return jax.lax.cond(live, process, lambda x: x, occ_f)

                # Root-box gate: occluded/invalid lanes collapse the bound,
                # so the single slab test retires clusters early.
                root = jnp.sum(jnp.where(
                    cull(so, wl, invwl, bound, c, col=0), 1.0, 0.0)) > 0.0
                return jax.lax.cond(root, quarters, lambda x: x, occ_f)

            # Walk only this (block, light)'s conservatively-live clusters
            # (host segment-interval cull, _shadow_live_clusters: hit
            # region = ray reach x mesh AABB, segment to the light point).
            def shadow_live_body(j, occ_f):
                return shadow_body(ids_s_ref[li * grid + pid, j], occ_f)

            occ_f = jax.lax.fori_loop(0, nlive_s_ref[li * grid + pid, 0],
                                      shadow_live_body, zeros)
            lit = jnp.where(valid & (occ_f < 0.5), cos_o / dist2, 0.0) * inv_pi
            L = (
                L[0] + albedo[0] * lint[0] * lit,
                L[1] + albedo[1] * lint[1] * lit,
                L[2] + albedo[2] * lint[2] * lit,
            )

        lr[:] = L[0]
        lg[:] = L[1]
        lb[:] = L[2]
        nc[:] = ray_n

    return kernel


def bake_direct_scene(scene):
    """Scope check + baked constants for mesh_direct_render.

    Returns (lights, shade_table) or None when out of scope: needs
    cluster tables in ONE segment, all-diffuse BSDFs, >=1 point light and
    no other emitter kinds.
    """
    from tpu_rt.scene.types import BSDF_DIFFUSE, INTEGRATOR_DIRECT

    g = scene.geometry
    if g.cl_tris is None or g.cl_tris.shape[0] > DIRECT_C:
        return None
    if g.n_analytic != 0:
        return None
    if scene.has_textures:
        return None  # textured reflectance reads happen in the XLA tracer
    em = scene.emitters
    if em.n_area > 0 or em.has_env or em.n_point == 0:
        return None
    btypes = np.asarray(scene.bsdf_type)
    if not set(btypes.tolist()) <= {BSDF_DIFFUSE}:
        return None

    params = np.asarray(scene.bsdf_params)
    shape_bsdf = np.asarray(scene.shape_bsdf)
    tri_alb = params[shape_bsdf[np.asarray(g.tri_shape)]][:, 0:3]
    # Meshes without authored normals store zeros in tri_n* (the XLA
    # Interaction falls back to geometric normals at run time) — bake the
    # geometric fallback here.
    ng = np.cross(np.asarray(g.tri_e1), np.asarray(g.tri_e2))
    ng = ng / np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)

    def with_fallback(nv):
        nv = np.asarray(nv)
        bad = np.linalg.norm(nv, axis=-1) < 1e-6
        return np.where(bad[:, None], ng, nv)

    clusters = {"prim": g.cl_prim}
    shade = build_shading_table(
        clusters, with_fallback(g.tri_n0), with_fallback(g.tri_n1),
        with_fallback(g.tri_n2), tri_alb,
    )
    lights = [
        (tuple(p), tuple(i))
        for p, i in zip(np.asarray(em.point_pos).tolist(),
                        np.asarray(em.point_intensity).tolist())
    ]
    return lights, jnp.asarray(shade)


_DIRECT_FN_CACHE = {}


def _direct_render_setup(scene, tm, interpret, baked):
    """Shared setup for mesh_direct_render{,_sharded}: returns the memoized
    whole-render fn plus its prepared array arguments (minus keys/films)."""
    baked = baked if baked is not None else bake_direct_scene(scene)
    if baked is None:
        raise ValueError("scene not supported by the direct mesh megakernel")
    lights, shade = baked
    g = scene.geometry
    c = scene.camera
    H, W = c.height, c.width

    # Content-derived statics only (ADVICE r2: id() values are recycled
    # after GC, so an id-keyed entry could serve a kernel compiled for the
    # wrong n_clusters).  Everything the traced fn closes over or bakes
    # into the kernel shape-wise is here; the table VALUES are arguments.
    key = (tuple(g.cl_tris.shape), tuple(g.cl_bounds.shape),
           tuple(shade.shape), tuple(lights), H, W, tm, bool(interpret),
           c.filter_type)
    fn = _DIRECT_FN_CACHE.get(key)
    if fn is None:
        from tpu_rt.integrator.path import _tile_perm
        from tpu_rt.sensor import camera as _cam
        from tpu_rt.sensor import film as _film

        n = H * W
        tile = tm * 128
        pad = (-n) % tile
        perm, inv_perm = _tile_perm(H, W)
        xy_int = jnp.stack(
            jnp.meshgrid(jnp.arange(W), jnp.arange(H), indexing="xy"), -1
        ).reshape(-1, 2).astype(jnp.float32)
        n_clusters = g.cl_tris.shape[0]
        n_grid = ((n + pad) // 128) // tm
        kernel = _build_direct_kernel(lights, 1e-4, n_clusters, n_grid)

        @jax.jit
        def passes(bounds, tris, shade, cam_obj, mesh_box, fv, fw, keys):
            def one(carry, key_i):
                fv, fw, nacc = carry
                jitter = jax.random.uniform(key_i, (n, 2))
                film_xy = (xy_int + jitter)[perm]
                o, d = _cam.sample_ray(cam_obj, film_xy)
                if pad:
                    o = jnp.concatenate([o, jnp.zeros((pad, 3))], 0)
                    d = jnp.concatenate(
                        [d, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]),
                                             (pad, 3))], 0)
                rows = (n + pad) // 128
                comps = [x.reshape(rows, 128) for x in
                         [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]]
                # Host-side per-block cluster compaction for the closest
                # sweep (primary rays are known here; tmax = miss sentinel
                # matches the kernel's best-t init).
                grid = rows // tm
                big = jnp.full((rows, 128), 0.99 * _BIG, jnp.float32)
                ids, nlive = _block_live_clusters(
                    bounds, comps + [big], grid, tm, 1e-4)
                ids_s, nlive_s = _shadow_live_clusters(
                    bounds, comps, grid, tm, lights,
                    mesh_box[0], mesh_box[1])
                block = pl.BlockSpec((tm, 128), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM)
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    # closest ids+counts, shadow ids+counts, bounds, tris,
                    # shade
                    num_scalar_prefetch=7,
                    grid=(grid,),
                    in_specs=[block] * 6,
                    out_specs=[block] * 4,
                )
                out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 4
                lrr, lgg, lbb, ncc = pl.pallas_call(
                    kernel, out_shape=out_shape, grid_spec=grid_spec,
                    interpret=interpret,
                )(ids, nlive, ids_s, nlive_s, bounds, tris, shade, *comps)
                L = jnp.stack(
                    [lrr.reshape(-1), lgg.reshape(-1), lbb.reshape(-1)], -1
                )[:n][inv_perm]
                ok = jnp.all(jnp.isfinite(L), axis=-1)
                fv, fw = _film.splat_aligned(
                    fv, fw, jitter.reshape(H, W, 2),
                    jnp.where(ok[:, None], L, 0.0).reshape(H, W, 3),
                    ok.reshape(H, W), c.filter_type,
                )
                # pad lanes are stripped from the count (they trace dummy
                # +z rays that can legitimately hit geometry)
                nacc = nacc + jnp.sum(ncc.reshape(-1)[:n])
                return (fv, fw, nacc), None

            (fv, fw, nacc), _ = jax.lax.scan(
                one, (fv, fw, jnp.zeros((), jnp.float32)), keys
            )
            return fv, fw, nacc

        _DIRECT_FN_CACHE[key] = fn = passes

    # Mesh AABB for the shadow-segment cull, from the REAL triangles (the
    # cluster bound table contains far-point pad boxes that would blow it
    # up).  Computed eagerly from device arrays: three reductions, cheap.
    p0 = g.tri_p0
    p1 = g.tri_p0 + g.tri_e1
    p2 = g.tri_p0 + g.tri_e2
    mesh_lo = jnp.minimum(jnp.minimum(p0.min(0), p1.min(0)), p2.min(0))
    mesh_hi = jnp.maximum(jnp.maximum(p0.max(0), p1.max(0)), p2.max(0))
    # pad covers the kernel's spawn offset (1e-4 * pscale along the normal)
    # so offset shadow origins stay inside the modeled hit region
    box_pad = 2e-4 * jnp.maximum(
        1.0, jnp.maximum(jnp.abs(mesh_lo).max(), jnp.abs(mesh_hi).max())
    )
    mesh_box = jnp.stack([mesh_lo - box_pad, mesh_hi + box_pad])
    # Tables flattened to (C*rows, 128): Mosaic pads each 2D slice of a 3D
    # SMEM operand to (8,128) tiles, which OOMed SMEM at 64 clusters (the
    # 9- and 12-row tables padded to 16 rows each = 2x512K of the 1 MiB).
    args = (jnp.asarray(g.cl_bounds),
            jnp.asarray(g.cl_tris).reshape(-1, 128),
            jnp.asarray(shade).reshape(-1, 128),
            scene.camera, mesh_box)
    return fn, args, H, W


def mesh_direct_render(scene, spp=None, seed=0, tm=DEFAULT_TM,
                       interpret=None, baked=None):
    """Fused direct-illumination render for mesh+point-light scenes.

    Returns (H, W, 3); raises ValueError when the scene is out of scope.
    """
    if interpret is None:
        interpret = INTERPRET
    spp = scene.camera.spp if spp is None else spp
    fn, args, H, W = _direct_render_setup(scene, tm, interpret, baked)

    from tpu_rt.ops.pallas_path import _make_keys_seeds
    from tpu_rt.sensor import film as _film

    fv = jnp.zeros((H, W, 3), jnp.float32)
    fw = jnp.zeros((H, W), jnp.float32)
    root = jax.random.PRNGKey(seed)
    # One dispatch for all spp (scan length does not change the compile or
    # the HBM footprint; per-chunk dispatches cost ~35 ms tunnel RTT each).
    keys, _ = _make_keys_seeds(root, jnp.int32(0), jnp.int32(0), spp)
    fv, fw, nacc = fn(*args, fv, fw, keys)
    # honest count from the kernel (primary + actually-cast shadow rays;
    # ADVICE r2: the old spp*H*W*(1+L) figure counted shadow rays for
    # missed primaries too).  Lazy device sum — int() it to read.
    mesh_direct_render.last_ray_count = nacc
    return _film.develop(fv, fw)


def mesh_direct_render_sharded(scene, spp=None, seed=0, mesh=None,
                               tm=DEFAULT_TM, interpret=None, baked=None):
    """Data-parallel fused direct render: spp samples split over the device
    mesh, each chip runs the megakernel on its sample chunk, films psum over
    ICI (SURVEY §2c mapping; mirrors parallel.render.render_pallas_sharded
    for the mesh kernel — VERDICT r2 item 4).

    Requires spp % n_devices == 0.  Returns (H, W, 3) replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_rt.ops.pallas_path import _make_keys_seeds
    from tpu_rt.parallel.render import default_mesh
    from tpu_rt.sensor import film as _film

    if interpret is None:
        interpret = INTERPRET
    mesh = mesh or default_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    spp = scene.camera.spp if spp is None else spp
    if spp % n_dev:
        raise ValueError(f"spp={spp} not divisible by {n_dev} devices")
    fn, args, H, W = _direct_render_setup(scene, tm, interpret, baked)

    root = jax.random.PRNGKey(seed)
    keys, _ = _make_keys_seeds(root, jnp.int32(0), jnp.int32(0), spp)

    def shard_fn(keys_shard):
        fv = jnp.zeros((H, W, 3), jnp.float32)
        fw = jnp.zeros((H, W), jnp.float32)
        fv, fw, nacc = fn(*args, fv, fw, keys_shard)
        return (jax.lax.psum(fv, axis), jax.lax.psum(fw, axis),
                jax.lax.psum(nacc, axis))

    fv, fw, nacc = jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(P(axis),), out_specs=(P(), P(), P()),
        check_vma=False,
    ))(keys)
    mesh_direct_render_sharded.last_ray_count = nacc
    return _film.develop(fv, fw)
