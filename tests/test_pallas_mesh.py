"""Pallas mesh-sweep kernel vs the XLA chunked reference tracer.

The kernel (tpu_rt.ops.pallas_mesh) replaces Embree BVH traversal for
mesh-class scenes (/root/reference/CustomIntegrator.py:146,159 via
scene.ray_intersect; teapot mesh from /root/reference/scenes/simple.xml:23).
Runs in interpret mode on the CPU test backend.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import tpu_rt
from tpu_rt.geometry import trace
from tpu_rt.ops import pallas_mesh


@pytest.fixture(scope="module")
def teapot_scene():
    return tpu_rt.load_file("/root/reference/scenes/simple.xml", res=16, spp=1)


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pallas_mesh.INTERPRET
    pallas_mesh.INTERPRET = True
    yield
    pallas_mesh.INTERPRET = old


def _rays_at_mesh(g, n, seed=0):
    rng = np.random.default_rng(seed)
    v0 = np.asarray(g.tri_p0)
    lo, hi = v0.min(0), v0.max(0)
    center = (lo + hi) / 2
    ext = (hi - lo).max()
    o = center + (rng.standard_normal((n, 3)) * 4 * ext).astype(np.float32)
    target = center + (rng.standard_normal((n, 3)) * 0.4 * ext).astype(np.float32)
    d = target - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_clusters_built_for_mesh_scene(teapot_scene):
    g = teapot_scene.geometry
    assert g.cl_tris is not None
    assert g.cl_tris.shape[1:] == (9, 128)
    assert g.cl_bounds.shape == (g.cl_tris.shape[0], 32)
    # every real triangle appears exactly once in the local->global map
    prim = np.asarray(g.cl_prim)
    counts = np.bincount(prim, minlength=g.n_tris)
    # pads map to 0, so id 0 appears >= 1 times; all others exactly once
    assert counts.shape[0] >= g.n_tris
    assert (counts[1 : g.n_tris] == 1).all()
    assert counts[0] >= 1


def test_mesh_kernel_matches_chunked_tracer(teapot_scene):
    g = teapot_scene.geometry
    o, d = _rays_at_mesh(g, 400)
    ref = trace._trace_chunked(g, o, d, 1e-4, trace.INF)
    got = trace._trace_mesh_pallas(g, o, d, 1e-4, trace.INF)
    ref_hit = np.asarray(ref.prim) >= 0
    got_hit = np.asarray(got.prim) >= 0
    assert ref_hit.sum() > 20  # the ray distribution actually hits the mesh
    np.testing.assert_array_equal(ref_hit, got_hit)
    both = ref_hit & got_hit
    np.testing.assert_array_equal(np.asarray(ref.prim)[both],
                                  np.asarray(got.prim)[both])
    # The kernel uses the precomputed-transform (BW) triangle test while
    # the chunked tracer uses Moller-Trumbore; both are ~1e-6 from the f64
    # truth on hits (measured, pallas_mesh._bw_table docstring) but differ
    # from each other by up to ~1e-4 in u near shallow-angle hits.
    np.testing.assert_allclose(np.asarray(ref.t)[both],
                               np.asarray(got.t)[both], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.u)[both],
                               np.asarray(got.u)[both], atol=2e-4)


def test_mesh_kernel_respects_tmax(teapot_scene):
    """Shadow-ray style capped queries: hits beyond tmax are rejected."""
    g = teapot_scene.geometry
    o, d = _rays_at_mesh(g, 200)
    full = trace._trace_mesh_pallas(g, o, d, 1e-4, trace.INF)
    hit = np.asarray(full.prim) >= 0
    t_hit = np.asarray(full.t)
    # cap just below each hit distance -> no hit; just above -> same hit
    cap_lo = jnp.asarray(np.where(hit, t_hit * 0.9, 1.0), jnp.float32)
    cap_hi = jnp.asarray(np.where(hit, t_hit * 1.1, 1.0), jnp.float32)
    below = trace._trace_mesh_pallas(g, o, d, 1e-4, cap_lo)
    above = trace._trace_mesh_pallas(g, o, d, 1e-4, cap_hi)
    assert not (np.asarray(below.prim)[hit] >= 0).any()
    np.testing.assert_array_equal(np.asarray(above.prim)[hit],
                                  np.asarray(full.prim)[hit])


def test_dispatch_uses_kernel_only_when_enabled(teapot_scene):
    g = teapot_scene.geometry
    assert trace._pallas_mesh_available(g)  # INTERPRET is on
    pallas_mesh.INTERPRET = False
    # CPU backend without interpret: must fall back to the XLA paths
    assert not trace._pallas_mesh_available(g)


def test_fused_direct_kernel_matches_xla(teapot_scene):
    """The fused direct-illumination megakernel (trace + Lambert shading +
    per-light shadow sweeps on-core) statistically matches the two-phase
    XLA renderer on simple.xml (diffuse teapot + two point lights,
    /root/reference/scenes/simple.xml:23-38)."""
    from tpu_rt.integrator.path import render as render_xla

    scene = tpu_rt.load_file("/root/reference/scenes/simple.xml", res=32, spp=1)
    baked = pallas_mesh.bake_direct_scene(scene)
    assert baked is not None
    imp = np.asarray(pallas_mesh.mesh_direct_render(scene, spp=4, seed=1))
    imx = np.asarray(render_xla(scene, spp=8, seed=2, spp_per_pass=8))
    assert np.isfinite(imp).all()
    assert abs(imp.mean() - imx.mean()) / imx.mean() < 0.05

    def blk(x):
        return x.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3))

    assert np.abs(blk(imp) - blk(imx)).max() < 0.12 * max(imx.max(), 1e-9)


def test_fused_direct_sharded_matches_single_chip():
    """Sample-sharded fused direct render over the virtual 8-device mesh
    equals the single-chip render on the same seed set (films are linear in
    samples; psum vs scan only reorders f32 adds)."""
    scene = tpu_rt.load_file("/root/reference/scenes/simple.xml", res=32,
                             spp=1)
    img1 = np.asarray(pallas_mesh.mesh_direct_render(scene, spp=8, seed=3))
    img8 = np.asarray(
        pallas_mesh.mesh_direct_render_sharded(scene, spp=8, seed=3)
    )
    np.testing.assert_allclose(img8, img1, rtol=2e-5, atol=1e-6)
    assert img1.mean() > 0


def test_fused_direct_scope_guard():
    """cbox (area lights, non-mesh) is out of the fused kernel's scope."""
    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=16, spp=1)
    assert pallas_mesh.bake_direct_scene(scene) is None


def test_fused_direct_kernel_authored_normals():
    """The fused kernel interpolates AUTHORED vertex normals (teapot has
    none, so that path needs its own coverage): a flat two-triangle quad
    with vertex normals tilted toward +x must shade brighter on the side a
    +x-offset light favors, matching the XLA renderer's interpolation."""
    import numpy as np_

    from tpu_rt.integrator.path import render as render_xla

    # quad in the z=0 plane, vertex normals tilted: left verts toward -x,
    # right verts toward +x (normalized)
    t = 0.6
    nl = np_.asarray([-t, 0, 1.0]) / np_.hypot(t, 1.0)
    nr = np_.asarray([t, 0, 1.0]) / np_.hypot(t, 1.0)
    verts = np_.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np_.float32
    )
    faces = np_.asarray([[0, 1, 2], [0, 2, 3]], np_.int32)
    normals = np_.stack([nl, nr, nr, nl]).astype(np_.float32)

    import os
    import tempfile

    obj = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    for v in verts:
        obj.write("v %f %f %f\n" % tuple(v))
    for n_ in normals:
        obj.write("vn %f %f %f\n" % tuple(n_))
    for f in faces + 1:
        obj.write("f %d//%d %d//%d %d//%d\n" % (f[0], f[0], f[1], f[1], f[2], f[2]))
    obj.close()

    # pad the mesh with extra triangles so the cluster path engages
    d = {
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {
            "type": "perspective", "fov": 60,
            "to_world": tpu_rt.ScalarTransform4f().look_at(
                origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 32, "height": 32,
                     "rfilter": {"type": "box"}},
        },
        "quad": {"type": "obj", "filename": obj.name,
                 "bsdf": {"type": "diffuse"}},
        # far-away filler mesh to push the scene over the 192-prim cluster
        # threshold (scene/build only builds cluster tables then)
        "filler": {"type": "ply",
                   "filename": "/root/reference/scenes/meshes/teapot.ply",
                   "to_world": tpu_rt.ScalarTransform4f().translate([50, 0, 0]),
                   "bsdf": {"type": "diffuse"}},
        "light": {"type": "point", "position": [2, 0, 4], "intensity": 60.0},
    }
    scene = tpu_rt.load_dict(d)
    os.unlink(obj.name)
    assert scene.geometry.cl_tris is not None
    baked = pallas_mesh.bake_direct_scene(scene)
    assert baked is not None

    imp = np.asarray(pallas_mesh.mesh_direct_render(scene, spp=4, seed=1))
    imx = np.asarray(render_xla(scene, spp=4, seed=1, spp_per_pass=4))
    # interpolated normals make the world-+x side brighter (the light sits
    # at +x); the Mitsuba camera convention mirrors x, so world +x lands on
    # the LEFT of the image.  Flat geometric normals would shade both sides
    # nearly equally.
    bright = imp[12:20, 4:12].mean()   # image-left = world +x
    dim = imp[12:20, 20:28].mean()
    assert bright > 1.3 * dim, (bright, dim)
    # and the kernel agrees with the XLA interpolation
    bx, dx_ = imx[12:20, 4:12].mean(), imx[12:20, 20:28].mean()
    assert abs(bright - bx) / bx < 0.1
    assert abs(dim - dx_) / max(dx_, 1e-9) < 0.2


def test_mesh_kernel_random_soup_matches_numpy():
    """Incoherent random triangle soup + random rays vs an independent
    NumPy Moller-Trumbore reference: stresses the quarter-span sweep
    (random treelets make partially-live spans the common case, unlike
    coherent teapot primaries)."""
    rng = np.random.default_rng(11)
    T = 300
    p0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (T, 3)).astype(np.float32)

    from tpu_rt.geometry.bvh import build_bvh

    v = np.stack([p0, p0 + e1, p0 + e2], 1)
    bvh = build_bvh(v.min(1), v.max(1))
    clusters = pallas_mesh.build_clusters(p0, e1, e2, bvh=bvh)

    N = 1024
    o = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    d = rng.normal(0, 1, (N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t, prim, u, vv = (np.asarray(x) for x in pallas_mesh.mesh_intersect(
        clusters, jnp.asarray(o), jnp.asarray(d), tmin=1e-4))

    # NumPy reference (closest hit over all tris, same conventions)
    pv = np.cross(d[:, None, :], e2[None, :, :])          # [N, T, 3]
    det = np.einsum("tk,ntk->nt", e1, pv)
    det = np.where(np.abs(det) < 1e-12,
                   np.where(det < 0, -1e-12, 1e-12), det)
    tv = o[:, None, :] - p0[None, :, :]
    uu = np.einsum("ntk,ntk->nt", tv, pv) / det
    qv = np.cross(tv, e1[None, :, :])
    vv_ref = np.einsum("nk,ntk->nt", d, qv) / det
    tt = np.einsum("tk,ntk->nt", e2, qv) / det
    ok = (uu >= 0) & (vv_ref >= 0) & (uu + vv_ref <= 1) & (tt > 1e-4)
    tt = np.where(ok, tt, np.inf)
    ref_prim = tt.argmin(1)
    ref_t = tt[np.arange(N), ref_prim]
    ref_hit = np.isfinite(ref_t)
    assert ref_hit.sum() > 150

    got_hit = prim >= 0
    np.testing.assert_array_equal(got_hit, ref_hit)
    np.testing.assert_allclose(t[ref_hit], ref_t[ref_hit], rtol=2e-5)
    # same winning triangle wherever the closest hit is unambiguous
    t2 = np.partition(tt, 1, axis=1)[:, 1]
    with np.errstate(invalid="ignore"):  # inf - inf on all-miss rows
        clear = ref_hit & ((t2 - ref_t) > 1e-3)
    np.testing.assert_array_equal(prim[clear], ref_prim[clear])


def test_mixed_mesh_analytic_dispatch_matches_chunked():
    """ray_intersect on a mesh + analytic-prims scene through the Pallas
    dispatch (_trace_mesh_pallas merges the analytic sweep into the
    kernel's best hit) must match the pure-XLA chunked tracer.  Regression:
    the _analytic_sweep params argument (curve radii, r3) was never threaded
    through this branch — it only executes on real TPU or under
    INTERPRET, and no test covered the mixed-geometry case (r4 find)."""
    scene = tpu_rt.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "sensor": {"type": "perspective", "fov": 40,
                   "film": {"type": "hdrfilm", "width": 8, "height": 8}},
        "m": {"type": "ply",
              "filename": "/root/reference/scenes/meshes/teapot.ply",
              "bsdf": {"type": "diffuse"}},
        "s": {"type": "sphere",
              # in front of the teapot bbox center ([0.2, 0, 1.6]) so a
              # good fraction of the random rays see it first
              "to_world": tpu_rt.ScalarTransform4f().translate([0.2, 0, 4.5])
              @ tpu_rt.ScalarTransform4f().scale([1.5, 1.5, 1.5]),
              "bsdf": {"type": "diffuse"}},
    })
    g = scene.geometry
    assert g.n_analytic == 1
    o, d = _rays_at_mesh(g, 512, seed=3)
    assert trace._pallas_mesh_available(g)
    hit_k = trace.ray_intersect_hit(g, o, d)
    hit_x = trace._trace_chunked(g, o, d, trace.RAY_EPS, trace.INF)
    np.testing.assert_array_equal(np.asarray(hit_k.prim),
                                  np.asarray(hit_x.prim))
    np.testing.assert_allclose(np.asarray(hit_k.t), np.asarray(hit_x.t),
                               rtol=1e-5, atol=1e-6)
    # the sphere must actually win on some rays
    assert (np.asarray(hit_k.prim) >= g.n_tris).any()


def test_gi_sort_order_is_permutation(teapot_scene):
    g = teapot_scene.geometry
    o, d = _rays_at_mesh(g, 777, seed=5)
    order, inv = trace.gi_sort_order(g, o, d)
    order, inv = np.asarray(order), np.asarray(inv)
    n = o.shape[0]
    assert sorted(order.tolist()) == list(range(n))
    np.testing.assert_array_equal(order[inv], np.arange(n))
    # keys are actually grouped: sorted key sequence is non-decreasing
    lo = np.asarray(g.cl_bounds)[:, 0:3].min(0)
    hi = np.asarray(g.cl_bounds)[np.asarray(g.cl_bounds)[:, 6] > 0, 3:6].max(0)
    q = np.clip(np.floor((np.asarray(o) - lo) / (hi - lo) * 4), 0, 3)
    cell = (q[:, 0] * 4 + q[:, 1]) * 4 + q[:, 2]
    oct_ = ((np.asarray(d) > 0) * np.array([4, 2, 1])).sum(1)
    key = cell * 8 + oct_
    assert (np.diff(key[order]) >= 0).all()


def test_gi_sort_render_exact(teapot_scene, monkeypatch):
    """path_trace with the coherence sort forced ON equals the unsorted
    render: the sort->intersect->unsort round trip is exact per ray (the
    kernel's block culls are conservative), so only XLA program-shape ulp
    noise can differ (CLAUDE.md: allclose, not array_equal, on CPU)."""
    import jax

    from tpu_rt.integrator.path import path_trace

    g = teapot_scene.geometry
    o, d = _rays_at_mesh(g, 512, seed=9)
    key = jax.random.PRNGKey(0)

    monkeypatch.setenv("TPU_RT_GI_SORT", "0")
    L0, n0 = path_trace(teapot_scene, o, d, key, max_depth=3)
    monkeypatch.setenv("TPU_RT_GI_SORT", "1")
    L1, n1 = path_trace(teapot_scene, o, d, key, max_depth=3)
    assert int(n0) == int(n1)
    np.testing.assert_allclose(np.asarray(L0), np.asarray(L1),
                               rtol=2e-5, atol=1e-6)


def test_fused_segmented_sweep_matches_per_segment_calls(monkeypatch):
    """The fused one-call segmented kernel (_mesh_sweep_fused: (segments,
    ray-blocks) grid, SMEM-streamed tables, VMEM best scratch) is EXACTLY
    equal to the chained per-segment pallas-call form: its unchained host
    live lists are supersets whose extra clusters all fail the in-kernel
    best_t slab gates (verified bit-identical on v5e hardware too, r5).
    Tiny segment sizes force multiple segments out of a small soup."""
    rng = np.random.default_rng(5)
    T = 600
    p0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.2, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (T, 3)).astype(np.float32)

    from tpu_rt.geometry.bvh import build_bvh

    v = np.stack([p0, p0 + e1, p0 + e2], 1)
    bvh = build_bvh(v.min(1), v.max(1))
    clusters = pallas_mesh.build_clusters(p0, e1, e2, bvh=bvh)
    assert clusters["bounds"].shape[0] > 8  # enough clusters to segment

    N = 4096  # two (16, 128) ray blocks
    o = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    d = rng.normal(0, 1, (N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = rng.uniform(0.5, 4.0, (N,)).astype(np.float32)

    monkeypatch.setattr(pallas_mesh, "SEGMENT_C", 4)
    monkeypatch.setattr(pallas_mesh, "FUSED_C", 4)

    monkeypatch.setattr(pallas_mesh, "_FUSED_MODE", "0")
    ref = [np.asarray(x) for x in pallas_mesh.mesh_intersect(
        clusters, jnp.asarray(o), jnp.asarray(d), tmax=jnp.asarray(tmax))]
    monkeypatch.setattr(pallas_mesh, "_FUSED_MODE", "1")
    got = [np.asarray(x) for x in pallas_mesh.mesh_intersect(
        clusters, jnp.asarray(o), jnp.asarray(d), tmax=jnp.asarray(tmax))]

    assert (ref[1] >= 0).sum() > 100
    for a, b, nm in zip(ref, got, ("t", "prim", "u", "v")):
        np.testing.assert_array_equal(a, b, err_msg=nm)
