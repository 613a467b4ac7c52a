"""Round-3 megakernel features: in-kernel film accumulation, the public
render dispatch, the sharded fast path, and the Stokes Mueller megakernel.

All tests run the kernels in interpret mode on the CPU backend (tiny
shapes; compile results land in the persistent cache so repeat runs are
fast)."""

import numpy as np
import pytest

import tpu_rt
from tpu_rt.ops import pallas_path as pp


@pytest.fixture()
def interpret_on():
    old = pp.INTERPRET
    pp.INTERPRET = True
    yield
    pp.INTERPRET = old


@pytest.fixture(scope="module")
def cbox8():
    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=8, spp=1)
    return scene.replace(max_depth=3)


def test_public_render_dispatches_to_megakernel(cbox8, interpret_on):
    """tpu_rt.render on an in-scope path scene runs the megakernel
    (VERDICT r2 missing #1: it used to be bench-only)."""
    pp.render_pallas.last_ray_count = -1
    img = np.asarray(tpu_rt.render(cbox8, spp=2, seed=0))
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()
    assert pp.render_pallas.last_ray_count > 0


def test_public_render_falls_back_out_of_scope(interpret_on):
    """Out-of-kernel-scope scenes keep rendering through the XLA wavefront
    path.  (simple.xml's teapot moved INTO megakernel scope in r5 via the
    clustered-mesh tables, so the probe is a bitmap-textured scene —
    per-hit texture reads are the one capability the kernel defers to the
    XLA tracer, pallas_path.bake_scene has_textures gate.)"""
    scene = tpu_rt.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tpu_rt.ScalarTransform4f().look_at(
                origin=[0, 0, 4], target=[0, 0, 0], up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
        },
        "wall": {
            "type": "rectangle",
            "to_world": tpu_rt.ScalarTransform4f().scale([2, 2, 1]),
            "bsdf": {"type": "diffuse", "reflectance": {
                "type": "bitmap",
                "filename": "/root/reference/scenes/textures/image_001.png",
            }},
        },
        "light": {"type": "point", "position": [0, 0, 3],
                  "intensity": 30.0 * np.ones(3)},
    })
    assert pp.bake_scene(scene) is None
    img = np.asarray(tpu_rt.render(scene, spp=1, seed=0))
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_film_kernel_equals_per_sample_splat(cbox8):
    """The in-kernel tent splat must reproduce the per-sample kernel + XLA
    splat_aligned EXACTLY: with spp_per_pass=1 both consume the same
    per-chunk RNG stream (seed*100003 + i), so the only difference is
    where the filter weights are applied."""
    import jax.numpy as jnp

    from tpu_rt.sensor import film as film_mod

    seed, spp = 5, 3
    c = cbox8.camera
    H, W = c.height, c.width
    bs = pp.bake_scene(cbox8)

    img_film = np.asarray(
        pp.render_pallas(cbox8, spp=spp, seed=seed, interpret=True,
                         spp_per_pass=1)
    )

    fv = jnp.zeros((H, W, 3), jnp.float32)
    fw = jnp.zeros((H, W), jnp.float32)
    for i in range(spp):
        L, jit, _ = pp.pallas_raygen_trace(bs, c, seed * 100003 + i,
                                           interpret=True)
        ok = jnp.all(jnp.isfinite(L), axis=-1)
        fv, fw = film_mod.splat_aligned(
            fv, fw, jit.reshape(H, W, 2),
            jnp.where(ok[:, None], L, 0.0).reshape(H, W, 3),
            ok.reshape(H, W), c.filter_type,
        )
    img_ref = np.asarray(film_mod.develop(fv, fw))
    np.testing.assert_allclose(img_film, img_ref, rtol=2e-5, atol=2e-6)


def test_film_kernel_gaussian_equals_per_sample_splat(cbox8):
    """The in-kernel gaussian splat (5x5 footprint, 100 planes — VERDICT
    r3 #3) must reproduce the per-sample kernel + XLA splat_aligned; the
    exp weight may differ by ulps between program shapes, hence allclose
    rather than exact equality."""
    import jax.numpy as jnp

    from tpu_rt.scene.types import FILTER_GAUSSIAN
    from tpu_rt.sensor import film as film_mod

    scene = cbox8.replace(camera=cbox8.camera.replace(
        filter_type=FILTER_GAUSSIAN))
    seed, spp = 5, 3
    c = scene.camera
    H, W = c.height, c.width
    bs = pp.bake_scene(scene)

    img_film = np.asarray(
        pp.render_pallas(scene, spp=spp, seed=seed, interpret=True,
                         spp_per_pass=1)
    )

    fv = jnp.zeros((H, W, 3), jnp.float32)
    fw = jnp.zeros((H, W), jnp.float32)
    for i in range(spp):
        L, jit, _ = pp.pallas_raygen_trace(bs, c, seed * 100003 + i,
                                           interpret=True)
        ok = jnp.all(jnp.isfinite(L), axis=-1)
        fv, fw = film_mod.splat_aligned(
            fv, fw, jit.reshape(H, W, 2),
            jnp.where(ok[:, None], L, 0.0).reshape(H, W, 3),
            ok.reshape(H, W), c.filter_type,
        )
    img_ref = np.asarray(film_mod.develop(fv, fw))
    np.testing.assert_allclose(img_film, img_ref, rtol=2e-5, atol=2e-6)


def test_film_render_single_dispatch_scan_and_tail(cbox8):
    """The whole-render fused dispatch (lax.scan over full chunks + tail
    chunk + develop, all one jit — r3: per-chunk dispatches cost ~35 ms
    tunnel RTT each) must equal a manual per-chunk accumulation with the
    same seeds.  spp=5, spp_per_pass=2 exercises n_full=2 AND rem=1."""
    import jax.numpy as jnp

    from tpu_rt.sensor import film as film_mod

    seed, spp, k = 7, 5, 2
    c = cbox8.camera
    H, W = c.height, c.width
    n = H * W
    bs = pp.bake_scene(cbox8)

    img = np.asarray(
        pp.render_pallas(cbox8, spp=spp, seed=seed, interpret=True,
                         spp_per_pass=k)
    )

    fvr = fvg = fvb = fw = jnp.zeros((H, W), jnp.float32)
    done = 0
    while done < spp:
        kc = min(k, spp - done)
        accs, _nr = pp.pallas_film_trace(bs, c, seed * 100003 + done, kc,
                                         interpret=True)

        def img2(p):
            return p.reshape(-1)[:n].reshape(H, W)

        j = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                fvr = film_mod._shift_add(fvr, img2(accs[j]), dy, dx)
                fvg = film_mod._shift_add(fvg, img2(accs[j + 1]), dy, dx)
                fvb = film_mod._shift_add(fvb, img2(accs[j + 2]), dy, dx)
                fw = film_mod._shift_add(fw, img2(accs[j + 3]), dy, dx)
                j += 4
        done += kc
    ref = np.asarray(
        jnp.stack([fvr, fvg, fvb], -1) / jnp.maximum(fw[..., None], 1e-12)
    )
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-7)
    assert int(pp.render_pallas.last_ray_count) > 0


def test_film_kernel_box_weights(cbox8):
    """Box-filter film mode: per-pixel weights equal the sample count
    (every finite sample deposits weight 1 in its own pixel)."""
    scene = cbox8.replace(camera=cbox8.camera.replace(filter_type=0))
    bs = pp.bake_scene(scene)
    accs, nr = pp.pallas_film_trace(bs, scene.camera, 0, 4, interpret=True)
    n = scene.camera.height * scene.camera.width
    w = np.asarray(accs[3]).reshape(-1)[:n]
    np.testing.assert_allclose(w, 4.0)
    # (pad lanes also accumulate weight, but the render assembly strips
    # them before the reshape to (H, W) — nothing to assert there)
    assert float(np.asarray(nr).sum()) >= 4 * n


def test_render_pallas_sharded_virtual_mesh(cbox8):
    """Sample-sharded megakernel render over the 8-device virtual mesh must
    EXACTLY equal a host-side combine of the same 8 single-device waves
    (psum film reduction is a plain sum — VERDICT r2 #4)."""
    import jax
    import jax.numpy as jnp

    from tpu_rt.parallel.render import default_mesh, render_pallas_sharded
    from tpu_rt.sensor import film as film_mod

    mesh = default_mesh(jax.devices()[:8])
    img_sh = np.asarray(
        render_pallas_sharded(cbox8, spp=8, seed=0, mesh=mesh, interpret=True)
    )
    assert img_sh.shape == (8, 8, 3)
    assert np.isfinite(img_sh).all()
    assert render_pallas_sharded.last_ray_count > 0

    # reproduce on one device: same per-device kernel seeds (i * 7919),
    # k=1 sample each, same tent shift-add assembly
    bs = pp.bake_scene(cbox8)
    H = W = 8
    n = H * W
    fvr = fvg = fvb = fw = jnp.zeros((H, W), jnp.float32)
    for i in range(8):
        accs, _nr = pp.pallas_film_trace(bs, cbox8.camera, i * 7919, 1,
                                         interpret=True)

        def img2(p):
            return p.reshape(-1)[:n].reshape(H, W)

        j = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                fvr = film_mod._shift_add(fvr, img2(accs[j]), dy, dx)
                fvg = film_mod._shift_add(fvg, img2(accs[j + 1]), dy, dx)
                fvb = film_mod._shift_add(fvb, img2(accs[j + 2]), dy, dx)
                fw = film_mod._shift_add(fw, img2(accs[j + 3]), dy, dx)
                j += 4
    ref = np.asarray(
        jnp.stack([fvr, fvg, fvb], -1) / jnp.maximum(fw[..., None], 1e-12)
    )
    np.testing.assert_allclose(img_sh, ref, rtol=1e-5, atol=1e-7)


def test_stokes_kernel_diffuse_I_parity():
    """On an all-diffuse scene the Mueller chain is purely depolarizing, so
    the Stokes megakernel's I channel must equal the scalar megakernel
    EXACTLY (same seeds, same RNG stream) and Q/U/V must vanish."""
    import os

    scene = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=8, spp=1)
    # strip the specular spheres by replacing their BSDFs with diffuse
    import jax.numpy as jnp

    from tpu_rt.scene.types import BSDF_DIFFUSE

    n_b = scene.bsdf_type.shape[0]
    scene = scene.replace(
        bsdf_type=jnp.full((n_b,), BSDF_DIFFUSE, scene.bsdf_type.dtype),
        max_depth=3,
    )
    # same gaussian filter on both sides -> both use per-sample splat
    scene = scene.replace(camera=scene.camera.replace(filter_type=2))
    bs = pp.bake_scene(scene)
    assert pp.stokes_in_scope(bs)
    S = np.asarray(pp.render_stokes_pallas(scene, spp=2, seed=4,
                                           interpret=True, spp_per_pass=2))
    img = np.asarray(pp.render_pallas(scene, spp=2, seed=4, interpret=True,
                                      spp_per_pass=2))
    np.testing.assert_allclose(S[..., 0, :], img, rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(S[..., 1, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(S[..., 2, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(S[..., 3, :], 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def cbox_pol12(ref_scenes):
    import os

    scene = tpu_rt.load_file(os.path.join(ref_scenes, "cbox_pol.xml"),
                             spp=4, res=12)
    return scene.replace(max_depth=3)


@pytest.mark.parametrize("filt", ["box", "tent", "gaussian"])
def test_stokes_film_kernel_equals_per_sample_splat(cbox_pol12, filt):
    """The polarized in-kernel box/tent/gaussian splat must reproduce the
    per-sample Stokes kernel + XLA splat_aligned EXACTLY: with
    spp_per_pass=1 both consume the same per-chunk RNG stream
    (seed*100003 + i), so the only difference is where the 13-plane
    filter accumulation happens.  gaussian (cbox_pol's own rfilter —
    VERDICT r3 #3) uses the 5x5 footprint; its exp weight may differ by
    ulps between program shapes, within the shared allclose tolerance."""
    import jax.numpy as jnp

    from tpu_rt.scene.types import (
        FILTER_BOX,
        FILTER_GAUSSIAN,
        FILTER_TENT,
    )
    from tpu_rt.sensor import film as film_mod

    ft = {"box": FILTER_BOX, "tent": FILTER_TENT,
          "gaussian": FILTER_GAUSSIAN}[filt]
    scene = cbox_pol12.replace(camera=cbox_pol12.camera.replace(
        filter_type=ft))
    seed, spp = 5, 3
    c = scene.camera
    H, W = c.height, c.width
    bs = pp.bake_scene(scene)

    S_film = np.asarray(
        pp.render_stokes_pallas(scene, spp=spp, seed=seed, interpret=True,
                                spp_per_pass=1)
    )
    assert S_film.shape == (H, W, 4, 3)

    fv = jnp.zeros((H, W, 12), jnp.float32)
    fw = jnp.zeros((H, W), jnp.float32)
    for i in range(spp):
        S, jit, _ = pp.pallas_stokes_trace(bs, c, seed * 100003 + i,
                                           interpret=True)
        S = S.reshape(-1, 12)
        ok = jnp.all(jnp.isfinite(S), axis=-1)
        fv, fw = film_mod.splat_aligned(
            fv, fw, jit.reshape(H, W, 2),
            jnp.where(ok[:, None], S, 0.0).reshape(H, W, 12),
            ok.reshape(H, W), c.filter_type,
        )
    S_ref = np.asarray(film_mod.develop(fv, fw)).reshape(H, W, 4, 3)
    np.testing.assert_allclose(S_film, S_ref, rtol=2e-5, atol=2e-6)
    # polarized content actually present (metal spheres produce Q/U)
    assert np.abs(S_ref[..., 1, :]).max() > 1e-4


def test_stokes_film_render_scan_and_tail(cbox_pol12):
    """Whole-render fused dispatch for the polarized film path (scan over
    full chunks + tail + develop in one jit) equals manual per-chunk
    accumulation with the same seeds; spp=5, spp_per_pass=2 exercises
    n_full=2 AND rem=1."""
    import jax.numpy as jnp

    from tpu_rt.scene.types import FILTER_BOX
    from tpu_rt.sensor import film as film_mod

    scene = cbox_pol12.replace(camera=cbox_pol12.camera.replace(
        filter_type=FILTER_BOX))
    seed, spp, k = 7, 5, 2
    c = scene.camera
    H, W = c.height, c.width
    n = H * W
    bs = pp.bake_scene(scene)

    S = np.asarray(
        pp.render_stokes_pallas(scene, spp=spp, seed=seed, interpret=True,
                                spp_per_pass=k)
    )

    film = [jnp.zeros((H, W), jnp.float32)] * 13
    done = 0
    while done < spp:
        kc = min(k, spp - done)
        accs, _nr = pp.pallas_film_trace(bs, c, seed * 100003 + done, kc,
                                         interpret=True, stokes=True)
        assert len(accs) == 13  # box: 12 Stokes + weight

        def img2(p):
            return p.reshape(-1)[:n].reshape(H, W)

        film = [f + img2(accs[j]) for j, f in enumerate(film)]
        done += kc

    fw = film[-1]
    S_ref = np.asarray(
        jnp.stack(film[:-1], -1) / jnp.maximum(fw[..., None], 1e-12)
    ).reshape(H, W, 4, 3)
    np.testing.assert_allclose(S, S_ref, rtol=2e-5, atol=2e-6)


def test_render_stokes_sharded_matches_single_chip(ref_scenes):
    """Sample-sharded Stokes megakernel render over the virtual 8-device
    mesh equals the single-chip render on the same seed range (seed0 +
    [0, spp) partitioned over devices; psum vs scan only reorders adds)."""
    import jax
    import os

    from tpu_rt.parallel.render import (
        default_mesh,
        render_stokes_pallas_sharded,
    )

    scene = tpu_rt.load_file(os.path.join(ref_scenes, "cbox_pol.xml"),
                             spp=4, res=12)
    scene = scene.replace(max_depth=3)
    mesh = default_mesh(jax.devices()[:8])
    S_sh = np.asarray(render_stokes_pallas_sharded(
        scene, spp=8, seed=5, mesh=mesh, interpret=True
    ))
    S_1 = np.asarray(pp.render_stokes_pallas(scene, spp=8, seed=5,
                                             interpret=True))
    assert S_sh.shape == S_1.shape == (12, 12, 4, 3)
    np.testing.assert_allclose(S_sh, S_1, rtol=2e-5, atol=1e-6)


def test_stokes_kernel_cbox_pol_vs_xla(ref_scenes, interpret_on):
    """cbox_pol through the Mueller megakernel vs the XLA stokes tracer:
    I within MC noise, Q/U polarization magnitudes comparable, and the
    dispatch in render_stokes routes to the kernel."""
    import os

    from tpu_rt.integrator import stokes as st

    scene = tpu_rt.load_file(os.path.join(ref_scenes, "cbox_pol.xml"),
                             spp=4, res=12)
    scene = scene.replace(max_depth=3)
    pp.render_stokes_pallas.last_ray_count = -1
    Sp = np.asarray(st.render_stokes(scene, spp=8, seed=0))
    assert pp.render_stokes_pallas.last_ray_count > 0  # kernel path taken
    assert Sp.shape == (12, 12, 4, 3)
    assert np.isfinite(Sp).all()
    Sx = np.asarray(
        st.render_stokes(scene, spp=8, seed=1, max_depth=3)  # XLA path
    )
    # I means agree within MC noise at 8 spp
    assert abs(Sp[..., 0, :].mean() - Sx[..., 0, :].mean()) / max(
        Sx[..., 0, :].mean(), 1e-9
    ) < 0.2
    # polarization by reflection present on both sides
    assert np.sqrt((Sp[..., 1, :] ** 2).mean()) > 1e-3
    assert np.sqrt((Sp[..., 2, :] ** 2).mean()) > 1e-3


def test_stokes_scope_gates():
    """Polarizer scenes stay on the XLA stokes path (true Mueller polarizer
    transport is out of kernel scope)."""
    import os

    scene = tpu_rt.load_file("/root/reference/scenes/polarizers.xml",
                             res=8, spp=1)
    bs = pp.bake_scene(scene)
    assert bs is not None
    assert not pp.stokes_in_scope(bs)


def test_render_stokes_sharded_film_path_matches_single_chip(cbox_pol12):
    """Box-filter polarized scenes shard the in-kernel film path: device i
    consumes the single-chip chunk-seed sequence's i-th chunk, so the
    8-device render must equal render_stokes_pallas(spp=8, spp_per_pass=1)
    up to psum add order."""
    from tpu_rt.parallel.render import (default_mesh,
                                        render_stokes_pallas_sharded)
    from tpu_rt.scene.types import FILTER_BOX

    scene = cbox_pol12.replace(camera=cbox_pol12.camera.replace(
        filter_type=FILTER_BOX))
    spp, seed = 8, 3
    single = np.asarray(pp.render_stokes_pallas(
        scene, spp=spp, seed=seed, interpret=True, spp_per_pass=1))
    sharded = np.asarray(render_stokes_pallas_sharded(
        scene, spp=spp, seed=seed, mesh=default_mesh(), interpret=True))
    assert sharded.shape == (12, 12, 4, 3)
    # psum tree order vs sequential chunk adds: a few near-cancelling
    # Q/U elements differ at the 1e-5 level (measured max abs 7.5e-6)
    np.testing.assert_allclose(sharded, single, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("filt", ["box", "tent", "gaussian"])
def test_film_regen_loop_equals_unrolled(cbox8, filt):
    """The persistent regeneration while_loop (per-lane sample restart —
    reclaims the dead-lane tail at deep max_depth) must equal the unrolled
    fori film kernel: the per-sample RNG re-key gives every (lane, sample)
    the same stream in both forms, and each lane meets its samples in
    order.  Tolerance is ulp-level only — XLA fuses/FMA-groups the two
    program shapes differently (measured max rel diff 2.5e-7); the
    integer-valued ray-count plane must match EXACTLY."""
    from tpu_rt.scene.types import (
        FILTER_BOX,
        FILTER_GAUSSIAN,
        FILTER_TENT,
    )

    ft = {"box": FILTER_BOX, "tent": FILTER_TENT,
          "gaussian": FILTER_GAUSSIAN}[filt]
    scene = cbox8.replace(camera=cbox8.camera.replace(filter_type=ft))
    bs = pp.bake_scene(scene)
    a, nra = pp.pallas_film_trace(bs, scene.camera, 17, 3, interpret=True,
                                  regen=False)
    b, nrb = pp.pallas_film_trace(bs, scene.camera, 17, 3, interpret=True,
                                  regen=True)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-6, atol=1e-8,
                                   err_msg=f"plane {i}")
    np.testing.assert_array_equal(np.asarray(nra), np.asarray(nrb))
    assert float(np.abs(np.asarray(a[0])).sum()) > 0.0


def test_stokes_film_regen_loop_equals_unrolled(cbox_pol12):
    """Polarized film mode: the regeneration loop carries the full Mueller
    state (T/basis/S) per lane and must still match the unrolled kernel.
    Tolerance: XLA fuses the while-loop body and the unrolled chain
    differently, and a 1-ulp divergence amplifies through the depth>=3
    second-order Mueller basis rotations (measured: exact at depth<=2,
    max rel 1.7e-5 at depth 3 on ~0.2% of elements); ray counts exact."""
    from tpu_rt.scene.types import FILTER_BOX

    scene = cbox_pol12.replace(camera=cbox_pol12.camera.replace(
        filter_type=FILTER_BOX))
    bs = pp.bake_scene(scene)
    a, nra = pp.pallas_film_trace(bs, scene.camera, 9, 3, interpret=True,
                                  stokes=True, regen=False)
    b, nrb = pp.pallas_film_trace(bs, scene.camera, 9, 3, interpret=True,
                                  stokes=True, regen=True)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-7,
                                   err_msg=f"plane {i}")
    np.testing.assert_array_equal(np.asarray(nra), np.asarray(nrb))


def test_per_sample_early_exit_equals_unrolled(cbox8, monkeypatch):
    """The depth while_loop with tile-wide early exit (per-sample kernels:
    gaussian/textured-env/Stokes scenes) is output-identical to the
    unrolled bounce chain up to XLA fusion reassociation — dead lanes
    contribute exact zeros and the rng draws they skip are never read."""
    bs = pp.bake_scene(cbox8)
    c = cbox8.camera
    monkeypatch.setattr(pp, "EARLY_EXIT_MODE", "0")
    L0, j0, n0 = pp.pallas_raygen_trace(bs, c, 3, interpret=True)
    monkeypatch.setattr(pp, "EARLY_EXIT_MODE", "1")
    L1, j1, n1 = pp.pallas_raygen_trace(bs, c, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(L0), np.asarray(L1),
                               rtol=5e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(j0), np.asarray(j1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    assert float(np.abs(np.asarray(L0)).sum()) > 0.0


def test_stokes_early_exit_equals_unrolled(cbox_pol12, monkeypatch):
    """Early exit under full Mueller transport (the cbox_pol configuration:
    gaussian filter, deep max_depth) matches the unrolled kernel (ulp-level
    tolerance; jitter planes and ray counts exact)."""
    bs = pp.bake_scene(cbox_pol12)
    c = cbox_pol12.camera
    monkeypatch.setattr(pp, "EARLY_EXIT_MODE", "0")
    S0, j0, n0 = pp.pallas_stokes_trace(bs, c, 3, interpret=True)
    monkeypatch.setattr(pp, "EARLY_EXIT_MODE", "1")
    S1, j1, n1 = pp.pallas_stokes_trace(bs, c, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(S0), np.asarray(S1),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(j0), np.asarray(j1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
