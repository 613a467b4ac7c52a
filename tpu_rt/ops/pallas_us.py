"""Pallas TPU megakernel for the ultrasound acquisition bounce loop.

Fuses the whole per-ray acquisition of UltraIntegrator.simulate_acquisition
(/root/reference/CustomIntegrator.py:60-232: intersect, NEE echo to a random
receive element, attenuation/TOF/phase, acoustic GGX bounce, Russian
roulette) into one kernel over (angle x element x spp) ray lanes, emitting
per-bounce (pressure, time-sample, receive-element) records; a single XLA
scatter-add then builds the RF channel buffer (Mosaic's gather/scatter
support is too restricted to bin the time axis in-kernel).

Geometry is baked to compile-time constants via the optical megakernel's
prim baker (tpu_rt.ops.pallas_path: triangles/spheres/rectangles/cones —
covers all MitsubaScenes/*.xml and the USMain dict).  Receive-element
positions use the closed-form linear/convex array layout (CustomEmmitter
.py:33-47) instead of a table gather.

Physics formulas match tpu_rt.integrator.ultrasound (which documents the
intent-preserving fixes of the reference's defects, SURVEY.md §2d); the
XLA path is the cross-check in tests.  Acoustic BSDF params ride a runtime
SMEM table (not baked), so optimization loops reuse one compiled kernel;
``simulate_acquisition_fastgrad`` pairs the kernel primal with the XLA
path's VJP for differentiable acquisition at kernel speed.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_rt.ops.pallas_path import (
    BakedPrim,
    _add,
    _cross,
    _dot,
    _frame,
    _normalize,
    _rng_init,
    _rng_next,
    _safe_sqrt,
    _scale,
    _sub,
    _sweep,
    _to_local,
    _to_world,
    _where3,
)
from tpu_rt.scene.types import BSDF_ULTRASOUND, CONE, RECTANGLE, SPHERE, Scene

_BIG = 1e8


@dataclass
class BakedUSScene:
    prims: List[BakedPrim]
    # per-bsdf acoustic params: (z_int, alpha, z_ext)
    bsdfs: List[Tuple[float, float, float]]
    # element layout: 'linear' | 'convex'
    layout: str
    n_elements: int
    pitch: float
    radius: float
    opening_angle: float
    sensor_rows: tuple  # 3 rows of sensor_to_world (4 floats each)
    trans_n: tuple  # world transducer normal
    frequency: float
    sound_speed: float
    attenuation: float
    sampling_rate: float
    main_beam_angle: float  # radians
    cutoff_angle: float  # radians
    max_path_length: float
    max_depth: int
    num_rays: float  # n_pairs (TX weight divisor, CustomEmmitter.py:97-98)


def bake_us_scene(scene: Scene):
    """Returns BakedUSScene or None when outside the kernel's scope."""
    us = scene.ultrasound
    if us is None:
        return None
    g = scene.geometry
    if g.n_tris + g.n_analytic == 0 or g.n_tris + g.n_analytic > 64:
        return None
    btypes = np.asarray(scene.bsdf_type)
    if not set(btypes.tolist()) <= {BSDF_ULTRASOUND}:
        return None
    for t in np.asarray(g.an_type).tolist():
        if t not in (SPHERE, RECTANGLE, CONE):
            return None

    # Prim baking mirrors the optical baker's layouts (pallas_path).
    shape_bsdf = np.asarray(scene.shape_bsdf)
    shape_emitter = np.asarray(scene.shape_emitter)
    prims = []
    tri_p0 = np.asarray(g.tri_p0)
    tri_e1 = np.asarray(g.tri_e1)
    tri_e2 = np.asarray(g.tri_e2)
    tri_shape = np.asarray(g.tri_shape)
    for i in range(g.n_tris):
        ng = np.cross(tri_e1[i], tri_e2[i])
        ng = ng / max(np.linalg.norm(ng), 1e-20)
        sid = int(tri_shape[i])
        prims.append(BakedPrim(
            "tri",
            (tuple(tri_p0[i]), tuple(tri_e1[i]), tuple(tri_e2[i]), tuple(ng)),
            int(shape_bsdf[sid]), -1,
        ))
    an_type = np.asarray(g.an_type)
    an_to_world = np.asarray(g.an_to_world)
    an_to_object = np.asarray(g.an_to_object)
    an_shape = np.asarray(g.an_shape)
    for i in range(g.n_analytic):
        sid = int(an_shape[i])
        mo = an_to_object[i]
        if int(an_type[i]) == SPHERE:
            m = an_to_world[i]
            sx = np.linalg.norm(m[:3, 0])
            sy = np.linalg.norm(m[:3, 1])
            sz = np.linalg.norm(m[:3, 2])
            if abs(sx - sy) > 1e-5 * sx or abs(sx - sz) > 1e-5 * sx:
                return None
            prims.append(BakedPrim(
                "sphere", (tuple(m[:3, 3].tolist()), float(sx)),
                int(shape_bsdf[sid]), -1))
        elif int(an_type[i]) == CONE:
            prims.append(BakedPrim(
                "cone",
                (tuple(mo[0].tolist()), tuple(mo[1].tolist()),
                 tuple(mo[2].tolist())),
                int(shape_bsdf[sid]), -1))
        else:
            mw = an_to_world[i]
            nw = np.linalg.inv(mw[:3, :3]).T @ np.array([0.0, 0.0, 1.0])
            nw = nw / max(np.linalg.norm(nw), 1e-20)
            prims.append(BakedPrim(
                "rect",
                (tuple(mo[0].tolist()), tuple(mo[1].tolist()),
                 tuple(mo[2].tolist()), tuple(nw.tolist())),
                int(shape_bsdf[sid]), -1))

    # Acoustic params are NOT baked: they ride a runtime SMEM operand
    # (bsdf table), so optimization loops over impedance/roughness reuse
    # one compiled kernel and simulate_acquisition_fastgrad can trace
    # them.  Only the COUNT is static.
    bsdfs = [(None, None, None)] * scene.bsdf_params.shape[0]

    m = np.asarray(us.sensor_to_world)
    radius = float(us.radius)
    layout = "linear" if (math.isinf(radius) or radius == 0.0) else "convex"
    trans_n = m[:3, :3] @ np.array([0.0, 0.0, 1.0])
    trans_n = trans_n / max(np.linalg.norm(trans_n), 1e-20)

    A, E = us.n_angles, us.n_elements
    return BakedUSScene(
        prims=prims,
        bsdfs=bsdfs,
        layout=layout,
        n_elements=E,
        pitch=float(us.pitch),
        radius=radius if layout == "convex" else 1.0,
        opening_angle=float(us.opening_angle),
        sensor_rows=(tuple(m[0].tolist()), tuple(m[1].tolist()),
                     tuple(m[2].tolist())),
        trans_n=tuple(trans_n.tolist()),
        frequency=float(us.frequency),
        sound_speed=float(us.sound_speed),
        attenuation=float(us.attenuation),
        sampling_rate=float(us.sampling_rate),
        main_beam_angle=float(np.deg2rad(us.main_beam_angle)),
        cutoff_angle=float(np.deg2rad(us.cutoff_angle)),
        max_path_length=float(us.max_path_length),
        max_depth=int(us.max_depth),
        num_rays=float(A * E),
    )


def _acos(x):
    """Abramowitz-Stegun 4.4.45 arccos (max err ~2e-4 rad; Mosaic has no
    native acos).  Valid for x in [-1, 1]."""
    xa = jnp.abs(x)
    p = 1.5707288 + xa * (-0.2121144 + xa * (0.0742610 + xa * (-0.0187293)))
    r = _safe_sqrt(1.0 - xa) * p
    return jnp.where(x >= 0.0, r, math.pi - r)


def _elem_world(bs: BakedUSScene, r):
    """Closed-form world position of receive element index r (float array).

    linear: x = pitch*(r - (E-1)/2), z = 0  (CustomEmmitter.py:33-38)
    convex: theta = (r - E/2)*pitch/R (UltraSensor convention) or the
    opening-angle spread; x = R sin, z = R (1 - cos)  (:41-47)
    """
    E = bs.n_elements
    if bs.layout == "linear":
        x = bs.pitch * (r - (E - 1) * 0.5)
        z = jnp.zeros_like(x)
    else:
        if bs.opening_angle and bs.opening_angle > 0.0:
            span = math.radians(bs.opening_angle)
            theta = -span / 2 + r * (span / max(E - 1, 1))
        else:
            theta = (r - E / 2.0) * (bs.pitch / bs.radius)
        x = bs.radius * jnp.sin(theta)
        z = bs.radius * (1.0 - jnp.cos(theta))
    m0, m1, m2 = bs.sensor_rows
    return (
        m0[0] * x + m0[2] * z + m0[3],
        m1[0] * x + m1[2] * z + m1[3],
        m2[0] * x + m2[2] * z + m2[3],
    )


def _build_us_kernel(bs: BakedUSScene):
    E = bs.n_elements
    f_mhz = bs.frequency * 1e-6
    inv_c = 1.0 / bs.sound_speed
    two_pi_f = 2.0 * math.pi * bs.frequency
    cos_cutoff = math.cos(bs.cutoff_angle)
    inv_ramp = 1.0 / max(bs.cutoff_angle - bs.main_beam_angle, 1e-9)
    tn = bs.trans_n

    def kernel(seed_ref, bsdf_ref, ox, oy, oz, dx, dy, dz, txd, *outs):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tx_delay = txd[:]
        shape = o[0].shape
        rng = _rng_init(seed_ref[0], pl.program_id(0).astype(jnp.uint32), shape)
        zeros = jnp.zeros(shape, jnp.float32)
        ones = jnp.ones(shape, jnp.float32)

        amp = ones
        atten = ones
        tof = zeros
        geo_len = zeros
        active = ones > 0.0

        for depth in range(bs.max_depth):
            t, prim_f, n = _sweep(bs, o, d, 1e-4, _BIG)
            hit = (prim_f >= 0.0) & active
            dist = jnp.where(hit, t, 0.0)
            p_hit = _add(o, _scale(d, dist))
            wi = _scale(d, -1.0)

            rng, u_recv = _rng_next(rng)
            rng, s1 = _rng_next(rng)
            rng, s2a = _rng_next(rng)
            rng, s2b = _rng_next(rng)
            rng, u_rr = _rng_next(rng)

            recv_f = jnp.minimum(jnp.floor(u_recv * E), E - 1.0)
            target = _elem_world(bs, recv_f)
            to_recv = _sub(target, p_hit)
            dist_recv = _safe_sqrt(_dot(to_recv, to_recv))
            sec_dir = _scale(to_recv, 1.0 / dist_recv)

            off_sign = jnp.where(_dot(n, sec_dir) >= 0.0, 1.0, -1.0)
            occ = _sweep(
                bs, _add(p_hit, _scale(n, 1e-4 * off_sign)), sec_dir,
                1e-4, dist_recv * (1.0 - 1e-3), any_hit=True,
            )
            visible = hit & ~occ

            atten = atten * jnp.where(
                hit, jnp.exp(-bs.attenuation * f_mhz * dist / 8.686), 1.0
            )
            tof = tof + dist * inv_c
            total_time = tx_delay + tof + dist_recv * inv_c
            phase = two_pi_f * total_time

            # ---- acoustic GGX BSDF (bsdf/acoustic.py semantics) ----------
            # per-lane params from the baked per-bsdf table
            z_int = zeros
            alpha = zeros + 1e-3
            z_ext = zeros + 1.2
            bsdf_id = jnp.full(shape, -1.0)
            for pi, p in enumerate(bs.prims):
                bsdf_id = jnp.where(prim_f == float(pi), float(p.bsdf), bsdf_id)
            for bi in range(len(bs.bsdfs)):
                m = bsdf_id == float(bi)
                z_int = jnp.where(m, bsdf_ref[bi, 0], z_int)
                alpha = jnp.where(m, bsdf_ref[bi, 1], alpha)
                z_ext = jnp.where(m, bsdf_ref[bi, 2], z_ext)

            s_fr, t_fr = _frame(n)
            wi_l = _to_local(n, s_fr, t_fr, wi)
            cos_wi = wi_l[2]

            # VNDF sample (Heitz spherical cap; two-sided via flip)
            flip = jnp.where(cos_wi >= 0.0, 1.0, -1.0)
            wif = (wi_l[0] * flip, wi_l[1] * flip, wi_l[2] * flip)
            vh = _normalize((alpha * wif[0], alpha * wif[1], wif[2]))
            lensq = vh[0] * vh[0] + vh[1] * vh[1]
            inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
            big = lensq > 1e-20
            t1v = (
                jnp.where(big, -vh[1] * inv_len, 1.0),
                jnp.where(big, vh[0] * inv_len, 0.0),
                zeros,
            )
            t2v = _cross(vh, t1v)
            r_h = jnp.sqrt(jnp.maximum(s2a, 0.0))
            phi_h = 2.0 * math.pi * s2b
            p1h = r_h * jnp.cos(phi_h)
            p2h = r_h * jnp.sin(phi_h)
            s_h = 0.5 * (1.0 + vh[2])
            p2h = (1.0 - s_h) * _safe_sqrt(1.0 - p1h * p1h) + s_h * p2h
            nh = _add(
                _add(_scale(t1v, p1h), _scale(t2v, p2h)),
                _scale(vh, _safe_sqrt(1.0 - p1h * p1h - p2h * p2h)),
            )
            mh = _normalize((alpha * nh[0], alpha * nh[1],
                             jnp.maximum(nh[2], 1e-6)))
            mh = (mh[0] * flip, mh[1] * flip, mh[2] * flip)

            cos_im = _dot(wi_l, mh)
            entering = cos_wi > 0.0
            Z1 = jnp.where(entering, z_ext, z_int)
            Z2 = jnp.where(entering, z_int, z_ext)
            ratio = Z1 / jnp.maximum(Z2, 1e-6)
            cos_i = jnp.abs(cos_im)
            sin_t_sqr = ratio * ratio * (1.0 - cos_i * cos_i)
            tir = sin_t_sqr > 1.0
            cos_t = _safe_sqrt(1.0 - sin_t_sqr)
            denom = Z2 * cos_i + Z1 * cos_t
            R = (Z2 * cos_i - Z1 * cos_t) / jnp.maximum(denom, 1e-9)
            T = 1.0 + R
            wo_r = _sub(_scale(mh, 2.0 * cos_im), wi_l)
            wo_t = _add(_scale(wi_l, -ratio), _scale(mh, ratio * cos_i - cos_t))
            prob_r = jnp.clip(R * R, 0.05, 0.95)
            prob_r = jnp.where(tir, 1.0, prob_r)
            pick_r = (s1 < prob_r) | tir
            wo_l = _normalize(_where3(pick_r, wo_r, wo_t))
            bs_amp = jnp.where(
                pick_r,
                jnp.abs(R) / prob_r,
                jnp.abs(T) / jnp.maximum(1.0 - prob_r, 1e-6),
            )

            cos_theta = jnp.abs(cos_wi)
            amp = amp * jnp.where(hit, bs_amp * cos_theta, 1.0)

            # RX directivity ramp (CustomIntegrator.py:120-135)
            cos_a = -(sec_dir[0] * tn[0] + sec_dir[1] * tn[1] + sec_dir[2] * tn[2])
            a_ang = jnp.abs(_acos(jnp.clip(cos_a, -0.999999, 0.999999)))
            ramp = (bs.cutoff_angle - a_ang) * inv_ramp
            fd_dir = jnp.where(
                a_ang <= bs.main_beam_angle, 1.0,
                jnp.where(a_ang <= bs.cutoff_angle, ramp, 0.0),
            )
            fd = fd_dir * cos_theta / bs.num_rays
            pressure = atten * amp * fd * jnp.sin(phase)

            press_out, tf_out, recv_out = (
                outs[3 * depth], outs[3 * depth + 1], outs[3 * depth + 2]
            )
            press_out[:] = jnp.where(visible, pressure, 0.0)
            tf_out[:] = total_time * bs.sampling_rate
            recv_out[:] = recv_f

            # bounce + RR (unbiased form, integrator/ultrasound.py:209-216)
            d_new = _normalize(_to_world(n, s_fr, t_fr, wo_l))
            off2 = jnp.where(_dot(n, d_new) >= 0.0, 1.0, -1.0)
            o_new = _add(p_hit, _scale(n, 1e-4 * off2))
            geo_len = geo_len + dist

            rr_prob = jnp.clip(jnp.abs(atten * amp), 0.05, 1.0)
            survive = u_rr < rr_prob
            atten = jnp.where(survive, atten / rr_prob, 0.0)

            within = (d_new[0] * tn[0] + d_new[1] * tn[1] + d_new[2] * tn[2]) >= cos_cutoff
            alive = hit & survive & within & (geo_len < bs.max_path_length)

            o = _where3(alive, o_new, o)
            d = _where3(alive, d_new, d)
            active = alive

    return kernel


def simulate_acquisition_pallas(scene: Scene, seed=0, rays_per_pair=1,
                                baked=None, tile_rows=8, interpret=False):
    """Megakernel acquisition.  Returns (channel_buf [A, E, T], tx_delays).

    Falls back by raising ValueError when the scene is out of scope (caller
    should use integrator.ultrasound.simulate_acquisition).  Not
    differentiable — the XLA path remains the jax.grad route.
    """
    from tpu_rt.sensor.transducer import plane_wave_rays

    bs = baked if baked is not None else bake_us_scene(scene)
    if bs is None:
        raise ValueError("scene not supported by the ultrasound megakernel")
    us = scene.ultrasound
    A, E, T = us.n_angles, us.n_elements, us.time_samples

    base = plane_wave_rays(us)
    n_pairs = A * E
    n = n_pairs * rays_per_pair

    def rep(x):
        return jnp.repeat(x, rays_per_pair, axis=0)

    o = rep(base["o"])
    d = rep(base["d"])
    tx_delay = rep(base["tx_delay"])
    angle_idx = rep(base["angle_idx"])

    lanes = 128
    tile = tile_rows * lanes
    pad = (-n) % tile
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))], 0)
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 3))], 0
        )
        tx_delay = jnp.concatenate([tx_delay, jnp.full((pad,), -1e9)], 0)
        # pad lanes get total_time ~ -1e9 -> t index far out of range
    rows = (n + pad) // lanes
    grid = rows // tile_rows

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tx_delay]
    comps = [x.reshape(rows, lanes) for x in comps]

    # Runtime acoustic-param table (same clamps the old bake applied).
    prm = jnp.asarray(scene.bsdf_params, jnp.float32)
    bsdf_tab = jnp.stack(
        [prm[:, 0],
         jnp.clip(prm[:, 1], 1e-3, 1.0),
         jnp.where(prm[:, 2] > 0.0, prm[:, 2], 1.2)], axis=-1,
    )

    kernel = _build_us_kernel(bs)
    block = pl.BlockSpec((tile_rows, lanes), lambda i, *_s: (i, 0),
                         memory_space=pltpu.VMEM)
    D = bs.max_depth
    out_shape = [jax.ShapeDtypeStruct((rows, lanes), jnp.float32)] * (3 * D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed + bsdf param table
        grid=(grid,),
        in_specs=[block] * 7,
        out_specs=[block] * (3 * D),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), bsdf_tab, *comps)

    # XLA scatter: per-depth linear-interp deposit into the RF buffer.
    channel = jnp.zeros((A * E * T,), jnp.float32)
    angle_pad = jnp.concatenate(
        [angle_idx, jnp.zeros((pad,), angle_idx.dtype)], 0
    ) if pad else angle_idx
    # Pad lanes (o=0, d=+z) can genuinely hit geometry; don't rely on the
    # implementation-defined out-of-range f32->int32 cast of their huge
    # negative tx_delay-derived time (ADVICE r2) — mask them out explicitly
    # and clamp t_f into a representable range before the cast.
    lane_valid = jnp.arange(rows * lanes) < n
    for depth in range(D):
        press = jnp.where(lane_valid, outs[3 * depth].reshape(-1), 0.0)
        t_f = jnp.clip(outs[3 * depth + 1].reshape(-1), -2.0, float(T) + 2.0)
        recv = jnp.clip(outs[3 * depth + 2].reshape(-1).astype(jnp.int32),
                        0, E - 1)
        t0 = jnp.floor(t_f)
        w1 = t_f - t0
        t0i = t0.astype(jnp.int32)
        base_idx = (angle_pad * E + recv) * T
        in0 = (t0i >= 0) & (t0i < T)
        in1 = (t0i + 1 >= 0) & (t0i + 1 < T)
        channel = channel.at[jnp.clip(base_idx + t0i, 0, A * E * T - 1)].add(
            jnp.where(in0, press * (1.0 - w1), 0.0)
        )
        channel = channel.at[jnp.clip(base_idx + t0i + 1, 0, A * E * T - 1)].add(
            jnp.where(in1, press * w1, 0.0)
        )

    channel_buf = channel.reshape(A, E, T) / float(rays_per_pair)
    tx = base["tx_delay"].reshape(A, E)
    return channel_buf, tx


# ---------------------------------------------------------------------------
# Differentiable wrapper: kernel primal, XLA-path gradient
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def simulate_acquisition_fastgrad(scene: Scene, seed=0, rays_per_pair=1,
                                  interpret=False):
    """Acquisition with the megakernel primal and an XLA-path VJP.

    Forward runs ``simulate_acquisition_pallas`` (6-16x on chip); backward
    replays ``integrator.ultrasound.simulate_acquisition`` — the reference
    physics in differentiable XLA form — through jax.vjp at the same seed.

    The kernel and the XLA tracer use different RNG streams, so the
    gradient is an INDEPENDENT unbiased MC estimate of the true gradient
    rather than the derivative of the primal sample (both estimate the
    same integrals — cross-checked in tests/test_pallas_us.py).  For
    stochastic optimization this is the standard decorrelated-gradient
    setting (cf. the reference's finite-difference loop, USMain.py:262-289,
    whose two evaluations are also independent realizations).

    Raises ValueError when the scene is outside kernel scope — fall back
    to simulate_acquisition, which is its own VJP.
    """
    return simulate_acquisition_pallas(
        scene, seed=seed, rays_per_pair=rays_per_pair, interpret=interpret
    )


def _fastgrad_fwd(scene, seed, rays_per_pair, interpret):
    # (fwd keeps the primal's signature; only bwd gets nondiff args first.
    # seed is a DIFF arg so jitted callers may trace it — its cotangent is
    # the int-typed float0 zero; it rides to bwd as a residual.)
    out = simulate_acquisition_pallas(
        scene, seed=seed, rays_per_pair=rays_per_pair, interpret=interpret
    )
    return out, (scene, seed)


def _fastgrad_bwd(rays_per_pair, interpret, res, g):
    from tpu_rt.integrator.ultrasound import simulate_acquisition

    scene, seed = res
    _, vjp = jax.vjp(
        lambda s: simulate_acquisition(
            s, seed=seed, rays_per_pair=rays_per_pair
        ),
        scene,
    )
    (d_scene,) = vjp(g)
    seed_ct = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return (d_scene, seed_ct)


simulate_acquisition_fastgrad.defvjp(_fastgrad_fwd, _fastgrad_bwd)
