"""Independent scalar NumPy reference renderer (direct illumination).

Deliberately written from scratch (straightforward textbook formulas, no
shared code with tpu_rt) so golden-image tests cross-check the JAX renderer
against a second implementation — the harness SURVEY.md §4 says the
reference repo lacks.  Supports: perspective camera (Mitsuba look_at
convention), spheres / rectangles / triangles, diffuse BSDFs, point lights
and diffuse area emitters (quad lights sampled on a regular grid), with
hard-shadow visibility.  Direct illumination only (depth 2) plus directly
visible emitters.
"""

from __future__ import annotations

import numpy as np


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


class Sphere:
    def __init__(self, center, radius, albedo):
        self.center = np.asarray(center, np.float64)
        self.radius = float(radius)
        self.albedo = np.asarray(albedo, np.float64)

    def intersect(self, o, d):
        oc = o - self.center
        b = 2 * np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - self.radius**2
        disc = b * b - 4 * c
        t = np.full(o.shape[:-1], np.inf)
        ok = disc >= 0
        sq = np.sqrt(np.maximum(disc, 0))
        t0 = (-b - sq) / 2
        t1 = (-b + sq) / 2
        tt = np.where(t0 > 1e-5, t0, t1)
        t = np.where(ok & (tt > 1e-5), tt, np.inf)
        return t

    def normal(self, p):
        return _normalize(p - self.center)


class Quad:
    """Rectangle given by corner + two edge vectors."""

    def __init__(self, corner, e1, e2, albedo, emission=None):
        self.corner = np.asarray(corner, np.float64)
        self.e1 = np.asarray(e1, np.float64)
        self.e2 = np.asarray(e2, np.float64)
        self.albedo = np.asarray(albedo, np.float64)
        self.emission = None if emission is None else np.asarray(emission, np.float64)
        self.n = _normalize(np.cross(self.e1, self.e2))
        self.area = np.linalg.norm(np.cross(self.e1, self.e2))

    def intersect(self, o, d):
        denom = np.sum(d * self.n, -1)
        t = np.sum((self.corner - o) * self.n, -1) / np.where(
            np.abs(denom) < 1e-12, 1e-12, denom
        )
        p = o + t[..., None] * d
        rel = p - self.corner
        u = np.sum(rel * self.e1, -1) / np.sum(self.e1 * self.e1)
        v = np.sum(rel * self.e2, -1) / np.sum(self.e2 * self.e2)
        ok = (np.abs(denom) > 1e-12) & (t > 1e-5) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        return np.where(ok, t, np.inf)

    def normal(self, p):
        return np.broadcast_to(self.n, p.shape)


class TriSoup:
    """Vectorized triangle batch (one intersect over all tris at once) —
    Tri-per-object looping is too slow for thousands of triangles."""

    def __init__(self, p0, e1, e2, albedo):
        self.p0 = np.asarray(p0, np.float64)          # (T, 3)
        self.e1 = np.asarray(e1, np.float64)
        self.e2 = np.asarray(e2, np.float64)
        self.albedo = np.asarray(albedo, np.float64)  # (3,) shared
        n = np.cross(self.e1, self.e2)
        self._n = n / np.maximum(
            np.linalg.norm(n, axis=-1, keepdims=True), 1e-20
        )
        self._last_idx = None

    def intersect(self, o, d, chunk=128):
        # o, d: (..., 3); broadcast against (T, 3), chunked over rays to
        # bound the (chunk, T, 3) temporaries
        flat_o = np.broadcast_to(o, d.shape).reshape(-1, 3)
        flat_d = d.reshape(-1, 3)
        n = flat_o.shape[0]
        best = np.empty(n)
        idx = np.empty(n, np.int64)
        for s0 in range(0, n, chunk):
            co = flat_o[s0:s0 + chunk, None]
            cd = flat_d[s0:s0 + chunk, None]
            pv = np.cross(cd, self.e2[None])
            det = np.sum(self.e1[None] * pv, -1)
            inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
            tv = co - self.p0[None]
            u = np.sum(tv * pv, -1) * inv
            qv = np.cross(tv, self.e1[None])
            v = np.sum(cd * qv, -1) * inv
            t = np.sum(self.e2[None] * qv, -1) * inv
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-5)
            t = np.where(ok, t, np.inf)
            ii = np.argmin(t, axis=-1)
            idx[s0:s0 + chunk] = ii
            best[s0:s0 + chunk] = t[np.arange(t.shape[0]), ii]
        # normal() reads the index of the PRIMARY intersect; render_direct
        # snapshots normals right after the primary closest() pass, before
        # any occlusion query clobbers this
        self._last_idx = idx.reshape(d.shape[:-1])
        return best.reshape(d.shape[:-1])

    def normal(self, p):
        return self._n[self._last_idx]


def render_direct_aa(shapes, point_lights, width, height, cam_origin,
                     cam_target, cam_up, fov_deg, light_grid=8,
                     env_radiance=None, ss=4):
    """Antialiased golden render: supersample ``ss``x then box-downsample
    (matches the MC renderer's box-filtered pixel averages)."""
    big = render_direct(
        shapes, point_lights, width * ss, height * ss, cam_origin, cam_target,
        cam_up, fov_deg, light_grid, env_radiance,
    )
    return big.reshape(height, ss, width, ss, 3).mean(axis=(1, 3))


def render_direct(shapes, point_lights, width, height, cam_origin, cam_target,
                  cam_up, fov_deg, light_grid=8, env_radiance=None,
                  fov_y_deg=None):
    """Direct-illumination render.  point_lights: list of (pos, intensity).
    Area lights are Quads with emission set; sampled on a light_grid^2 grid.
    fov_y_deg: vertical fov for non-square films (default: == fov_deg).
    Returns (H, W, 3) float64."""
    cam_origin = np.asarray(cam_origin, np.float64)
    d = _normalize(np.asarray(cam_target, np.float64) - cam_origin)
    left = _normalize(np.cross(np.asarray(cam_up, np.float64), d))
    up = np.cross(d, left)
    tan_half = np.tan(np.radians(fov_deg) / 2)
    tan_half_y = (tan_half if fov_y_deg is None
                  else np.tan(np.radians(fov_y_deg) / 2))

    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    u = (xs + 0.5) / width
    v = (ys + 0.5) / height
    dir_cam_x = (2 * u - 1) * tan_half
    dir_cam_y = (1 - 2 * v) * tan_half_y
    dirs = _normalize(
        dir_cam_x[..., None] * left + dir_cam_y[..., None] * up + d
    )
    o = np.broadcast_to(cam_origin, dirs.shape)

    def closest(o, dirs):
        best_t = np.full(o.shape[:-1], np.inf)
        best_i = np.full(o.shape[:-1], -1, np.int64)
        for i, s in enumerate(shapes):
            t = s.intersect(o, dirs)
            m = t < best_t
            best_t = np.where(m, t, best_t)
            best_i = np.where(m, i, best_i)
        return best_t, best_i

    def occluded(p, n_geo, target_p):
        vec = target_p - p
        dist = np.linalg.norm(vec, axis=-1)
        dd = vec / np.maximum(dist[..., None], 1e-12)
        # same surface-offset convention as tpu_rt Interaction.spawn_origin
        scale = np.maximum(1.0, np.abs(p).max(axis=-1, keepdims=True))
        sign = np.sign(np.sum(n_geo * dd, -1, keepdims=True))
        t, _ = closest(p + n_geo * sign * 1e-4 * scale, dd)
        return t < dist * (1 - 1e-3)

    t, idx = closest(o, dirs)
    hit = np.isfinite(t)
    p = o + np.where(hit, t, 0)[..., None] * dirs

    # snapshot per-shape normals now: TriSoup.normal depends on its last
    # intersect call, which later occlusion queries overwrite
    normals = [s.normal(p) for s in shapes]

    img = np.zeros(dirs.shape)
    if env_radiance is not None:
        img[~hit] = env_radiance

    for i, s in enumerate(shapes):
        m = hit & (idx == i)
        if not m.any():
            continue
        n = normals[i]
        n = np.where(np.sum(n * dirs, -1, keepdims=True) > 0, -n, n)
        # directly visible emission
        if isinstance(s, Quad) and s.emission is not None:
            img[m] += s.emission

        # point lights
        for lp, li in point_lights:
            lp = np.asarray(lp, np.float64)
            vec = lp - p
            dist2 = np.maximum(np.sum(vec * vec, -1), 1e-12)
            wl = vec / np.sqrt(dist2)[..., None]
            cos = np.maximum(np.sum(n * wl, -1), 0)
            vis = ~occluded(p, n, np.broadcast_to(lp, p.shape))
            contrib = (
                s.albedo / np.pi * np.asarray(li, np.float64)
                * (cos / dist2)[..., None]
                * vis[..., None]
            )
            img[m] += contrib[m]

        # area lights (other quads with emission): grid-sample
        for j, l in enumerate(shapes):
            if not isinstance(l, Quad) or l.emission is None or j == i:
                continue
            g = light_grid
            total = np.zeros_like(img)
            for a in range(g):
                for b in range(g):
                    lp = l.corner + (a + 0.5) / g * l.e1 + (b + 0.5) / g * l.e2
                    vec = lp - p
                    dist2 = np.maximum(np.sum(vec * vec, -1), 1e-12)
                    wl = vec / np.sqrt(dist2)[..., None]
                    cos_s = np.maximum(np.sum(n * wl, -1), 0)
                    # one-sided emitter: emits along +l.n only
                    cos_l = np.maximum(np.sum(-wl * l.n, -1), 0)
                    vis = ~occluded(p, n, np.broadcast_to(lp, p.shape))
                    total += (
                        s.albedo / np.pi * l.emission
                        * (cos_s * cos_l / dist2)[..., None]
                        * vis[..., None]
                    )
            img[m] += (total * (l.area / g / g))[m]
    return img


# ---------------------------------------------------------------------------
# Full-GI path tracer (independent check for the cbox golden; VERDICT r1
# weak #4: the committed golden was rendered by tpu_rt's own CPU backend, so
# a shared transport bug was invisible).  NEE-only estimator: diffuse
# vertices sample the light directly; emitter hits are credited only when
# every bounce since the camera (or since the last diffuse vertex) was
# specular.  Unbiased, no shared code with tpu_rt.
# ---------------------------------------------------------------------------

class Material:
    def __init__(self, kind, albedo=(0, 0, 0), emission=None,
                 int_ior=1.5046, ext_ior=1.000277):
        self.kind = kind  # 'diffuse' | 'mirror' | 'glass'
        self.albedo = np.asarray(albedo, np.float64)
        self.emission = None if emission is None else np.asarray(emission, np.float64)
        self.int_ior = float(int_ior)
        self.ext_ior = float(ext_ior)


def _cosine_hemisphere(n, rng):
    u1 = rng.random(n.shape[:-1])
    u2 = rng.random(n.shape[:-1])
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    z = np.sqrt(np.maximum(1 - u1, 0))
    # build ONB around n
    sign = np.where(n[..., 2] >= 0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = np.stack([1 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], -1)
    t2 = np.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t1 * x[..., None] + t2 * y[..., None] + n * z[..., None]


def render_path_gi(shapes, materials, light_idx, width, height, cam_origin,
                   cam_target, cam_up, fov_deg, spp, max_depth=6, seed=0,
                   wave=16):
    """Monte-Carlo GI render: returns (H, W, 3) float64 (box filter).

    shapes: list of Sphere/Quad; materials: parallel list of Material;
    light_idx: index of the emitting Quad (sampled for NEE).
    """
    rng = np.random.default_rng(seed)
    cam_origin = np.asarray(cam_origin, np.float64)
    dcam = _normalize(np.asarray(cam_target, np.float64) - cam_origin)
    left = _normalize(np.cross(np.asarray(cam_up, np.float64), dcam))
    up = np.cross(dcam, left)
    tan_half = np.tan(np.radians(fov_deg) / 2)
    light = shapes[light_idx]
    le = materials[light_idx].emission

    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    acc = np.zeros((height, width, 3))
    done = 0
    while done < spp:
        k = min(wave, spp - done)
        # one wave = k jittered samples for every pixel
        u = (xs[None] + rng.random((k, height, width))) / width
        v = (ys[None] + rng.random((k, height, width))) / height
        dirs = _normalize(
            (2 * u - 1)[..., None] * tan_half * left
            + (1 - 2 * v)[..., None] * tan_half * up
            + dcam
        ).reshape(-1, 3)
        o = np.broadcast_to(cam_origin, dirs.shape).copy()
        n_ray = dirs.shape[0]
        thr = np.ones((n_ray, 3))
        L = np.zeros((n_ray, 3))
        spec = np.ones(n_ray, bool)  # camera/specular-preceded
        active = np.ones(n_ray, bool)
        d = dirs

        def closest(o, d):
            best_t = np.full(o.shape[:-1], np.inf)
            best_i = np.full(o.shape[:-1], -1, np.int64)
            for i, s in enumerate(shapes):
                t = s.intersect(o, d)
                m = t < best_t
                best_t = np.where(m, t, best_t)
                best_i = np.where(m, i, best_i)
            return best_t, best_i

        for depth in range(max_depth):
            t, idx = closest(o, d)
            hit = np.isfinite(t) & active
            if not hit.any():
                break
            p = o + np.where(hit, t, 0)[..., None] * d

            # per-shape normals
            n = np.zeros_like(p)
            for i, s in enumerate(shapes):
                m = hit & (idx == i)
                if m.any():
                    n[m] = s.normal(p[m])

            # emitter hit (one-sided: quad normal side), spec-preceded only
            m_le = hit & (idx == light_idx) & spec
            cos_le = -np.sum(d * light.n, -1)
            m_le &= cos_le > 0
            L[m_le] += thr[m_le] * le

            new_active = np.zeros(n_ray, bool)
            new_spec = np.zeros(n_ray, bool)
            for i, s in enumerate(shapes):
                mat = materials[i]
                m = hit & (idx == i)
                if not m.any():
                    continue
                if mat.kind == "diffuse":
                    ns = np.where(
                        np.sum(n[m] * d[m], -1, keepdims=True) > 0, -n[m], n[m]
                    )
                    # NEE toward the light rect (uniform area sample)
                    if depth + 2 <= max_depth:
                        lp = (
                            light.corner
                            + rng.random((m.sum(), 1)) * light.e1
                            + rng.random((m.sum(), 1)) * light.e2
                        )
                        vec = lp - p[m]
                        dist2 = np.maximum(np.sum(vec * vec, -1), 1e-12)
                        dist = np.sqrt(dist2)
                        wl = vec / dist[..., None]
                        cos_s = np.maximum(np.sum(ns * wl, -1), 0)
                        cos_l = np.maximum(np.sum(-wl * light.n, -1), 0)
                        # shadow
                        scale = np.maximum(1.0, np.abs(p[m]).max(-1, keepdims=True))
                        sgn = np.sign(np.sum(ns * wl, -1, keepdims=True))
                        so = p[m] + ns * sgn * 1e-4 * scale
                        ts, _ = closest(so, wl)
                        vis = ts >= dist * (1 - 1e-3)
                        contrib = (
                            thr[m] * mat.albedo / np.pi * le
                            * (cos_s * cos_l / dist2 * light.area * vis)[..., None]
                        )
                        L[m] += contrib
                    # cosine bounce
                    nd = _cosine_hemisphere(ns, rng)
                    thr[m] = thr[m] * mat.albedo
                    scale = np.maximum(1.0, np.abs(p[m]).max(-1, keepdims=True))
                    o[m] = p[m] + ns * 1e-4 * scale
                    d[m] = nd
                    new_active[m] = True
                    new_spec[m] = False
                elif mat.kind == "mirror":
                    ns = np.where(
                        np.sum(n[m] * d[m], -1, keepdims=True) > 0, -n[m], n[m]
                    )
                    nd = d[m] - 2 * np.sum(d[m] * ns, -1, keepdims=True) * ns
                    scale = np.maximum(1.0, np.abs(p[m]).max(-1, keepdims=True))
                    o[m] = p[m] + ns * 1e-4 * scale
                    d[m] = _normalize(nd)
                    new_active[m] = True
                    new_spec[m] = True
                else:  # glass (smooth dielectric)
                    ng = n[m]  # outward sphere normal
                    ci = -np.sum(d[m] * ng, -1)  # >0 entering
                    outside = ci > 0
                    eta_rel = mat.int_ior / mat.ext_ior
                    eta_it = np.where(outside, eta_rel, 1 / eta_rel)
                    eta_ti = 1 / eta_it
                    nl = np.where(outside[..., None], ng, -ng)
                    cos_i = np.abs(ci)
                    sin2t = eta_ti**2 * np.maximum(1 - cos_i**2, 0)
                    c2t = 1 - sin2t
                    ct = np.sqrt(np.maximum(c2t, 0))
                    rs = (cos_i - eta_it * ct) / np.maximum(cos_i + eta_it * ct, 1e-12)
                    rp = (eta_it * cos_i - ct) / np.maximum(eta_it * cos_i + ct, 1e-12)
                    F = np.where(c2t <= 0, 1.0, 0.5 * (rs**2 + rp**2))
                    pick_r = rng.random(F.shape) < F
                    # reflect
                    nd_r = d[m] + 2 * cos_i[..., None] * nl
                    # refract
                    nd_t = (
                        eta_ti[..., None] * d[m]
                        + (eta_ti * cos_i - ct)[..., None] * nl
                    )
                    nd = np.where(pick_r[..., None], nd_r, nd_t)
                    w = np.where(pick_r, 1.0, eta_ti**2)
                    thr[m] = thr[m] * w[..., None]
                    off = np.where(pick_r[..., None], nl, -nl)
                    scale = np.maximum(1.0, np.abs(p[m]).max(-1, keepdims=True))
                    o[m] = p[m] + off * 1e-4 * scale
                    d[m] = _normalize(nd)
                    new_active[m] = True
                    new_spec[m] = True
            active = new_active
            spec = new_spec
            if not active.any():
                break

        acc += L.reshape(k, height, width, 3).sum(axis=0)
        done += k
    return acc / spp


def cbox_scene_gi():
    """The reference cbox.xml as independent shapes/materials
    (scenes/cbox.xml:36-129; luminaire radiance = the embedded transducer
    block's intensity (1,1,1), matching tpu_rt's documented divergence)."""
    white = (0.885809, 0.698859, 0.666422)
    green = (0.105421, 0.37798, 0.076425)
    red = (0.570068, 0.0430135, 0.0443706)
    shapes = [
        Quad((-1, -1, 1), (2, 0, 0), (0, 0, -2), white),     # floor y=-1
        Quad((1, 1, -1), (0, 0, 2), (-2, 0, 0), white),      # ceiling y=1
        Quad((1, -1, -1), (0, 2, 0), (-2, 0, 0), white),     # back z=-1
        Quad((-1, 1, -1), (0, 0, 2), (0, -2, 0), green),     # green x=-1
        Quad((1, -1, 1), (0, 2, 0), (0, 0, -2), red),        # red x=+1
        Quad((0.25, 0.99, -0.25), (0, 0, 0.5), (-0.5, 0, 0), white,
             emission=(1.0, 1.0, 1.0)),                      # luminaire
        Sphere((-0.3, -0.5, 0.2), 0.5, (1, 1, 1)),           # mirror
        Sphere((0.5, -0.75, -0.2), 0.25, (1, 1, 1)),         # glass
    ]
    materials = [
        Material("diffuse", white), Material("diffuse", white),
        Material("diffuse", white), Material("diffuse", green),
        Material("diffuse", red),
        Material("diffuse", white, emission=(1.0, 1.0, 1.0)),
        Material("mirror"), Material("glass"),
    ]
    return shapes, materials, 5
