"""Statistical tests for warps and GGX sampling (chi-square vs analytic pdf),
generalizing the reference's sampling_test.py visual check (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_rt.bsdf import microfacet as mf
from tpu_rt.core import math as m
from tpu_rt.core import warps


def _chi2_uniformity(counts, expected):
    """Simple chi-square statistic; compares against a loose threshold."""
    counts = np.asarray(counts, np.float64)
    expected = np.asarray(expected, np.float64)
    mask = expected > 5
    stat = ((counts[mask] - expected[mask]) ** 2 / expected[mask]).sum()
    dof = mask.sum() - 1
    # chi2 critical value at ~4 sigma for dof>30: dof + 4*sqrt(2*dof)
    return stat < dof + 5 * np.sqrt(2 * dof) + 20


def test_disk_concentric_uniform():
    key = jax.random.PRNGKey(0)
    s = jax.random.uniform(key, (200_000, 2))
    d = np.asarray(warps.square_to_uniform_disk_concentric(s))
    r2 = d[:, 0] ** 2 + d[:, 1] ** 2
    assert r2.max() <= 1.0 + 1e-6
    # uniform density => r^2 is uniform in [0,1]
    counts, _ = np.histogram(r2, bins=50, range=(0, 1))
    assert _chi2_uniformity(counts, np.full(50, len(r2) / 50))


def test_cosine_hemisphere_distribution():
    key = jax.random.PRNGKey(1)
    s = jax.random.uniform(key, (200_000, 2))
    d = np.asarray(warps.square_to_cosine_hemisphere(s))
    assert (d[:, 2] >= -1e-6).all()
    # pdf(theta) = 2 cos sin => cos^2 theta uniform... use z^2 uniform
    counts, _ = np.histogram(d[:, 2] ** 2, bins=50, range=(0, 1))
    assert _chi2_uniformity(counts, np.full(50, len(d) / 50))


def test_uniform_hemisphere_distribution():
    key = jax.random.PRNGKey(2)
    s = jax.random.uniform(key, (200_000, 2))
    d = np.asarray(warps.square_to_uniform_hemisphere(s))
    counts, _ = np.histogram(d[:, 2], bins=50, range=(0, 1))
    assert _chi2_uniformity(counts, np.full(50, len(d) / 50))


@pytest.mark.parametrize("alpha", [0.1, 0.5, 0.9])
def test_ggx_invcdf_matches_pdf(alpha):
    """The inverse-CDF GGX theta sampler matches the analytic pdf — the
    correctness property sampling_test.py:18,36-43 checked by eyeball."""
    key = jax.random.PRNGKey(3)
    xi = jax.random.uniform(key, (400_000,))
    theta = np.asarray(mf.ggx_sample_theta_invcdf(xi, alpha))
    bins = 64
    hi = np.pi / 2
    counts, edges = np.histogram(theta, bins=bins, range=(0, hi))
    centers = 0.5 * (edges[:-1] + edges[1:])
    pdf = np.asarray(mf.ggx_theta_pdf(jnp.asarray(centers), alpha))
    expected = pdf * (hi / bins) * len(theta)
    assert _chi2_uniformity(counts, expected)


@jax.jit
def _vndf_experiment(alpha, key1, key2):
    n = 400_000
    s = jax.random.uniform(key1, (n, 2))
    wi = jnp.tile(jnp.asarray([[0.5, 0.1, 0.86]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    mns = mf.ggx_sample_vndf(wi, alpha, s)
    s2 = jax.random.uniform(key2, (n, 2))
    u_dirs = warps.square_to_uniform_hemisphere(s2)
    pdf_u = mf.ggx_vndf_pdf(wi, u_dirs, alpha)
    return mns, u_dirs, pdf_u


@pytest.mark.parametrize("alpha", [0.2, 0.6])
def test_ggx_vndf_pdf_integrates_to_one(alpha):
    """D_vis must integrate to 1 over the hemisphere (uniform-sampling MC)."""
    _, _, pdf_u = _vndf_experiment(alpha, jax.random.PRNGKey(4), jax.random.PRNGKey(40))
    integral = float(np.asarray(pdf_u).mean() * 2 * np.pi)
    assert abs(integral - 1.0) < 0.02


@pytest.mark.parametrize("alpha", [0.2, 0.6])
def test_ggx_vndf_sample_consistency(alpha):
    """Histogram of VNDF samples over cos(theta) bins must match the bin
    masses predicted by ggx_vndf_pdf (estimated by uniform-hemisphere MC)."""
    mns, u_dirs, pdf_u = _vndf_experiment(
        alpha, jax.random.PRNGKey(5), jax.random.PRNGKey(6)
    )
    mns = np.asarray(mns)
    n = mns.shape[0]
    assert (mns[:, 2] > 0).all()

    counts, _ = np.histogram(mns[:, 2], bins=16, range=(0, 1))
    observed = counts / n

    pdf_u = np.asarray(pdf_u)
    z_u = np.asarray(u_dirs[:, 2])
    predicted = np.zeros(16)
    bins = np.minimum((z_u * 16).astype(int), 15)
    np.add.at(predicted, bins, pdf_u * (2 * np.pi / n))

    mask = predicted > 0.01
    np.testing.assert_allclose(observed[mask], predicted[mask], rtol=0.08, atol=5e-3)


def test_fresnel_dielectric_normal_incidence():
    F, cos_t, eta_it, eta_ti = m.fresnel_dielectric(jnp.asarray([1.0]), 1.5)
    np.testing.assert_allclose(F, ((0.5 / 2.5) ** 2), rtol=1e-5)
    np.testing.assert_allclose(cos_t, -1.0, rtol=1e-5)


def test_fresnel_dielectric_tir():
    # From inside glass at grazing angle: total internal reflection
    F, *_ = m.fresnel_dielectric(jnp.asarray([-0.2]), 1.5)
    np.testing.assert_allclose(F, 1.0)


def test_fresnel_conductor_reflectance_range():
    cos = jnp.linspace(0.01, 1.0, 64)
    F = m.fresnel_conductor(cos, 0.2, 3.0)
    assert float(F.min()) > 0.8 and float(F.max()) <= 1.0 + 1e-6


def test_refract_reflect_roundtrip():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = m.normalize(jnp.asarray([[0.5, 0.0, 0.8]]))
    r = m.reflect(wi, n)
    expected = np.asarray(wi) * [-1.0, 1.0, 1.0]
    np.testing.assert_allclose(np.asarray(r), expected, atol=1e-6)


def test_coordinate_system_orthonormal():
    key = jax.random.PRNGKey(7)
    n = m.normalize(jax.random.normal(key, (1000, 3)))
    s, t = m.coordinate_system(n)
    np.testing.assert_allclose(np.asarray(m.dot(n, s)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dot(n, t)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dot(s, t)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.length(s)), 1.0, atol=1e-5)
    # to_local/to_world roundtrip
    v = m.normalize(jax.random.normal(jax.random.PRNGKey(8), (1000, 3)))
    vl = m.to_local(n, s, t, v)
    vw = m.to_world(n, s, t, vl)
    np.testing.assert_allclose(np.asarray(vw), np.asarray(v), atol=1e-5)


def test_lookat_matches_mitsuba_convention():
    mat = m.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])
    # dir = -Z world, left = cross(up, dir) = (-1, 0, 0)
    np.testing.assert_allclose(mat[:3, 2], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(mat[:3, 0], [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mat[:3, 3], [0, 0, 4], atol=1e-6)
