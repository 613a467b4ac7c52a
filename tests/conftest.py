"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding tests run without TPU hardware (SURVEY.md §2c TPU-native mapping)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: first-time per-op XLA compiles are ~1s on
# this host; caching makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

# The environment's 'axon' TPU plugin ignores the JAX_PLATFORMS env var, so
# force the CPU backend through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"

# ---------------------------------------------------------------------------
# Quick smoke tier (VERDICT r3 #8): `pytest tests -m quick` runs a ~2-minute
# subset covering every subsystem, so short sessions can end on a green gate
# without the ~80-minute full suite.  Whole files listed here are fast;
# QUICK_TESTS cherry-picks fast items out of slow files.
# ---------------------------------------------------------------------------
QUICK_FILES = {
    "test_warps_and_math.py",
    "test_scene_loading.py",
    "test_pulse_and_film.py",
    "test_exr.py",
}
QUICK_TESTS = {
    "test_render_optical.py::test_simple_direct",
    "test_render_optical.py::test_camera_clip_propagation",
    "test_render_optical.py::test_near_far_clip_are_ray_extents",
    "test_ultrasound.py::test_das_point_scatterer_localization",
    "test_ultrasound.py::test_das_matmul_matches_gather",
    "test_ultrasound.py::test_das_matmul_short_rf_buffer",
    "test_pallas_kernel.py::test_render_pallas_interpret_smoke",
    "test_pallas_kernel.py::test_pallas_direct_visibility_exact",
    "test_pallas_mesh.py::test_clusters_built_for_mesh_scene",
    "test_pallas_mesh.py::test_fused_segmented_sweep_matches_per_segment_calls",
    "test_stokes.py::test_malus_law_mueller",
    "test_stokes.py::test_fresnel_mueller_brewster_fully_polarized",
    "test_parallel_and_grad.py::test_sharded_render_matches_single_chip",
    "test_curves.py::test_curve_scene_exact_prims_and_normals",
    "test_golden_images.py::test_point_light_sphere_on_floor",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast smoke tier (~2 min; see CLAUDE.md)"
    )
    config.addinivalue_line(
        "markers", "slow: multi-minute statistical/FD-validation tests"
    )


def pytest_collection_modifyitems(config, items):
    for it in items:
        base = os.path.basename(str(it.fspath))
        if base in QUICK_FILES or f"{base}::{it.name}" in QUICK_TESTS:
            it.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def ref_scenes():
    return os.path.join(REFERENCE, "scenes")


@pytest.fixture(scope="session")
def ref_us_scenes():
    return os.path.join(REFERENCE, "MitsubaScenes")
