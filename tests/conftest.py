"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Mirrors the reference's CPU-only CI (``/root/reference/.gitlab-ci.yml:6``)
while additionally exposing 8 virtual devices so multi-chip sharding tests
(`jax.sharding.Mesh` over "samples" × "field" axes) execute without TPU
hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)


def load_reference_re():
    """Import the reference NIFTy.re with shims for the newer JAX.

    Used only by parity tests; returns None when unavailable.
    """
    import sys
    import types

    import jax
    import jax.tree_util as jtu

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jtu.tree_map
    if "jax.experimental.host_callback" not in sys.modules:
        hcb = types.ModuleType("jax.experimental.host_callback")

        def _call(fn, arg, *, result_shape=None, **kw):
            jax.debug.callback(lambda a: fn(a), arg)

        hcb.call = _call
        sys.modules["jax.experimental.host_callback"] = hcb
        import jax.experimental

        jax.experimental.host_callback = hcb
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import nifty8.re as jref

        return jref
    except Exception:
        return None


# -- fast/slow lanes --------------------------------------------------------
# Long-running tests (measured with --durations on the 8-device CPU mesh)
# are auto-marked `slow`; `-m "not slow"` gives a < 5 min fast lane while
# the full suite stays the CI gate (reference analog: .gitlab-ci.yml's
# separate quick/schedule jobs).

_SLOW_TESTS = (
    "test_tomography_3d.py",
    "test_multiprocess.py",
    "test_f32_acceptance.py::test_f32_posterior_statistically_matches_f64",
    "test_parallel.py::test_field_sharded_geovi_update_statistically_consistent",
    "test_parallel.py::test_field_sharded_fused_vi_update_matches_unsharded",
    "test_parallel.py::test_deterministic_mode",
    "test_optimize_kl.py::test_residual_map_variants",
    "test_optimize_kl.py::test_fused_update_matches_staged",
    "test_optimize_kl.py::test_optimize_kl_resume",
    "test_optimize_kl.py::test_optimize_kl_orbax_checkpoint_roundtrip",
    "test_optimize_kl.py::test_nonlinear_update_mode",
    "test_optimize_kl.py::test_optimize_kl_recovers_truth",
    "test_optimize_kl.py::test_optimize_kl_schedules",
    "test_optimize_kl.py::test_vi_point_estimates",
    "test_domains_field_sht.py::test_spherical_cf_inference",
    "test_domains_field_sht.py::TestOnTheFlySHT::test_grad_and_vmap_match_table",
    "test_correlated_field.py::test_log_binned_power_spectrum",
    "test_correlated_field.py::test_cf_matches_reference",
    "test_correlated_field.py::test_cf_multi_subdomain_matches_reference",
    "test_adjoint.py::test_gl_sht_synthesis_adjoint",
    "test_adjoint.py::test_correlated_field_jacobian_matrix",
    "test_adjoint.py::test_distributed_hartley_adjoint",
    "test_adjoint.py::test_linear_consistency_matrix",
    "test_adjoint.py::test_nufft2_adjoint_of_nufft1",
    "test_hmc.py::test_nuts_vs_vi_crosscheck",
    "test_reference_e2e.py::test_posterior_matches_reference_within_mc_error",
    "test_diagnostics.py::test_calculate_position",
    "test_num_and_responses.py::test_fullcov_vi_recovers_correlations",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
