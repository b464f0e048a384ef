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
