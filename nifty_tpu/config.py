"""Global configuration for the TPU-native field-inference framework.

Mirrors the capability of the reference's global flag dict
(``/root/reference/src/config.py:3-40``) but adds a TPU-first precision
policy: the reference is float64-by-default (numpy / ducc0), whereas on TPU
the sweet spot is float32 compute with float64 islands only where solver
stability demands it.  All defaults are resolved lazily so enabling x64
(``jax.config.update("jax_enable_x64", True)``) at program start is honored.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp

_config = {
    # Convention for the Hartley transform used by the correlated field
    # model.  "non_canonical_hartley" (the reference's historic default,
    # ``/root/reference/src/config.py:14``) computes ``Re(F) + Im(F)``;
    # "canonical_hartley" computes ``Re(F) - Im(F)``.
    "hartley_convention": "non_canonical_hartley",
    # Mesh-independent reductions: when True, the tree-vector dot products
    # and norms (the scalars steering every CG/NCG/line-search branch) use
    # a fixed fold-halving association order that depends only on array
    # shapes — never on the device mesh — so inference results are
    # reproducible across mesh extents (the TPU-native analog of the
    # reference's deterministic MPI allreduce, src/utilities.py:332-339).
    # Off by default: native reductions are faster single-chip.
    "deterministic_reductions": False,
}

_ALLOWED = {
    "hartley_convention": ("non_canonical_hartley", "canonical_hartley"),
    "deterministic_reductions": (True, False),
}


def update(key: str, value):
    """Update a global configuration value (validated)."""
    if key not in _config:
        raise KeyError(f"unknown config key {key!r}")
    allowed = _ALLOWED.get(key)
    if allowed is not None and value not in allowed:
        raise ValueError(f"invalid value {value!r} for {key!r}; one of {allowed}")
    _config[key] = value


def get(key: str):
    return _config[key]


def default_float_dtype():
    """Default real floating dtype: f64 iff x64 is enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_complex_dtype():
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
