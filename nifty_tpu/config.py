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
    # MIXED-PRECISION POLICY for accuracy-grade inference on TPU.  With
    # "float32", harmonic transforms inside the correlated field run in
    # f32 (inputs cast down, outputs cast back) while the latent state,
    # pointwise nonlinearities, and energy reductions keep the ambient
    # dtype.  Rationale (measured round 5, 64^2 CF geoVI): pure-f32
    # inference mis-infers the power spectrum at intermediate k
    # (posterior std inflated 1.4x, band powers 4-7x — the f32 Newton-CG
    # stalls ~2.4x above the f64 optimum in energy), while x64 state with
    # f32 transforms matches the f64 posterior within Monte-Carlo error
    # (std ratio 1.05, all band powers within 1.2).  On TPU, complex128
    # is unsupported in hardware anyway — so "float32" is the ONLY way to
    # run x64-state inference on chip, and the recommended accuracy-grade
    # configuration: jax.config.update("jax_enable_x64", True) plus
    # nifty_tpu.config.update("transform_compute_dtype", "float32").
    # None (default) keeps transforms in the ambient dtype.
    "transform_compute_dtype": None,
}

_ALLOWED = {
    "hartley_convention": ("non_canonical_hartley", "canonical_hartley"),
    "deterministic_reductions": (True, False),
    "transform_compute_dtype": (None, "float32"),
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
