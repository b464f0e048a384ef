"""Linear Wiener filtering with implicit covariances.

Solves ``(R^T N^{-1} R + S^{-1}) m = R^T N^{-1} d`` by CG with all
operators given as callables — the classic ``WienerFilterCurvature`` +
``InversionEnabler`` capability (``src/library/wiener_filter_curvature.py
:24``, ``src/operators/inversion_enabler.py:27``) expressed functionally.
``draw_posterior_sample`` draws from the Wiener posterior via the same
metric-sampling trick the VI engine uses.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax import numpy as jnp
from jax.tree_util import tree_map

from .solvers.cg import _static_cg
from .tree import random_like, shape_dtype_like, tree_add


def wiener_filter_curvature(R: Callable, R_adj: Callable, N_inv: Callable,
                            S_inv: Callable) -> Callable:
    """Return the curvature map ``x -> R^T N^-1 R x + S^-1 x``."""

    def curv(x):
        return tree_add(R_adj(N_inv(R(x))), S_inv(x))

    return curv


def wiener_filter(
    data,
    R: Callable,
    N_inv: Callable,
    S_inv: Callable,
    *,
    domain_proto,
    R_adj: Optional[Callable] = None,
    cg_kwargs: Optional[dict] = None,
):
    """Posterior mean of the linear-Gaussian model ``d = R s + n``.

    ``R_adj`` defaults to the autodiff transpose of ``R``.
    Returns ``(mean, cg_info)``.
    """
    if R_adj is None:
        _, vjp = jax.vjp(R, tree_map(jnp.zeros_like, domain_proto))
        R_adj = lambda y: vjp(y)[0]
    curv = wiener_filter_curvature(R, R_adj, N_inv, S_inv)
    j = R_adj(N_inv(data))
    res = _static_cg(curv, j, **(cg_kwargs or dict(resnorm=1e-8, maxiter=500)))
    return res.x, res.info


def draw_posterior_sample(
    key,
    R: Callable,
    N_inv: Callable,
    S_inv: Callable,
    S_sqrt: Callable,
    N_inv_sqrt: Callable,
    *,
    domain_proto,
    data_proto,
    mean=None,
    R_adj: Optional[Callable] = None,
    S_inv_sqrt: Optional[Callable] = None,
    cg_kwargs: Optional[dict] = None,
):
    """Sample from the Wiener posterior ``N(m, (R^T N^-1 R + S^-1)^-1)``.

    Uses the metric-sample + inverse-metric-CG construction (the same
    primitive as MGVI sampling, ``src/operators/sampling_enabler.py:64``).
    Pass ``S_inv_sqrt`` when a closed form exists — the default
    ``S_inv∘S_sqrt`` composition squares the condition number, which
    costs accuracy in float32.
    """
    if R_adj is None:
        _, vjp = jax.vjp(R, tree_map(jnp.zeros_like, domain_proto))
        R_adj = lambda y: vjp(y)[0]
    k1, k2 = jax.random.split(key)
    # metric sample: R^T N^-1/2 xi_d + S^-1/2 xi_s
    xi_d = random_like(k1, shape_dtype_like(data_proto))
    xi_s = random_like(k2, shape_dtype_like(domain_proto))
    # S^{-1/2} xi = S_inv(S_sqrt(xi)) for diagonal covariances
    prior_part = (
        S_inv_sqrt(xi_s) if S_inv_sqrt is not None else S_inv(S_sqrt(xi_s))
    )
    smpl = tree_add(R_adj(N_inv_sqrt(xi_d)), prior_part)
    curv = wiener_filter_curvature(R, R_adj, N_inv, S_inv)
    res = _static_cg(curv, smpl, **(cg_kwargs or dict(resnorm=1e-8, maxiter=500)))
    sample = res.x
    if mean is not None:
        sample = tree_add(mean, sample)
    return sample, res.info
