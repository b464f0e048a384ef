"""SciPy minimizer bridge: host-side L-BFGS-B (and friends) over pytrees.

The reference exposes scipy's battle-tested bound-constrained L-BFGS-B as a
``Minimizer`` (``src/minimization/scipy_minimizer.py:73,134``).  The
TPU-native stack normally prefers the traced in-device (V)L-BFGS/Newton-CG
(:mod:`nifty_tpu.solvers`) — one compiled program, no host round-trips —
but a host-driver bridge is still useful for small latent spaces, for
cross-checking solver implementations, and for scipy-only features (bound
constraints).  This bridge ravels the latent pytree to a flat float64
numpy vector, drives ``scipy.optimize.minimize`` with a jit-compiled
value-and-gradient callback, and unravels the result.

Not jit-traceable by construction (scipy runs on the host); use the
native solvers inside fused programs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax import numpy as jnp
from jax.flatten_util import ravel_pytree

from .newton_cg import OptimizeResults


def minimize_scipy(
    fun: Optional[Callable],
    x0,
    *,
    method: str = "L-BFGS-B",
    fun_and_grad: Optional[Callable] = None,
    bounds=None,
    tol: Optional[float] = None,
    maxiter: Optional[int] = None,
    options: Optional[dict] = None,
    jit: bool = True,
) -> OptimizeResults:
    """Minimize ``fun`` over a pytree via ``scipy.optimize.minimize``.

    Parameters mirror the native ``minimize`` where they overlap; extras:

    - ``bounds``: scipy-style bounds over the *raveled* vector (or a
      pytree of (lo, hi) broadcastable leaves);
    - ``method``: any gradient-based scipy method ("L-BFGS-B" default,
      the reference's choice).

    Returns the usual :class:`OptimizeResults`.
    """
    import scipy.optimize as sopt

    if fun_and_grad is None:
        if fun is None:
            raise ValueError("need `fun` or `fun_and_grad`")
        fun_and_grad = jax.value_and_grad(fun)
    if jit:
        fun_and_grad = jax.jit(fun_and_grad)

    flat0, unravel = ravel_pytree(x0)
    flat0 = np.asarray(flat0, dtype=np.float64)

    def host_vg(z):
        v, g = fun_and_grad(unravel(jnp.asarray(z, dtype=flat0.dtype)))
        gflat, _ = ravel_pytree(g)
        return float(v), np.asarray(gflat, dtype=np.float64)

    if (
        bounds is not None
        and not isinstance(bounds, sopt.Bounds)
        and len(bounds) == 2
    ):
        # (lo, hi) broadcast over the whole latent tree.
        lo, hi = bounds
        lo_flat, _ = ravel_pytree(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(jnp.asarray(lo, x.dtype), x.shape),
                x0,
            )
        )
        hi_flat, _ = ravel_pytree(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(jnp.asarray(hi, x.dtype), x.shape),
                x0,
            )
        )
        bounds = sopt.Bounds(np.asarray(lo_flat), np.asarray(hi_flat))

    options = dict(options or {})
    if maxiter is not None:
        options.setdefault("maxiter", int(maxiter))
    res = sopt.minimize(
        host_vg, flat0, jac=True, method=method, bounds=bounds, tol=tol,
        options=options,
    )
    return OptimizeResults(
        x=unravel(jnp.asarray(res.x)),
        success=bool(res.success),
        status=int(res.status),
        fun=jnp.asarray(res.fun),
        jac=unravel(jnp.asarray(res.jac))
        if getattr(res, "jac", None) is not None else None,
        nfev=int(getattr(res, "nfev", 0)),
        njev=int(getattr(res, "njev", 0)),
        nit=int(getattr(res, "nit", 0)),
    )
