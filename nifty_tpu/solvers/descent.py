"""First-order descent minimizers: steepest descent and nonlinear CG.

Parity: reference ``SteepestDescent`` (``src/minimization/
descent_minimizers.py:199``) and ``NonlinearCG``
(``src/minimization/nonlinear_cg.py:24``, Polak–Ribière).  TPU-first
re-design: each full minimization is a single ``lax.while_loop`` over the
*flattened* latent with an inner backtracking line search — one XLA
program, no host round-trips, batches under ``vmap`` (lockstep with
done-masking like the other solvers in this package).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.flatten_util
from jax import lax
from jax import numpy as jnp

from .newton_cg import OptimizeResults, _prepare_vag_hessp


def _backtracking(fg, x, d, f, g, *, c1=1e-4, max_halvings=20):
    """Armijo backtracking from t=1; returns (t, f_new, g_new, nfev, failed)."""
    gd = jnp.dot(g, d)

    def ls_cond(ls):
        armijo = f + c1 * ls["t"] * gd
        return (ls["f_new"] > armijo) & (ls["it"] < max_halvings)

    def ls_body(ls):
        t = ls["t"] / 2.0
        f_new, g_new = fg(x + t * d)
        f_new = jnp.where(jnp.isnan(f_new), jnp.inf, f_new)
        return {"t": t, "f_new": f_new, "g_new": g_new, "it": ls["it"] + 1}

    f1, g1 = fg(x + d)
    f1 = jnp.where(jnp.isnan(f1), jnp.inf, f1)
    ls = lax.while_loop(
        ls_cond, ls_body,
        {"t": jnp.asarray(1.0, dtype=f.dtype), "f_new": f1, "g_new": g1,
         "it": jnp.asarray(0)},
    )
    failed = ls["f_new"] > f
    return ls["t"], ls["f_new"], ls["g_new"], ls["it"] + 1, failed


def _descent_loop(fg, flat0, *, direction_init, direction_update,
                  maxiter, gtol, absdelta, name):
    """Shared while_loop driver for first-order methods.

    ``direction_init(g) -> aux``; ``direction_update(g_old, g_new, d_old,
    aux) -> (d_new, aux)`` returns the next *descent* direction (sign
    included).
    """
    f0, g0 = fg(flat0)
    d0, aux0 = direction_init(g0)
    init = {
        "x": flat0,
        "f": jnp.where(jnp.isnan(f0), jnp.inf, f0),
        "g": g0,
        "d": d0,
        "aux": aux0,
        "status": jnp.where(jnp.linalg.norm(g0) < gtol, 0, -2),
        "nit": jnp.asarray(0),
        "nfev": jnp.asarray(1),
    }

    def cond(v):
        return v["status"] < -1

    def body(v):
        new = _body(v)
        done = v["status"] > -2
        return {k: jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), v[k], new[k]
        ) for k in v}

    def _body(v):
        x, f, g, d = v["x"], v["f"], v["g"], v["d"]
        nit = v["nit"] + 1
        # safeguard: restart along -g when d is not a descent direction
        d = jnp.where(jnp.dot(d, g) < 0, d, -g)
        t, f_new, g_new, nfev, failed = _backtracking(fg, x, d, f, g)
        x_new = jnp.where(failed, x, x + t * d)
        f_new = jnp.where(failed, f, f_new)
        g_new = jnp.where(failed, g, g_new)
        d_new, aux = direction_update(g, g_new, d, v["aux"])

        status = v["status"]
        status = jnp.where(failed, -1, status)
        gnorm = jnp.linalg.norm(g_new)
        status = jnp.where(gnorm < gtol, 0, status)
        if absdelta is not None:
            status = jnp.where(
                (f - f_new >= 0) & (f - f_new < absdelta) & ~failed, 0, status
            )
        status = jnp.where((nit >= maxiter) & (status == -2), nit, status)
        if name is not None:
            jax.debug.print(name + ": it {i} f {f} |g| {g}",
                            i=nit, f=f_new, g=gnorm)
        return {"x": x_new, "f": f_new, "g": g_new, "d": d_new, "aux": aux,
                "status": status, "nit": nit, "nfev": v["nfev"] + nfev}

    return lax.while_loop(cond, body, init)


def _run(fun, x0, fun_and_grad, direction_init, direction_update,
         maxiter, gtol, absdelta, name):
    fun_and_grad, _ = _prepare_vag_hessp(fun, None, lambda p, t: t,
                                         fun_and_grad)
    flat0, unravel = jax.flatten_util.ravel_pytree(x0)

    def fg(xf):
        val, g = fun_and_grad(unravel(xf))
        return val, jax.flatten_util.ravel_pytree(g)[0]

    out = _descent_loop(
        fg, flat0, direction_init=direction_init,
        direction_update=direction_update, maxiter=maxiter, gtol=gtol,
        absdelta=absdelta, name=name,
    )
    return OptimizeResults(
        x=unravel(out["x"]), success=out["status"] >= 0,
        status=out["status"], fun=out["f"], jac=unravel(out["g"]),
        nit=out["nit"], nfev=out["nfev"],
    )


def _steepest_descent(
    fun=None, x0=None, *, maxiter: int = 200, gtol: float = 1e-6,
    absdelta: Optional[float] = None, fun_and_grad=None, name=None,
    **_ignored,
) -> OptimizeResults:
    def dir_init(g):
        return -g, ()

    def dir_update(g_old, g_new, d_old, aux):
        return -g_new, aux

    return _run(fun, x0, fun_and_grad, dir_init, dir_update,
                maxiter, gtol, absdelta, name)


def _nonlinear_cg(
    fun=None, x0=None, *, maxiter: int = 200, gtol: float = 1e-6,
    absdelta: Optional[float] = None, fun_and_grad=None, name=None,
    beta_heuristics: str = "polak-ribiere",
    **_ignored,
) -> OptimizeResults:
    """Nonlinear conjugate gradient (Polak–Ribière+ or Hestenes–Stiefel).

    The β < 0 clip gives the automatic-restart PR+ variant; the reference
    offers the same two heuristics (``src/minimization/
    nonlinear_cg.py:24``).
    """
    bh = beta_heuristics.lower().replace("_", "-")
    if bh not in ("polak-ribiere", "hestenes-stiefel"):
        raise ValueError(f"invalid beta heuristics {beta_heuristics!r}")

    def dir_init(g):
        return -g, ()

    def dir_update(g_old, g_new, d_old, aux):
        dg = g_new - g_old
        if bh == "polak-ribiere":
            denom = jnp.dot(g_old, g_old)
            beta = jnp.dot(g_new, dg) / jnp.where(denom > 0, denom, 1.0)
        else:  # hestenes-stiefel
            denom = jnp.dot(d_old, dg)
            beta = jnp.dot(g_new, dg) / jnp.where(
                jnp.abs(denom) > 0, denom, 1.0
            )
        beta = jnp.maximum(beta, 0.0)  # PR+/HS+ restart
        return -g_new + beta * d_old, aux

    return _run(fun, x0, fun_and_grad, dir_init, dir_update,
                maxiter, gtol, absdelta, name)


def steepest_descent(fun=None, x0=None, *args, **kwargs):
    return _steepest_descent(fun, x0, *args, **kwargs).x


def nonlinear_cg(fun=None, x0=None, *args, **kwargs):
    return _nonlinear_cg(fun, x0, *args, **kwargs).x
