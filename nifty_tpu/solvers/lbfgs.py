"""Limited-memory BFGS, fully traceable (pytree-native).

Parity: reference ``L_BFGS``/``VL_BFGS`` (``src/minimization/
descent_minimizers.py:213,264``) and the scipy ``L_BFGS_B`` bridge —
re-designed as a single ``lax.while_loop`` with a fixed-size circular
history buffer over the *flattened* latent (two-loop recursion as a
``lax.scan``), so whole minimizations run as one XLA program and batch
under ``vmap``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.flatten_util
import numpy as np
from jax import lax
from jax import numpy as jnp

from .newton_cg import OptimizeResults, _prepare_vag_hessp


def _lbfgs_direction(g, s_hist, y_hist, rho_hist, valid):
    """Two-loop recursion; histories have fixed leading dim m."""
    m = s_hist.shape[0]

    def first_loop(carry, idx):
        q = carry
        rho = rho_hist[idx]
        alpha = jnp.where(valid[idx], rho * jnp.dot(s_hist[idx], q), 0.0)
        q = q - alpha * y_hist[idx]
        return q, alpha

    order = jnp.arange(m - 1, -1, -1)
    q, alphas = lax.scan(first_loop, g, order)

    # Initial Hessian scaling gamma = s·y / y·y of the newest pair.
    newest = m - 1
    ys = jnp.dot(s_hist[newest], y_hist[newest])
    yy = jnp.dot(y_hist[newest], y_hist[newest])
    gamma = jnp.where(valid[newest] & (yy > 0), ys / yy, 1.0)
    r = gamma * q

    def second_loop(carry, inp):
        r = carry
        idx, alpha = inp
        beta = jnp.where(valid[idx], rho_hist[idx] * jnp.dot(y_hist[idx], r), 0.0)
        r = r + (alpha - beta) * s_hist[idx]
        return r, None

    r, _ = lax.scan(second_loop, r, (order[::-1], alphas[::-1]))
    return r


def _lbfgs(
    fun=None,
    x0=None,
    *,
    maxiter: int = 200,
    m: int = 10,
    absdelta: Optional[float] = None,
    gtol: float = 1e-6,
    fun_and_grad=None,
    name=None,
    **_ignored,
) -> OptimizeResults:
    fun_and_grad, _ = _prepare_vag_hessp(fun, None, lambda p, t: t, fun_and_grad)

    flat0, unravel = jax.flatten_util.ravel_pytree(x0)
    n = flat0.size

    def fg(xf):
        val, g = fun_and_grad(unravel(xf))
        return val, jax.flatten_util.ravel_pytree(g)[0]

    f0, g0 = fg(flat0)
    init = {
        "x": flat0,
        "f": jnp.where(jnp.isnan(f0), jnp.inf, f0),
        "g": g0,
        "s": jnp.zeros((m, n), dtype=flat0.dtype),
        "y": jnp.zeros((m, n), dtype=flat0.dtype),
        "rho": jnp.zeros((m,), dtype=flat0.dtype),
        "valid": jnp.zeros((m,), dtype=bool),
        "status": jnp.asarray(-2),
        "nit": jnp.asarray(0),
        "nfev": jnp.asarray(1),
    }
    init["status"] = jnp.where(jnp.linalg.norm(g0) < gtol, 0, init["status"])

    def cond(v):
        return v["status"] < -1

    def body(v):
        new = _body(v)
        done = v["status"] > -2
        return {k: jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), v[k], new[k]
        ) for k in v}

    def _body(v):
        x, f, g = v["x"], v["f"], v["g"]
        nit = v["nit"] + 1
        d = -_lbfgs_direction(g, v["s"], v["y"], v["rho"], v["valid"])
        # ensure descent; fall back to steepest descent
        descent = jnp.dot(d, g)
        d = jnp.where(descent < 0, d, -g)

        # backtracking Armijo line search (fixed 20 halvings max)
        def ls_cond(ls):
            f_new = ls["f_new"]
            armijo = f + 1e-4 * ls["t"] * jnp.dot(g, d)
            return (f_new > armijo) & (ls["it"] < 20)

        def ls_body(ls):
            t = ls["t"] / 2.0
            f_new, g_new = fg(x + t * d)
            f_new = jnp.where(jnp.isnan(f_new), jnp.inf, f_new)
            return {"t": t, "f_new": f_new, "g_new": g_new,
                    "it": ls["it"] + 1}

        f1, g1 = fg(x + d)
        f1 = jnp.where(jnp.isnan(f1), jnp.inf, f1)
        ls = lax.while_loop(ls_cond, ls_body,
                            {"t": jnp.asarray(1.0, dtype=f.dtype),
                             "f_new": f1, "g_new": g1,
                             "it": jnp.asarray(0)})
        failed = ls["f_new"] > f
        t = ls["t"]
        x_new = jnp.where(failed, x, x + t * d)
        f_new = jnp.where(failed, f, ls["f_new"])
        g_new = jnp.where(failed, g, ls["g_new"])

        # shift history
        s_vec = x_new - x
        y_vec = g_new - g
        sy = jnp.dot(s_vec, y_vec)
        keep = (sy > 1e-12) & ~failed
        s_h = jnp.roll(v["s"], -1, axis=0).at[-1].set(
            jnp.where(keep, s_vec, 0.0)
        )
        y_h = jnp.roll(v["y"], -1, axis=0).at[-1].set(
            jnp.where(keep, y_vec, 0.0)
        )
        rho_h = jnp.roll(v["rho"], -1).at[-1].set(
            jnp.where(keep, 1.0 / jnp.where(keep, sy, 1.0), 0.0)
        )
        valid_h = jnp.roll(v["valid"], -1).at[-1].set(keep)

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
            jax.debug.print(name + ": LBFGS it {i} f {f} |g| {g}",
                            i=nit, f=f_new, g=gnorm)
        return {
            "x": x_new, "f": f_new, "g": g_new,
            "s": s_h, "y": y_h, "rho": rho_h, "valid": valid_h,
            "status": status, "nit": nit,
            "nfev": v["nfev"] + ls["it"] + 1,
        }

    out = lax.while_loop(cond, body, init)
    return OptimizeResults(
        x=unravel(out["x"]),
        success=out["status"] >= 0,
        status=out["status"],
        fun=out["f"],
        jac=unravel(out["g"]),
        nit=out["nit"],
        nfev=out["nfev"],
    )


def lbfgs(fun=None, x0=None, *args, **kwargs):
    return _lbfgs(fun, x0, *args, **kwargs).x
