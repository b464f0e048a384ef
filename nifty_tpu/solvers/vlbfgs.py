"""Vector-free L-BFGS (VL-BFGS), fully traceable.

Parity: reference ``VL_BFGS`` (``src/minimization/
descent_minimizers.py:264``, after Chen, Xu & Zhang 2014).  The two-loop
recursion is re-expressed on the basis ``B = [s_0..s_{m-1}, y_0..y_{m-1},
g]``: all pairwise inner products are collected in one (2m+1)×(2m+1) Gram
matrix ``G = B Bᵀ`` — a single batched matmul per iteration (one MXU call,
and on a sharded mesh one ``psum`` instead of 4m sequential dot-product
collectives) — after which the recursion only manipulates a (2m+1)
coefficient vector.  The search direction is one matvec ``δᵀB``.

This is the TPU/distributed-native formulation of L-BFGS: per-iteration
communication is O(1) collectives independent of the history length.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.flatten_util
from jax import lax
from jax import numpy as jnp

from .newton_cg import OptimizeResults, _prepare_vag_hessp


def _vl_direction(G, rho, valid, m):
    """Two-loop recursion on Gram-matrix coefficients.

    Basis layout: rows 0..m-1 = s (oldest..newest), m..2m-1 = y, 2m = g.
    Returns δ with direction d = Σ_j δ_j B_j (descent sign included).
    """
    nb = 2 * m + 1
    delta = jnp.zeros((nb,), dtype=G.dtype).at[2 * m].set(-1.0)

    def first_loop(carry, i):
        delta = carry
        # α_i = ρ_i <s_i, q> = ρ_i Σ_j δ_j G[i, j]
        alpha = jnp.where(valid[i], rho[i] * jnp.dot(G[i], delta), 0.0)
        delta = delta.at[m + i].add(-alpha)
        return delta, alpha

    order = jnp.arange(m - 1, -1, -1)
    delta, alphas = lax.scan(first_loop, delta, order)

    # γ = s·y / y·y of the newest valid pair
    newest = m - 1
    ys = G[newest, m + newest]
    yy = G[m + newest, m + newest]
    gamma = jnp.where(valid[newest] & (yy > 0), ys / yy, 1.0)
    delta = gamma * delta

    def second_loop(carry, inp):
        delta = carry
        i, alpha = inp
        beta = jnp.where(valid[i], rho[i] * jnp.dot(G[m + i], delta), 0.0)
        delta = delta.at[i].add(alpha - beta)
        return delta, None

    delta, _ = lax.scan(second_loop, delta, (order[::-1], alphas[::-1]))
    return delta


def _vlbfgs(
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
    fun_and_grad, _ = _prepare_vag_hessp(fun, None, lambda p, t: t,
                                         fun_and_grad)
    flat0, unravel = jax.flatten_util.ravel_pytree(x0)
    n = flat0.size
    nb = 2 * m + 1

    def fg(xf):
        val, g = fun_and_grad(unravel(xf))
        return val, jax.flatten_util.ravel_pytree(g)[0]

    f0, g0 = fg(flat0)
    init = {
        "x": flat0,
        "f": jnp.where(jnp.isnan(f0), jnp.inf, f0),
        "g": g0,
        "B": jnp.zeros((nb, n), dtype=flat0.dtype).at[2 * m].set(g0),
        "rho": jnp.zeros((m,), dtype=flat0.dtype),
        "valid": jnp.zeros((m,), dtype=bool),
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
        x, f, g, B = v["x"], v["f"], v["g"], v["B"]
        nit = v["nit"] + 1
        # One Gram matmul replaces all inner products of the recursion.
        G = jnp.matmul(B, B.T, precision=lax.Precision.HIGHEST)
        delta = _vl_direction(G, v["rho"], v["valid"], m)
        d = jnp.matmul(delta, B, precision=lax.Precision.HIGHEST)
        d = jnp.where(jnp.dot(d, g) < 0, d, -g)

        def ls_cond(ls):
            armijo = f + 1e-4 * ls["t"] * jnp.dot(g, d)
            return (ls["f_new"] > armijo) & (ls["it"] < 20)

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

        s_vec = x_new - x
        y_vec = g_new - g
        sy = jnp.dot(s_vec, y_vec)
        keep = (sy > 1e-12) & ~failed
        # shift s rows (0..m-1) and y rows (m..2m-1); newest at m-1 / 2m-1
        s_blk = jnp.roll(B[:m], -1, axis=0).at[m - 1].set(
            jnp.where(keep, s_vec, 0.0)
        )
        y_blk = jnp.roll(B[m:2 * m], -1, axis=0).at[m - 1].set(
            jnp.where(keep, y_vec, 0.0)
        )
        B_new = jnp.concatenate([s_blk, y_blk, g_new[None]], axis=0)
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
            jax.debug.print(name + ": VL-BFGS it {i} f {f} |g| {g}",
                            i=nit, f=f_new, g=gnorm)
        return {
            "x": x_new, "f": f_new, "g": g_new, "B": B_new,
            "rho": rho_h, "valid": valid_h,
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


def vlbfgs(fun=None, x0=None, *args, **kwargs):
    return _vlbfgs(fun, x0, *args, **kwargs).x
