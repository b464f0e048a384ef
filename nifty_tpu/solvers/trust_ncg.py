"""Trust-region Newton with a CG-Steihaug subproblem solver.

Fully traceable (one ``lax.while_loop`` per level), pytree-native.
Parity: reference ``src/re/conjugate_gradient.py:454`` (CG-Steihaug) and
``src/re/optimize.py:258`` (``_trust_ncg``); the algorithm follows
Nocedal & Wright chapter 4 (dogleg-free trust region with Steihaug
boundary handling).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
from jax import lax
from jax import numpy as jnp

from ..tree import norm as tree_norm
from ..tree import size, tree_axpy, vdot, where, zeros_like
from .newton_cg import OptimizeResults, _prepare_vag_hessp


class _QuadSubResult(NamedTuple):
    step: Any
    hits_boundary: Union[bool, jnp.ndarray]
    pred_f: Union[float, jnp.ndarray]
    nit: Union[int, jnp.ndarray]
    nhev: Union[int, jnp.ndarray]
    success: Union[bool, jnp.ndarray]


def _boundary_intersections(z, d, trust_radius):
    """Solve ||z + t d|| == trust_radius for t (returns sorted pair)."""
    a = vdot(d, d).real
    b = 2 * vdot(z, d).real
    c = vdot(z, z).real - trust_radius ** 2
    sqrt_disc = jnp.sqrt(jnp.maximum(b * b - 4 * a * c, 0.0))
    aux = b + jnp.copysign(sqrt_disc, b)
    ta = -aux / (2 * a)
    tb = -2 * c / aux
    return jnp.minimum(ta, tb), jnp.maximum(ta, tb)


def cg_steihaug_subproblem(
    cur_val,
    g,
    hessp_at_xk: Callable,
    *,
    trust_radius,
    resnorm: Optional[float] = None,
    absdelta: Optional[float] = None,
    norm_ord=None,
    miniter: Optional[int] = None,
    maxiter: Optional[int] = None,
) -> _QuadSubResult:
    """Approximately minimize the quadratic model within the trust region.

    Stops at the boundary along the current direction on non-positive
    curvature or when the step would exit the region.
    """
    norm_ord = 2 if norm_ord is None else norm_ord
    maxiter_fallback = 20 * size(g)
    miniter = min(6, maxiter_fallback) if miniter is None else miniter
    maxiter = (
        max(min(200, maxiter_fallback), miniter) if maxiter is None else maxiter
    )
    if resnorm is None:
        mag_g = tree_norm(g, ord=norm_ord)
        resnorm = jnp.minimum(0.5, jnp.sqrt(mag_g)) * mag_g

    z = zeros_like(g)
    r = g
    d = jax.tree_util.tree_map(jnp.negative, g)

    def model(p, hp):
        return cur_val + vdot(g, p).real + 0.5 * vdot(p, hp).real

    def boundary_step(z, d):
        ta, tb = _boundary_intersections(z, d, trust_radius)
        pa = tree_axpy(ta, d, z)
        pb = tree_axpy(tb, d, z)
        hpa = hessp_at_xk(pa)
        hpb = hessp_at_xk(pb)
        better_a = model(pa, hpa) < model(pb, hpb)
        p = where(better_a, pa, pb)
        pf = jnp.where(better_a, model(pa, hpa), model(pb, hpb))
        return p, pf

    init = {
        "z": z,
        "r": r,
        "d": d,
        "step": z,
        "pred_f": jnp.asarray(cur_val, dtype=jnp.result_type(float)),
        "hits_boundary": jnp.asarray(False),
        "done": jnp.asarray(False),
        "nit": jnp.asarray(0),
        "nhev": jnp.asarray(0),
        "gamma": vdot(r, r).real,
    }
    # Gradient already tiny: return the zero step.
    init["done"] = tree_norm(g, ord=norm_ord) < resnorm

    def cond(v):
        return ~v["done"] & (v["nit"] < maxiter)

    def body(v):
        new = _body(v)
        return {k: where(v["done"], v[k], new[k]) for k in v}

    def _body(v):
        z, r, d = v["z"], v["r"], v["d"]
        nit = v["nit"] + 1
        hd = hessp_at_xk(d)
        nhev = v["nhev"] + 1
        curv = vdot(d, hd).real

        # Non-positive curvature: ride d to the boundary and finish.
        def nonpos_case(_):
            p, pf = boundary_step(z, d)
            return p, pf, jnp.asarray(True), jnp.asarray(True)

        alpha = v["gamma"] / jnp.where(curv <= 0, 1.0, curv)
        z_new = tree_axpy(alpha, d, z)
        exits = tree_norm(z_new, ord=2) >= trust_radius

        def exits_case(_):
            # Step to the boundary along d from z.
            ta, tb = _boundary_intersections(z, d, trust_radius)
            p = tree_axpy(tb, d, z)
            hp = hessp_at_xk(p)
            return p, model(p, hp), jnp.asarray(True), jnp.asarray(True)

        def interior_case(_):
            r_new = tree_axpy(alpha, hd, r)
            return z_new, model(z_new, hessp_at_xk(z_new)), jnp.asarray(False), \
                tree_norm(r_new, ord=norm_ord) < resnorm

        p, pf, hits, done = lax.cond(
            curv <= 0,
            nonpos_case,
            lambda _: lax.cond(exits, exits_case, interior_case, None),
            None,
        )
        r_new = tree_axpy(alpha, hd, r)
        gamma_new = vdot(r_new, r_new).real
        beta = gamma_new / v["gamma"]
        d_new = tree_axpy(beta, d, jax.tree_util.tree_map(jnp.negative, r_new))
        z_out = where(hits, z, p)  # interior iterate continues from z_new
        z_out = where(~hits & ~done, z_new, z_out)
        return {
            "z": z_out,
            "r": r_new,
            "d": d_new,
            "step": p,
            "pred_f": pf,
            "hits_boundary": hits,
            "done": done,
            "nit": nit,
            "nhev": nhev + 2,  # model evaluations above
            "gamma": gamma_new,
        }

    out = lax.while_loop(cond, body, init)
    # If never finished via boundary/convergence, use the last interior z.
    step = where(out["done"], out["step"], out["z"])
    step = where(out["nit"] == 0, zeros_like(g), step)
    pred = jnp.where(out["nit"] == 0, cur_val, out["pred_f"])
    return _QuadSubResult(
        step=step,
        hits_boundary=out["hits_boundary"],
        pred_f=pred,
        nit=out["nit"],
        nhev=out["nhev"],
        success=jnp.asarray(True),
    )


def _trust_ncg(
    fun=None,
    x0=None,
    *,
    maxiter: Optional[int] = None,
    energy_reduction_factor=0.1,
    old_fval=jnp.nan,
    absdelta=None,
    gtol: float = 1e-4,
    max_trust_radius: float = 1000.0,
    initial_trust_radius: float = 1.0,
    eta: float = 0.15,
    subproblem=cg_steihaug_subproblem,
    jac=None,
    hessp=None,
    fun_and_grad=None,
    subproblem_kwargs: Optional[dict] = None,
    name=None,
    **_ignored,
) -> OptimizeResults:
    maxiter = 200 if maxiter is None else maxiter
    fun_and_grad, hessp = _prepare_vag_hessp(
        fun, jac, hessp, fun_and_grad=fun_and_grad
    )
    subproblem_kwargs = dict(subproblem_kwargs or {})

    f0, g0 = fun_and_grad(x0)
    init = {
        "x": x0,
        "fun": f0,
        "jac": g0,
        "trust_radius": jnp.asarray(float(initial_trust_radius)),
        "status": jnp.asarray(-2),
        "nit": jnp.asarray(0),
        "nfev": jnp.asarray(1),
        "nhev": jnp.asarray(0),
        "old_fval": jnp.asarray(float("nan") if old_fval is None else old_fval,
                                dtype=jnp.asarray(f0).dtype),
    }
    init["status"] = jnp.where(
        tree_norm(g0, ord=2) < gtol, 0, init["status"]
    )

    def cond(v):
        return v["status"] < -1

    def body(v):
        new = _body(v)
        return {k: where(v["status"] > -2, v[k], new[k]) for k in v}

    def _body(v):
        x, f, g, tr = v["x"], v["fun"], v["jac"], v["trust_radius"]
        nit = v["nit"] + 1
        # Hoist primals-only work out of the CG-Steihaug loop (see the
        # matching note in newton_cg.py).
        _, hessp_lin = jax.linearize(partial(hessp, x), zeros_like(x))
        result = subproblem(
            f, g, hessp_lin, trust_radius=tr, **subproblem_kwargs
        )
        x_prop = jax.tree_util.tree_map(jnp.add, x, result.step)
        f_prop, g_prop = fun_and_grad(x_prop)
        f_prop = jnp.where(jnp.isnan(f_prop), jnp.inf, f_prop)

        actual = f - f_prop
        predicted = f - result.pred_f
        rho = actual / jnp.where(predicted == 0, 1e-30, predicted)

        # Trust-region update.
        tr_new = jnp.where(rho < 0.25, tr * 0.25, tr)
        grow = (rho > 0.75) & result.hits_boundary
        tr_new = jnp.where(grow, jnp.minimum(2 * tr, max_trust_radius), tr_new)

        accept = rho > eta
        x_new = where(accept, x_prop, x)
        f_new = jnp.where(accept, f_prop, f)
        g_new = where(accept, g_prop, g)

        status = v["status"]
        if absdelta is not None:
            conv = accept & (actual >= 0) & (actual < absdelta)
            status = jnp.where(conv, 0, status)
        status = jnp.where(tree_norm(g_new, ord=2) < gtol, 0, status)
        status = jnp.where(tr_new < 1e-12, 0, status)
        status = jnp.where((nit >= maxiter) & (status == -2), nit, status)
        if name is not None:
            jax.debug.print(
                name + ": TR it {i} fun {f} radius {r} rho {rho}",
                i=nit, f=f_new, r=tr_new, rho=rho,
            )
        return {
            "x": x_new,
            "fun": f_new,
            "jac": g_new,
            "trust_radius": tr_new,
            "status": status,
            "nit": nit,
            "nfev": v["nfev"] + 1,
            "nhev": v["nhev"] + result.nhev,
            "old_fval": f,
        }

    out = lax.while_loop(cond, body, init)
    return OptimizeResults(
        x=out["x"],
        success=out["status"] >= 0,
        status=out["status"],
        fun=out["fun"],
        jac=out["jac"],
        nit=out["nit"],
        nfev=out["nfev"],
        nhev=out["nhev"],
        trust_radius=out["trust_radius"],
    )


def trust_ncg(fun=None, x0=None, *args, **kwargs):
    return _trust_ncg(fun, x0, *args, **kwargs).x
