"""Newton-CG and trust-region Newton (pytree-native, fully traceable).

Unlike the reference (``src/re/optimize.py:102`` ``_newton_cg``), whose
outer Newton loop is a Python loop with one host round trip per iteration,
this implementation runs the *entire* minimization — outer Newton
iterations, inner metric-CG solves, and the energy-monotonic line search —
inside one ``lax.while_loop``.  Consequences on TPU:

- the whole geoVI nonlinear sample update can be ``vmap``-ed over samples
  (samples iterate in lockstep with per-sample ``done`` masking) instead of
  being looped on the host one sample at a time;
- KL minimization dispatches one XLA program per *run*, not per step.

Semantics preserved from the reference: the CG ``absdelta`` is scaled from
the Newton energy decrease (``energy_reduction_factor``), the CG
``resnorm`` is ``min(0.5, sqrt(|g|))*|g|`` (SciPy rule), the line search
halves up to 9 times with a gradient-rescue reset at attempt 5, NaN
energies behave like +inf so the search backs off, and convergence is
``absdelta`` on the energy plus ``xtol * size(x)`` on the descent norm
(optionally with a custom gradient norm, used by geoVI's sample norm).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
from jax import lax
from jax import numpy as jnp
from jax.tree_util import Partial, tree_map

from ..tree import norm as tree_norm
from ..tree import det_barrier, size, tree_axpy, vdot, where, zeros_like
from .cg import _static_cg

_EPS_SHARE = 100.0  # absdelta fallback divisor for the inner CG


class OptimizeResults(NamedTuple):
    """Optimization result container (scipy/JAX-style).

    Parity: ``src/re/optimize.py:20``.
    """

    x: Any
    success: Union[bool, jnp.ndarray]
    status: Union[int, jnp.ndarray]
    fun: Any
    jac: Any
    hess: Optional[jnp.ndarray] = None
    hess_inv: Optional[jnp.ndarray] = None
    nfev: Union[None, int, jnp.ndarray] = None
    njev: Union[None, int, jnp.ndarray] = None
    nhev: Union[None, int, jnp.ndarray] = None
    nit: Union[None, int, jnp.ndarray] = None
    trust_radius: Union[None, float, jnp.ndarray] = None
    jac_magnitude: Union[None, float, jnp.ndarray] = None
    good_approximation: Union[None, bool, jnp.ndarray] = None


def _prepare_vag_hessp(fun, jac, hessp, fun_and_grad):
    if fun_and_grad is None:
        if fun is not None and jac is not None:
            def fun_and_grad(x):
                return fun(x), jac(x)
        elif fun is not None:
            fun_and_grad = jax.value_and_grad(fun)
        else:
            raise ValueError("no function specified")

    if hessp is None:
        jac_ = jax.grad(fun) if jac is None else jac

        def hessp(primals, tangents):
            return jax.jvp(jac_, (primals,), (tangents,))[1]

    return fun_and_grad, hessp


def newton_cg(fun=None, x0=None, *args, **kwargs):
    """Minimize via Newton-CG; returns only the solution pytree."""
    return _newton_cg(fun, x0, *args, **kwargs).x


def _newton_cg(
    fun=None,
    x0=None,
    *,
    miniter: Optional[int] = None,
    maxiter: Optional[int] = None,
    energy_reduction_factor: float = 0.1,
    old_fval=None,
    absdelta: Optional[float] = None,
    norm_ord: Optional[int] = None,
    xtol: float = 1e-5,
    jac: Optional[Callable] = None,
    fun_and_grad: Optional[Callable] = None,
    hessp: Optional[Callable] = None,
    name: Optional[str] = None,
    cg: Callable = _static_cg,
    cg_kwargs: Optional[dict] = None,
    custom_gradnorm: Optional[Callable] = None,
    linearize_hessp: bool = True,
    ls_margin: Optional[float] = None,
    **_ignored,
) -> OptimizeResults:
    name = None if name is None else str(name)  # PyTreeString-compatible
    norm_ord = 1 if norm_ord is None else norm_ord
    miniter = 0 if miniter is None else miniter
    maxiter = 200 if maxiter is None else maxiter
    xtol = xtol * size(x0)

    fun_and_grad, hessp = _prepare_vag_hessp(fun, jac, hessp, fun_and_grad)
    cg_kwargs = dict(cg_kwargs or {})
    cg_name = cg_kwargs.pop("name", name + "CG" if name is not None else None)
    gradnorm = (
        partial(tree_norm, ord=norm_ord)
        if custom_gradnorm is None else custom_gradnorm
    )

    energy0, g0 = fun_and_grad(x0)
    energy0 = jnp.where(jnp.isnan(energy0), jnp.inf, energy0)
    # Nonmonotone acceptance margin for the line search: a trial point is
    # accepted when it does not increase the energy by more than
    # `ls_margin * |energy|`.  A strict `>` comparison is a knife edge near
    # convergence (trial and current energies agree to rounding) where
    # run-to-run float noise — different mesh shardings, different fusion
    # of the same math (fused vs staged programs) — flips the branch and
    # chaotically perturbs the iterate by the step scale; the margin makes
    # near-tie comparisons deterministically accept.  The margin must
    # exceed the energy's evaluation noise: measured ~1e-11 relative for
    # f64 (reassociation over ~1e4-dof reductions) and ~1e-5 for f32, so
    # the defaults sit ~20-100x above that per dtype.
    if ls_margin is None:
        eps = float(jnp.finfo(jnp.asarray(energy0).dtype).eps)
        ls_margin = (1e6 if eps < 1e-12 else 1e4) * eps
    old_fval0 = jnp.asarray(
        jnp.inf if old_fval is None else old_fval, dtype=jnp.asarray(energy0).dtype
    )

    # Fixed-trip deterministic mode (see the matching block in
    # `solvers/cg.py`): under `deterministic_reductions` the Newton loop
    # always runs `maxiter` trips and records convergence instead of
    # exiting on it — convergence must not condition ANY state change
    # (freezing at the recorded trip is itself a knife-edge branch).
    # Post-convergence trips idle naturally: the line search rejects or
    # accepts near-tie steps of vanishing size.  Only a line-search
    # failure BEFORE recorded convergence freezes the state (`halt`).
    from ..config import get as _cfg_get

    fixed_trips = bool(_cfg_get("deterministic_reductions"))

    def cond(v):
        return v["status"] < -1

    def body(v):
        # Freeze finished batch elements when running under vmap (lockstep
        # iteration): see the matching note in `solvers/cg.py`.
        already_done = v["status"] > -2
        new = _body(v)
        return {k: where(already_done, v[k], new[k]) for k in v}

    def _body(v):
        pos, energy, g, old_e = v["pos"], v["energy"], v["g"], v["old_fval"]
        status, i = v["status"], v["nit"] + 1
        conv_prev = v["conv"]

        # Inner CG tolerance derived from the Newton-scale energy decrease
        # (Newton's quadratic model and the CG energy live on the same
        # scale; reference `src/re/optimize.py:143-156`).
        fallback = (
            jnp.asarray(absdelta / _EPS_SHARE)
            if absdelta is not None else -jnp.inf
        )
        cg_absdelta = jnp.where(
            jnp.isfinite(old_e) & (energy_reduction_factor > 0),
            energy_reduction_factor * (old_e - energy),
            fallback,
        )
        mag_g = tree_norm(g, ord=cg_kwargs.get("norm_ord", 1))
        cg_resnorm = jnp.minimum(0.5, jnp.sqrt(mag_g)) * mag_g
        # The Hessian/metric matvec is linear in the tangents; linearizing
        # it here hoists all primals-only computation (forward-model
        # linearizations, amplitude gathers, ...) out of the inner CG
        # loop — one evaluation per Newton step instead of per matvec.
        if linearize_hessp:
            _, hessp_lin = jax.linearize(Partial(hessp, pos), zeros_like(pos))
        else:
            hessp_lin = Partial(hessp, pos)
        cg_res = cg(
            hessp_lin, g,
            absdelta=cg_absdelta,
            resnorm=cg_resnorm,
            norm_ord=1,
            name=cg_name,
            _raise_nonposdef=False,
            **cg_kwargs,
        )
        nat_g, cg_info = cg_res.x, cg_res.info
        status = jnp.where(cg_info < 0, -1, status)  # hard CG failure -> stop

        # Energy-monotonic backtracking line search with a gradient-rescue
        # reset after 5 failed halvings (reference `optimize.py:172-193`),
        # with a nonmonotone acceptance margin (see `ls_margin` above).
        accept_tol = ls_margin * jnp.abs(energy)

        def ls_cond(ls):
            return (ls["new_energy"] > energy + accept_tol) & (ls["it"] < 9)

        def ls_body(ls):
            it = ls["it"] + 1
            scale = ls["scale"] / 2.0

            def reset_dd(_):
                gam = vdot(g, g).real
                curv = vdot(g, hessp(pos, g)).real
                return tree_map(lambda x: (gam / curv) * x, g), jnp.asarray(1.0, dtype=scale.dtype)

            dd, scale = lax.cond(
                it == 6,
                reset_dd,
                lambda _: (ls["dd"], scale),
                None,
            )
            new_pos = tree_axpy(-scale, dd, pos)
            new_energy, new_g = det_barrier(fun_and_grad(new_pos))
            new_energy = jnp.where(jnp.isnan(new_energy), jnp.inf, new_energy)
            return {
                "it": it, "scale": scale, "dd": dd,
                "new_pos": new_pos, "new_energy": new_energy, "new_g": new_g,
            }

        dd0 = nat_g
        scale0 = jnp.asarray(1.0, dtype=jnp.asarray(energy).dtype)
        new_pos0 = tree_axpy(-scale0, dd0, pos)
        new_energy0, new_g0 = det_barrier(fun_and_grad(new_pos0))
        new_energy0 = jnp.where(jnp.isnan(new_energy0), jnp.inf, new_energy0)
        ls = lax.while_loop(ls_cond, ls_body, {
            "it": jnp.asarray(0), "scale": scale0, "dd": dd0,
            "new_pos": new_pos0, "new_energy": new_energy0, "new_g": new_g0,
        })
        ls_failed = ls["new_energy"] > energy + accept_tol
        if fixed_trips:
            # pre-convergence line-search failure is a genuine stall ->
            # freeze via halt; post-convergence failures are the expected
            # plateau behavior (the iterate idles by construction)
            halt = jnp.where(
                ls_failed & ~conv_prev & (v["halt"] == 0), -1, v["halt"]
            )
        else:
            halt = v["halt"]
            # On failure keep the previous point and stop.
            status = jnp.where(ls_failed & (status == -2), -1, status)
        new_pos = where(ls_failed, pos, ls["new_pos"])
        new_g = where(ls_failed, g, ls["new_g"])
        new_energy = jnp.where(ls_failed, energy, ls["new_energy"])

        energy_diff = energy - new_energy
        descent_norm = ls["scale"] * gradnorm(ls["dd"])
        if name is not None:
            jax.debug.print(
                name + ": NCG it {i} energy {e} diff {de} |desc| {dn}",
                i=i, e=new_energy, de=energy_diff, dn=descent_norm,
            )

        min_cond = (ls["it"] < 2) & (i > miniter)
        conv = jnp.asarray(False)
        if absdelta is not None:
            # `-accept_tol`: an accepted near-tie step (energy_diff a hair
            # negative within the margin) still counts as converged.
            conv |= (
                (energy_diff >= -accept_tol) & (energy_diff < absdelta)
                & min_cond
            )
        conv |= (descent_norm <= xtol) & (i > miniter)
        conv |= conv_prev
        if fixed_trips:
            status = jnp.where(
                i >= maxiter,
                jnp.where(halt != 0, halt, jnp.where(conv, 0, i)),
                status,
            )
        else:
            status = jnp.where(conv & (status == -2), 0, status)
            status = jnp.where((i >= maxiter) & (status == -2), i, status)

        new = {
            "pos": new_pos, "energy": new_energy, "g": new_g,
            "old_fval": energy, "status": status, "nit": i,
            "nfev": v["nfev"] + ls["it"] + 1,
            "nhev": v["nhev"] + cg_res.nfev,
            "conv": conv, "halt": halt,
        }
        if fixed_trips:
            # a halted (stalled-line-search) state idles through the
            # remaining fixed trips
            halted_prev = v["halt"] != 0
            for k in ("pos", "energy", "g", "old_fval"):
                new[k] = where(halted_prev, v[k], new[k])
        return new

    init = {
        "pos": x0,
        "energy": energy0,
        "g": g0,
        "old_fval": old_fval0,
        "status": jnp.asarray(-2),
        "nit": jnp.asarray(0),
        "nfev": jnp.asarray(1),
        "nhev": jnp.asarray(0),
        "conv": jnp.asarray(False),
        "halt": jnp.asarray(0),
    }
    # A zero-iteration request degenerates to returning the input.
    if maxiter == 0:
        return OptimizeResults(
            x=x0, success=True, status=0, fun=energy0, jac=g0, nit=0, nfev=1,
            njev=1, nhev=0,
        )

    val = lax.while_loop(cond, body, init)
    status = val["status"]
    return OptimizeResults(
        x=val["pos"],
        success=status >= 0,
        status=status,
        fun=val["energy"],
        jac=val["g"],
        nit=val["nit"],
        nfev=val["nfev"],
        njev=val["nfev"],
        nhev=val["nhev"],
    )


def minimize(
    fun: Optional[Callable],
    x0,
    method: str = "newton-cg",
    *,
    args=(),
    tol=None,
    options: Optional[dict] = None,
    **kwargs,
) -> OptimizeResults:
    """Dispatch to a minimizer by name; parity ``src/re/optimize.py:455``."""
    if args:
        fun = partial(fun, *args)
    options = dict(options or {})
    options.update(kwargs)
    if tol is not None:
        options.setdefault("xtol", tol)
    method = method.lower()
    if method in ("newton-cg", "newtoncg", "ncg"):
        return _newton_cg(fun, x0, **options)
    if method in ("trust-ncg", "trustncg"):
        from .trust_ncg import _trust_ncg

        return _trust_ncg(fun, x0, **options)
    if method in ("l-bfgs", "lbfgs", "l-bfgs-b"):
        from .lbfgs import _lbfgs

        return _lbfgs(fun, x0, **options)
    if method in ("vl-bfgs", "vlbfgs"):
        from .vlbfgs import _vlbfgs

        return _vlbfgs(fun, x0, **options)
    if method in ("nonlinear-cg", "nonlinearcg", "nlcg"):
        from .descent import _nonlinear_cg

        return _nonlinear_cg(fun, x0, **options)
    if method in ("steepest-descent", "steepestdescent", "sd"):
        from .descent import _steepest_descent

        return _steepest_descent(fun, x0, **options)
    if method.startswith("scipy:"):
        # Host-side scipy bridge, e.g. method="scipy:L-BFGS-B" (parity:
        # src/minimization/scipy_minimizer.py:134).  Not jit-traceable.
        from .scipy_bridge import minimize_scipy

        options.pop("xtol", None)
        return minimize_scipy(
            fun, x0, method=method.split(":", 1)[1], tol=tol, **options
        )
    raise ValueError(f"unknown method {method!r}")
