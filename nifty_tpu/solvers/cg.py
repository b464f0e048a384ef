"""Conjugate gradient on pytrees, fully traceable.

The solver is a single ``lax.while_loop`` — all tolerance logic (absdelta
energy criterion, residual norm, min/max iterations, breakdown detection)
lives on device, so there is **no host round trip per iteration** and the
whole solve can sit inside ``jit``/``vmap``/``shard_map``.  This is the
engine behind MGVI/geoVI sample drawing (metric inversion) and the inner
loop of Newton-CG.

Semantics follow the reference's ``src/re/conjugate_gradient.py`` (``_cg``
``:77``, ``_static_cg`` ``:219``): identical convergence criteria
(``absdelta`` on the quadratic energy with ``miniter``/``maxiter``,
``resnorm`` fallback ``max(tol*|j|, atol)``), energy-increase and
non-positive-curvature detection, and periodic residual recomputation
every ``N_RESET`` steps.  Additions over the reference: an optional
preconditioner and an optional diagonal-norm weighting; vdots use highest
precision (see ``nifty_tpu.tree.vdot``) so f32 TPU scalars stay accurate.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
from jax import lax
from jax import numpy as jnp

from ..tree import (
    norm as tree_norm,
)
from ..tree import (
    det_barrier,
    result_type,
    size,
    tree_axpy,
    vdot,
    where,
    zeros_like,
)

N_RESET = 20


class CGResults(NamedTuple):
    x: Any
    nit: Union[int, jnp.ndarray]
    nfev: Union[int, jnp.ndarray]
    info: Union[int, jnp.ndarray]
    success: Union[bool, jnp.ndarray]


def _norm(tree, ord):
    return tree_norm(tree, ord=ord)


def static_cg(mat, j, x0=None, *args, **kwargs):
    """Solve ``mat(x) = j``; returns ``(x, info)`` with ``info==0`` on
    success, ``>0`` when the iteration limit was hit, ``<0`` on breakdown."""
    res = _static_cg(mat, j, x0, *args, **kwargs)
    return res.x, res.info


# `cg` is an alias — there is no separate Python-loop implementation; the
# traced solver is used everywhere (including eager mode, where the
# while_loop simply runs op-by-op).
cg = static_cg


def _static_cg(
    mat: Callable,
    j,
    x0=None,
    *,
    absdelta=None,
    resnorm=None,
    norm_ord=None,
    tol: float = 1e-5,
    atol: float = 0.0,
    miniter: Optional[int] = None,
    maxiter: Optional[int] = None,
    preconditioner: Optional[Callable] = None,
    name: Optional[str] = None,
    print_every: int = 1,
    _raise_nonposdef: bool = False,
    **_ignored,
) -> CGResults:
    # Accept PyTreeString names (strings smuggled through jit as static
    # pytree aux data; parity: src/re/tree_math/pytree_string.py).
    name = None if name is None else str(name)
    norm_ord = 2 if norm_ord is None else norm_ord
    maxiter_fallback = 20 * size(j)
    if miniter is None:
        miniter = min(6, maxiter if maxiter is not None else maxiter_fallback)
    if maxiter is None:
        maxiter = max(min(200, maxiter_fallback), miniter)

    if absdelta is None and resnorm is None:
        resnorm = jnp.maximum(tol * _norm(j, norm_ord), atol)

    common_dtp = result_type(j)
    eps = 6.0 * jnp.finfo(common_dtp).eps
    tiny = 6.0 * jnp.finfo(common_dtp).tiny

    # Fixed-trip deterministic mode: under `deterministic_reductions`
    # the loop always runs exactly `maxiter` trips; convergence is
    # RECORDED (for the returned `info`) but has no effect on the
    # computation.  Rationale: a 1-ulp fusion/layout difference between
    # mesh variants of the same program can flip any data-dependent
    # stopping (or freezing) branch, displacing the returned iterate by a
    # full CG step near the threshold, ~sqrt(absdelta) (measured round 4:
    # 1.8e-7 cross-mesh on the fused linear update).  With a uniform trip
    # count and no convergence-conditioned state changes, the iterate
    # idles at the rounding plateau identically on every mesh.  Costs
    # idle trips after convergence — the documented price of the mode.
    from .. import config as _config

    fixed_trips = bool(_config.get("deterministic_reductions"))

    M_inv = preconditioner if preconditioner is not None else (lambda x: x)

    if x0 is None:
        pos = zeros_like(j)
        r = jax.tree_util.tree_map(jnp.negative, j)
        energy0 = jnp.asarray(0.0, dtype=jnp.real(jnp.zeros((), common_dtp)).dtype)
        nfev0 = 0
    else:
        pos = x0
        r = jax.tree_util.tree_map(jnp.subtract, mat(pos), j)
        energy0 = vdot(
            jax.tree_util.tree_map(lambda a, b: (a - b) / 2, r, j), pos
        ).real
        nfev0 = 1
    z = M_inv(r)
    gamma0 = vdot(r, z).real

    def cond(v):
        return v["info"] < -1

    def body(v):
        # Under vmap the while_loop runs until *all* batch elements finish
        # and the body keeps executing for already-converged elements; the
        # `where` select at the end freezes finished elements' state.
        already_done = v["info"] > -2
        new = _body(v)
        return {k: where(already_done, v[k], new[k]) for k in v}

    def _body(v):
        info = v["info"]
        pos, r, d, z_prev = v["pos"], v["r"], v["d"], v["z"]
        i = v["nit"] + 1
        prev_gamma, prev_energy = v["gamma"], v["energy"]
        conv_prev = v["conv"]

        # det_barrier: pin the matvec's fusion boundary so deterministic
        # mode is bitwise across meshes (see tree.det_barrier).
        q = det_barrier(mat(d))
        curv = vdot(d, q).real
        # Non-positive curvature: the quadratic model is unbounded along
        # `d`.  Terminate with the current (partial) solution — or, on the
        # very first step, with a rescaled gradient step — matching the
        # graceful handling of the reference's dynamic CG
        # (`src/re/conjugate_gradient.py:152-166`) which Newton-CG relies
        # on for robustness far from the optimum.
        nonpos_curv = curv <= 0.0
        safe_curv = jnp.where(nonpos_curv, 1.0, curv)
        alpha = prev_gamma / safe_curv
        pos = tree_axpy(-alpha, d, pos)
        r = lax.cond(
            i % N_RESET == 0,
            lambda op: jax.tree_util.tree_map(jnp.subtract, mat(op["pos"]), j),
            lambda op: tree_axpy(-op["alpha"], op["q"], op["r"]),
            {"pos": pos, "r": r, "q": q, "alpha": alpha},
        )
        z = M_inv(r)
        gamma = vdot(r, z).real

        conv = (gamma >= 0.0) & (gamma <= tiny)
        if resnorm is not None:
            rn = _norm(r, norm_ord)
            conv |= (rn < resnorm) & (i >= miniter)
        energy = vdot(
            jax.tree_util.tree_map(lambda a, b: (a - b) / 2, r, j), pos
        ).real
        energy_diff = prev_energy - energy
        if absdelta is not None:
            conv |= (energy_diff < absdelta) & (i >= miniter)
        conv |= conv_prev
        if fixed_trips:
            # Convergence is RECORDED ONLY — it neither exits nor freezes
            # the iterate.  Any convergence-conditioned action is a
            # data-dependent branch on near-threshold values that differ
            # by ulps between mesh layouts (freezing at the recorded trip
            # displaced cross-mesh runs by a full CG step, ~sqrt(absdelta)
            # — measured before this design).  Post-convergence trips are
            # numerically benign: alpha, beta -> 0 as gamma hits the
            # rounding floor (guarded divisions below), so the iterate
            # idles at the plateau on every mesh alike.  An energy uptick
            # before recorded convergence is a genuine breakdown and
            # freezes via `halt`; after it, plateau noise.
            halt = v["halt"]
            halt = jnp.where(
                (energy_diff < -eps * jnp.abs(energy)) & ~conv
                & (halt == 0), -1, halt,
            )
            halt = jnp.where(jnp.isnan(energy) & (halt == 0), -1, halt)
            info = jnp.where(
                i >= maxiter,
                jnp.where(halt != 0, halt, jnp.where(conv, 0, i)),
                info,
            )
        else:
            halt = v["halt"]
            info = jnp.where(
                (energy_diff < -eps * jnp.abs(energy)), -1, info
            )
            info = jnp.where(conv & (info != -1), 0, info)
            info = jnp.where((i >= maxiter) & (info != -1), i, info)
            # NaN energies: broken metric; fail fast instead of cycling.
            info = jnp.where(jnp.isnan(energy), -1, info)
        # Non-positive curvature: keep the pre-step position (first
        # iteration: a gradient step scaled by gamma/|curv|) and finish.
        safe_abs_curv = jnp.where(curv == 0.0, 1.0, jnp.abs(curv))
        grad_step = jax.tree_util.tree_map(
            lambda x: (prev_gamma / safe_abs_curv) * x, j
        )
        fallback = where((i == 1) & (curv < 0.0), grad_step, v["pos"])
        pos = where(nonpos_curv, fallback, pos)
        # Graceful by default (Newton-CG relies on the partial solution);
        # with `_raise_nonposdef` the breakdown becomes a failure code that
        # the callback / host-boundary check below turns into an exception.
        if fixed_trips:
            halt = jnp.where(
                nonpos_curv & (halt == 0),
                -1 if _raise_nonposdef else 1, halt,
            )
        else:
            info = jnp.where(nonpos_curv, -1 if _raise_nonposdef else 0, info)

        # Guarded divisions: at the rounding floor (gamma, prev_gamma ->
        # tiny) the unguarded ratios hit 0/0; the guards turn the step
        # into a no-op instead of NaN (only reachable in fixed-trip mode,
        # which iterates past convergence).
        beta = jnp.where(
            prev_gamma > tiny, jnp.maximum(0.0, gamma / jnp.where(
                prev_gamma > tiny, prev_gamma, 1.0)), 0.0,
        )
        d = tree_axpy(beta, d, z)

        if name is not None:
            # Rate-limited in-jit progress line (every `print_every`-th
            # iteration) — long solves on TPU stay observable without a
            # callback per step.
            def _emit(i, e, de):
                jax.debug.print(
                    name + ": CG it {i} energy {e} diff {de}",
                    i=i, e=e, de=de,
                )

            lax.cond(
                i % print_every == 0,
                lambda op: _emit(*op),
                lambda op: None,
                (i, energy, energy_diff),
            )
        new = {
            "info": info, "pos": pos, "r": r, "d": d, "z": z,
            "nit": i, "gamma": gamma, "energy": energy,
            "conv": conv, "halt": halt,
        }
        if fixed_trips:
            # A halted (breakdown / non-positive-curvature) state idles
            # through the remaining trips; converged state does NOT
            # freeze (see above).
            halted_prev = v["halt"] != 0
            for k in ("pos", "r", "d", "z", "gamma", "energy"):
                new[k] = where(halted_prev, v[k], new[k])
        return new

    val = {
        "info": jnp.asarray(-2, dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        "pos": pos,
        "r": r,
        "d": z,
        "z": z,
        "nit": jnp.asarray(0),
        "gamma": gamma0,
        "energy": energy0,
        "conv": jnp.asarray(False),
        "halt": jnp.asarray(0),
    }
    val["info"] = jnp.where(gamma0 == 0.0, 0, val["info"])

    val = lax.while_loop(cond, body, val)
    i = val["nit"]
    info = val["info"]
    if _raise_nonposdef:
        # In-jit failure signaling (parity: the reference's `_cond_raise`
        # host callback, src/re/evi.py:39-56).  On backends without host
        # callbacks (tunneled TPU) detection still flows through the
        # returned `info`, which `OptimizeVI.update` re-checks at the next
        # host boundary.
        from ..misc import host_callbacks_supported

        if host_callbacks_supported():
            jax.debug.callback(_raise_on_breakdown, info)
    nfev = nfev0 + i + i // N_RESET
    return CGResults(x=val["pos"], info=info, nit=i, nfev=nfev, success=info == 0)


def _raise_on_breakdown(info):
    import numpy as np

    if np.any(np.asarray(info) < 0):
        raise FloatingPointError(
            f"conjugate gradient broke down (non-positive-definite metric "
            f"or NaN energy; info={np.asarray(info)})"
        )
