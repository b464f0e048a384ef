"""Sampling engine for MGVI / geoVI (evidence-variational inference).

Linear (MGVI) residual samples solve ``(M_lh + 1) s = n_lh + n_pr`` with a
device-resident CG against the implicit Fisher metric; geoVI nonlinearly
"curves" them by minimizing ``0.5 ||m - g(x)||^2`` with the metric as
Hessian approximation.  Because both the CG and the Newton-CG here are
fully traceable (:mod:`nifty_tpu.solvers`), the *entire* sample update —
linear draw and nonlinear curve — can be ``vmap``-ed or ``shard_map``-ed
over the antithetic sample batch: one XLA program updates all samples in
lockstep, instead of the reference's host loop over samples
(``residual_map="lmap"``).

Parity: reference ``src/re/evi.py`` (``sample_likelihood`` ``:78``,
``draw_linear_residual`` ``:83-144``, ``nonlinearly_update_residual``
``:147-266``, ``draw_residual`` ``:268``, ``Samples`` ``:314-411``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple, TypeVar, Union

import jax
from jax import numpy as jnp
from jax import random
from jax.tree_util import (
    Partial,
    register_pytree_node_class,
    tree_leaves,
    tree_map,
)

from .likelihood import Likelihood
from .solvers import cg as conjugate_gradient
from .solvers.newton_cg import OptimizeResults, _newton_cg
from .tree import random_like, stack, tree_add, tree_sub, vdot

P = TypeVar("P")


def _no_jit(x, **kwargs):
    return x


def _parse_jit(jit):
    """Normalize a jit knob: True/False select jax.jit / identity, a
    callable is used as the jit transform itself."""
    if isinstance(jit, bool):
        return jax.jit if jit else _no_jit
    if callable(jit):
        return jit
    raise TypeError(f"expected `jit` to be callable or boolean; got {jit!r}")


def sample_likelihood(likelihood: Likelihood, primals, key):
    """Draw a data-space white sample and pull it back through the
    left-square-root of the metric → a sample with covariance ``M_lh``."""
    white_sample = random_like(key, likelihood.left_sqrt_metric_tangents_shape)
    return likelihood.left_sqrt_metric(primals, white_sample)


def draw_linear_residual(
    likelihood: Likelihood,
    pos: P,
    key,
    *,
    from_inverse: bool = True,
    point_estimates: Union[P, Tuple[str]] = (),
    cg: Callable = conjugate_gradient.static_cg,
    cg_name: Optional[str] = None,
    cg_kwargs: Optional[dict] = None,
    napprox: int = 0,
    _raise_nonposdef: bool = False,
) -> Tuple[P, Any]:
    """Draw one MGVI residual sample at ``pos``; returns ``(residual, info)``.

    The sample has covariance ``(M_lh + 1)^{-1}`` (the inverse Bayesian
    Fisher metric of the standardized Hamiltonian) when ``from_inverse``.

    ``napprox > 0`` builds a diagonal preconditioner for the metric CG from
    that many cheap metric samples (mean of squares leafwise — the
    ``approximation2endo`` construction) before solving.  Parity: the
    classic stack's ``napprox`` knob
    (``src/minimization/kl_energies.py:126``, ``src/probing.py:142``).
    """
    if not isinstance(likelihood, Likelihood):
        raise TypeError(f"`likelihood` of invalid type {type(likelihood)!r}")
    lh, live = likelihood.freeze(point_estimates=point_estimates, primals=pos)

    cg_kwargs = dict(cg_kwargs or {})

    key_data, key_latent = random.split(key, 2)
    # Metric-covariance sample = likelihood part (white data-space noise
    # pulled back through the metric's left square root) + a white latent
    # sample for the unit prior block.
    data_part = sample_likelihood(lh, live, key=key_data)
    latent_part = random_like(key=key_latent, primals=live)
    sample = tree_add(data_part, latent_part)
    info = jnp.zeros(())
    if from_inverse:
        # Applying (M_lh + 1)^{-1} (the CG solve below) converts the
        # metric-covariance sample into an inverse-metric one.  Hoist the
        # forward linearization out of the CG loop: the metric matvec at
        # fixed primals becomes FFT+pointwise only (amplitude gathers etc.
        # are traced once and turn into loop constants).
        met = lh.metric_at(live)
        if napprox and napprox > 0 and "preconditioner" not in cg_kwargs:
            from .probing import approximation2endo

            # Metric samples are cheap (forward applications, no solve);
            # their leafwise mean-square approximates diag(M_lh + 1).
            def _metric_sample(k):
                k_data, k_latent = random.split(k, 2)
                return tree_add(
                    sample_likelihood(lh, live, key=k_data),
                    random_like(key=k_latent, primals=live),
                )

            # fold_in (not another split) keeps the data/latent streams
            # identical with and without preconditioning.
            keys_np = random.split(random.fold_in(key, 0x9E37), napprox)
            diag = approximation2endo(jax.vmap(_metric_sample)(keys_np))
            cg_kwargs["preconditioner"] = Partial(
                lambda d, r: tree_map(jnp.divide, r, d), diag
            )
        sample, info = cg(
            lambda t: tree_add(met(t), t),
            sample,
            x0=latent_part,
            name=cg_name,
            _raise_nonposdef=_raise_nonposdef,
            **cg_kwargs,
        )
    if point_estimates:
        sample = lh.insert_zeros(sample)
    return sample, info


def _nonlinear_update_funcs(likelihood, point_estimates, jit=False):
    """Build the residual functional, metric, and sample norm for geoVI.

    The functional is ``0.5 || m - g(x) ||^2`` with
    ``g(x) = x - a + lsm_a(T(x) - T(a))`` at expansion point (anchor)
    ``a`` — its minimizer transports the metric sample ``m`` along the
    likelihood's geometry.  Capability parity: ``src/re/evi.py:147-199``.
    """

    def _freeze(anchor):
        return likelihood.freeze(
            point_estimates=point_estimates, primals=anchor
        )

    def residual_vg(anchor, trafo_ref, target, x):
        # Value and gradient of 0.5 ||target - g(x)||^2; `trafo_ref` is
        # T(anchor), precomputed once outside the minimization.
        lh, live = _freeze(anchor)
        dtrafo = tree_sub(lh.transformation(x), trafo_ref)
        transported = tree_add(
            tree_sub(x, live), lh.left_sqrt_metric(live, dtrafo)
        )
        mismatch = tree_sub(target, transported)
        value = 0.5 * vdot(mismatch, mismatch).real
        cograd = tree_map(jnp.conj, mismatch)
        cograd = tree_add(
            cograd, lh.left_sqrt_metric(x, lh.right_sqrt_metric(live, cograd))
        )
        return value, tree_map(jnp.negative, cograd)

    def metric(anchor, primals, tangents):
        # (1 + lsm_x rsm_a)(1 + lsm_a rsm_x): the functional's
        # Gauss-Newton Hessian approximation.
        lh, live = _freeze(anchor)
        lsm, rsm = lh.left_sqrt_metric, lh.right_sqrt_metric
        inner = tree_add(lsm(live, rsm(primals, tangents)), tangents)
        return tree_add(lsm(primals, rsm(live, inner)), inner)

    def sample_norm(anchor, natgrad):
        # Convergence norm in the sample geometry: latent part + the
        # data-space image of the natural gradient.
        lh, live = _freeze(anchor)
        data_image = lh.right_sqrt_metric(live, natgrad)
        return jnp.sqrt(
            vdot(natgrad, natgrad).real + vdot(data_image, data_image).real
        )

    jit = _parse_jit(jit)
    return jit(residual_vg), jit(metric), jit(sample_norm)


def nonlinearly_update_residual(
    likelihood: Likelihood = None,
    pos: P = None,
    residual_sample=None,
    metric_sample_key=None,
    metric_sample_sign=1.0,
    *,
    point_estimates=(),
    minimize: Callable[..., OptimizeResults] = _newton_cg,
    minimize_kwargs: Optional[dict] = None,
    jit: Union[Callable, bool] = False,
    _raise_notconverged: bool = False,
) -> Tuple[P, OptimizeResults]:
    """geoVI nonlinear update of one (residual sample, sign) pair.

    Fully traceable — safe under ``vmap`` over samples.  Parity:
    ``src/re/evi.py:201-266``.
    """
    minimize_kwargs = dict(minimize_kwargs or {})
    lh, e_liquid = likelihood.freeze(
        point_estimates=point_estimates, primals=pos
    )

    sample = tree_add(pos, residual_sample)
    if point_estimates:
        sample = lh.remove(sample)

    metric_sample, _ = draw_linear_residual(
        likelihood,
        pos,
        metric_sample_key,
        point_estimates=point_estimates,
        from_inverse=False,
    )
    if point_estimates:
        metric_sample = lh.remove(metric_sample)
    metric_sample = tree_map(lambda x: metric_sample_sign * x, metric_sample)

    residual_vg, metric, sample_norm = _nonlinear_update_funcs(
        likelihood, point_estimates, jit=jit
    )

    skip = minimize_kwargs.get("maxiter", None) == 0
    if not skip:
        trafo_at_p = lh.transformation(e_liquid)
        opt_state = minimize(
            None,
            x0=sample,
            fun_and_grad=Partial(residual_vg, pos, trafo_at_p, metric_sample),
            hessp=Partial(metric, pos),
            custom_gradnorm=Partial(sample_norm, pos),
            **minimize_kwargs,
        )
    else:
        opt_state = OptimizeResults(sample, True, 0, None, None)
    new_sample = tree_sub(opt_state.x, e_liquid)
    opt_state = opt_state._replace(x=None, jac=None)
    if point_estimates:
        new_sample = lh.insert_zeros(new_sample)
    return new_sample, opt_state


def draw_residual(
    likelihood: Likelihood,
    pos: P,
    key,
    *,
    point_estimates: Union[P, Tuple[str]] = (),
    cg: Callable = conjugate_gradient.static_cg,
    cg_name: Optional[str] = None,
    cg_kwargs: Optional[dict] = None,
    minimize: Callable[..., OptimizeResults] = _newton_cg,
    minimize_kwargs: Optional[dict] = None,
    _raise_nonposdef: bool = False,
    _raise_notconverged: bool = False,
) -> Tuple[P, OptimizeResults]:
    """Draw an antithetic pair of geoVI samples (linear draw + curve both
    signs).  Parity: ``src/re/evi.py:268``."""
    residual_sample, _ = draw_linear_residual(
        likelihood, pos, key,
        point_estimates=point_estimates,
        cg=cg, cg_name=cg_name, cg_kwargs=cg_kwargs,
        _raise_nonposdef=_raise_nonposdef,
    )
    curve = partial(
        nonlinearly_update_residual,
        likelihood, pos,
        metric_sample_key=key,
        point_estimates=point_estimates,
        minimize=minimize,
        minimize_kwargs=minimize_kwargs,
        _raise_notconverged=_raise_notconverged,
    )
    neg = tree_map(jnp.negative, residual_sample)
    return stack((
        curve(residual_sample, metric_sample_sign=1.0),
        curve(neg, metric_sample_sign=-1.0),
    ))


@register_pytree_node_class
class Samples:
    """Posterior samples stored as (expansion point, stacked residuals).

    A plain pytree — compatible with vmap/shard_map/jit and shardable over
    the leading (sample) axis of ``samples``.  Absolute samples are always
    materialized lazily as ``pos + residual``; only the residuals carry the
    sample axis, so re-centering (``at``) is free.  Capability parity:
    ``src/re/evi.py:314-411``.
    """

    def __init__(self, *, pos: P = None, samples: P = None, keys=None):
        self._pos, self._samples, self._keys = pos, samples, keys

    @property
    def pos(self):
        return self._pos

    @property
    def keys(self):
        return self._keys

    def _residuals(self):
        if self._samples is None:
            raise ValueError(f"{type(self).__name__} holds no residuals")
        return self._samples

    def _offset(self, leaf_fn=lambda r: r):
        """Absolute samples: ``pos`` broadcast against ``leaf_fn(residual)``."""
        resid = self._residuals()
        if self._pos is None:
            return tree_map(leaf_fn, resid)
        return tree_map(lambda p, r: p + leaf_fn(r), self._pos, resid)

    @property
    def samples(self):
        return self._offset(lambda r: r)

    def __len__(self):
        leaves = tree_leaves(self._samples)
        return int(leaves[0].shape[0]) if leaves else 0

    def __getitem__(self, index):
        return self._offset(lambda r: r[index])

    def __iter__(self):
        return (self[i] for i in range(len(self)))

    def at(self, pos, old_pos=None):
        """Move the expansion point; residuals stay fixed (or, given
        ``old_pos``, absolute samples are first re-expressed relative to
        it)."""
        if old_pos is not None:
            resid = tree_map(
                lambda q, s: s - q[jnp.newaxis], old_pos, self.samples
            )
            return Samples(pos=pos, samples=resid, keys=self._keys)
        if self._pos is None:
            raise ValueError(
                "need `old_pos` to re-center samples without an expansion point"
            )
        return Samples(pos=pos, samples=self._samples, keys=self._keys)

    def squeeze(self):
        """Merge the two leading (batch, sample) axes of stacked samples."""
        resid = tree_map(
            lambda s: s.reshape((-1,) + s.shape[2:]), self._samples
        )
        return Samples(pos=self._pos, samples=resid, keys=self._keys)

    def tree_flatten(self):
        return ((self._pos, self._samples, self._keys), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        pos, smpls, keys = children
        return cls(pos=pos, samples=smpls, keys=keys)
