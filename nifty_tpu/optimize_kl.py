"""Stateless MGVI/geoVI variational-inference driver.

``OptimizeVI`` assembles jitted building blocks: antithetic sample drawing
(mapped ``draw_linear_residual`` + optional geoVI nonlinear update) and KL
minimization (Newton-CG on the sample-averaged standardized Hamiltonian).
``optimize_kl`` is the one-stop driver with checkpoint/resume and
minisanity logging.

TPU-first deltas versus the reference (``src/re/optimize_kl.py``):

- ``residual_map`` defaults to ``vmap`` — the traceable Newton-CG makes
  the *nonlinear* geoVI update vmappable, so all samples update in one XLA
  program (the reference must ``lmap`` because its NCG is a Python loop);
- sample drawing and KL reductions are sharding-transparent: placing the
  sample axis on a mesh axis turns the mean reductions into ``psum``s over
  ICI (see :mod:`nifty_tpu.parallel`);
- checkpoints are written from host numpy copies of the sample pytree +
  PRNG key + iteration counter, safe to reload on any mesh.

Parity: ``_StandardHamiltonian`` (``:62-81``), ``_kl_vg``/``_kl_met``
(``:84-120``), ``concatenate_zip`` (``:123``), ``OptimizeVIState``
(``:142``), ``OptimizeVI`` (``:155-571``), ``optimize_kl`` (``:574-697``).
"""

from __future__ import annotations

import dataclasses
import inspect
import os
import pickle
from functools import partial
from typing import Any, Callable, Literal, NamedTuple, Optional, TypeVar, Union

import jax
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.tree_util import tree_map

from .evi import (
    Samples,
    _no_jit,
    _parse_jit,
    draw_linear_residual,
    nonlinearly_update_residual,
)
from .likelihood import Likelihood
from .logger import logger
from .minisanity import minisanity
from .model import LazyModel
from .solvers.newton_cg import OptimizeResults, _newton_cg
from .tree import get_map, vdot

P = TypeVar("P")

_reduce = partial(tree_map, partial(jnp.mean, axis=0))


class _StandardHamiltonian(LazyModel):
    """Likelihood + standard-normal prior energy (the standardized posterior
    negative log-density).  Parity: ``src/re/optimize_kl.py:62``."""

    likelihood: Likelihood = dataclasses.field(metadata=dict(static=False))

    def __init__(self, likelihood: Likelihood, /):
        self.likelihood = likelihood

    def __call__(self, primals, **kw):
        return self.energy(primals, **kw)

    def energy(self, primals, **kw):
        return self.likelihood(primals, **kw) + 0.5 * vdot(primals, primals).real

    def metric(self, primals, tangents, **kw):
        lhm = self.likelihood.metric(primals, tangents, **kw)
        return tree_map(jnp.add, lhm, tangents)


def _kl_vg(likelihood, primals, primals_samples, *, map=jax.vmap, reduce=_reduce):
    map = get_map(map)
    ham = _StandardHamiltonian(likelihood)
    if len(primals_samples) == 0:
        return jax.value_and_grad(ham)(primals)
    vvg = map(jax.value_and_grad(ham))
    return reduce(vvg(primals_samples.at(primals).samples))


def _kl_met(likelihood, primals, tangents, primals_samples, *, map=jax.vmap,
            reduce=_reduce):
    map = get_map(map)
    ham = _StandardHamiltonian(likelihood)
    if len(primals_samples) == 0:
        return ham.metric(primals, tangents)
    vmet = map(ham.metric, in_axes=(0, None))
    return reduce(vmet(primals_samples.at(primals).samples, tangents))


@jax.jit
def concatenate_zip(*arrays):
    """Interleave stacked trees: (a1,a2..), (b1,b2..) -> (a1,b1,a2,b2,..)."""
    return tree_map(
        lambda *x: jnp.stack(x, axis=1).reshape((-1,) + x[0].shape[1:]),
        *arrays,
    )


SMPL_MODE_TYP = Literal[
    "linear_sample",
    "linear_resample",
    "nonlinear_sample",
    "nonlinear_resample",
    "nonlinear_update",
]
SMPL_MODE_GENERIC_TYP = Union[SMPL_MODE_TYP, Callable[[int], SMPL_MODE_TYP]]
DICT_OR_CALL4DICT_TYP = Union[Callable[[int], dict], dict]


class OptimizeVIState(NamedTuple):
    nit: int
    key: Any
    sample_state: Optional[Any] = None
    minimization_state: Optional[OptimizeResults] = None
    config: dict = {}


def _getitem_at_nit(config, key, nit):
    c = config[key]
    if callable(c) and len(inspect.getfullargspec(c).args) == 1:
        return c(nit)
    return c


def get_status_message(samples, state, residual=None, *, name="", map="vmap") -> str:
    energy = state.minimization_state.fun
    msg_smpl = ""
    if isinstance(state.sample_state, OptimizeResults):
        nlsi = tuple(int(el) for el in np.atleast_1d(state.sample_state.nit))
        msg_smpl = f"\n{name}: #(Nonlinear sampling steps) {nlsi}"
    elif isinstance(state.sample_state, (np.ndarray, jax.Array)):
        nlsi = tuple(int(el) for el in np.atleast_1d(state.sample_state))
        msg_smpl = f"\n{name}: Linear sampling status {nlsi}"
    mini_res = ""
    if residual is not None:
        _, mini_res = minisanity(samples, residual, map=map)
    _, mini_pr = minisanity(samples, map=map)
    return (
        f"{name}: Iteration {state.nit:04d} ⛰:{float(energy):+2.4e}"
        f"{msg_smpl}"
        f"\n{name}: #(KL minimization steps) {int(state.minimization_state.nit)}"
        f"\n{name}: Likelihood residual(s):\n{mini_res}"
        f"\n{name}: Prior residual(s):\n{mini_pr}\n"
    )


def _hashable(obj):
    """Canonicalize a config object (nested dicts/lists/scalars/callables)
    into a hashable key for the compiled-function cache."""
    if isinstance(obj, dict):
        return ("__dict__",) + tuple(
            (k, _hashable(v)) for k, v in sorted(obj.items(), key=lambda kv: str(kv[0]))
        )
    if isinstance(obj, (list, tuple)):
        return ("__seq__",) + tuple(_hashable(v) for v in obj)
    try:
        hash(obj)
        return obj
    except TypeError:
        return repr(obj)


class OptimizeVI:
    """State-less assembly of MGVI/geoVI steps: draw/update samples, then
    minimize the sample-estimated KL.  See module docstring; parity:
    ``src/re/optimize_kl.py:155``.

    Design delta vs the reference: instead of hiding non-traceable config
    (strings, callables, solver settings) inside pytrees, each distinct
    config is *closed over* a jit-compiled closure and cached — jit only
    ever sees array arguments.
    """

    def __init__(
        self,
        likelihood: Likelihood,
        n_total_iterations: int,
        *,
        kl_jit=True,
        residual_jit=True,
        kl_map=jax.vmap,
        residual_map="vmap",
        kl_reduce=_reduce,
        mirror_samples=True,
        _get_status_message: Optional[Callable] = None,
    ):
        if mirror_samples is False:
            raise NotImplementedError("non-antithetic sampling not supported")

        self.likelihood = likelihood
        self.n_total_iterations = n_total_iterations
        self.kl_map = kl_map
        self.kl_reduce = kl_reduce
        self.residual_map = get_map(residual_map)
        self._kl_jit = _parse_jit(kl_jit)
        self._residual_jit = _parse_jit(residual_jit)
        self._cache = {}

        self.kl_value_and_grad = partial(
            _kl_vg, likelihood, map=kl_map, reduce=kl_reduce
        )
        self.kl_metric = partial(
            _kl_met, likelihood, map=kl_map, reduce=kl_reduce
        )
        if _get_status_message is None:
            _get_status_message = partial(
                get_status_message,
                residual=likelihood.normalized_residual,
                name=self.__class__.__name__,
            )
        self.get_status_message = _get_status_message

    def _compiled(self, kind: str, build: Callable, cfg: dict):
        key = (kind, _hashable(cfg))
        fn = self._cache.get(key)
        if fn is None:
            fn = build(**cfg)
            self._cache[key] = fn
        return fn

    # -- sampling ---------------------------------------------------------

    def draw_linear_samples(self, primals, keys, **kwargs):
        def build(**cfg):
            sampler = partial(draw_linear_residual, self.likelihood, **cfg)
            return self._residual_jit(
                self.residual_map(sampler, in_axes=(None, 0))
            )

        sampler = self._compiled("draw_linear", build, kwargs)
        smpls, smpls_states = sampler(primals, keys)
        # Interleave each sample with its mirrored (antithetic) partner.
        neg = tree_map(jnp.negative, smpls)
        smpls = Samples(
            pos=primals, samples=concatenate_zip(smpls, neg), keys=keys
        )
        return smpls, smpls_states

    def nonlinearly_update_samples(self, samples: Samples, **kwargs):
        def build(**cfg):
            curver = partial(nonlinearly_update_residual, self.likelihood, **cfg)
            return self._residual_jit(
                self.residual_map(curver, in_axes=(None, 0, 0, 0))
            )

        curver = self._compiled("nonlinear_update", build, kwargs)
        assert len(samples.keys) == len(samples) // 2
        metric_sample_key = concatenate_zip(*((samples.keys,) * 2))
        sgn = jnp.ones(len(samples.keys))
        sgn = concatenate_zip(sgn, -sgn)
        smpls, smpls_states = curver(
            samples.pos, samples._samples, metric_sample_key, sgn
        )
        smpls = Samples(pos=samples.pos, samples=smpls, keys=samples.keys)
        return smpls, smpls_states

    def draw_samples(
        self,
        samples: Samples,
        *,
        key,
        sample_mode: SMPL_MODE_TYP,
        n_samples: int,
        point_estimates,
        draw_linear_kwargs={},
        nonlinearly_update_kwargs={},
        **kwargs,
    ):
        n_keys = 0 if samples.keys is None else len(samples.keys)
        if n_samples == 0:
            sample_mode = ""
        elif n_samples != n_keys and sample_mode.lower() == "nonlinear_update":
            sample_mode = "nonlinear_resample"
        elif n_samples != n_keys and sample_mode.lower().endswith("_sample"):
            sample_mode = sample_mode.replace("_sample", "_resample")

        mode = sample_mode.lower()
        if mode in ("linear_resample", "linear_sample",
                    "nonlinear_resample", "nonlinear_sample"):
            k_smpls = samples.keys
            if mode.endswith("_resample"):
                k_smpls = random.split(key, n_samples)
            assert n_samples == len(k_smpls)
            samples, st_smpls = self.draw_linear_samples(
                samples.pos, k_smpls,
                point_estimates=point_estimates,
                **draw_linear_kwargs, **kwargs,
            )
            if mode.startswith("nonlinear"):
                samples, st_smpls = self.nonlinearly_update_samples(
                    samples,
                    point_estimates=point_estimates,
                    **nonlinearly_update_kwargs, **kwargs,
                )
        elif mode == "nonlinear_update":
            samples, st_smpls = self.nonlinearly_update_samples(
                samples,
                point_estimates=point_estimates,
                **nonlinearly_update_kwargs, **kwargs,
            )
        elif mode == "":
            samples, st_smpls = samples, 0  # MAP
        else:
            raise ValueError(f"invalid sample mode {sample_mode!r}")
        return samples, st_smpls

    # -- KL minimization --------------------------------------------------

    def kl_minimize(
        self,
        samples: Samples,
        minimize: Callable[..., OptimizeResults] = _newton_cg,
        minimize_kwargs={},
        **kwargs,
    ) -> OptimizeResults:
        def build(minimize=minimize, **cfg):
            def run(smpls):
                return minimize(
                    None,
                    x0=smpls.pos,
                    fun_and_grad=partial(
                        self.kl_value_and_grad, primals_samples=smpls
                    ),
                    hessp=partial(self.kl_metric, primals_samples=smpls),
                    **cfg.get("minimize_kwargs", {}),
                )

            return self._kl_jit(run)

        runner = self._compiled(
            "kl_minimize", build,
            dict(minimize=minimize, minimize_kwargs=minimize_kwargs, **kwargs),
        )
        return runner(samples)

    # -- driver -----------------------------------------------------------

    def init_state(
        self,
        key,
        *,
        nit=0,
        n_samples: Union[int, Callable[[int], int]],
        draw_linear_kwargs: DICT_OR_CALL4DICT_TYP = dict(
            cg_name=None, cg_kwargs=dict()
        ),
        nonlinearly_update_kwargs: DICT_OR_CALL4DICT_TYP = dict(
            minimize_kwargs=dict()
        ),
        kl_kwargs: DICT_OR_CALL4DICT_TYP = dict(minimize_kwargs=dict()),
        sample_mode: SMPL_MODE_GENERIC_TYP = "nonlinear_resample",
        point_estimates=(),
        constants=(),
    ) -> OptimizeVIState:
        if constants not in ((), None):
            raise NotImplementedError("`constants` is not implemented")
        config = dict(
            n_samples=n_samples,
            sample_mode=sample_mode,
            point_estimates=point_estimates,
            constants=constants,
            draw_linear_kwargs=draw_linear_kwargs,
            nonlinearly_update_kwargs=nonlinearly_update_kwargs,
            kl_kwargs=kl_kwargs,
        )
        return OptimizeVIState(nit, key, config=config)

    @staticmethod
    def _resolve_sample_mode(sample_mode, n_samples, n_keys):
        """The mode FSM: `_sample` (reuse keys) degrades to `_resample` when
        the requested sample count does not match the stored keys."""
        if n_samples == 0:
            return ""
        mode = sample_mode.lower()
        if n_samples != n_keys and mode == "nonlinear_update":
            return "nonlinear_resample"
        if n_samples != n_keys and mode.endswith("_sample"):
            return mode.replace("_sample", "_resample")
        return mode

    def _build_fused_update(
        self,
        *,
        mode: str,
        n_samples: int,
        point_estimates,
        draw_linear_kwargs,
        nonlinearly_update_kwargs,
        kl_kwargs,
    ):
        """One XLA program for the full VI iteration (draw + curve + KL).

        The reference must run these as separate host-dispatched stages
        (its nonlinear update and Newton-CG are Python loops,
        ``src/re/optimize_kl.py:499-571``); here every stage is traceable,
        so a single ``jit`` removes all intermediate host round-trips and
        lets XLA overlap the stages' kernels.
        """
        kl_kwargs = dict(kl_kwargs)
        minimize = kl_kwargs.pop("minimize", _newton_cg)
        minimize_kwargs = kl_kwargs.pop("minimize_kwargs", {})

        def step(samples: Samples, key):
            key, sk = random.split(key, 2)
            st_smpls = jnp.zeros(())
            if mode in ("linear_resample", "linear_sample",
                        "nonlinear_resample", "nonlinear_sample"):
                k_smpls = samples.keys
                if mode.endswith("_resample"):
                    k_smpls = random.split(sk, n_samples)
                sampler = partial(
                    draw_linear_residual, self.likelihood,
                    point_estimates=point_estimates, **draw_linear_kwargs,
                )
                smpls, st_smpls = self.residual_map(
                    sampler, in_axes=(None, 0)
                )(samples.pos, k_smpls)
                neg = tree_map(jnp.negative, smpls)
                samples = Samples(
                    pos=samples.pos,
                    samples=concatenate_zip(smpls, neg),
                    keys=k_smpls,
                )
            if mode.startswith("nonlinear"):
                curver = partial(
                    nonlinearly_update_residual, self.likelihood,
                    point_estimates=point_estimates,
                    **nonlinearly_update_kwargs,
                )
                metric_sample_key = concatenate_zip(*((samples.keys,) * 2))
                sgn = jnp.ones(len(samples.keys))
                sgn = concatenate_zip(sgn, -sgn)
                smpls, st_smpls = self.residual_map(
                    curver, in_axes=(None, 0, 0, 0)
                )(samples.pos, samples._samples, metric_sample_key, sgn)
                samples = Samples(
                    pos=samples.pos, samples=smpls, keys=samples.keys
                )
            kl_opt_state = minimize(
                None,
                x0=samples.pos,
                fun_and_grad=partial(
                    self.kl_value_and_grad, primals_samples=samples
                ),
                hessp=partial(self.kl_metric, primals_samples=samples),
                **minimize_kwargs,
            )
            samples = samples.at(kl_opt_state.x)
            kl_opt_state = kl_opt_state._replace(
                x=None, jac=None, hess=None, hess_inv=None
            )
            return samples, st_smpls, kl_opt_state, key

        return self._kl_jit(step)

    def update(
        self,
        samples: Samples,
        state: OptimizeVIState,
        /,
        fused: bool = True,
        **kwargs,
    ) -> tuple[Samples, OptimizeVIState]:
        """One VI iteration: draw/update samples, then KL-minimize.

        With ``fused=True`` (default) and both jits enabled, the whole
        iteration runs as a single compiled program — one device dispatch
        instead of one per stage."""
        assert isinstance(samples, Samples)
        assert isinstance(state, OptimizeVIState)
        nit, key, config = state.nit, state.key, state.config

        sample_mode = _getitem_at_nit(config, "sample_mode", nit)
        point_estimates = _getitem_at_nit(config, "point_estimates", nit)
        n_samples = _getitem_at_nit(config, "n_samples", nit)
        draw_linear_kwargs = _getitem_at_nit(config, "draw_linear_kwargs", nit)
        nonlinearly_update_kwargs = _getitem_at_nit(
            config, "nonlinearly_update_kwargs", nit
        )
        kl_kwargs = dict(_getitem_at_nit(config, "kl_kwargs", nit))

        n_keys = 0 if samples.keys is None else len(samples.keys)
        mode = self._resolve_sample_mode(sample_mode, n_samples, n_keys)
        if (
            fused
            and not kwargs
            and self._kl_jit is not _no_jit
            and self._residual_jit is not _no_jit
        ):
            cfg = dict(
                mode=mode,
                n_samples=n_samples,
                point_estimates=point_estimates,
                draw_linear_kwargs=draw_linear_kwargs,
                nonlinearly_update_kwargs=nonlinearly_update_kwargs,
                kl_kwargs=kl_kwargs,
            )
            step = self._compiled(
                "fused_update", self._build_fused_update, cfg
            )
            samples, st_smpls, kl_opt_state, key = step(samples, key)
            return samples, state._replace(
                nit=nit + 1,
                key=key,
                sample_state=st_smpls,
                minimization_state=kl_opt_state,
            )

        key, sk = random.split(key, 2)
        samples, st_smpls = self.draw_samples(
            samples,
            key=sk,
            sample_mode=sample_mode,
            point_estimates=point_estimates,
            n_samples=n_samples,
            draw_linear_kwargs=draw_linear_kwargs,
            nonlinearly_update_kwargs=nonlinearly_update_kwargs,
            **kwargs,
        )

        kl_opt_state = self.kl_minimize(samples, **kl_kwargs, **kwargs)
        samples = samples.at(kl_opt_state.x)
        kl_opt_state = kl_opt_state._replace(
            x=None, jac=None, hess=None, hess_inv=None
        )
        state = state._replace(
            nit=nit + 1,
            key=key,
            sample_state=st_smpls,
            minimization_state=kl_opt_state,
        )
        return samples, state

    def run(self, samples, *args, **kwargs) -> tuple[Samples, OptimizeVIState]:
        state = self.init_state(*args, **kwargs)
        nm = self.__class__.__name__
        for i in range(state.nit, self.n_total_iterations):
            logger.info(f"{nm}: Starting {i + 1:04d}")
            samples, state = self.update(samples, state)
            logger.info(self.get_status_message(samples, state, name=nm))
        return samples, state


def _to_host(tree):
    return tree_map(np.asarray, tree)


def optimize_kl(
    likelihood: Likelihood,
    position_or_samples,
    *,
    key,
    n_total_iterations: int,
    n_samples,
    point_estimates=(),
    constants=(),
    kl_jit=True,
    residual_jit=True,
    kl_map=jax.vmap,
    residual_map="vmap",
    kl_reduce=_reduce,
    mirror_samples=True,
    draw_linear_kwargs=dict(cg_name=None, cg_kwargs=dict()),
    nonlinearly_update_kwargs=dict(minimize_kwargs=dict()),
    kl_kwargs=dict(minimize_kwargs=dict()),
    sample_mode: SMPL_MODE_GENERIC_TYP = "nonlinear_resample",
    resume: Union[str, bool] = False,
    callback: Optional[Callable[[Samples, OptimizeVIState], None]] = None,
    terminate_callback: Optional[Callable[[Samples, OptimizeVIState], bool]] = None,
    plot_energy_history: bool = True,
    export_operator_outputs: Optional[dict] = None,
    odir: Optional[str] = None,
    _optimize_vi=None,
    _optimize_vi_state=None,
) -> tuple[Samples, OptimizeVIState]:
    """One-stop-shop MGVI/geoVI driver with checkpoint/resume.

    Parity: ``src/re/optimize_kl.py:574``.
    """
    LAST_FILENAME = "last.pkl"
    MINISANITY_FILENAME = "minisanity.txt"

    opt_vi = _optimize_vi
    if opt_vi is None:
        opt_vi = OptimizeVI(
            likelihood,
            n_total_iterations=n_total_iterations,
            kl_jit=kl_jit,
            residual_jit=residual_jit,
            kl_map=kl_map,
            residual_map=residual_map,
            kl_reduce=kl_reduce,
            mirror_samples=mirror_samples,
        )

    last_fn = os.path.join(odir, LAST_FILENAME) if odir is not None else None
    resume_fn = resume if isinstance(resume, str) and os.path.isfile(resume) else last_fn
    sanity_fn = os.path.join(odir, MINISANITY_FILENAME) if odir is not None else None

    if isinstance(position_or_samples, Samples):
        samples = position_or_samples
    else:
        samples = Samples(pos=position_or_samples, samples=None, keys=None)
    opt_vi_st = None
    if resume:
        if resume_fn is None or not os.path.isfile(resume_fn):
            raise ValueError(f"unable to resume from {resume_fn!r}")
        if samples.pos is not None:
            logger.warning("overwriting `position_or_samples` with `resume`")
        with open(resume_fn, "rb") as f:
            samples, opt_vi_st = pickle.load(f)
    opt_vi_st_init = opt_vi.init_state(
        key,
        n_samples=n_samples,
        draw_linear_kwargs=draw_linear_kwargs,
        nonlinearly_update_kwargs=nonlinearly_update_kwargs,
        kl_kwargs=kl_kwargs,
        sample_mode=sample_mode,
        point_estimates=point_estimates,
        constants=constants,
    )
    opt_vi_st = _optimize_vi_state if _optimize_vi_state is not None else opt_vi_st
    opt_vi_st = opt_vi_st_init if opt_vi_st is None else opt_vi_st
    if len(opt_vi_st.config) == 0:
        opt_vi_st = opt_vi_st._replace(config=opt_vi_st_init.config)

    if odir:
        os.makedirs(odir, exist_ok=True)
    if not resume and sanity_fn is not None:
        open(sanity_fn, "w").close()

    nm = "OPTIMIZE_KL"
    energy_history = []
    for i in range(opt_vi_st.nit, opt_vi.n_total_iterations):
        logger.info(f"{nm}: Starting {i + 1:04d}")
        samples, opt_vi_st = opt_vi.update(samples, opt_vi_st)
        msg = opt_vi.get_status_message(samples, opt_vi_st, name=nm)
        logger.info(msg)
        energy_history.append(
            (opt_vi_st.nit, float(opt_vi_st.minimization_state.fun))
        )
        if sanity_fn is not None:
            with open(sanity_fn, "a") as f:
                f.write("\n" + msg)
        if last_fn is not None:
            with open(last_fn, "wb") as f:
                # Host numpy copies: checkpoint loads on any backend/mesh.
                pickle.dump(
                    (_to_host(samples), _to_host(opt_vi_st._replace(config={}))),
                    f,
                )
        if export_operator_outputs is not None and odir is not None:
            # hdf5 export of configured operator outputs over samples each
            # iteration (parity: reference driver export,
            # src/minimization/optimize_kl.py:461+).
            from .sample_io import save_samples_to_hdf5

            save_samples_to_hdf5(
                samples,
                os.path.join(odir, "operator_outputs.h5"),
                export_operator_outputs,
                overwrite=True,
            )
        if callback is not None:
            callback(samples, opt_vi_st)
        if terminate_callback is not None and terminate_callback(
            samples, opt_vi_st
        ):
            logger.info(f"{nm}: terminated early by `terminate_callback`")
            break

    if plot_energy_history and odir is not None and energy_history:
        # Energy-history plot (parity: the reference driver's
        # `plot_energy_history`, src/minimization/optimize_kl.py:69).
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        nits, energies = zip(*energy_history)
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(nits, energies, marker="o")
        ax.set_xlabel("iteration")
        ax.set_ylabel("KL energy")
        fig.tight_layout()
        fig.savefig(os.path.join(odir, "energy_history.png"), dpi=100)
        plt.close(fig)

    return samples, opt_vi_st
