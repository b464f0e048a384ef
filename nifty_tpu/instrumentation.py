"""Profiling and instrumentation utilities.

- :func:`exec_time` micro-benchmarks a model/likelihood's forward, jvp,
  vjp, value_and_grad, and metric applications with proper device
  synchronization (parity: ``ift.exec_time``, ``src/sugar.py:557``).
- :class:`CountingModel` wraps a callable and counts applications of the
  forward, Jacobian, and adjoint passes (parity: ``CountingOperator``,
  ``src/operators/counting_operator.py:20``).  Counts are exact in eager
  mode; under ``jit`` each *compiled execution* increments through a
  host callback (tracing itself does not count).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
from jax import numpy as jnp

from .likelihood import Likelihood
from .tree import random_like, shape_dtype_like


def _timeit(fn, *args, n: int = 3):
    fn(*args)  # warm-up/compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def exec_time(model, primals=None, *, key=None, want_metric: bool = True,
              n: int = 3, verbose: bool = True) -> dict:
    """Time forward/jvp/vjp/value_and_grad(/metric) of a model.

    Returns a dict of seconds per call (jitted, device-synchronized).
    """
    key = jax.random.PRNGKey(42) if key is None else key
    if primals is None:
        primals = random_like(key, model.domain)
    tangents = random_like(key, shape_dtype_like(primals))

    res = {}
    fwd = jax.jit(model.__call__ if hasattr(model, "__call__") else model)
    res["forward"] = _timeit(fwd, primals, n=n)

    jvp_fn = jax.jit(lambda p, t: jax.jvp(model, (p,), (t,))[1])
    res["jvp"] = _timeit(jvp_fn, primals, tangents, n=n)

    out = model(primals)
    if jnp.ndim(out) == 0:
        vg = jax.jit(jax.value_and_grad(model))
        res["value_and_grad"] = _timeit(vg, primals, n=n)
    else:
        cot = random_like(key, shape_dtype_like(out))
        vjp_fn = jax.jit(lambda p, c: jax.vjp(model, p)[1](c)[0])
        res["vjp"] = _timeit(vjp_fn, primals, cot, n=n)

    if want_metric and isinstance(model, Likelihood):
        met = jax.jit(model.metric)
        res["metric"] = _timeit(met, primals, tangents, n=n)
    if verbose:
        from .logger import logger

        for k, v in res.items():
            logger.info(f"exec_time: {k:16s} {v * 1e3:9.3f} ms")
    return res


class CountingModel:
    """Wrap a callable and count forward/Jacobian/adjoint applications.

    Use ``.report()`` for a per-pass summary; ``reset()`` to zero.
    """

    def __init__(self, call: Callable, name: str = "model"):
        self._call = call
        self.name = name
        self.reset()

    def reset(self):
        self._counts = {"forward": 0, "jvp": 0, "vjp": 0}

    @property
    def counts(self):
        return dict(self._counts)

    def _bump(self, what):
        def cb(_):
            self._counts[what] += 1

        jax.debug.callback(cb, jnp.zeros(()))

    def __call__(self, x, *args, **kwargs):
        self._bump("forward")
        return self._call(x, *args, **kwargs)

    def jvp(self, primals, tangents):
        self._bump("jvp")
        return jax.jvp(self._call, (primals,), (tangents,))[1]

    def vjp(self, primals, cotangents):
        self._bump("vjp")
        return jax.vjp(self._call, primals)[1](cotangents)[0]

    def report(self) -> str:
        c = self._counts
        return (
            f"{self.name}: #forward {c['forward']},"
            f" #jvp {c['jvp']}, #vjp {c['vjp']}"
        )
