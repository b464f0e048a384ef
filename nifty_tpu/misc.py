"""Small numerical helpers (parity: ``src/re/misc.py``)."""

from __future__ import annotations

from functools import wraps
from typing import Callable

import jax
from jax import numpy as jnp


def hvp(f: Callable, primals, tangents):
    """Hessian-vector product of scalar ``f`` (forward-over-reverse).

    Parity: ``src/re/misc.py:12``.
    """
    return jax.jvp(jax.grad(f), primals, tangents)[1]


def interpolate(xmin=-7.0, xmax=7.0, N=14000) -> Callable:
    """Decorator replacing a scalar function with a linear-interpolation
    lookup of itself (useful for expensive special functions inside hot
    jitted code).  Parity: ``src/re/misc.py:78``.
    """

    def decorator(f):
        from functools import wraps

        x = jnp.linspace(xmin, xmax, N)
        y = f(x)

        @wraps(f)
        def wrapper(t):
            return jnp.interp(t, x, y)

        return wrapper

    return decorator


def host_callbacks_supported() -> bool:
    """Whether the default backend can run host callbacks
    (``jax.debug.callback`` / ``io_callback``).

    Tunneled-TPU backends (axon) reject host send/recv; in-jit failure
    signaling then falls back to info codes checked at the next host
    boundary (see ``nifty_tpu.optimize_kl.OptimizeVI.update``).
    """
    try:
        version = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        return True
    return "axon" not in str(version)
