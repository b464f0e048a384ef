"""Reduced-χ² summary statistics of normalized residuals ("minisanity").

Parity: reference ``src/re/minisanity.py:30-110`` (classic twin
``src/extra.py:438``).  Computes per-pytree-leaf mean, reduced χ², and
degrees of freedom of normalized likelihood residuals (and of the latent
prior residuals), averaged over posterior samples, plus a pretty-printable
table for the iteration log.
"""

from __future__ import annotations

import pprint
from typing import Any, NamedTuple

from jax import numpy as jnp
from jax.tree_util import tree_map

from .evi import Samples
from .tree import Vector, get_map


def _residual_params(inp):
    ndof = inp.size if jnp.isrealobj(inp) else 2 * inp.size
    mean = jnp.sum(inp) / inp.size
    rchisq = jnp.vdot(inp, inp).real / ndof
    return mean, rchisq, ndof


class ChiSqStats(NamedTuple):
    mean: Any
    reduced_chisq: Any
    ndof: Any


def reduced_residual_stats(position_or_samples, func=None, *, map="vmap"):
    """Sample-averaged (mean, reduced χ², ndof) per leaf of ``func(x)``."""
    map = get_map(map)
    if not isinstance(position_or_samples, Samples) or len(position_or_samples) == 0:
        if isinstance(position_or_samples, Samples):
            position_or_samples = position_or_samples.pos
        samples = tree_map(lambda x: x[jnp.newaxis, ...], position_or_samples)
    else:
        samples = position_or_samples.samples
    samples = map(func)(samples) if func is not None else samples

    get_stats = map(_residual_params)

    def red_chisq_stat(s):
        m, rx, nd = get_stats(s)
        m = jnp.array([jnp.mean(m), jnp.std(m)])
        rx = jnp.array([jnp.mean(rx), jnp.std(rx)])
        return ChiSqStats(m, rx, nd[0])

    return tree_map(red_chisq_stat, samples)


def minisanity(position_or_samples, func=None, *, map="vmap"):
    """Return ``(stats_tree, pretty_string)``."""
    stat_tree = reduced_residual_stats(position_or_samples, func=func, map=map)

    def fmt(x):
        rsq, m = x.reduced_chisq, x.mean
        return (
            f"reduced χ²:{float(rsq[0]):8.2}±{float(rsq[1]):8.2}"
            f", avg:{float(m[0]):+9.2}±{float(m[1]):8.2}"
            f", #dof:{int(x.ndof):7d}"
        )

    ps = tree_map(fmt, stat_tree, is_leaf=lambda l: isinstance(l, ChiSqStats))
    ps = ps.tree if isinstance(ps, Vector) else ps
    pp = pprint.PrettyPrinter()
    if isinstance(ps, dict):
        msg = ""
        for k in sorted(ps.keys(), key=str):
            v = ps[k]
            if isinstance(v, str):
                msg += f"{str(k):22s}:: {v}\n"
            else:
                msg += f"{str(k):22s}::\n{pp.pformat(v)}\n"
    elif not isinstance(ps, str):
        msg = pp.pformat(ps)
    else:
        msg = ps
    return stat_tree, msg
