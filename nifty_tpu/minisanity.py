"""Posterior-residual sanity report.

For every leaf of a (possibly transformed) latent tree this computes the
reduced chi-squared and the entry-average of the residuals — the quick
"is the fit statistically sane" readout printed each VI iteration.  When
posterior samples are given, the per-sample statistics are summarized by
their sample mean and spread.

Capability parity with the reference's minisanity diagnostics
(``src/re/minisanity.py``, classic twin ``src/extra.py:438``); the
implementation here is its own design: statistics for the whole tree are
produced in a single mapped pass over the sample axis, and the report is
rendered as one aligned, path-labelled table instead of a pretty-printed
nested structure.
"""

from __future__ import annotations

from typing import Any, NamedTuple

from jax import numpy as jnp
from jax.tree_util import keystr, tree_flatten_with_path, tree_map

from .evi import Samples
from .tree import Vector, get_map


class ChiSqStats(NamedTuple):
    """Summary statistics of one residual leaf.

    ``mean`` and ``reduced_chisq`` are length-2 arrays holding the average
    and the standard deviation over posterior samples (the latter is zero
    when only a single position was supplied); ``ndof`` counts real degrees
    of freedom (complex entries count twice).
    """

    mean: Any
    reduced_chisq: Any
    ndof: Any


def _leaf_stats(batched_leaf):
    """Per-sample (mean, reduced χ², dof) of one leaf, vectorized along the
    leading sample axis — no inner map needed."""
    n = batched_leaf[0].size
    # One complex entry carries two real degrees of freedom.
    dof = n * (2 - jnp.isrealobj(batched_leaf))
    flat = batched_leaf.reshape(batched_leaf.shape[0], -1)
    avg = jnp.sum(flat, axis=1) / n
    chisq = jnp.sum(jnp.abs(flat) ** 2, axis=1) / dof
    return avg, chisq, dof


def _as_stacked_tree(position_or_samples, func, map):
    """Return ``func`` applied over a leading sample axis (size ≥ 1)."""
    if isinstance(position_or_samples, Samples) and len(position_or_samples):
        batch = position_or_samples.samples
    else:
        pos = position_or_samples
        if isinstance(pos, Samples):
            pos = pos.pos
        batch = tree_map(lambda x: x[jnp.newaxis], pos)
    return map(func)(batch) if func is not None else batch


def reduced_residual_stats(position_or_samples, func=None, *, map="vmap"):
    """Per-leaf :class:`ChiSqStats` of ``func(x)``, averaged over samples.

    ``position_or_samples`` may be a latent tree or a :class:`Samples`
    container; ``func`` (e.g. ``likelihood.normalized_residual``) is applied
    to each sample before the statistics are taken.
    """
    map = get_map(map)
    batch = _as_stacked_tree(position_or_samples, func, map)

    def summarize(batched_leaf):
        avg, chisq, dof = _leaf_stats(batched_leaf)
        over_samples = lambda v: jnp.array([jnp.mean(v), jnp.std(v)])
        return ChiSqStats(over_samples(avg), over_samples(chisq), dof)

    return tree_map(summarize, batch)


def _label(path) -> str:
    txt = keystr(path)
    # keystr renders dict keys as "['key']" — strip to bare names.
    for ch in "[]'\"":
        txt = txt.replace(ch, "")
    return txt.lstrip(".") or "<root>"


def _render_table(rows) -> str:
    header = ("", "reduced χ²", "mean", "# dof")
    cells = [header]
    for label, st in rows:
        rc, mn = st.reduced_chisq, st.mean
        cells.append((
            label,
            f"{float(rc[0]):.2g} ± {float(rc[1]):.2g}",
            f"{float(mn[0]):+.2g} ± {float(mn[1]):.2g}",
            f"{int(st.ndof)}",
        ))
    widths = [max(len(r[i]) for r in cells) for i in range(4)]
    lines = []
    for r in cells:
        lines.append(
            f"  {r[0]:<{widths[0]}}  {r[1]:>{widths[1]}}"
            f"  {r[2]:>{widths[2]}}  {r[3]:>{widths[3]}}"
        )
    return "\n".join(lines)


def minisanity(position_or_samples, func=None, *, map="vmap"):
    """Return ``(stats_tree, table_string)`` for the iteration log."""
    stats = reduced_residual_stats(position_or_samples, func=func, map=map)
    inner = stats.tree if isinstance(stats, Vector) else stats
    flat, _ = tree_flatten_with_path(
        inner, is_leaf=lambda node: isinstance(node, ChiSqStats)
    )
    rows = sorted(((_label(p), st) for p, st in flat), key=lambda r: r[0])
    return stats, _render_table(rows)
