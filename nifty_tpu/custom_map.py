"""Sequential map variants trading wall-clock for memory.

``smap`` is a ``lax.scan``-based drop-in for ``jax.vmap`` that runs the
mapped function sequentially inside one compiled program — the memory knob
for drawing many posterior samples whose joint working set would not fit in
HBM.  ``lmap`` is a Python-loop variant that keeps only one iteration's
intermediates live on device at a time (each call is dispatched separately).

Parity: reference ``src/re/custom_map.py:31-164``.  Re-designed: ``smap``
supports the same ``in_axes`` (0 or None per argument) but builds directly
on ``lax.scan`` over stacked pytrees.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple, Union

from jax import lax
from jax.tree_util import tree_leaves, tree_map

from .tree import stack


def _parse_in_axes(args, in_axes):
    if isinstance(in_axes, int) or in_axes is None:
        in_axes = (in_axes,) * len(args)
    if len(in_axes) != len(args):
        raise ValueError("`in_axes` length does not match number of arguments")
    for ax in in_axes:
        if ax not in (0, None):
            raise ValueError("only mapping along axis 0 (or None) is supported")
    return tuple(in_axes)


def smap(fun: Callable, in_axes: Union[int, Tuple] = 0, out_axes: Any = 0):
    """Scan-based sequential map compatible with a subset of ``jax.vmap``."""
    if out_axes != 0:
        raise ValueError("`smap` only supports `out_axes=0`")

    def smapped(*args):
        axes = _parse_in_axes(args, in_axes)
        mapped = tuple(a for a, ax in zip(args, axes) if ax == 0)
        if not mapped:
            raise ValueError("at least one argument must be mapped")

        def body(carry, xs):
            xs = list(xs)
            full = tuple(
                xs.pop(0) if ax == 0 else a for a, ax in zip(args, axes)
            )
            return carry, fun(*full)

        _, ys = lax.scan(body, None, mapped)
        return ys

    return smapped


def lmap(fun: Callable, in_axes: Union[int, Tuple] = 0, out_axes: Any = 0):
    """Python-loop map; lowest peak memory, one dispatch per element."""
    if out_axes != 0:
        raise ValueError("`lmap` only supports `out_axes=0`")

    def lmapped(*args):
        axes = _parse_in_axes(args, in_axes)
        n = None
        for a, ax in zip(args, axes):
            if ax == 0:
                n_a = tree_leaves(a)[0].shape[0]
                if n is not None and n_a != n:
                    raise ValueError("inconsistent mapped axis sizes")
                n = n_a
        if n is None:
            raise ValueError("at least one argument must be mapped")

        results = []
        for i in range(n):
            full = tuple(
                tree_map(lambda x: x[i], a) if ax == 0 else a
                for a, ax in zip(args, axes)
            )
            results.append(fun(*full))
        return stack(results)

    return lmapped
