"""Strings that ride through jit/vmap as static pytree metadata.

Traced code cannot carry Python strings as values; a :class:`PyTreeString`
is a registered pytree whose *leaf list is empty* — the string lives in the
aux data, so any tree containing one passes through ``jit``/``vmap``/
``lax`` control flow untouched and compares by content for retracing.
Used to tag solver configurations with display names that the in-jit
progress printers (CG/NCG ``name=`` kwargs) can read at trace time.

Capability parity: reference ``src/re/tree_math/pytree_string.py:48``
(``PyTreeString``) and ``:83`` (``hide_strings``).
"""

from __future__ import annotations

from jax.tree_util import register_pytree_node, tree_map


class PyTreeString:
    """An immutable string wrapper that is a zero-leaf pytree."""

    __slots__ = ("_str",)

    def __init__(self, s):
        object.__setattr__(self, "_str", str(s))

    @property
    def str(self) -> str:
        return self._str

    def __str__(self) -> str:
        return self._str

    def __repr__(self) -> str:
        return f"PyTreeString({self._str!r})"

    def __eq__(self, other) -> bool:
        o = other.str if isinstance(other, PyTreeString) else other
        return self._str == o

    def __hash__(self) -> int:
        return hash(self._str)

    def __add__(self, other):
        o = other.str if isinstance(other, PyTreeString) else other
        return PyTreeString(self._str + o)

    def __radd__(self, other):
        o = other.str if isinstance(other, PyTreeString) else other
        return PyTreeString(o + self._str)

    def __setattr__(self, *_):
        raise AttributeError("PyTreeString is immutable")


register_pytree_node(
    PyTreeString,
    lambda s: ((), (s.str,)),
    lambda aux, _: PyTreeString(aux[0]),
)


def hide_strings(tree):
    """Wrap every plain-``str`` leaf of ``tree`` in a :class:`PyTreeString`
    so the whole tree can cross a jit boundary."""
    return tree_map(
        lambda x: PyTreeString(x) if isinstance(x, str) else x,
        tree,
        is_leaf=lambda x: isinstance(x, str),
    )


def unhide_strings(tree):
    """Inverse of :func:`hide_strings`."""
    return tree_map(
        lambda x: x.str if isinstance(x, PyTreeString) else x,
        tree,
        is_leaf=lambda x: isinstance(x, PyTreeString),
    )
