"""Models are pytrees.

A :class:`Model` joins a pure callable with a ``domain`` (pytree of
:class:`~nifty_tpu.tree.ShapeWithDtype`), a ``target`` (inferred via
``jax.eval_shape`` — zero compute at build time), and an ``init`` rule that
draws the model's latent parameters from the standardized prior.  Every
subclass is automatically registered as a JAX pytree through the
:class:`PyTreeMeta` metaclass; dataclass fields marked
``field(metadata=dict(static=False))`` are traced children, everything else
is static aux data.  This is what lets whole models (including likelihoods
holding data arrays) be passed straight through ``jit``/``vmap``/``pjit``.

Parity: reference ``src/re/model.py`` (``ModelMeta`` ``:87-121``,
``LazyModel`` ``:128-166``, ``Initializer`` ``:22-84``, ``WrappedCall``
``:243``) — re-implemented from scratch; key handling uses JAX typed PRNG
keys, and static aux data is kept hashable for efficient jit caching.
"""

from __future__ import annotations

import abc
import dataclasses
from functools import partial
from pprint import pformat
from typing import Any, Callable, Optional

import jax
import numpy as np
from jax import random
from jax.tree_util import (
    register_pytree_node,
    tree_leaves,
    tree_map,
    tree_structure,
    tree_unflatten,
)

from .tree import ShapeWithDtype, random_like


def _abstract_key():
    return jax.eval_shape(lambda: random.PRNGKey(0))


class Initializer:
    """Composable per-key initialization rules.

    Wraps either a single callable ``key -> tree`` ("opaque") or a pytree of
    per-leaf callables; in the latter case the PRNG key is split
    deterministically across leaves so initialization is placement- and
    mesh-size-independent.  Parity: ``src/re/model.py:22-84``.
    """

    def __new__(cls, call_or_struct):
        if isinstance(call_or_struct, Initializer):
            return call_or_struct
        obj = super().__new__(cls)
        obj._call_or_struct = call_or_struct
        obj._target = None
        return obj

    @property
    def opaque(self) -> bool:
        return callable(self._call_or_struct)

    def __call__(self, key, *args, **kwargs):
        if self.opaque:
            return self._call_or_struct(key, *args, **kwargs)
        struct = tree_structure(self._call_or_struct)
        subkeys = tree_unflatten(struct, list(random.split(key, struct.num_leaves)))
        return tree_map(
            lambda init, k: init(k, *args, **kwargs), self._call_or_struct, subkeys
        )

    @property
    def target(self):
        if self._target is None:
            self._target = jax.eval_shape(self, _abstract_key())
        return self._target

    def __or__(self, other):
        other = Initializer(other)
        if not self.opaque and not other.opaque:
            return Initializer({**self._call_or_struct, **other._call_or_struct})
        return NotImplemented

    def __getitem__(self, key):
        if self.opaque:
            raise NotImplementedError("opaque initializer is not subscriptable")
        return Initializer(self._call_or_struct[key])

    def __len__(self):
        return len(self._call_or_struct if not self.opaque else self.target)

    def __repr__(self):
        return f"Initializer({pformat(self._call_or_struct)})"


class _StaticArray:
    """Hashable identity wrapper for numpy-array static aux data.

    Models that carry host-numpy constants as plain attributes (e.g.
    :class:`~nifty_tpu.ops.nufft.RadioResponse`'s uv table) would make
    the pytree aux unhashable and break jit caching when the model is
    passed as a jit *argument* (the runtime-buffer route for big
    ``consts``).  Equality/hash are by object identity — passing the
    same model instance hits the jit cache; a content-equal copy retraces
    (correct, just not cached), which avoids hashing multi-MB buffers on
    every dispatch.
    """

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr

    def __hash__(self):
        return hash((id(self.arr), self.arr.shape, str(self.arr.dtype)))

    def __eq__(self, other):
        return isinstance(other, _StaticArray) and self.arr is other.arr


class PyTreeMeta(abc.ABCMeta):
    """Metaclass registering every subclass as a JAX pytree.

    Dataclass fields carrying ``metadata=dict(static=False)`` become traced
    children; all other instance attributes are static aux data (and must be
    hashable for jit caching).  Parity: ``src/re/model.py:87-121``; the
    static/dynamic split follows the same equinox-style convention.
    """

    def __new__(mcs, name, bases, namespace, /, **kwargs):
        cls = super().__new__(mcs, name, bases, namespace, **kwargs)
        cls = dataclasses.dataclass(init=False, repr=False, eq=False)(cls)

        def tree_flatten(self):
            dynamic, static = [], []
            for k, v in self.__dict__.items():
                fm = self.__dataclass_fields__.get(k)
                meta = fm.metadata if fm is not None else {}
                if meta.get("static", True) is False:
                    dynamic.append((k, v))
                else:
                    if isinstance(v, np.ndarray):
                        v = _StaticArray(v)
                    static.append((k, v))
            names = tuple(k for k, _ in dynamic)
            return tuple(v for _, v in dynamic), (names, tuple(static))

        def tree_unflatten_(aux, children, *, cls=cls):
            names, static = aux
            obj = object.__new__(cls)
            for k, v in zip(names, children):
                object.__setattr__(obj, k, v)
            for k, v in static:
                object.__setattr__(
                    obj, k, v.arr if isinstance(v, _StaticArray) else v
                )
            return obj

        register_pytree_node(cls, tree_flatten, tree_unflatten_)
        return cls


class NoValue:
    """Sentinel distinguishing 'unset' from ``None``."""


class LazyModel(metaclass=PyTreeMeta):
    """Base class lazily deriving ``domain`` ⇄ ``target`` ⇄ ``init``.

    Parity: ``src/re/model.py:128-166``.
    """

    _domain: Any = dataclasses.field(default=NoValue)
    _target: Any = dataclasses.field(default=NoValue)
    _init: Any = dataclasses.field(default=NoValue)

    def __init__(self, domain=NoValue, target=NoValue, init=NoValue):
        self._domain = domain
        self._target = target
        self._init = Initializer(init) if init is not NoValue else init

    def __call__(self, *args, **kwargs):
        raise NotImplementedError()

    @property
    def domain(self):
        if self._domain is NoValue and self._init is not NoValue:
            return jax.eval_shape(self.init, _abstract_key())
        return self._domain

    @property
    def target(self):
        if self._target is NoValue and self.domain is not NoValue:
            return jax.eval_shape(self.__call__, self.domain)
        return self._target

    @property
    def init(self) -> Initializer:
        if self._init is NoValue:
            return Initializer(
                tree_map(lambda p: partial(random_like, primals=p), self.domain)
            )
        return self._init

    def __repr__(self):
        return f"{self.__class__.__name__}(domain={pformat(self._domain)})"


class Model(LazyModel):
    """Join a callable with a domain, target, and init rule.

    ``consts`` (optional) is a pytree of large model constants (e.g. power
    distributor index maps, response tables) carried as *dynamic* pytree
    leaves and fed to ``call`` as its first argument.  Because they are
    children of the model pytree, they travel as runtime device buffers
    whenever the model is passed through a ``jit`` boundary as an argument
    — shared across every compiled program — instead of being baked into
    each executable as a multi-MB constant.  Parity:
    ``src/re/model.py:169-241`` (the reference has no analog; it closes
    over constants, which is fine on CPU but duplicates HBM per
    executable on TPU).
    """

    consts: Any = dataclasses.field(default=None, metadata=dict(static=False))

    def __init__(
        self,
        call: Optional[Callable] = None,
        *,
        domain=NoValue,
        target=NoValue,
        init=NoValue,
        white_init: bool = False,
        consts=None,
    ):
        self._call = call
        self.consts = consts
        if init is NoValue and domain is not NoValue and white_init:
            init = tree_map(lambda p: partial(random_like, primals=p), domain)
        elif init is NoValue and domain is NoValue:
            raise ValueError("one of `init` or `domain` must be set")
        if domain is NoValue and init is not NoValue:
            domain = jax.eval_shape(Initializer(init), _abstract_key())
        if target is NoValue and domain is not NoValue:
            target = jax.eval_shape(self.__call__, domain)
        super().__init__(domain=domain, target=target, init=init)

    def __call__(self, *args, **kwargs):
        if self.consts is not None:
            return self._call(self.consts, *args, **kwargs)
        return self._call(*args, **kwargs)

    def jcall(self, *args):
        """Jitted apply with the model passed as an ARGUMENT.

        ``jax.jit(model)(x)`` closes over the model, so its ``consts``
        (multi-GB SHT/distributor tables at scale) are baked into the
        executable as HLO constants — which duplicates HBM and can
        overflow the remote-compile request size.  ``model.jcall(x)``
        compiles ``(model, x) -> model(x)`` instead: the tables enter as
        shared runtime device buffers.
        """
        return _jitted_model_apply(self, *args)

    def __repr__(self):
        return f"{self.__class__.__name__}({pformat(self._call)}, domain={pformat(self._domain)})"


@jax.jit
def _jitted_model_apply(model, *args):
    return model(*args)


def wrap(call: Callable, name) -> Callable:
    """Lift ``call`` to act on ``input[name]`` instead of ``input``.

    Parity: ``src/re/misc.py:58``.
    """

    def named_call(p, *args, **kwargs):
        return call(p[name], *args, **kwargs)

    return named_call


def wrap_left(call: Callable, name) -> Callable:
    """Wrap the *output* of ``call`` into ``{name: output}``.

    Parity: ``src/re/misc.py:68``.
    """

    def named_call(*args, **kwargs):
        return {name: call(*args, **kwargs)}

    return named_call


class WrappedCall(Model):
    """Model selecting ``name`` from its input before applying ``call``.

    Parity: ``src/re/model.py:243-285``.
    """

    def __init__(
        self,
        call: Callable,
        *,
        name=None,
        shape=(),
        dtype=None,
        white_init: bool = False,
        target=NoValue,
    ):
        leaves = tree_leaves(shape)
        is_swd = len(leaves) > 0 and all(
            hasattr(e, "shape") and hasattr(e, "dtype") for e in leaves
        )
        domain = shape if is_swd else ShapeWithDtype(shape, dtype)
        if name is not None:
            call = wrap(call, name)
            domain = {name: domain}
        super().__init__(call, domain=domain, target=target, white_init=white_init)
