"""Factory for custom *linear* JAX primitives defined by a forward/adjoint
implementation pair.

Several TPU-native operators in this package (on-the-fly SHT stages, the
bin-gather kernel) are linear maps whose mathematically-natural adjoint is
a *separate forward-running algorithm* — not what one gets by mechanically
transposing the forward trace (which would either be numerically unstable
(downward Legendre recurrences) or require materializing per-step
residuals (the full Legendre table the on-the-fly formulation exists to
avoid)).  This factory packages such a pair as two JAX primitives that
are each other's transpose, giving correct and *efficient*:

- forward-mode JVPs (``jax.linearize`` — the Newton-CG hessp path),
- ``jax.linear_transpose`` / reverse-mode VJPs (likelihood metrics),
- ``vmap`` batching (unrolled over the batch so the custom transpose is
  preserved for each element; batch sizes here are O(#samples)).

The closed-over constants of ``fwd``/``adj`` must be host constants
(numpy arrays), not tracers.
"""

from __future__ import annotations

import itertools

import jax
import jax.extend
from jax import numpy as jnp
from jax.interpreters import ad, batching, mlir

_counter = itertools.count()


def make_linear_pair(name, fwd, adj, fwd_out_aval, adj_out_aval):
    """Build primitives for a linear map and its transpose.

    ``fwd(x)`` / ``adj(y)``: jax-traceable linear functions (unary).
    ``fwd_out_aval(x_aval)`` / ``adj_out_aval(y_aval)``: output abstract
    values.  Returns ``(fwd_fn, adj_fn)`` wrapping the primitives.
    """
    uid = next(_counter)
    p_fwd = jax.extend.core.Primitive(f"{name}_fwd_{uid}")
    p_adj = jax.extend.core.Primitive(f"{name}_adj_{uid}")

    def _setup(p, impl, out_aval, p_other):
        p.def_impl(impl)
        p.def_abstract_eval(lambda x: out_aval(x))

        def jvp(primals, tangents):
            (x,), (t,) = primals, tangents
            out = p.bind(x)
            if isinstance(t, ad.Zero):
                return out, ad.Zero(jax.typeof(out).to_tangent_aval())
            return out, p.bind(t)

        def transpose(ct, x):
            assert ad.is_undefined_primal(x)
            if isinstance(ct, ad.Zero):
                return (ad.Zero(x.aval),)
            return (p_other.bind(ct),)

        def batcher(args, dims):
            (x,), (d,) = args, dims
            x = jnp.moveaxis(x, d, 0)
            out = jnp.stack([p.bind(x[i]) for i in range(x.shape[0])])
            return out, 0

        ad.primitive_jvps[p] = jvp
        ad.primitive_transposes[p] = transpose
        batching.primitive_batchers[p] = batcher
        mlir.register_lowering(p, mlir.lower_fun(impl, multiple_results=False))

    _setup(p_fwd, fwd, fwd_out_aval, p_adj)
    _setup(p_adj, adj, adj_out_aval, p_fwd)
    return (lambda x: p_fwd.bind(x)), (lambda y: p_adj.bind(y))


# -- self-adjoint linear maps ----------------------------------------------
#
# A single primitive for shape-preserving linear maps whose transpose IS
# the forward (symmetric operators, e.g. the full-grid Hartley).  Pinning
# transpose == forward makes adjoint applications bitwise identical to
# forward ones — a prerequisite for mesh-independent inference (an
# autodiff-derived transpose program need not be reduction-order stable
# across shardings).  ``fn`` must be rank-agnostic over *leading batch
# dims* (it receives the batched operand directly under ``vmap``).

self_adjoint_p = jax.extend.core.Primitive("self_adjoint_linear")


def self_adjoint_linear(fn, x):
    """Apply the symmetric linear map ``fn`` with transpose pinned to
    ``fn`` itself.  ``fn`` must preserve shape/dtype and accept extra
    leading batch dimensions."""
    return self_adjoint_p.bind(x, fn=fn)


self_adjoint_p.def_impl(lambda x, *, fn: fn(x))
self_adjoint_p.def_abstract_eval(lambda x, *, fn: x)
ad.deflinear2(
    self_adjoint_p, lambda ct, x, *, fn: [self_adjoint_p.bind(ct, fn=fn)]
)


def _self_adjoint_batcher(args, dims, *, fn):
    (x,), (d,) = args, dims
    x = jnp.moveaxis(x, d, 0)
    from .. import config as _config

    if _config.get("deterministic_reductions"):
        # Unrolled batch: batched FFT kernels produce batch-size-dependent
        # low-order bits, and the per-device batch size changes with the
        # sample-axis sharding — per-element calls keep every sample's
        # arithmetic identical across meshes (bitwise mode beats batch
        # fusion here by design).
        out = jnp.stack(
            [self_adjoint_p.bind(x[i], fn=fn) for i in range(x.shape[0])]
        )
        return out, 0
    return self_adjoint_p.bind(x, fn=fn), 0


batching.primitive_batchers[self_adjoint_p] = _self_adjoint_batcher
mlir.register_lowering(
    self_adjoint_p,
    mlir.lower_fun(lambda x, *, fn: fn(x), multiple_results=False),
)
