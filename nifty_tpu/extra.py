"""Self-checking consistency machinery (the test-suite backbone).

Property-based checks replacing golden outputs, mirroring the reference's
``ift.extra.check_linear_operator`` / ``check_operator``
(``src/extra.py:41,99,156-436``): adjointness, linearity, dtype purity,
Jacobian-vs-finite-differences, and metric/transformation consistency —
formulated for callables/Models instead of operator objects.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.numpy import sum as jnp_sum
from jax.tree_util import tree_leaves, tree_map

from .likelihood import Likelihood
from .tree import random_like, shape_dtype_like, tree_add, tree_scale, vdot


def _rand(key, proto):
    return random_like(key, shape_dtype_like(proto))


def _with_dtype(proto, dtype):
    """Shape/dtype tree of ``proto`` with every leaf's dtype replaced
    (complex dtypes keep complex leaves complex, real stay real unless the
    requested dtype itself is complex)."""
    import jax.numpy as jnp

    want = jnp.dtype(dtype)

    def leaf(sd):
        dt = want
        if np.issubdtype(sd.dtype, np.complexfloating) and not np.issubdtype(
            want, np.complexfloating
        ):
            # keep complex leaves complex at the matching precision
            dt = jnp.dtype(np.result_type(want, np.complex64))
        return jax.ShapeDtypeStruct(np.shape(sd), dt)

    return tree_map(leaf, shape_dtype_like(proto))


def assert_equal_tree(a, b, err_msg="trees differ"):
    """Bitwise equality of two pytrees (the reference's ``assert_equal``,
    ``src/extra.py:151``)."""
    la, lb = tree_leaves(a), tree_leaves(b)
    assert len(la) == len(lb), f"{err_msg}: different structures"
    for u, v in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v),
                                      err_msg=err_msg)


def check_purity(f: Callable, x, *, err_msg="operator is impure"):
    """Side-effect check: applying ``f`` twice to the same input must give
    bitwise-identical results (detects hidden state/caches/RNG use inside a
    model).  Parity: ``src/extra.py:303`` ``_purity_check``."""
    assert_equal_tree(f(x), f(x), err_msg=err_msg)
    return True


def check_dtype_purity(
    f: Callable,
    domain,
    key,
    *,
    dtypes=("float32", "float64"),
    expected=None,
):
    """Dtype-propagation check: for each requested input dtype, every
    output leaf's dtype must equal the expectation (default: the input
    dtype itself — no silent up- or down-casting through the model).

    ``expected`` may be a dtype, a dtype-valued function of the input
    dtype, or ``None``.  Parity: the dtype legs of the reference's
    ``check_linear_operator`` (``src/extra.py:41-96,156-230``, which runs
    every check in f32 and f64 and asserts results live in the declared
    target).
    """
    import jax.numpy as jnp

    for dt in dtypes:
        x = random_like(key, _with_dtype(domain, dt))
        out = f(x)
        want = expected(dt) if callable(expected) else (expected or dt)
        for leaf in tree_leaves(out):
            got = jnp.asarray(leaf).dtype
            assert got == jnp.dtype(want), (
                f"dtype purity violated: input {dt} -> output {got}, "
                f"expected {jnp.dtype(want)}"
            )
    return True


def check_inverse(
    f: Callable,
    inverse: Callable,
    domain,
    key,
    *,
    target=None,
    rtol: float = 1e-9,
    atol: float = 1e-11,
):
    """Round-trip check ``inverse(f(x)) == x`` and ``f(inverse(y)) == y``.

    Parity: ``src/extra.py:171`` ``_inverse_implementation``.
    """
    k1, k2 = jax.random.split(key, 2)
    x = _rand(k1, domain)
    rt = inverse(f(x))
    for a, b in zip(tree_leaves(rt), tree_leaves(x)):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg="inverse(f(x)) != x")
    y = _rand(k2, f(x) if target is None else target)
    rt = f(inverse(y))
    for a, b in zip(tree_leaves(rt), tree_leaves(y)):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg="f(inverse(y)) != y")
    return True


def check_linear_model(
    f: Callable,
    domain,
    key,
    *,
    target=None,
    rtol: float = 1e-9,
    atol: float = 1e-11,
    assert_adjoint: bool = True,
    inverse: "Callable | None" = None,
    dtypes=None,
    assert_purity: bool = False,
):
    """Verify that ``f`` is linear: homogeneity/additivity, agreement with
    its own jvp, and adjointness of jvp vs vjp (``<Jx, y> == <x, J^T y>``).

    Optional extra legs (full ``check_linear_operator`` parity,
    ``src/extra.py:41``):

    - ``inverse``: round-trip ``inverse(f(x)) == x`` both ways;
    - ``dtypes``: re-run the core checks for each listed input dtype and
      assert outputs keep that dtype (dtype purity);
    - ``assert_purity``: double application is bitwise identical.
    """
    if dtypes is not None:
        for dt in dtypes:
            check_linear_model(
                f, _with_dtype(domain, dt), key,
                target=target, rtol=rtol, atol=atol,
                assert_adjoint=assert_adjoint, inverse=inverse,
                dtypes=None, assert_purity=assert_purity,
            )
        check_dtype_purity(f, domain, key, dtypes=dtypes)
        return True

    k1, k2, k3 = jax.random.split(key, 3)
    x = _rand(k1, domain)
    y = _rand(k2, domain)

    if assert_purity:
        check_purity(f, x)
    if inverse is not None:
        check_inverse(
            f, inverse, domain, key, target=target,
            rtol=10 * rtol, atol=10 * atol,
        )

    fx, fy = f(x), f(y)
    # additivity + homogeneity
    lhs = f(tree_add(tree_scale(x, 2.0), y))
    rhs = tree_map(lambda a, b: 2.0 * a + b, fx, fy)
    for a, b in zip(tree_leaves(lhs), tree_leaves(rhs)):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg="linearity violated")
    # f(x) == jvp(f)(x)
    _, jx = jax.jvp(f, (x,), (x,))
    for a, b in zip(tree_leaves(fx), tree_leaves(jx)):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg="f != jvp(f) for linear f")
    if assert_adjoint:
        # Transposition via the *bilinear* pairing sum(a*b) — exact for
        # real and complex linear maps alike (vdot's conjugation would
        # test the conjugate-adjoint, which jax.vjp does not implement
        # for C-linear maps).
        cot = _rand(k3, fx)
        fT = jax.linear_transpose(f, x)

        def pair(a, b):
            return sum(
                jnp_sum(u * v) for u, v in zip(tree_leaves(a), tree_leaves(b))
            )

        lhs_s = pair(fx, cot)
        rhs_s = pair(x, fT(cot)[0])
        np.testing.assert_allclose(
            np.asarray(lhs_s), np.asarray(rhs_s), rtol=10 * rtol,
            err_msg="adjointness (transposition) violated",
        )
    return True


def check_model(
    f: Callable,
    domain,
    key,
    *,
    step: float = 1e-6,
    rtol: float = 1e-4,
    atol: float = 1e-6,
    adjoint_rtol: float = 1e-8,
    assert_purity: bool = False,
):
    """Verify the Jacobian of (possibly nonlinear) ``f`` against central
    finite differences along a random direction.

    Parity: ``src/extra.py:99`` ``check_operator`` (Jacobian vs finite
    differences; ``assert_purity`` adds its ``_purity_check`` leg).
    """
    k1, k2 = jax.random.split(key)
    x = _rand(k1, domain)
    t = _rand(k2, domain)
    if assert_purity:
        check_purity(f, x)
    _, jvp_val = jax.jvp(f, (x,), (t,))
    fp = f(tree_add(x, tree_scale(t, step)))
    fm = f(tree_add(x, tree_scale(t, -step)))
    fd = tree_map(lambda a, b: (a - b) / (2 * step), fp, fm)
    for a, b in zip(tree_leaves(jvp_val), tree_leaves(fd)):
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol, err_msg="Jacobian vs FD mismatch"
        )
    # vjp/jvp adjoint consistency
    y, vjp = jax.vjp(f, x)
    cot = _rand(key, y)
    lhs = vdot(jvp_val, cot)
    rhs = vdot(t, vjp(cot)[0])
    np.testing.assert_allclose(
        np.asarray(lhs), np.asarray(rhs), rtol=adjoint_rtol,
        err_msg="jvp/vjp adjointness violated",
    )
    return True


def check_likelihood(
    lh: Likelihood,
    key,
    *,
    rtol: float = 1e-8,
    atol: float = 1e-10,
    check_metric_root: bool = True,
):
    """Verify a likelihood's internal calculus:

    - ``metric == lsm ∘ rsm`` (when ``check_metric_root``),
    - lsm/rsm adjointness,
    - gradient of the energy matches autodiff of ``energy``.

    Parity: the metric/transformation consistency half of
    ``src/extra.py:344-436``.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    p = _rand(k1, lh.domain)
    t = _rand(k2, lh.domain)
    u = random_like(k3, lh.lsm_tangents_shape)

    if check_metric_root:
        m1 = lh.metric(p, t)
        m2 = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
        for a, b in zip(tree_leaves(m1), tree_leaves(m2)):
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                       err_msg="metric != lsm∘rsm")
    lhs = vdot(lh.left_sqrt_metric(p, u), t)
    rhs = vdot(u, lh.right_sqrt_metric(p, t))
    np.testing.assert_allclose(
        np.asarray(lhs.real), np.asarray(rhs.real), rtol=1e-7,
        err_msg="lsm/rsm not adjoint",
    )
    # metric is symmetric PSD on a random pair
    s = _rand(key, lh.domain)
    sym1 = vdot(s, lh.metric(p, t))
    sym2 = vdot(t, lh.metric(p, s))
    np.testing.assert_allclose(
        np.asarray(sym1.real), np.asarray(sym2.real), rtol=1e-7,
        err_msg="metric not symmetric",
    )
    quad = vdot(t, lh.metric(p, t)).real
    assert float(quad) >= -atol, "metric not PSD"
    return True
