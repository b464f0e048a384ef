"""Solver tests (ref model: ``test/test_minimizers.py``,
``test/test_re/test_ncg.py`` — quadratics + Rosenbrock across solvers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pmp = pytest.mark.parametrize

import nifty_tpu as jft
from nifty_tpu.solvers.cg import _static_cg, static_cg
from nifty_tpu.solvers.newton_cg import _newton_cg, minimize, newton_cg


def _spd(rng, n=24, cond=50.0):
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    ev = np.geomspace(1.0, cond, n)
    return q @ np.diag(ev) @ q.T


def test_cg_solves_spd(rng):
    A = _spd(rng)
    b = rng.normal(size=A.shape[0])
    x, info = static_cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                        resnorm=1e-12, maxiter=500)
    assert int(info) == 0
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-8, atol=1e-8)


def test_cg_absdelta_stopping(rng):
    A = _spd(rng)
    b = rng.normal(size=A.shape[0])
    res = _static_cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                     absdelta=1e-14, maxiter=500)
    assert int(res.info) == 0
    np.testing.assert_allclose(res.x, np.linalg.solve(A, b), rtol=1e-5, atol=1e-5)


def test_cg_tree_domain(rng):
    A1, A2 = _spd(rng, 10), _spd(rng, 7)
    b = {"x": jnp.asarray(rng.normal(size=10)), "y": jnp.asarray(rng.normal(size=7))}

    def mat(v):
        return {"x": jnp.asarray(A1) @ v["x"], "y": jnp.asarray(A2) @ v["y"]}

    res = _static_cg(mat, b, resnorm=1e-12, maxiter=500)
    np.testing.assert_allclose(res.x["x"], np.linalg.solve(A1, b["x"]), rtol=1e-7)
    np.testing.assert_allclose(res.x["y"], np.linalg.solve(A2, b["y"]), rtol=1e-7)


def test_cg_preconditioner_accelerates(rng):
    A = _spd(rng, cond=1e4)
    b = rng.normal(size=A.shape[0])
    D_inv = 1.0 / np.diag(A)
    res0 = _static_cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                      resnorm=1e-10, maxiter=1000)
    res1 = _static_cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                      resnorm=1e-10, maxiter=1000,
                      preconditioner=lambda r: jnp.asarray(D_inv) * r)
    np.testing.assert_allclose(res1.x, np.linalg.solve(A, b), rtol=1e-6, atol=1e-6)
    assert int(res1.nit) <= int(res0.nit) + 5


def test_cg_under_jit_and_vmap(rng):
    A = _spd(rng, 12)
    bs = jnp.asarray(rng.normal(size=(4, 12)))

    def solve(b):
        return _static_cg(lambda x: jnp.asarray(A) @ x, b, resnorm=1e-11,
                          maxiter=200).x

    xs = jax.jit(jax.vmap(solve))(bs)
    expected = np.linalg.solve(A, np.asarray(bs).T).T
    np.testing.assert_allclose(xs, expected, rtol=1e-6, atol=1e-7)


def _rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


@pytest.mark.parametrize("start", [0.0, 0.5, -0.3, 2.0])
def test_ncg_rosenbrock(start):
    res = _newton_cg(_rosen, start * jnp.ones(6), maxiter=300, absdelta=1e-14)
    assert int(res.status) == 0
    np.testing.assert_allclose(res.x, jnp.ones(6), rtol=1e-5, atol=1e-5)


def test_ncg_quadratic_exact(rng):
    A = _spd(rng, 15)
    b = rng.normal(size=15)

    def quad(x):
        return 0.5 * x @ (jnp.asarray(A) @ x) - x @ jnp.asarray(b)

    res = _newton_cg(quad, jnp.zeros(15), maxiter=50, absdelta=1e-15, xtol=1e-10)
    np.testing.assert_allclose(res.x, np.linalg.solve(A, b), rtol=1e-6, atol=1e-7)


def test_ncg_fun_and_grad_hessp(rng):
    A = _spd(rng, 9)
    b = rng.normal(size=9)

    def fg(x):
        return (0.5 * x @ (jnp.asarray(A) @ x) - x @ jnp.asarray(b),
                jnp.asarray(A) @ x - jnp.asarray(b))

    res = _newton_cg(None, jnp.zeros(9), fun_and_grad=fg,
                     hessp=lambda x, t: jnp.asarray(A) @ t,
                     maxiter=50, absdelta=1e-15, xtol=1e-10)
    np.testing.assert_allclose(res.x, np.linalg.solve(A, b), rtol=1e-6, atol=1e-7)


def test_ncg_jit_vmap():
    xs = jnp.stack([jnp.zeros(6), 0.5 * jnp.ones(6), -0.3 * jnp.ones(6)])
    sol = jax.jit(jax.vmap(
        lambda x0: _newton_cg(_rosen, x0, maxiter=300, absdelta=1e-14).x
    ))(xs)
    np.testing.assert_allclose(sol, np.ones((3, 6)), rtol=1e-5, atol=1e-5)


def test_ncg_tree_domain(rng):
    def f(p):
        return _rosen(p["x"]) + jnp.sum((p["y"] - 3.0) ** 2)

    x0 = {"x": jnp.zeros(4), "y": jnp.zeros(3)}
    res = _newton_cg(f, x0, maxiter=300, absdelta=1e-14, xtol=1e-9)
    # the line search may abort in the last ulp-scale steps (status -1,
    # matching the reference's "energy would increase" abort) — the
    # minimizer must still be at the optimum to ~1e-3
    np.testing.assert_allclose(res.x["x"], np.ones(4), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res.x["y"], 3 * np.ones(3), rtol=1e-6)


def test_minimize_dispatch():
    res = minimize(_rosen, jnp.zeros(5), method="newton-cg",
                   options=dict(maxiter=300, absdelta=1e-14))
    np.testing.assert_allclose(res.x, np.ones(5), rtol=1e-5, atol=1e-5)


def test_newton_cg_wrapper():
    x = newton_cg(_rosen, jnp.zeros(5), maxiter=300, absdelta=1e-14)
    np.testing.assert_allclose(x, np.ones(5), rtol=1e-5, atol=1e-5)


def test_lbfgs_rosenbrock():
    from nifty_tpu.solvers.lbfgs import _lbfgs

    res = _lbfgs(_rosen, jnp.zeros(6), maxiter=500, gtol=1e-9)
    assert int(res.status) == 0
    np.testing.assert_allclose(res.x, np.ones(6), rtol=1e-6, atol=1e-6)


def test_lbfgs_tree_and_vmap():
    from nifty_tpu.solvers.lbfgs import _lbfgs

    def f(p):
        return _rosen(p["x"]) + jnp.sum((p["y"] - 3.0) ** 2)

    res = _lbfgs(f, {"x": jnp.zeros(4), "y": jnp.zeros(3)},
                 maxiter=500, gtol=1e-9)
    np.testing.assert_allclose(res.x["x"], np.ones(4), atol=1e-6)
    xs = jnp.stack([jnp.zeros(6), 2.0 * jnp.ones(6)])
    sol = jax.jit(jax.vmap(
        lambda x: _lbfgs(_rosen, x, maxiter=500, gtol=1e-9).x
    ))(xs)
    np.testing.assert_allclose(sol, np.ones((2, 6)), atol=1e-6)


def test_minimize_lbfgs_dispatch():
    res = minimize(_rosen, jnp.zeros(5), method="l-bfgs",
                   options=dict(maxiter=500, gtol=1e-9))
    np.testing.assert_allclose(res.x, np.ones(5), atol=1e-6)


@pmp("method", ["nonlinear-cg", "steepest-descent", "vl-bfgs"])
def test_first_order_methods_quadratic(method):
    """New descent methods reach the exact minimum of a convex quadratic."""
    rng = np.random.default_rng(11)
    a = rng.standard_normal((8, 8))
    A = a @ a.T + 8 * np.eye(8)
    b = rng.standard_normal(8)
    xstar = np.linalg.solve(A, b)

    def fun(x):
        return 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x

    res = jft.minimize(fun, jnp.zeros(8), method=method,
                       options={"maxiter": 500, "gtol": 1e-7})
    assert res.success
    np.testing.assert_allclose(res.x, xstar, rtol=1e-5, atol=1e-6)


@pmp("method", ["nonlinear-cg", "vl-bfgs"])
def test_first_order_methods_rosenbrock(method):
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    res = jft.minimize(rosen, jnp.full(4, -0.5), method=method,
                       options={"maxiter": 5000, "gtol": 1e-6})
    np.testing.assert_allclose(res.x, np.ones(4), rtol=1e-4)


def test_vlbfgs_matches_lbfgs_direction():
    """VL-BFGS's Gram-matrix recursion reproduces L-BFGS trajectories."""
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    x0 = jnp.full(6, -0.3)
    r1 = jft.minimize(rosen, x0, method="l-bfgs",
                      options={"maxiter": 60, "gtol": 0.0, "m": 6})
    r2 = jft.minimize(rosen, x0, method="vl-bfgs",
                      options={"maxiter": 60, "gtol": 0.0, "m": 6})
    # identical math; allow only tiny float-order divergence
    np.testing.assert_allclose(r2.fun, r1.fun, rtol=1e-3)


def test_descent_methods_vmap():
    """Batched lockstep minimization, matching per-item runs."""
    def fun(x):
        return jnp.sum((x - jnp.arange(3, dtype=x.dtype)) ** 4 + x ** 2)

    x0s = jnp.stack([jnp.zeros(3), jnp.ones(3), -jnp.ones(3)])
    batched = jax.vmap(
        lambda x0: jft.minimize(fun, x0, method="nonlinear-cg",
                                options={"maxiter": 200, "gtol": 1e-10}).x
    )(x0s)
    single = jnp.stack([
        jft.minimize(fun, x0, method="nonlinear-cg",
                     options={"maxiter": 200, "gtol": 1e-10}).x
        for x0 in x0s
    ])
    np.testing.assert_allclose(batched, single, atol=1e-10)


def test_cg_nonposdef_graceful_by_default():
    """A non-positive-definite operator terminates CG gracefully (partial
    solution, info==0) so Newton-CG can keep using the descent direction."""
    x, info = static_cg(lambda x: -x, jnp.ones(8), maxiter=10)
    assert int(info) == 0
    assert np.all(np.isfinite(np.asarray(x)))


def test_cg_raise_nonposdef_signals_failure():
    """`_raise_nonposdef=True` turns the breakdown into a visible error,
    raised from inside jit via a host callback (parity:
    reference `_cond_raise`, src/re/evi.py:39-56)."""
    run = jax.jit(
        lambda j: static_cg(lambda x: -x, j, maxiter=10, _raise_nonposdef=True)
    )
    with pytest.raises(Exception, match="broke down"):
        x, info = run(jnp.ones(8))
        jax.block_until_ready(x)


def test_optimize_vi_surfaces_sampling_failure():
    """The driver's host-boundary check raises when the metric CG reports
    breakdown (the raise path for backends without host callbacks)."""
    from nifty_tpu.optimize_kl import _check_sampling_status

    with pytest.raises(FloatingPointError, match="metric CG failed"):
        _check_sampling_status(
            jnp.asarray([-1, 0]), dict(_raise_nonposdef=True)
        )
    # no flag -> no raise
    _check_sampling_status(jnp.asarray([-1, 0]), dict())
    # healthy status -> no raise
    _check_sampling_status(jnp.asarray([0, 0]), dict(_raise_nonposdef=True))


def test_scipy_bridge_lbfgsb_quadratic_and_rosenbrock():
    """Host-side scipy L-BFGS-B bridge (parity:
    /root/reference/src/minimization/scipy_minimizer.py:134) matches the
    native solvers on the standard test problems, over a pytree domain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nifty_tpu.solvers import minimize, minimize_scipy

    # quadratic over a pytree
    def quad(x):
        return (
            jnp.sum((x["a"] - 1.5) ** 2)
            + jnp.sum(3.0 * (x["b"] + 0.5) ** 2)
        )

    x0 = {"a": jnp.zeros((4,)), "b": jnp.zeros((3, 2))}
    res = minimize_scipy(quad, x0)
    assert res.success
    np.testing.assert_allclose(np.asarray(res.x["a"]), 1.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x["b"]), -0.5, atol=1e-6)

    # rosenbrock via the `minimize` dispatch
    def rosen(x):
        return jnp.sum(
            100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
        )

    r = minimize(rosen, jnp.zeros((5,)), method="scipy:L-BFGS-B",
                 options=dict(maxiter=500))
    np.testing.assert_allclose(np.asarray(r.x), 1.0, atol=1e-4)

    # bounds keep the iterate inside the box
    rb = minimize_scipy(rosen, jnp.zeros((5,)), bounds=(-0.5, 0.5))
    assert float(jnp.max(jnp.abs(rb.x))) <= 0.5 + 1e-12
