"""In-jit observability: PyTreeString pass-through, name-tagged CG/NCG
per-iteration progress from inside traced loops (rate-limited), and the
driver's transitions/inspect_callback hooks.

Parity models: ``src/re/tree_math/pytree_string.py:48,83``,
``src/re/conjugate_gradient.py:54``,
``src/minimization/optimize_kl.py:123-151``.
"""

import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft
from nifty_tpu.solvers.cg import _static_cg
from nifty_tpu.solvers.newton_cg import _newton_cg


def test_pytree_string_is_zero_leaf_pytree():
    s = jft.PyTreeString("cg_name")
    leaves, treedef = jax.tree_util.tree_flatten(s)
    assert leaves == []
    s2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert s2 == s and str(s2) == "cg_name"
    assert s + "!" == "cg_name!"
    assert "<" + s == "<cg_name"


def test_hide_strings_through_jit():
    cfg = jft.hide_strings({"name": "solver-A", "x": jnp.ones(3)})

    @jax.jit
    def f(cfg):
        # the string rides through jit as static aux data
        assert str(cfg["name"]) == "solver-A"
        return cfg["x"] * 2

    np.testing.assert_allclose(f(cfg), 2.0)
    assert str(jft.unhide_strings(cfg)["name"]) == "solver-A"


def _quadratic_setup(n=16, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    A = jnp.asarray(a @ a.T + n * np.eye(n))
    j = jnp.asarray(rng.normal(size=n))
    return A, j


def test_named_cg_prints_from_jit(capfd):
    A, j = _quadratic_setup()
    x, info = jax.jit(
        lambda j: jft.static_cg(
            lambda t: A @ t, j, name=jft.PyTreeString("TAGCG"),
            maxiter=8, miniter=8, resnorm=1e-30,
        )
    )(j)
    jax.block_until_ready(x)
    jax.effects_barrier()
    out = capfd.readouterr()
    text = out.out + out.err
    assert text.count("TAGCG: CG it") >= 8


def test_named_cg_rate_limited(capfd):
    A, j = _quadratic_setup()
    res = _static_cg(
        lambda t: A @ t, j, name="RLCG", print_every=4,
        maxiter=8, miniter=8, resnorm=1e-30,
    )
    jax.block_until_ready(res.x)
    jax.effects_barrier()
    text = capfd.readouterr().out + capfd.readouterr().err
    n_lines = text.count("RLCG: CG it")
    assert 1 <= n_lines <= 3  # every 4th of ~8 iterations


def test_named_ncg_prints(capfd):
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    res = _newton_cg(rosen, jnp.zeros(5), name=jft.PyTreeString("TAGN"),
                     maxiter=5)
    jax.block_until_ready(res.x)
    jax.effects_barrier()
    text = capfd.readouterr().out
    assert "TAGN: NCG it" in text
    assert "TAGNCG: CG it" in text  # inner CG inherits the tag


def test_driver_transitions_and_inspect(tmp_path, rng, key):
    lh = jft.Gaussian(
        jnp.zeros(4), noise_cov_inv=lambda x: x
    ).amend(jft.Model(lambda p: p["x"], domain={"x": jft.ShapeWithDtype((4,))}))
    seen = []

    def transitions(i):
        if i == 1:
            return lambda s: jft.Samples(
                pos=jax.tree_util.tree_map(lambda x: 0.5 * x, s.pos),
                samples=s._samples, keys=s.keys,
            )
        return None

    def inspect(samples, i):
        seen.append((i, float(jft.tree.vdot(samples.pos, samples.pos).real)))

    samples, state = jft.optimize_kl(
        lh, {"x": jnp.ones(4)}, key=key, n_total_iterations=3,
        n_samples=2, sample_mode="linear_resample",
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=10)),
        kl_kwargs=dict(minimize_kwargs=dict(maxiter=2)),
        transitions=transitions, inspect_callback=inspect,
        odir=str(tmp_path),
    )
    assert [i for i, _ in seen] == [1, 2, 3]
    assert int(state.nit) == 3
