"""HMC/NUTS sampler tests (ref model: ``test/test_re/test_hmc.py`` — moment
recovery on Gaussian targets — and ``test_hmc_hashes.py`` — determinism)."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu.hmc as hmc
import nifty_tpu.hmc_oo as hmc_oo


def _gauss_potential(cov_diag):
    def pe(x):
        return 0.5 * jnp.sum(x ** 2 / cov_diag)

    return pe


def test_leapfrog_energy_conservation():
    pe = _gauss_potential(jnp.ones(4))
    qp = hmc.QP(position=jnp.ones(4), momentum=0.5 * jnp.ones(4))
    inv_m = jnp.ones(4)
    ke = lambda m: hmc._kinetic_energy(inv_m, m)
    e0 = hmc.total_energy_of_qp(qp, pe, ke)
    step = lambda q: hmc.leapfrog_step(
        jax.grad(pe), hmc._kinetic_energy_gradient, 0.01, inv_m, q
    )
    for _ in range(100):
        qp = step(qp)
    e1 = hmc.total_energy_of_qp(qp, pe, ke)
    assert abs(float(e1 - e0)) < 1e-3


def test_leapfrog_reversibility():
    pe = _gauss_potential(jnp.asarray([1.0, 4.0, 0.25]))
    inv_m = jnp.ones(3)
    qp = hmc.QP(position=jnp.asarray([1.0, -0.5, 0.3]),
                momentum=jnp.asarray([0.2, 0.1, -0.7]))
    step = lambda q, eps: hmc.leapfrog_step(
        jax.grad(pe), hmc._kinetic_energy_gradient, eps, inv_m, q
    )
    fwd = step(step(qp, 0.1), 0.1)
    back = step(step(hmc.flip_momentum(fwd), 0.1), 0.1)
    back = hmc.flip_momentum(back)
    np.testing.assert_allclose(back.position, qp.position, atol=1e-12)
    np.testing.assert_allclose(back.momentum, qp.momentum, atol=1e-12)


@pytest.mark.parametrize("sampler_cls,kwargs,inv_mass", [
    # HMC with the exact covariance as (inverse) mass matrix: ideal
    # preconditioning, so moment recovery isolates sampler correctness.
    # trajectory length ~pi/2 in whitened units (L*eps=1.5): near-
    # optimal rotation; L*eps~2pi would alias back to the start.
    (hmc_oo.HMCChain, dict(num_steps=5, step_size=0.3), "cov"),
    # NUTS adapts its trajectory length; unit mass suffices.
    (hmc_oo.NUTSChain, dict(step_size=0.3, max_tree_depth=8), 1.0),
])
def test_chain_recovers_gaussian_moments(sampler_cls, kwargs, inv_mass):
    cov = jnp.asarray([1.0, 4.0, 0.25, 2.0])
    pe = _gauss_potential(cov)
    proto = jnp.zeros(4)
    chain_o = sampler_cls(
        potential_energy=pe,
        inverse_mass_matrix=cov if inv_mass == "cov" else inv_mass,
        position_proto=proto,
        **kwargs,
    )
    chain, _ = jax.jit(
        lambda k, p: chain_o.generate_n_samples(k, p, 3000)
    )(jax.random.PRNGKey(0), jnp.ones(4))
    smpls = np.asarray(chain.samples)[500:]
    np.testing.assert_allclose(smpls.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(smpls.var(0), np.asarray(cov), rtol=0.25)
    assert not np.any(np.asarray(chain.divergences))
    # acceptance is a per-transition probability (NUTS: the tree's summed
    # Metropolis statistic normalized by its 2^depth - 1 proposals,
    # reference src/re/hmc_oo.py:237-240) — must lie in [0, 1]
    acc = np.asarray(chain.acceptance)
    assert np.all(acc >= 0.0) and np.all(acc <= 1.0)
    assert acc.mean() > 0.5  # well-tuned chain on a Gaussian


def test_chain_tree_position(rng):
    """Chains work on pytree positions."""
    pe = lambda p: 0.5 * (jnp.sum(p["a"] ** 2) + jnp.sum(p["b"] ** 2 / 4.0))
    proto = {"a": jnp.zeros(3), "b": jnp.zeros(2)}
    chain_o = hmc_oo.NUTSChain(
        potential_energy=pe, inverse_mass_matrix=1.0, position_proto=proto,
        step_size=0.4, max_tree_depth=6,
    )
    chain, (_, last) = chain_o.generate_n_samples(
        jax.random.PRNGKey(1), proto, 800
    )
    assert chain.samples["a"].shape == (800, 3)
    v_b = np.asarray(chain.samples["b"])[200:].var(0)
    np.testing.assert_allclose(v_b, 4.0 * np.ones(2), rtol=0.35)


def test_chain_deterministic():
    """Same key -> bitwise identical trajectories (determinism pin,
    analog of the reference's Blake2b trajectory hashes)."""
    pe = _gauss_potential(jnp.asarray([1.0, 2.0]))
    chain_o = hmc_oo.NUTSChain(
        potential_energy=pe, inverse_mass_matrix=1.0,
        position_proto=jnp.zeros(2), step_size=0.5, max_tree_depth=6,
    )
    c1, _ = chain_o.generate_n_samples(jax.random.PRNGKey(5), jnp.zeros(2), 100)
    c2, _ = chain_o.generate_n_samples(jax.random.PRNGKey(5), jnp.zeros(2), 100)
    h1 = hashlib.blake2b(np.asarray(c1.samples).tobytes()).hexdigest()
    h2 = hashlib.blake2b(np.asarray(c2.samples).tobytes()).hexdigest()
    assert h1 == h2


def test_trajectory_hashes_pinned():
    """Blake2b hashes of NUTS/HMC trajectories pinned across commits —
    silent numeric drift between rounds fails here (analog of the
    reference's ``test/test_re/test_hmc_hashes.py:31-45``).  Pins are for
    the suite's CPU/x64 configuration."""

    def pe(q):
        return 0.5 * jnp.sum((q / jnp.asarray([1.0, 2.0])) ** 2)

    nuts = hmc_oo.NUTSChain(
        potential_energy=pe, inverse_mass_matrix=1.0,
        position_proto=jnp.zeros(2), step_size=0.5, max_tree_depth=6,
    )
    c, _ = nuts.generate_n_samples(jax.random.PRNGKey(5), jnp.zeros(2), 100)
    h = hashlib.blake2b(np.asarray(c.samples).tobytes()).hexdigest()[:32]
    assert h == "032508a9fb3043d46746cac421a0cd32", f"NUTS drifted: {h}"

    hmcc = hmc_oo.HMCChain(
        potential_energy=pe, inverse_mass_matrix=1.0,
        position_proto=jnp.zeros(2), step_size=0.3, num_steps=8,
    )
    c2, _ = hmcc.generate_n_samples(jax.random.PRNGKey(7), jnp.zeros(2), 100)
    h2 = hashlib.blake2b(np.asarray(c2.samples).tobytes()).hexdigest()[:32]
    assert h2 == "1f6e391c2b8b41dc92207e52c8b87767", f"HMC drifted: {h2}"


def test_hmc_acc_rej_statistics():
    """Acceptance should be high for small steps on a Gaussian."""
    pe = _gauss_potential(jnp.ones(3))
    accepted = []
    key = jax.random.PRNGKey(2)
    pos = jnp.zeros(3)
    for i in range(50):
        key, k1, k2 = jax.random.split(key, 3)
        mom = hmc.sample_momentum_from_diagonal(
            key=k1, mass_matrix_sqrt=jnp.ones(3)
        )
        out = hmc.generate_hmc_acc_rej(
            key=k2,
            initial_qp=hmc.QP(position=pos, momentum=mom),
            potential_energy=pe,
            potential_energy_gradient=jax.grad(pe),
            inverse_mass_matrix=jnp.ones(3),
            step_size=0.1,
            num_steps=10,
        )
        accepted.append(bool(out.accepted))
        pos = out.accepted_qp.position
    assert np.mean(accepted) > 0.9


def test_nuts_vs_vi_crosscheck():
    """NUTS and linear-VI agree on the posterior mean of a small
    correlated-field problem (the BASELINE cross-check, scaled down)."""
    import nifty_tpu as jft
    from nifty_tpu.optimize_kl import _StandardHamiltonian

    key = jax.random.PRNGKey(3)
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations((8, 8), 1 / 8, (1.0, 0.3), (-2.0, 0.2))
    cf = cfm.finalize()
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    truth = cf(cf.init(k1))
    noise = 0.3
    data = truth + noise * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, lambda x: x / noise ** 2).amend(cf)

    samples, _ = jft.optimize_kl(
        lh, jft.random_like(k3, lh.domain), key=k4,
        n_total_iterations=4, n_samples=3,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-10, maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-9, maxiter=20)),
        sample_mode="linear_resample",
    )
    vi_mean = jft.mean([cf(s) for s in samples])

    ham = _StandardHamiltonian(lh)
    chain = jft.NUTSChain(
        potential_energy=lambda q: ham(q), inverse_mass_matrix=1.0,
        position_proto=samples.pos, step_size=0.3, max_tree_depth=7,
    )
    out, _ = chain.generate_n_samples(k5, samples.pos, 400)
    nuts_mean = jnp.mean(jax.vmap(cf)(
        jax.tree_util.tree_map(lambda a: a[100:], out.samples)
    ), axis=0)
    rms = float(jnp.sqrt(jnp.mean((vi_mean - nuts_mean) ** 2)))
    assert rms < noise, rms
