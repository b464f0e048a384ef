"""End-to-end VI driver tests (ref model: ``test/test_re/test_optimize_kl.py``
— full OptimizeVI runs over sample modes and point estimates)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft

pmp = pytest.mark.parametrize


def _small_problem(key, dims=(16, 16), noise_std=0.1):
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(dims, distances=1.0 / dims[0], fluctuations=(1.0, 0.5),
                         loglogavgslope=(-3.0, 0.2))
    cf = cfm.finalize()
    k1, k2 = jax.random.split(key)
    truth_pos = cf.init(k1)
    truth = cf(truth_pos)
    data = truth + noise_std * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / noise_std ** 2).amend(cf)
    return lh, cf, truth, noise_std


@pmp("sample_mode", ["linear_resample", "nonlinear_resample"])
def test_optimize_kl_recovers_truth(key, sample_mode, tmp_path):
    lh, cf, truth, noise_std = _small_problem(key)
    ki, ko = jax.random.split(jax.random.PRNGKey(12))
    init = jft.random_like(ki, lh.domain)
    samples, state = jft.optimize_kl(
        lh, init, key=ko, n_total_iterations=4, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-9, maxiter=60)),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-3, maxiter=3)
        ),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=15)),
        sample_mode=sample_mode,
        odir=str(tmp_path),
    )
    pm = jft.mean([cf(s) for s in samples])
    rms = float(jnp.sqrt(jnp.mean((pm - truth) ** 2)))
    assert rms < 2 * noise_std, rms
    stats, _ = jft.minisanity(samples, lh.normalized_residual)
    rchisq = float(stats.reduced_chisq[0])
    assert 0.5 < rchisq < 2.0, rchisq
    assert state.nit == 4
    assert os.path.isfile(os.path.join(tmp_path, "last.pkl"))
    assert os.path.isfile(os.path.join(tmp_path, "minisanity.txt"))


def test_optimize_kl_resume(key, tmp_path):
    lh, cf, truth, noise_std = _small_problem(key)
    ki, ko = jax.random.split(jax.random.PRNGKey(5))
    init = jft.random_like(ki, lh.domain)
    common = dict(
        key=ko, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-9, maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=15)),
        sample_mode="linear_resample", odir=str(tmp_path),
    )
    s1, st1 = jft.optimize_kl(lh, init, n_total_iterations=2, **common)
    # resume from checkpoint and continue to 4
    s2, st2 = jft.optimize_kl(lh, None, n_total_iterations=4, resume=True,
                              **common)
    assert st2.nit == 4
    # a fresh full 4-iteration run from the same key must agree closely
    s3, st3 = jft.optimize_kl(lh, init, n_total_iterations=4, **{
        **common, "odir": str(tmp_path) + "_b"
    })
    np.testing.assert_allclose(
        np.asarray(s2.pos["cfxi"]), np.asarray(s3.pos["cfxi"]), atol=1e-5
    )


def test_optimize_kl_map_only(key):
    lh, cf, truth, noise_std = _small_problem(key)
    ki, ko = jax.random.split(jax.random.PRNGKey(7))
    init = jft.random_like(ki, lh.domain)
    samples, state = jft.optimize_kl(
        lh, init, key=ko, n_total_iterations=3, n_samples=0,
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-10, maxiter=30)),
        sample_mode="linear_resample",
    )
    assert len(samples) == 0
    # MAP should fit the data well
    pm = cf(samples.pos)
    rms = float(jnp.sqrt(jnp.mean((pm - truth) ** 2)))
    assert rms < 2 * noise_std


def test_optimize_kl_schedules(key):
    """n_samples / sample_mode may be callables of the iteration index."""
    lh, cf, truth, noise_std = _small_problem(key)
    ki, ko = jax.random.split(jax.random.PRNGKey(9))
    init = jft.random_like(ki, lh.domain)
    samples, state = jft.optimize_kl(
        lh, init, key=ko, n_total_iterations=3,
        n_samples=lambda i: 2 if i >= 1 else 0,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-9, maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=15)),
        sample_mode=lambda i: "linear_resample",
    )
    assert len(samples) == 4  # 2 antithetic pairs


def test_vi_point_estimates(key):
    lh, cf, truth, noise_std = _small_problem(key)
    ki, ko = jax.random.split(jax.random.PRNGKey(11))
    init = jft.random_like(ki, lh.domain)
    samples, state = jft.optimize_kl(
        lh, init, key=ko, n_total_iterations=2, n_samples=2,
        point_estimates=("cfzeromode",),
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-9, maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=15)),
        sample_mode="linear_resample",
    )
    # the point-estimated parameter has zero residual in all samples
    res = np.asarray(samples._samples["cfzeromode"])
    assert np.all(res == 0.0)


def test_adjust_variances_invariance(key):
    from nifty_tpu.models.correlated_field import adjust_variances

    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.3, offset_std=(1.0, 0.3))
    cfm.add_fluctuations((16, 16), 1 / 16, (1.0, 0.5), (-2.0, 0.5))
    cf = cfm.finalize()
    p = dict(cf.init(key))
    p["cfxi"] = p["cfxi"] * 2.7
    p2 = adjust_variances(p, cfm)
    np.testing.assert_allclose(np.asarray(cf(p)), np.asarray(cf(p2)),
                               atol=1e-12)
    assert abs(float(jnp.sqrt(jnp.mean(p2["cfxi"] ** 2))) - 1.0) < 0.1


def test_batched_correlated_field(key):
    cfm = jft.CorrelatedFieldMaker("b")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 1e-2))
    cfm.add_fluctuations((8, 8), 1 / 8, (1.0, 0.5), (-2.0, 0.5))
    cf = cfm.finalize(total_N=3, dofdex=[0, 0, 1])
    assert cf.domain["bxi"].shape == (3, 8, 8)
    assert cf.domain["bzeromode"].shape == (2,)
    out = cf(cf.init(key))
    assert out.shape == (3, 8, 8)
    # entries 0 and 1 share parameters but have different excitations
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_dynamics_models(key):
    from nifty_tpu.models import dynamic_lightcone_operator, dynamic_operator
    from nifty_tpu.ops.harmonic import hartley

    m, aux = dynamic_operator(shape=(32, 16), distances=(0.1, 0.2),
                              sm_s0=1.0, sm_x0=0.5, key="dyn",
                              harmonic_padding=8)
    G = m(m.init(key))
    assert G.shape == (32, 16) and bool(jnp.all(jnp.isfinite(G)))
    # causality: the time-domain kernel vanishes for t < 0
    g = np.asarray(hartley(G)) / G.size
    assert np.abs(g[17:]).max() < 1e-12 * np.abs(g).max() + 1e-14

    m2, aux2 = dynamic_lightcone_operator(
        shape=(32, 16), distances=(0.1, 0.2), sm_s0=1.0, sm_x0=0.5,
        key="d", lightcone_key="c", sigc=1.0, quant=2.0,
    )
    p2 = m2.init(jax.random.PRNGKey(1))
    g2 = jax.grad(lambda q: jnp.sum(m2(q) ** 2))(p2)
    assert bool(jnp.all(jnp.isfinite(g2["c"])))
    assert "lightspeed" in aux2


def test_nonlinear_update_mode(key):
    """'nonlinear_update' re-curves existing samples without redrawing."""
    lh, cf, truth, noise_std = _small_problem(key)
    ki, ko = jax.random.split(jax.random.PRNGKey(21))
    init = jft.random_like(ki, lh.domain)
    opt = jft.OptimizeVI(lh, n_total_iterations=3)
    state = opt.init_state(
        ko, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-8, maxiter=40)),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-3, maxiter=2)
        ),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=10)),
        sample_mode=lambda i: "nonlinear_resample" if i == 0
        else "nonlinear_update",
    )
    samples = jft.Samples(pos=init, samples=None, keys=None)
    samples, state = opt.update(samples, state)
    keys_after_first = samples.keys
    samples, state = opt.update(samples, state)
    # keys unchanged -> no resampling happened in the update-only step
    np.testing.assert_array_equal(
        np.asarray(samples.keys), np.asarray(keys_after_first)
    )
    assert len(samples) == 4


def test_point_estimates_boolean_tree(key):
    """point_estimates may be a boolean pytree congruent with primals."""
    lh, cf, truth, noise_std = _small_problem(key)
    init = jft.random_like(jax.random.PRNGKey(3), lh.domain)
    pe = {k: k == "cfzeromode" for k in init}
    from nifty_tpu.evi import draw_linear_residual

    smpl, _ = draw_linear_residual(
        lh, init, jax.random.PRNGKey(4), point_estimates=pe,
        cg_kwargs=dict(absdelta=1e-8, maxiter=40),
    )
    assert float(jnp.abs(smpl["cfzeromode"])) == 0.0
    assert np.any(np.asarray(smpl["cfxi"]) != 0.0)


@pmp("residual_map", ["smap", "lmap"])
def test_residual_map_variants(key, residual_map):
    """Memory-frugal sequential sample maps produce the same results as
    vmap (the reference's smap/lmap memory knob)."""
    lh, cf, truth, noise_std = _small_problem(key, dims=(8, 8))
    ki, ko = jax.random.split(jax.random.PRNGKey(31))
    init = jft.random_like(ki, lh.domain)
    common = dict(
        key=ko, n_total_iterations=2, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-10, maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-9, maxiter=10)),
        sample_mode="linear_resample",
    )
    s_v, _ = jft.optimize_kl(lh, init, residual_map="vmap", **common)
    s_m, _ = jft.optimize_kl(lh, init, residual_map=residual_map, **common)
    np.testing.assert_allclose(
        np.asarray(s_v.pos["cfxi"]), np.asarray(s_m.pos["cfxi"]),
        rtol=1e-5, atol=1e-6,
    )


def test_fused_update_matches_staged(key):
    """The single-program fused update must reproduce the staged path
    (same RNG keys).  The linear path is compared strictly (fp-scheduling
    noise only); the nonlinear (geoVI) path crosses data-dependent solver
    stopping branches whose inputs differ at the fp-fusion level between
    the two program layouts, so it is compared at the statistical
    (posterior-scale) level."""
    import bench as B

    def run(fused, sample_mode, nl_maxiter):
        lh, _ = B._build(jft, (16, 16))
        opt = jft.OptimizeVI(lh, n_total_iterations=5, residual_map="vmap")
        state = opt.init_state(
            jax.random.PRNGKey(7),
            n_samples=2,
            draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=20)),
            nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
                xtol=1e-3, maxiter=nl_maxiter, cg_kwargs=dict(maxiter=10))),
            kl_kwargs=dict(minimize_kwargs=dict(
                xtol=1e-4, maxiter=5, cg_kwargs=dict(maxiter=15))),
            sample_mode=sample_mode,
        )
        samples = jft.Samples(
            pos=jft.random_like(jax.random.PRNGKey(1), lh.domain),
            samples=None, keys=None,
        )
        samples, state = opt.update(samples, state, fused=fused)
        return samples, state

    # linear path: strict agreement
    s_f, st_f = run(True, "linear_resample", 0)
    s_s, st_s = run(False, "linear_resample", 0)
    assert np.all(np.asarray(s_f.keys) == np.asarray(s_s.keys))
    for a, b in zip(jax.tree_util.tree_leaves(s_f.samples),
                    jax.tree_util.tree_leaves(s_s.samples)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        float(st_f.minimization_state.fun),
        float(st_s.minimization_state.fun), rtol=1e-8,
    )

    # nonlinear path: statistical agreement (branch-chaos bounded)
    s_f, st_f = run(True, "nonlinear_resample", 3)
    s_s, st_s = run(False, "nonlinear_resample", 3)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.samples),
                    jax.tree_util.tree_leaves(s_s.samples)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(
        float(st_f.minimization_state.fun),
        float(st_s.minimization_state.fun), rtol=5e-4,
    )


def test_fused_update_map_path(key):
    """MAP (n_samples=0) through the fused program."""
    import bench as B

    lh, _ = B._build(jft, (16, 16))
    opt = jft.OptimizeVI(lh, n_total_iterations=5, residual_map="vmap")
    state = opt.init_state(
        jax.random.PRNGKey(7), n_samples=0,
        kl_kwargs=dict(minimize_kwargs=dict(maxiter=5)),
        sample_mode="nonlinear_resample",
    )
    samples = jft.Samples(
        pos=jft.random_like(jax.random.PRNGKey(1), lh.domain),
        samples=None, keys=None,
    )
    samples, state = opt.update(samples, state)
    assert len(samples) == 0
    assert np.isfinite(float(state.minimization_state.fun))


def test_optimize_kl_orbax_checkpoint_roundtrip(key, tmp_path):
    """Resume through the orbax/tensorstore array checkpoint (the
    multi-host-safe format): continuation matches an uninterrupted run."""
    pytest.importorskip("orbax.checkpoint")
    lh, cf, truth, noise_std = _small_problem(key)
    ki, ko = jax.random.split(jax.random.PRNGKey(9))
    init = jft.random_like(ki, lh.domain)
    common = dict(
        key=ko, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-9, maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=15)),
        sample_mode="linear_resample", checkpoint_format="orbax",
        odir=str(tmp_path),
    )
    s1, st1 = jft.optimize_kl(lh, init, n_total_iterations=2, **common)
    assert os.path.isdir(os.path.join(tmp_path, "last_ckpt"))
    s2, st2 = jft.optimize_kl(lh, None, n_total_iterations=4, resume=True,
                              **common)
    assert st2.nit == 4
    s3, st3 = jft.optimize_kl(lh, init, n_total_iterations=4, **{
        **common, "odir": str(tmp_path) + "_b"
    })
    np.testing.assert_allclose(
        np.asarray(s2.pos["cfxi"]), np.asarray(s3.pos["cfxi"]), atol=1e-5
    )


def test_lh_as_argument_stage_compilation_matches_baked(rng, key):
    """With the likelihood passed as a runtime argument to the compiled
    stages (the at-scale HBM-safe path, forced here via the size gate),
    a full fused VI iteration must agree with the constant-baked default
    to solver-stopping tolerance."""
    dims = (24, 24)
    data = jnp.asarray(rng.normal(size=dims))
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(dims, 1.0 / 24, (1.0, 0.5), (-2.5, 0.3),
                         flexibility=(1.0, 0.5))
    cf = cfm.finalize()
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x).amend(cf)
    pos = jft.random_like(key, lh.domain)
    kwargs = dict(
        n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=60)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-5, maxiter=3, cg_kwargs=dict(maxiter=25))),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-6, maxiter=8, cg_kwargs=dict(maxiter=40))),
        sample_mode="nonlinear_resample",
    )

    def run():
        opt = jft.OptimizeVI(lh, n_total_iterations=1)
        state = opt.init_state(jax.random.PRNGKey(3), **kwargs)
        samples = jft.Samples(pos=pos, samples=None, keys=None)
        samples, state = opt.update(samples, state)
        return samples, state, opt

    s_baked, st_baked, opt_b = run()
    assert not opt_b._lh_as_arg
    saved = jft.OptimizeVI.LH_AS_ARG_MIN_BYTES
    try:
        jft.OptimizeVI.LH_AS_ARG_MIN_BYTES = 0
        s_arg, st_arg, opt_a = run()
    finally:
        jft.OptimizeVI.LH_AS_ARG_MIN_BYTES = saved
    assert opt_a._lh_as_arg
    np.testing.assert_allclose(
        float(st_arg.minimization_state.fun),
        float(st_baked.minimization_state.fun), rtol=1e-6,
    )
    for a, b in zip(jax.tree_util.tree_leaves(s_arg.samples),
                    jax.tree_util.tree_leaves(s_baked.samples)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
