"""Tests: consistency checkers, instrumentation, probing, Wiener filter,
plotting, sample export, and the INI config driver (ref models:
``test/test_extra.py`` role, ``test/test_optimize_kl_cfg.py``,
``test/test_plot.py``, sample-list persistence tests)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from nifty_tpu.probing import StatCalculator, operator_spectrum, probe_diagonal, probe_trace

pmp = pytest.mark.parametrize


# -- extra checks ----------------------------------------------------------

def test_check_linear_model_passes(key):
    A = jnp.asarray(np.random.default_rng(0).normal(size=(7, 5)))
    assert jft.check_linear_model(lambda x: A @ x, jnp.zeros(5), key)


def test_check_linear_model_catches_nonlinear(key):
    with pytest.raises(AssertionError):
        jft.check_linear_model(lambda x: x ** 2, jnp.zeros(5), key)


def test_check_model_and_likelihood(rng, key):
    fwd = jft.Model(lambda p: jnp.tanh(p["x"]) * 2.0,
                    domain={"x": jft.ShapeWithDtype((6,))})
    assert jft.check_model(fwd, fwd.domain, key)
    lh = jft.Gaussian(jnp.asarray(rng.normal(size=6))).amend(fwd)
    assert jft.check_likelihood(lh, key)


# -- instrumentation -------------------------------------------------------

def test_exec_time(rng):
    lh = jft.Gaussian(jnp.asarray(rng.normal(size=16))).amend(
        jft.Model(lambda p: p["x"] * 2.0,
                  domain={"x": jft.ShapeWithDtype((16,))})
    )
    res = jft.exec_time(lh, verbose=False, n=1)
    assert {"forward", "jvp", "value_and_grad", "metric"} <= set(res)
    assert all(v > 0 for v in res.values())


def test_counting_model(rng):
    cm = jft.CountingModel(lambda x: x * 2.0)
    x = jnp.ones(4)
    cm(x)
    cm.jvp(x, x)
    cm.vjp(x, x)
    assert cm.counts == {"forward": 1, "jvp": 1, "vjp": 1}
    assert "#forward 1" in cm.report()


# -- probing ---------------------------------------------------------------

def test_stat_calculator(rng):
    sc = StatCalculator()
    vals = rng.normal(size=(50, 4))
    for v in vals:
        sc.add({"a": jnp.asarray(v)})
    np.testing.assert_allclose(sc.mean["a"], vals.mean(0), rtol=1e-10)
    np.testing.assert_allclose(sc.var["a"], vals.var(0, ddof=1), rtol=1e-8)


def test_probe_diagonal_trace(rng, key):
    d = jnp.asarray(rng.uniform(0.5, 2.0, size=32))
    op = lambda x: d * x
    diag = probe_diagonal(op, jnp.zeros(32), key, n_probes=200)
    np.testing.assert_allclose(diag, d, atol=0.5)
    tr = probe_trace(op, jnp.zeros(32), key, n_probes=200)
    assert abs(float(tr) - float(d.sum())) / float(d.sum()) < 0.2


def test_operator_spectrum(rng):
    A = rng.normal(size=(20, 20))
    A = A @ A.T + np.eye(20)
    vals = operator_spectrum(lambda x: jnp.asarray(A) @ x, jnp.zeros(20), k=4)
    expected = np.sort(np.linalg.eigvalsh(A))[::-1][:4]
    np.testing.assert_allclose(vals, expected, rtol=1e-6)


# -- wiener filter ---------------------------------------------------------

def test_wiener_filter_matches_direct(rng):
    n, m, noise = 12, 20, 0.4
    R_mat = rng.normal(size=(m, n))
    s_var = rng.uniform(0.5, 2.0, size=n)
    truth = np.sqrt(s_var) * rng.normal(size=n)
    data = R_mat @ truth + noise * rng.normal(size=m)

    mean, info = jft.wiener_filter(
        jnp.asarray(data),
        R=lambda x: jnp.asarray(R_mat) @ x,
        N_inv=lambda y: y / noise ** 2,
        S_inv=lambda x: x / jnp.asarray(s_var),
        domain_proto=jnp.zeros(n),
        cg_kwargs=dict(resnorm=1e-12, maxiter=500),
    )
    D_inv = R_mat.T @ R_mat / noise ** 2 + np.diag(1.0 / s_var)
    expected = np.linalg.solve(D_inv, R_mat.T @ data / noise ** 2)
    np.testing.assert_allclose(mean, expected, rtol=1e-6, atol=1e-8)
    assert int(info) == 0


# -- plotting & export -----------------------------------------------------

def test_plot_output(tmp_path, rng, key):
    s2 = jft.RGSpace((16, 16), 1 / 16)
    h = s2.get_default_codomain()
    p = jft.Plot()
    p.add(jft.from_random(s2, key), title="field")
    p.add(np.asarray(rng.normal(size=32)), label="history")
    p.add(jft.power_analyze(jft.from_random(h, key)), title="power")
    fn = os.path.join(tmp_path, "plot.png")
    p.output(name=fn)
    assert os.path.getsize(fn) > 1000


def test_plot_spherical(tmp_path, key):
    gl = jft.GLSpace(8)
    hp = jft.HPSpace(4)
    p = jft.Plot()
    p.add(jft.from_random(gl, key), title="GL")
    p.add(jft.from_random(hp, key), title="HP")
    fn = os.path.join(tmp_path, "sphere.png")
    p.output(name=fn)
    assert os.path.getsize(fn) > 1000


def test_plot_rgb_energy_uncertainty(tmp_path, rng):
    from nifty_tpu.plot import EnergyHistory, rgb_from_frequencies

    cube = rng.uniform(size=(5, 12, 16))
    rgb = rgb_from_frequencies(cube)
    assert rgb.shape == (12, 16, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # channel ordering: a cube bright only in the lowest frequency maps
    # predominantly to the red channel, highest to blue
    lo = np.zeros((5, 4, 4)); lo[0] = 1.0
    hi = np.zeros((5, 4, 4)); hi[-1] = 1.0
    rgb_lo = rgb_from_frequencies(lo)
    rgb_hi = rgb_from_frequencies(hi)
    assert rgb_lo[..., 0].mean() > rgb_lo[..., 2].mean()
    assert rgb_hi[..., 2].mean() > rgb_hi[..., 0].mean()

    eh = EnergyHistory()
    for i, e in enumerate([10.0, 5.0, 3.0, 2.5]):
        eh.append(i, e)

    p = jft.Plot()
    p.add(cube, freqs_as_rgb=True, title="rgb")
    p.add(eh, title="energy")
    p.add_uncertainty(rng.normal(size=(6, 16, 16)), title="posterior")
    fn = os.path.join(tmp_path, "extra_panels.png")
    p.output(name=fn)
    assert os.path.getsize(fn) > 1000


def test_hdf5_export(tmp_path, rng):
    pos = {"x": jnp.asarray(rng.normal(size=8))}
    resid = {"x": jnp.asarray(rng.normal(size=(4, 8)))}
    samples = jft.Samples(pos=pos, samples=resid)
    fn = os.path.join(tmp_path, "out.h5")
    jft.save_samples_to_hdf5(samples, fn, {"sky": lambda s: s["x"] ** 2})
    import h5py

    with h5py.File(fn) as f:
        assert f["sky/mean"].shape == (8,)
        assert f["sky/samples"].shape == (4, 8)
        expected = np.stack([np.asarray((pos["x"] + r) ** 2) for r in resid["x"]])
        np.testing.assert_allclose(f["sky/samples"][...], expected)


def test_fits_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(6, 9))
    fn = os.path.join(tmp_path, "img.fits")
    jft.write_fits(fn, arr)
    back = jft.read_fits(fn)
    np.testing.assert_allclose(back, arr)
    # and the sample exporter
    samples = jft.Samples(
        pos={"x": jnp.zeros((4, 4))},
        samples={"x": jnp.asarray(rng.normal(size=(3, 4, 4)))},
    )
    jft.save_samples_to_fits(
        samples, os.path.join(tmp_path, "sky"), lambda s: s["x"],
        samples_files=True,
    )
    assert os.path.exists(os.path.join(tmp_path, "sky.mean.fits"))
    assert os.path.exists(os.path.join(tmp_path, "sky.std.fits"))
    assert os.path.exists(os.path.join(tmp_path, "sky.sample_2.fits"))


def test_save_load_samples(tmp_path, rng):
    samples = jft.Samples(
        pos={"x": jnp.asarray(rng.normal(size=5))},
        samples={"x": jnp.asarray(rng.normal(size=(2, 5)))},
    )
    fn = os.path.join(tmp_path, "smpls.pkl")
    jft.save_samples(samples, fn)
    back = jft.load_samples(fn)
    np.testing.assert_allclose(np.asarray(back[1]["x"]), np.asarray(samples[1]["x"]))


# -- config driver ---------------------------------------------------------

def test_config_parse_and_schedules(tmp_path):
    cfg_text = """
[optimize_kl]
n_total_iterations = 4
n_samples = 2*2,2*4
sample_mode = linear_resample
seed = 7

[base_cg]
maxiter = 20

[cg]
base = base_cg
absdelta = 1e-9
"""
    fn = os.path.join(tmp_path, "cfg.ini")
    with open(fn, "w") as f:
        f.write(cfg_text)
    cfg = jft.OptimizeKLConfig.from_file(fn)
    kw = cfg.instantiate()
    assert kw["n_total_iterations"] == 4
    assert callable(kw["n_samples"])
    assert kw["n_samples"](0) == 2 and kw["n_samples"](3) == 4
    assert kw["n_samples"](100) == 4  # schedule extends its last value
    assert kw["sample_mode"] == "linear_resample"
    # section inheritance
    sec = cfg["cg"]
    assert sec["maxiter"] == "20" and sec["absdelta"] == "1e-9"
    # round trip
    fn2 = os.path.join(tmp_path, "cfg2.ini")
    cfg.to_file(fn2)
    cfg2 = jft.OptimizeKLConfig.from_file(fn2)
    assert cfg2.instantiate()["n_total_iterations"] == 4


def test_config_driven_inference(tmp_path, rng, key):
    cfg_text = """
[optimize_kl]
n_total_iterations = 2
n_samples = 2
sample_mode = linear_resample
seed = 3
"""
    fn = os.path.join(tmp_path, "run.ini")
    with open(fn, "w") as f:
        f.write(cfg_text)
    fwd = jft.Model(lambda p: p["x"] * 2.0,
                    domain={"x": jft.ShapeWithDtype((8,))})
    lh = jft.Gaussian(jnp.asarray(rng.normal(size=8))).amend(fwd)
    cfg = jft.OptimizeKLConfig.from_file(fn)
    samples, state = cfg.optimize_kl(lh, jft.random_like(key, lh.domain))
    assert state.nit == 2 and len(samples) == 4


def test_gamma_priors_statistics(key):
    from nifty_tpu.stats import gamma_prior, log_invgamma_prior

    x = jax.random.normal(key, (20000,))
    g = gamma_prior(3.0, 2.0)(x)
    assert abs(float(g.mean()) - 6.0) < 0.2
    assert abs(float(g.var()) - 12.0) < 1.0
    li = log_invgamma_prior(3.0, 2.0)(x)
    assert bool(jnp.all(jnp.isfinite(li)))
    # log-invgamma == log of invgamma draws
    from nifty_tpu.stats import invgamma_prior

    ig = invgamma_prior(3.0, 2.0)(x[:100])
    np.testing.assert_allclose(np.asarray(li[:100]),
                               np.log(np.asarray(ig)), atol=1e-3)


def test_calculate_position(key):
    cf = jft.SimpleCorrelatedField((16, 16), 1 / 16, flexibility=None)
    target = cf(cf.init(key))
    pos = jft.calculate_position(cf, target)
    rel = float(jnp.max(jnp.abs(cf(pos) - target))) / float(
        jnp.max(jnp.abs(target))
    )
    assert rel < 0.05


def test_density_estimator(key):
    dm, cfm = jft.density_estimator((16, 16), 1 / 16)
    out = dm(dm.init(key))
    assert out.shape == (16, 16)
    assert bool(jnp.all(out > 0))


def test_optimize_kl_operator_export(tmp_path, rng, key):
    fwd = jft.Model(lambda p: p["x"] * 2.0,
                    domain={"x": jft.ShapeWithDtype((8,))})
    lh = jft.Gaussian(jnp.asarray(rng.normal(size=8))).amend(fwd)
    samples, _ = jft.optimize_kl(
        lh, jft.random_like(key, lh.domain), key=jax.random.PRNGKey(1),
        n_total_iterations=2, n_samples=2, sample_mode="linear_resample",
        odir=str(tmp_path),
        export_operator_outputs={"sky": fwd},
    )
    import h5py

    with h5py.File(os.path.join(tmp_path, "operator_outputs.h5")) as f:
        assert f["sky/mean"].shape == (8,)
