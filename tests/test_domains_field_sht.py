"""Domains, Field volume calculus, and the spherical harmonic transform
(ref models: ``test/test_spaces/``, ``test/test_field.py``,
``test/test_operators/test_adjoint.py`` for SHT adjointness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from nifty_tpu.domains import (
    DomainTuple,
    GLSpace,
    HPSpace,
    LMSpace,
    PowerSpace,
    RGSpace,
    UnstructuredDomain,
)
from nifty_tpu.field import Field, from_random, full, makeField, power_analyze
from nifty_tpu.ops.sht import (
    SphericalHarmonicTransform,
    alm_index,
    n_alm,
    normalized_legendre_table,
)

pmp = pytest.mark.parametrize


# -- domains ---------------------------------------------------------------

def test_rgspace_basics():
    s = RGSpace((8, 8), distances=0.25)
    assert s.shape == (8, 8) and s.size == 64
    assert s.scalar_dvol == 0.0625
    assert np.isclose(s.total_volume, 4.0)
    co = s.get_default_codomain()
    assert co.harmonic and co.distances == (0.5, 0.5)
    assert co.get_default_codomain() == s
    # domains are cached/hashable
    assert RGSpace((8, 8), distances=0.25) == s
    assert DomainTuple.make(s) is DomainTuple.make(s)


def test_rgspace_k_lengths():
    s = RGSpace((8,), distances=1.0 / 8).get_default_codomain()
    k = np.asarray(s.get_k_length_array())
    np.testing.assert_allclose(k, np.abs(np.fft.fftfreq(8, d=1.0 / 8)))


def test_power_space():
    h = RGSpace((16, 16), 1.0 / 16).get_default_codomain()
    p = PowerSpace(h)
    assert p.pindex.shape == (16, 16)
    assert p.shape[0] == len(p.k_lengths)
    assert int(np.sum(p.dvol)) == 256


def test_gl_hp_spaces():
    gl = GLSpace(8)
    assert gl.shape == (8 * 15,)
    np.testing.assert_allclose(np.sum(gl._dvol_array()), 4 * np.pi, rtol=1e-12)
    hp = HPSpace(4)
    assert hp.shape == (192,)
    np.testing.assert_allclose(hp.scalar_dvol * hp.size, 4 * np.pi)
    lm = LMSpace(8)
    assert lm.shape == (81,)
    ls = np.asarray(lm.get_k_length_array())
    assert ls.size == 81 and ls.max() == 8


# -- field -----------------------------------------------------------------

def test_field_weight_vdot_integrate(rng):
    s = RGSpace((8, 8), distances=0.5)
    f = makeField(s, rng.normal(size=(8, 8)))
    g = makeField(s, rng.normal(size=(8, 8)))
    np.testing.assert_allclose(
        float(f.vdot(g)), 0.25 * np.vdot(np.asarray(f.val), np.asarray(g.val))
    )
    np.testing.assert_allclose(
        float(full(s, 2.0).integrate()), 2.0 * s.total_volume
    )
    w = f.weight(1)
    np.testing.assert_allclose(np.asarray(w.val), 0.25 * np.asarray(f.val))


def test_field_arithmetic_and_pytree(rng, key):
    s = UnstructuredDomain(5)
    f = from_random(s, key)
    g = (2.0 * f + 1.0).exp()
    np.testing.assert_allclose(
        np.asarray(g.val), np.exp(2.0 * np.asarray(f.val) + 1.0)
    )
    out = jax.jit(lambda x: x * 2.0)(f)
    assert isinstance(out, Field) and out.domain == f.domain


def test_power_analyze_white_noise(key):
    h = RGSpace((64, 64), 1.0 / 64).get_default_codomain()
    xi = from_random(h, key)
    p = power_analyze(xi)
    # white noise: flat unit spectrum
    assert abs(float(jnp.mean(p.val)) - 1.0) < 0.2


# -- SHT -------------------------------------------------------------------

def test_legendre_vs_scipy():
    try:
        from scipy.special import sph_harm_y

        def ref(l, m, th):
            return sph_harm_y(l, m, th, 0.0).real
    except ImportError:
        from scipy.special import sph_harm

        def ref(l, m, th):
            return sph_harm(m, l, 0.0, th).real

    lmax = 10
    theta = np.linspace(0.1, 3.0, 5)
    lam = normalized_legendre_table(lmax, theta)
    for l in range(lmax + 1):
        for m in range(l + 1):
            np.testing.assert_allclose(
                lam[m, :, l], ref(l, m, theta), atol=1e-13,
                err_msg=f"l={l} m={m}",
            )


def test_sht_roundtrip(rng):
    sht = SphericalHarmonicTransform(lmax=16)
    alm = rng.normal(size=sht.n_alm) + 1j * rng.normal(size=sht.n_alm)
    alm[: sht.lmax + 1] = alm[: sht.lmax + 1].real  # m=0 real
    alm = jnp.asarray(alm)
    np.testing.assert_allclose(
        sht.map2alm(sht.alm2map(alm)), alm, atol=1e-12
    )


def test_sht_parseval(rng):
    sht = SphericalHarmonicTransform(lmax=12)
    x = jnp.asarray(rng.normal(size=(sht.lmax + 1) ** 2))
    mp = np.asarray(sht.synthesize_real(x))
    integ = np.sum(
        sht.quad_weights[:, None] * mp ** 2
    ) * 2 * np.pi / sht.nphi
    np.testing.assert_allclose(integ, float(jnp.sum(x ** 2)), rtol=1e-10)


def test_sht_y00_constant():
    sht = SphericalHarmonicTransform(lmax=8)
    alm = jnp.zeros(sht.n_alm, dtype=complex).at[0].set(1.0)
    m = np.asarray(sht.alm2map(alm))
    np.testing.assert_allclose(m, 1.0 / np.sqrt(4 * np.pi), rtol=1e-12)


def test_sht_jit_and_grad(rng):
    sht = SphericalHarmonicTransform(lmax=8)
    x = jnp.asarray(rng.normal(size=(9) ** 2))
    y = jnp.asarray(rng.normal(size=sht.grid_shape))
    # adjoint consistency through autodiff
    lhs = float(jnp.vdot(sht.synthesize_real(x), y))
    g = jax.grad(lambda v: jnp.vdot(sht.synthesize_real(v), y))(x)
    # <Sx, y> == <x, S^T y>
    rhs = float(jnp.vdot(x, g))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    jax.jit(sht.synthesize_real)(x)


def test_spherical_correlated_field_std(key):
    cfm = jft.CorrelatedFieldMaker("s")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-3, 1e-4))
    cfm.add_fluctuations(16, None, fluctuations=(2.0, 1e-3),
                         loglogavgslope=(-0.5, 1e-3), flexibility=None,
                         harmonic_type="spherical")
    cf = cfm.finalize()
    outs = jax.vmap(lambda k: cf(cf.init(k)))(jax.random.split(key, 200))
    sht = SphericalHarmonicTransform(16)
    var_map = np.var(np.asarray(outs), axis=0)
    w = sht.quad_weights[:, None] * np.ones((1, sht.nphi)) * 2 * np.pi / sht.nphi
    std = np.sqrt(float((var_map * w).sum() / (4 * np.pi)))
    assert abs(std - 2.0) < 0.25


def test_spherical_cf_inference(key):
    """End-to-end geoVI on a spherical correlated field."""
    cfm = jft.CorrelatedFieldMaker("s")
    cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(8, None, fluctuations=(1.0, 0.5),
                         loglogavgslope=(-2.0, 0.5), flexibility=None,
                         harmonic_type="spherical")
    cf = cfm.finalize()
    k1, k2, k3, k4 = jax.random.split(key, 4)
    truth = cf(cf.init(k1))
    noise = 0.1
    data = truth + noise * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / noise ** 2).amend(cf)
    samples, state = jft.optimize_kl(
        lh, jft.random_like(k3, lh.domain), key=k4,
        n_total_iterations=3, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-8, maxiter=50)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=12)),
        sample_mode="linear_resample",
    )
    pm = jft.mean([cf(s) for s in samples])
    rms = float(jnp.sqrt(jnp.mean((pm - truth) ** 2)))
    assert rms < 3 * noise


def test_healpix_sht_synthesis_vs_direct(rng):
    from nifty_tpu.ops import healpix as hpx
    from nifty_tpu.ops.healpix_sht import HEALPixSHT
    from nifty_tpu.ops.sht import alm_index

    try:
        from scipy.special import sph_harm_y

        def Y(l, m, th, ph):
            return sph_harm_y(l, m, th, ph)
    except ImportError:
        from scipy.special import sph_harm

        def Y(l, m, th, ph):
            return sph_harm(m, l, ph, th)

    lmax, nside = 6, 4
    sht = HEALPixSHT(lmax, nside)
    alm = rng.normal(size=sht.n_alm) + 1j * rng.normal(size=sht.n_alm)
    alm[: lmax + 1] = alm[: lmax + 1].real
    alm = jnp.asarray(alm)
    mp = np.asarray(sht.alm2map(alm))
    theta, phi = hpx.pix2ang(nside, np.arange(hpx.npix(nside)))
    for p in rng.integers(0, hpx.npix(nside), size=6):
        v = sum(
            (complex(alm[alm_index(l, m, lmax)]) * Y(l, m, theta[p], phi[p])
             ).real * (1 if m == 0 else 2)
            for l in range(lmax + 1) for m in range(l + 1)
        )
        np.testing.assert_allclose(mp[p], v, atol=1e-11)


def test_healpix_sht_analysis_roundtrip(rng):
    from nifty_tpu.ops.healpix_sht import HEALPixSHT

    lmax, nside = 8, 8
    sht = HEALPixSHT(lmax, nside)
    alm = rng.normal(size=sht.n_alm) + 1j * rng.normal(size=sht.n_alm)
    alm[: lmax + 1] = alm[: lmax + 1].real
    alm = jnp.asarray(alm)
    mp = sht.alm2map(alm)
    alm2 = sht.map2alm(mp, maxiter=200, tol=1e-12)
    np.testing.assert_allclose(np.asarray(alm2), np.asarray(alm), atol=1e-10)


def test_healpix_sht_y00():
    from nifty_tpu.ops.healpix_sht import HEALPixSHT

    sht = HEALPixSHT(4, 4)
    alm = jnp.zeros(sht.n_alm, dtype=complex).at[0].set(1.0)
    np.testing.assert_allclose(
        np.asarray(sht.alm2map(alm)), 1.0 / np.sqrt(4 * np.pi), rtol=1e-12
    )


def test_healpix_correlated_field(key):
    cfm = jft.CorrelatedFieldMaker("h")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-3, 1e-4))
    cfm.add_fluctuations(12, None, fluctuations=(2.0, 1e-3),
                         loglogavgslope=(-0.5, 1e-3), flexibility=None,
                         harmonic_type="healpix")
    cf = cfm.finalize()
    outs = jax.vmap(lambda k: cf(cf.init(k)))(jax.random.split(key, 200))
    from nifty_tpu.ops import healpix as hpx

    assert outs.shape[1] == hpx.npix(6)  # default nside = (lmax+1)//2
    std = float(np.sqrt(np.var(np.asarray(outs), axis=0).mean()))
    assert abs(std - 2.0) < 0.3


def test_sht_mmax_lt_lmax(rng):
    sht = SphericalHarmonicTransform(lmax=16, mmax=8)
    alm = rng.normal(size=sht.n_alm) + 1j * rng.normal(size=sht.n_alm)
    alm[:17] = alm[:17].real
    alm = jnp.asarray(alm)
    np.testing.assert_allclose(
        np.asarray(sht.map2alm(sht.alm2map(alm))), np.asarray(alm),
        atol=1e-12,
    )


class TestOnTheFlySHT:
    """Scan-formulated SHT must reproduce the table-formulated SHT."""

    def _pair(self, lmax, mmax=None):
        from nifty_tpu.ops.sht import (
            SphericalHarmonicTransform, SphericalHarmonicTransformOnTheFly,
        )

        t = SphericalHarmonicTransform(lmax, mmax=mmax, dtype=jnp.float64)
        o = SphericalHarmonicTransformOnTheFly(lmax, mmax=mmax,
                                               dtype=jnp.float64)
        return t, o

    @pytest.mark.parametrize("lmax,mmax", [(16, None), (24, 10), (33, 33)])
    def test_matches_table(self, lmax, mmax):
        t, o = self._pair(lmax, mmax)
        rng = np.random.default_rng(7)
        alm = jnp.asarray(rng.standard_normal(t.n_alm)
                          + 1j * rng.standard_normal(t.n_alm))
        m1, m2 = t.alm2map(alm), o.alm2map(alm)
        np.testing.assert_allclose(m2, m1, rtol=0, atol=1e-13 * float(jnp.abs(m1).max()))
        a1, a2 = t.map2alm(m1), o.map2alm(m1)
        np.testing.assert_allclose(a2, a1, rtol=0, atol=1e-13 * float(jnp.abs(a1).max()))

    def test_grad_and_vmap_match_table(self):
        t, o = self._pair(16)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((17) ** 2))
        g1 = jax.grad(lambda q: jnp.sum(t.synthesize_real(q) ** 2))(x)
        g2 = jax.grad(lambda q: jnp.sum(o.synthesize_real(q) ** 2))(x)
        scale = float(jnp.abs(g1).max())
        np.testing.assert_allclose(g2, g1, rtol=0, atol=1e-11 * scale)
        xb = jnp.stack([x, 2 * x, -x])
        mb = jax.vmap(o.synthesize_real)(xb)
        np.testing.assert_allclose(mb[1], 2 * mb[0], rtol=1e-12)

    def test_linearize_transpose_consistent_with_table(self):
        """The custom primitive pair must transpose exactly like the
        traced table implementation (incl. the irfft R-linearity)."""
        t, o = self._pair(12)
        rng = np.random.default_rng(9)
        alm = jnp.asarray(rng.standard_normal(t.n_alm)
                          + 1j * rng.standard_normal(t.n_alm))
        v = jnp.asarray(rng.standard_normal(t.grid_shape))
        cts = []
        for s in (t, o):
            _, lin = jax.linearize(lambda a: s.alm2map(a), alm)
            (ct,) = jax.linear_transpose(lin, alm)(v)
            cts.append(ct)
        np.testing.assert_allclose(cts[1], cts[0], rtol=1e-12)


# -- DOF-space semantics (reference src/domains/dof_space.py:23,
#    src/operators/distributors.py:28 DOFDistributor) ----------------------
#
# The classic DOFSpace is the weighted space of power-spectrum DOFs; its
# role here is carried by the PowerSpace pindex + mode multiplicity and
# the distributor primitive.  These tests pin the DOF contract directly.


def test_dof_distributor_contract():
    """distribute(table)[i] = table[pindex[i]] and the adjoint of ones
    returns the bin multiplicity — the DOFDistributor/weighted-DOFSpace
    identity (adjoint-applied volume = dvol of the DOF space)."""
    from nifty_tpu.domains import PowerSpace, RGSpace
    from nifty_tpu.ops.pallas_gather import bin_gather, bin_scatter_p

    h = RGSpace((16, 16), distances=1.0 / 16, harmonic=True)
    p = PowerSpace(h)
    pindex = jnp.asarray(p.pindex)
    nb = p.k_lengths.size
    table = jnp.asarray(np.arange(1.0, nb + 1.0))
    got = bin_gather(table, pindex)
    np.testing.assert_allclose(got, table[pindex])
    mult = bin_scatter_p.bind(
        jnp.ones((1,) + pindex.shape), pindex, nb=nb
    )[0]
    # multiplicity == dvol of the DOF space == bincount of pindex
    np.testing.assert_allclose(
        mult, np.bincount(np.asarray(pindex).ravel(), minlength=nb)
    )


def test_dof_space_and_distributor():
    """First-class DOFSpace + dof_distributor: shape/dvol semantics, the
    times/adjoint pair vs a dense matrix, volume-weighted DOF weights on a
    non-uniform partner, and the empty-bin guard.

    Parity: ``src/domains/dof_space.py:23`` +
    ``src/operators/distributors.py:28``."""
    import jax
    from nifty_tpu import DOFSpace, dof_distributor
    from nifty_tpu.domains import PowerSpace, RGSpace

    rng = np.random.default_rng(42)
    dofdex = rng.integers(0, 5, size=(6, 7))
    # ensure every bin occupied
    dofdex.ravel()[:5] = np.arange(5)
    times, dspace = dof_distributor(dofdex)

    assert isinstance(dspace, DOFSpace)
    assert dspace.shape == (5,)
    np.testing.assert_allclose(
        dspace.dvol, np.bincount(dofdex.ravel(), minlength=5)
    )
    assert dspace.total_volume == dofdex.size
    assert dspace == DOFSpace(np.bincount(dofdex.ravel()))
    assert dspace != DOFSpace([1.0, 2.0])

    x = jnp.asarray(rng.normal(size=5))
    np.testing.assert_allclose(times(x), x[dofdex])
    # adjoint == dense-matrix transpose
    dense = np.zeros((dofdex.size, 5))
    dense[np.arange(dofdex.size), dofdex.ravel()] = 1.0
    y = rng.normal(size=dofdex.shape)
    (adj,) = jax.linear_transpose(times, x)(jnp.asarray(y))
    np.testing.assert_allclose(adj, dense.T @ y.ravel(), rtol=1e-12)

    # volume weighting on a partner with non-scalar dvol: group the bins
    # of a PowerSpace (whose dvol is the per-bin multiplicity) pairwise —
    # the DOF weights must be the volume-weighted bincount.
    h = RGSpace((8, 8), distances=1.0 / 8, harmonic=True)
    p = PowerSpace(h)
    groups = np.arange(p.shape[0]) // 2
    _, dsp = dof_distributor(groups, partner=p)
    np.testing.assert_allclose(
        dsp.dvol,
        np.bincount(groups, weights=np.asarray(p.dvol)),
    )
    # scalar-dvol partner scales the multiplicity by the pixel volume
    _, dsh = dof_distributor(np.zeros(h.shape, dtype=np.int64), partner=h)
    np.testing.assert_allclose(dsh.dvol, [h.size * h.scalar_dvol])

    with np.testing.assert_raises(ValueError):
        dof_distributor(np.array([0, 0, 2]))  # bin 1 empty
    with np.testing.assert_raises(TypeError):
        dof_distributor(np.array([0.0, 1.0]))


def test_power_analyze_roundtrip_dof_weighting():
    """power_analyze of a field synthesized from a known spectrum recovers
    it: the DOF-weighted average over each bin of |f_k|^2 (multiplicity
    weighting is exactly the classic DOFSpace volume factor)."""
    from nifty_tpu.domains import PowerSpace, RGSpace
    from nifty_tpu.domains import DomainTuple
    from nifty_tpu.field import Field, power_analyze

    h = RGSpace((32, 32), distances=1.0 / 32, harmonic=True)
    p = PowerSpace(h)
    spec = 1.0 / (1.0 + np.asarray(p.k_lengths)) ** 2
    fh = jnp.asarray(spec[np.asarray(p.pindex)])  # |f_k| = sqrt(P) exactly
    f = Field(DomainTuple.make(h), jnp.sqrt(fh))
    got = power_analyze(f)
    np.testing.assert_allclose(np.asarray(got.val), spec, rtol=1e-6)
