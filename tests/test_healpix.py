"""HEALPix native-core tests (self-validating: bijections, round trips,
the 24-seven-neighbor invariant, neighbor symmetry and locality)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nifty_tpu.ops import healpix as hp

pmp = pytest.mark.parametrize


@pmp("nside", [1, 2, 4, 8, 16, 32])
def test_ring_nest_bijection(nside):
    n = hp.npix(nside)
    pix = np.arange(n)
    nest = hp.ring2nest(nside, pix)
    assert sorted(nest) == list(range(n))
    np.testing.assert_array_equal(hp.nest2ring(nside, nest), pix)


@pmp("nside", [1, 2, 8, 32])
@pmp("nest", [False, True])
def test_pix2ang_ang2pix_roundtrip(nside, nest):
    pix = np.arange(hp.npix(nside))
    th, ph = hp.pix2ang(nside, pix, nest=nest)
    np.testing.assert_array_equal(hp.ang2pix(nside, th, ph, nest=nest), pix)
    assert np.all((th >= 0) & (th <= np.pi))
    assert np.all((ph >= 0) & (ph < 2 * np.pi))


@pmp("nside", [4, 16])
def test_schemes_agree_on_centers(nside):
    pix = np.arange(hp.npix(nside))
    th_n, ph_n = hp.pix2ang(nside, pix, nest=True)
    th_r, ph_r = hp.pix2ang(nside, hp.nest2ring(nside, pix))
    np.testing.assert_allclose(th_n, th_r, atol=1e-12)
    np.testing.assert_allclose(ph_n, ph_r, atol=1e-12)


def test_equal_area_property():
    """Equal-area pixelization: centers balance per hemisphere and the
    z-distribution is uniform up to ring discreteness."""
    nside = 16
    th, _ = hp.pix2ang(nside, np.arange(hp.npix(nside)))
    z = np.cos(th)
    assert abs(float(np.mean(z))) < 1e-12  # north/south symmetric
    eq = np.abs(z) < 1e-10  # the equatorial ring sits exactly at z=0
    assert np.sum(z > 0) - np.sum(z < 0) in (0, np.sum(eq))
    counts, _ = np.histogram(z, bins=4, range=(-1, 1))
    # coarse bins wash out ring discreteness
    assert counts.std() / counts.mean() < 0.1


@pmp("nside", [2, 4, 8, 16])
def test_neighbors_invariants(nside):
    n = hp.npix(nside)
    nb = hp.neighbours_nest(nside, np.arange(n))
    counts = (nb >= 0).sum(axis=1)
    # HEALPix invariant: exactly 24 pixels have 7 neighbors, rest 8.
    assert np.sum(counts == 7) == 24
    assert np.sum(counts == 8) == n - 24
    # symmetry
    for p in range(n):
        for q in nb[p]:
            if q >= 0:
                assert p in nb[q]
    # locality: neighbors within ~1.5 pixel scales
    vec = hp.pix2vec(nside, np.arange(n), nest=True)
    scale = np.pi / (2 * nside)
    for p in range(0, n, max(1, n // 128)):
        for q in nb[p]:
            if q >= 0:
                d = np.arccos(np.clip(vec[p] @ vec[q], -1, 1))
                assert d < 1.5 * scale


def test_pix2vec_unit_norm():
    v = hp.pix2vec(8, np.arange(hp.npix(8)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)


def test_healpix_one_shot_weighted_analysis():
    """Ring-weight quadrature: one-shot analysis accuracy and the
    weights' improvement over unit weights."""
    from nifty_tpu.ops.healpix_sht import HEALPixSHT

    rng = np.random.default_rng(0)
    nside, lmax = 32, 16
    s = HEALPixSHT(lmax, nside, dtype=jnp.float64)
    alm = jnp.asarray(rng.standard_normal(s.n_alm)
                      + 1j * rng.standard_normal(s.n_alm))
    alm = alm.at[:lmax + 1].set(alm[:lmax + 1].real)
    m = s.alm2map(alm)
    al = np.asarray(alm)

    a_w = np.asarray(s.map2alm_weighted(m))
    rel_w = np.linalg.norm(a_w - al) / np.linalg.norm(al)
    assert rel_w < 1e-5

    s._ring_weights = np.ones_like(s._get_ring_weights())
    a_u = np.asarray(s.map2alm_weighted(m))
    rel_u = np.linalg.norm(a_u - al) / np.linalg.norm(al)
    assert rel_w < rel_u / 50  # the solved weights must matter
