"""Centralized adjointness/linearity sweep over every linear operator.

Mirrors the reference's ``test/test_operators/test_adjoint.py``: each linear
map in the framework is run through ``extra.check_linear_model`` (linearity,
jvp-consistency, <Ax,y> == <x,A^T y>) over parametrized shapes and dtypes.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from nifty_tpu import extra
from nifty_tpu.ops.harmonic import fftn, hartley, hartley_via_c2c, ifftn
from nifty_tpu.tree import ShapeWithDtype

pmp = pytest.mark.parametrize

SHAPES = [(16,), (8, 12), (4, 6, 8)]
FLOATS = [np.float32, np.float64]


def _swd(shape, dtype):
    return ShapeWithDtype(shape, dtype)


@pmp("shape", SHAPES)
@pmp("dtype", FLOATS)
def test_hartley_adjoint(shape, dtype, key):
    tol = dict(rtol=1e-4, atol=1e-5) if dtype == np.float32 else {}
    extra.check_linear_model(hartley, _swd(shape, dtype), key, **tol)


@pmp("shape", SHAPES)
def test_hartley_c2c_path_matches_rfft_path(shape, key):
    x = jax.random.normal(key, shape)
    np.testing.assert_allclose(
        np.asarray(hartley(x)), np.asarray(hartley_via_c2c(x)),
        rtol=1e-12, atol=1e-12,
    )


@pmp("shape", SHAPES)
def test_fftn_adjoint(shape, key):
    extra.check_linear_model(fftn, _swd(shape, np.complex128), key)
    extra.check_linear_model(ifftn, _swd(shape, np.complex128), key)


@pmp("shape", [(12,), (6, 9)])
@pmp("dtype", FLOATS)
def test_partial_axes_hartley(shape, dtype, key):
    tol = dict(rtol=1e-4, atol=1e-5) if dtype == np.float32 else {}
    extra.check_linear_model(
        partial(hartley, axes=(0,)), _swd(shape, dtype), key, **tol
    )


def test_gl_sht_synthesis_adjoint(key):
    from nifty_tpu.ops.sht import SphericalHarmonicTransform

    lmax = 7
    sht = SphericalHarmonicTransform(lmax=lmax)
    extra.check_linear_model(
        sht.synthesize_real, _swd(((lmax + 1) ** 2,), np.float64), key
    )


def test_healpix_sht_synthesis_adjoint(key):
    from nifty_tpu.ops.healpix_sht import HEALPixSHT

    lmax = 7
    sht = HEALPixSHT(lmax=lmax, nside=8)
    extra.check_linear_model(
        sht.synthesize_real, _swd(((lmax + 1) ** 2,), np.float64), key
    )


def test_los_adjoint(key):
    from nifty_tpu.responses.los import SamplingCartesianGridLOS

    rng = np.random.default_rng(0)
    n_rays = 5
    shape = (8, 8, 8)
    starts = rng.uniform(0.1, 0.4, size=(n_rays, 3))
    ends = rng.uniform(0.6, 0.9, size=(n_rays, 3))
    los = SamplingCartesianGridLOS(
        starts, ends, shape=shape, distances=(1 / 8,) * 3
    )
    extra.check_linear_model(los, _swd(shape, np.float64), key)


def test_nufft2_adjoint_of_nufft1(key):
    from nifty_tpu.ops.nufft import nufft1, nufft2

    rng = np.random.default_rng(1)
    shape = (16, 16)
    coords = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(7, 2)))
    x = jnp.asarray(rng.normal(size=shape) + 1j * rng.normal(size=shape))
    y = jnp.asarray(rng.normal(size=7) + 1j * rng.normal(size=7))
    lhs = jnp.vdot(y, nufft2(x, coords))
    rhs = jnp.vdot(nufft1(shape, y, coords), x)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-6)


def test_distributed_hartley_adjoint(key):
    from jax.sharding import Mesh

    from nifty_tpu.ops.distributed_fft import distributed_hartley

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("field",))
    f = partial(distributed_hartley, mesh=mesh, axis_name="field")
    extra.check_linear_model(f, _swd((16, 8), np.float64), key)


def test_ski_interp_adjoint(key):
    from nifty_tpu.responses.ski import (
        apply_interpolation,
        interpolation_matrix,
    )

    rng = np.random.default_rng(2)
    pts = rng.uniform(0.05, 0.95, size=(1, 11))
    idx, w = interpolation_matrix((32,), [(0.0, 1.0)], pts)

    def f(v):
        return apply_interpolation(idx, w, v)

    extra.check_linear_model(f, _swd((32,), np.float64), key)


def test_bin_gather_adjoint(key):
    from nifty_tpu.ops.pallas_gather import bin_gather

    idx = jnp.asarray(np.random.default_rng(3).integers(0, 9, size=(6, 7)))
    extra.check_linear_model(
        lambda t: bin_gather(t, idx), _swd((9,), np.float64), key
    )


@pmp("power", [0.5, 1.0, 2.0])
def test_field_weight_is_linear(power, key):
    dom = jft.RGSpace((8, 8), distances=0.25)

    def f(x):
        return jft.makeField(dom, x).weight(power).val

    extra.check_linear_model(f, _swd((8, 8), np.float64), key)
