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


# --- table-driven consistency matrix ---------------------------------------
#
# Every linear map in the package x every dtype it supports, one registry
# (the analog of the reference's operator-family sweep,
# /root/reference/test/test_operators/test_adjoint.py:37-59).  Builders are
# lazy so ops with native/compiled dependencies only load when their row
# runs.  Each row: name -> (builder(dtype) -> (fn, domain_swd), dtypes).


def _build_hartley(dtype):
    if np.issubdtype(dtype, np.complexfloating):
        return hartley_via_c2c, _swd((8, 12), dtype)
    return hartley, _swd((8, 12), dtype)


def _build_fftn(dtype):
    return fftn, _swd((8, 12), dtype)


def _build_ifftn(dtype):
    return ifftn, _swd((8, 12), dtype)


def _build_gl_sht(dtype):
    from nifty_tpu.ops.sht import SphericalHarmonicTransform

    lmax = 7
    sht = SphericalHarmonicTransform(lmax=lmax)
    return sht.synthesize_real, _swd(((lmax + 1) ** 2,), dtype)


def _build_hp_sht(dtype):
    from nifty_tpu.ops.healpix_sht import HEALPixSHT

    lmax = 7
    sht = HEALPixSHT(lmax=lmax, nside=8)
    return sht.synthesize_real, _swd(((lmax + 1) ** 2,), dtype)


def _build_los(dtype):
    from nifty_tpu.responses.los import SamplingCartesianGridLOS

    rng = np.random.default_rng(0)
    starts = rng.uniform(0.1, 0.4, size=(5, 3))
    ends = rng.uniform(0.6, 0.9, size=(5, 3))
    los = SamplingCartesianGridLOS(
        starts, ends, shape=(8, 8, 8), distances=(1 / 8,) * 3
    )
    return los, _swd((8, 8, 8), dtype)


def _build_nufft2(dtype):
    from nifty_tpu.ops.nufft import nufft2

    coords = jnp.asarray(
        np.random.default_rng(1).uniform(-np.pi, np.pi, size=(7, 2))
    )
    return partial(nufft2, coords=coords), _swd((16, 16), dtype)


def _build_ski(dtype):
    from nifty_tpu.responses.ski import (
        apply_interpolation,
        interpolation_matrix,
    )

    pts = np.random.default_rng(2).uniform(0.05, 0.95, size=(1, 11))
    idx, w = interpolation_matrix((32,), [(0.0, 1.0)], pts)
    w = jnp.asarray(w, dtype if not np.issubdtype(dtype, np.complexfloating)
                    else np.float64)
    return partial(apply_interpolation, idx, w), _swd((32,), dtype)


def _build_bin_gather(dtype):
    from nifty_tpu.ops.pallas_gather import bin_gather

    idx = jnp.asarray(np.random.default_rng(3).integers(0, 9, size=(6, 7)))
    return (lambda t: bin_gather(t, idx)), _swd((9,), dtype)


def _build_distributed_hartley(dtype):
    from jax.sharding import Mesh

    from nifty_tpu.ops.distributed_fft import distributed_hartley

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("field",))
    return (
        partial(distributed_hartley, mesh=mesh, axis_name="field"),
        _swd((16, 8), dtype),
    )


def _build_distributed_fftn(dtype):
    from jax.sharding import Mesh

    from nifty_tpu.ops.distributed_fft import distributed_fftn

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("field",))
    return (
        partial(distributed_fftn, mesh=mesh, axis_name="field"),
        _swd((16, 8), dtype),
    )


def _build_power_distributor(dtype):
    from nifty_tpu.ops.harmonic import fourier_mode_distributor

    distributor, _, _ = fourier_mode_distributor((12, 12), (0.1, 0.1))
    distributor = jnp.asarray(distributor)
    n_modes = int(np.asarray(distributor).max()) + 1

    def f(power):
        return power[distributor]

    return f, _swd((n_modes,), dtype)


def _build_dof_distributor(dtype):
    from nifty_tpu.field import dof_distributor

    rng = np.random.default_rng(3)
    dofdex = rng.integers(0, 7, size=(9, 5))
    dofdex.ravel()[:7] = np.arange(7)
    times, dspace = dof_distributor(dofdex)
    return times, _swd(dspace.shape, dtype)


F_ALL = [np.float32, np.float64]
C_ALL = [np.complex64, np.complex128]

_LINEAR_MATRIX = {
    # NB: hartley is R-linear only (re/im extraction), defined on real
    # fields — complex columns are deliberately absent.
    "hartley": (_build_hartley, F_ALL),
    "fftn": (_build_fftn, C_ALL),
    "ifftn": (_build_ifftn, C_ALL),
    "gl_sht": (_build_gl_sht, F_ALL),
    "healpix_sht": (_build_hp_sht, F_ALL),
    "los": (_build_los, F_ALL),
    "nufft2": (_build_nufft2, C_ALL),
    "ski_interp": (_build_ski, F_ALL + C_ALL),
    "bin_gather": (_build_bin_gather, F_ALL + C_ALL),
    "distributed_hartley": (_build_distributed_hartley, [np.float64]),
    "distributed_fftn": (_build_distributed_fftn, [np.complex128]),
    "power_distributor": (_build_power_distributor, F_ALL + C_ALL),
    "dof_distributor": (_build_dof_distributor, F_ALL),
}

_MATRIX_CASES = [
    (name, dtype)
    for name, (_, dtypes) in _LINEAR_MATRIX.items()
    for dtype in dtypes
]


@pmp("name,dtype", _MATRIX_CASES,
     ids=[f"{n}-{np.dtype(d).name}" for n, d in _MATRIX_CASES])
def test_linear_consistency_matrix(name, dtype, key):
    builder, _ = _LINEAR_MATRIX[name]
    fn, dom = builder(dtype)
    single = np.dtype(dtype).itemsize <= (
        8 if np.issubdtype(dtype, np.complexfloating) else 4
    )
    tol = dict(rtol=2e-3, atol=2e-4) if single else {}
    extra.check_linear_model(fn, dom, key, **tol)


@pmp("dtype", F_ALL)
def test_correlated_field_jacobian_matrix(dtype, key):
    """check_model (Jacobian vs finite differences) on the flagship forward
    model at both float widths."""
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        (12, 12), distances=1.0 / 12, fluctuations=(1.0, 5e-1),
        loglogavgslope=(-2.0, 2e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2),
    )
    cf = cfm.finalize()
    if dtype == np.float32:
        # FD at f32 needs a bigger probe step and looser agreement.
        def f32_cf(x):
            x32 = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v, np.float32), x
            )
            return cf(x32)

        extra.check_model(f32_cf, cf.domain, key, step=1e-3, rtol=2e-2,
                          atol=2e-2, adjoint_rtol=1e-5)
    else:
        extra.check_model(cf, cf.domain, key)


# --- reference-grade operator-check legs ------------------------------------
# inverse round-trip, dtype purity, side-effect purity
# (parity: /root/reference/src/extra.py:41,156-230,303).


def test_fft_inverse_roundtrip(key):
    extra.check_inverse(fftn, ifftn, _swd((8, 12), np.complex128), key)


def test_hartley_inverse_roundtrip(key):
    # The Hartley transform is its own inverse up to the total mode count.
    n = 8 * 12

    def inv(x):
        return hartley(x) / n

    extra.check_inverse(hartley, inv, _swd((8, 12), np.float64), key)


def test_solver_inverse_roundtrip(key):
    """CG as the INVERSE mode of a linear operator: op = (x -> A x) with
    SPD A; inverse = CG solve.  The analog of the reference's
    InversionEnabler leg of check_linear_operator."""
    from nifty_tpu.solvers.cg import static_cg

    rng = np.random.default_rng(5)
    m = rng.normal(size=(16, 16))
    a = jnp.asarray(m @ m.T + 16 * np.eye(16))

    def op(x):
        return a @ x

    def inv(y):
        x, _ = static_cg(op, y, maxiter=64, resnorm=1e-12)
        return x

    extra.check_inverse(op, inv, _swd((16,), np.float64), key,
                        rtol=1e-7, atol=1e-8)


@pmp("name", ["hartley", "bin_gather", "dof_distributor"])
def test_dtype_purity_matrix(name, key):
    builder, dtypes = _LINEAR_MATRIX[name]
    real_dtypes = [d for d in dtypes if not np.issubdtype(d, np.complexfloating)]
    for dt in real_dtypes:
        fn, dom = builder(dt)
        extra.check_dtype_purity(fn, dom, key, dtypes=[np.dtype(dt).name])


def test_purity_correlated_field(key):
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        (12, 12), distances=1.0 / 12, fluctuations=(1.0, 5e-1),
        loglogavgslope=(-2.0, 2e-1), flexibility=None, asperity=None,
    )
    cf = cfm.finalize()
    x = cf.init(key)
    extra.check_purity(cf, x)


def test_purity_detects_impure_model(key):
    state = {"n": 0}

    def impure(x):
        state["n"] += 1
        return x * state["n"]

    with pytest.raises(AssertionError):
        extra.check_purity(impure, jnp.ones((4,)))


def test_linear_model_full_legs(key):
    """One call exercising every optional leg of check_linear_model at
    once (dtypes sweep + purity + inverse)."""
    n = 8 * 12

    def inv(x):
        return hartley(x) / n

    extra.check_linear_model(
        hartley, _swd((8, 12), np.float64), key,
        dtypes=[np.float64], assert_purity=True, inverse=inv,
    )
