"""Correlated field model: structured GP priors with non-parametric power
spectra in the harmonic domain.

A field ``s`` on a regular grid is modeled as

    s = offset + V * HT( A(p) * azm * xi )

with ``xi`` white in harmonic space, ``A`` an amplitude (square-root power)
spectrum distributed from power-space bins onto the full grid, ``azm`` a
global zero-mode scale, and ``HT`` the Hartley transform.  The amplitude is
either *non-parametric* — power law (slope) plus integrated-Wiener-process
deviations over log-k bins (flexibility/asperity) — or a *Matérn* kernel.

TPU-first design choices versus the reference
(``src/re/correlated_field.py``): the Fourier-mode binning is precomputed
on the host in numpy f64 and baked into the program as static constants;
power distribution is a single device gather (its adjoint becomes an XLA
scatter-add/segment-sum under vjp); the Hartley transform takes the rfft
fast path for real fields; all per-bin quantities stay 1-D so XLA fuses
the amplitude chain into the FFT's pointwise prologue.

Parity: ``CorrelatedFieldMaker`` (``:311``), ``add_fluctuations``
(``:343``), ``add_fluctuations_matern`` (``:420``),
``set_amplitude_total_offset`` (``:548``), ``finalize`` (``:640-704``),
``non_parametric_amplitude`` (``:219``), ``matern_amplitude`` (``:149``),
grid metadata (``:84-146``).
"""

from __future__ import annotations

from collections import namedtuple
from functools import partial
from typing import Callable, Mapping, Optional, Tuple, Union

import jax
import numpy as np
from jax import numpy as jnp

from ..model import Model, WrappedCall, wrap
from ..ops.harmonic import (
    fourier_mode_distributor,
    fourier_mode_index_quarter,
    hartley,
)
from ..ops.pallas_gather import distribute_power
from ..stats import lognormal_prior, normal_prior
from ..tree import ShapeWithDtype, random_like
from .gauss_markov import IntegratedWienerProcess

RegularCartesianGrid = namedtuple(
    "RegularCartesianGrid",
    ("shape", "total_volume", "distances", "harmonic_grid"),
    defaults=(None,),
)

RegularFourierGrid = namedtuple(
    "RegularFourierGrid",
    (
        "shape",
        "power_distributor",
        "mode_multiplicity",
        "mode_lengths",
        "relative_log_mode_lengths",
        "log_volume",
        # Same map on the per-axis folded quarter grid (axis length
        # n//2+1): idx_full == idx_q[fold(i0), fold(i1), ...].  Used by
        # `finalize` on large grids to cut distributor gather/scatter work
        # 2^d-fold (see ops.harmonic.fourier_mode_index_quarter).
        "power_distributor_quarter",
    ),
    defaults=(None,),
)

# Spherical-harmonic "grid": modes are the (lmax+1)^2 real coefficients,
# binned by l; the harmonic transform is the TPU-native SHT synthesis.
SphericalHarmonicGrid = namedtuple(
    "SphericalHarmonicGrid",
    (
        "shape",
        "power_distributor",
        "mode_multiplicity",
        "mode_lengths",
        "relative_log_mode_lengths",
        "log_volume",
        "lmax",
        "transform",
        # Precomputed SHT tables (Legendre / phase matrices) that the
        # transform accepts via its `consts=` kwarg.  When their total
        # size crosses RUNTIME_DIST_MIN_BYTES, `finalize` routes them
        # through `Model.consts` so every compiled stage receives them as
        # shared runtime buffers instead of baked HLO constants (at
        # nside=256 the tables are ~4.3 GB — constant-baking overflows
        # the remote-compile request, HTTP 413).
        "transform_consts",
    ),
)


def make_spherical_grid(lmax, nlat=None, nphi=None, *,
                        grid_type: str = "gl",
                        nside=None) -> RegularCartesianGrid:
    """Sphere 'grid' metadata: l-binned power over (lmax+1)^2 real
    coefficients; transform = exact Gauss-Legendre SHT synthesis (or the
    HEALPix two-stage synthesis for ``grid_type="healpix"``) scaled by
    ``1/sqrt(4π)`` so ``fluctuations`` is the pointwise field std (same
    convention as the Fourier branch)."""
    lmax = int(lmax)
    if grid_type.lower() in ("healpix", "hp"):
        from ..ops.healpix_sht import HEALPixSHT

        nside = int(nside) if nside is not None else max(1, (lmax + 1) // 2)
        sht = HEALPixSHT(lmax, nside)
        sht_grid_shape = (sht.npix,)
    else:
        from ..ops.sht import SphericalHarmonicTransform

        sht = SphericalHarmonicTransform(lmax, nlat=nlat, nphi=nphi)
        sht_grid_shape = sht.grid_shape
    totvol = 4.0 * np.pi
    ls = np.asarray(
        np.concatenate(
            [np.arange(lmax + 1)]
            + [np.repeat(np.arange(m, lmax + 1), 2) for m in range(1, lmax + 1)]
        ),
        dtype=np.int32,
    )
    m_length = np.arange(lmax + 1, dtype=np.float64)
    m_count = 2 * np.arange(lmax + 1) + 1
    um = m_length.copy()
    um[1:] = np.log(um[1:])
    um[1:] -= um[1]
    log_vol = um[2:] - um[1:-1]

    def transform(x, axes=None, consts=None):
        return sht.synthesize_real(x, consts=consts) / np.sqrt(totvol)

    harmonic_grid = SphericalHarmonicGrid(
        shape=((lmax + 1) ** 2,),
        power_distributor=ls,
        mode_multiplicity=m_count,
        mode_lengths=m_length,
        relative_log_mode_lengths=um,
        log_volume=log_vol,
        lmax=lmax,
        transform=transform,
        transform_consts=dict(sht.consts),
    )
    return RegularCartesianGrid(
        shape=sht_grid_shape,
        total_volume=totvol,
        distances=None,
        harmonic_grid=harmonic_grid,
    )


def make_grid(shape, distances, harmonic_type="fourier",
              n_bins: Optional[int] = None) -> RegularCartesianGrid:
    """Build grid metadata incl. the power distributor (host precompute).

    ``n_bins`` activates logarithmic power binning: the nonzero modes are
    grouped into at most ``n_bins - 1`` log-uniform ``|k|`` bins (bin 0 is
    the zero mode), the amplitude's IWP then lives on bin centers.  This
    is the classic library's logarithmic ``PowerSpace`` binbounds
    (``src/domains/power_space.py:91`` ``useful_binbounds``) and, on TPU,
    keeps the power-distributor table small enough for the Pallas
    small-table gather at any grid size (a 4096² grid has ~1.2M *unique*
    mode lengths — log binning makes the spectrum resolution a
    user-controlled constant instead).
    """
    if harmonic_type.lower() in ("spherical", "sphere", "sh"):
        # `shape` is interpreted as lmax for spherical grids.
        return make_spherical_grid(shape)
    if harmonic_type.lower() in ("healpix", "hp"):
        return make_spherical_grid(shape, grid_type="healpix")
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    distances = tuple(np.broadcast_to(distances, (len(shape),)).astype(float))
    totvol = float(np.prod(np.array(shape) * np.array(distances)))
    if harmonic_type.lower() != "fourier":
        raise ValueError(f"invalid `harmonic_type` {harmonic_type!r}")

    m_length_idx, m_length, m_count = fourier_mode_distributor(shape, distances)
    m_length_idx_q = fourier_mode_index_quarter(shape, distances, m_length)
    if n_bins is not None and m_length.size > n_bins:
        m_length_idx, m_length, m_count, dense = _log_binned_distributor(
            m_length_idx, m_length, m_count, int(n_bins)
        )
        m_length_idx_q = dense[m_length_idx_q].astype(np.int32)
    # Relative log mode lengths: um[0] = 0 (zero mode), um[k>=1] =
    # log(k_len) - log(k_len[1]); log_volume are the log-k bin widths the
    # IWP deviations integrate over.
    um = m_length.copy()
    um[1:] = np.log(um[1:])
    um[1:] -= um[1]
    assert um[0] == 0.0
    log_vol = um[2:] - um[1:-1]

    harmonic_grid = RegularFourierGrid(
        shape=shape,
        power_distributor=m_length_idx,
        mode_multiplicity=m_count,
        mode_lengths=m_length,
        relative_log_mode_lengths=um,
        log_volume=log_vol,
        power_distributor_quarter=m_length_idx_q,
    )
    return RegularCartesianGrid(
        shape=shape,
        total_volume=totvol,
        distances=distances,
        harmonic_grid=harmonic_grid,
    )


def _log_binned_distributor(m_length_idx, m_length, m_count, n_bins):
    """Regroup unique-|k| modes into log-uniform bins (host precompute).

    Bin 0 keeps the zero mode alone; the nonzero lengths are split into at
    most ``n_bins - 1`` log-uniform bins (empty bins dropped).  Each bin's
    representative length is the multiplicity-weighted mean of its member
    lengths, matching the classic ``PowerSpace`` ``k_lengths`` convention
    (``src/domains/power_space.py:222``).
    """
    k1, kmax = m_length[1], m_length[-1]
    edges = np.exp(np.linspace(np.log(k1), np.log(kmax), n_bins))
    # bin of each unique length: 0 for the zero mode; else the log bin
    ub = np.zeros(m_length.size, dtype=np.int64)
    ub[1:] = 1 + np.searchsorted(edges[1:-1], m_length[1:], side="right")
    # drop empty bins by re-indexing densely
    occupied, dense = np.unique(ub, return_inverse=True)
    nb = occupied.size
    w = m_count.astype(np.float64)
    b_count = np.bincount(dense, weights=w, minlength=nb)
    b_len = np.bincount(dense, weights=w * m_length, minlength=nb) / b_count
    b_len[0] = 0.0
    new_idx = dense[m_length_idx].astype(np.int32)
    return new_idx, b_len, b_count.astype(np.int64), dense


def _mirror_expand(a, axis, n):
    """Expand a per-axis folded (quarter-grid) array to the full
    fft-ordered axis of length ``n``: full index ``i`` reads folded index
    ``min(i, n - i)``.  Pure slice/flip/concat — no gather; the autodiff
    transpose is the slice+add fold, likewise gather-free and
    mesh-deterministic."""
    q = a.shape[axis]
    assert q == n // 2 + 1, (q, n)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(1, n - q + 1)
    tail = jnp.flip(a[tuple(sl)], axis=axis)
    return jnp.concatenate([a, tail], axis=axis)


def _detrend(log_k_rel, x):
    """Subtract the straight line through the origin and ``x``'s endpoint
    (in relative-log-k coordinates), so deviations carry no net slope."""
    return x - x[-1] * (log_k_rel / log_k_rel[-1])


def _as_prior(x, default, what):
    if isinstance(x, (tuple, list)):
        return default(*x)
    if callable(x):
        return x
    raise TypeError(f"invalid `{what}` specified; got {type(x)!r}")


def non_parametric_amplitude(
    grid: RegularCartesianGrid,
    fluctuations: Callable,
    loglogavgslope: Callable,
    flexibility: Optional[Callable] = None,
    asperity: Optional[Callable] = None,
    prefix: str = "",
    kind: str = "amplitude",
) -> Model:
    """Non-parametric amplitude spectrum: power law + IWP deviations.

    Parity: ``src/re/correlated_field.py:219``.
    """
    # `kind` decides whether the returned table multiplies harmonic modes
    # directly ("amplitude") or is a power spectrum whose sqrt does
    # ("power"); both share one normalization formula with a different
    # exponent on the shape function.
    if kind.lower() not in ("amplitude", "power"):
        raise ValueError(f"invalid kind {kind!r}")
    expo = 2.0 if kind.lower() == "amplitude" else 1.0

    vol = grid.total_volume
    log_k_rel = jnp.asarray(grid.harmonic_grid.relative_log_mode_lengths)
    multiplicity = jnp.asarray(grid.harmonic_grid.mode_multiplicity, dtype=float)
    bin_log_vol = np.asarray(grid.harmonic_grid.log_volume)

    fluct_m = WrappedCall(
        fluctuations, name=prefix + "fluctuations", white_init=True
    )
    slope_m = WrappedCall(
        loglogavgslope, name=prefix + "loglogavgslope", white_init=True
    )
    latents = dict(fluct_m.domain)
    latents.update(slope_m.domain)

    wiggle_m = None
    if flexibility is not None and bin_log_vol.size > 0:
        flex_m = WrappedCall(
            flexibility, name=prefix + "flexibility", white_init=True
        )
        asp_m = None
        if asperity is not None:
            asp_m = WrappedCall(
                asperity, name=prefix + "asperity", white_init=True
            )
        # Smooth spectrum deviations: an integrated Wiener process over
        # log-k, whose increments live on the log-k bin volumes.
        wiggle_m = IntegratedWienerProcess(
            jnp.zeros((2,)),
            flex_m,
            jnp.asarray(bin_log_vol),
            name=prefix + "spectrum",
            asperity=asp_m,
        )
        latents.update(wiggle_m.domain)

    def amplitude(primals: Mapping) -> jnp.ndarray:
        # Shape in log-log space: straight power law + de-trended IWP path.
        log_shape = slope_m(primals) * log_k_rel
        if wiggle_m is not None:
            path = wiggle_m(primals)[:, 0]  # IWP position component
            path = jnp.concatenate((jnp.zeros((1,)), path))  # pin zero mode
            log_shape = log_shape + _detrend(log_k_rel, path)
        shape = jnp.exp(log_shape)

        # Normalize so `fluctuations` is the a-priori total std of the
        # field: divide by the multiplicity-weighted band integral of the
        # shape (harmonic-space integral brings in the total volume).
        band = jnp.sum(multiplicity[1:] * shape[1:] ** expo)
        scale = fluct_m(primals) * vol / jnp.sqrt(band)
        amp = scale * shape ** (expo / 2.0)
        return amp.at[0].set(vol)

    m = Model(
        amplitude, domain=dict(latents),
        init=partial(random_like, primals=latents),
    )
    m.fluctuation_amplitude = fluct_m
    return m


def matern_amplitude(
    grid: RegularCartesianGrid,
    scale: Callable,
    cutoff: Callable,
    loglogslope: Callable,
    renormalize_amplitude: bool = False,
    prefix: str = "",
    kind: str = "amplitude",
) -> Model:
    """Matérn-kernel amplitude: A(k) = a (1 + (k/b)^2)^{c/4}.

    Parity: ``src/re/correlated_field.py:149``.
    """
    totvol = grid.total_volume
    mode_lengths = jnp.asarray(grid.harmonic_grid.mode_lengths)
    mode_multiplicity = jnp.asarray(grid.harmonic_grid.mode_multiplicity, dtype=float)

    scale = WrappedCall(scale, name=prefix + "scale")
    ptree = dict(scale.domain)
    cutoff = WrappedCall(cutoff, name=prefix + "cutoff")
    ptree.update(cutoff.domain)
    loglogslope = WrappedCall(loglogslope, name=prefix + "loglogslope")
    ptree.update(loglogslope.domain)

    def amplitude(primals: Mapping) -> jnp.ndarray:
        scl = scale(primals)
        ctf = cutoff(primals)
        slp = loglogslope(primals)
        ln_spectrum = 0.25 * slp * jnp.log1p((mode_lengths / ctf) ** 2)
        spectrum = jnp.exp(ln_spectrum)

        norm = 1.0
        if renormalize_amplitude:
            if kind.lower() == "amplitude":
                norm = jnp.sqrt(jnp.sum(mode_multiplicity[1:] * spectrum[1:] ** 4))
            elif kind.lower() == "power":
                norm = jnp.sqrt(jnp.sum(mode_multiplicity[1:] * spectrum[1:] ** 2))
            norm /= jnp.sqrt(totvol)
        spectrum = scl * (jnp.sqrt(totvol) / norm) * spectrum
        spectrum = spectrum.at[0].set(totvol)
        if kind.lower() == "power":
            spectrum = jnp.sqrt(spectrum)
        elif kind.lower() != "amplitude":
            raise ValueError(f"invalid kind {kind!r}")
        return spectrum

    m = Model(
        amplitude, domain=dict(ptree), init=partial(random_like, primals=ptree)
    )
    m.fluctuation_amplitude = scale
    return m


class CorrelatedFieldMaker:
    """Construction helper for hierarchical correlated field models.

    Parity: ``src/re/correlated_field.py:311``; see class docstring there
    for the modeling background.  Each ``add_fluctuations*`` call adds one
    target subgrid; ``finalize`` composes power distribution → outer
    product → zero-mode scaling → Hartley transform → offset.
    """

    #: Distributor index maps at or above this size become dynamic model
    #: ``consts`` (runtime device buffers shared across all compiled
    #: programs) instead of per-executable embedded constants; below it
    #: they stay static so the TPU gather kernels (MXU one-hot /
    #: select-loop, ops/pallas_gather.py) can specialize on them.
    RUNTIME_DIST_MIN_BYTES = 2**20

    def __init__(self, prefix: str):
        self._azm = None
        self._offset_mean = None
        self._fluct_logparams = []
        self._fluctuations = []
        self._target_grids = []
        self._parameter_tree = {}
        self._prefix = prefix

    def add_fluctuations(
        self,
        shape: Union[tuple, int],
        distances: Union[tuple, float],
        fluctuations: Union[tuple, Callable],
        loglogavgslope: Union[tuple, Callable],
        flexibility: Union[tuple, Callable, None] = None,
        asperity: Union[tuple, Callable, None] = None,
        prefix: str = "",
        harmonic_type: str = "fourier",
        non_parametric_kind: str = "amplitude",
        n_bins: Optional[int] = None,
    ):
        """Add a non-parametric correlation structure on a new subgrid.

        ``n_bins`` (TPU-native extension): logarithmically bin the power
        spectrum to at most this many bins — see :func:`make_grid`.
        """
        grid = make_grid(shape, distances, harmonic_type, n_bins=n_bins)
        from ..stats import lognormal_moments

        self._fluct_logparams.append(
            lognormal_moments(*fluctuations)
            if isinstance(fluctuations, (tuple, list)) else None
        )
        npa = non_parametric_amplitude(
            grid=grid,
            fluctuations=_as_prior(fluctuations, lognormal_prior, "fluctuations"),
            loglogavgslope=_as_prior(loglogavgslope, normal_prior, "loglogavgslope"),
            flexibility=(
                None if flexibility is None
                else _as_prior(flexibility, lognormal_prior, "flexibility")
            ),
            asperity=(
                None if asperity is None
                else _as_prior(asperity, lognormal_prior, "asperity")
            ),
            prefix=self._prefix + prefix,
            kind=non_parametric_kind,
        )
        self._fluctuations.append(npa)
        self._target_grids.append(grid)
        self._update_parameter_tree(npa.domain)

    def _update_parameter_tree(self, dom):
        # The reference silently overwrites colliding latent keys when two
        # subgrids share a prefix, producing shape errors only much later
        # at apply time.  Fail fast instead with an actionable message.
        clash = set(dom) & set(self._parameter_tree)
        if clash:
            raise ValueError(
                f"latent parameter keys {sorted(clash)} already exist; "
                "pass a distinct `prefix=` to each add_fluctuations* call"
            )
        self._parameter_tree.update(dom)

    def add_fluctuations_matern(
        self,
        shape: Union[tuple, int],
        distances: Union[tuple, float],
        scale: Union[tuple, Callable],
        cutoff: Union[tuple, Callable],
        loglogslope: Union[tuple, Callable],
        renormalize_amplitude: bool = False,
        prefix: str = "",
        harmonic_type: str = "fourier",
        non_parametric_kind: str = "amplitude",
        n_bins: Optional[int] = None,
    ):
        """Add a Matérn-kernel correlation structure on a new subgrid."""
        grid = make_grid(shape, distances, harmonic_type, n_bins=n_bins)
        self._fluct_logparams.append(
            None  # matern `scale` has its own parametrization
        )
        ma = matern_amplitude(
            grid=grid,
            scale=_as_prior(scale, lognormal_prior, "scale"),
            cutoff=_as_prior(cutoff, lognormal_prior, "cutoff"),
            loglogslope=_as_prior(loglogslope, normal_prior, "loglogslope"),
            renormalize_amplitude=renormalize_amplitude,
            prefix=self._prefix + prefix,
            kind=non_parametric_kind,
        )
        self._fluctuations.append(ma)
        self._target_grids.append(grid)
        self._update_parameter_tree(ma.domain)

    def set_amplitude_total_offset(self, offset_mean, offset_std):
        """Set the global offset mean and the zero-mode std prior."""
        self._offset_mean = offset_mean
        zm = offset_std
        self._offset_std_logparams = None
        if not callable(zm):
            if zm is None or len(zm) != 2:
                raise TypeError(f"invalid `offset_std` {zm!r}")
            from ..stats import lognormal_moments

            self._offset_std_logparams = lognormal_moments(*zm)
            zm = lognormal_prior(*zm)
        self._azm = wrap(zm, self._prefix + "zeromode")
        self._parameter_tree[self._prefix + "zeromode"] = ShapeWithDtype(())

    @property
    def amplitude_total_offset(self) -> Callable:
        if self._azm is None:
            raise RuntimeError("set `amplitude_total_offset` first")
        return self._azm

    azm = amplitude_total_offset

    @property
    def fluctuations(self) -> Tuple[Callable, ...]:
        return tuple(self._fluctuations)

    def get_normalized_amplitudes(self) -> Tuple[Callable, ...]:
        """Amplitudes with the degenerate zero-mode divided out."""

        def mk(amp):
            def normed(p):
                return amp(p).at[1:].mul(1.0 / self.azm(p))

            return normed

        return tuple(mk(a) for a in self._fluctuations)

    @property
    def amplitude(self) -> Callable:
        if len(self._fluctuations) > 1:
            raise NotImplementedError(
                "multiple spectra have no unique absolute amplitude"
            )
        amp = self._fluctuations[0]

        def amplitude_w_zm(p):
            return amp(p).at[0].mul(self.azm(p))

        return amplitude_w_zm

    @property
    def power_spectrum(self) -> Callable:
        amp = self.amplitude
        return lambda p: amp(p) ** 2

    # -- a-priori moment statistics (parity:
    # src/library/correlated_fields.py:1021,1033,1050,957) ---------------

    def fluctuation_amplitudes(self) -> Tuple[Callable, ...]:
        return tuple(a.fluctuation_amplitude for a in self._fluctuations)

    def total_fluctuation(self) -> Callable:
        """A-priori total fluctuation of the multi-space field (callable
        on latent positions)."""
        if not self._fluctuations:
            raise NotImplementedError
        if len(self._fluctuations) == 1:
            return self.average_fluctuation(0)
        fls = self.fluctuation_amplitudes()
        azm = self.azm

        def total(p):
            q = 1.0
            for fl in fls:
                q = q * (1.0 + (fl(p) / azm(p)) ** 2)
            return jnp.sqrt(q - 1.0) * azm(p)

        return total

    def average_fluctuation(self, space: int) -> Callable:
        """Fluctuations of the field averaged over the other sub-spaces."""
        fls = self.fluctuation_amplitudes()
        if space >= len(fls):
            raise ValueError(f"invalid space {space!r}")
        return fls[0] if len(fls) == 1 else fls[space]

    def slice_fluctuation(self, space: int) -> Callable:
        """Fluctuations of a single slice along sub-space ``space``."""
        fls = self.fluctuation_amplitudes()
        if space >= len(fls):
            raise ValueError(f"invalid space {space!r}")
        if len(fls) == 1:
            return self.average_fluctuation(0)
        azm = self.azm

        def slice_fl(p):
            q = 1.0
            for j, fl in enumerate(fls):
                r = (fl(p) / azm(p)) ** 2
                q = q * (r if j == space else 1.0 + r)
            return jnp.sqrt(q) * azm(p)

        return slice_fl

    def moment_slice_to_average(self, fluctuations_slice_mean: float,
                                key=None, nsamples: int = 1000) -> float:
        """Translate single-space slice fluctuations into the average
        fluctuations of a multi-space setup (MC estimate)."""
        import jax as _jax

        fluctuations_slice_mean = float(fluctuations_slice_mean)
        if fluctuations_slice_mean <= 0:
            raise ValueError("fluctuations_slice_mean must be positive")
        key = _jax.random.PRNGKey(42) if key is None else key
        scm = np.ones(nsamples)
        for a in self._fluctuations:
            fl = a.fluctuation_amplitude
            dom = {**fl.domain, self._prefix + "zeromode":
                   ShapeWithDtype(())}
            keys = _jax.random.split(key, nsamples)
            key = keys[0]

            def one(k):
                p = random_like(k, dom)
                return fl(p) / self.azm(p)

            vals = np.asarray(_jax.vmap(one)(keys))
            scm = scm * (vals ** 2 + 1.0)
        return fluctuations_slice_mean / float(np.mean(np.sqrt(scm)))

    # -- realized statistics (parity: correlated_fields.py:1070-1115) ----

    @staticmethod
    def total_fluctuation_realized(samples) -> float:
        """Spatial-std statistic over stacked field samples (N, *spatial)."""
        s = jnp.asarray(samples)
        ax = tuple(range(1, s.ndim))
        res = (s - s.mean(axis=ax, keepdims=True)) ** 2
        return float(jnp.sqrt(res.mean()))

    @staticmethod
    def average_fluctuation_realized(samples, sub_axes, space: int) -> float:
        """Fluctuations of samples averaged over the other sub-spaces;
        ``sub_axes`` are the per-subdomain axis tuples (sample axis 0
        excluded)."""
        s = jnp.asarray(samples)
        other = tuple(
            a + 1 for j, axes in enumerate(sub_axes) if j != space
            for a in axes
        )
        r = s.mean(axis=other) if other else s
        ax = tuple(range(1, r.ndim))
        res = (r - r.mean(axis=ax, keepdims=True)) ** 2
        return float(jnp.sqrt(res.mean()))

    @staticmethod
    def slice_fluctuation_realized(samples, sub_axes, space: int) -> float:
        """Variability within slices along sub-space ``space``."""
        s = jnp.asarray(samples)
        space_axes = tuple(a + 1 for a in sub_axes[space])
        res = s ** 2 - s.mean(axis=space_axes, keepdims=True) ** 2
        return float(jnp.sqrt(res.mean()))

    def finalize(self, hartley_fn: Optional[Callable] = None,
                 total_N: int = 0, dofdex=None) -> Model:
        """Compose and return the correlated field as a :class:`Model`.

        Parameters
        ----------
        hartley_fn : callable(x, axes) or None
            Override for the Hartley transform, e.g. a mesh-sharded pencil
            transform (:func:`nifty_tpu.ops.distributed_fft
            .distributed_hartley`) for fields whose axes live on a device
            mesh.  Defaults to the local rfft-based transform.
        total_N : int
            Number of batched fields sharing this model's hyperparameters
            (0 = single field).
        dofdex : sequence of int, optional
            Parameter-set index per batch entry (defaults to independent
            sets, ``range(total_N)``); ``total_N * [0]`` shares one set.
        """
        excitation_shape = ()
        sub_axes = []
        for grid in self._target_grids:
            sub_shp = grid.harmonic_grid.shape
            excitation_shape += sub_shp
            n = len(excitation_shape)
            sub_axes.append(tuple(range(n - len(sub_shp), n)))

        pfx = self._prefix + "xi"
        self._parameter_tree[pfx] = ShapeWithDtype(excitation_shape)

        grids = tuple(self._target_grids)
        namps = self.get_normalized_amplitudes()
        offset_mean = self._offset_mean
        azm = self.azm
        # Per-subgrid Hartley transforms over that subgrid's axes (the
        # composition over disjoint axis groups, matching the reference's
        # outer harmonic transform; identical to a joint transform for a
        # single subgrid).
        spherical = [
            isinstance(g.harmonic_grid, SphericalHarmonicGrid) for g in grids
        ]
        if any(spherical) and len(grids) > 1:
            raise NotImplementedError(
                "spherical subgrids are only supported as the sole subgrid"
            )
        ht = hartley if hartley_fn is None else hartley_fn
        transforms = tuple(
            (1.0, g.harmonic_grid.transform, axes) if sph
            else (1.0 / g.total_volume, ht, axes)
            for g, axes, sph in zip(grids, sub_axes, spherical)
        )
        # Spherical transforms with large precomputed tables (Legendre /
        # phase matrices): route the tables through `Model.consts` as
        # runtime buffers — same rationale (and threshold) as the
        # distributor maps below.  Small tables stay baked constants.
        sht_routed = tuple(
            sph
            and getattr(g.harmonic_grid, "transform_consts", None) is not None
            and sum(
                int(np.asarray(v).nbytes)
                for v in g.harmonic_grid.transform_consts.values()
            )
            >= self.RUNTIME_DIST_MIN_BYTES
            for g, sph in zip(grids, spherical)
        )
        sht_consts = {}
        for i, (g, routed) in enumerate(zip(grids, sht_routed)):
            if routed:
                for k, v in g.harmonic_grid.transform_consts.items():
                    sht_consts[f"sht{i}_{k}"] = jnp.asarray(v)

        def outer_harmonic_transform(x, c=None):
            # Mixed-precision policy (config "transform_compute_dtype"):
            # run the transform itself in f32 while the ambient dtype (and
            # with it the latent state, nonlinearities, and energy
            # reductions) stays f64.  On TPU this is the accuracy-grade
            # mode — complex128 FFTs are unsupported in hardware — and it
            # measurably recovers f64-quality posteriors (config.py).
            from .. import config as _cfg

            tcd = _cfg.get("transform_compute_dtype")
            for i, (dvol, tf, axes) in enumerate(transforms):
                xin = x
                if (
                    tcd is not None
                    and jnp.issubdtype(x.dtype, jnp.floating)
                    and x.dtype != jnp.dtype(tcd)
                ):
                    xin = x.astype(tcd)
                if sht_routed[i] and c is not None:
                    tc = {
                        k: c[f"sht{i}_{k}"]
                        for k in grids[i].harmonic_grid.transform_consts
                    }
                    y = tf(xin, axes=axes, consts=tc)
                else:
                    y = tf(xin, axes=axes)
                x = dvol * (y.astype(x.dtype) if y.dtype != x.dtype else y)
            return x

        # Distributor index maps.  Small maps ride as *static* numpy
        # constants — the static-index primitives then select the MXU
        # one-hot / select-loop TPU kernels (see ops/pallas_gather.py).
        # Maps above ``RUNTIME_DIST_MIN_BYTES`` instead become dynamic
        # ``consts`` leaves of the returned Model: they enter every
        # compiled program as ONE shared runtime device buffer rather
        # than a per-executable embedded constant (67 MB per stage
        # executable at 4096² unbinned — the round-3 HBM exhaustion;
        # at that scale the gather is XLA-routed anyway, so nothing is
        # lost kernel-wise).
        # Large grids additionally switch to the *quarter-grid* map: power
        # is distributed on the per-axis folded grid (axis length n//2+1)
        # and mirror-expanded with pure slice/flip/concat — 2^d-fold less
        # gather/scatter work in every metric matvec, and the expansion's
        # autodiff transpose is a gather-free slice+add fold.
        use_quarter = tuple(
            getattr(g.harmonic_grid, "power_distributor_quarter", None)
            is not None
            and np.asarray(g.harmonic_grid.power_distributor).nbytes
            >= self.RUNTIME_DIST_MIN_BYTES
            for g in grids
        )
        distributors = tuple(
            np.asarray(
                g.harmonic_grid.power_distributor_quarter if uq
                else g.harmonic_grid.power_distributor
            )
            for g, uq in zip(grids, use_quarter)
        )
        as_runtime = tuple(
            d.nbytes >= self.RUNTIME_DIST_MIN_BYTES for d in distributors
        )
        consts = {
            f"power_distributor_{i}": jnp.asarray(d)
            for i, (d, r) in enumerate(zip(distributors, as_runtime)) if r
        }
        # Sorted-adjoint auxiliaries for grid-scale runtime maps: the XLA
        # scatter-add transpose of the distributor gather costs ~36 ms at
        # 4096^2-unbinned per metric matvec; the sorted segment-sum with
        # a host-precomputed permutation costs ~0.05 ms (docs/perf.md).
        from ..ops.pallas_gather import sorted_scatter_aux

        dist_aux = tuple(
            sorted_scatter_aux(d) if r else None
            for d, r in zip(distributors, as_runtime)
        )
        for i, a in enumerate(dist_aux):
            if a is not None:
                consts[f"pd_perm_{i}"] = jnp.asarray(a["perm"])
                consts[f"pd_sorted_{i}"] = jnp.asarray(a["sorted_ids"])
        consts.update(sht_consts)
        consts = consts or None

        def resolve_distributors(c):
            return tuple(
                c[f"power_distributor_{i}"] if r else d
                for i, (d, r) in enumerate(zip(distributors, as_runtime))
            )

        def resolve_dist_aux(c):
            if c is None:
                return (None,) * len(dist_aux)
            return tuple(
                {"perm": c[f"pd_perm_{i}"],
                 "sorted_ids": c[f"pd_sorted_{i}"]}
                if a is not None else None
                for i, a in enumerate(dist_aux)
            )

        def distribute_subgrid(t, dist, g, uq, aux=None):
            amp = distribute_power(t, dist, sorted_aux=aux)
            if uq:
                for ax, n in enumerate(g.harmonic_grid.shape):
                    amp = _mirror_expand(amp, ax, n)
            return amp

        def outer_amplitude(dists, auxs, p, scale=None):
            # The zero-mode scalar multiplies the *small* amplitude table
            # before distribution: `azm * gather(t) == gather(azm * t)`
            # bitwise (identical per-element products), it saves one
            # full-grid multiply pass, and the scalar's cotangent becomes
            # a small replicated-table reduction (deterministic across
            # meshes) instead of a grid-wide autodiff reduction.
            t0 = namps[0](p)
            if scale is not None:
                t0 = scale * t0
            outer = distribute_subgrid(
                t0, dists[0], grids[0], use_quarter[0], auxs[0]
            )
            for amp, dist, g, uq, aux in zip(
                namps[1:], dists[1:], grids[1:], use_quarter[1:], auxs[1:]
            ):
                outer = jnp.tensordot(
                    outer, distribute_subgrid(amp(p), dist, g, uq, aux),
                    axes=0,
                )
            return outer

        def correlated_field(*args):
            c, p = args if consts is not None else (None, *args)
            dists = resolve_distributors(c) if c is not None else distributors
            auxs = resolve_dist_aux(c)
            ea = outer_amplitude(dists, auxs, p, scale=azm(p))
            cf_h = ea * p[pfx]
            return offset_mean + outer_harmonic_transform(cf_h, c)

        if total_N > 0:
            # Batched fields (parity: classic `total_N`/`dofdex`,
            # src/library/correlated_fields.py:434,447): `total_N` fields
            # share `n_sets` parameter sets (`dofdex[b]` selects the set
            # of batch entry b); excitations are per-field.  TPU-first:
            # one vmap over the batch with per-set parameters gathered —
            # all batch members run in a single fused program.
            dofdex = list(range(total_N)) if dofdex is None else list(dofdex)
            if len(dofdex) != total_N:
                raise ValueError("len(dofdex) must equal total_N")
            n_sets = max(dofdex) + 1
            dofdex_arr = jnp.asarray(np.asarray(dofdex, dtype=np.int32))
            param_keys = [k for k in self._parameter_tree if k != pfx]
            batched_tree = {
                k: ShapeWithDtype((n_sets,) + tuple(v.shape), v.dtype)
                for k, v in self._parameter_tree.items() if k != pfx
            }
            batched_tree[pfx] = ShapeWithDtype(
                (total_N,) + excitation_shape,
                self._parameter_tree[pfx].dtype,
            )

            def batched_field(*args):
                c, p = args if consts is not None else (None, *args)
                dists = (
                    resolve_distributors(c) if c is not None else distributors
                )
                auxs = resolve_dist_aux(c)

                def field_one(pset, xi):
                    ea = outer_amplitude(dists, auxs, pset, scale=azm(pset))
                    cf_h = ea * xi
                    return offset_mean + outer_harmonic_transform(cf_h, c)

                psets = {k: p[k][dofdex_arr] for k in param_keys}
                return jax.vmap(field_one)(psets, p[pfx])

            init = {
                k: partial(random_like, primals=v)
                for k, v in batched_tree.items()
            }
            cf = Model(
                batched_field, domain=dict(batched_tree), init=init,
                consts=consts,
            )
            cf.normalized_amplitudes = namps
            cf.target_grids = grids
            return cf

        init = {
            k: partial(random_like, primals=v)
            for k, v in self._parameter_tree.items()
        }
        cf = Model(
            correlated_field, domain=dict(self._parameter_tree), init=init,
            consts=consts,
        )
        cf.normalized_amplitudes = namps
        cf.target_grids = grids
        return cf


def SimpleCorrelatedField(
    shape,
    distances,
    *,
    offset_mean=0.0,
    offset_std=(1e-1, 1e-2),
    fluctuations=(1.0, 0.5),
    loglogavgslope=(-3.0, 0.5),
    flexibility=(1.0, 0.5),
    asperity=None,
    prefix: str = "cf",
    harmonic_type: str = "fourier",
    hartley_fn=None,
    n_bins: Optional[int] = None,
) -> Model:
    """Single-subdomain convenience correlated field.

    Parity: ``src/library/correlated_fields_simple.py:38``; ``n_bins``
    is the TPU-native log-binning extension (see :func:`make_grid`).
    """
    cfm = CorrelatedFieldMaker(prefix)
    cfm.set_amplitude_total_offset(offset_mean=offset_mean,
                                   offset_std=offset_std)
    cfm.add_fluctuations(
        shape, distances, fluctuations=fluctuations,
        loglogavgslope=loglogavgslope, flexibility=flexibility,
        asperity=asperity, harmonic_type=harmonic_type, n_bins=n_bins,
    )
    cf = cfm.finalize(hartley_fn=hartley_fn)
    cf.maker = cfm
    return cf


def adjust_variances(position: dict, maker: CorrelatedFieldMaker,
                     space: int = 0) -> dict:
    """Rebalance the xi/amplitude split of a correlated-field position.

    Rescales the non-zero-mode harmonic excitations to unit sample
    variance and absorbs the factor into the ``fluctuations`` latent
    (exact for lognormal fluctuation priors), leaving the realized field
    unchanged — the capability of the classic ``adjust_variances``
    (``src/library/adjust_variances.py:26,81``) without an inner
    optimization loop.
    """
    lp = maker._fluct_logparams[space]
    if lp is None:
        raise ValueError(
            "adjust_variances requires (mean, std) `fluctuations`"
        )
    xi_key = maker._prefix + "xi"
    npa = maker._fluctuations[space]
    flu_key = next(k for k in npa.domain if k.endswith("fluctuations"))
    pos = dict(position)
    xi = pos[xi_key]
    fct = jnp.sqrt(jnp.mean(xi ** 2))
    zero_idx = (0,) * jnp.ndim(xi)
    xi_new = xi / fct
    xi_new = xi_new.at[zero_idx].set(xi[zero_idx])  # zero mode untouched
    pos[xi_key] = xi_new
    # flu = exp(mu + sigma z); flu_new = flu * fct  =>  z += log(fct)/sigma
    _, log_std = lp
    pos[flu_key] = pos[flu_key] + jnp.log(fct) / log_std
    return pos
