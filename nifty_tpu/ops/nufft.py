"""Non-uniform FFT (types 1 and 2) and a radio-interferometry response.

The reference wraps the ducc0 C++ wgridder/nufft
(``src/library/nft.py:63,94,111`` ``dirty2ms``/``ms2dirty``,
``nu2u``/``u2nu``).  TPU-native design:

- the spreading kernel is ducc/FINUFFT's **exp-of-semicircle (ES)**
  kernel ``phi(t) = exp(beta (sqrt(1-t^2) - 1))`` — near-optimal decay
  per width; the image-domain deconvolution factors are its numerically
  quadratured Fourier transform (no closed form needed);
- type 2 (uniform → non-uniform): zero-pad to a σ-oversampled grid,
  deconvolve, FFT, then *gather* a W^d window per target point with ES
  weights (a vmapped batched gather + weighted reduction — XLA batches
  the W^d windows across points);
- type 1 (adjoint): the exact vjp of type 2 — the gather becomes an XLA
  scatter-add — so the operator pair passes adjointness tests by
  construction.  :class:`RadioResponse` additionally pre-sorts its
  (static) uv coordinates by grid cell so the scatter indices are
  memory-ordered.

Accuracy is set by the spreading width ``W``: the ES error scales as
``exp(-pi W sqrt(1 - 1/sigma))`` — at σ=2 roughly ``10^{-W}``-ish:
~1e-7 at W=8 (f32 regime), ~1e-13 at W=16 (f64 regime).  The w-term
(wgridder) is handled by w-stacking in :class:`RadioResponse` when ``w``
values are provided.
"""

from __future__ import annotations

import jax
import numpy as np
from jax import numpy as jnp

from ..model import Model
from ..tree import ShapeWithDtype


#: Points per lax.map batch for large non-uniform point sets (the
#: window gather/scatter then touches ≤ batch·W^d ≈ 4-8M entries per
#: step, the scale measured to run on this runtime).
_POINT_BATCH = 1 << 16
#: Total window entries (npts · W^d) above which nufft2 switches from
#: one vmapped gather to the lax.map point-batched route.
_POINT_BATCH_MIN_ENTRIES = 1 << 23


def _es_beta(sigma: float, width: int) -> float:
    """ES kernel sharpness.  FINUFFT's tuned choice: ``2.30 W`` at σ=2,
    ``pi W (1 - 1/(2σ)) * 0.976`` in general (Barnett, Magland &
    af Klinteberg 2019, §3)."""
    if abs(sigma - 2.0) < 1e-12:
        return 2.30 * width
    return np.pi * width * (1.0 - 1.0 / (2.0 * sigma)) * 0.976


def _es_phi(t, beta: float):
    """ES kernel on the normalized support ``|t| <= 1`` (0 outside)."""
    arg = jnp.maximum(1.0 - t * t, 0.0)
    return jnp.where(
        jnp.abs(t) <= 1.0, jnp.exp(beta * (jnp.sqrt(arg) - 1.0)), 0.0
    )


def _deconv_factors(n: int, n_os: int, width: int, beta: float):
    """Image-domain correction ``1 / psi_hat(x / n_os)`` for the ES
    spreading kernel, on the centered image axis of length ``n``.

    ``psi_hat(xi) = W \\int_0^1 phi(t) cos(pi W xi t) dt`` (kernel even);
    evaluated with 64-node Gauss-Legendre quadrature — exact to f64
    rounding for these smooth integrands.
    """
    t, q = np.polynomial.legendre.leggauss(64)
    # map nodes to [0, 1]
    t = 0.5 * (t + 1.0)
    q = 0.5 * q
    phi = np.exp(beta * (np.sqrt(np.maximum(1.0 - t * t, 0.0)) - 1.0))
    x = (np.arange(n) - n // 2).astype(float) / n_os
    psi_hat = width * np.cos(
        np.pi * width * x[:, None] * t[None, :]
    ) @ (q * phi)
    return 1.0 / psi_hat


def nufft_window_aux(shape, coords, *, sigma: float = 2.0, width: int = 8):
    """Host-precomputed window tables for *static* coords.

    For a fixed measurement layout (radio uv coverage) every W^d window
    tap's flat cell index on the oversampled grid is known at build time,
    as is the sorting permutation that makes the adjoint's scatter a
    sorted segment-sum (ducc's sorted-bin gridder layout,
    ``src/library/nft.py:63``, re-expressed as the distributor's
    sorted-adjoint primitive).  Returns int32 arrays ``cells``
    ((npts, W^d) flat indices), ``perm``/``sorted_ids`` (its argsort and
    image), and ``i0`` ((npts, d) window base offsets, from which the ES
    weights are recomputed on device each call — O(npts·W) exps, cheap).
    Ship the dict through ``Model.consts`` so the multi-MB tables ride as
    runtime buffers, not HLO literals.
    """
    from .pallas_gather import sorted_scatter_aux

    shape = tuple(shape)
    d = len(shape)
    coords = np.asarray(coords, dtype=float)
    n_os = [int(np.round(sigma * n)) for n in shape]
    offs = np.arange(width) - width // 2 + 1
    idx_axes, i0s = [], []
    for ax in range(d):
        x = coords[:, ax] * (n_os[ax] / shape[ax])
        i0 = np.floor(x).astype(np.int64)
        i0s.append(i0)
        idx_axes.append((i0[:, None] + offs[None, :]) % n_os[ax])
    if d == 1:
        cells = idx_axes[0]
    elif d == 2:
        cells = idx_axes[0][:, :, None] * n_os[1] + idx_axes[1][:, None, :]
    elif d == 3:
        cells = (
            idx_axes[0][:, :, None, None] * n_os[1]
            + idx_axes[1][:, None, :, None]
        ) * n_os[2] + idx_axes[2][:, None, None, :]
    else:
        raise NotImplementedError("nufft supports up to 3 dimensions")
    flat = cells.reshape(coords.shape[0], -1).astype(np.int32)
    aux = sorted_scatter_aux(flat)
    return dict(
        cells=flat,
        perm=aux["perm"],
        sorted_ids=aux["sorted_ids"],
        i0=np.stack(i0s, axis=-1).astype(np.int32),
    )


def nufft2(image, coords, *, sigma: float = 2.0, width: int = 8,
           window_consts=None):
    """Type-2 NUFFT: complex visibilities at non-uniform frequencies.

    ``image``: real or complex array (n1, ..., nd), pixel (0,...,0) at the
    *center* (fftshift convention).  ``coords``: (npoints, d) frequencies
    in cycles per full image extent, in [-n/2, n/2).
    Returns ``v_j = Σ_x image[x] exp(-2πi f_j · x / n)``.

    ``window_consts`` (from :func:`nufft_window_aux`, for static coords)
    switches the window interpolation to the sorted-adjoint gather: the
    forward is a flat gather over the oversampled spectrum and the vjp is
    the chunked sorted segment-sum instead of XLA's scatter-add.
    """
    shape = image.shape
    d = len(shape)
    coords = jnp.asarray(coords)
    # Mixed-precision policy (config "transform_compute_dtype"): run the
    # FFT+window interpolation in f32/c64 while callers keep x64 state.
    # On TPU complex128 does not exist in hardware, so this is required
    # for any x64 radio pipeline on chip.
    from .. import config as _cfg

    tcd = _cfg.get("transform_compute_dtype")
    out_dtype = None
    if tcd is not None and image.dtype in (jnp.float64, jnp.complex128):
        out_dtype = jnp.complex128
        image = image.astype(
            jnp.complex64 if jnp.iscomplexobj(image) else jnp.float32
        )
        coords = coords.astype(jnp.float32)
    n_os = [int(np.round(sigma * n)) for n in shape]
    beta = _es_beta(sigma, width)

    # Deconvolution + zero-pad to the oversampled grid (centered).
    corr = image
    for ax, n in enumerate(shape):
        f = jnp.asarray(_deconv_factors(n, n_os[ax], width, beta))
        corr = corr * f.reshape([-1 if a == ax else 1 for a in range(d)])
    pad = [((no - n) // 2, no - n - (no - n) // 2) for n, no in zip(shape, n_os)]
    padded = jnp.pad(corr, pad)
    # FFT with the image centered: shift → FFT → (values on os grid)
    g = jnp.fft.fftn(jnp.fft.ifftshift(padded))

    # Gather W^d window around each target (on the oversampled circle).
    offs = jnp.arange(width) - width // 2 + 1
    half = width / 2.0

    if window_consts is not None:
        from .pallas_gather import sorted_bin_gather

        wc = window_consts
        npts = coords.shape[0]
        gathered = sorted_bin_gather(
            g.ravel(), wc["cells"].reshape(-1), wc["perm"], wc["sorted_ids"]
        )
        # ES weights recomputed on device from the shipped window bases
        # (separable outer product; O(npts·W·d) transcendentals).
        wfull = None
        for ax in range(d):
            x = coords[:, ax] * (n_os[ax] / shape[ax])
            dx = x[:, None] - (wc["i0"][:, ax].astype(x.dtype)[:, None] + offs)
            wa = _es_phi(dx / half, beta)
            wfull = wa if wfull is None else (
                wfull[..., None] * wa[:, *(None,) * (wfull.ndim - 1), :]
            )
        out = jnp.sum(
            gathered.reshape(npts, -1) * wfull.reshape(npts, -1), axis=-1
        )
        return out.astype(out_dtype) if out_dtype is not None else out

    def interp_point(f):
        idx = []
        wgt = []
        for ax in range(d):
            scale = n_os[ax] / shape[ax]
            x = f[ax] * scale  # position on the oversampled freq circle
            i0 = jnp.floor(x).astype(jnp.int32)
            ii = (i0 + offs) % n_os[ax]
            dx = x - (i0 + offs)
            idx.append(ii)
            wgt.append(_es_phi(dx / half, beta))
        if d == 1:
            return jnp.sum(g[idx[0]] * wgt[0])
        if d == 2:
            sub = g[idx[0][:, None], idx[1][None, :]]
            return jnp.sum(sub * (wgt[0][:, None] * wgt[1][None, :]))
        if d == 3:
            sub = g[idx[0][:, None, None], idx[1][None, :, None], idx[2][None, None, :]]
            w = wgt[0][:, None, None] * wgt[1][None, :, None] * wgt[2][None, None, :]
            return jnp.sum(sub * w)
        raise NotImplementedError("nufft supports up to 3 dimensions")

    # Large point sets ride a lax.map over fixed-size batches: the
    # single-shot window scatter (the vjp of one big vmapped gather)
    # faults the TPU worker above ~1e7 window entries (6.4e7 at 1e6
    # pts/W=8, docs/perf.md), while per-batch scatters at the 1e5-point
    # scale are measured good.  The map's transpose is a reverse scan
    # accumulating the spectrum cotangent batch by batch — same FLOPs,
    # bounded op sizes.
    npts = coords.shape[0]
    batch = _POINT_BATCH
    if npts * width ** d > _POINT_BATCH_MIN_ENTRIES and npts > batch:
        k = -(-npts // batch)
        pad = k * batch - npts
        cpad = (
            jnp.concatenate([coords, jnp.zeros((pad, d), coords.dtype)])
            if pad else coords
        )
        out = jax.lax.map(
            lambda cb: jax.vmap(interp_point)(cb),
            cpad.reshape(k, batch, d),
        ).reshape(-1)[:npts]
    else:
        out = jax.vmap(interp_point)(coords)
    return out.astype(out_dtype) if out_dtype is not None else out


def nufft1(shape, values, coords, *, sigma: float = 2.0, width: int = 8):
    """Type-1 NUFFT (adjoint of :func:`nufft2`): grid non-uniform samples.

    Returns ``image[x] = Σ_j v_j exp(+2πi f_j · x / n)`` on the centered
    grid — exactly the vjp of the type-2 transform.
    """
    shape = tuple(shape)

    def fwd(img):
        return nufft2(img, coords, sigma=sigma, width=width)

    proto = jnp.zeros(shape, dtype=jnp.result_type(values.dtype))
    _, vjp = jax.vjp(fwd, proto)
    # vjp computes conj-linear adjoint: <F x, v> = <x, F^H v>
    return jnp.conj(vjp(jnp.conj(values))[0])


class RadioResponse(Model):
    """Radio-interferometry measurement operator: dirty image → vis.

    Optionally applies w-term correction by w-stacking: visibilities are
    grouped into ``n_w_planes`` bins of constant w; each plane applies the
    phase screen ``exp(-2πi w (sqrt(1-l²-m²)-1))`` to the image before the
    2-D NUFFT.  With ``w=None`` this is the coplanar gridder
    (parity: ``src/library/nft.py:30`` Gridder / ``:80`` Nufft).
    """

    #: Window-entry threshold the perf probes use to pick legs.  On-chip
    #: A/B (512²/W=8, docs/perf.md): at 1e5 pts the generic vmapped
    #: window gather wins (0.61 s vs 0.92 s for the type-2+type-1 pair —
    #: the uv pre-sort already makes XLA's scatter memory-ordered), and
    #: above ~1e7 window entries BOTH single-shot routes (generic
    #: scatter and chunked sorted segment-sum) fault the TPU worker, so
    #: large point sets instead take the generic route batched by
    #: ``_POINT_BATCH`` via lax.map.  ``sorted_windows="auto"`` therefore
    #: resolves to False; the sorted tables remain available as an
    #: explicit opt-in (exact, tested) for future runtimes without the
    #: defect.
    SORTED_WINDOW_MIN_ENTRIES = 1 << 24

    def __init__(self, shape, uv, *, pixsize=None, w=None, n_w_planes: int = 8,
                 sigma: float = 2.0, width: int = 8, dtype=None,
                 sorted_windows="auto"):
        self._shape = tuple(shape)
        uv = np.asarray(uv, dtype=float)
        if pixsize is not None:
            # uv in wavelengths -> cycles per image extent
            uv = uv * np.asarray(pixsize) * np.asarray(self._shape)
        # Pre-sort visibilities: primarily by w-plane (when a w column is
        # given), secondarily by base grid cell (row-major on the
        # oversampled grid).  Cell ordering makes the window gathers of
        # neighboring points touch neighboring memory and — more
        # importantly — gives the adjoint's scatter-add (the vjp of the
        # forward gather) monotonically ordered indices, the layout
        # ducc's sorted-bin gridder engineers explicitly
        # (src/library/nft.py:63).  w-plane ordering makes each plane a
        # *contiguous static slice*, so w-stacking spreads every point
        # exactly once (one FFT per plane, not one full NUFFT per plane).
        # The output is un-permuted at the end; sorting is invisible to
        # callers.
        cell = np.floor(uv * sigma).astype(np.int64)
        sort_keys = [cell[:, ax] for ax in range(cell.shape[1] - 1, -1, -1)]
        self._w = None
        if w is not None:
            if pixsize is None:
                raise ValueError("w-correction requires `pixsize`")
            w = np.asarray(w, dtype=float)
            n_w_planes = max(1, min(n_w_planes, len(np.unique(w))))
            w_edges = np.linspace(w.min(), w.max() + 1e-12, n_w_planes + 1)
            w_idx = np.clip(np.digitize(w, w_edges) - 1, 0, n_w_planes - 1)
            sort_keys = sort_keys + [w_idx]
        self._sort = np.lexsort(tuple(sort_keys))
        # Closure constants stay HOST numpy: they embed into programs as
        # HLO literals.  Device-resident closure arrays would be pulled
        # back at lowering for constant embedding, a transfer the axon
        # TPU runtime does not implement for some layouts.
        self._unsort = np.argsort(self._sort)
        uv = uv[self._sort]
        self._uv = uv
        self._sigma, self._width = sigma, width
        if w is not None:
            w_idx = w_idx[self._sort]
            # per-plane contiguous [start, stop) ranges — static ints
            self._w_slices = tuple(
                (int(a), int(b))
                for a, b in zip(
                    np.searchsorted(w_idx, np.arange(n_w_planes)),
                    np.searchsorted(w_idx, np.arange(n_w_planes) + 1),
                )
            )
            self._w_centers = 0.5 * (w_edges[:-1] + w_edges[1:])
            ls = [np.arange(n) - n // 2 for n in self._shape]
            lm = np.meshgrid(
                *[l * p for l, p in zip(ls, np.atleast_1d(pixsize) * np.ones(2))],
                indexing="ij",
            )
            n_term = np.sqrt(np.maximum(1.0 - lm[0] ** 2 - lm[1] ** 2, 0.0)) - 1.0
            self._n_term = n_term  # host constant (see note above)
            self._w = w
        # Sorted-adjoint window tables (multi-MB at npts ≥ 1e5): one set
        # per w-plane slice (coplanar: one for the full sorted uv).  They
        # are `Model.consts` leaves — runtime buffers whenever the model
        # travels as a jit *argument* (`jcall` / the optimize_kl
        # lh-as-argument plumbing), never HLO literals.
        consts = {}
        slices = (
            [(0, uv.shape[0])] if w is None
            else [s for s in self._w_slices]
        )
        if sorted_windows == "auto":
            sorted_windows = False  # see SORTED_WINDOW_MIN_ENTRIES note
        if sorted_windows:
            for i, (a, b) in enumerate(slices):
                if a == b:
                    continue
                aux = nufft_window_aux(
                    self._shape, uv[a:b], sigma=sigma, width=width
                )
                for k, v in aux.items():
                    consts[f"p{i}_{k}"] = jnp.asarray(v)
        super().__init__(
            domain=ShapeWithDtype(self._shape, dtype),
            target=ShapeWithDtype((uv.shape[0],), jnp.complex128 if
                                  jnp.zeros((), float).dtype == jnp.float64
                                  else jnp.complex64),
            consts=consts or None,
        )

    def _plane_consts(self, consts, i):
        if consts is None:
            return None
        keys = ("cells", "perm", "sorted_ids", "i0")
        sub = {k: consts.get(f"p{i}_{k}") for k in keys}
        return sub if all(v is not None for v in sub.values()) else None

    def __call__(self, image):
        consts = self.consts
        if self._w is None:
            vis = nufft2(image, self._uv, sigma=self._sigma,
                         width=self._width,
                         window_consts=self._plane_consts(consts, 0))
            return vis[self._unsort]
        parts = []
        for i, ((a, b), wc) in enumerate(zip(self._w_slices, self._w_centers)):
            if a == b:
                continue
            # phase screen for this plane's central w, applied in the
            # image domain (wgridder w-stacking; src/library/nft.py:63)
            screen = jnp.exp(-2j * np.pi * wc * self._n_term)
            parts.append(
                nufft2(image * screen, self._uv[a:b], sigma=self._sigma,
                       width=self._width,
                       window_consts=self._plane_consts(consts, i))
            )
        vis = jnp.concatenate(parts, axis=0)
        return vis[self._unsort]
