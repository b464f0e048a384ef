"""Causal dynamics priors and light-cone kernels for PDE-like signals.

Capability parity with the classic library's ``dynamic_operator`` /
``dynamic_lightcone_operator`` / ``LightConeOperator``
(``src/library/dynamic_operator.py:133,194``,
``src/library/light_cone_operator.py:97``): a non-parametric prior over
the Green's function of a linear homogeneous dynamical system, optionally
constrained to be causal (step-function support in time), minimum-phase
(cepstrum construction: causalized log-spectrum, then exponentiation), and
confined to a light cone with learned propagation speed(s).

Functional JAX rebuild: the light-cone derivative that the reference
implements by hand (``_LightConeDerivative``) falls out of autodiff; all
transforms are Hartley-based and fuse into the surrounding model.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Union

import numpy as np
from jax import numpy as jnp

from ..model import Model
from ..ops.harmonic import hartley
from ..tree import ShapeWithDtype, random_like


def _coords(shape, distances):
    """Centered signed coordinates per axis, broadcast to ``shape``."""
    out = []
    for i, (n, d) in enumerate(zip(shape, distances)):
        x = (np.arange(n) - n // 2) * d
        x = np.roll(x, -(n // 2))  # fft-style ordering: 0, d, ..., -d
        sl = [None] * len(shape)
        sl[i] = slice(None)
        out.append(x[tuple(sl)])
    return out


def light_cone_kernel(c, shape, distances, sigx: float):
    """Smooth light-cone indicator ``exp(-Δ²/2)`` with
    ``Δ = Re sqrt(-(t/σx dt)² + Σ c_i (x_i/σx dx_i)²)``.

    Axis 0 is time; ``c`` holds the squared inverse lightspeeds per
    spatial axis.  Parity: ``src/library/light_cone_operator.py:69``.
    """
    xs = _coords(shape, distances)
    a = -((jnp.asarray(xs[0]) / (sigx * distances[0])) ** 2)
    a = a.astype(jnp.complex128 if c.dtype == jnp.float64 else jnp.complex64)
    for i in range(len(shape) - 1):
        a = a + c[i] * (jnp.asarray(xs[i + 1]) / (sigx * distances[i + 1])) ** 2
    # Double-where guards the sqrt branch point at the cone boundary
    # (the reference zeroes the derivative there by hand,
    # light_cone_operator.py:84-86; here it keeps autodiff finite).
    on_boundary = jnp.abs(a) < 1e-30
    safe_a = jnp.where(on_boundary, 1.0, a)
    delta = jnp.where(on_boundary, 0.0, jnp.sqrt(safe_a).real)
    return jnp.exp(-0.5 * delta ** 2)


def _step_in_time(shape):
    """1 + sign(t) mask (doubles the causal half, zeroes the acausal)."""
    n = shape[0]
    t = np.roll(np.arange(n) - n // 2, -(n // 2))
    mask = 1.0 + np.sign(t)
    return jnp.asarray(mask.reshape((n,) + (1,) * (len(shape) - 1)))


def _padded_shape(shape, harmonic_padding):
    if harmonic_padding is None:
        return tuple(shape)
    if isinstance(harmonic_padding, int):
        harmonic_padding = [harmonic_padding] * len(shape)
    return tuple(s + p for s, p in zip(shape, harmonic_padding))


def _central_crop(x, shape):
    slices = tuple(
        slice((xs - s) // 2, (xs - s) // 2 + s)
        for xs, s in zip(x.shape, shape)
    )
    return jnp.fft.ifftshift(jnp.fft.fftshift(x)[slices])


def dynamic_operator(
    *,
    shape,
    distances,
    sm_s0: float,
    sm_x0,
    key: str,
    causal: bool = True,
    minimum_phase: bool = False,
    harmonic_padding: Union[None, int, Sequence[int]] = None,
    cone: bool = False,
    lightcone_key: Optional[str] = None,
    sigc=None,
    quant: Optional[float] = None,
):
    """Prior over the harmonic-space Green's function of a dynamic system.

    The log-transfer function is a smooth random field (white latent
    ``key`` smoothed by ``sm_s0 / (1 + Σ (x_i / sm_x0_i)²)`` on a
    zero-padded grid); ``causal`` multiplies the kernel by a time step
    function, ``minimum_phase`` uses the cepstrum construction, and
    ``cone``/``lightcone_key`` confines the kernel to a learned light
    cone.  Returns ``(model, aux_models)`` like the reference.
    """
    shape = tuple(shape)
    distances = tuple(np.broadcast_to(distances, (len(shape),)).astype(float))
    sm_x0 = list(np.broadcast_to(sm_x0, (len(shape),)).astype(float))
    pshape = _padded_shape(shape, harmonic_padding)
    npix_pad = float(np.prod(pshape))

    # Smoothing profile in the (padded) delay domain.
    xs = _coords(pshape, distances)
    prof = 1.0
    for i in range(len(pshape)):
        prof = prof + (np.asarray(xs[i]) / sm_x0[i] / distances[i]) ** 2
    smoother = jnp.asarray(sm_s0 / prof)

    step = _step_in_time(shape)
    domain = {key: ShapeWithDtype(pshape)}
    if cone:
        if len(shape) < 2:
            raise ValueError("light cone requires at least one spatial axis")
        if sigc is None or quant is None:
            raise ValueError("`cone` requires `sigc` and `quant`")
        sigc_arr = np.broadcast_to(sigc, (len(shape) - 1,)).astype(float)
        lk = lightcone_key if lightcone_key is not None else key + "_cone"
        domain[lk] = ShapeWithDtype((len(shape) - 1,))

    def log_transfer(p):
        xi = p[key]
        # smooth log-spectrum on the harmonic grid (padded -> cropped)
        L = hartley(smoother * xi) / npix_pad
        return _central_crop(L, shape)

    def lightspeed(p):
        return jnp.exp(-0.5 * sigc_arr * p[lk]) * (
            jnp.asarray(distances[1:]) / distances[0]
        )

    def greens(p):
        L = log_transfer(p)
        if minimum_phase:
            # cepstrum method: causalize the log-spectrum, then exp
            g = hartley(L) / float(np.prod(shape))
            g = g * step
            G = jnp.exp(hartley(g))
        else:
            G = jnp.exp(L)
            if causal:
                g = hartley(G) / float(np.prod(shape))
                g = g * step
                G = hartley(g)
        if cone:
            c = jnp.exp(sigc_arr * p[lk])
            cone_k = light_cone_kernel(c, shape, distances, quant)
            g = hartley(G) / float(np.prod(shape))
            g = g * cone_k
            G = hartley(g)
        return G

    model = Model(greens, domain=dict(domain),
                  init=partial(random_like, primals=domain))
    aux = {"smoothed_dynamics": Model(
        log_transfer, domain={key: domain[key]},
        init=partial(random_like, primals={key: domain[key]}),
    )}
    if cone:
        aux["lightspeed"] = lightspeed
    return model, aux


def dynamic_lightcone_operator(*, shape, distances, sm_s0, sm_x0, key,
                               lightcone_key, sigc, quant,
                               causal: bool = True,
                               minimum_phase: bool = False,
                               harmonic_padding=None):
    """Green's-function prior confined to a learned light cone.

    Parity: ``src/library/dynamic_operator.py:194``.
    """
    return dynamic_operator(
        shape=shape, distances=distances, sm_s0=sm_s0, sm_x0=sm_x0, key=key,
        causal=causal, minimum_phase=minimum_phase,
        harmonic_padding=harmonic_padding, cone=True,
        lightcone_key=lightcone_key, sigc=sigc, quant=quant,
    )
