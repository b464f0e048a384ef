"""High-level conveniences.

Parity: remaining pieces of the reference's ``src/sugar.py`` not covered
elsewhere — ``calculate_position`` (``:622``, approximate operator
preimage) and ``density_estimator`` (``:226``, padded correlated-field
density model).  ``makeField/full/from_random/power_analyze/
create_power_operator`` live in :mod:`nifty_tpu.field`; ``exec_time`` in
:mod:`nifty_tpu.instrumentation`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax import numpy as jnp
from jax.tree_util import tree_leaves, tree_map

from .likelihood_impl import Gaussian
from .model import Model
from .solvers.newton_cg import _newton_cg
from .tree import random_like, shape_dtype_like, tree_scale


def calculate_position(model, output, *, key=None, n_iterations: int = 3,
                       newton_maxiter: int = 10):
    """Approximate preimage: find latent ``x`` with ``model(x) ≈ output``.

    Minimizes a tight Gaussian misfit around ``output`` plus the standard
    prior with Newton-CG restarts (the reference runs 3 MGVI iterations;
    here MAP iterations suffice since the target is deterministic).
    """
    key = jax.random.PRNGKey(42) if key is None else key
    scale = max(float(jnp.max(jnp.abs(l))) for l in tree_leaves(output))
    cov = 1e-3 * scale ** 2
    lh = Gaussian(output, noise_cov_inv=lambda x: tree_map(
        lambda v: v / cov, x
    )).amend(model)

    from .optimize_kl import _StandardHamiltonian

    ham = _StandardHamiltonian(lh)
    pos = tree_scale(random_like(key, model.domain), 0.1)
    for _ in range(n_iterations):
        res = _newton_cg(
            ham, pos, maxiter=newton_maxiter, xtol=1e-6,
            cg_kwargs=dict(maxiter=50),
        )
        pos = res.x
    return pos


def density_estimator(
    shape,
    distances,
    *,
    pad: float = 1.0,
    cf_fluctuations: Optional[dict] = None,
    cf_azm_uniform: Optional[tuple] = None,
    prefix: str = "",
):
    """Non-parametric density model: exp of a Matérn correlated field on a
    padded grid, cropped back to ``shape``.

    Returns ``(density_model, correlated_field_maker)``.
    Parity: ``src/sugar.py:226``.
    """
    from .models.correlated_field import CorrelatedFieldMaker
    from .stats import uniform_prior

    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    distances = tuple(np.broadcast_to(distances, (len(shape),)).astype(float))
    cf_fluctuations = cf_fluctuations or {
        "scale": (0.5, 0.3),
        "cutoff": (4.0, 3.0),
        "loglogslope": (-6.0, 3.0),
    }
    azm_uniform = cf_azm_uniform or (1e-4, 1.0)

    padded_shape = tuple(int((1.0 + pad) * s) for s in shape)
    cfm = CorrelatedFieldMaker(prefix + "density")
    cfm.set_amplitude_total_offset(
        offset_mean=0.0, offset_std=uniform_prior(*azm_uniform)
    )
    cfm.add_fluctuations_matern(padded_shape, distances, **cf_fluctuations)
    cf = cfm.finalize()
    crop = tuple(slice(0, s) for s in shape)

    def density(p):
        return jnp.exp(cf(p)[crop])

    return Model(density, domain=cf.domain, init=cf.init), cfm
