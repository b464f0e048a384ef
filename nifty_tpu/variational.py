"""Parametric ("black-box") variational inference: mean-field and
full-covariance Gaussian posteriors with the reparametrization trick.

Capability parity with the classic stack's ``MeanFieldVI`` /
``FullCovarianceVI`` / ``GaussianEntropy`` / ``ADVIOptimizer``
(``src/library/variational_models.py:36,123,217``,
``src/minimization/stochastic_minimizer.py:22``) — rebuilt TPU-first: the
ELBO loss (sample-averaged Hamiltonian minus Gaussian entropy) is a pure
jitted function of the variational parameters, optimized with optax
(Adam by default); sample draws vmap over a batch of keys, so one update
is a single XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.flatten_util
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.tree_util import tree_leaves, tree_map

from .likelihood import Likelihood
from .optimize_kl import _StandardHamiltonian
from .tree import random_like, size as tree_size, vdot


class MeanFieldVI:
    """Diagonal-covariance Gaussian variational posterior.

    Variational parameters: ``{"mean": tree, "log_std": tree}``; entropy
    is ``sum(log_std) + const``.
    """

    def __init__(self, likelihood: Likelihood, *, n_samples: int = 4,
                 optimizer=None, mirror_samples: bool = True):
        self.hamiltonian = _StandardHamiltonian(likelihood)
        self.likelihood = likelihood
        self.n_samples = n_samples
        self.mirror_samples = mirror_samples
        if optimizer is None:
            import optax

            optimizer = optax.adam(1e-2)
        self.optimizer = optimizer

    def init_params(self, key, initial_mean=None, initial_std: float = 1e-2):
        mean = (
            initial_mean if initial_mean is not None
            else random_like(key, self.likelihood.domain)
        )
        log_std = tree_map(
            lambda m: jnp.full(jnp.shape(m), jnp.log(initial_std)), mean
        )
        return {"mean": mean, "log_std": log_std}

    def sample(self, params, key):
        eps = random_like(key, params["mean"])
        return tree_map(
            lambda m, ls, e: m + jnp.exp(ls) * e,
            params["mean"], params["log_std"], eps,
        )

    def entropy(self, params):
        # Gaussian entropy up to an additive constant.
        return sum(jnp.sum(l) for l in tree_leaves(params["log_std"]))

    def loss(self, params, key):
        """Negative ELBO ≈ E_q[H] - S[q] (sample estimate)."""
        keys = random.split(key, self.n_samples)

        def ham_at(k):
            eps = random_like(k, params["mean"])
            xp = tree_map(lambda m, ls, e: m + jnp.exp(ls) * e,
                          params["mean"], params["log_std"], eps)
            h = self.hamiltonian(xp)
            if self.mirror_samples:
                xm = tree_map(lambda m, ls, e: m - jnp.exp(ls) * e,
                              params["mean"], params["log_std"], eps)
                h = 0.5 * (h + self.hamiltonian(xm))
            return h

        e_h = jnp.mean(jax.vmap(ham_at)(keys))
        return e_h - self.entropy(params)

    def run(self, key, n_steps: int = 500, params=None, callback=None):
        if params is None:
            key, sub = random.split(key)
            params = self.init_params(sub)
        opt_state = self.optimizer.init(params)

        @jax.jit
        def step(params, opt_state, k):
            loss, grads = jax.value_and_grad(self.loss)(params, k)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        losses = []
        for i in range(n_steps):
            key, sub = random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
            if callback is not None:
                callback(i, params, loss)
        return params, jnp.asarray(losses)


class FullCovarianceVI:
    """Full-covariance Gaussian variational posterior (Cholesky factor over
    the flattened latent space).  Practical for moderate dimensions."""

    def __init__(self, likelihood: Likelihood, *, n_samples: int = 4,
                 optimizer=None, mirror_samples: bool = True):
        self.hamiltonian = _StandardHamiltonian(likelihood)
        self.likelihood = likelihood
        self.n_samples = n_samples
        self.mirror_samples = mirror_samples
        self.dim = tree_size(likelihood.domain)
        if optimizer is None:
            import optax

            optimizer = optax.adam(1e-2)
        self.optimizer = optimizer
        proto = tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), dict(likelihood.domain)
        )
        self._unravel = jax.flatten_util.ravel_pytree(proto)[1]
        self._tril = jnp.tril_indices(self.dim)

    def init_params(self, key, initial_std: float = 1e-2):
        mean = jax.flatten_util.ravel_pytree(
            random_like(key, self.likelihood.domain)
        )[0]
        # Parametrize L via its strictly-lower part + log-diagonal.
        log_diag = jnp.full((self.dim,), jnp.log(initial_std))
        lower = jnp.zeros((self.dim * (self.dim - 1)) // 2)
        return {"mean": mean, "log_diag": log_diag, "lower": lower}

    def _cholesky(self, params):
        L = jnp.zeros((self.dim, self.dim))
        strict = jnp.tril_indices(self.dim, k=-1)
        L = L.at[strict].set(params["lower"])
        L = L + jnp.diag(jnp.exp(params["log_diag"]))
        return L

    def sample(self, params, key):
        eps = random.normal(key, (self.dim,))
        x = params["mean"] + self._cholesky(params) @ eps
        return self._unravel(x)

    def entropy(self, params):
        return jnp.sum(params["log_diag"])

    def loss(self, params, key):
        keys = random.split(key, self.n_samples)
        L = self._cholesky(params)

        def ham_at(k):
            eps = random.normal(k, (self.dim,))
            xp = self._unravel(params["mean"] + L @ eps)
            h = self.hamiltonian(xp)
            if self.mirror_samples:
                xm = self._unravel(params["mean"] - L @ eps)
                h = 0.5 * (h + self.hamiltonian(xm))
            return h

        return jnp.mean(jax.vmap(ham_at)(keys)) - self.entropy(params)

    def run(self, key, n_steps: int = 500, params=None, callback=None):
        import optax

        if params is None:
            key, sub = random.split(key)
            params = self.init_params(sub)
        opt_state = self.optimizer.init(params)

        @jax.jit
        def step(params, opt_state, k):
            loss, grads = jax.value_and_grad(self.loss)(params, k)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        losses = []
        for i in range(n_steps):
            key, sub = random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
            if callback is not None:
                callback(i, params, loss)
        return params, jnp.asarray(losses)
