"""Chain wrappers around HMC/NUTS: whole chains as one compiled scan.

Parity: reference ``src/re/hmc_oo.py`` (``Chain`` ``:47``, ``_Sampler``
``:58``, ``NUTSChain`` ``:146``, ``HMCChain`` ``:263``) — re-designed so
``generate_n_samples`` is a ``lax.scan`` (sample storage produced by the
scan itself, no index updates), which XLA pipelines and which batches over
chains with ``vmap``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple, TypeVar, Union

import jax
from jax import lax
from jax import numpy as jnp
from jax import random
from jax.tree_util import tree_map, tree_structure

from .hmc import (
    QP,
    _kinetic_energy,
    _kinetic_energy_gradient,
    generate_hmc_acc_rej,
    generate_nuts_tree,
    leapfrog_step,
    sample_momentum_from_diagonal,
)

Q = TypeVar("Q")


def _parse_diag_mass_matrix(mass_matrix, position_proto):
    if isinstance(mass_matrix, (int, float)) or (
        hasattr(mass_matrix, "size") and jnp.size(mass_matrix) == 1
        and not isinstance(mass_matrix, dict)
    ):
        return tree_map(
            lambda p: jnp.full(jnp.shape(p), float(mass_matrix)),
            position_proto,
        )
    if tree_structure(mass_matrix) == tree_structure(position_proto):
        ok = all(
            jnp.shape(a) == jnp.shape(b)
            for a, b in zip(
                jax.tree_util.tree_leaves(mass_matrix),
                jax.tree_util.tree_leaves(position_proto),
            )
        )
        if not ok:
            raise ValueError("mass matrix shapes do not match position")
        return mass_matrix
    raise TypeError(
        "mass matrix must be scalar or match the position structure"
    )


class Chain(NamedTuple):
    """Chain output: stacked samples + per-step diagnostics."""

    samples: Q
    divergences: jnp.ndarray
    acceptance: Union[jnp.ndarray, float]
    depths: Optional[jnp.ndarray] = None
    resampled_momenta: Optional[Q] = None


class _Sampler:
    def __init__(
        self,
        potential_energy: Callable,
        inverse_mass_matrix,
        position_proto,
        step_size: float = 1.0,
        max_energy_difference: float = jnp.inf,
    ):
        if not callable(potential_energy):
            raise TypeError("`potential_energy` must be callable")
        self.potential_energy = potential_energy
        self.inverse_mass_matrix = _parse_diag_mass_matrix(
            inverse_mass_matrix, position_proto
        )
        self.mass_matrix_sqrt = tree_map(
            lambda x: x ** -0.5, self.inverse_mass_matrix
        )
        self.step_size = step_size
        self.max_energy_difference = max_energy_difference
        self.kinetic_energy = partial(
            _kinetic_energy, self.inverse_mass_matrix
        )
        pe_grad = jax.grad(potential_energy)
        self.stepper = partial(
            leapfrog_step, pe_grad, _kinetic_energy_gradient
        )

    def sample_next_state(self, key, position):
        raise NotImplementedError()

    def generate_n_samples(
        self, key, initial_position, num_samples: int
    ) -> Tuple[Chain, Tuple[Any, Q]]:
        """Run ``num_samples`` transitions as a single compiled scan."""
        if isinstance(key, int):
            key = random.PRNGKey(key)

        def step(carry, _):
            key, pos = carry
            key, sub = random.split(key)
            out, pos = self.sample_next_state(sub, pos)
            return (key, pos), out

        (key, pos), outs = lax.scan(
            step, (key, initial_position), None, length=num_samples
        )
        chain = self._to_chain(outs)
        return chain, (key, pos)

    def _to_chain(self, outs) -> Chain:
        raise NotImplementedError()


class NUTSChain(_Sampler):
    """No-U-turn chain; see :func:`nifty_tpu.hmc.generate_nuts_tree`."""

    def __init__(
        self,
        potential_energy,
        inverse_mass_matrix,
        position_proto,
        step_size=1.0,
        max_tree_depth: int = 10,
        bias_transition: bool = True,
        max_energy_difference: float = 1000.0,
    ):
        super().__init__(
            potential_energy, inverse_mass_matrix, position_proto,
            step_size=step_size,
            max_energy_difference=max_energy_difference,
        )
        self.max_tree_depth = max_tree_depth
        self.bias_transition = bias_transition

    def sample_next_state(self, key, position):
        key_momentum, key_tree = random.split(key)
        momentum = sample_momentum_from_diagonal(
            key=key_momentum, mass_matrix_sqrt=self.mass_matrix_sqrt
        )
        qp = QP(position=position, momentum=momentum)

        def stepper(qp_, eps, go_right):
            signed = jnp.where(go_right, 1.0, -1.0) * eps
            return leapfrog_step(
                jax.grad(self.potential_energy),
                _kinetic_energy_gradient,
                signed,
                self.inverse_mass_matrix,
                qp_,
            )

        tree = generate_nuts_tree(
            qp,
            key_tree,
            self.step_size,
            self.max_tree_depth,
            stepper,
            self.potential_energy,
            self.kinetic_energy,
            bias_transition=self.bias_transition,
            max_energy_difference=self.max_energy_difference,
        )
        new_pos = tree.proposal_candidate.position
        out = (
            new_pos,
            tree.diverging,
            tree.cumulative_acceptance,
            tree.depth,
        )
        return out, new_pos

    def _to_chain(self, outs) -> Chain:
        samples, div, acc, depths = outs
        # Normalize the tree's summed Metropolis statistic by its number of
        # proposals (2^depth - 1) so ``acceptance`` is a per-transition
        # probability in [0, 1] (reference: ``src/re/hmc_oo.py:237-240``).
        # Float exponentiation: int32 2**d overflows for user-settable
        # max_tree_depth >= 31 (the reference uses uint64 here,
        # src/re/hmc_oo.py:237); float64/float32 stays exact up to depth
        # 53/24 and merely loses precision (not sign) beyond.
        num_prop = 2.0 ** depths.astype(float) - 1.0
        acc = jnp.where(num_prop > 0, acc / jnp.maximum(num_prop, 1.0), 0.0)
        return Chain(
            samples=samples,
            divergences=div,
            acceptance=acc,
            depths=depths,
        )


class HMCChain(_Sampler):
    """Fixed-trajectory-length Metropolis HMC chain."""

    def __init__(
        self,
        potential_energy,
        inverse_mass_matrix,
        position_proto,
        num_steps: int = 10,
        step_size=1.0,
        max_energy_difference: float = jnp.inf,
    ):
        super().__init__(
            potential_energy, inverse_mass_matrix, position_proto,
            step_size=step_size,
            max_energy_difference=max_energy_difference,
        )
        self.num_steps = num_steps

    def sample_next_state(self, key, position):
        key_momentum, key_acc = random.split(key)
        momentum = sample_momentum_from_diagonal(
            key=key_momentum, mass_matrix_sqrt=self.mass_matrix_sqrt
        )
        qp = QP(position=position, momentum=momentum)
        acc_rej = generate_hmc_acc_rej(
            key=key_acc,
            initial_qp=qp,
            potential_energy=self.potential_energy,
            potential_energy_gradient=jax.grad(self.potential_energy),
            inverse_mass_matrix=self.inverse_mass_matrix,
            step_size=self.step_size,
            num_steps=self.num_steps,
            max_energy_difference=self.max_energy_difference,
        )
        new_pos = acc_rej.accepted_qp.position
        out = (new_pos, acc_rej.diverging, acc_rej.accepted)
        return out, new_pos

    def _to_chain(self, outs) -> Chain:
        samples, div, acc = outs
        return Chain(samples=samples, divergences=div, acceptance=acc)
