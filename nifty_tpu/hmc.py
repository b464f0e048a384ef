"""Hamiltonian Monte Carlo and iterative NUTS, pure JAX.

Serves as the inference cross-check on the *same* standardized
log-density the VI engine optimizes (the reference uses it identically:
``src/re/hmc.py``, ``src/re/hmc_oo.py``).  Everything is fixed-shape and
scan/while-loop based so whole chains compile to a single XLA program and
batch over a mesh axis with ``vmap``/``shard_map``.

Algorithms implemented from the standard literature (Neal 2011;
Betancourt 2017; Phan et al. iterative NUTS): leapfrog integration with a
diagonal mass matrix, Metropolis-corrected fixed-length HMC, and
no-U-turn sampling via iterative tree doubling with progressive
(multinomial-per-subtree, biased-across-subtrees) proposal sampling and
the trailing-bits checkpoint U-turn scheme of the iterative formulation.
API parity: ``generate_hmc_acc_rej`` (``src/re/hmc.py:141``),
``generate_nuts_tree`` (``:235``), ``QP`` (``:48``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, TypeVar, Union

import jax
from jax import lax
from jax import numpy as jnp
from jax import random
from jax.tree_util import tree_map

from .tree import random_like

Q = TypeVar("Q")


def _select(pred, on_true, on_false):
    return tree_map(partial(lax.select, pred), on_true, on_false)


class QP(NamedTuple):
    """Position/momentum phase-space point."""

    position: Q
    momentum: Q


def flip_momentum(qp: QP) -> QP:
    return QP(
        position=qp.position, momentum=tree_map(jnp.negative, qp.momentum)
    )


def sample_momentum_from_diagonal(*, key, mass_matrix_sqrt):
    """Momentum ~ N(0, M) for diagonal M given via its square root."""
    normal = random_like(key=key, primals=mass_matrix_sqrt)
    return tree_map(jnp.multiply, mass_matrix_sqrt, normal)


def _kinetic_energy(inverse_mass_matrix, momentum):
    se = tree_map(
        lambda im, p: jnp.sum(im * p ** 2), inverse_mass_matrix, momentum
    )
    return 0.5 * jax.tree_util.tree_reduce(jnp.add, se, 0.0)


def _kinetic_energy_gradient(inverse_mass_matrix, momentum):
    return tree_map(jnp.multiply, inverse_mass_matrix, momentum)


def leapfrog_step(
    potential_energy_gradient: Callable,
    kinetic_energy_gradient: Callable,
    step_size,
    inverse_mass_matrix,
    qp: QP,
) -> QP:
    """One leapfrog (velocity-Verlet) step forward in time."""
    p_half = tree_map(
        lambda p, g: p - (step_size / 2.0) * g,
        qp.momentum,
        potential_energy_gradient(qp.position),
    )
    q_full = tree_map(
        lambda q, v: q + step_size * v,
        qp.position,
        kinetic_energy_gradient(inverse_mass_matrix, p_half),
    )
    p_full = tree_map(
        lambda p, g: p - (step_size / 2.0) * g,
        p_half,
        potential_energy_gradient(q_full),
    )
    return QP(position=q_full, momentum=p_full)


def total_energy_of_qp(qp, potential_energy, kinetic_energy_w_inv_mass):
    return potential_energy(qp.position) + kinetic_energy_w_inv_mass(
        qp.momentum
    )


# --------------------------------------------------------------------------
# Fixed-length HMC with accept/reject
# --------------------------------------------------------------------------


class AcceptedAndRejected(NamedTuple):
    accepted_qp: QP
    rejected_qp: QP
    accepted: Union[bool, jnp.ndarray]
    diverging: Union[bool, jnp.ndarray]


def generate_hmc_acc_rej(
    *,
    key,
    initial_qp: QP,
    potential_energy: Callable,
    potential_energy_gradient: Callable,
    kinetic_energy: Callable = None,
    inverse_mass_matrix,
    step_size,
    num_steps: int,
    max_energy_difference: float = jnp.inf,
) -> AcceptedAndRejected:
    """Integrate a fixed-length trajectory and Metropolis-accept it."""
    ke = (
        partial(_kinetic_energy, inverse_mass_matrix)
        if kinetic_energy is None
        else partial(kinetic_energy, inverse_mass_matrix)
    )
    step = partial(
        leapfrog_step,
        potential_energy_gradient,
        _kinetic_energy_gradient,
        step_size,
        inverse_mass_matrix,
    )

    def body(_, qp):
        return step(qp)

    proposed = lax.fori_loop(0, num_steps, body, initial_qp)
    # Flip momentum for a symmetric proposal (detailed balance).
    proposed = flip_momentum(proposed)

    e0 = total_energy_of_qp(initial_qp, potential_energy, ke)
    e1 = total_energy_of_qp(proposed, potential_energy, ke)
    energy_diff = e0 - e1
    diverging = jnp.abs(energy_diff) > max_energy_difference

    key, sub = random.split(key)
    acceptance_threshold = random.uniform(sub)
    accept = acceptance_threshold < jnp.exp(energy_diff)
    accept &= ~jnp.isnan(energy_diff)
    accepted_qp, rejected_qp = _select(
        accept, (proposed, initial_qp), (initial_qp, proposed)
    )
    return AcceptedAndRejected(
        accepted_qp=accepted_qp,
        rejected_qp=rejected_qp,
        accepted=accept,
        diverging=diverging,
    )


# --------------------------------------------------------------------------
# Iterative NUTS
# --------------------------------------------------------------------------


class Tree(NamedTuple):
    """A trajectory tree: endpoints, a sampled proposal, and its stats."""

    left: QP
    right: QP
    logweight: Union[float, jnp.ndarray]
    proposal_candidate: QP
    turning: Union[bool, jnp.ndarray]
    diverging: Union[bool, jnp.ndarray]
    depth: Union[int, jnp.ndarray]
    cumulative_acceptance: Union[float, jnp.ndarray]


def _tree_index_get(ptree, idx):
    return tree_map(lambda arr: arr[idx], ptree)


def _tree_index_set(ptree, idx, val):
    return tree_map(lambda arr, v: arr.at[idx].set(v), ptree, val)


def _ckpt_idx_range(n):
    """Checkpoint index range for 0-based leaf index ``n``.

    ``idx_max`` = popcount(n >> 1); ``num_subtrees`` = number of trailing
    set bits of ``n``; ``idx_min = idx_max - num_subtrees + 1``.  For even
    ``n`` the new state is stored at ``idx_max``; for odd ``n`` the U-turn
    check runs against checkpoints ``idx_min..idx_max`` (iterative NUTS).
    """

    def popcount_body(v):
        x, c = v
        return x >> 1, c + (x & 1)

    _, idx_max = lax.while_loop(
        lambda v: v[0] > 0, popcount_body, (n >> 1, jnp.asarray(0))
    )

    def trailing_body(v):
        x, c = v
        return x >> 1, c + 1

    _, num_subtrees = lax.while_loop(
        lambda v: (v[0] & 1) != 0, trailing_body, (n, jnp.asarray(0))
    )
    return idx_max - num_subtrees + 1, idx_max


def is_euclidean_uturn(qp_left: QP, qp_right: QP):
    """U-turn: the two trajectory ends move toward each other.

    Both momenta are forward-time; turning iff the right end's momentum
    projects negatively on (q_r - q_l) AND the left end's projects
    negatively on (q_l - q_r) (Betancourt's conceptual-introduction form,
    matching the reference ``src/re/hmc.py:395``).
    """
    from .tree import vdot

    dq = tree_map(jnp.subtract, qp_right.position, qp_left.position)
    return (vdot(qp_right.momentum, dq).real < 0.0) & (
        vdot(qp_left.momentum, tree_map(jnp.negative, dq)).real < 0.0
    )


def iterative_build_tree(
    key,
    initial_qp: QP,
    eps,
    go_right,
    depth,
    stepper: Callable,
    potential_energy: Callable,
    kinetic_energy: Callable,
    maxdepth: int,
    max_energy_difference,
) -> Tree:
    """Build a subtree of 2^depth new states in direction ``go_right``.

    Keeps ``maxdepth + 1`` checkpoint states; per new leaf the U-turn
    check runs against the checkpoints selected by :func:`_ckpt_idx_range`
    — the iterative formulation of recursive NUTS sub-U-turn checking.
    """
    e0 = total_energy_of_qp(initial_qp, potential_energy, kinetic_energy)
    chk = tree_map(
        lambda x: jnp.zeros((maxdepth + 1,) + jnp.shape(x), dtype=x.dtype),
        initial_qp,
    )

    dummy_tree = Tree(
        left=initial_qp,
        right=initial_qp,
        logweight=-jnp.inf,
        proposal_candidate=initial_qp,
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        depth=jnp.asarray(-1),
        cumulative_acceptance=jnp.asarray(0.0),
    )

    def cond(state):
        n, _, _, _, tree = state
        return (n < (1 << depth)) & ~tree.turning & ~tree.diverging

    def body(state):
        n, key, chk, z, tree = state
        key, sub = random.split(key)
        z = stepper(z, eps, go_right)
        e_z = total_energy_of_qp(z, potential_energy, kinetic_energy)
        energy_diff = e0 - e_z
        energy_diff = jnp.where(jnp.isnan(energy_diff), -jnp.inf, energy_diff)
        diverging = jnp.abs(energy_diff) > max_energy_difference

        # Progressive multinomial proposal within the subtree.
        new_logweight = jnp.logaddexp(tree.logweight, energy_diff)
        take_new = random.uniform(sub) < jnp.exp(energy_diff - new_logweight)
        proposal = _select(take_new, z, tree.proposal_candidate)

        idx_min, idx_max = _ckpt_idx_range(n)
        n_even = (n & 1) == 0
        # Even leaf: store checkpoint.  Odd leaf: U-turn check against
        # checkpoints idx_min..idx_max.
        chk = lax.cond(
            n_even,
            lambda c: _tree_index_set(c, idx_max, z),
            lambda c: c,
            chk,
        )

        def uturn_body(i, turning):
            inside = (i >= idx_min) & (i <= idx_max)
            qp_l = _tree_index_get(chk, i)
            return turning | (inside & is_euclidean_uturn(qp_l, z))

        turning = lax.cond(
            n_even,
            lambda: jnp.asarray(False),
            lambda: lax.fori_loop(0, maxdepth + 1, uturn_body,
                                  jnp.asarray(False)),
        )

        acc = jnp.minimum(1.0, jnp.exp(energy_diff))
        first = (n == 0)
        tree = Tree(
            left=_select(first, z, tree.left),
            right=z,
            logweight=new_logweight,
            proposal_candidate=proposal,
            turning=tree.turning | turning,
            diverging=tree.diverging | diverging,
            depth=tree.depth,
            cumulative_acceptance=tree.cumulative_acceptance + acc,
        )
        return n + 1, key, chk, z, tree

    n0 = jnp.asarray(0)
    _, _, _, _, tree = lax.while_loop(
        cond, body, (n0, key, chk, initial_qp, dummy_tree)
    )
    return tree


def generate_nuts_tree(
    initial_qp: QP,
    key,
    eps,
    maxdepth: int,
    stepper: Callable,
    potential_energy: Callable,
    kinetic_energy: Callable,
    bias_transition: bool = True,
    max_energy_difference: float = 1000.0,
) -> Tree:
    """No-U-turn trajectory: double until U-turn/divergence/maxdepth.

    Returns the final :class:`Tree` whose ``proposal_candidate`` is the
    next chain state.
    """
    e0 = total_energy_of_qp(initial_qp, potential_energy, kinetic_energy)
    tree = Tree(
        left=initial_qp,
        right=initial_qp,
        logweight=jnp.asarray(0.0),
        proposal_candidate=initial_qp,
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        depth=jnp.asarray(0),
        cumulative_acceptance=jnp.asarray(0.0),
    )

    def cond(state):
        _, tree = state
        return (tree.depth <= maxdepth) & ~tree.turning & ~tree.diverging

    def body(state):
        key, tree = state
        key, kdir, ksub, kmerge = random.split(key, 4)
        go_right = random.bernoulli(kdir, 0.5)
        start = _select(go_right, tree.right, tree.left)
        new_subtree = iterative_build_tree(
            ksub,
            start,
            eps,
            go_right,
            tree.depth,
            stepper,
            potential_energy,
            kinetic_energy,
            maxdepth,
            max_energy_difference,
        )
        tree = _merge_trees(
            kmerge, tree, new_subtree, go_right, bias_transition
        )
        tree = tree._replace(depth=tree.depth + 1)
        return key, tree

    _, tree = lax.while_loop(cond, body, (key, tree))
    return tree


def _merge_trees(
    key, current: Tree, new_subtree: Tree, go_right, bias_transition
) -> Tree:
    """Merge the freshly built subtree into the trajectory.

    Across subtrees the transition is *biased* toward the new subtree
    (prob min(1, w_new/w_cur)) when ``bias_transition``, otherwise plain
    multinomial.
    """
    subtree_bad = new_subtree.turning | new_subtree.diverging
    lw_new = jnp.where(subtree_bad, -jnp.inf, new_subtree.logweight)
    if bias_transition:
        p_new = jnp.minimum(1.0, jnp.exp(lw_new - current.logweight))
    else:
        p_new = jnp.exp(lw_new - jnp.logaddexp(current.logweight, lw_new))
    take_new = random.uniform(key) < p_new
    proposal = _select(
        take_new, new_subtree.proposal_candidate, current.proposal_candidate
    )
    left = _select(go_right, current.left, new_subtree.right)
    right = _select(go_right, new_subtree.right, current.right)
    # Outermost U-turn check across the merged trajectory; a bad subtree
    # terminates the doubling but keeps the current proposal.
    turning = new_subtree.turning | is_euclidean_uturn(left, right)
    return Tree(
        left=left,
        right=right,
        logweight=jnp.logaddexp(current.logweight, lw_new),
        proposal_candidate=proposal,
        turning=turning,
        diverging=new_subtree.diverging,
        depth=current.depth,
        cumulative_acceptance=current.cumulative_acceptance
        + new_subtree.cumulative_acceptance,
    )
