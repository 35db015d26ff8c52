"""Batched (vmapped) VI chains: many independent optimizations in one program.

A TPU-native capability with no reference analogue: run K restarts /
replicates of the same algorithm simultaneously by vmapping the step over a
leading chain axis.  All per-chain (d,)-sized ops become (K, d)-sized —
turning the overhead-bound tiny-model step (flat ~25us regardless of size,
see bench notes) into real vector/matrix work.  Measured on one v5e chip,
flagship logreg ADVI (d=62, n_samples=10): 1024 chains cost 2.7x ONE chain —
7.1M aggregate chain-steps/s vs 19k single-chain, a ~380x aggregate speedup.

The target is NOT vmapped (in_axes=None for ``state.prob``), so the dataset
is shared across chains, not copied.  Chains differ in their PRNG keys and/or
initial variational parameters (and, since optimizer state is a pytree,
per-chain hyperparameters stored as arrays also work).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def _state_axes(state):
    """in/out axis tree for vmapping an algorithm state: chain axis 0 on
    everything except the shared target and the scalar iteration counter
    (vmap axis trees are prefixes: a single 0/None covers a whole subtree)."""
    kwargs = {}
    for f in dataclasses.fields(state):
        kwargs[f.name] = None if f.name in ("prob", "iteration") else 0
    return type(state)(**kwargs)


def init_chains(
    key: jax.Array,
    algorithm,
    q_init,
    prob,
    n_chains: int,
    jitter: float = 0.0,
):
    """Initialize K chains: distinct PRNG keys, optionally jittered locations.

    ``q_init`` may also be a pre-stacked family (leading dim K) for fully
    custom per-chain initializations.
    """
    keys = jax.random.split(key, n_chains)
    q_leaves = jax.tree.leaves(q_init)
    stacked = q_leaves[0].ndim >= 1 and hasattr(q_init, "location") and (
        q_init.location.ndim == 2
    )
    if not stacked:
        def make_q(k):
            if jitter == 0.0:
                return q_init
            noise = jax.random.normal(
                k, q_init.location.shape, q_init.location.dtype
            )
            return q_init.replace(location=q_init.location + jitter * noise)

        qs = jax.vmap(make_q)(keys)
    else:
        qs = q_init

    def init_one(k, q):
        return algorithm.init(k, q, prob)

    # The target inside each state would be stacked by a naive vmap; init
    # once to get the structure, then vmap with prob held out.
    proto = algorithm.init(keys[0], jax.tree.map(lambda x: x[0], qs), prob)
    axes = _state_axes(proto)
    states = jax.vmap(init_one, in_axes=(0, 0), out_axes=axes)(keys, qs)
    return states, axes


def step_chains(algorithm, states, axes):
    """One vmapped step for all chains; returns (states, stacked info)."""
    return jax.vmap(algorithm.step, in_axes=(axes,), out_axes=(axes, 0))(
        states
    )


def optimize_chains(
    key: jax.Array,
    algorithm,
    max_iter: int,
    prob,
    q_init,
    n_chains: int,
    jitter: float = 0.0,
    states=None,
    axes=None,
):
    """Run K independent optimizations; returns (outputs, final_infos, states, axes).

    ``outputs`` is the family pytree with a leading chain axis.  To pick the
    best chain, score with the NEGATED objective (``estimate_objective``
    returns the negative ELBO — lower is better — while ``best_chain`` takes
    the argmax)::

        scores = jax.vmap(
            lambda q: -alg.estimate_objective(key, q, prob, n_samples)
        )(outputs)
        q_best = best_chain(outputs, scores)
    """
    if states is None:
        states, axes = init_chains(
            key, algorithm, q_init, prob, n_chains, jitter
        )

    def body(carry, _):
        new_states, info = step_chains(algorithm, carry, axes)
        return new_states, info

    def scan_fn(states):
        return jax.lax.scan(body, states, None, length=max_iter)

    states, infos = jax.jit(scan_fn)(states)
    outputs = jax.vmap(
        algorithm.output, in_axes=(axes,), out_axes=0
    )(states)
    last_info = {k: v[-1] for k, v in infos.items()}
    return outputs, last_info, states, axes


def best_chain(outputs, scores: jax.Array):
    """Select the chain pytree slice with the best (highest) score."""
    i = jnp.argmax(scores)
    return jax.tree.map(lambda x: x[i], outputs)
