"""Batched (vmapped) multi-chain VI tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_meanfield
from advancedvi_jl_tpu.parallel.chains import (
    best_chain,
    init_chains,
    optimize_chains,
)


def test_chains_converge_and_match_single(key):
    target, mu, L = normal_meanfield(jax.random.key(1), 5)
    q0 = avt.MeanFieldGaussian(jnp.zeros(5), jnp.ones(5))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    outs, last_info, states, axes = optimize_chains(
        key, alg, 800, target, q0, n_chains=8, jitter=0.5
    )
    assert outs.location.shape == (8, 5)
    assert np.isfinite(np.asarray(last_info["elbo"])).all()
    # every chain converges near the posterior despite jittered starts
    errs = np.linalg.norm(np.asarray(outs.location) - np.asarray(mu), axis=1)
    assert (errs < 0.5).all()

    # best-chain selection via per-chain objective
    scores = jax.vmap(
        lambda q: -alg.estimate_objective(
            jax.random.key(7), q, target, n_samples=2000
        )
    )(outs)
    best = best_chain(outs, scores)
    assert best.location.shape == (5,)


def test_chains_distinct_trajectories(key):
    """Distinct keys produce distinct chains (no accidental broadcasting)."""
    target, _, _ = normal_meanfield(jax.random.key(1), 5)
    q0 = avt.MeanFieldGaussian(jnp.zeros(5), jnp.ones(5))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=4, operator=avt.ClipScale()
    )
    outs, _, states, _ = optimize_chains(
        key, alg, 20, target, q0, n_chains=4
    )
    locs = np.asarray(outs.location)
    assert len({tuple(np.round(r, 6)) for r in locs}) == 4


def test_chains_share_target_memory(key):
    """The target is not stacked across chains (in_axes=None on prob)."""
    target, _, _ = normal_meanfield(jax.random.key(1), 5)
    q0 = avt.MeanFieldGaussian(jnp.zeros(5), jnp.ones(5))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=4, operator=avt.ClipScale()
    )
    states, axes = init_chains(key, alg, q0, target, n_chains=4)
    assert states.prob.mu.shape == (5,)  # not (4, 5)
    assert states.q.location.shape == (4, 5)
