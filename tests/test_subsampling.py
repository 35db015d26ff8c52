"""Doubly-stochastic VI tests.

Mirrors the reference genres (test/general/subsampledobj.jl): subsampled
objective ~ full objective, epoch-averaged minibatch gradients ~ full-batch
gradient, schedule bookkeeping, determinism, convergence to the analytic
subsampled-normals posterior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.subsampled_normals import subsampled_normals


N_DATA = 8


@pytest.fixture
def problem():
    return subsampled_normals(jax.random.key(2), N_DATA)


@pytest.mark.parametrize("batchsize", [1, 2, 4])
def test_subsampled_objective_matches_full(problem, batchsize, key):
    """rtol 0.1 parity (reference: subsampledobj.jl:55-61)."""
    target, mu_true, L_true = problem
    q = avt.FullRankGaussian(jnp.zeros(1))
    obj_full = avt.RepGradELBO(n_samples=30_000, entropy=avt.MONTE_CARLO)
    obj_sub = avt.SubsampledObjective(
        objective=obj_full,
        subsampling=avt.ReshufflingBatchSubsampling(
            n_data=N_DATA, batchsize=batchsize
        ),
    )
    full = float(obj_full.estimate_objective(key, q, target))
    sub = float(obj_sub.estimate_objective(key, q, target))
    assert abs(sub - full) <= 0.1 * abs(full)


def test_epoch_averaged_gradient_matches_full(problem, key):
    """Averaging minibatch gradients over one epoch ~ full-batch gradient
    (reference: subsampledobj.jl:63-90).  Same MC key per batch isolates the
    subsampling noise, which sums out exactly across an epoch partition."""
    target, _, _ = problem
    q = avt.FullRankGaussian(0.3 * jnp.ones(1))
    batchsize = 2
    sub = avt.ReshufflingBatchSubsampling(n_data=N_DATA, batchsize=batchsize)
    obj = avt.RepGradELBO(n_samples=512, entropy=avt.CLOSED_FORM)

    g_full, _, _ = obj.value_and_grad(q, target, key)

    subobj = avt.SubsampledObjective(objective=obj, subsampling=sub)
    state = subobj.init(jax.random.key(5), q, target)
    grads = []
    for _ in range(len(sub)):
        g, state, info = subobj.value_and_grad(q, target, key, state)
        grads.append(g)
    g_avg = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)

    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_avg)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.1, atol=0.05
        )


def test_schedule_bookkeeping(key):
    sub = avt.ReshufflingBatchSubsampling(n_data=10, batchsize=3)
    assert len(sub) == 3  # trailing ragged batch dropped (static shapes)
    state = sub.init(key)
    seen = []
    for i in range(6):
        batch, state, info = sub.step(state)
        assert batch.shape == (3,)
        seen.append((int(info["epoch"]), int(info["step"])))
    assert seen == [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3)]


def test_epoch_partition_is_disjoint(key):
    sub = avt.ReshufflingBatchSubsampling(n_data=9, batchsize=3)
    state = sub.init(key)
    idx = []
    for _ in range(3):
        batch, state, _ = sub.step(state)
        idx.extend(int(i) for i in batch)
    assert sorted(idx) == list(range(9))


def test_subsampled_convergence(problem, key):
    """Subsampled ADVI converges to the analytic posterior
    (reference: klminrepgraddescent.jl subsampling convergence)."""
    target, mu_true, L_true = problem
    q0 = avt.FullRankGaussian(jnp.zeros(1))
    sub = avt.ReshufflingBatchSubsampling(n_data=N_DATA, batchsize=1)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=10,
        subsampling=sub,
        optimizer=avt.descent(3e-3),
        operator=avt.ClipScale(),
    )
    out, infos, _ = avt.optimize(key, alg, 2000, target, q0)
    assert abs(float(out.location[0]) - float(mu_true[0])) < 0.1
    assert abs(float(out.scale[0, 0]) - float(L_true[0, 0])) < 0.1


def test_subsampled_determinism(problem, key):
    target, _, _ = problem
    q0 = avt.FullRankGaussian(jnp.zeros(1))

    def run():
        sub = avt.ReshufflingBatchSubsampling(n_data=N_DATA, batchsize=3)
        alg = avt.KLMinRepGradDescent(
            entropy=avt.STL, n_samples=10, subsampling=sub,
            operator=avt.ClipScale(),
        )
        out, _, _ = avt.optimize(key, alg, 20, target, q0)
        return np.asarray(out.location)

    np.testing.assert_array_equal(run(), run())
