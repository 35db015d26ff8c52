"""Amortized-q subsampling: the family subsamples WITH the data.

Exercises the reference's ``subsample(q, batch)`` hook
(reference: src/algorithms/subsampledobjective.jl:81) — dead code in round 1,
now implemented by PerDatapointMeanField with scatter-add gradients into the
full (N, k) parameter arrays.

Model: theta_i ~ N(0, 1), y_i ~ N(theta_i, 1) independently per datapoint;
analytic posterior theta_i | y_i ~ N(y_i / 2, 1/2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.core.factorized import factorized_target

N = 32


def _make(key=jax.random.key(7)):
    y = 1.0 + 1.5 * jax.random.normal(key, (N,))

    def logprior(theta):
        return jnp.zeros(())  # all terms are per-datapoint -> in loglike

    def loglike(theta, data):
        # sum_i [ log N(theta_i; 0, 1) + log N(y_i; theta_i, 1) ]
        return jnp.sum(
            -0.5 * jnp.square(theta) - 0.5 * jnp.square(data["y"] - theta)
        )

    target = factorized_target(
        logprior_fn=logprior, loglike_fn=loglike, data={"y": y}, dim=N
    )
    q = avt.per_datapoint_meanfield(N, k=1, scale=0.5)
    return target, q, y


def test_subsample_weight_bookkeeping(key):
    _, q, _ = _make()
    idx = jnp.asarray([3, 7, 11, 19])
    q_sub = q.subsample(idx)
    assert q_sub.location.shape == (4, 1)
    assert q_sub.weight == N / 4
    # weighted entropy: N/B * sum of the selected blocks' entropies
    q_full_sel = avt.PerDatapointMeanField(
        location=q.location[idx], scale_diag=q.scale_diag[idx]
    )
    np.testing.assert_allclose(
        float(q_sub.entropy()), N / 4 * float(q_full_sel.entropy()), rtol=1e-6
    )


def test_epoch_averaged_subsampled_grad_matches_full(key):
    """Mean of the per-batch gradients over one reshuffled epoch ~= the
    full-batch gradient (the reference's estimator-consistency test genre,
    test/general/subsampledobj.jl:63-90) — including that gradients land in
    the FULL (N, k) arrays via the gather's scatter-add transpose."""
    target, q, y = _make()
    obj_full = avt.RepGradELBO(n_samples=8192, entropy=avt.CLOSED_FORM)
    g_full, _, _ = jax.jit(
        lambda q: obj_full.value_and_grad(q, target, key, ())
    )(q)

    sub = avt.ReshufflingBatchSubsampling(n_data=N, batchsize=8)
    obj_sub = avt.SubsampledObjective(
        objective=avt.RepGradELBO(n_samples=8192, entropy=avt.CLOSED_FORM),
        subsampling=sub,
    )
    st = obj_sub.init(key, q, target)
    grads = []
    for i in range(N // 8):  # one epoch of disjoint batches
        g, st, info = jax.jit(
            lambda q, st, k: obj_sub.value_and_grad(q, target, k, st)
        )(q, st, jax.random.fold_in(key, i))
        grads.append(g)
        assert g.location.shape == (N, 1)  # FULL-shape gradient

    g_avg = jax.tree.map(
        lambda *xs: sum(xs) / len(xs), *grads
    )
    # both estimators are unbiased (verified against the analytic gradient
    # at 2e5 samples during development); tolerance = joint MC error at 8192
    np.testing.assert_allclose(
        np.asarray(g_avg.location), np.asarray(g_full.location),
        rtol=0.1, atol=0.1,
    )
    np.testing.assert_allclose(
        np.asarray(g_avg.scale_diag), np.asarray(g_full.scale_diag),
        rtol=0.1, atol=0.1,
    )


def test_subsampled_objective_estimate_matches_full(key):
    """Full-epoch averaged subsampled objective ~= full objective
    (reference: test/general/subsampledobj.jl:55-61)."""
    target, q, _ = _make()
    full = float(
        avt.RepGradELBO(n_samples=4096, entropy=avt.CLOSED_FORM)
        .estimate_objective(key, q, target)
    )
    sub = avt.SubsampledObjective(
        objective=avt.RepGradELBO(n_samples=4096, entropy=avt.CLOSED_FORM),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=N, batchsize=8),
    )
    got = float(sub.estimate_objective(key, q, target))
    np.testing.assert_allclose(got, full, rtol=0.05)


def test_amortized_doubly_stochastic_convergence(key):
    """End-to-end: subsampled ADVI with the per-datapoint family recovers
    every local posterior N(y_i/2, 1/2)."""
    target, q0, y = _make()
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=16,
        optimizer=optax.adam(5e-2),
        operator=avt.ClipScale(),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=N, batchsize=8),
    )
    q, infos, _ = avt.optimize(key, alg, 4000, target, q0)
    np.testing.assert_allclose(
        np.asarray(q.location[:, 0]), np.asarray(y / 2.0), atol=0.08
    )
    np.testing.assert_allclose(
        np.asarray(q.scale_diag[:, 0]),
        np.full(N, np.sqrt(0.5)),
        rtol=0.15,
    )
    assert np.isfinite(infos[-1]["elbo"])


def test_weighted_family_rejected_by_quadratic_objectives(key):
    """VarGrad (quadratic in log q) and IWELBO (exponential in log q) are
    invalid with weighted-density families — both reject with guidance
    toward the pathwise objectives."""
    import pytest

    target, q, _ = _make()
    q_sub = q.subsample(jnp.arange(8))
    assert q_sub.weight == N / 8

    with pytest.raises(ValueError, match="RepGradELBO"):
        avt.ScoreGradELBO(n_samples=4).loss(q_sub, target.subsample(jnp.arange(8)), key)
    with pytest.raises(ValueError, match="RepGradELBO"):
        avt.IWELBO(n_samples=4).init(key, q_sub, target)
    # full (weight=1) families remain accepted
    v = avt.ScoreGradELBO(n_samples=4).loss(q, target, key)
    assert np.isfinite(float(v))
