"""Importance-weighted ELBO (IWAE bound) + DReG gradient tests.

Beyond-reference objective (the reference cites Agrawal et al. 2020's
importance weighting without shipping it). Genres mirror the reference's
statistical-correctness suite: bound identities, estimator agreement,
variance reduction, convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_fullrank, normal_meanfield


def _flat(g):
    return jnp.concatenate([x.ravel() for x in jax.tree.leaves(g)])


def test_iwelbo_k1_equals_elbo(key):
    """IW-ELBO_1 is the plain ELBO: identical estimate for identical draws."""
    target, mu, L = normal_meanfield(jax.random.key(3), 4)
    q = avt.MeanFieldGaussian(0.3 * jnp.ones(4), 0.8 * jnp.ones(4))
    iw = float(
        avt.IWELBO(n_samples=1).estimate_objective(key, q, target)
    )
    elbo = float(
        avt.RepGradELBO(n_samples=1, entropy=avt.MONTE_CARLO)
        .estimate_objective(key, q, target)
    )
    np.testing.assert_allclose(iw, elbo, rtol=1e-6)


def test_iwelbo_monotone_in_k(key):
    """Burda et al. 2016: E[IW-ELBO_k] is nondecreasing in k and upper-
    bounded by log Z (= 0 for a normalized target in this parameterization).
    Checked with enough replicates that the ordering is far outside MC error."""
    target, mu, L = normal_meanfield(jax.random.key(3), 4)
    q = avt.MeanFieldGaussian(mu + 0.5, 2.0 * jnp.diag(L))  # deliberately loose q

    def mean_bound(k, n_rep=4000):
        obj = avt.IWELBO(n_samples=k)
        vals = jax.vmap(
            lambda kk: -obj.estimate_objective(kk, q, target)
        )(jax.random.split(key, n_rep))
        return float(jnp.mean(vals))

    b1, b4, b16, b64 = (mean_bound(k) for k in (1, 4, 16, 64))
    assert b1 < b4 < b16 < b64, (b1, b4, b16, b64)
    assert b64 < 1e-3  # bounded by log Z = 0 up to MC error


def test_dreg_and_plain_estimate_same_gradient(key):
    """DReG and the plain IWAE gradient are both unbiased for the same
    total gradient: their means over many keys agree."""
    target, mu, L = normal_meanfield(jax.random.key(3), 3)
    q = avt.MeanFieldGaussian(mu + 0.3, 1.3 * jnp.diag(L))

    def mean_grad(dreg, n_rep=3000):
        obj = avt.IWELBO(n_samples=8, dreg=dreg)

        def one(k):
            g, _, _ = obj.value_and_grad(q, target, k)
            return _flat(g)

        gs = jax.vmap(one)(jax.random.split(key, n_rep))
        return np.asarray(jnp.mean(gs, axis=0)), np.asarray(
            jnp.std(gs, axis=0) / jnp.sqrt(n_rep)
        )

    m_dreg, se_d = mean_grad(True)
    m_plain, se_p = mean_grad(False)
    # agree within 5 joint standard errors elementwise
    joint_se = np.sqrt(se_d**2 + se_p**2)
    assert (np.abs(m_dreg - m_plain) < 5 * joint_se + 1e-4).all(), (
        m_dreg, m_plain, joint_se
    )


def test_dreg_variance_reduction_near_optimum(key):
    """Near the optimum the DReG estimator's variance is far below the plain
    IWAE gradient's (whose SNR decays with k, Rainforth et al. 2018)."""
    target, mu, L = normal_meanfield(jax.random.key(3), 4)
    q = avt.MeanFieldGaussian(mu, jnp.diag(L))  # exactly optimal

    def grad_var(dreg):
        obj = avt.IWELBO(n_samples=16, dreg=dreg)

        def one(k):
            g, _, _ = obj.value_and_grad(q, target, k)
            return _flat(g)

        gs = jax.vmap(one)(jax.random.split(key, 512))
        return float(jnp.sum(jnp.var(gs, axis=0)))

    v_dreg = grad_var(True)
    v_plain = grad_var(False)
    assert v_dreg < 0.1 * v_plain, (v_dreg, v_plain)
    # at the exact optimum DReG is (near-)zero-variance, like STL
    assert v_dreg < 1e-6, v_dreg


def test_iw_vi_convergence_and_tighter_bound(key):
    """End-to-end: on a strongly correlated target a mean-field family
    cannot fit, the IW-VI fit achieves a higher IW-ELBO_k (its own training
    bound, evaluated with many replicates) than the plain-ADVI fit — the
    importance weights recover mass the factorized family misses."""
    rho = 0.97
    L = jnp.linalg.cholesky(
        jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float32)
    )
    from advancedvi_jl_tpu.models.normal import NormalTarget

    target = NormalTarget(mu=jnp.asarray([0.5, -0.5]), scale_tril=L)

    q0 = avt.MeanFieldGaussian(jnp.zeros(2), jnp.ones(2))
    advi = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=16, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    q_advi, _, _ = avt.optimize(key, advi, 3000, target, q0)

    iwvi = avt.KLMinIWRepGradDescent(
        n_samples=16, optimizer=optax.adam(1e-2), operator=avt.ClipScale()
    )
    q_iw, infos, _ = avt.optimize(key, iwvi, 3000, target, q0)
    assert np.isfinite(infos[-1]["elbo"])

    def mean_bound(q, k=16, n_rep=4000):
        ev = avt.IWELBO(n_samples=k)
        vals = jax.vmap(
            lambda kk: -ev.estimate_objective(kk, q, target)
        )(jax.random.split(jax.random.key(5), n_rep))
        return float(jnp.mean(vals))

    b_advi = mean_bound(q_advi)
    b_iw = mean_bound(q_iw)
    # mean-field ELBO gap on this target is 0.5*log(1-rho^2) ~ -1.26 nats;
    # IW-16 recovers most of it only if q was TRAINED for the IW bound.
    assert b_iw > b_advi + 0.02, (b_iw, b_advi)
    assert b_iw > -0.5, b_iw


def test_iwelbo_requires_log_prob(key):
    target, _, _ = normal_meanfield(jax.random.key(3), 2)
    q_flow = avt.planar_flow(jax.random.key(0), dim=2, n_layers=2)
    with pytest.raises(ValueError, match="log_prob"):
        avt.IWELBO(n_samples=4).init(key, q_flow, target)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)
def test_iwelbo_sharded_equals_single(key):
    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh

    target, mu, L = normal_meanfield(jax.random.key(3), 4)
    q = avt.MeanFieldGaussian(mu + 0.2, jnp.diag(L))

    obj_s = avt.IWELBO(n_samples=64)
    g_s, _, info_s = jax.jit(
        lambda q: obj_s.value_and_grad(q, target, key, ())
    )(q)

    obj_m = avt.IWELBO(n_samples=64, mc_axis=MC_AXIS)
    with jax.set_mesh(make_vi_mesh(n_mc=8)):
        g_m, _, info_m = jax.jit(
            lambda q: obj_m.value_and_grad(q, target, key, ())
        )(q)

    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        float(info_s["elbo"]), float(info_m["elbo"]), rtol=1e-5
    )


def test_iwelbo_validation_fires_under_subsampling(key):
    """Round-2 review fix: SubsampledObjective.init delegates to the inner
    objective, so IWELBO's log_prob requirement raises early."""
    from advancedvi_jl_tpu.core.factorized import factorized_target

    y = jnp.ones(16)
    target = factorized_target(
        logprior_fn=lambda th: jnp.zeros(()),
        loglike_fn=lambda th, d: -0.5 * jnp.sum(jnp.square(d["y"] - th[0])),
        data={"y": y}, dim=2,
    )
    q_flow = avt.planar_flow(jax.random.key(0), dim=2, n_layers=2)
    alg = avt.KLMinIWRepGradDescent(
        n_samples=4,
        subsampling=avt.ReshufflingBatchSubsampling(n_data=16, batchsize=4),
    )
    with pytest.raises(ValueError, match="log_prob"):
        alg.init(key, q_flow, target)
