"""Low-rank family end-to-end: ADVI on a correlated Gaussian whose covariance
is exactly diag + rank-2, so LowRankGaussian can represent the posterior."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import NormalTarget


def test_lowrank_advi_convergence(key):
    d, r = 12, 2
    k1, k2, k3 = jax.random.split(jax.random.key(21), 3)
    D = 0.6 + 0.4 * jax.random.uniform(k1, (d,))
    U = 0.5 * jax.random.normal(k2, (d, r))
    cov = jnp.diag(D**2) + U @ U.T
    mu = jax.random.normal(k3, (d,))
    target = NormalTarget(mu=mu, scale_tril=jnp.linalg.cholesky(cov))

    q0 = avt.LowRankGaussian(jnp.zeros(d), jnp.ones(d), 0.1 * jnp.ones((d, r)))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=32,
        optimizer=optax.adam(2e-2),
        operator=avt.ClipScale(),
    )
    out, infos, _ = avt.optimize(key, alg, 3000, target, q0)

    np.testing.assert_allclose(
        np.asarray(out.mean()), np.asarray(mu), atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(out.cov()), np.asarray(cov), atol=0.15
    )
    # ELBO ~ 0 at the (representable) optimum
    nelbo = avt.estimate_objective(
        jax.random.key(5), alg, out, target, n_samples=20_000
    )
    assert abs(float(nelbo)) < 0.1


def test_lowrank_logprob_stable_at_clip_floor():
    """Regression: when an entry of D sits at the ClipScale floor while U
    covers that direction (Sigma well-conditioned), the Woodbury form of
    log_prob catastrophically cancels in float32 (diff/D^2 ~ 1e10) and
    returned -inf; the dense-cholesky path must stay finite and accurate."""
    d, r = 8, 2
    D = jnp.full((d,), 1.0).at[0].set(1e-5)
    U = jnp.zeros((d, r)).at[0, 0].set(1.0).at[1, 1].set(0.5)
    q = avt.LowRankGaussian(jnp.zeros(d), D, U)

    z = q.sample(jax.random.key(0), 256)
    lp = np.asarray(q.log_prob(z))
    assert np.isfinite(lp).all()

    # float64 ground truth through the dense density
    cov = np.diag(np.asarray(D, np.float64) ** 2) + np.asarray(
        U, np.float64
    ) @ np.asarray(U, np.float64).T
    diff = np.asarray(z, np.float64)
    sign, logdet = np.linalg.slogdet(cov)
    quad = np.einsum("nd,dk,nk->n", diff, np.linalg.inv(cov), diff)
    lp_true = -0.5 * (quad + logdet + d * np.log(2 * np.pi))
    np.testing.assert_allclose(lp, lp_true, rtol=1e-3, atol=1e-2)

    assert np.isfinite(float(q.entropy()))


def test_lowrank_advi_no_divergence_when_diag_collapses():
    """End-to-end regression: full-rank target, rank-2 family — the optimum
    drives one D entry to the floor; the run previously raised
    DivergenceError (-inf objective) at ~iter 590."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    target, mu, L = normal_fullrank(jax.random.key(3), 8)
    q0 = avt.LowRankGaussian(jnp.zeros(8), jnp.ones(8), 0.1 * jnp.ones((8, 2)))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=16,
        optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    out, infos, _ = avt.optimize(jax.random.key(4), alg, 1500, target, q0)
    assert np.isfinite(float(infos[-1]["elbo"]))
    assert float(jnp.linalg.norm(out.location - mu)) < 0.5
