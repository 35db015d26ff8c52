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
