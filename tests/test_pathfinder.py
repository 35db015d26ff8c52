"""Pathfinder tests (beyond-reference; TuringLang-ecosystem algorithm).

Genres: exactness on Gaussians (L-BFGS inverse Hessian = exact covariance on
a quadratic log-density), gradient-budget comparison vs ADVI, warm-start
value, multi-path importance resampling with the PSIS diagnostic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.models.normal import normal_fullrank


def test_pathfinder_exact_on_gaussian(key):
    """On a Gaussian target the BFGS inverse Hessian converges to the exact
    covariance: ELBO ~ 0, moments recovered, k-hat reliable."""
    target, mu, L = normal_fullrank(jax.random.key(3), 5)
    res = avt.pathfinder(key, target, n_steps=40, n_elbo_samples=256)

    # The ELBO-argmax picks an iterate whose KL to the target is within MC
    # noise of zero; the L-BFGS trajectory itself reaches the mode exactly.
    assert float(res.elbo) > -0.05, float(res.elbo)
    np.testing.assert_allclose(
        np.asarray(res.trajectory[-1]), np.asarray(mu), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.q.location), np.asarray(mu), atol=0.2
    )
    np.testing.assert_allclose(
        np.asarray(res.q.cov()), np.asarray(L @ L.T), atol=0.3
    )
    diag = avt.importance_diagnostics(jax.random.key(5), res.q, target, 4096)
    assert diag["khat"] < 0.5, diag


def test_pathfinder_few_gradients_vs_advi(key):
    """Pathfinder's 30-step budget lands within ~2 nats of ADVI's
    2000-step converged ELBO on the flagship logreg model (measured ~1.3;
    it returns a trajectory-point Gaussian, not a fully optimized one —
    its role is cheap initialization/approximation, Zhang et al. §1)."""
    target = make_logreg(
        jax.random.key(11), n_data=64, n_features=7
    ).unconstrained()
    res = avt.pathfinder(key, target, n_steps=30, n_elbo_samples=64)

    advi = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=16, optimizer=optax.adam(2e-2),
        operator=avt.ClipScale(),
    )
    q0 = avt.FullRankGaussian(jnp.zeros(9), 0.1 * jnp.eye(9))
    q_advi, _, _ = avt.optimize(jax.random.key(1), advi, 2000, target, q0)

    ev = avt.RepGradELBO(n_samples=20_000, entropy=avt.MONTE_CARLO)
    e_pf = -float(ev.estimate_objective(jax.random.key(5), res.q, target))
    e_advi = -float(ev.estimate_objective(jax.random.key(5), q_advi, target))
    assert e_pf > e_advi - 2.0, (e_pf, e_advi)


def test_pathfinder_warm_starts_advi(key):
    """ADVI initialized from the Pathfinder Gaussian reaches in 100 steps
    what a cold start needs far longer for."""
    target = make_logreg(
        jax.random.key(11), n_data=64, n_features=7
    ).unconstrained()
    res = avt.pathfinder(key, target, n_steps=30)

    advi = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=16, optimizer=optax.adam(2e-2),
        operator=avt.ClipScale(),
    )
    ev = avt.RepGradELBO(n_samples=20_000, entropy=avt.MONTE_CARLO)

    q_warm, _, _ = avt.optimize(
        jax.random.key(1), advi, 100, target, res.q
    )
    q_cold, _, _ = avt.optimize(
        jax.random.key(1), advi, 100, target,
        avt.FullRankGaussian(jnp.zeros(9), 0.1 * jnp.eye(9)),
    )
    e_warm = -float(ev.estimate_objective(jax.random.key(5), q_warm, target))
    e_cold = -float(ev.estimate_objective(jax.random.key(5), q_cold, target))
    assert e_warm > e_cold + 0.5, (e_warm, e_cold)


def test_multipath_pathfinder(key):
    """Multi-path: pooled importance-resampled draws match the posterior;
    the mixture-proposal k-hat is reliable on a Gaussian."""
    target, mu, L = normal_fullrank(jax.random.key(3), 4)
    draws, diag, results = avt.multipath_pathfinder(
        key, target, n_paths=4, n_draws=2000, n_steps=30
    )
    assert draws.shape == (2000, 4)
    assert diag["khat"] < 0.7, diag
    np.testing.assert_allclose(
        np.asarray(jnp.mean(draws, axis=0)), np.asarray(mu), atol=0.1
    )
    # every path found a decent ELBO
    for r in results:
        assert float(r.elbo) > -0.5


def test_pathfinder_rejects_bad_target(key):
    class NotAPytree:
        def log_density(self, th):
            return 0.0

        dim = 3

    with pytest.raises(TypeError, match="pytree"):
        avt.pathfinder(key, NotAPytree())
