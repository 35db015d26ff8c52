"""Level-parallel blocked triangular inverse (ops/trinv.py) parity.

The kernel replaces XLA's sequential blocked substitution on the VI hot
paths (FullRankLocationScale solve_mode="inverse"); these tests pin it
against the solve path: values, gradients, and full-step trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.ops.trinv import supports_blocked_inverse, tril_inverse


def _factor(key, d, diag=1.0, off=None):
    off = off if off is not None else 0.3 / d**0.5
    A = jax.random.normal(key, (d, d)) * off
    return jnp.tril(A, -1) + diag * jnp.eye(d)


@pytest.mark.parametrize("d", [128, 256, 512, 1024])
def test_inverse_matches_solve(key, d):
    C = _factor(key, d)
    T = tril_inverse(C)
    np.testing.assert_allclose(
        np.asarray(T @ C), np.eye(d), atol=5e-4
    )
    # lower-triangular structure preserved (upper is exactly zero)
    assert float(jnp.abs(jnp.triu(T, 1)).max()) == 0.0


def test_shape_gate_falls_back(key):
    # 96 = not a multiple-of-128 tiling; 384 = 3 blocks (not a power of 2)
    for d in (5, 96, 384):
        assert not supports_blocked_inverse(d)
        C = _factor(key, d)
        T = tril_inverse(C)
        np.testing.assert_allclose(np.asarray(T @ C), np.eye(d), atol=5e-4)


def test_gradients_match_solve_path(key):
    from jax.scipy.linalg import solve_triangular

    d = 256
    C = _factor(key, d)
    V = jax.random.normal(jax.random.fold_in(key, 1), (8, d))

    def via_inv(C):
        return jnp.sum(jnp.sin(V @ tril_inverse(C)))

    def via_solve(C):
        return jnp.sum(jnp.sin(solve_triangular(C, V.T, lower=True, trans=1).T))

    np.testing.assert_allclose(
        float(via_inv(C)), float(via_solve(C)), rtol=1e-4
    )
    gi, gs = jax.grad(via_inv)(C), jax.grad(via_solve)(C)
    np.testing.assert_allclose(
        np.asarray(gi), np.asarray(gs), rtol=5e-3, atol=1e-4
    )


@pytest.mark.parametrize("d", [64, 256])
def test_family_solve_mode_parity(key, d):
    """log_prob and apply_inv_scale_T agree between solve modes, and an STL
    training trajectory is numerically indistinguishable."""
    C = _factor(key, d, diag=1.3)
    loc = jax.random.normal(jax.random.fold_in(key, 2), (d,))
    q_s = avt.FullRankGaussian(loc, C)
    q_i = avt.FullRankGaussian(loc, C, solve_mode="inverse")
    z = q_s.sample(jax.random.fold_in(key, 3), 16)
    np.testing.assert_allclose(
        np.asarray(q_s.log_prob(z)), np.asarray(q_i.log_prob(z)),
        rtol=2e-4, atol=2e-3,
    )
    V = jax.random.normal(jax.random.fold_in(key, 4), (16, d))
    np.testing.assert_allclose(
        np.asarray(q_s.apply_inv_scale_T(V)),
        np.asarray(q_i.apply_inv_scale_T(V)),
        rtol=2e-3, atol=2e-3,
    )


def test_stl_training_trajectory_parity(key):
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    d = 16
    target, mu, L = normal_fullrank(key, d)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, operator=avt.ClipScale()
    )
    outs = {}
    for mode in ("solve", "inverse"):
        q0 = avt.FullRankGaussian(jnp.zeros(d), solve_mode=mode)
        out, infos, _ = avt.optimize(
            jax.random.key(7), alg, 400, target, q0
        )
        outs[mode] = (out, infos[-1]["elbo"])
    np.testing.assert_allclose(
        np.asarray(outs["solve"][0].location),
        np.asarray(outs["inverse"][0].location),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        outs["solve"][1], outs["inverse"][1], atol=1e-3
    )
