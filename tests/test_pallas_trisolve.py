"""Pallas right-looking blocked trisolve (ops/pallas/trisolve_kernels.py).

Pins the single-kernel solve (family solve_mode="pallas") against the XLA
triangular_solve path: raw values both modes, custom-VJP gradients, family
log_prob / apply_inv_scale_T, and an STL training trajectory.  Runs in
interpret mode on CPU (selected automatically off-TPU); the kernel's
compiled path is exercised by bench_large on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.ops.pallas.trisolve_kernels import (
    solve_right,
    supports_pallas_trisolve,
    vdiv_c,
    vdiv_ct,
)


def _factor(key, d, diag=1.5, off=None):
    off = off if off is not None else 0.3 / d**0.5
    A = jax.random.normal(key, (d, d)) * off
    return jnp.tril(A, -1) + diag * jnp.eye(d)


def _ref(C, V, mode):
    return jax.lax.linalg.triangular_solve(
        C, V.T, left_side=True, lower=True, transpose_a=(mode == "C")
    ).T


@pytest.mark.parametrize("d,n", [(128, 8), (256, 64), (512, 24), (1024, 16)])
@pytest.mark.parametrize("mode", ["C", "CT"])
def test_solve_right_matches_xla(key, d, n, mode):
    assert supports_pallas_trisolve(d)
    C = _factor(key, d)
    V = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    W = solve_right(C, V, mode=mode, interpret=True)
    np.testing.assert_allclose(
        np.asarray(W), np.asarray(_ref(C, V, mode)), rtol=2e-4, atol=2e-5
    )


def test_shape_gate_falls_back(key):
    for d in (5, 96, 100):
        assert not supports_pallas_trisolve(d)
        C = _factor(key, d)
        V = jax.random.normal(jax.random.fold_in(key, 1), (4, d))
        for mode in ("C", "CT"):
            np.testing.assert_allclose(
                np.asarray(solve_right(C, V, mode=mode, interpret=True)),
                np.asarray(_ref(C, V, mode)),
                rtol=1e-5, atol=1e-6,
            )


@pytest.mark.parametrize("f,mode", [(vdiv_c, "C"), (vdiv_ct, "CT")])
def test_vdiv_gradients_match_xla(key, f, mode):
    d, n = 256, 24
    C = _factor(key, d, diag=1.5)
    V = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    ct = jax.random.normal(jax.random.fold_in(key, 2), (n, d))

    g1 = jax.grad(lambda C, V: jnp.sum(f(C, V) * ct), argnums=(0, 1))(C, V)
    g2 = jax.grad(
        lambda C, V: jnp.sum(_ref(C, V, mode) * ct), argnums=(0, 1)
    )(C, V)
    # XLA's solve grad w.r.t. C differs off-triangle; compare the tril part
    # (the strict upper triangle is inert by the family contract)
    np.testing.assert_allclose(
        np.asarray(jnp.tril(g1[0])), np.asarray(jnp.tril(g2[0])),
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-4, atol=2e-5
    )


def test_family_pallas_solve_mode_parity(key):
    d = 256
    C = _factor(key, d, diag=1.3)
    loc = jax.random.normal(jax.random.fold_in(key, 2), (d,))
    q_s = avt.FullRankGaussian(loc, C)
    q_p = avt.FullRankGaussian(loc, C, solve_mode="pallas")
    z = q_s.sample(jax.random.fold_in(key, 3), 16)
    np.testing.assert_allclose(
        np.asarray(q_s.log_prob(z)), np.asarray(q_p.log_prob(z)),
        rtol=2e-4, atol=2e-3,
    )
    # 1-row vector path falls back to the XLA solve
    np.testing.assert_allclose(
        float(q_s.log_prob(z[0])), float(q_p.log_prob(z[0])), rtol=1e-5
    )
    V = jax.random.normal(jax.random.fold_in(key, 4), (16, d))
    np.testing.assert_allclose(
        np.asarray(q_s.apply_inv_scale_T(V)),
        np.asarray(q_p.apply_inv_scale_T(V)),
        rtol=2e-3, atol=2e-3,
    )


def test_stl_training_trajectory_parity(key):
    from advancedvi_jl_tpu.models.normal import normal_fullrank_wellcond

    d = 128
    target, mu, L = normal_fullrank_wellcond(key, d)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, operator=avt.ClipScale()
    )
    outs = {}
    for mode in ("solve", "pallas"):
        q0 = avt.FullRankGaussian(jnp.zeros(d), solve_mode=mode)
        out, infos, _ = avt.optimize(
            jax.random.key(7), alg, 150, target, q0
        )
        outs[mode] = (out, infos[-1]["elbo"])
    np.testing.assert_allclose(
        np.asarray(outs["solve"][0].location),
        np.asarray(outs["pallas"][0].location),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        outs["solve"][1], outs["pallas"][1], rtol=1e-4, atol=1e-3
    )
