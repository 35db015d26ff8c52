"""Block-diagonal Gaussian family tests.

The middle point between the reference's mean-field and full-rank families
(reference: src/families/location_scale.jl): per-block dense covariance at
O(B k^2) parameters. Genres mirror tests/test_families.py: moment/density
identities vs the dense family, seeded reproducibility, convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt


def _rand_blockdiag(key, B=3, k=2):
    raw = 0.3 * jax.random.normal(key, (B, k, k))
    scales = jnp.tril(raw) + 1.0 * jnp.eye(k)
    loc = jax.random.normal(jax.random.fold_in(key, 1), (B * k,))
    return avt.BlockDiagGaussian(loc, scales)


def test_blockdiag_single_block_equals_fullrank(key):
    """B=1 reduces exactly to FullRankGaussian: same draws' density, same
    entropy, same moments."""
    d = 4
    C = jnp.tril(0.3 * jax.random.normal(jax.random.key(2), (d, d))) + jnp.eye(d)
    loc = jnp.asarray([0.5, -1.0, 0.0, 2.0])
    q_bd = avt.BlockDiagGaussian(loc, C[None])
    q_fr = avt.FullRankGaussian(loc, C)

    z = q_fr.sample(key, 64)
    np.testing.assert_allclose(
        np.asarray(q_bd.log_prob(z)), np.asarray(q_fr.log_prob(z)),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(q_bd.entropy()), float(q_fr.entropy()), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(q_bd.var()), np.asarray(q_fr.var()), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(q_bd.cov()), np.asarray(q_fr.cov()), rtol=1e-6
    )


def test_blockdiag_density_matches_dense_construction(key):
    """log_prob/entropy equal the FullRankGaussian built from the dense
    block-diagonal scale matrix."""
    q = _rand_blockdiag(jax.random.key(7))
    dense = avt.FullRankGaussian(q.location, q.scale_matrix())
    z = q.sample(key, 128)
    np.testing.assert_allclose(
        np.asarray(q.log_prob(z)), np.asarray(dense.log_prob(z)),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(q.entropy()), float(dense.entropy()), rtol=1e-6
    )
    # sample statistics: empirical covariance ~ block-diagonal cov
    zs = q.sample(key, 200_000)
    emp = np.cov(np.asarray(zs).T)
    np.testing.assert_allclose(emp, np.asarray(q.cov()), atol=0.03)
    # single-point (unbatched) log_prob
    np.testing.assert_allclose(
        float(q.log_prob(z[0])), float(dense.log_prob(z[0])), rtol=1e-5
    )


def test_blockdiag_advi_recovers_block_covariance(key):
    """ADVI with the block-diagonal family on a block-structured target
    recovers the exact per-block covariance (to which mean-field cannot
    converge) and matches the full-rank ELBO (no cross-block mass to miss)."""
    B, k = 2, 2
    rho = 0.8
    block = jnp.asarray([[1.0, 0.0], [rho, jnp.sqrt(1 - rho**2)]])
    L = jax.scipy.linalg.block_diag(block, 0.5 * block)
    from advancedvi_jl_tpu.models.normal import NormalTarget

    mu = jnp.asarray([1.0, -1.0, 0.5, 0.0])
    target = NormalTarget(mu=mu, scale_tril=L)

    q0 = avt.BlockDiagGaussian(jnp.zeros(4), n_blocks=2)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=16, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    q, infos, _ = avt.optimize(key, alg, 3000, target, q0)
    np.testing.assert_allclose(np.asarray(q.location), np.asarray(mu), atol=0.02)
    np.testing.assert_allclose(
        np.asarray(q.cov()), np.asarray(L @ L.T), atol=0.03
    )
    # ELBO ~ 0 (exact family for this target)
    e = float(
        avt.RepGradELBO(n_samples=20_000, entropy=avt.MONTE_CARLO)
        .estimate_objective(jax.random.key(5), q, target)
    )
    assert abs(e) < 0.02, e


def test_blockdiag_constructor_validation():
    with pytest.raises(ValueError, match="divisible"):
        avt.BlockDiagGaussian(jnp.zeros(5), n_blocks=2)
    with pytest.raises(ValueError, match="scales"):
        avt.BlockDiagGaussian(jnp.zeros(6), jnp.ones((2, 2, 2)))
    with pytest.raises(ValueError, match="n_blocks"):
        avt.BlockDiagGaussian(jnp.zeros(6))


def test_blockdiag_with_iwelbo_and_clipscale(key):
    """Composes with other objectives/operators: IW-VI run stays finite and
    ClipScale keeps block diagonals >= eps."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    target, mu, L = normal_fullrank(jax.random.key(9), 4)
    q0 = avt.BlockDiagGaussian(jnp.zeros(4), n_blocks=2)
    alg = avt.KLMinIWRepGradDescent(
        n_samples=8, optimizer=optax.adam(1e-2), operator=avt.ClipScale()
    )
    q, infos, _ = avt.optimize(key, alg, 500, target, q0)
    assert np.isfinite(infos[-1]["elbo"])
    diag = np.asarray(jnp.diagonal(q.scales, axis1=-2, axis2=-1))
    assert (diag >= 1e-5).all()


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)
def test_blockdiag_block_axis_sharded_equals_single(key):
    """Blocks shard over the mesh like experts; gradients match unsharded."""
    import dataclasses

    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    target, mu, L = normal_fullrank(jax.random.key(9), 16)
    q = avt.BlockDiagGaussian(jnp.zeros(16), n_blocks=8)
    obj = avt.RepGradELBO(n_samples=32, entropy=avt.STL)

    g_ref, _, _ = jax.jit(lambda q: obj.value_and_grad(q, target, key, ()))(q)

    q_sh = dataclasses.replace(q, block_axis=MC_AXIS)
    with jax.set_mesh(make_vi_mesh(n_mc=8)):
        g_sh, _, _ = jax.jit(
            lambda q: obj.value_and_grad(q, target, key, ())
        )(q_sh)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_blockdiag_proximal_descent(key):
    """KLMinRepGradProxDescent works with the block-diagonal family: the
    entropy prox has the same closed form as full-rank (log-barrier only on
    the block diagonals)."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    target, mu, L = normal_fullrank(jax.random.key(9), 4)
    q0 = avt.BlockDiagGaussian(jnp.zeros(4), n_blocks=2)
    alg = avt.KLMinRepGradProxDescent(n_samples=8)
    q, infos, _ = avt.optimize(key, alg, 1500, target, q0)
    assert np.isfinite(infos[-1]["elbo"])
    assert float(jnp.linalg.norm(q.location - mu)) < 0.1
    diag = np.asarray(jnp.diagonal(q.scales, axis1=-2, axis2=-1))
    assert (diag > 0).all()  # prox keeps the scale strictly positive
