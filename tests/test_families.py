"""Family interface tests.

Mirrors the reference genre: moments / entropy / logpdf against analytic
Gaussian ground truth, seeded reproducibility, dtype stability
(reference: test/families/location_scale.jl:1-156).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedvi_jl_tpu as avt


def _mvnormal_logpdf(z, mu, cov):
    d = mu.shape[0]
    diff = z - mu
    sol = np.linalg.solve(cov, diff)
    _, logdet = np.linalg.slogdet(cov)
    return -0.5 * (diff @ sol + logdet + d * np.log(2 * np.pi))


@pytest.fixture(params=["meanfield", "fullrank", "lowrank"])
def family(request, key):
    d = 5
    k1, k2, k3 = jax.random.split(key, 3)
    loc = jax.random.normal(k1, (d,))
    if request.param == "meanfield":
        diag = 0.5 + jax.random.uniform(k2, (d,))
        q = avt.MeanFieldGaussian(loc, diag)
        cov = np.diag(np.asarray(diag) ** 2)
    elif request.param == "fullrank":
        A = 0.3 * jax.random.normal(k2, (d, d))
        C = jnp.tril(A, -1) + jnp.diag(1.0 + jnp.abs(jnp.diag(A)))
        q = avt.FullRankGaussian(loc, C)
        Cn = np.asarray(jnp.tril(C))
        cov = Cn @ Cn.T
    else:
        diag = 0.5 + jax.random.uniform(k2, (d,))
        U = 0.3 * jax.random.normal(k3, (d, 2))
        q = avt.LowRankGaussian(loc, diag, U)
        cov = np.diag(np.asarray(diag) ** 2) + np.asarray(U) @ np.asarray(U).T
    return q, np.asarray(loc), cov


def test_moments(family):
    q, loc, cov = family
    np.testing.assert_allclose(np.asarray(q.mean()), loc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q.var()), np.diag(cov), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q.cov()), cov, rtol=1e-5, atol=1e-6)


def test_entropy_matches_gaussian(family):
    q, loc, cov = family
    d = loc.shape[0]
    _, logdet = np.linalg.slogdet(cov)
    h_true = 0.5 * (d * np.log(2 * np.pi * np.e) + logdet)
    np.testing.assert_allclose(float(q.entropy()), h_true, rtol=1e-5)


def test_logpdf_matches_gaussian(family, key):
    q, loc, cov = family
    z = q.sample(key, 16)
    lp = np.asarray(q.log_prob(z))
    expected = np.array(
        [_mvnormal_logpdf(np.asarray(zi), loc, cov) for zi in z]
    )
    np.testing.assert_allclose(lp, expected, rtol=1e-4, atol=1e-4)


def test_sample_statistics(family, key):
    q, loc, cov = family
    z = np.asarray(q.sample(key, 200_000))
    np.testing.assert_allclose(z.mean(0), loc, atol=0.02)
    np.testing.assert_allclose(np.cov(z.T), cov, atol=0.03)


def test_seeded_reproducibility(family, key):
    q, _, _ = family
    z1 = q.sample(key, 7)
    z2 = q.sample(key, 7)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_dtype_stability(key):
    for enable_x64, dtype in ((False, jnp.float32), (True, jnp.float64)):
        jax.config.update("jax_enable_x64", enable_x64)
        try:
            loc = jnp.zeros(3, dtype)
            q = avt.MeanFieldGaussian(loc, jnp.ones(3, dtype))
            z = q.sample(jax.random.key(0), 4)
            assert z.dtype == dtype
            assert q.log_prob(z).dtype == dtype
            assert q.entropy().dtype == dtype
        finally:
            jax.config.update("jax_enable_x64", False)


def test_student_t_and_laplace_bases(key):
    d = 4
    for base in (avt.StudentT(df=5.0), avt.Laplace()):
        q = avt.MeanFieldLocationScale(
            location=jnp.zeros(d), scale_diag=jnp.ones(d), base=base
        )
        z = np.asarray(q.sample(key, 100_000))
        np.testing.assert_allclose(z.mean(0), np.zeros(d), atol=0.05)
        np.testing.assert_allclose(
            z.var(0), np.full(d, base.var()), rtol=0.1
        )
        # entropy formula consistency: MC estimate of -E[log q] matches
        h_mc = -np.mean(np.asarray(q.log_prob(q.sample(key, 100_000))))
        np.testing.assert_allclose(float(q.entropy()), h_mc, rtol=0.02)


def test_fullrank_compute_dtype_bf16(key):
    """compute_dtype='bfloat16' quantizes only the sampling matmul: output
    stays f32, draws match the f32 path to bf16 resolution, and densities /
    entropy are computed from the f32 parameters (bit-identical)."""
    d = 16
    A = 0.3 * jax.random.normal(key, (d, d))
    C = jnp.tril(A, -1) + jnp.eye(d)
    q32 = avt.FullRankGaussian(jnp.arange(d, dtype=jnp.float32), C)
    qbf = avt.FullRankGaussian(
        jnp.arange(d, dtype=jnp.float32), C, compute_dtype="bfloat16"
    )
    z32, u32 = q32.sample_with_base(key, 64)
    zbf, ubf = qbf.sample_with_base(key, 64)
    assert zbf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(u32), np.asarray(ubf))
    # bf16 has ~3 significant decimal digits
    np.testing.assert_allclose(
        np.asarray(zbf), np.asarray(z32), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_array_equal(
        np.asarray(q32.log_prob(z32)), np.asarray(qbf.log_prob(z32))
    )
    np.testing.assert_array_equal(
        float(q32.entropy()), float(qbf.entropy())
    )


def test_normal_target_solve_free_parity(key):
    """NormalTarget.solve_free(): precomputed L^{-1} path equals the
    triangular-solve path (values and gradients)."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    d = 48
    target, mu, L = normal_fullrank(key, d)
    sf = target.solve_free()
    theta = mu + 0.5 * jax.random.normal(jax.random.key(1), (d,))
    a = float(target.log_density(theta))
    b = float(sf.log_density(theta))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    ga = jax.grad(target.log_density)(theta)
    gb = jax.grad(sf.log_density)(theta)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-4
    )
