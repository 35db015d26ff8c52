"""Dedicated KLMinRepGradProxDescent tests.

Mirrors the reference genres (test/algorithms/klminrepgradproxdescent.jl):
convergence halves parameter error, determinism, subsampled-vs-full
objective agreement, and entropy-estimator restriction. Also covers ADVI
convergence with the non-Gaussian (StudentT / Laplace) location-scale bases
of docs/src/families.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_meanfield


@pytest.fixture
def problem():
    target, mu, L = normal_meanfield(jax.random.key(1), 5)
    return target, mu, L


@pytest.mark.parametrize(
    "entropy", [avt.CLOSED_FORM_ZERO_GRAD, avt.STL_ZERO_GRAD]
)
@pytest.mark.parametrize("qtype", ["meanfield", "fullrank"])
def test_proxdescent_convergence_halves_error(problem, entropy, qtype, key):
    """Parameter error at least halves in 1000 iterations, for both
    zero-gradient entropy estimators (klminrepgradproxdescent.jl)."""
    target, mu, L = problem
    d = mu.shape[0]
    if qtype == "meanfield":
        q0 = avt.MeanFieldGaussian(jnp.zeros(d), jnp.ones(d))
        lam_star = jnp.concatenate([mu, jnp.diag(L)])
        get_lam = lambda q: jnp.concatenate([q.location, q.scale_diag])
    else:
        q0 = avt.FullRankGaussian(jnp.zeros(d))
        lam_star = jnp.concatenate([mu, jnp.diag(L)])
        get_lam = lambda q: jnp.concatenate([q.location, jnp.diag(q.scale)])
    alg = avt.KLMinRepGradProxDescent(
        entropy_zerograd=entropy,
        n_samples=10,
        optimizer=avt.descent(1e-3),
    )
    out, _, _ = avt.optimize(key, alg, 1000, target, q0)
    err0 = jnp.sum(jnp.square(get_lam(q0) - lam_star))
    err = jnp.sum(jnp.square(get_lam(out) - lam_star))
    assert float(err) <= float(err0) / 2


def test_proxdescent_determinism(problem, key):
    """Same key => bitwise-identical output (klminrepgradproxdescent.jl
    determinism testset), including under subsampling."""
    from advancedvi_jl_tpu.models.subsampled_normals import subsampled_normals

    target, mu_true, _ = subsampled_normals(jax.random.key(7), n_data=12)
    q0 = avt.FullRankGaussian(jnp.zeros(mu_true.shape[0]))
    sub = avt.ReshufflingBatchSubsampling(n_data=12, batchsize=3)
    alg = avt.KLMinRepGradProxDescent(n_samples=10, subsampling=sub)
    out1, _, _ = avt.optimize(key, alg, 10, target, q0)
    out2, _, _ = avt.optimize(key, alg, 10, target, q0)
    np.testing.assert_array_equal(
        np.asarray(out1.location), np.asarray(out2.location)
    )
    np.testing.assert_array_equal(
        np.asarray(out1.scale), np.asarray(out2.scale)
    )


def test_proxdescent_rejects_non_zerograd_entropy():
    """Entropy restriction (reference: constructors.jl:122-157 pins the
    estimator set)."""
    with pytest.raises(ValueError, match="zero-gradient"):
        avt.KLMinRepGradProxDescent(entropy_zerograd=avt.STL)


@pytest.mark.parametrize("base", ["student_t", "laplace"])
def test_advi_with_heavy_tailed_base_converges(problem, base, key):
    """ADVI location error halves with StudentT/Laplace bases
    (docs/src/families.md:74-110 usage pattern)."""
    target, mu, L = problem
    d = mu.shape[0]
    b = avt.StudentT(df=8.0) if base == "student_t" else avt.Laplace()
    q0 = avt.MeanFieldLocationScale(
        location=jnp.zeros(d), scale_diag=jnp.ones(d), base=b
    )
    alg = avt.KLMinRepGradDescent(
        entropy=avt.MONTE_CARLO,
        n_samples=32,
        optimizer=avt.descent(1e-3),
        operator=avt.ClipScale(),
    )
    out, _, _ = avt.optimize(key, alg, 1000, target, q0)
    err0 = jnp.sum(jnp.square(q0.location - mu))
    err = jnp.sum(jnp.square(out.location - mu))
    assert float(err) <= float(err0) / 2
