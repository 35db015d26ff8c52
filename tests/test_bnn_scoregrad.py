"""BASELINE config coverage: BNN posterior ADVI and ScoreGrad-with-subsampling.

Also compares ScoreGrad vs RepGrad gradient variance on the logreg model
(BASELINE config #3: 'ScoreGradELBO variance vs RepGrad compared')."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.bnn import make_bnn
from advancedvi_jl_tpu.models.logreg import make_logreg


def test_bnn_proximal_advi_improves_elbo(key):
    """Polyak-averaged proximal ADVI on a BNN posterior (BASELINE config #5):
    the ELBO improves substantially under the parameter-free rule."""
    bnn = make_bnn(jax.random.key(30), n_data=128, in_dim=4, hidden=8)
    bnn = bnn.replace(noise_scale=0.25)
    d = bnn.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    alg = avt.KLMinRepGradProxDescent(
        entropy_zerograd=avt.STL_ZERO_GRAD,
        n_samples=8,
        optimizer=avt.dowg(1e-2),
        averager=avt.PolynomialAveraging(),
    )
    out, infos, _ = avt.optimize(key, alg, 3000, bnn, q0)
    elbos = np.asarray([i["elbo"] for i in infos])
    assert np.isfinite(elbos).all()
    assert elbos[-1] > elbos[0] + 50


def test_bnn_advi_fits_data(key):
    """Plain ADVI + Adam on the BNN posterior recovers predictive signal."""
    bnn = make_bnn(jax.random.key(30), n_data=128, in_dim=4, hidden=8)
    q0 = avt.MeanFieldGaussian(jnp.zeros(bnn.dim), 0.1 * jnp.ones(bnn.dim))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    out, infos, _ = avt.optimize(key, alg, 2000, bnn, q0)
    pred = np.asarray(bnn.forward(out.location, bnn.X))
    corr = np.corrcoef(pred, np.asarray(bnn.y))[0, 1]
    assert corr > 0.8


def test_scoregrad_with_subsampling(key):
    target = make_logreg(jax.random.key(11), n_data=64, n_features=7).unconstrained()
    q0 = avt.MeanFieldGaussian(jnp.zeros(9), 0.1 * jnp.ones(9))
    sub = avt.ReshufflingBatchSubsampling(n_data=64, batchsize=16)
    alg = avt.KLMinScoreGradDescent(
        n_samples=64,
        subsampling=sub,
        optimizer=optax.adam(5e-3),
        operator=avt.ClipScale(),
    )
    out, infos, _ = avt.optimize(key, alg, 1000, target, q0)
    elbos = np.asarray([i["elbo"] for i in infos])
    assert np.isfinite(elbos).all()
    assert elbos[-50:].mean() > elbos[:50].mean()
    assert "epoch" in infos[-1]


def test_scoregrad_variance_exceeds_repgrad(key):
    """BASELINE config #3: the score-function gradient estimator has (much)
    higher variance than the reparameterization gradient on logreg."""
    target = make_logreg(jax.random.key(11), n_data=64, n_features=7).unconstrained()
    q = avt.MeanFieldGaussian(jnp.zeros(9), 0.3 * jnp.ones(9))

    def grad_norms(obj, n_rep=32):
        norms = []
        for i in range(n_rep):
            g, _, _ = obj.value_and_grad(q, target, jax.random.fold_in(key, i))
            flat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g)])
            norms.append(np.asarray(flat))
        return np.stack(norms)

    g_rep = grad_norms(avt.RepGradELBO(n_samples=8, entropy=avt.STL))
    g_score = grad_norms(avt.ScoreGradELBO(n_samples=8))
    var_rep = g_rep.var(axis=0).sum()
    var_score = g_score.var(axis=0).sum()
    assert var_score > 2.0 * var_rep


def test_bnn_bf16_compute_dtype(key):
    """Opt-in bf16 matmul path: float32 in/out, close agreement with the f32
    forward, and subsample() preserves the static field."""
    from advancedvi_jl_tpu.models.bnn import make_bnn

    bnn = make_bnn(jax.random.key(1), n_data=64, in_dim=8, hidden=16)
    bnn16 = bnn.replace(compute_dtype="bfloat16")
    theta = 0.1 * jax.random.normal(key, (bnn.dim,))
    ld32 = float(bnn.log_density(theta))
    ld16 = float(bnn16.log_density(theta))
    assert bnn16.log_density(theta).dtype == jnp.float32
    np.testing.assert_allclose(ld16, ld32, rtol=2e-2)

    sub = bnn16.subsample(jnp.arange(16))
    assert sub.compute_dtype == "bfloat16"
    assert float(sub.likeadj) == 4.0
