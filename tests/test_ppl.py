"""PPL ingestion tests (the reference's DynamicPPL-bridge genre,
reference: test/integration/dynamicppl.jl:1-58, plus exactness checks the
reference doesn't have)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu import ppl


def _logreg_data(n=64, d=5, key=jax.random.key(11)):
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.normal(k1, (n, d))
    beta = jax.random.normal(k2, (d,))
    y = (jax.random.uniform(k3, (n,)) < jax.nn.sigmoid(X @ beta)).astype(
        jnp.float32
    )
    return {"X": X, "y": y}


def _logreg_model(data):
    d = data["X"].shape[1]
    sigma = ppl.sample("sigma", ppl.LogNormal(0.0, 3.0))
    beta = ppl.sample("beta", ppl.Normal(jnp.zeros(d), sigma))
    logits = data["X"] @ beta
    with ppl.plate("obs", data["X"].shape[0]):
        ppl.sample("y", ppl.Bernoulli(logits=logits), obs=data["y"])


def test_ingest_log_density_matches_handwritten_target():
    """The ingested constrained-space log-joint equals the hand-written
    flagship LogReg target exactly (same math, zero boilerplate)."""
    from advancedvi_jl_tpu.models.logreg import LogReg

    data = _logreg_data()
    m = ppl.ingest(_logreg_model, data=data)
    ref = LogReg(X=data["X"], y=data["y"], likeadj=jnp.ones(()))

    # constrained theta = [beta (5), sigma] in both parameterizations; the
    # ingested site order is (sigma, beta) -> build matching vectors.
    beta = jnp.asarray([0.3, -0.2, 0.5, 0.1, -0.4])
    sigma = jnp.asarray(1.7)
    theta_ppl = jnp.concatenate([sigma[None], beta])
    theta_ref = jnp.concatenate([beta, sigma[None]])
    np.testing.assert_allclose(
        float(m.target.prob.log_density(theta_ppl)),
        float(ref.log_density(theta_ref)),
        rtol=1e-6,
    )
    assert m.dim == 6 and m.dim_constrained == 6


def test_ingest_subsample_rescales_only_plate_sites():
    """Plate-observed likelihood rescales by n/batch; prior and global
    (non-plate) evidence terms do not (the reference's likeadj contract,
    ext/AdvancedVIDynamicPPLExt.jl:188-209)."""

    def model(data):
        mu = ppl.sample("mu", ppl.Normal(0.0, 1.0))
        # global evidence OUTSIDE the plate: must never be rescaled
        ppl.sample("global_obs", ppl.Normal(mu, 2.0), obs=jnp.asarray(0.7))
        with ppl.plate("obs", data["y"].shape[0]):
            ppl.sample("y", ppl.Normal(mu, 1.0), obs=data["y"])

    y = jnp.asarray([0.5, -1.0, 2.0, 0.0])
    m = ppl.ingest(model, data={"y": y})
    idx = jnp.asarray([1, 3])
    sub = m.target.subsample(idx)

    mu = 0.4

    def n01(x, loc, sc):
        return -0.5 * ((x - loc) / sc) ** 2 - math.log(sc) - 0.5 * math.log(
            2 * math.pi
        )

    expected = (
        n01(mu, 0.0, 1.0)
        + n01(0.7, mu, 2.0)
        + 2.0 * (n01(y[1], mu, 1.0) + n01(y[3], mu, 1.0))  # n/batch = 2
    )
    # evaluate in constrained space (real support -> transform is identity)
    got = float(sub.log_density(jnp.asarray([mu])))
    np.testing.assert_allclose(got, float(expected), rtol=1e-6)


def test_ingest_advi_matches_handwritten_fit(key):
    """End-to-end: ADVI on the ingested model agrees with ADVI on the
    hand-written target (posterior means within joint MC error)."""
    from advancedvi_jl_tpu.models.logreg import LogReg

    data = _logreg_data()
    m = ppl.ingest(_logreg_model, data=data)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=16, optimizer=optax.adam(2e-2),
        operator=avt.ClipScale(),
    )
    q1, _, _ = avt.optimize(key, alg, 2000, m.target, m.q_init())

    ref = LogReg(X=data["X"], y=data["y"], likeadj=jnp.ones(())).unconstrained()
    q2, _, _ = avt.optimize(
        key, alg, 2000, ref,
        avt.MeanFieldGaussian(jnp.zeros(6), 0.1 * jnp.ones(6)),
    )

    post = m.sample_posterior(jax.random.key(5), q1, 20_000)
    beta_ppl = np.asarray(jnp.mean(post["beta"], axis=0))
    sigma_ppl = float(jnp.mean(post["sigma"]))

    z = q2.sample(jax.random.key(5), 20_000)
    beta_ref = np.asarray(jnp.mean(z[:, :5], axis=0))
    sigma_ref = float(jnp.mean(jnp.exp(z[:, 5])))

    np.testing.assert_allclose(beta_ppl, beta_ref, atol=0.12)
    np.testing.assert_allclose(sigma_ppl, sigma_ref, rtol=0.2)


def test_ingest_subsampled_advi_converges(key):
    """Doubly-stochastic VI straight from the DSL: conjugate normal-normal
    posterior recovered under minibatching."""
    n = 128
    y = 1.5 + jax.random.normal(jax.random.key(2), (n,))

    def model(data):
        mu = ppl.sample("mu", ppl.Normal(0.0, 1.0))
        with ppl.plate("obs", n):
            ppl.sample("y", ppl.Normal(mu, 1.0), obs=data["y"])

    m = ppl.ingest(model, data={"y": y})
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=n, batchsize=32),
    )
    q, infos, _ = avt.optimize(key, alg, 3000, m.target, m.q_init())

    # analytic posterior: mean = sum(y) / (n + 1), var = 1 / (n + 1)
    post_mean = float(jnp.sum(y) / (n + 1))
    post_sd = (1.0 / (n + 1)) ** 0.5
    assert abs(float(q.location[0]) - post_mean) < 0.03
    np.testing.assert_allclose(
        float(q.scale_diag[0]), post_sd, rtol=0.2
    )


def test_ingest_simplex_latent_dirichlet_categorical(key):
    """Dirichlet prior + categorical observations: the simplex support maps
    through stick-breaking automatically; posterior mean matches the
    conjugate Dirichlet posterior within MC error."""
    alpha = jnp.asarray([2.0, 1.0, 3.0])
    counts = jnp.asarray([14.0, 5.0, 21.0])
    obs = jnp.repeat(jnp.arange(3), counts.astype(int))

    def model():
        p = ppl.sample("p", ppl.Dirichlet(alpha))
        logits = jnp.log(p)
        with ppl.plate("obs", obs.shape[0]):
            ppl.sample("y", ppl.Categorical(logits=logits), obs=obs)

    m = ppl.ingest(model)
    assert m.dim == 2 and m.dim_constrained == 3
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=32, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    q, _, _ = avt.optimize(key, alg, 3000, m.target, m.q_init())
    post = m.sample_posterior(jax.random.key(5), q, 50_000)
    p_mean = np.asarray(jnp.mean(post["p"], axis=0))
    exact = np.asarray((alpha + counts) / jnp.sum(alpha + counts))
    np.testing.assert_allclose(p_mean, exact, atol=0.02)
    np.testing.assert_allclose(p_mean.sum(), 1.0, rtol=1e-5)


def test_ingest_error_paths(key):
    with pytest.raises(ValueError, match="discrete"):
        ppl.ingest(lambda: ppl.sample("z", ppl.Bernoulli(logits=0.0)))

    def dup():
        ppl.sample("a", ppl.Normal(0.0, 1.0))
        ppl.sample("a", ppl.Normal(0.0, 1.0))

    with pytest.raises(ValueError, match="duplicate"):
        ppl.ingest(dup)

    with pytest.raises(ValueError, match="no latent"):
        ppl.ingest(lambda: ppl.sample("y", ppl.Normal(0.0, 1.0), obs=jnp.ones(())))

    def simplex_local(data):
        with ppl.plate("obs", 4):
            p = ppl.sample("p", ppl.Dirichlet(jnp.ones(3)))
            ppl.sample("y", ppl.Normal(p[..., 0], 1.0), obs=data["y"])

    with pytest.raises(ValueError, match="simplex"):
        ppl.ingest(simplex_local, data={"y": jnp.zeros(4)})

    def nested(data):
        with ppl.plate("outer", 4):
            with ppl.plate("inner", 4):
                z = ppl.sample("z", ppl.Normal(0.0, 1.0))
            ppl.sample("y", ppl.Normal(z, 1.0), obs=data["y"])

    with pytest.raises(ValueError, match="nested"):
        ppl.ingest(nested, data={"y": jnp.zeros(4)})

    with pytest.raises(RuntimeError, match="outside"):
        ppl.sample("x", ppl.Normal(0.0, 1.0))


def test_interval_and_positive_supports(key):
    """Uniform(interval) and HalfNormal(positive) latents transform
    correctly: constrained draws respect the support and the density
    integrates change-of-variables terms (finite elbo, sane posterior)."""

    def model():
        r = ppl.sample("rate", ppl.HalfNormal(2.0))
        w = ppl.sample("w", ppl.Uniform(-1.0, 1.0))
        ppl.sample(
            "y", ppl.Normal(w * 3.0 + r, 1.0), obs=jnp.asarray([2.0, 2.2])
        )

    m = ppl.ingest(model)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=16, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    q, infos, _ = avt.optimize(key, alg, 1500, m.target, m.q_init())
    post = m.sample_posterior(jax.random.key(5), q, 4000)
    assert float(jnp.min(post["rate"])) > 0.0
    assert float(jnp.min(post["w"])) > -1.0 and float(jnp.max(post["w"])) < 1.0
    assert np.isfinite(infos[-1]["elbo"])


def test_prior_predictive():
    data = _logreg_data()
    draws = ppl.prior_predictive(_logreg_model, jax.random.key(0), data=data)
    assert set(draws) == {"sigma", "beta"}
    assert draws["beta"].shape == (5,)
    assert float(draws["sigma"]) > 0.0


def test_from_numpyro_gated():
    """Without numpyro installed the bridge raises a helpful ImportError;
    with it installed, the adapter path is exercised instead."""
    numpyro = pytest.importorskip("numpyro", reason="numpyro not installed")
    import numpyro.distributions as dist

    def model(y):
        mu = numpyro.sample("mu", dist.Normal(0.0, 1.0))
        numpyro.sample("y", dist.Normal(mu, 1.0), obs=y)

    y = 1.5 + jax.random.normal(jax.random.key(2), (64,))
    m = ppl.from_numpyro(model, y)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    q, _, _ = avt.optimize(jax.random.key(0), alg, 2000, m.target, m.q_init())
    post_mean = float(jnp.sum(y) / (len(y) + 1))
    assert abs(float(q.location[0]) - post_mean) < 0.05


def test_from_numpyro_import_error_message():
    try:
        import numpyro  # noqa: F401

        pytest.skip("numpyro installed; error path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="ppl.ingest"):
        ppl.from_numpyro(lambda: None)


def test_batched_dirichlet_site(key):
    """A (B, K) Dirichlet latent is B independent K-simplices (round-2
    review fix): correct dims, each row sums to 1, conjugate posterior per
    row recovered."""
    alpha = jnp.asarray([[2.0, 1.0, 3.0], [1.0, 1.0, 1.0]])
    counts = jnp.asarray([[8.0, 3.0, 9.0], [2.0, 10.0, 4.0]])
    obs0 = jnp.repeat(jnp.arange(3), counts[0].astype(int))
    obs1 = jnp.repeat(jnp.arange(3), counts[1].astype(int))

    def model():
        p = ppl.sample("p", ppl.Dirichlet(alpha))  # (2, 3)
        ppl.sample("y0", ppl.Categorical(logits=jnp.log(p[0])), obs=obs0)
        ppl.sample("y1", ppl.Categorical(logits=jnp.log(p[1])), obs=obs1)

    m = ppl.ingest(model)
    assert m.dim == 4 and m.dim_constrained == 6
    vals = m.constrain(jnp.zeros(4))
    np.testing.assert_allclose(
        np.asarray(vals["p"]).sum(axis=-1), [1.0, 1.0], rtol=1e-5
    )

    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=32, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    q, _, _ = avt.optimize(key, alg, 3000, m.target, m.q_init())
    post = m.sample_posterior(jax.random.key(5), q, 50_000)
    p_mean = np.asarray(jnp.mean(post["p"], axis=0))
    exact = np.asarray(
        (alpha + counts) / jnp.sum(alpha + counts, axis=-1, keepdims=True)
    )
    np.testing.assert_allclose(p_mean, exact, atol=0.03)
