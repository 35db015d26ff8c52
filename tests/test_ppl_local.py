"""PPL-level amortized local latents (doubly-stochastic hierarchical VI).

``ppl.ingest(model, data=...)`` with latent sites inside the plate assembles
a GlobalLocalFamily automatically: the local block subsamples in lockstep
with the data rows, per-datapoint priors + ldjs ride the rescalable
likelihood accumulator (reference: ext/AdvancedVIDynamicPPLExt.jl:188-209 +
src/algorithms/subsampledobjective.jl:81).

Ground truth: for a jointly Gaussian model, mean-field VI recovers the
posterior means EXACTLY and the marginal precisions Lambda_ii exactly
(q_i = N(m_i, 1/Lambda_ii)) — so the doubly-stochastic fit is checked
against linear-algebra ground truth, not another VI run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
import advancedvi_jl_tpu.ppl as ppl

N = 48
S0, SZ, SY = 2.0, 1.0, 0.5  # prior sd of mu, z|mu, y|z


def _data(seed=0):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    mu = S0 * jax.random.normal(k1, ())
    z = mu + SZ * jax.random.normal(k2, (N,))
    return {"y": z + SY * jax.random.normal(k3, (N,))}


def _model(data):
    mu = ppl.sample("mu", ppl.Normal(0.0, S0))
    with ppl.plate("obs", N):
        z = ppl.sample("z", ppl.Normal(mu, SZ))
        ppl.sample("y", ppl.Normal(z, SY), obs=data["y"])


def _exact_posterior(y):
    """Gaussian posterior over (mu, z_1..z_N): mean and precision diagonal."""
    d = N + 1
    lam = np.zeros((d, d))
    lam[0, 0] = 1 / S0**2 + N / SZ**2
    for i in range(N):
        lam[1 + i, 1 + i] = 1 / SZ**2 + 1 / SY**2
        lam[0, 1 + i] = lam[1 + i, 0] = -1 / SZ**2
    b = np.concatenate([[0.0], np.asarray(y) / SY**2])
    mean = np.linalg.solve(lam, b)
    return mean, np.diag(lam)


def test_ingest_assembles_global_local_family():
    m = ppl.ingest(_model, data=_data())
    assert m.local_names == ["z"] and m.global_names == ["mu"]
    assert m.dim == 1 + N and m.local_k == 1
    q = m.q_init()
    assert isinstance(q, avt.GlobalLocalFamily)
    assert q.global_q.dim == 1 and q.local_q.location.shape == (N, 1)
    # target dim shrinks with the batch, family subsamples in lockstep
    idx = jnp.arange(8)
    assert m.target.subsample(idx).dim == 1 + 8
    assert q.subsample(idx).dim == 1 + 8
    assert q.subsample(idx).weight == N / 8


def test_full_batch_logdensity_matches_hand_rolled(key):
    """ingest's replay (priors split across accumulators, likeadj=1) equals
    the directly-written log-joint at arbitrary theta."""
    data = _data()
    m = ppl.ingest(_model, data=data)
    theta = jax.random.normal(key, (1 + N,))
    mu, z = theta[0], theta[1:]

    def norm_lp(x, loc, sd):
        return -0.5 * ((x - loc) / sd) ** 2 - 0.5 * jnp.log(
            2 * jnp.pi * sd**2
        )

    want = (
        norm_lp(mu, 0.0, S0)
        + jnp.sum(norm_lp(z, mu, SZ))
        + jnp.sum(norm_lp(data["y"], z, SY))
    )
    got = m.target.log_density(theta)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_subsampled_grad_unbiased_over_epoch(key):
    """Epoch-averaged minibatch gradient == full-batch gradient (CLOSED_FORM
    entropy, shared MC draws genre; reference: test/general/subsampledobj.jl
    63-90), including scatter-add into the FULL local arrays."""
    data = _data()
    m = ppl.ingest(_model, data=data)
    q = m.q_init()
    obj_full = avt.RepGradELBO(n_samples=4096, entropy=avt.CLOSED_FORM)
    g_full, _, _ = jax.jit(
        lambda q: obj_full.value_and_grad(q, m.target, key, ())
    )(q)

    B = 12
    obj_sub = avt.SubsampledObjective(
        objective=avt.RepGradELBO(n_samples=4096, entropy=avt.CLOSED_FORM),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=N, batchsize=B),
    )
    st = obj_sub.init(key, q, m.target)
    grads = []
    for i in range(N // B):
        g, st, _ = jax.jit(
            lambda q, st, k: obj_sub.value_and_grad(q, m.target, k, st)
        )(q, st, jax.random.fold_in(key, i))
        assert g.local_q.location.shape == (N, 1)  # FULL-shape gradient
        grads.append(g)
    g_avg = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)
    np.testing.assert_allclose(
        np.asarray(g_avg.global_q.location),
        np.asarray(g_full.global_q.location),
        rtol=0.1, atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(g_avg.local_q.location),
        np.asarray(g_full.local_q.location),
        rtol=0.1, atol=0.12,
    )


def test_doubly_stochastic_fit_matches_exact_posterior(key):
    """End-to-end: random-effects model fit with minibatches recovers the
    mean-field fixed point (exact means, var_i = 1/Lambda_ii) of the
    analytic Gaussian posterior."""
    data = _data()
    m = ppl.ingest(_model, data=data)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=16,
        optimizer=optax.adam(2e-2),
        operator=avt.ClipScale(),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=N, batchsize=12),
    )
    q, infos, _ = avt.optimize(key, alg, 6000, m.target, m.q_init())
    assert np.isfinite(infos[-1]["elbo"])

    mean, prec_diag = _exact_posterior(data["y"])
    got_mean = np.concatenate(
        [np.asarray(q.global_q.location), np.asarray(q.local_q.location[:, 0])]
    )
    got_sd = np.concatenate(
        [np.asarray(q.global_q.scale_diag), np.asarray(q.local_q.scale_diag[:, 0])]
    )
    np.testing.assert_allclose(got_mean, mean, atol=0.08)
    np.testing.assert_allclose(got_sd, prec_diag**-0.5, rtol=0.2)


def test_constrained_local_latents(key):
    """Positive-support local sites transform per plate row; the ldj rides
    the rescalable accumulator (finite elbo under subsampling, draws respect
    the support)."""
    n = 24
    y = jnp.abs(1.0 + 0.5 * jax.random.normal(jax.random.key(1), (n,)))

    def model(data):
        rate = ppl.sample("rate", ppl.LogNormal(0.0, 1.0))
        with ppl.plate("obs", n):
            lam = ppl.sample("lam", ppl.Gamma(2.0, rate))
            ppl.sample("y", ppl.Exponential(lam), obs=data["y"])

    m = ppl.ingest(model, data={"y": y})
    assert m.local_names == ["lam"]
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=n, batchsize=8),
    )
    q, infos, _ = avt.optimize(key, alg, 500, m.target, m.q_init())
    assert np.isfinite(infos[-1]["elbo"])
    post = m.sample_posterior(jax.random.key(2), q, 64)
    assert post["lam"].shape == (64, n)
    assert bool(jnp.all(post["lam"] > 0))
    assert post["rate"].shape == (64,)
    assert bool(jnp.all(post["rate"] > 0))


def test_vector_local_latents_event_shape(key):
    """Local sites with event shape (k,): layout is row-major (rows, k)."""
    n, k = 10, 3
    y = jax.random.normal(jax.random.key(3), (n,))

    def model(data):
        with ppl.plate("obs", n):
            z = ppl.sample("z", ppl.Normal(jnp.zeros(k), 1.0))
            ppl.sample(
                "y", ppl.Normal(jnp.sum(z, axis=-1), 1.0), obs=data["y"]
            )

    m = ppl.ingest(model, data={"y": y})
    assert m.local_k == k and m.dim == n * k
    q = m.q_init()
    assert q.local_q.location.shape == (n, k)
    # smoke: one subsampled gradient step keeps shapes and stays finite
    alg = avt.KLMinRepGradDescent(
        entropy=avt.CLOSED_FORM, n_samples=4, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=n, batchsize=5),
    )
    q1, infos, _ = avt.optimize(key, alg, 20, m.target, q)
    assert np.isfinite(infos[-1]["elbo"])
    post = m.sample_posterior(jax.random.key(4), q1, 7)
    assert post["z"].shape == (7, n, k)


def test_estimate_objective_epoch_average(key):
    """Full-epoch averaged subsampled objective ~= full-batch objective."""
    data = _data()
    m = ppl.ingest(_model, data=data)
    q = m.q_init()
    full = float(
        avt.RepGradELBO(n_samples=2048, entropy=avt.CLOSED_FORM)
        .estimate_objective(key, q, m.target)
    )
    sub = avt.SubsampledObjective(
        objective=avt.RepGradELBO(n_samples=2048, entropy=avt.CLOSED_FORM),
        subsampling=avt.ReshufflingBatchSubsampling(n_data=N, batchsize=12),
    )
    got = float(sub.estimate_objective(key, q, m.target))
    np.testing.assert_allclose(got, full, rtol=0.05, atol=0.5)


def test_local_mode_error_paths():
    def mismatched(data):
        with ppl.plate("obs", N + 1):
            z = ppl.sample("z", ppl.Normal(0.0, 1.0))
            ppl.sample("y", ppl.Normal(z[: N], 1.0), obs=data["y"])

    with pytest.raises(ValueError, match="plate size"):
        ppl.ingest(mismatched, data=_data())

    m = ppl.ingest(_model, data=_data())
    with pytest.raises(ValueError, match="sample_posterior"):
        m.posterior(m.q_init())


def test_weighted_rejection_propagates_through_composition(key):
    """A subsampled GlobalLocalFamily is weighted; VarGrad must reject it."""
    m = ppl.ingest(_model, data=_data())
    q_sub = m.q_init().subsample(jnp.arange(8))
    assert q_sub.weight == N / 8
    with pytest.raises(ValueError, match="RepGradELBO"):
        avt.ScoreGradELBO(n_samples=4).loss(
            q_sub, m.target.subsample(jnp.arange(8)), key
        )
