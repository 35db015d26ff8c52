"""Mixture-of-Gaussians family + stratified ELBO (beyond the reference
surface; the expert-parallel axis of SURVEY.md §2.7). Genres follow the
reference algorithm-test pattern: density ground truth, objective ≈ 0 at a
representable optimum, convergence on a bimodal target a single Gaussian
cannot fit, determinism, ClipScale support, EP sharding equality."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.algorithms.paramspace import ParamSpaceSGD


def _bimodal_target(sep=3.0, w0=0.5):
    """Target: w0 N(-sep, 0.5^2 I) + (1-w0) N(+sep, 0.5^2 I) in 2-d."""
    mu = jnp.asarray([[-sep, 0.0], [sep, 0.0]])
    s = 0.5

    def logd(z, _):
        comp = -0.5 * jnp.sum(jnp.square((z - mu) / s), axis=-1) - 2 * jnp.log(
            s
        ) - jnp.log(2 * jnp.pi)
        logw = jnp.log(jnp.asarray([w0, 1.0 - w0]))
        return jax.nn.logsumexp(comp + logw)

    return avt.fn_target(logd, dim=2), mu, s


def test_mixture_log_prob_matches_numpy(key):
    q = avt.mixture_meanfield(key, dim=3, n_components=4, spread=2.0)
    z = q.sample(jax.random.key(1), 50)
    lp = np.asarray(q.log_prob(z))

    w = np.asarray(q.weights(), np.float64)
    locs = np.asarray(q.locations, np.float64)
    sds = np.asarray(q.scale_diags, np.float64)
    zz = np.asarray(z, np.float64)
    dens = np.zeros(len(zz))
    for k in range(4):
        quad = np.sum(((zz - locs[k]) / sds[k]) ** 2, axis=1)
        norm = np.prod(sds[k]) * (2 * np.pi) ** 1.5
        dens += w[k] * np.exp(-0.5 * quad) / norm
    np.testing.assert_allclose(lp, np.log(dens), rtol=1e-4)


def test_mixture_moments(key):
    q = avt.mixture_meanfield(key, dim=3, n_components=3, spread=1.5)
    z = np.asarray(q.sample(jax.random.key(2), 200_000))
    np.testing.assert_allclose(z.mean(0), np.asarray(q.mean()), atol=0.02)
    np.testing.assert_allclose(z.var(0), np.asarray(q.var()), rtol=0.05)
    np.testing.assert_allclose(
        np.cov(z.T), np.asarray(q.cov()), atol=0.05
    )


def test_mixture_elbo_near_zero_at_representable_optimum(key):
    """Stratified neg-ELBO ≈ 0 when q equals the (mixture) target."""
    target, mu, s = _bimodal_target(w0=0.3)
    qstar = avt.MixtureMeanField(
        logits=jnp.log(jnp.asarray([0.3, 0.7])),
        locations=mu,
        scale_diags=jnp.full((2, 2), s),
    )
    obj = avt.MixtureELBO(n_samples=20_000, entropy="monte_carlo")
    val = obj.estimate_objective(key, qstar, target)
    assert abs(float(val)) < 1e-2


@pytest.mark.parametrize("entropy", ["monte_carlo", "stl"])
def test_mixture_vi_fits_bimodal_target(entropy, key):
    """Recovers both modes AND the asymmetric weights. A single Gaussian
    mode-collapses onto the heavier mode (mode-seeking KL) and pays
    -log(0.75) ~ 0.288 nats; the mixture reaches KL ~ 0."""
    target, mu, s = _bimodal_target(w0=0.25)
    # bracket the support: mixture VI is init-sensitive like any gradient
    # method on a multimodal target — components must start near distinct
    # basins (standard practice; documented in docs/families.md)
    q0 = avt.MixtureMeanField(
        logits=jnp.zeros(2),
        locations=jnp.asarray([[-2.0, 0.0], [2.0, 0.0]]),
        scale_diags=jnp.ones((2, 2)),
    )
    alg = ParamSpaceSGD(
        objective=avt.MixtureELBO(n_samples=16, entropy=entropy),
        optimizer=optax.adam(3e-2),
        averager=avt.NoAveraging(),
        operator=avt.ClipScale(),
    )
    out, infos, _ = avt.optimize(key, alg, 3000, target, q0)

    nelbo = float(
        avt.MixtureELBO(n_samples=20_000).estimate_objective(
            jax.random.key(5), out, target
        )
    )
    assert abs(nelbo) < 0.05, nelbo  # representable: KL -> 0

    # modes found (order-invariant) and weights recovered
    locs = np.asarray(out.locations)
    order = np.argsort(locs[:, 0])
    np.testing.assert_allclose(locs[order], np.asarray(mu), atol=0.3)
    w = np.asarray(out.weights())[order]
    np.testing.assert_allclose(w, [0.25, 0.75], atol=0.05)

    # single mean-field Gaussian on the same target for comparison
    qg = avt.MeanFieldGaussian(jnp.zeros(2), jnp.ones(2))
    algg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=16, optimizer=optax.adam(3e-2),
        operator=avt.ClipScale(),
    )
    outg, _, _ = avt.optimize(key, algg, 3000, target, qg)
    nelbo_g = float(
        avt.estimate_objective(jax.random.key(5), algg, outg, target,
                               n_samples=20_000)
    )
    # the collapsed Gaussian's KL is bounded below by -log(0.75) ~ 0.288
    assert nelbo_g > abs(nelbo) + 0.25, (nelbo, nelbo_g)


def test_mixture_determinism(key):
    target, _, _ = _bimodal_target()
    q0 = avt.mixture_meanfield(jax.random.key(1), dim=2, n_components=2)
    alg = ParamSpaceSGD(
        objective=avt.MixtureELBO(n_samples=8),
        optimizer=optax.adam(1e-2),
        averager=avt.PolynomialAveraging(),
        operator=avt.ClipScale(),
    )
    out1, _, _ = avt.optimize(key, alg, 50, target, q0)
    out2, _, _ = avt.optimize(key, alg, 50, target, q0)
    np.testing.assert_array_equal(
        np.asarray(out1.locations), np.asarray(out2.locations)
    )
    np.testing.assert_array_equal(
        np.asarray(out1.logits), np.asarray(out2.logits)
    )


def test_mixture_ep_sharding_matches_single_device(key):
    """Component-axis (expert-parallel) sharding is numerically identical to
    unsharded execution (same keys, GSPMD reduction)."""
    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh

    target, _, _ = _bimodal_target()
    q0 = avt.mixture_meanfield(jax.random.key(1), dim=2, n_components=8)
    obj_plain = avt.MixtureELBO(n_samples=8)
    obj_ep = avt.MixtureELBO(n_samples=8, ep_axis=MC_AXIS)

    grad0, _, info0 = jax.jit(obj_plain.value_and_grad)(q0, target, key)
    mesh = make_vi_mesh(n_mc=8)
    with jax.set_mesh(mesh):
        grad1, _, info1 = jax.jit(obj_ep.value_and_grad)(q0, target, key)
    np.testing.assert_allclose(
        float(info0["elbo"]), float(info1["elbo"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(grad0), jax.tree.leaves(grad1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_mixture_composes_with_subsampling(key):
    """MixtureELBO is a regular objective: SubsampledObjective wraps it
    unchanged (epoch schedule + likelihood rescaling + static shapes)."""
    rng = np.random.default_rng(0)
    n = 64
    ys = jnp.asarray(rng.normal(-1.0, 0.5, n).astype(np.float32))
    target = avt.factorized_target(
        logprior_fn=lambda th: jnp.sum(-0.5 * jnp.square(th / 5.0)),
        loglike_fn=lambda th, y: jnp.sum(-0.5 * jnp.square(y - th[0])),
        data=ys,
        dim=1,
    )
    sub = avt.ReshufflingBatchSubsampling(n_data=n, batchsize=16)
    obj = avt.SubsampledObjective(
        objective=avt.MixtureELBO(n_samples=8), subsampling=sub
    )
    alg = ParamSpaceSGD(
        objective=obj, optimizer=optax.adam(2e-2),
        averager=avt.NoAveraging(), operator=avt.ClipScale(),
    )
    q0 = avt.mixture_meanfield(jax.random.key(1), dim=1, n_components=2)
    out, infos, _ = avt.optimize(key, alg, 400, target, q0)
    assert "epoch" in infos[-1]
    # exact posterior mean of the conjugate normal model
    post_mean = float(jnp.sum(ys) / (n + 1.0 / 25.0))
    np.testing.assert_allclose(float(out.mean()[0]), post_mean, atol=0.1)


def test_mixture_fullrank_log_prob_and_fit(key):
    """Full-rank mixture: density matches numpy ground truth; fits a
    correlated bimodal target (per-component full covariance) to KL ~ 0."""
    # ground-truth density check
    q = avt.mixture_fullrank(jax.random.key(4), dim=3, n_components=2,
                             spread=1.0)
    tri = 0.2 * jax.random.normal(jax.random.key(5), (2, 3, 3))
    q = q.replace(scales=jnp.tril(q.scales + tri))
    z = q.sample(jax.random.key(6), 40)
    lp = np.asarray(q.log_prob(z))
    w = np.asarray(q.weights(), np.float64)
    dens = np.zeros(len(z))
    for k in range(2):
        C = np.tril(np.asarray(q.scales[k], np.float64))
        cov = C @ C.T
        diff = np.asarray(z, np.float64) - np.asarray(q.locations[k], np.float64)
        quad = np.einsum("nd,dk,nk->n", diff, np.linalg.inv(cov), diff)
        _, logdet = np.linalg.slogdet(cov)
        dens += w[k] * np.exp(-0.5 * (quad + logdet + 3 * np.log(2 * np.pi)))
    np.testing.assert_allclose(lp, np.log(dens), rtol=1e-4)

    # correlated bimodal target: two Gaussians with different covariances
    rho = 0.8
    L1 = jnp.linalg.cholesky(jnp.asarray([[1.0, rho], [rho, 1.0]]))
    L2 = jnp.linalg.cholesky(jnp.asarray([[1.0, -rho], [-rho, 1.0]]))
    mus = jnp.asarray([[-3.0, 0.0], [3.0, 0.0]])

    def logd(zz, _):
        def comp(m, L):
            v = jax.lax.linalg.triangular_solve(
                L, (zz - m)[:, None], left_side=True, lower=True
            )[:, 0]
            return (-0.5 * jnp.sum(jnp.square(v))
                    - jnp.sum(jnp.log(jnp.diag(L))) - jnp.log(2 * jnp.pi))
        lps = jnp.stack([comp(mus[0], L1), comp(mus[1], L2)])
        return jax.nn.logsumexp(lps + jnp.log(0.5))

    target = avt.fn_target(logd, dim=2)
    q0 = avt.MixtureFullRank(
        logits=jnp.zeros(2),
        locations=jnp.asarray([[-2.0, 0.0], [2.0, 0.0]]),
        scales=jnp.broadcast_to(jnp.eye(2), (2, 2, 2)),
    )
    alg = ParamSpaceSGD(
        objective=avt.MixtureELBO(n_samples=16, entropy="stl"),
        optimizer=optax.adam(2e-2),
        averager=avt.NoAveraging(),
        operator=avt.ClipScale(),
    )
    out, infos, _ = avt.optimize(key, alg, 3000, target, q0)
    nelbo = float(avt.MixtureELBO(n_samples=20_000).estimate_objective(
        jax.random.key(5), out, target))
    assert abs(nelbo) < 0.05, nelbo
    # each component recovered its own correlation sign
    covs = np.asarray(jnp.einsum("kde,kfe->kdf", jnp.tril(out.scales),
                                 jnp.tril(out.scales)))
    order = np.argsort(np.asarray(out.locations)[:, 0])
    assert covs[order[0]][0, 1] > 0.5 and covs[order[1]][0, 1] < -0.5
