"""Parity tests for the whole-loop fused ADVI engine (ops/pallas/fused_advi).

The engine's update math (reparameterized draw -> hand-derived logreg
gradient -> STL correction -> Adam -> ClipScale -> polynomial averaging)
is pinned against the general path by injecting the general path's OWN
base draws through the engine's ``noise`` debug input: with identical
noise, the fused state after T steps must match ``alg.step`` composed T
times.  Runs in Pallas interpret mode on CPU (the noise path never
touches TPU RNG primitives).  RNG-path statistics are validated on
hardware by bench.py / the verify flow, not here (CLAUDE.md RNG rules).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from numpy.testing import assert_allclose

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.models.normallognormal import make_normallognormal
from advancedvi_jl_tpu.ops.pallas.fused_advi import (
    D_PAD,
    FULLRANK,
    N_PAD,
    FusedADVI,
    FusedLogRegADVI,
    gaussian_spec,
    logreg_minibatch_spec,
    logreg_spec,
    normallognormal_spec,
)

T = 5
N_SAMPLES = 10


@pytest.fixture(scope="module")
def flagship():
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    return prob, prob.unconstrained()


def _run_general_path(target, q0, steps):
    """General-path states + the exact base draws each step consumed."""
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3),
        operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    step = jax.jit(alg.step)
    draws, infos = [], []
    for _ in range(steps):
        step_key = jax.random.fold_in(state.key, state.iteration)
        _, u = state.q.sample_with_base(step_key, N_SAMPLES)
        draws.append(np.asarray(u))
        state, info = step(state)
        infos.append(info)
    return alg, state, draws, infos


def _pack_noise(draws, d_pad=D_PAD):
    noise = np.zeros((len(draws) * N_PAD, d_pad), np.float32)
    for t, u in enumerate(draws):
        noise[t * N_PAD : t * N_PAD + u.shape[0], : u.shape[1]] = u
    return jnp.asarray(noise)


def test_fused_matches_general_path(flagship):
    prob, target = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    alg, state, draws, infos = _run_general_path(target, q0, T)

    engine = FusedLogRegADVI(
        prob.X, prob.y, prior_scale=prob.prior_scale,
        likeadj=float(prob.likeadj), n_samples=N_SAMPLES, lr=1e-3,
        interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale_diag)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )

    # current parameters
    assert_allclose(
        fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    # averaged parameters (ParamSpaceSGD.output)
    q_avg = alg.output(state)
    q_fused = engine.q(fstate)
    assert_allclose(q_fused.location, q_avg.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        q_fused.scale_diag, q_avg.scale_diag, rtol=1e-5, atol=1e-6
    )
    # Adam moments
    adam_state = state.opt_state[0]  # ScaleByAdamState inside the chain
    assert_allclose(
        fstate.m_mu[0, :d], adam_state.mu.location, rtol=1e-5, atol=1e-7
    )
    assert_allclose(
        fstate.m_sig[0, :d], adam_state.mu.scale_diag, rtol=1e-5, atol=1e-7
    )
    assert_allclose(
        fstate.v_mu[0, :d], adam_state.nu.location, rtol=5e-5, atol=1e-9
    )
    # ELBO estimate of the final step
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )
    # padding stayed inert
    assert np.all(np.asarray(fstate.m_mu[0, d:]) == 0.0)
    assert np.all(np.asarray(fstate.sig[0, d:]) == 1.0)
    assert fstate.iteration == T


def test_fused_chunking_is_associative(flagship):
    """run_chunk(T) == run_chunk(T1) then run_chunk(T2) with the same
    injected noise split at the chunk boundary."""
    prob, target = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    _, _, draws, _ = _run_general_path(target, q0, T)
    noise = _pack_noise(draws)

    engine = FusedLogRegADVI(
        prob.X, prob.y, n_samples=N_SAMPLES, lr=1e-3, interpret=True
    )
    f_all = engine.run_chunk(
        engine.init(q0.location, q0.scale_diag),
        jax.random.key(1), steps=T, noise=noise,
    )
    f_split = engine.init(q0.location, q0.scale_diag)
    f_split = engine.run_chunk(
        f_split, jax.random.key(1), steps=2, noise=noise[: 2 * N_PAD]
    )
    f_split = engine.run_chunk(
        f_split, jax.random.key(1), steps=T - 2, noise=noise[2 * N_PAD :]
    )
    for a, b in zip(f_all[:8], f_split[:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    assert f_split.iteration == T


def _run_general(alg, state, steps, n_samples):
    """General-path states + the exact base draws each step consumed."""
    step = jax.jit(alg.step)
    draws, infos = [], []
    for _ in range(steps):
        step_key = jax.random.fold_in(state.key, state.iteration)
        _, u = state.q.sample_with_base(step_key, n_samples)
        draws.append(np.asarray(u))
        state, info = step(state)
        infos.append(info)
    return state, draws, infos


def test_fused_fullrank_matches_general_path():
    """Full-rank family x gaussian model (the unconstrained normal-
    lognormal BASELINE config): injected-noise parity of the in-kernel
    back-substitution whitening, tril scale gradient, Adam, diag
    ClipScale, and averaging against the general path."""
    prob, _, _ = make_normallognormal(jax.random.key(7), n_dims=10)
    target = prob.unconstrained()
    d = prob.dim
    # non-trivial lower-triangular init so C^{-T}u exercises off-diagonals
    C0 = 0.2 * jnp.eye(d) + 0.05 * jnp.tril(
        jax.random.normal(jax.random.key(3), (d, d)), -1
    )
    q0 = avt.FullRankGaussian(0.3 * jnp.ones(d), C0)

    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, T, N_SAMPLES)

    engine = FusedADVI(
        normallognormal_spec(prob), family=FULLRANK,
        n_samples=N_SAMPLES, lr=1e-3, interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )

    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[:d, :d], jnp.tril(state.q.scale), rtol=1e-5, atol=1e-6
    )
    q_avg = alg.output(state)
    q_fused = engine.q(fstate)
    assert_allclose(q_fused.location, q_avg.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        q_fused.scale, jnp.tril(q_avg.scale), rtol=1e-5, atol=1e-6
    )
    # Adam moments on the scale
    adam_state = state.opt_state[0]
    assert_allclose(
        fstate.m_sig[:d, :d], jnp.tril(adam_state.mu.scale),
        rtol=1e-5, atol=1e-7,
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )
    # padding inert: upper triangle zero, padded diag 1.0, moments zero
    assert np.all(np.asarray(jnp.triu(fstate.sig[:d, :d], 1)) == 0.0)
    assert np.all(np.asarray(fstate.sig[d:, d:].diagonal()) == 1.0)
    assert np.all(np.asarray(fstate.m_sig[d:, :]) == 0.0)


def test_fused_fullrank_logreg_matches_general_path(flagship):
    """Full-rank family x logreg model: the d=62 back-substitution and the
    hand-derived likelihood gradient compose correctly."""
    prob, target = flagship
    d = prob.dim
    q0 = avt.FullRankGaussian(jnp.zeros(d), 0.1 * jnp.eye(d))

    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, 3, N_SAMPLES)

    engine = FusedADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        family=FULLRANK, n_samples=N_SAMPLES, lr=1e-3, interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=3, noise=_pack_noise(draws)
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[:d, :d], jnp.tril(state.q.scale), rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_fused_meanfield_gaussian_matches_general_path():
    """Mean-field family x gaussian model parity."""
    prob, _, _ = make_normallognormal(jax.random.key(5), n_dims=9)
    target = prob.unconstrained()
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.2 * jnp.ones(d))

    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, T, N_SAMPLES)

    engine = FusedADVI(
        normallognormal_spec(prob), n_samples=N_SAMPLES, lr=1e-3,
        interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale_diag)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_fused_noise_shape_validated(flagship):
    prob, _ = flagship
    eng = FusedLogRegADVI(prob.X, prob.y, interpret=True)
    st = eng.init(jnp.zeros(prob.dim), 0.1 * jnp.ones(prob.dim))
    with pytest.raises(ValueError, match="noise"):
        eng.run_chunk(
            st, jax.random.key(0), steps=4,
            noise=jnp.zeros((3 * N_PAD, D_PAD)),
        )


def test_gaussian_spec_rejects_large_dim():
    # mean-field engines are parametric in the lane width up to D_PAD_MAX;
    # beyond that (and for full-rank beyond one lane tile) they reject.
    with pytest.raises(ValueError, match="dim"):
        gaussian_spec(jnp.zeros(3000), jnp.ones(3000))
    with pytest.raises(ValueError, match="family"):
        FusedADVI(
            gaussian_spec(jnp.zeros(4), jnp.ones(4)), family="lowrank"
        )
    # full-rank now supports two+ lane tiles via the blocked substitution
    # (round 5); the cap moved to D_FULLRANK_MAX (test_fused_fullrank_dim_cap)
    FusedADVI(
        gaussian_spec(jnp.zeros(200), jnp.ones(200)), family=FULLRANK,
        interpret=True,
    )


def test_bench_config_matches_engine_defaults(flagship):
    """The bench A/B stays honest: bench.py's workload config and the fused
    engine's hyperparameter defaults are pinned to the general-path
    components they claim to reproduce (VERDICT r3 'bench-engine drift')."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import BENCH_CONFIG

    prob, _ = flagship
    # make_logreg appends an intercept column: d_beta = n_features + 1
    assert prob.X.shape == (
        BENCH_CONFIG["n_data"], BENCH_CONFIG["n_features"] + 1,
    )

    eng = FusedLogRegADVI(
        prob.X, prob.y,
        n_samples=BENCH_CONFIG["n_samples"], lr=BENCH_CONFIG["lr"],
    )
    lr, b1, b2, eps, avg_eta, clip_eps = np.asarray(eng.hyp)
    # the general path bench.py times: adam(lr) + ClipScale() + polynomial
    # averaging on LogReg(prior_scale=3) with likeadj=1
    assert lr == np.float32(BENCH_CONFIG["lr"])
    assert (b1, b2, eps) == (
        np.float32(0.9), np.float32(0.999), np.float32(1e-8),
    )  # optax.adam defaults
    assert clip_eps == np.float32(avt.ClipScale().epsilon)
    from advancedvi_jl_tpu.optim.averaging import PolynomialAveraging

    assert avg_eta == np.float32(PolynomialAveraging().eta)
    likeadj, prior_scale = np.asarray(eng.model.scalars)
    assert prior_scale == np.float32(prob.prior_scale)
    assert likeadj == np.float32(prob.likeadj)
    assert eng.n_samples == BENCH_CONFIG["n_samples"]


def test_fused_validation():
    X = jnp.zeros((8, 3000))
    y = jnp.zeros((8,))
    with pytest.raises(ValueError, match="dim"):
        FusedLogRegADVI(X, y)
    # the n_samples cap moved to N_SAMPLES_MAX_SC = 128 (round 5)
    with pytest.raises(ValueError, match="n_samples"):
        FusedLogRegADVI(jnp.zeros((8, 4)), jnp.zeros((8,)), n_samples=129)
    FusedLogRegADVI(jnp.zeros((8, 4)), jnp.zeros((8,)), n_samples=32)
    eng = FusedLogRegADVI(jnp.zeros((8, 4)), jnp.zeros((8,)))
    with pytest.raises(ValueError, match="location"):
        eng.init(jnp.zeros(3), jnp.ones(3))


def test_fused_trace_matches_general_elbos(flagship):
    """run_chunk_traced's in-kernel thinned ELBO trace equals the general
    path's per-step elbo at the log_every grid."""
    prob, target = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    _, state, draws, infos = _run_general_path(target, q0, 6)

    engine = FusedLogRegADVI(
        prob.X, prob.y, n_samples=N_SAMPLES, lr=1e-3, interpret=True
    )
    fstate = engine.init(q0.location, q0.scale_diag)
    fstate, trace = engine.run_chunk_traced(
        fstate, jax.random.key(1), steps=6, log_every=2,
        noise=_pack_noise(draws),
    )
    assert trace.shape == (3,)
    want = [float(infos[i]["elbo"]) for i in (1, 3, 5)]
    assert_allclose(np.asarray(trace), want, rtol=1e-4, atol=1e-4)
    assert fstate.iteration == 6


def test_fused_mvnormal_spec_matches_general_path():
    """Dense-covariance Gaussian spec (one-matmul gradient) parity."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank
    from advancedvi_jl_tpu.ops.pallas.fused_advi import mvnormal_spec

    target, mu, L = normal_fullrank(jax.random.key(2), 6)
    d = 6
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.5 * jnp.ones(d))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, T, N_SAMPLES)

    engine = FusedADVI(
        mvnormal_spec(target.mu, target.scale_tril),
        n_samples=N_SAMPLES, lr=1e-3, interpret=True,
    )
    fstate = engine.run_chunk(
        engine.init(q0.location, q0.scale_diag),
        jax.random.key(1), steps=T, noise=_pack_noise(draws),
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_fused_spec_registry(flagship):
    from advancedvi_jl_tpu.models.normal import normal_fullrank
    from advancedvi_jl_tpu.models.normallognormal import make_normallognormal

    prob, target = flagship
    spec = avt.fused_spec_for(target)
    assert spec.dim == prob.dim

    nln, _, _ = make_normallognormal(jax.random.key(1), 4)
    assert avt.fused_spec_for(nln.unconstrained()).dim == 5

    nt, _, _ = normal_fullrank(jax.random.key(2), 6)
    assert avt.fused_spec_for(nt).dim == 6

    with pytest.raises(ValueError, match="unconstrained"):
        avt.fused_spec_for(prob)  # constrained-space LogReg
    # non-pytree, value-only objects still fail with the reason
    with pytest.raises((ValueError, AttributeError)):
        avt.fused_spec_for(object())
    # a TransformedTarget with a DIFFERENT transform than the model's own
    # unconstrained() bijector must NOT take the hand-derived gradient
    # path (it hard-codes the Exp derivation — r4 review finding); since
    # round 5 it routes to the generic AD-derived spec instead of raising.
    from advancedvi_jl_tpu.core.transforms import (
        Softplus,
        TransformedTarget,
        stacked,
    )
    from advancedvi_jl_tpu.ops.pallas.fused_advi import _ad_step_factory

    wrong = TransformedTarget(
        prob=prob,
        transform=stacked((Softplus(), prob.dim - 1), (Softplus(), 1)),
    )
    spec_wrong = avt.fused_spec_for(wrong)
    assert spec_wrong.step_factory is _ad_step_factory
    assert spec_wrong.dim == prob.dim
    # ...while the model's own transform keeps the fast hand spec
    assert spec.step_factory is not _ad_step_factory


def test_fused_optimize_bookkeeping(flagship, monkeypatch):
    """FusedADVI.optimize's driver-contract bookkeeping (rows on the
    log_every grid, remainder row, divergence raise) — the kernel itself
    is stubbed (its math is pinned by the parity tests; the RNG path is
    hardware-only)."""
    prob, _ = flagship
    eng = FusedLogRegADVI(prob.X, prob.y, interpret=True)
    d = prob.dim

    def fake_traced(state, key, steps, log_every, noise=None, model=None):
        g = steps // log_every
        it = state.iteration + steps
        new = state._replace(iteration=it, elbo=jnp.float32(-1.0))
        return new, jnp.full((g,), -1.0, jnp.float32)

    def fake_chunk(state, key, steps, noise=None, model=None):
        return state._replace(
            iteration=state.iteration + steps, elbo=jnp.float32(-1.0)
        )

    monkeypatch.setattr(eng, "run_chunk_traced", fake_traced)
    monkeypatch.setattr(eng, "run_chunk", fake_chunk)
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    q, infos, state = eng.optimize(
        jax.random.key(0), 2_350, q0, chunk_size=1_000, log_every=100,
    )
    assert [r["iteration"] for r in infos] == (
        list(range(100, 2_301, 100)) + [2_350]
    )
    assert int(state.iteration) == 2_350
    assert q.location.shape == (d,)

    # warm start continues the count, rows stay call-relative
    q, infos2, state2 = eng.optimize(
        jax.random.key(0), 200, state=state, chunk_size=1_000, log_every=100,
    )
    assert [r["iteration"] for r in infos2] == [100, 200]
    assert int(state2.iteration) == 2_550

    with pytest.raises(ValueError, match="q_init"):
        eng.optimize(jax.random.key(0), 100)

    # divergence raise names the first non-finite recorded row
    def nan_traced(state, key, steps, log_every, noise=None, model=None):
        g = steps // log_every
        tr = np.full((g,), -1.0, np.float32)
        if g >= 2:
            tr[1] = np.nan
        new = state._replace(
            iteration=state.iteration + steps, elbo=jnp.float32(np.nan)
        )
        return new, jnp.asarray(tr)

    monkeypatch.setattr(eng, "run_chunk_traced", nan_traced)
    from advancedvi_jl_tpu.optimize import DivergenceError

    eng2_state = eng.init(q0.location, q0.scale_diag)
    with pytest.raises(DivergenceError, match="iteration 200"):
        eng.optimize(
            jax.random.key(0), 1_000, state=eng2_state,
            chunk_size=1_000, log_every=100,
        )

    # divergence in the REMAINDER chunk (steps beyond the last log_every
    # grid row) must also raise (r4 review finding)
    def nan_chunk(state, key, steps, noise=None, model=None):
        return state._replace(
            iteration=state.iteration + steps, elbo=jnp.float32(np.nan)
        )

    monkeypatch.setattr(eng, "run_chunk_traced", fake_traced)
    monkeypatch.setattr(eng, "run_chunk", nan_chunk)
    eng3_state = eng.init(q0.location, q0.scale_diag)
    with pytest.raises(DivergenceError, match="iteration 250"):
        eng.optimize(
            jax.random.key(0), 250, state=eng3_state,
            chunk_size=1_000, log_every=100,
        )


def test_fused_wide_model_matches_general_path():
    """d = 200 (two lane tiles, d_pad = 256): the mean-field engine is
    parametric in the lane width — parity against the general path on a
    wide logreg."""
    prob = make_logreg(jax.random.key(4), n_data=96, n_features=198)
    target = prob.unconstrained()
    d = prob.dim
    assert d == 200
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, 3, N_SAMPLES)

    engine = FusedADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=N_SAMPLES, lr=1e-3, interpret=True,
    )
    assert engine.d_pad == 256
    fstate = engine.init(q0.location, q0.scale_diag)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=3,
        noise=_pack_noise(draws, engine.d_pad),
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )
    # padding inert across both lane tiles
    assert np.all(np.asarray(fstate.sig[0, d:]) == 1.0)


def test_fused_entropy_names_match_library_constants():
    from advancedvi_jl_tpu.ops.pallas import fused_advi as fa

    assert fa.ENT_STL == avt.STL
    assert fa.ENT_CF_ZERO == avt.CLOSED_FORM_ZERO_GRAD
    assert fa.ENT_STL_ZERO == avt.STL_ZERO_GRAD


def test_fused_prox_dowg_meanfield_matches_general_path(flagship):
    """FusedProxADVI(dowg, closed_form_zero_grad) x mean-field logreg:
    injected-noise parity of the in-kernel DoWG rule (global norms, x0
    distance, v/r accumulators) and the closed-form entropy proximal step
    against KLMinRepGradProxDescent."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedProxADVI

    prob, target = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    alg = avt.KLMinRepGradProxDescent(
        entropy_zerograd=avt.CLOSED_FORM_ZERO_GRAD,
        n_samples=N_SAMPLES,
        optimizer=avt.dowg(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, T, N_SAMPLES)

    engine = FusedProxADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=N_SAMPLES, optimizer="dowg", interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale_diag)
    # DoWG state rides the Adam slots: x0 copies + [v, r] lanes
    assert_allclose(fstate.m_mu[0, :d], q0.location, rtol=0, atol=0)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )

    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    q_avg = alg.output(state)
    q_fused = engine.q(fstate)
    assert_allclose(q_fused.location, q_avg.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        q_fused.scale_diag, q_avg.scale_diag, rtol=1e-5, atol=1e-6
    )
    # DoWG accumulators vs the general-path DoWGState
    assert_allclose(
        float(fstate.v_mu[0, 0]), float(state.opt_state.v), rtol=1e-4
    )
    assert_allclose(
        float(fstate.v_mu[0, 1]), float(state.opt_state.r), rtol=1e-4
    )
    # closed-form entropy ELBO value of the final step
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_fused_prox_descent_fullrank_stl_zero_matches_general_path():
    """FusedProxADVI(descent, stl_zero_grad) x full-rank normal-lognormal:
    the zero-gradient STL correction (+1/diag on the scale diagonal) and
    the diagonal-only proximal step compose with the back-substitution
    whitening exactly as in the general path."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FULLRANK, FusedProxADVI

    prob, _, _ = make_normallognormal(jax.random.key(7), n_dims=10)
    target = prob.unconstrained()
    d = prob.dim
    C0 = 0.2 * jnp.eye(d) + 0.05 * jnp.tril(
        jax.random.normal(jax.random.key(3), (d, d)), -1
    )
    q0 = avt.FullRankGaussian(0.3 * jnp.ones(d), C0)

    alg = avt.KLMinRepGradProxDescent(
        entropy_zerograd=avt.STL_ZERO_GRAD,
        n_samples=N_SAMPLES,
        optimizer=avt.descent(1e-3),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, T, N_SAMPLES)

    engine = FusedProxADVI(
        normallognormal_spec(prob), family=FULLRANK,
        n_samples=N_SAMPLES, optimizer="descent", lr=1e-3,
        entropy=avt.STL_ZERO_GRAD, interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )

    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[:d, :d], jnp.tril(state.q.scale), rtol=1e-5, atol=1e-6
    )
    q_avg = alg.output(state)
    q_fused = engine.q(fstate)
    assert_allclose(q_fused.location, q_avg.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        q_fused.scale, jnp.tril(q_avg.scale), rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )
    # padding inert under the prox step (padded diag stays exactly 1.0)
    assert np.all(np.asarray(fstate.sig[d:, d:].diagonal()) == 1.0)


def test_fused_prox_validation():
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedProxADVI

    spec = gaussian_spec(jnp.zeros(4), jnp.ones(4))
    with pytest.raises(ValueError, match="optimizer"):
        FusedProxADVI(spec, optimizer="adam")
    with pytest.raises(ValueError, match="zero-gradient"):
        FusedProxADVI(spec, entropy=avt.STL)


def test_fused_scoregrad_matches_general_path(flagship):
    """FusedScoreGradVI (VarGrad, DoWG, IdentityOperator — the BBVI
    defaults) x mean-field logreg: injected-noise parity of the in-kernel
    closed-form score gradient against KLMinScoreGradDescent."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedScoreGradVI

    prob, target = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    alg = avt.KLMinScoreGradDescent(n_samples=N_SAMPLES, optimizer=avt.dowg())
    state = alg.init(jax.random.key(0), q0, target)
    step = jax.jit(alg.step)
    draws, infos = [], []
    for _ in range(T):
        step_key = jax.random.fold_in(state.key, state.iteration)
        z = state.q.sample(step_key, N_SAMPLES)
        u = (z - state.q.location) / state.q.scale_diag
        draws.append(np.asarray(u))
        state, info = step(state)
        infos.append(info)

    engine = FusedScoreGradVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=N_SAMPLES, optimizer="dowg", interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale_diag)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )

    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    q_avg = alg.output(state)
    q_fused = engine.q(fstate)
    assert_allclose(q_fused.location, q_avg.location, rtol=1e-5, atol=1e-6)
    # DoWG accumulators
    assert_allclose(
        float(fstate.v_mu[0, 0]), float(state.opt_state.v), rtol=1e-4
    )
    # the reported info elbo is the plain ELBO estimate, not VarGrad
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_fused_scoregrad_validation(flagship):
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedScoreGradVI

    prob, _ = flagship
    spec = logreg_spec(prob.X, prob.y)
    with pytest.raises(ValueError, match="n_samples >= 2"):
        FusedScoreGradVI(spec, n_samples=1)
    with pytest.raises(ValueError, match="optimizer"):
        FusedScoreGradVI(spec, optimizer="sgdm")
    with pytest.raises(ValueError, match="operator"):
        FusedScoreGradVI(spec, operator="prox")


def test_fused_minibatch_logreg_matches_manual_loop():
    """In-kernel minibatch subsampling (cyclic slab windows + n/B
    rescaling): injected-noise parity against a manual optax loop whose
    per-step target is the library's own LogReg.subsample restriction to
    the same window."""
    import math

    n_data, feats, B = 64, 4, 16
    prob = make_logreg(jax.random.key(2), n_data=n_data, n_features=feats)
    d = prob.dim
    db = d - 1
    nb = n_data // B
    T = 2 * nb + 1  # wraps the cyclic schedule
    n_s = 6

    spec = logreg_minibatch_spec(prob.X, prob.y, batch_size=B)
    eng = FusedADVI(spec, n_samples=n_s, lr=1e-3, interpret=True)

    rng = np.random.default_rng(0)
    draws = [
        rng.standard_normal((n_s, d)).astype(np.float32) for _ in range(T)
    ]

    mu = jnp.zeros(d)
    sig = 0.1 * jnp.ones(d)
    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init((mu, sig))
    avg = (mu, sig)
    elbo_last = None
    for it in range(T):
        k = it % nb
        # the library's own subsample restriction to the SAME window
        tgt = prob.subsample(jnp.arange(k * B, (k + 1) * B)).unconstrained()
        u = jnp.asarray(draws[it])

        def loss(params):
            m, s = params
            z = m + s * u
            energy = jnp.mean(jax.vmap(tgt.log_density)(z))
            ms, ss = jax.lax.stop_gradient((m, s))
            logq = (
                -0.5 * jnp.sum(((z - ms) / ss) ** 2, axis=1)
                - jnp.sum(jnp.log(ss))
                - 0.5 * d * math.log(2 * math.pi)
            )
            ent = -jnp.mean(logq)
            return -(energy + ent), energy + ent

        (l, elbo_last), g = jax.value_and_grad(loss, has_aux=True)((mu, sig))
        upd, opt_state = opt.update(g, opt_state, (mu, sig))
        mu, sig = optax.apply_updates((mu, sig), upd)
        sig = jnp.maximum(sig, 1e-5)
        w = 9.0 / (it + 1 + 8.0)
        avg = jax.tree.map(lambda a, p: (1 - w) * a + w * p, avg, (mu, sig))

    fstate = eng.run_chunk(
        eng.init(jnp.zeros(d), 0.1 * jnp.ones(d)),
        jax.random.key(1), steps=T, noise=_pack_noise(draws),
    )
    assert_allclose(fstate.mu[0, :d], mu, rtol=1e-5, atol=1e-6)
    assert_allclose(fstate.sig[0, :d], sig, rtol=1e-5, atol=1e-6)
    assert_allclose(fstate.avg_mu[0, :d], avg[0], rtol=1e-5, atol=1e-6)
    assert_allclose(
        float(fstate.elbo), float(elbo_last), rtol=1e-4, atol=1e-4
    )


def test_fused_minibatch_composes_with_prox_engine():
    """The in-kernel minibatch spec is orthogonal to the algorithm axis:
    FusedProxADVI over logreg_minibatch_spec equals a manual prox-descent
    loop whose per-step target is the library's subsample restriction."""
    import math

    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedProxADVI

    n_data, feats, B = 64, 4, 16
    prob = make_logreg(jax.random.key(2), n_data=n_data, n_features=feats)
    d = prob.dim
    nb = n_data // B
    Tm = nb + 2
    n_s = 6
    lr = 5e-3

    spec = logreg_minibatch_spec(prob.X, prob.y, batch_size=B)
    eng = FusedProxADVI(
        spec, n_samples=n_s, optimizer="descent", lr=lr, interpret=True,
    )

    rng = np.random.default_rng(1)
    draws = [
        rng.standard_normal((n_s, d)).astype(np.float32) for _ in range(Tm)
    ]

    mu = jnp.zeros(d)
    sig = 0.1 * jnp.ones(d)
    avg = (mu, sig)
    for it in range(Tm):
        k = it % nb
        tgt = prob.subsample(jnp.arange(k * B, (k + 1) * B)).unconstrained()
        u = jnp.asarray(draws[it])

        def loss(params, u=u, tgt=tgt):
            m, s = params
            z = m + s * u
            energy = jnp.mean(jax.vmap(tgt.log_density)(z))
            ent = jnp.sum(jnp.log(jax.lax.stop_gradient(s))) + 0.5 * d * (
                1 + math.log(2 * math.pi)
            )  # closed_form_zero_grad: detached
            return -(energy + ent)

        g = jax.grad(loss)((mu, sig))
        mu = mu - lr * g[0]
        sig = sig - lr * g[1]
        sig = sig / 2.0 + jnp.sqrt(sig * sig + 4.0 * lr) / 2.0  # prox
        w = 9.0 / (it + 1 + 8.0)
        avg = jax.tree.map(lambda a, p: (1 - w) * a + w * p, avg, (mu, sig))

    fstate = eng.run_chunk(
        eng.init(jnp.zeros(d), 0.1 * jnp.ones(d)),
        jax.random.key(1), steps=Tm, noise=_pack_noise(draws),
    )
    assert_allclose(fstate.mu[0, :d], mu, rtol=1e-5, atol=1e-6)
    assert_allclose(fstate.sig[0, :d], sig, rtol=1e-5, atol=1e-6)
    assert_allclose(fstate.avg_mu[0, :d], avg[0], rtol=1e-5, atol=1e-6)


def test_fused_minibatch_validation_and_trailing_drop():
    X = jnp.ones((70, 4))
    y = jnp.zeros((70,))
    with pytest.raises(ValueError, match="multiple of 8"):
        logreg_minibatch_spec(X, y, batch_size=10)
    with pytest.raises(ValueError, match="exceeds"):
        logreg_minibatch_spec(X, y, batch_size=80)
    spec = logreg_minibatch_spec(X, y, batch_size=16)
    # 70 rows -> 4 batches of 16, 6 trailing rows dropped; likeadj = 70/16
    assert spec.static_cfg == (4, 16, 4)
    assert spec.consts[0].shape[0] == 64
    assert float(spec.scalars[0]) == pytest.approx(70 / 16)
    # reshuffle returns same-shaped consts (no recompile contract)
    c2 = spec.reshuffle(jax.random.key(0), spec.consts)
    assert all(a.shape == b.shape for a, b in zip(spec.consts, c2))


def test_fused_optimize_calls_reshuffle(flagship, monkeypatch):
    prob, _ = flagship
    spec = logreg_minibatch_spec(prob.X, prob.y, batch_size=16)
    calls = []

    def spy_reshuffle(k, consts):
        calls.append(int(jax.random.key_data(k)[-1]))
        return consts

    spec = spec._replace(reshuffle=spy_reshuffle)
    eng = FusedADVI(spec, n_samples=4, interpret=True)

    def fake_traced(state, key, steps, log_every, noise=None, model=None):
        g = steps // log_every
        return state._replace(
            iteration=state.iteration + steps, elbo=jnp.float32(-1.0)
        ), jnp.full((g,), -1.0, jnp.float32)

    monkeypatch.setattr(eng, "run_chunk_traced", fake_traced)
    q0 = avt.MeanFieldGaussian(jnp.zeros(prob.dim), 0.1 * jnp.ones(prob.dim))
    eng.optimize(
        jax.random.key(0), 3_000, q0, chunk_size=1_000, log_every=100,
    )
    # reshuffled between chunks (after chunk 1 and 2; not after the last)
    assert len(calls) == 2


def test_fused_optimize_is_functional(flagship, monkeypatch):
    """optimize never mutates the engine (VERDICT r4 weak #3): reshuffled
    minibatch specs thread through a local, so a second optimize on the
    same engine sees the constructor's data order, like a fresh engine."""
    prob, _ = flagship
    spec = logreg_minibatch_spec(prob.X, prob.y, batch_size=16)
    consts0 = spec.consts
    calls = []

    def spy_reshuffle(k, consts):
        calls.append(int(jax.random.key_data(k)[-1]))
        # return DIFFERENT consts so mutation (if any) would be visible
        return tuple(c + 1.0 for c in consts)

    spec = spec._replace(reshuffle=spy_reshuffle)
    eng = FusedADVI(spec, n_samples=4, interpret=True)
    seen_models = []

    def fake_traced(state, key, steps, log_every, noise=None, model=None):
        seen_models.append(model)
        g = steps // log_every
        return state._replace(
            iteration=state.iteration + steps, elbo=jnp.float32(-1.0)
        ), jnp.full((g,), -1.0, jnp.float32)

    monkeypatch.setattr(eng, "run_chunk_traced", fake_traced)
    q0 = avt.MeanFieldGaussian(jnp.zeros(prob.dim), 0.1 * jnp.ones(prob.dim))
    eng.optimize(jax.random.key(0), 3_000, q0, chunk_size=1_000, log_every=100)
    # the engine's own spec is untouched...
    assert eng.model.consts is consts0
    # ...while the loop's chunks saw the reshuffled consts
    assert_allclose(
        np.asarray(seen_models[1].consts[1] - consts0[1]), 1.0, rtol=1e-5
    )
    calls_first = list(calls)
    seen_first = [m.consts[1] for m in seen_models]
    calls.clear()
    seen_models.clear()
    # second run on the SAME engine == fresh engine: identical reshuffle
    # keys and identical per-chunk consts
    eng.optimize(jax.random.key(0), 3_000, q0, chunk_size=1_000, log_every=100)
    assert calls == calls_first
    for a, b in zip(seen_first, (m.consts[1] for m in seen_models)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_scoregrad_identity_operator_warns(flagship):
    """Constructor warning parity with algorithms/paramspace.py:106
    (reference common.jl:42-46) for the known-NaN default pairing."""
    import warnings

    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedScoreGradVI

    prob, _ = flagship
    spec = logreg_spec(prob.X, prob.y)
    with pytest.warns(UserWarning, match="IdentityOperator"):
        FusedScoreGradVI(spec, operator="none")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        FusedScoreGradVI(spec, operator="clip")  # no warning


def test_fused_dowg_attr_config_init_is_self_contained(flagship):
    """Setting eng.algo='dowg' on a plain FusedADVI (the class's own
    attribute-configuration pattern) must not AttributeError in init()
    (ADVICE r4: alpha now has a base-class default)."""
    prob, _ = flagship
    eng = FusedADVI(logreg_spec(prob.X, prob.y), n_samples=4, interpret=True)
    eng.algo = "dowg"
    st = eng.init(jnp.zeros(prob.dim), 0.1 * jnp.ones(prob.dim))
    assert float(st.v_mu[0, 1]) > 0.0  # r0 = alpha (1 + ||x0||)


def test_backsub_blocked_matches_triangular_solve():
    """_backsub_ct_blocked is pure jnp on values: pin it against XLA's
    triangular solve directly, padding included."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        _backsub_ct_blocked,
        _pad_tril,
    )

    rng = np.random.default_rng(0)
    for d, dp in [(200, 256), (512, 512)]:
        C = np.tril(rng.normal(size=(d, d)).astype(np.float32))
        np.fill_diagonal(C, np.abs(C.diagonal()) + 1.0)
        Cp = _pad_tril(jnp.asarray(C), dp)
        u = np.zeros((N_PAD, dp), np.float32)
        u[:, :d] = rng.normal(size=(N_PAD, d)).astype(np.float32)
        v = _backsub_ct_blocked(Cp, jnp.asarray(u))
        want = jax.lax.linalg.triangular_solve(
            jnp.asarray(C), jnp.asarray(u[:, :d]).T,
            left_side=True, lower=True, transpose_a=True,
        ).T
        # random tril systems are ill-conditioned at d=512; f32 accum
        # noise ~5e-4 rel (the engine-level d=200 parity pins at 1e-4 on
        # the well-conditioned scale factors VI actually produces)
        assert_allclose(np.asarray(v[:, :d]), np.asarray(want),
                        rtol=2e-3, atol=2e-4)
        assert np.all(np.asarray(v[:, d:]) == 0.0)


def test_fused_fullrank_wide_matches_general_path():
    """d = 200 full-rank (two lane tiles -> the BLOCKED in-kernel
    back-substitution, VERDICT r4 #2): injected-noise parity vs the
    general path above the old d <= 128 cap."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    d = 200
    target, mu_true, L_true = normal_fullrank(jax.random.key(3), d)
    q0 = avt.FullRankGaussian(jnp.zeros(d), 0.1 * jnp.eye(d))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, 3, N_SAMPLES)

    from advancedvi_jl_tpu.ops.pallas.fused_advi import mvnormal_spec

    engine = FusedADVI(
        mvnormal_spec(target.mu, target.scale_tril),
        family=FULLRANK, n_samples=N_SAMPLES, lr=1e-3, interpret=True,
    )
    assert engine.d_pad == 256
    fstate = engine.init(q0.location, q0.scale_matrix())
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=3,
        noise=_pack_noise(draws, engine.d_pad),
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-4, atol=1e-5)
    assert_allclose(
        np.tril(np.asarray(fstate.sig[:d, :d])),
        np.tril(np.asarray(state.q.scale)),
        rtol=1e-4, atol=1e-5,
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-3
    )
    # padded scale diag stayed 1.0 (inert)
    assert np.all(np.asarray(fstate.sig)[d:, d:].diagonal() == 1.0)


def test_fused_fullrank_dim_cap():
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        D_FULLRANK_MAX,
        mvnormal_spec,
    )

    d = D_FULLRANK_MAX + 1
    spec = gaussian_spec(jnp.zeros(d), jnp.ones(d))
    with pytest.raises(ValueError, match="full-rank fused engine"):
        FusedADVI(spec, family=FULLRANK)


def test_fused_prox_dog_matches_general_path(flagship):
    """In-kernel DoG (VERDICT r4 #9): eta = r/sqrt(v), v += ||g||^2 in the
    DoWG slot scheme — injected-noise parity vs KLMinRepGradProxDescent
    with optim.rules.dog, accumulators included."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedProxADVI

    prob, target = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    alg = avt.KLMinRepGradProxDescent(
        entropy_zerograd=avt.CLOSED_FORM_ZERO_GRAD,
        n_samples=N_SAMPLES,
        optimizer=avt.dog(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, T, N_SAMPLES)

    engine = FusedProxADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=N_SAMPLES, optimizer="dog", interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale_diag)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        float(fstate.v_mu[0, 0]), float(state.opt_state.v), rtol=1e-4
    )
    assert_allclose(
        float(fstate.v_mu[0, 1]), float(state.opt_state.r), rtol=1e-4
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_fused_cocob_matches_general_path(flagship):
    """In-kernel COCOB (VERDICT r4 #9): per-coordinate coin betting with
    the (G, reward, theta) accumulators in the ext state slots —
    injected-noise parity vs the general path running optim.rules.cocob,
    all five accumulators pinned."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedScoreGradVI

    prob, target = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    # general path: KLMinScoreGradDescent(optimizer=cocob) — VarGrad +
    # COCOB + ClipScale (identity operator would also work; clip pins the
    # composition order)
    alg = avt.KLMinScoreGradDescent(
        n_samples=N_SAMPLES, optimizer=avt.cocob(), operator=avt.ClipScale()
    )
    state = alg.init(jax.random.key(0), q0, target)
    step = jax.jit(alg.step)
    draws, infos = [], []
    for _ in range(T):
        step_key = jax.random.fold_in(state.key, state.iteration)
        _, u = state.q.sample_with_base(step_key, N_SAMPLES)
        draws.append(np.asarray(u))
        state, info = step(state)
        infos.append(info)

    engine = FusedScoreGradVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=N_SAMPLES, optimizer="cocob", operator="clip",
        interpret=True,
    )
    fstate = engine.init(q0.location, q0.scale_diag)
    assert fstate.ext is not None and len(fstate.ext) == 6
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T, noise=_pack_noise(draws)
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    # all five COCOB accumulators vs the general COCOBState.  These are
    # state-LAYOUT diagnostics (the parameters above pin the math at
    # rtol 1e-5); tolerances absorb f32 reduction-order noise of the
    # score gradient accumulated into |g| sums and near-zero
    # theta/reward crossings (theta entries are O(100) sums).
    cs = state.opt_state
    assert_allclose(fstate.v_mu[0, :d], cs.L.location, rtol=1e-4, atol=1e-4)
    assert_allclose(
        fstate.v_sig[0, :d], cs.L.scale_diag, rtol=1e-4, atol=1e-4
    )
    assert_allclose(
        fstate.ext[0][0, :d], cs.G.location, rtol=1e-4, atol=1e-4
    )
    assert_allclose(
        fstate.ext[1][0, :d], cs.R.location, rtol=1e-4, atol=1e-4
    )
    assert_allclose(
        fstate.ext[2][0, :d], cs.theta.location, rtol=1e-4, atol=1e-3
    )
    assert_allclose(
        fstate.ext[5][0, :d], cs.theta.scale_diag, rtol=1e-4, atol=1e-3
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )
    # warm start through the ext slots: 2 + (T-2) == T in one go
    f2 = engine.init(q0.location, q0.scale_diag)
    noise = _pack_noise(draws)
    f2 = engine.run_chunk(f2, jax.random.key(1), 2, noise=noise[: 2 * N_PAD])
    f2 = engine.run_chunk(
        f2, jax.random.key(1), T - 2, noise=noise[2 * N_PAD :]
    )
    assert_allclose(
        np.asarray(f2.mu), np.asarray(fstate.mu), rtol=1e-6, atol=1e-7
    )
    assert_allclose(
        np.asarray(f2.ext[2]), np.asarray(fstate.ext[2]), rtol=1e-6,
        atol=1e-7,
    )


def test_fused_minibatch_hbm_matches_resident(flagship):
    """HBM-streamed minibatch spec (VERDICT r4 #5): identical math and
    batch schedule to the VMEM-resident spec — states match bitwise-ish
    on the same injected noise, only the slab transport differs (per-step
    DMA from an ANY-space ref into VMEM scratch)."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        logreg_minibatch_hbm_spec,
    )

    prob, _ = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    n_s, steps = 6, 7
    kw = dict(batch_size=16, key=jax.random.key(2))
    spec_vm = logreg_minibatch_spec(prob.X, prob.y, **kw)
    spec_hbm = logreg_minibatch_hbm_spec(prob.X, prob.y, **kw)
    assert spec_hbm.const_spaces == ("any", "vmem")
    # default = double-buffered prefetch: (2, B, dp) buffer + 2 DMA sems
    assert spec_hbm.scratch[0][0] == "vmem"
    assert spec_hbm.scratch[0][1][0] == 2
    assert spec_hbm.scratch[1] == ("dma", (2,))

    rng = np.random.default_rng(1)
    noise = jnp.asarray(
        rng.standard_normal((steps * N_PAD, D_PAD)).astype(np.float32)
    )
    states = []
    for spec in (spec_vm, spec_hbm):
        eng = FusedADVI(spec, n_samples=n_s, lr=1e-3, interpret=True)
        st = eng.init(q0.location, q0.scale_diag)
        st = eng.run_chunk(st, jax.random.key(1), steps=steps, noise=noise)
        states.append(st)
    for a, b in zip(states[0][:8], states[1][:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    assert_allclose(float(states[0].elbo), float(states[1].elbo), rtol=1e-6)
    # traced mode streams too (the grid + DMA composition)
    eng = FusedADVI(spec_hbm, n_samples=n_s, lr=1e-3, interpret=True)
    st = eng.init(q0.location, q0.scale_diag)
    st6, trace = eng.run_chunk_traced(
        st, jax.random.key(1), steps=6, log_every=3, noise=noise[: 6 * N_PAD]
    )
    assert trace.shape == (2,)
    assert np.all(np.isfinite(np.asarray(trace)))


def test_fused_minibatch_hbm_large_n():
    """The point of streaming: an n_data far beyond the ~24k-row VMEM
    residency builds and runs (interpret mode; the 500k-row on-chip run
    is recorded in BENCH_NOTES 'Round 5')."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        logreg_minibatch_hbm_spec,
    )

    rng = np.random.default_rng(0)
    n, p = 60_000, 12   # resident spec would need ~30 MB of VMEM
    X = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
    y = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))
    spec = logreg_minibatch_hbm_spec(X, y, batch_size=256)
    eng = FusedADVI(spec, n_samples=4, lr=1e-3, interpret=True)
    d = p + 1
    st = eng.init(jnp.zeros(d), 0.1 * jnp.ones(d))
    noise = jnp.asarray(
        rng.standard_normal((3 * N_PAD, D_PAD)).astype(np.float32)
    )
    st = eng.run_chunk(st, jax.random.key(1), steps=3, noise=noise)
    assert np.isfinite(float(st.elbo))
    assert int(st.iteration) == 3


def test_fused_minibatch_hbm_prefetch_matches_sync(flagship):
    """The double-buffered prefetch pipeline (prologue start, per-step
    start(it+1)/wait(it), epilogue wait) computes EXACTLY what the
    synchronous variant does — and chunk splits keep the pipeline sound
    (each chunk re-runs its own prologue/epilogue)."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        logreg_minibatch_hbm_spec,
    )

    prob, _ = flagship
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    kw = dict(batch_size=16, key=jax.random.key(2))
    spec_db = logreg_minibatch_hbm_spec(prob.X, prob.y, **kw)
    spec_sync = logreg_minibatch_hbm_spec(prob.X, prob.y, prefetch=False,
                                          **kw)
    rng = np.random.default_rng(1)
    steps = 7
    noise = jnp.asarray(
        rng.standard_normal((steps * N_PAD, D_PAD)).astype(np.float32)
    )
    states = []
    for spec in (spec_sync, spec_db):
        eng = FusedADVI(spec, n_samples=6, lr=1e-3, interpret=True)
        st = eng.init(q0.location, q0.scale_diag)
        st = eng.run_chunk(st, jax.random.key(1), steps=steps, noise=noise)
        states.append(st)
    for a, b in zip(states[0][:8], states[1][:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    # split chunks: 3 + 4 == 7 (prologue/epilogue re-run per chunk)
    eng = FusedADVI(spec_db, n_samples=6, lr=1e-3, interpret=True)
    st = eng.init(q0.location, q0.scale_diag)
    st = eng.run_chunk(st, jax.random.key(1), steps=3,
                       noise=noise[: 3 * N_PAD])
    st = eng.run_chunk(st, jax.random.key(1), steps=4,
                       noise=noise[3 * N_PAD :])
    assert_allclose(
        np.asarray(st.mu), np.asarray(states[1].mu), rtol=1e-6, atol=1e-7
    )
    # traced mode (grid): prologue/epilogue per grid step
    st2 = eng.init(q0.location, q0.scale_diag)
    st2, trace = eng.run_chunk_traced(
        st2, jax.random.key(1), steps=6, log_every=3,
        noise=noise[: 6 * N_PAD],
    )
    assert np.all(np.isfinite(np.asarray(trace)))


def test_fused_wide_n_samples_matches_general_path(flagship):
    """Round 5: the n_samples <= 16 cap is lifted (parametric sample-row
    padding) — parity vs the general path at n_samples = 24 for both
    families."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import n_pad_for

    assert n_pad_for(10) == 16 and n_pad_for(24) == 24 and n_pad_for(100) == 104
    prob = make_logreg(jax.random.key(4), n_data=64, n_features=10)
    target = prob.unconstrained()
    d = prob.dim
    n_s, T_ = 24, 3
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=n_s,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    state, draws, infos = _run_general(alg, state, T_, n_s)

    engine = FusedADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=n_s, lr=1e-3, interpret=True,
    )
    assert engine.n_pad == 24
    noise = np.zeros((T_ * engine.n_pad, engine.d_pad), np.float32)
    for t, u in enumerate(draws):
        noise[t * engine.n_pad : t * engine.n_pad + n_s, :d] = u
    fstate = engine.init(q0.location, q0.scale_diag)
    fstate = engine.run_chunk(
        fstate, jax.random.key(1), steps=T_, noise=jnp.asarray(noise)
    )
    assert_allclose(fstate.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(
        fstate.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6
    )
    assert_allclose(
        float(fstate.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )
    # over-cap still rejected
    from advancedvi_jl_tpu.ops.pallas.fused_advi import N_SAMPLES_MAX_SC

    with pytest.raises(ValueError, match="n_samples"):
        FusedADVI(gaussian_spec(jnp.zeros(4), jnp.ones(4)),
                  n_samples=N_SAMPLES_MAX_SC + 1)
