"""Parity tests for the multi-chain fused engine (ops/pallas/fused_chains).

Each chain of FusedChainsADVI must reproduce the general path exactly
under injected noise — C chains in one kernel vs C independent
KLMinRepGradDescent runs consuming the same per-chain base draws.  The
sharded path (shard_map over the chain axis) must equal the unsharded
kernel on the CPU mesh (RNG stubbed to zeros by InterpretParams, so both
sides see identical draws).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from numpy.testing import assert_allclose

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.ops.pallas.fused_advi import D_PAD, logreg_spec
from advancedvi_jl_tpu.ops.pallas.fused_chains import (
    FusedChainsADVI,
    FusedChainsState,
)

T = 4
N_SAMPLES = 6
C = 3  # real chains (c_pad = 8)


@pytest.fixture(scope="module")
def flagship():
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    return prob, prob.unconstrained()


def test_fused_chains_match_general_path(flagship):
    """Chain c of the fused multi-chain kernel == an independent
    general-path run from chain c's q0 on chain c's draws."""
    prob, target = flagship
    d = prob.dim
    rng = np.random.default_rng(3)
    # per-chain initial parameters and per-(step, chain) draws
    locs = jnp.asarray(rng.normal(0, 0.3, (C, d)).astype(np.float32))
    sds = jnp.asarray(
        rng.uniform(0.05, 0.2, (C, d)).astype(np.float32)
    )
    draws = rng.standard_normal((T, C, N_SAMPLES, d)).astype(np.float32)

    # general path per chain
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    finals = []
    for c in range(C):
        q0 = avt.MeanFieldGaussian(locs[c], sds[c])
        q = q0
        opt_state = alg.optimizer.init(q0)
        avg_state = alg.averager.init(q0)
        for t in range(T):
            # manual step consuming the injected draw (mirrors
            # test_fused_advi's manual-loop harness)
            u = jnp.asarray(draws[t, c])

            def loss(params, u=u):
                m, s = params
                z = m + s * u
                energy = jnp.mean(
                    jax.vmap(target.log_density)(z)
                )
                ms, ss = jax.lax.stop_gradient((m, s))
                logq = (
                    -0.5 * jnp.sum(((z - ms) / ss) ** 2, axis=1)
                    - jnp.sum(jnp.log(ss))
                    - 0.5 * d * np.log(2 * np.pi)
                )
                return -(energy - jnp.mean(logq))

            g = jax.grad(loss)((q.location, q.scale_diag))
            grad_q = q.replace(location=g[0], scale_diag=g[1])
            upd, opt_state = alg.optimizer.update(grad_q, opt_state, q)
            q = optax.apply_updates(q, upd)
            q = avt.ClipScale().apply(q, opt_state)
            avg_state = alg.averager.apply(avg_state, q)
        finals.append((q, alg.averager.value(avg_state)))

    # fused chains on the same draws
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_chains=C, n_samples=N_SAMPLES, lr=1e-3, interpret=True,
    )
    R = eng.n_samples * eng.c_pad
    noise = np.zeros((T * R, D_PAD), np.float32)
    for t in range(T):
        for s in range(N_SAMPLES):
            for c in range(C):
                noise[t * R + s * eng.c_pad + c, :d] = draws[t, c, s]
    f = eng.init(locs, sds)
    f = eng.run_chunk(f, jax.random.key(1), steps=T,
                      noise=jnp.asarray(noise))

    for c in range(C):
        q_c, q_avg_c = finals[c]
        assert_allclose(f.mu[c, :d], q_c.location, rtol=1e-5, atol=1e-6)
        assert_allclose(f.sig[c, :d], q_c.scale_diag, rtol=1e-5, atol=1e-6)
        assert_allclose(
            f.avg_mu[c, :d], q_avg_c.location, rtol=1e-5, atol=1e-6
        )
        assert_allclose(
            f.avg_sig[c, :d], q_avg_c.scale_diag, rtol=1e-5, atol=1e-6
        )
    # stacked-family output shape
    qs = eng.q(f)
    assert qs.location.shape == (C, d)
    # padding inert
    assert np.all(np.asarray(f.sig[C:, :]) == 1.0)
    assert np.all(np.asarray(f.m_mu[C:, :]) == 0.0)
    assert f.iteration == T


def test_fused_chains_elbo_matches_single_engine(flagship):
    """The per-chain in-kernel ELBO equals FusedADVI's for the same
    draws (chain 0 only, cross-engine consistency)."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        N_PAD,
        FusedLogRegADVI,
    )

    prob, _ = flagship
    d = prob.dim
    rng = np.random.default_rng(5)
    draws = rng.standard_normal((T, N_SAMPLES, d)).astype(np.float32)
    loc0 = jnp.zeros(d)
    sd0 = 0.1 * jnp.ones(d)

    single = FusedLogRegADVI(
        prob.X, prob.y, prior_scale=prob.prior_scale,
        likeadj=float(prob.likeadj), n_samples=N_SAMPLES, lr=1e-3,
        interpret=True,
    )
    noise_s = np.zeros((T * N_PAD, D_PAD), np.float32)
    for t in range(T):
        noise_s[t * N_PAD : t * N_PAD + N_SAMPLES, :d] = draws[t]
    fs = single.run_chunk(
        single.init(loc0, sd0), jax.random.key(0), steps=T,
        noise=jnp.asarray(noise_s),
    )

    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_chains=1, n_samples=N_SAMPLES, lr=1e-3, interpret=True,
    )
    R = eng.n_samples * eng.c_pad
    noise_c = np.zeros((T * R, D_PAD), np.float32)
    for t in range(T):
        for s in range(N_SAMPLES):
            noise_c[t * R + s * eng.c_pad + 0, :d] = draws[t, s]
    fc = eng.run_chunk(
        eng.init(loc0[None], sd0[None]), jax.random.key(0), steps=T,
        noise=jnp.asarray(noise_c),
    )
    assert_allclose(fc.mu[0], fs.mu[0], rtol=1e-6, atol=1e-7)
    assert_allclose(fc.sig[0], fs.sig[0], rtol=1e-6, atol=1e-7)
    assert_allclose(
        float(fc.elbo[0]), float(fs.elbo), rtol=1e-5, atol=1e-5
    )


def test_fused_chains_sharded_equals_unsharded(flagship):
    """shard_map over the chain axis == the unsharded kernel on the CPU
    mesh.  InterpretParams stubs the on-chip RNG to zeros on BOTH sides,
    so the comparison is exact (per-device key folding is inert)."""
    from jax.experimental.pallas import tpu as pltpu

    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh

    prob, _ = flagship
    d = prob.dim
    n_chains = 16  # 8 devices x 2... per-device block must be mult of 8
    n_dev = 2
    mesh = make_vi_mesh(n_mc=n_dev, devices=jax.devices()[:n_dev])
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y), n_chains=n_chains, n_samples=4,
        interpret=pltpu.InterpretParams(),
    )
    rng = np.random.default_rng(0)
    locs = jnp.asarray(rng.normal(0, 0.2, (n_chains, d)).astype(np.float32))
    sds = 0.1 * jnp.ones((n_chains, d), jnp.float32)
    f0 = eng.init(locs, sds)

    f_plain = eng.run_chunk(f0, jax.random.key(0), steps=3)
    f_shard = eng.run_sharded(f0, jax.random.key(0), steps=3, mesh=mesh,
                              axis=MC_AXIS)
    for a, b in zip(f_plain[:8], f_shard[:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    assert int(f_shard.iteration) == 3


def test_fused_chains_per_chain_lr_sweep(flagship):
    """lr as an (n_chains,) array sweeps C step sizes in one kernel: each
    chain must match a single-chain FusedADVI run at that chain's lr."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        N_PAD,
        FusedADVI,
    )

    prob, _ = flagship
    d = prob.dim
    spec = logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                       likeadj=float(prob.likeadj))
    lrs = np.array([1e-3, 3e-3, 1e-2], np.float32)
    rng = np.random.default_rng(9)
    draws = rng.standard_normal((T, N_SAMPLES, d)).astype(np.float32)
    loc0 = jnp.zeros(d)
    sd0 = 0.1 * jnp.ones(d)

    eng = FusedChainsADVI(
        spec, n_chains=3, n_samples=N_SAMPLES, lr=jnp.asarray(lrs),
        interpret=True,
    )
    R = eng.n_samples * eng.c_pad
    noise = np.zeros((T * R, 128), np.float32)
    for t in range(T):
        for s in range(N_SAMPLES):
            for c in range(3):
                # all chains consume the SAME draws: only lr differs
                noise[t * R + s * eng.c_pad + c, :d] = draws[t, s]
    f = eng.run_chunk(
        eng.init(jnp.tile(loc0, (3, 1)), jnp.tile(sd0, (3, 1))),
        jax.random.key(0), steps=T, noise=jnp.asarray(noise),
    )

    noise_s = np.zeros((T * N_PAD, 128), np.float32)
    for t in range(T):
        noise_s[t * N_PAD : t * N_PAD + N_SAMPLES, :d] = draws[t]
    for c, lr in enumerate(lrs):
        single = FusedADVI(spec, n_samples=N_SAMPLES, lr=float(lr),
                           interpret=True)
        fs = single.run_chunk(
            single.init(loc0, sd0), jax.random.key(0), steps=T,
            noise=jnp.asarray(noise_s),
        )
        assert_allclose(f.mu[c], fs.mu[0], rtol=1e-6, atol=1e-7)
        assert_allclose(f.sig[c], fs.sig[0], rtol=1e-6, atol=1e-7)
        assert_allclose(f.avg_mu[c], fs.avg_mu[0], rtol=1e-6, atol=1e-7)
    # different lrs produced genuinely different chains
    assert not np.allclose(np.asarray(f.mu[0]), np.asarray(f.mu[2]))

    with pytest.raises(ValueError, match="per-chain lr"):
        FusedChainsADVI(spec, n_chains=3, lr=jnp.ones(5), interpret=True)


def test_fused_chains_prox_and_scoregrad_match_single_engines(flagship):
    """The chains kernel's prox-DoWG and VarGrad branches equal the
    single-chain FusedProxADVI / FusedScoreGradVI on the same draws
    (which are themselves pinned to the general path)."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        N_PAD,
        FusedProxADVI,
        FusedScoreGradVI,
    )

    prob, _ = flagship
    d = prob.dim
    spec = logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                       likeadj=float(prob.likeadj))
    rng = np.random.default_rng(13)
    draws = rng.standard_normal((T, N_SAMPLES, d)).astype(np.float32)
    loc0 = 0.1 * jnp.ones(d)
    sd0 = 0.15 * jnp.ones(d)

    noise_s = np.zeros((T * N_PAD, 128), np.float32)
    for t in range(T):
        noise_s[t * N_PAD : t * N_PAD + N_SAMPLES, :d] = draws[t]

    for kind in ("prox", "scoregrad"):
        if kind == "prox":
            single = FusedProxADVI(
                spec, n_samples=N_SAMPLES, optimizer="dowg",
                interpret=True,
            )
            chains = FusedChainsADVI(
                spec, n_chains=2, n_samples=N_SAMPLES, interpret=True,
                optimizer="dowg", entropy=single.entropy, operator="prox",
            )
        else:
            single = FusedScoreGradVI(
                spec, n_samples=N_SAMPLES, optimizer="dowg",
                operator="clip", interpret=True,
            )
            chains = FusedChainsADVI(
                spec, n_chains=2, n_samples=N_SAMPLES, interpret=True,
                optimizer="dowg", grad_est="scoregrad", operator="clip",
            )
        fs = single.run_chunk(
            single.init(loc0, sd0), jax.random.key(0), steps=T,
            noise=jnp.asarray(noise_s),
        )
        R = chains.n_samples * chains.c_pad
        noise_c = np.zeros((T * R, 128), np.float32)
        for t in range(T):
            for s in range(N_SAMPLES):
                for c in range(2):
                    noise_c[t * R + s * chains.c_pad + c, :d] = draws[t, s]
        fc = chains.run_chunk(
            chains.init(jnp.tile(loc0, (2, 1)), jnp.tile(sd0, (2, 1))),
            jax.random.key(0), steps=T, noise=jnp.asarray(noise_c),
        )
        for c in range(2):
            assert_allclose(fc.mu[c], fs.mu[0], rtol=1e-5, atol=1e-7,
                            err_msg=kind)
            assert_allclose(fc.sig[c], fs.sig[0], rtol=1e-5, atol=1e-7,
                            err_msg=kind)
            assert_allclose(fc.avg_mu[c], fs.avg_mu[0], rtol=1e-5,
                            atol=1e-7, err_msg=kind)
        # per-chain DoWG accumulators == the single engine's scalars
        assert_allclose(float(fc.v_mu[0, 0]), float(fs.v_mu[0, 0]),
                        rtol=1e-5, err_msg=kind)
        assert_allclose(float(fc.v_mu[0, 1]), float(fs.v_mu[0, 1]),
                        rtol=1e-5, err_msg=kind)
        assert_allclose(float(fc.elbo[0]), float(fs.elbo), rtol=1e-4,
                        atol=1e-4, err_msg=kind)
    # padded chains stayed inert through prox/dowg
    assert np.all(np.asarray(fc.sig[2:, :]) == 1.0)

    with pytest.raises(ValueError, match="prox"):
        FusedChainsADVI(spec, n_chains=2, optimizer="adam", operator="prox")
    with pytest.raises(ValueError, match="n_samples >= 2"):
        FusedChainsADVI(spec, n_chains=2, n_samples=1,
                        grad_est="scoregrad")


def test_fused_chains_validation(flagship):
    prob, _ = flagship
    spec = logreg_spec(prob.X, prob.y)
    with pytest.raises(ValueError, match="n_chains"):
        FusedChainsADVI(spec, n_chains=500)
    # the flat n_samples cap is 64 (round 5); beyond it raises, and the
    # JOINT sample-block VMEM budget rejects big n_samples x n_chains
    with pytest.raises(ValueError, match="n_samples"):
        FusedChainsADVI(spec, n_chains=8, n_samples=65)
    with pytest.raises(ValueError, match="VMEM sample"):
        FusedChainsADVI(spec, n_chains=128, n_samples=64)
    FusedChainsADVI(spec, n_chains=8, n_samples=64)
    eng = FusedChainsADVI(spec, n_chains=8, interpret=True)
    with pytest.raises(ValueError, match="locations"):
        eng.init(jnp.zeros((4, prob.dim)), jnp.ones((4, prob.dim)))
    with pytest.raises(ValueError, match="multiple of 8"):
        eng2 = FusedChainsADVI(spec, n_chains=16, interpret=True)
        from advancedvi_jl_tpu.parallel.mesh import make_vi_mesh

        mesh = make_vi_mesh(n_mc=4, devices=jax.devices()[:4])
        st = eng2.init(
            jnp.zeros((16, prob.dim)), 0.1 * jnp.ones((16, prob.dim))
        )
        eng2.run_sharded(st, jax.random.key(0), 2, mesh)
    with pytest.raises(ValueError, match="noise"):
        st8 = eng.init(
            jnp.zeros((8, prob.dim)), 0.1 * jnp.ones((8, prob.dim))
        )
        eng.run_chunk(st8, jax.random.key(0), steps=2,
                      noise=jnp.zeros((8, D_PAD)))


def test_chains_lr_sweep_requires_stepsize_driven_optimizer():
    """ADVICE r4: a per-chain lr array with a parameter-free optimizer
    would silently run identical chains — must raise at construction."""
    import jax
    import jax.numpy as jnp
    import pytest

    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import logreg_spec
    from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI

    prob = make_logreg(jax.random.key(3), n_data=32, n_features=6)
    spec = logreg_spec(prob.X, prob.y)
    lrs = jnp.geomspace(1e-4, 1e-1, 8)
    with pytest.raises(ValueError, match="step-size-driven"):
        FusedChainsADVI(spec, n_chains=8, lr=lrs, optimizer="dowg")
    # adam and descent sweeps stay valid
    FusedChainsADVI(spec, n_chains=8, lr=lrs, optimizer="adam")
    FusedChainsADVI(spec, n_chains=8, lr=lrs, optimizer="descent")


def test_chains_traced_matches_untraced(flagship):
    """run_chunk_traced == run_chunk on the same injected noise, and the
    trace rows carry every chain's ELBO on the log_every grid (last row
    == the state's elbo channel)."""
    prob, _ = flagship
    d = prob.dim
    rng = np.random.default_rng(4)
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y), n_chains=C, n_samples=N_SAMPLES,
        lr=1e-3, interpret=True,
    )
    locs = jnp.asarray(rng.normal(0, 0.2, (C, d)).astype(np.float32))
    f0 = eng.init(locs, 0.1 * jnp.ones((C, d), jnp.float32))
    R = eng.n_samples * eng.c_pad
    steps = 6
    noise = jnp.asarray(
        rng.standard_normal((steps * R, eng.d_pad)).astype(np.float32)
    )
    f_plain = eng.run_chunk(f0, jax.random.key(1), steps=steps, noise=noise)
    f_traced, trace = eng.run_chunk_traced(
        f0, jax.random.key(1), steps=steps, log_every=2, noise=noise
    )
    for a, b in zip(f_plain[:8], f_traced[:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    assert trace.shape == (3, C)
    assert_allclose(
        np.asarray(trace[-1]), np.asarray(f_traced.elbo[:C]),
        rtol=1e-6, atol=1e-7,
    )
    assert np.all(np.isfinite(np.asarray(trace)))


def test_chains_divergence_channel_names_chain_and_iteration(flagship):
    """VERDICT r4 #6: an injected diverging chain is reported as (chain,
    iteration) at log_every granularity while healthy chains stay
    finite — no full run needed."""
    from advancedvi_jl_tpu.ops.pallas.fused_chains import (
        first_chain_divergence,
    )

    prob, _ = flagship
    d = prob.dim
    C8 = 8
    # per-chain lr sweep with one absurd step size: chain 5 explodes, the
    # others optimize normally (the scoregrad-outlier scenario in
    # miniature)
    lrs = np.full((C8,), 1e-3, np.float32)
    lrs[5] = 1e7
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y), n_chains=C8, n_samples=4,
        lr=jnp.asarray(lrs), optimizer="descent", interpret=True,
    )
    rng = np.random.default_rng(5)
    locs = jnp.asarray(rng.normal(0, 0.2, (C8, d)).astype(np.float32))
    f0 = eng.init(locs, 0.1 * jnp.ones((C8, d), jnp.float32))
    R = eng.n_samples * eng.c_pad
    steps = 6
    noise = jnp.asarray(
        rng.standard_normal((steps * R, eng.d_pad)).astype(np.float32)
    )
    _, trace = eng.run_chunk_traced(
        f0, jax.random.key(1), steps=steps, log_every=2, noise=noise
    )
    hit = first_chain_divergence(trace, log_every=2)
    assert hit is not None
    chain, iteration = hit
    assert chain == 5
    assert iteration == 2          # diverges within the first window
    # healthy chains stayed finite the whole chunk
    tr = np.asarray(trace)
    mask = np.ones(C8, bool)
    mask[5] = False
    assert np.all(np.isfinite(tr[:, mask]))
    # clean trace -> None
    assert first_chain_divergence(np.zeros((3, 4), np.float32), 2) is None


def test_chains_sharded_traced_divergence(flagship):
    """The divergence channel survives sharding: run_sharded(log_every=)
    returns the trace in GLOBAL chain order on the CPU mesh."""
    from jax.experimental.pallas import tpu as pltpu

    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh

    prob, _ = flagship
    d = prob.dim
    n_chains, n_dev = 16, 2
    mesh = make_vi_mesh(n_mc=n_dev, devices=jax.devices()[:n_dev])
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y), n_chains=n_chains, n_samples=4,
        interpret=pltpu.InterpretParams(),
    )
    rng = np.random.default_rng(0)
    locs = jnp.asarray(rng.normal(0, 0.2, (n_chains, d)).astype(np.float32))
    f0 = eng.init(locs, 0.1 * jnp.ones((n_chains, d), jnp.float32))
    f_plain, trace_plain = eng.run_chunk_traced(
        f0, jax.random.key(0), steps=4, log_every=2
    )
    f_shard, trace_shard = eng.run_sharded(
        f0, jax.random.key(0), steps=4, mesh=mesh, axis=MC_AXIS,
        log_every=2,
    )
    assert trace_shard.shape == (2, n_chains)
    # InterpretParams stubs RNG identically on both sides -> exact match
    assert_allclose(
        np.asarray(trace_shard), np.asarray(trace_plain),
        rtol=1e-6, atol=1e-7,
    )
    for a, b in zip(f_plain[:8], f_shard[:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_chains_dog_and_cocob_match_single_engine(flagship):
    """In-kernel DoG and COCOB in the chains kernel (VERDICT r4 #9):
    chain 0 of the multi-chain run == the single-chain engine on chain
    0's noise rows, for both rules (COCOB threads its ext accumulators
    through the chain axis)."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedADVI

    prob, _ = flagship
    d = prob.dim
    spec = logreg_spec(prob.X, prob.y)
    rng = np.random.default_rng(9)
    C8, n_s, steps = 8, 4, 3
    locs = jnp.asarray(rng.normal(0, 0.2, (C8, d)).astype(np.float32))
    sds = 0.1 * jnp.ones((C8, d), jnp.float32)

    for rule in ("dog", "cocob"):
        eng = FusedChainsADVI(
            spec, n_chains=C8, n_samples=n_s, optimizer=rule,
            interpret=True,
        )
        st = eng.init(locs, sds)
        if rule == "cocob":
            assert st.ext is not None and len(st.ext) == 6
        R = n_s * eng.c_pad
        noise = jnp.asarray(
            rng.standard_normal((steps * R, eng.d_pad)).astype(np.float32)
        )
        st = eng.run_chunk(st, jax.random.key(3), steps=steps, noise=noise)

        single = FusedADVI(spec, n_samples=n_s, interpret=True)
        single.algo = rule
        s0 = single.init(locs[0], sds[0])
        from advancedvi_jl_tpu.ops.pallas.fused_advi import N_PAD

        rows = []
        for t in range(steps):
            blk = noise[t * R : (t + 1) * R]
            per_chain = blk.reshape(n_s, eng.c_pad, eng.d_pad)[:, 0, :]
            rows.append(
                jnp.zeros((N_PAD, eng.d_pad), jnp.float32).at[:n_s].set(
                    per_chain
                )
            )
        s0 = single.run_chunk(
            s0, jax.random.key(3), steps=steps, noise=jnp.concatenate(rows)
        )
        assert_allclose(
            np.asarray(st.mu[0]), np.asarray(s0.mu[0]), rtol=1e-5,
            atol=1e-6, err_msg=rule,
        )
        assert_allclose(
            np.asarray(st.sig[0]), np.asarray(s0.sig[0]), rtol=1e-5,
            atol=1e-6, err_msg=rule,
        )
        if rule == "cocob":
            assert_allclose(
                np.asarray(st.ext[2][0]), np.asarray(s0.ext[2][0]),
                rtol=1e-5, atol=1e-5,
            )


def test_chains_run_hbm_streamed_spec(flagship):
    """Streamed-minibatch chains: the HBM spec drives the multi-chain
    kernel (shared registry + shared scratch plumbing)."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        logreg_minibatch_hbm_spec,
    )

    prob, _ = flagship
    d = prob.dim
    spec = logreg_minibatch_hbm_spec(
        prob.X, prob.y, batch_size=16, key=jax.random.key(2)
    )
    eng = FusedChainsADVI(spec, n_chains=8, n_samples=4, interpret=True)
    rng = np.random.default_rng(2)
    st = eng.init(
        jnp.asarray(rng.normal(0, 0.2, (8, d)).astype(np.float32)),
        0.1 * jnp.ones((8, d), jnp.float32),
    )
    R = 4 * eng.c_pad
    noise = jnp.asarray(
        rng.standard_normal((2 * R, eng.d_pad)).astype(np.float32)
    )
    st, trace = eng.run_chunk_traced(
        st, jax.random.key(3), steps=2, log_every=1, noise=noise
    )
    assert trace.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(trace)))


def test_chains_sharded_lr_sweep(flagship):
    """Round-5: per-chain lr sweeps shard over the mesh — the lr column
    travels as a shard_map operand, and the sharded sweep equals the
    unsharded one exactly under InterpretParams (RNG stubbed on both
    sides)."""
    from jax.experimental.pallas import tpu as pltpu

    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh

    prob, _ = flagship
    d = prob.dim
    n_chains, n_dev = 16, 2
    mesh = make_vi_mesh(n_mc=n_dev, devices=jax.devices()[:n_dev])
    lrs = jnp.asarray(
        np.geomspace(1e-4, 1e-2, n_chains).astype(np.float32)
    )
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y), n_chains=n_chains, n_samples=4,
        lr=lrs, optimizer="adam", interpret=pltpu.InterpretParams(),
    )
    rng = np.random.default_rng(0)
    locs = jnp.asarray(rng.normal(0, 0.2, (n_chains, d)).astype(np.float32))
    f0 = eng.init(locs, 0.1 * jnp.ones((n_chains, d), jnp.float32))
    f_plain = eng.run_chunk(f0, jax.random.key(0), steps=3)
    f_shard = eng.run_sharded(
        f0, jax.random.key(0), steps=3, mesh=mesh, axis=MC_AXIS
    )
    for a, b in zip(f_plain[:8], f_shard[:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    # distinct lrs produced distinct chains (the sweep is real)
    mus = np.asarray(f_shard.mu[:n_chains, :d])
    assert np.unique(mus.round(6), axis=0).shape[0] == n_chains
    # traced + sweep compose
    f_t, tr = eng.run_sharded(
        f0, jax.random.key(0), steps=4, mesh=mesh, axis=MC_AXIS,
        log_every=2,
    )
    assert tr.shape == (2, n_chains)


def test_chains_mixed_rule_sweep_matches_single_engines(flagship):
    """MIXED per-chain rules in one dispatch (round 5): each chain of a
    {adam, descent, dowg, dog, cocob} sweep must equal the corresponding
    single-rule engine's chain on identical injected noise — the blended
    candidates are exact, not approximate."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedADVI

    prob, _ = flagship
    d = prob.dim
    spec = logreg_spec(prob.X, prob.y)
    rules = ["adam", "descent", "dowg", "dog", "cocob", "adam", "dowg",
             "cocob"]
    C8, n_s, steps = len(rules), 4, 4
    rng = np.random.default_rng(11)
    locs = jnp.asarray(rng.normal(0, 0.2, (C8, d)).astype(np.float32))
    sds = 0.1 * jnp.ones((C8, d), jnp.float32)

    eng = FusedChainsADVI(
        spec, n_chains=C8, n_samples=n_s, lr=1e-3, optimizer=rules,
        interpret=True,
    )
    st = eng.init(locs, sds)
    assert st.ext is not None          # cocob rows present
    R = n_s * eng.c_pad
    noise = jnp.asarray(
        rng.standard_normal((steps * R, eng.d_pad)).astype(np.float32)
    )
    st = eng.run_chunk(st, jax.random.key(3), steps=steps, noise=noise)

    from advancedvi_jl_tpu.ops.pallas.fused_advi import N_PAD

    for c, rule in enumerate(rules):
        single = FusedADVI(spec, n_samples=n_s, lr=1e-3, interpret=True)
        single.algo = rule
        s0 = single.init(locs[c], sds[c])
        rows = []
        for t in range(steps):
            blk = noise[t * R : (t + 1) * R]
            per_chain = blk.reshape(n_s, eng.c_pad, eng.d_pad)[:, c, :]
            rows.append(
                jnp.zeros((N_PAD, eng.d_pad), jnp.float32).at[:n_s].set(
                    per_chain
                )
            )
        s0 = single.run_chunk(
            s0, jax.random.key(3), steps=steps, noise=jnp.concatenate(rows)
        )
        assert_allclose(
            np.asarray(st.mu[c]), np.asarray(s0.mu[0]), rtol=1e-5,
            atol=1e-6, err_msg=f"chain {c} rule {rule}",
        )
        assert_allclose(
            np.asarray(st.sig[c]), np.asarray(s0.sig[0]), rtol=1e-5,
            atol=1e-6, err_msg=f"chain {c} rule {rule}",
        )
    # padding inert
    assert np.all(np.asarray(st.sig[C8:]) == 1.0)
    assert np.all(np.asarray(st.m_mu[C8:]) == 0.0)


def test_chains_mixed_rule_validation(flagship):
    prob, _ = flagship
    spec = logreg_spec(prob.X, prob.y)
    with pytest.raises(ValueError, match="entries"):
        FusedChainsADVI(spec, n_chains=8, optimizer=["adam"] * 7)
    with pytest.raises(ValueError, match="unknown optimizers"):
        FusedChainsADVI(spec, n_chains=8, optimizer=["adam"] * 7 + ["sgd"])
    with pytest.raises(ValueError, match="prox"):
        FusedChainsADVI(
            spec, n_chains=8, optimizer=["adam"] * 8, operator="prox"
        )
    with pytest.raises(ValueError, match="lr"):
        FusedChainsADVI(
            spec, n_chains=8, optimizer=["dowg"] * 8,
            lr=jnp.ones(8) * 1e-3,
        )


def test_chains_bare_mixed_string_rejected(flagship):
    prob, _ = flagship
    spec = logreg_spec(prob.X, prob.y)
    with pytest.raises(ValueError, match="list"):
        FusedChainsADVI(spec, n_chains=8, optimizer="mixed")
