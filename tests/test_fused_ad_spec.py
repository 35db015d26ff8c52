"""AD-derived fused model specs (ops/pallas/fused_advi.ad_spec).

VERDICT r4 #1: the fused engines were hand-derived-gradient-only (3
registered models).  ``ad_spec`` makes them model-generic the way the
reference's hot loop is (AD serves any model, repgradelbo.jl:142-149):
``jax.vmap(jax.value_and_grad(log_density))`` is traced INSIDE the Pallas
kernel, so the in-kernel gradient is the general path's own AD math.

Pinning strategy (interpret mode, noise injection — as test_fused_advi):

- exactness: AD spec == hand spec bit-for-bit on the same target
  (same kernel, same injected noise, only the gradient derivation differs);
- generality: targets with NO hand spec (a ppl.ingest'd model, a raw
  jnp log-density via from_log_density) match the general alg.step path;
- composition: the same AD specs drive the full-rank engine and the
  multi-chain kernel unchanged.

Hardware lowering of the AD-spec jaxpr is chip-validated separately
(_round5_chip3.py session 5 / BENCH_NOTES "Round 5") — interpret mode cannot prove
Mosaic lowering.
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
    FULLRANK,
    N_PAD,
    FusedADVI,
    FusedModelSpec,
    ad_spec,
    gaussian_spec,
    normallognormal_spec,
)

T = 4
N_SAMPLES = 8


def _pack_noise(draws, d_pad):
    noise = np.zeros((len(draws) * N_PAD, d_pad), np.float32)
    for t, u in enumerate(draws):
        noise[t * N_PAD : t * N_PAD + u.shape[0], : u.shape[1]] = u
    return jnp.asarray(noise)


def _run_general(target, q0, steps, n_samples=N_SAMPLES):
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=n_samples,
        optimizer=optax.adam(1e-3),
        operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    step = jax.jit(alg.step)
    draws, infos = [], []
    for _ in range(steps):
        step_key = jax.random.fold_in(state.key, state.iteration)
        _, u = state.q.sample_with_base(step_key, n_samples)
        draws.append(np.asarray(u))
        state, info = step(state)
        infos.append(info)
    return alg, state, draws, infos


def _fused_states(spec, q0, draws, **eng_kw):
    eng = FusedADVI(spec, n_samples=N_SAMPLES, lr=1e-3, interpret=True,
                    **eng_kw)
    if eng.family == FULLRANK:
        st = eng.init(q0.location, q0.scale_matrix())
    else:
        st = eng.init(q0.location, q0.scale_diag)
    st = eng.run_chunk(
        st, jax.random.key(1), steps=len(draws),
        noise=_pack_noise(draws, eng.d_pad),
    )
    return eng, st


def test_ad_spec_bitwise_matches_hand_spec():
    """Same kernel, same noise, gradient from in-kernel AD instead of the
    hand derivation: states must agree to float roundoff."""
    nln, _, _ = make_normallognormal(jax.random.key(1), 6)
    target = nln.unconstrained()
    d = 7
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    _, _, draws, _ = _run_general(target, q0, T)

    _, st_hand = _fused_states(normallognormal_spec(nln), q0, draws)
    spec_ad = ad_spec(target)
    assert spec_ad.dim == d
    _, st_ad = _fused_states(spec_ad, q0, draws)
    for a, b in zip(st_hand[:8], st_ad[:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7)
    assert_allclose(float(st_hand.elbo), float(st_ad.elbo), rtol=1e-5)


def test_ad_spec_logreg_matches_general_path():
    """The flagship target through ad_spec (no hand gradient) pins against
    alg.step with injected noise."""
    prob = make_logreg(jax.random.key(11), n_data=64, n_features=12)
    target = prob.unconstrained()
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    alg, state, draws, infos = _run_general(target, q0, T)

    _, st = _fused_states(ad_spec(target), q0, draws)
    assert_allclose(st.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(st.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6)
    assert_allclose(
        float(st.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )
    # padding stayed inert (the AD transpose zero-pads the gradient)
    assert np.all(np.asarray(st.sig[0, d:]) == 1.0)
    assert np.all(np.asarray(st.m_mu[0, d:]) == 0.0)


def test_ad_spec_ppl_ingested_model_runs_fused():
    """A ppl.ingest'd model (LogNormal scale + Normal weights + Bernoulli
    likelihood, softplus/identity transforms) runs fused via ad_spec with
    general-path parity — the reference bar: any model in the hot loop."""
    import advancedvi_jl_tpu.ppl as ppl

    rng = np.random.default_rng(5)
    n, p = 48, 4
    X = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
    y = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))

    def model(data):
        sigma = ppl.sample("sigma", ppl.LogNormal(0.0, 1.0))
        beta = ppl.sample("beta", ppl.Normal(jnp.zeros(p), sigma))
        logits = data["X"] @ beta
        ppl.sample("y", ppl.Bernoulli(logits=logits), obs=data["y"])

    m = ppl.ingest(model, data={"X": X, "y": y})
    d = m.dim
    q0 = m.q_init()
    alg, state, draws, infos = _run_general(m.target, q0, T)

    spec = avt.fused_spec_for(m.target)   # falls back to ad_spec
    _, st = _fused_states(spec, q0, draws)
    assert_allclose(st.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(st.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6)
    assert_allclose(
        float(st.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_from_log_density_custom_target():
    """A raw jnp log-density with NO model class anywhere: the
    hand-spec-free custom-target path of VERDICT r4 #1."""
    d = 5
    anchor = jnp.asarray(np.linspace(-1.0, 1.0, d), jnp.float32)

    def logp(theta, data):
        r = theta - data["anchor"]
        # anisotropic quartic well: no hand spec exists for this
        return -jnp.sum(r * r * data["w"]) - 0.1 * jnp.sum(r ** 4)

    data = {"anchor": anchor, "w": jnp.arange(1.0, d + 1.0)}
    target = avt.fn_target(lambda t, dat: logp(t, dat), d, data=data)
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    alg, state, draws, infos = _run_general(target, q0, T)

    spec = FusedModelSpec.from_log_density(logp, d, data=data)
    _, st = _fused_states(spec, q0, draws)
    assert_allclose(st.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)
    assert_allclose(st.sig[0, :d], state.q.scale_diag, rtol=1e-5, atol=1e-6)
    assert_allclose(
        float(st.elbo), float(infos[-1]["elbo"]), rtol=1e-4, atol=1e-4
    )


def test_ad_spec_fullrank_engine():
    """AD specs drive the full-rank engine unchanged (bitwise vs the hand
    spec on the same dense-Gaussian target)."""
    nln, _, _ = make_normallognormal(jax.random.key(2), 4)
    target = nln.unconstrained()
    d = 5
    q0 = avt.FullRankGaussian(jnp.zeros(d), 0.1 * jnp.eye(d))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=N_SAMPLES,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0), q0, target)
    step = jax.jit(alg.step)
    draws = []
    for _ in range(T):
        step_key = jax.random.fold_in(state.key, state.iteration)
        _, u = state.q.sample_with_base(step_key, N_SAMPLES)
        draws.append(np.asarray(u))
        state, _ = step(state)

    _, st_hand = _fused_states(
        normallognormal_spec(nln), q0, draws, family=FULLRANK
    )
    _, st_ad = _fused_states(ad_spec(target), q0, draws, family=FULLRANK)
    for a, b in zip(st_hand[:8], st_ad[:8]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7)
    assert_allclose(st_ad.mu[0, :d], state.q.location, rtol=1e-5, atol=1e-6)


def test_ad_spec_drives_chains_kernel():
    """The shared model registry means the multi-chain kernel takes AD
    specs with zero changes: per-chain parity vs the single-chain engine
    on identical injected noise."""
    from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI

    prob = make_logreg(jax.random.key(7), n_data=32, n_features=6)
    target = prob.unconstrained()
    d = prob.dim
    spec = ad_spec(target)
    C = 8
    locs = 0.2 * jax.random.normal(jax.random.key(1), (C, d))
    sds = 0.1 * jnp.ones((C, d))
    eng = FusedChainsADVI(
        spec, n_chains=C, n_samples=4, lr=1e-3, interpret=True
    )
    st = eng.init(locs, sds)
    R = 4 * eng.c_pad
    noise = jax.random.normal(jax.random.key(2), (2 * R, eng.d_pad))
    st = eng.run_chunk(st, jax.random.key(3), steps=2, noise=noise)

    # chain 0 == single-chain engine fed chain 0's noise rows
    single = FusedADVI(spec, n_samples=4, lr=1e-3, interpret=True)
    st0 = single.init(locs[0], sds[0])
    rows = []
    for t in range(2):
        blk = noise[t * R : (t + 1) * R]
        per_chain = blk.reshape(4, eng.c_pad, eng.d_pad)[:, 0, :]
        pad = jnp.zeros((N_PAD, eng.d_pad), jnp.float32).at[:4].set(per_chain)
        rows.append(pad)
    st0 = single.run_chunk(
        st0, jax.random.key(3), steps=2, noise=jnp.concatenate(rows)
    )
    assert_allclose(
        np.asarray(st.mu[0, :d]), np.asarray(st0.mu[0, :d]),
        rtol=1e-5, atol=1e-6,
    )


def test_ad_spec_validation():
    from advancedvi_jl_tpu.core.problem import CustomGradTarget

    oracle = CustomGradTarget(
        data=None,
        value_fn=lambda t, _: -jnp.sum(t * t),
        value_and_grad_fn=lambda t, _: (-jnp.sum(t * t), -2 * t),
        dim=3,
    )
    with pytest.raises(ValueError, match="order"):
        ad_spec(oracle)


def test_transpose_folding_is_identity_and_transpose_free():
    """_eval_transpose_folded is semantically the identity AND leaves no
    transpose ops in the graphs vmap/AD produce for row-wise densities —
    the Mosaic i1-mask-transpose workaround (chip sessions 1-4)."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        _eval_transpose_folded,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(13, 6)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(13,)).astype(np.float32))

    def f(t):
        logits = X @ t
        return jnp.sum(y * logits - jax.nn.softplus(logits)) - jnp.sum(
            t ** 2
        )

    vag = jax.vmap(jax.value_and_grad(f))
    z = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    closed = jax.make_jaxpr(vag)(z)
    XT = jnp.transpose(X)
    pre_t = {id(c): jnp.transpose(c) for c in closed.consts
             if getattr(c, "ndim", 0) == 2}

    got_v, got_g = _eval_transpose_folded(
        closed, closed.consts, z, pre_t=pre_t
    )
    want_v, want_g = vag(z)
    assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-5,
                    atol=1e-6)
    assert_allclose(np.asarray(got_g), np.asarray(want_g), rtol=1e-5,
                    atol=1e-6)

    # the rewrite's hardware invariant: NO bool transposes survive (the
    # `tpu.transpose : i1` legalization failure, chip sessions 1-4), and
    # foldable f32 transposes are strictly reduced
    def count_transposes(jx, dtype=None):
        n = 0
        for eq in jx.eqns:
            if eq.primitive.name == "transpose" and (
                dtype is None or eq.invars[0].aval.dtype == dtype
            ):
                n += 1
            for key in ("jaxpr", "call_jaxpr"):
                sub = eq.params.get(key)
                if sub is not None:
                    n += count_transposes(
                        getattr(sub, "jaxpr", sub), dtype
                    )
        return n

    import jax.numpy as _jnp

    assert count_transposes(closed.jaxpr, _jnp.bool_) >= 1  # vmap injected
    rewritten = jax.make_jaxpr(
        lambda zz: _eval_transpose_folded(
            closed, closed.consts, zz, pre_t=pre_t
        )
    )(z)
    assert count_transposes(rewritten.jaxpr, _jnp.bool_) == 0, rewritten
    assert count_transposes(rewritten.jaxpr) <= count_transposes(
        closed.jaxpr
    )

    # identity also without pre_t (pure folding)
    got_v2, got_g2 = _eval_transpose_folded(closed, closed.consts, z)
    assert_allclose(np.asarray(got_v2), np.asarray(want_v), rtol=1e-5,
                    atol=1e-6)
    assert_allclose(np.asarray(got_g2), np.asarray(want_g), rtol=1e-5,
                    atol=1e-6)


def test_transpose_folding_batched_dot_not_swapped():
    """Review finding r5: swapping lhs/rhs of a BATCHED dot does not
    transpose its output (batch dims stay leading), so the swap rewrite
    must skip batched dots.  Asymmetric shapes (rows=4 != m=5) would
    shape-error or silently transpose under the unguarded rewrite."""
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        _eval_transpose_folded,
    )

    rng = np.random.default_rng(3)
    m, k = 5, 3

    def f(t):
        # theta-dependent per-row matrix-vector product: under vmap BOTH
        # operands are batched
        W = t[: m * k].reshape(m, k)
        v = t[m * k : m * k + k]
        y = W @ v
        return jnp.sum(y * y) + jnp.sum(jnp.tanh(W).T @ y)

    d = m * k + k
    vag = jax.vmap(jax.value_and_grad(f))
    z = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    closed = jax.make_jaxpr(vag)(z)
    got_v, got_g = _eval_transpose_folded(closed, closed.consts, z)
    want_v, want_g = vag(z)
    assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-5,
                    atol=1e-5)
    assert_allclose(np.asarray(got_g), np.asarray(want_g), rtol=1e-5,
                    atol=1e-5)
