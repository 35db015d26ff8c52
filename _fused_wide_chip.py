"""On-chip throughput + convergence of the wide (d > 128) mean-field
fused engines vs the general path."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.ops.pallas.fused_advi import (
    FusedADVI,
    gaussian_spec,
    logreg_spec,
)
from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI


def time_run(run, f, steps, reps=6, get=lambda f: f.elbo):
    f = run(f)
    _ = np.asarray(jax.device_get(get(f)))
    best = 1e9
    for _ in range(reps):
        t1 = time.time()
        f = run(f)
        e = np.asarray(jax.device_get(get(f)))
        best = min(best, time.time() - t1)
    return f, steps / best, e


def gen_steps_per_s(alg, state, n=20_000):
    @jax.jit
    def chunk(s):
        def body(c, _):
            st, _ = c
            s2, info = alg.step(st)
            return (s2, info["elbo"]), None

        (s2, el), _ = jax.lax.scan(
            body, (s, jnp.zeros(())), None, length=n, unroll=8
        )
        return s2, el

    state, el = chunk(state)
    _ = float(jax.device_get(el))
    best = 1e9
    for _ in range(4):
        t1 = time.time()
        state, el = chunk(state)
        e = float(jax.device_get(el))
        best = min(best, time.time() - t1)
    return n / best, e


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    key = jax.random.key(123)

    # --- d=512 diagonal gaussian (analytic optimum) ---
    d = 512
    mean = jax.random.normal(jax.random.key(1), (d,))
    std = jnp.exp(0.3 * jax.random.normal(jax.random.key(2), (d,)))
    eng = FusedADVI(gaussian_spec(mean, std), n_samples=10, lr=1e-2)
    assert eng.d_pad == 512
    st = eng.init(jnp.zeros(d), 0.1 * jnp.ones(d))
    run = jax.jit(lambda s: eng.run_chunk(s, key, steps=20_000))
    st, sps, e = time_run(run, st, 20_000)
    q = eng.q(st)
    loc_err = float(jnp.max(jnp.abs(q.location - mean)))
    sd_err = float(jnp.max(jnp.abs(q.scale_diag - std)))
    print(f"fused mf gaussian d=512: {sps:.0f} steps/s  elbo={float(e):.4f}"
          f"  loc_err={loc_err:.4f} sd_err={sd_err:.4f}", flush=True)

    from advancedvi_jl_tpu.models.normal import NormalTarget  # noqa: F401

    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=10, optimizer=optax.adam(1e-2),
        operator=avt.ClipScale(),
    )
    # general path on the same diagonal gaussian via a callable target
    inv_var = 1.0 / (std * std)

    def logdens(z, data=None):
        return -0.5 * jnp.sum((z - mean) ** 2 * inv_var)

    tgt = avt.fn_target(logdens, dim=d)
    state = alg.init(jax.random.key(0, impl="rbg"),
                     avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d)),
                     tgt)
    gsps, ge = gen_steps_per_s(alg, state)
    print(f"general mf gaussian d=512: {gsps:.0f} steps/s  elbo={ge:.4f}  "
          f"fused speedup {sps/gsps:.2f}x", flush=True)

    # --- wide logreg d=200 ---
    prob = make_logreg(jax.random.key(4), n_data=512, n_features=198)
    dw = prob.dim
    engw = FusedADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=10, lr=1e-3,
    )
    assert engw.d_pad == 256
    stw = engw.init(jnp.zeros(dw), 0.1 * jnp.ones(dw))
    runw = jax.jit(lambda s: engw.run_chunk(s, key, steps=20_000))
    stw, spsw, ew = time_run(runw, stw, 20_000)
    print(f"fused mf logreg d=200 (n_data=512): {spsw:.0f} steps/s  "
          f"elbo={float(ew):.3f}", flush=True)
    algw = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=10, optimizer=optax.adam(1e-3),
        operator=avt.ClipScale(),
    )
    statew = algw.init(jax.random.key(0, impl="rbg"),
                       avt.MeanFieldGaussian(jnp.zeros(dw),
                                             0.1 * jnp.ones(dw)),
                       prob.unconstrained())
    gspsw, gew = gen_steps_per_s(algw, statew)
    print(f"general mf logreg d=200: {gspsw:.0f} steps/s  elbo={gew:.3f}  "
          f"fused speedup {spsw/gspsw:.2f}x", flush=True)

    # --- wide chains: 32 chains x d=512 ---
    engc = FusedChainsADVI(gaussian_spec(mean, std), n_chains=32,
                           n_samples=10, lr=1e-2)
    stc = engc.init(
        0.3 * jax.random.normal(jax.random.key(5), (32, d)),
        0.1 * jnp.ones((32, d)),
    )
    runc = jax.jit(lambda s: engc.run_chunk(s, key, steps=10_000))
    stc, spsc, ec = time_run(runc, stc, 10_000,
                             get=lambda f: f.elbo)
    print(f"fused chains C=32 d=512: {spsc:.0f} steps/s  aggregate "
          f"{32*spsc/1e6:.2f}M chain-steps/s  elbo[0]={float(ec[0]):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
