"""On-chip validation: (1) the pl.when-free traced-kernel compile time
(the old conditional-store variant took ~19 min of Mosaic compile; the
unconditional-store replacement must be back in the tens of seconds),
(2) the in-kernel minibatch engine (lax.rem window schedule + pl.ds slab
loads) on the large-n logreg BASELINE config, vs the general subsampled
path."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg


def main():
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- 1. traced-kernel compile time (new store design) ---
    lg = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = lg.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    eng = avt.FusedLogRegADVI(lg.X, lg.y, n_samples=10, lr=1e-3)
    st = eng.init(q0.location, q0.scale_diag)
    key = jax.random.key(1)
    t0 = time.time()
    run = jax.jit(lambda s: eng.run_chunk_traced(s, key, 50_000, 1_000))
    st, tr = run(st)
    _ = float(jax.device_get(st.elbo))
    print(f"traced compile+warmup: {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        st, tr = run(st)
        _ = float(jax.device_get(st.elbo))
        best = min(best, time.time() - t0)
    tr = np.asarray(jax.device_get(tr))
    assert tr.shape == (50,) and np.isfinite(tr).all(), tr
    print(
        f"traced 50k chunk: {50_000/best:.0f} steps/s; "
        f"trace [{tr[0]:.2f} .. {tr[-1]:.2f}]",
        flush=True,
    )

    # --- 2. in-kernel minibatch engine, large-n logreg ---
    N, B = 16_384, 512
    big = make_logreg(jax.random.key(21), n_data=N, n_features=60)
    db = big.X.shape[1]
    dd = big.dim
    q0b = avt.MeanFieldGaussian(jnp.zeros(dd), 0.1 * jnp.ones(dd))

    spec = avt.logreg_minibatch_spec(
        big.X, big.y, batch_size=B, key=jax.random.key(3)
    )
    engb = avt.FusedADVI(spec, n_samples=10, lr=1e-3)
    stb = engb.init(q0b.location, q0b.scale_diag)
    t0 = time.time()
    runb = jax.jit(lambda s: engb.run_chunk(s, key, 20_000))
    stb = runb(stb)
    e0 = float(jax.device_get(stb.elbo))
    print(f"minibatch compile+warmup: {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        stb = runb(stb)
        eb = float(jax.device_get(stb.elbo))
        best = min(best, time.time() - t0)
    fused_sps = 20_000 / best
    assert np.isfinite(eb)
    print(
        f"fused minibatch (N=16384, B=512): {fused_sps:.0f} steps/s, "
        f"elbo {e0:.1f} -> {eb:.1f}",
        flush=True,
    )

    # general subsampled path, same workload
    sub = avt.ReshufflingBatchSubsampling(n_data=N, batchsize=B)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=10, subsampling=sub,
        optimizer=optax.adam(1e-3), operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0, impl="rbg"), q0b, big.unconstrained())

    @jax.jit
    def chunk(s):
        def body(c, _):
            s2, info = alg.step(c[0])
            return (s2, info["elbo"]), None

        (s2, el), _ = jax.lax.scan(
            body, (s, jnp.zeros(())), None, length=5_000, unroll=4
        )
        return s2, el

    state, el = chunk(state)
    _ = float(jax.device_get(el))
    best_g = 1e9
    for _ in range(3):
        t0 = time.time()
        state, el = chunk(state)
        eg = float(jax.device_get(el))
        best_g = min(best_g, time.time() - t0)
    gen_sps = 5_000 / best_g
    print(
        f"general subsampled path: {gen_sps:.0f} steps/s (elbo {eg:.1f}) "
        f"-> fused speedup {fused_sps/gen_sps:.2f}x",
        flush=True,
    )

    # posterior agreement between the two (both converged at this horizon)
    q_f = engb.q(stb)
    q_g = alg.output(state)
    dloc = float(jnp.max(jnp.abs(q_f.location - q_g.location)))
    e_f = -float(alg.estimate_objective(
        jax.random.key(9), q_f, big.unconstrained(), 4096
    ))
    e_g = -float(alg.estimate_objective(
        jax.random.key(9), q_g, big.unconstrained(), 4096
    ))
    print(
        f"posterior: max|dloc|={dloc:.4f}; eval ELBO fused={e_f:.3f} "
        f"general={e_g:.3f}",
        flush=True,
    )
    print("MINIBATCH CHIP VALIDATION DONE", flush=True)


if __name__ == "__main__":
    main()
