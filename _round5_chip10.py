"""Round-5 chip session 10: post-refactor smoke — the shared-helper
kernels compile and reproduce the known numbers (headline fused chunk,
mixed-rule sweep, streamed prefetch)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.time()
    print(f"device: {jax.devices()[0]}", flush=True)
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        FusedADVI,
        FusedLogRegADVI,
        logreg_minibatch_hbm_spec,
        logreg_spec,
    )
    from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI

    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = prob.dim
    key = jax.random.key(0)

    eng = FusedLogRegADVI(prob.X, prob.y, n_samples=10, lr=1e-3)
    st = eng.init(jnp.zeros(d), 0.1 * jnp.ones(d))
    run = jax.jit(lambda s: eng.run_chunk(s, key, steps=50_000))
    tc0 = time.time()
    st = run(st)
    e = float(jax.device_get(st.elbo))
    print(f"warmup {time.time()-tc0:.1f}s", flush=True)
    t1 = time.time()
    st = run(st)
    e = float(jax.device_get(st.elbo))
    print(f"RESULT fused headline: {50_000/(time.time()-t1)/1e3:.1f}k "
          f"steps/s, elbo {e:.2f} (want ~-102.7, 930-960k)", flush=True)

    rules = ["adam", "descent", "dowg", "dog", "cocob"] * 8
    engc = FusedChainsADVI(logreg_spec(prob.X, prob.y), n_chains=40,
                           n_samples=10, lr=jnp.full((40,), 1e-3),
                           optimizer=rules)
    rng = np.random.default_rng(0)
    stc = engc.init(jnp.asarray(rng.normal(0, .3, (40, d)).astype(np.float32)),
                    0.1 * jnp.ones((40, d), jnp.float32))
    runc = jax.jit(lambda s: engc.run_chunk(s, jax.random.key(7), steps=30_000))
    stc = runc(stc)
    _ = float(jax.device_get(stc.elbo[0]))
    t1 = time.time()
    stc = runc(stc)
    el = np.asarray(jax.device_get(stc.elbo[:40]))
    print(f"RESULT mixed sweep: {40*30_000/(time.time()-t1)/1e6:.2f}M "
          f"chain-steps/s, finite {np.isfinite(el).sum()}/40, "
          f"adam median {np.median(el[0::5]):.2f}", flush=True)

    n_big, pb = 500_000, 60
    Xb = jax.random.normal(jax.random.key(21), (n_big, pb), jnp.float32)
    yb = (jax.random.uniform(jax.random.key(23), (n_big,)) < 0.5).astype(jnp.float32)
    spec_h = logreg_minibatch_hbm_spec(Xb, yb, batch_size=512)
    engh = FusedADVI(spec_h, n_samples=10, lr=1e-3)
    sth = engh.init(jnp.zeros(pb + 1), 0.1 * jnp.ones(pb + 1))
    runh = jax.jit(lambda s: engh.run_chunk(s, key, steps=20_000))
    sth = runh(sth)
    _ = float(jax.device_get(sth.elbo))
    t1 = time.time()
    sth = runh(sth)
    eh = float(jax.device_get(sth.elbo))
    print(f"RESULT streamed prefetch: {20_000/(time.time()-t1)/1e3:.1f}k "
          f"steps/s (want ~525k), elbo finite {np.isfinite(eh)}", flush=True)
    print(f"CHIP SESSION 10 COMPLETE in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
