"""Round-5 chip session 11: wide-n_samples kernels on hardware (new
sample-block shapes) — n=48 single-chain, n=64 throughput scaling, n=32
chains under the joint budget."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.time()
    print(f"device: {jax.devices()[0]}", flush=True)
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedADVI, logreg_spec
    from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI

    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = prob.dim
    key = jax.random.key(0)
    spec = logreg_spec(prob.X, prob.y)

    for n_s in (10, 48, 128):
        eng = FusedADVI(spec, n_samples=n_s, lr=1e-3)
        st = eng.init(jnp.zeros(d), 0.1 * jnp.ones(d))
        run = jax.jit(lambda s, e=eng: e.run_chunk(s, key, steps=20_000))
        st = run(st)
        e = float(jax.device_get(st.elbo))
        t1 = time.time()
        st = run(st)
        e = float(jax.device_get(st.elbo))
        sps = 20_000 / (time.time() - t1)
        print(f"RESULT n_samples={n_s}: {sps/1e3:.1f}k steps/s, "
              f"elbo {e:.2f} finite={np.isfinite(e)}", flush=True)

    eng_c = FusedChainsADVI(spec, n_chains=32, n_samples=32, lr=1e-3)
    rng = np.random.default_rng(0)
    st_c = eng_c.init(
        jnp.asarray(rng.normal(0, .3, (32, d)).astype(np.float32)),
        0.1 * jnp.ones((32, d), jnp.float32))
    run_c = jax.jit(lambda s: eng_c.run_chunk(s, jax.random.key(7),
                                              steps=10_000))
    st_c = run_c(st_c)
    _ = float(jax.device_get(st_c.elbo[0]))
    t1 = time.time()
    st_c = run_c(st_c)
    el = np.asarray(jax.device_get(st_c.elbo[:32]))
    agg = 32 * 10_000 / (time.time() - t1)
    print(f"RESULT chains C=32 n_samples=32: {agg/1e6:.2f}M "
          f"chain-steps/s, finite {np.isfinite(el).sum()}/32, "
          f"median {np.median(el):.2f}", flush=True)
    print(f"CHIP SESSION 11 COMPLETE in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
