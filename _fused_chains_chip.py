"""On-chip throughput + convergence of the multi-chain fused engine.

Aggregate chain-steps/s vs chain count, against the vmapped general-path
chains baseline (BENCH_NOTES round 2: 7.94M chain-steps/s at 1024
chains) and the single-chain fused engine (~1.03M steps/s)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.ops.pallas.fused_advi import logreg_spec
from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = prob.unconstrained()
    d = prob.dim
    spec = logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                       likeadj=float(prob.likeadj))
    key = jax.random.key(123)

    steps = 20_000
    for C in (8, 32, 64, 128):
        eng = FusedChainsADVI(spec, n_chains=C, n_samples=10, lr=1e-3)
        locs = 0.3 * jax.random.normal(jax.random.key(1), (C, d))
        sds = 0.1 * jnp.ones((C, d))
        st = eng.init(locs, sds)
        run = jax.jit(lambda s, e=eng: e.run_chunk(s, key, steps=steps))
        st = run(st)
        _ = np.asarray(jax.device_get(st.elbo))
        best = 1e9
        for _ in range(5):
            t1 = time.time()
            st = run(st)
            el = np.asarray(jax.device_get(st.elbo))
            best = min(best, time.time() - t1)
        agg = C * steps / best
        el_real = el[:C]
        print(f"C={C:4d}: {steps/best:9.0f} steps/s  "
              f"aggregate {agg/1e6:7.2f}M chain-steps/s  "
              f"elbo[min,med,max]=[{el_real.min():.2f}, "
              f"{np.median(el_real):.2f}, {el_real.max():.2f}]", flush=True)

    # convergence sanity at C=64 after 120k steps: all chains near the
    # flagship posterior (general-path elbo ~ -103.7)
    eng = FusedChainsADVI(spec, n_chains=64, n_samples=10, lr=1e-3)
    locs = 0.5 * jax.random.normal(jax.random.key(2), (64, d))
    st = eng.init(locs, 0.1 * jnp.ones((64, d)))
    run = jax.jit(lambda s: eng.run_chunk(s, key, steps=30_000))
    for _ in range(4):
        st = run(st)
    el = np.asarray(jax.device_get(st.elbo))[:64]
    qs = eng.q(st)
    loc_spread = float(jnp.max(jnp.std(qs.location, axis=0)))
    print(f"convergence C=64 @120k: elbo range [{el.min():.3f}, "
          f"{el.max():.3f}]  max per-dim loc std across chains "
          f"{loc_spread:.4f}", flush=True)


if __name__ == "__main__":
    main()
