"""Round-5 chip session 8: A/B the double-buffered DMA prefetch against
the synchronous streamed minibatch at n=500k (baselines: sync 396-402k
steps/s, resident 568-579k)."""

import time

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, flush=True)


def main():
    t00 = time.time()
    log(f"device: {jax.devices()[0]}")
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        FusedADVI,
        logreg_minibatch_hbm_spec,
        logreg_minibatch_spec,
    )

    key = jax.random.key(0)
    n_big, pb = 500_000, 60
    Xb = jax.random.normal(jax.random.key(21), (n_big, pb), jnp.float32)
    beta_true = jax.random.normal(jax.random.key(22), (pb,)) * 0.5
    yb = (
        jax.random.uniform(jax.random.key(23), (n_big,))
        < jax.nn.sigmoid(Xb @ beta_true)
    ).astype(jnp.float32)

    results = {}
    for name, spec in (
        ("prefetch", logreg_minibatch_hbm_spec(Xb, yb, batch_size=512)),
        ("sync", logreg_minibatch_hbm_spec(Xb, yb, batch_size=512,
                                           prefetch=False)),
        ("resident-20k", logreg_minibatch_spec(Xb[:20_480], yb[:20_480],
                                               512)),
    ):
        try:
            eng = FusedADVI(spec, n_samples=10, lr=1e-3)
            st = eng.init(jnp.zeros(pb + 1), 0.1 * jnp.ones(pb + 1))
            run = jax.jit(lambda s, e=eng: e.run_chunk(s, key, steps=20_000))
            t0 = time.time()
            st = run(st)
            e = float(jax.device_get(st.elbo))
            tc = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                st = run(st)
                e = float(jax.device_get(st.elbo))
                times.append(time.time() - t0)
            sps = 20_000 / min(times)
            results[name] = sps
            log(
                f"RESULT {name}: compile {tc:.1f}s, {sps/1e3:.1f}k "
                f"steps/s, elbo {e:.1f}"
            )
        except Exception as exc:
            log(f"RESULT {name}: FAILED {repr(exc)[:250]}")
    if "prefetch" in results and "sync" in results:
        log(
            f"RESULT prefetch speedup over sync: "
            f"{results['prefetch']/results['sync']:.2f}x; vs resident "
            f"{results.get('resident-20k', 0)/max(results['prefetch'],1e-9):.2f}x cost"
        )
    log(f"CHIP SESSION 8 COMPLETE in {time.time()-t00:.1f}s")


if __name__ == "__main__":
    main()
