"""Round-5 chip session 6: (1) A/B the DMA-overlap restructure of the
HBM-streamed minibatch step (baseline session 1: 396.1k steps/s at
n=500k, resident 567.9k); (2) re-run the FULL RNG statistical validation
— the stream changed to per-step reseeding (step-indexed), so the r4
statistics no longer certify it; (3) the round-5 showcase example
end-to-end (ppl model fused via ad_spec + streamed 500k logreg through
the optimize driver, real on-chip RNG)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    t00 = time.time()
    log(f"device: {jax.devices()[0]}")

    import advancedvi_jl_tpu as avt
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        FusedADVI,
        logreg_minibatch_hbm_spec,
        logreg_minibatch_spec,
    )

    key = jax.random.key(0)

    # ---- 1. streamed minibatch with DMA overlap ------------------------
    try:
        n_big, pb = 500_000, 60
        Xb = jax.random.normal(jax.random.key(21), (n_big, pb), jnp.float32)
        beta_true = jax.random.normal(jax.random.key(22), (pb,)) * 0.5
        yb = (
            jax.random.uniform(jax.random.key(23), (n_big,))
            < jax.nn.sigmoid(Xb @ beta_true)
        ).astype(jnp.float32)
        spec_h = logreg_minibatch_hbm_spec(Xb, yb, batch_size=512)
        engh = FusedADVI(spec_h, n_samples=10, lr=1e-3)
        sth = engh.init(jnp.zeros(pb + 1), 0.1 * jnp.ones(pb + 1))
        runh = jax.jit(lambda s: engh.run_chunk(s, key, steps=20_000))
        t0 = time.time()
        sth = runh(sth)
        eh = float(jax.device_get(sth.elbo))
        tc = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            sth = runh(sth)
            eh = float(jax.device_get(sth.elbo))
            times.append(time.time() - t0)
        sps_h = 20_000 / min(times)
        log(
            f"RESULT streamed n=500k B=512 (DMA overlap): compile "
            f"{tc:.1f}s, {sps_h/1e3:.1f}k steps/s, elbo {eh:.1f} "
            f"(pre-overlap baseline 396.1k; resident 567.9k)"
        )
        # resident at same B for the same-session ratio
        spec_r = logreg_minibatch_spec(Xb[:20_480], yb[:20_480], 512)
        engr = FusedADVI(spec_r, n_samples=10, lr=1e-3)
        str_ = engr.init(jnp.zeros(pb + 1), 0.1 * jnp.ones(pb + 1))
        runr = jax.jit(lambda s: engr.run_chunk(s, key, steps=20_000))
        str_ = runr(str_)
        _ = float(jax.device_get(str_.elbo))
        t0 = time.time()
        str_ = runr(str_)
        _ = float(jax.device_get(str_.elbo))
        sps_r = 20_000 / (time.time() - t0)
        log(
            f"RESULT resident n=20k B=512 (same session): "
            f"{sps_r/1e3:.1f}k steps/s — streaming cost now "
            f"{sps_r/max(sps_h, 1e-9):.2f}x (was 1.43x)"
        )
    except Exception as exc:
        log(f"SECTION 1 FAILED: {repr(exc)[:300]}")

    # ---- 2. full RNG statistical validation (step-indexed stream) ------
    try:
        import _rng_validation

        log("--- _rng_validation.py (step-indexed stream) ---")
        _rng_validation.main()
    except SystemExit as se:
        log(f"rng validation exited rc={se.code}")
    except Exception as exc:
        log(f"SECTION 2 FAILED: {repr(exc)[:300]}")

    # ---- 3. showcase example end-to-end (real RNG, optimize driver) ----
    try:
        import advancedvi_jl_tpu.ppl as ppl

        rng = np.random.default_rng(0)
        n, p = 512, 8
        Xp = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
        w_true = jnp.asarray(rng.normal(size=p).astype(np.float32))
        yp = jnp.asarray(
            (rng.random(n) < jax.nn.sigmoid(Xp @ w_true)).astype(np.float32)
        )

        def model(data):
            sigma = ppl.sample("sigma", ppl.LogNormal(0.0, 1.0))
            beta = ppl.sample("beta", ppl.Normal(jnp.zeros(p), sigma))
            logits = data["X"] @ beta
            ppl.sample("y", ppl.Bernoulli(logits=logits), obs=data["y"])

        m = ppl.ingest(model, data={"X": Xp, "y": yp})
        spec = avt.fused_spec_for(m.target)
        eng = avt.FusedADVI(spec, n_samples=10, lr=5e-3)
        t0 = time.time()
        q, infos, _ = eng.optimize(
            jax.random.key(0), 60_000, m.q_init(), log_every=10_000
        )
        beta_hat = m.constrain(np.asarray(q.location))["beta"]
        err = float(jnp.linalg.norm(beta_hat - w_true))
        log(
            f"RESULT ppl-fused optimize 60k steps: {time.time()-t0:.1f}s, "
            f"final elbo {infos[-1]['elbo']:.2f}, beta err {err:.3f}"
        )

        spec3 = avt.logreg_minibatch_hbm_spec(
            Xb, yb, batch_size=512, key=jax.random.key(4)
        )
        eng3 = avt.FusedADVI(spec3, n_samples=10, lr=1e-3)
        t0 = time.time()
        q3, infos3, _ = eng3.optimize(
            jax.random.key(5), 60_000,
            avt.MeanFieldGaussian(jnp.zeros(61), 0.1 * jnp.ones(61)),
            log_every=10_000,
        )
        err3 = float(jnp.linalg.norm(q3.location[:60] - beta_true))
        log(
            f"RESULT streamed-500k optimize 60k steps: "
            f"{time.time()-t0:.1f}s, final elbo {infos3[-1]['elbo']:.1f}, "
            f"beta err {err3:.3f} (reshuffles between chunks)"
        )
    except Exception as exc:
        log(f"SECTION 3 FAILED: {repr(exc)[:300]}")

    log(f"CHIP SESSION 6 COMPLETE in {time.time()-t00:.1f}s")


if __name__ == "__main__":
    main()
