"""Round-5 on-chip validation batch (run on the real TPU, ONE process).

Sections ordered most-critical-first; each is failure-isolated and prints
one result line immediately (stdout, flushed), so a later wedge cannot
lose earlier evidence.  Results are transcribed into BENCH_NOTES
"Round 5".

Covers (VERDICT r4 items in parens):
  1. fused throughput with the STEP-INDEXED RNG stream (#3's cost check)
     vs the r4 band, incl. the general-path number for the perf gate.
  2. bitwise checkpoint-resume in RNG mode, single-chain + chains (#3).
  3. AD-derived specs lower under Mosaic and run at speed: logreg ad_spec
     vs hand spec, a ppl.ingest'd model, from_log_density (#1).
  4. blocked full-rank back-substitution at d=256 and d=512: compile
     time, steps/s, finite (#2).
  5. HBM-streamed minibatch at n=500k rows: steps/s vs the resident spec
     at n=20k (#5).
  6. chains TRACED kernel on hardware (new grid kernel + the
     (c_pad,1)->(1,c_pad) reshape store) + divergence channel (#6).
  7. in-kernel DoG and COCOB on chip, single-chain + chains (#9).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, flush=True)


def section(name):
    log(f"--- {name} ---")


def main():
    t00 = time.time()
    dev = jax.devices()[0]
    log(f"device: {dev}")

    import advancedvi_jl_tpu as avt
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        FULLRANK,
        FusedADVI,
        FusedLogRegADVI,
        FusedProxADVI,
        FusedScoreGradVI,
        ad_spec,
        logreg_minibatch_hbm_spec,
        logreg_minibatch_spec,
        logreg_spec,
        mvnormal_spec,
    )
    from advancedvi_jl_tpu.ops.pallas.fused_chains import (
        FusedChainsADVI,
        first_chain_divergence,
    )

    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = prob.dim
    q0_loc = jnp.zeros(d)
    q0_sd = 0.1 * jnp.ones(d)
    key = jax.random.key(0)

    # ---- 1. fused throughput, step-indexed stream --------------------
    try:
        section("1 fused throughput (step-indexed RNG)")
        eng = FusedLogRegADVI(prob.X, prob.y, n_samples=10, lr=1e-3)
        st = eng.init(q0_loc, q0_sd)
        t0 = time.time()
        run = jax.jit(lambda s: eng.run_chunk(s, key, steps=50_000))
        st = run(st)
        e = float(jax.device_get(st.elbo))
        log(f"  compile+warmup {time.time()-t0:.1f}s, elbo {e:.2f}")
        times = []
        for _ in range(3):
            t0 = time.time()
            st = run(st)
            e = float(jax.device_get(st.elbo))
            times.append(time.time() - t0)
        sps = 50_000 / min(times)
        log(
            f"  RESULT fused meanfield d=61: {sps/1e3:.1f}k steps/s "
            f"(chunks {[f'{t:.3f}' for t in times]}), elbo {e:.2f} "
            f"(r4 clean band 1012-1078k)"
        )
    except Exception as exc:
        log(f"  SECTION 1 FAILED: {exc!r}")

    # ---- 2. bitwise resume in RNG mode --------------------------------
    try:
        section("2 bitwise checkpoint-resume (RNG mode)")
        eng = FusedLogRegADVI(prob.X, prob.y, n_samples=10, lr=1e-3)
        a = eng.run_chunk(eng.init(q0_loc, q0_sd), key, steps=4_000)
        b = eng.run_chunk(eng.init(q0_loc, q0_sd), key, steps=2_000)
        b = eng.run_chunk(b, key, steps=2_000)
        a, b = jax.device_get((a, b))
        same = all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(a[:8], b[:8])
        )
        log(f"  RESULT single-chain 4k == 2k+2k bitwise: {same}")
        # also across a THIRD layout (1k + 3k)
        c = eng.run_chunk(eng.init(q0_loc, q0_sd), key, steps=1_000)
        c = eng.run_chunk(c, key, steps=3_000)
        c = jax.device_get(c)
        same3 = all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(a[:8], c[:8])
        )
        log(f"  RESULT single-chain 4k == 1k+3k bitwise: {same3}")

        eng_c = FusedChainsADVI(
            logreg_spec(prob.X, prob.y), n_chains=32, n_samples=8
        )
        locs = 0.2 * jax.random.normal(jax.random.key(1), (32, d))
        sds = 0.1 * jnp.ones((32, d))
        ca = eng_c.run_chunk(eng_c.init(locs, sds), key, steps=2_000)
        cb = eng_c.run_chunk(eng_c.init(locs, sds), key, steps=800)
        cb = eng_c.run_chunk(cb, key, steps=1_200)
        ca, cb = jax.device_get((ca, cb))
        same_c = all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(ca[:8], cb[:8])
        )
        log(f"  RESULT chains 2k == 0.8k+1.2k bitwise: {same_c}")
    except Exception as exc:
        log(f"  SECTION 2 FAILED: {exc!r}")

    # ---- 3. AD-derived specs on hardware ------------------------------
    try:
        section("3 AD-derived specs (Mosaic lowering + speed)")
        spec_ad = ad_spec(prob.unconstrained())
        eng_ad = FusedADVI(spec_ad, n_samples=10, lr=1e-3)
        st = eng_ad.init(q0_loc, q0_sd)
        t0 = time.time()
        run = jax.jit(lambda s: eng_ad.run_chunk(s, key, steps=50_000))
        st = run(st)
        e = float(jax.device_get(st.elbo))
        log(f"  ad_spec(logreg) compile {time.time()-t0:.1f}s, elbo {e:.2f}")
        times = []
        for _ in range(3):
            t0 = time.time()
            st = run(st)
            e = float(jax.device_get(st.elbo))
            times.append(time.time() - t0)
        sps = 50_000 / min(times)
        log(
            f"  RESULT ad_spec logreg: {sps/1e3:.1f}k steps/s, elbo {e:.2f}"
            f" (hand-spec elbo lands ~-103)"
        )

        # ppl.ingest'd model runs fused on chip
        import advancedvi_jl_tpu.ppl as ppl

        rng = np.random.default_rng(5)
        n, p = 208, 12
        Xp = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
        yp = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))

        def model(data):
            sigma = ppl.sample("sigma", ppl.LogNormal(0.0, 1.0))
            beta = ppl.sample("beta", ppl.Normal(jnp.zeros(p), sigma))
            logits = data["X"] @ beta
            ppl.sample("y", ppl.Bernoulli(logits=logits), obs=data["y"])

        m = ppl.ingest(model, data={"X": Xp, "y": yp})
        spec_ppl = avt.fused_spec_for(m.target)
        eng_p = FusedADVI(spec_ppl, n_samples=10, lr=1e-3)
        stp = eng_p.init(m.q_init().location, m.q_init().scale_diag)
        t0 = time.time()
        runp = jax.jit(lambda s: eng_p.run_chunk(s, key, steps=20_000))
        stp = runp(stp)
        ep = float(jax.device_get(stp.elbo))
        tc = time.time() - t0
        t0 = time.time()
        stp = runp(stp)
        ep = float(jax.device_get(stp.elbo))
        sps_p = 20_000 / (time.time() - t0)
        log(
            f"  RESULT ppl.ingest fused: compile {tc:.1f}s, "
            f"{sps_p/1e3:.1f}k steps/s, elbo {ep:.2f} (finite={np.isfinite(ep)})"
        )

        # from_log_density custom target
        from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedModelSpec

        anchor = jnp.linspace(-1.0, 1.0, 16)
        specq = FusedModelSpec.from_log_density(
            lambda t, a: -0.5 * jnp.sum((t - a) ** 2), 16, data=anchor
        )
        eq = FusedADVI(specq, n_samples=10, lr=1e-2)
        sq = eq.init(jnp.zeros(16), 0.1 * jnp.ones(16))
        sq = eq.run_chunk(sq, key, steps=20_000)
        loc = jax.device_get(eq.q(sq).location)
        err = float(np.linalg.norm(loc - np.asarray(anchor)))
        log(f"  RESULT from_log_density: loc_err {err:.4f} (want ~0)")
    except Exception as exc:
        log(f"  SECTION 3 FAILED: {exc!r}")

    # ---- 4. blocked full-rank back-substitution -----------------------
    try:
        section("4 full-rank blocked backsub (d=256, d=512)")
        from advancedvi_jl_tpu.models.normal import normal_fullrank

        for dd, steps in ((256, 5_000), (512, 2_000)):
            tgt, mu_t, L_t = normal_fullrank(jax.random.key(3), dd)
            spec = mvnormal_spec(tgt.mu, tgt.scale_tril)
            engf = FusedADVI(spec, family=FULLRANK, n_samples=8, lr=2e-3)
            stf = engf.init(jnp.zeros(dd), 0.1 * jnp.eye(dd))
            t0 = time.time()
            runf = jax.jit(lambda s, e=engf: e.run_chunk(s, key, steps=steps))
            stf = runf(stf)
            ef = float(jax.device_get(stf.elbo))
            tc = time.time() - t0
            times = []
            for _ in range(2):
                t0 = time.time()
                stf = runf(stf)
                ef = float(jax.device_get(stf.elbo))
                times.append(time.time() - t0)
            sps = steps / min(times)
            log(
                f"  RESULT fullrank d={dd}: compile {tc:.1f}s, "
                f"{sps/1e3:.2f}k steps/s, elbo {ef:.1f} "
                f"(finite={np.isfinite(ef)})"
            )
    except Exception as exc:
        log(f"  SECTION 4 FAILED: {exc!r}")

    # ---- 5. HBM-streamed minibatch at n=500k --------------------------
    try:
        section("5 HBM-streamed minibatch (n=500k)")
        n_big, pb = 500_000, 60
        kx = jax.random.key(21)
        Xb = jax.random.normal(kx, (n_big, pb), jnp.float32)
        beta_true = jax.random.normal(jax.random.key(22), (pb,)) * 0.5
        yb = (
            jax.random.uniform(jax.random.key(23), (n_big,))
            < jax.nn.sigmoid(Xb @ beta_true)
        ).astype(jnp.float32)
        spec_h = logreg_minibatch_hbm_spec(Xb, yb, batch_size=512)
        engh = FusedADVI(spec_h, n_samples=10, lr=1e-3)
        sth = engh.init(jnp.zeros(pb + 1), 0.1 * jnp.ones(pb + 1))
        t0 = time.time()
        runh = jax.jit(lambda s: engh.run_chunk(s, key, steps=20_000))
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
            f"  RESULT streamed n=500k B=512: compile {tc:.1f}s, "
            f"{sps_h/1e3:.1f}k steps/s, elbo {eh:.1f}"
        )
        # resident spec at n=20k for comparison (same B)
        spec_r = logreg_minibatch_spec(Xb[:20_480], yb[:20_480], 512)
        engr = FusedADVI(spec_r, n_samples=10, lr=1e-3)
        str_ = engr.init(jnp.zeros(pb + 1), 0.1 * jnp.ones(pb + 1))
        runr = jax.jit(lambda s: engr.run_chunk(s, key, steps=20_000))
        str_ = runr(str_)
        _ = float(jax.device_get(str_.elbo))
        t0 = time.time()
        str_ = runr(str_)
        er = float(jax.device_get(str_.elbo))
        sps_r = 20_000 / (time.time() - t0)
        log(
            f"  RESULT resident n=20k B=512: {sps_r/1e3:.1f}k steps/s "
            f"(streaming cost = {sps_r/max(sps_h,1e-9):.2f}x)"
        )
    except Exception as exc:
        log(f"  SECTION 5 FAILED: {exc!r}")

    # ---- 6. chains traced kernel + divergence channel -----------------
    try:
        section("6 chains traced kernel on hardware")
        eng_c = FusedChainsADVI(
            logreg_spec(prob.X, prob.y), n_chains=128, n_samples=10,
            lr=1e-3,
        )
        locs = 0.3 * jax.random.normal(jax.random.key(1), (128, d))
        st_c = eng_c.init(locs, 0.1 * jnp.ones((128, d)))
        t0 = time.time()
        st_c, tr = eng_c.run_chunk_traced(
            st_c, key, steps=20_000, log_every=1_000
        )
        tr = jax.device_get(tr)
        tc = time.time() - t0
        t0 = time.time()
        st_c, tr = eng_c.run_chunk_traced(
            st_c, key, steps=20_000, log_every=1_000
        )
        tr = np.asarray(jax.device_get(tr))
        agg = 128 * 20_000 / (time.time() - t0)
        log(
            f"  RESULT chains traced C=128: compile {tc:.1f}s, "
            f"{agg/1e6:.2f}M chain-steps/s, trace {tr.shape}, "
            f"all finite={np.all(np.isfinite(tr))}, "
            f"divergence={first_chain_divergence(tr, 1000)}"
        )
        # injected divergence: one absurd per-chain lr
        lrs = np.full((16,), 1e-3, np.float32)
        lrs[11] = 1e8
        eng_d = FusedChainsADVI(
            logreg_spec(prob.X, prob.y), n_chains=16, n_samples=4,
            lr=jnp.asarray(lrs), optimizer="descent",
        )
        st_d = eng_d.init(
            0.2 * jax.random.normal(jax.random.key(2), (16, d)),
            0.1 * jnp.ones((16, d)),
        )
        _, tr_d = eng_d.run_chunk_traced(
            st_d, key, steps=1_000, log_every=100
        )
        hit = first_chain_divergence(np.asarray(jax.device_get(tr_d)), 100)
        log(f"  RESULT injected-NaN chain detected at (chain, it) = {hit}")
    except Exception as exc:
        log(f"  SECTION 6 FAILED: {exc!r}")

    # ---- 7. in-kernel DoG + COCOB on chip ------------------------------
    try:
        section("7 DoG / COCOB on chip")
        eng_dog = FusedProxADVI(
            logreg_spec(prob.X, prob.y), optimizer="dog", n_samples=10
        )
        s1 = eng_dog.init(q0_loc, q0_sd)
        s1 = eng_dog.run_chunk(s1, key, steps=30_000)
        e1 = float(jax.device_get(s1.elbo))
        log(f"  RESULT fused prox-DoG 30k steps: elbo {e1:.2f}")
        eng_cb = FusedScoreGradVI(
            logreg_spec(prob.X, prob.y), optimizer="cocob",
            operator="clip", n_samples=10,
        )
        s2 = eng_cb.init(q0_loc, q0_sd)
        s2 = eng_cb.run_chunk(s2, key, steps=30_000)
        e2 = float(jax.device_get(s2.elbo))
        log(f"  RESULT fused scoregrad-COCOB 30k steps: elbo {e2:.2f}")
        eng_cc = FusedChainsADVI(
            logreg_spec(prob.X, prob.y), n_chains=32, n_samples=8,
            optimizer="cocob",
        )
        s3 = eng_cc.init(
            0.2 * jax.random.normal(jax.random.key(4), (32, d)),
            0.1 * jnp.ones((32, d)),
        )
        s3 = eng_cc.run_chunk(s3, key, steps=10_000)
        e3 = np.asarray(jax.device_get(s3.elbo[:32]))
        log(
            f"  RESULT chains-COCOB C=32 10k steps: elbo median "
            f"{np.median(e3):.2f}, finite {np.isfinite(e3).sum()}/32"
        )
    except Exception as exc:
        log(f"  SECTION 7 FAILED: {exc!r}")

    log(f"ROUND5 CHIP VALIDATION COMPLETE in {time.time()-t00:.1f}s")


if __name__ == "__main__":
    main()
