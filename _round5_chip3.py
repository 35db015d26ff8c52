"""Round-5 chip session 3: validate the session-2 fixes on hardware.

- canonical-dot rewrite in ad_spec (the Mosaic i1-transpose workaround):
  matmul-bearing targets P2-P4 must now compile and run; record steps/s
  of ad_spec(flagship logreg) vs the hand spec.
- ppl static-slice fix: the ingested model must lower (P5) + steps/s.
- fullrank d=512 through the NORMAL engine path (vmem_limit_bytes
  compiler params): compile + steps/s + convergence on the
  well-conditioned target.
"""

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
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        FULLRANK,
        FusedADVI,
        ad_spec,
        mvnormal_spec,
    )

    key = jax.random.key(0)
    rng = np.random.default_rng(0)

    def run_spec(name, spec, dim, steps=20_000, lr=1e-3):
        try:
            e = FusedADVI(spec, n_samples=10, lr=lr)
            s = e.init(jnp.zeros(dim), 0.1 * jnp.ones(dim))
            t0 = time.time()
            run = jax.jit(lambda st: e.run_chunk(st, key, steps=steps))
            s = run(s)
            v = float(jax.device_get(s.elbo))
            tc = time.time() - t0
            t0 = time.time()
            s = run(s)
            v = float(jax.device_get(s.elbo))
            sps = steps / (time.time() - t0)
            log(
                f"RESULT {name}: compile {tc:.1f}s, {sps/1e3:.1f}k "
                f"steps/s, elbo {v:.2f}"
            )
            return sps
        except Exception as exc:
            msg = repr(exc)
            i = msg.find("failed to legalize")
            log(f"RESULT {name}: FAILED {msg[i:i+90] if i>=0 else msg[:200]}")
            return None

    # P2/P3: matmul log-densities through from_log_density
    def logreg_ld(t, data):
        X, y = data
        beta = t[: X.shape[1]]
        logits = X @ beta
        return (
            jnp.sum(y * logits - jax.nn.softplus(logits))
            - 0.5 * jnp.sum(beta * beta)
        )

    Xu = jnp.asarray(rng.normal(size=(208, 61)).astype(np.float32))
    yu = jnp.asarray((rng.random(208) < 0.5).astype(np.float32))
    run_spec(
        "P3 unaligned matmul from_log_density",
        avt.FusedModelSpec.from_log_density(logreg_ld, 61, data=(Xu, yu)),
        61, steps=5_000,
    )

    # P4: the flagship target, ad-derived, TIMED against the hand spec
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = prob.dim
    sps_ad = run_spec(
        "P4 ad_spec(flagship logreg)", ad_spec(prob.unconstrained()), d,
        steps=50_000,
    )
    sps_hand = run_spec(
        "hand spec (same target)", avt.fused_spec_for(prob.unconstrained()),
        d, steps=50_000,
    )
    if sps_ad and sps_hand:
        log(f"  ad/hand throughput ratio: {sps_ad/sps_hand:.2f}x")

    # P5: ppl.ingest'd model
    try:
        import advancedvi_jl_tpu.ppl as ppl

        n, p = 208, 12
        Xp = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
        yp = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))

        def model(data):
            sigma = ppl.sample("sigma", ppl.LogNormal(0.0, 1.0))
            beta = ppl.sample("beta", ppl.Normal(jnp.zeros(p), sigma))
            logits = data["X"] @ beta
            ppl.sample("y", ppl.Bernoulli(logits=logits), obs=data["y"])

        m = ppl.ingest(model, data={"X": Xp, "y": yp})
        run_spec("P5 ppl.ingest fused", avt.fused_spec_for(m.target),
                 m.dim, steps=20_000)
    except Exception as exc:
        log(f"P5 build FAILED: {exc!r}")

    # fullrank d=512 through the normal engine (compiler_params applied)
    try:
        dd = 512
        k1, k2 = jax.random.split(jax.random.key(7))
        L = jnp.eye(dd) + 0.1 * jnp.tril(
            jax.random.normal(k1, (dd, dd)), -1
        ) / np.sqrt(dd)
        mu_t = jax.random.normal(k2, (dd,))
        engf = FusedADVI(
            mvnormal_spec(mu_t, L), family=FULLRANK, n_samples=8, lr=1e-3
        )
        stf = engf.init(jnp.zeros(dd), 0.1 * jnp.eye(dd))
        steps = 3_000
        t0 = time.time()
        runf = jax.jit(lambda s: engf.run_chunk(s, key, steps=steps))
        stf = runf(stf)
        ef = float(jax.device_get(stf.elbo))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            stf = runf(stf)
        ef = float(jax.device_get(stf.elbo))
        sps = 3 * steps / (time.time() - t0)
        loc_err = float(
            jnp.linalg.norm(
                jax.device_get(engf.q(stf, averaged=False).location) - mu_t
            )
        ) / float(jnp.linalg.norm(mu_t))
        log(
            f"RESULT fullrank d=512 (engine path): compile {tc:.1f}s, "
            f"{sps/1e3:.2f}k steps/s, elbo {ef:.2f}, rel_loc_err {loc_err:.3f}"
        )
    except Exception as exc:
        log(f"FULLRANK d=512 FAILED: {repr(exc)[:300]}")

    log(f"CHIP SESSION 3 COMPLETE in {time.time()-t00:.1f}s")


if __name__ == "__main__":
    main()
