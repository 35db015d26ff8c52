"""Round-5 chip session 2: isolate the ad_spec Mosaic failure, validate
full-rank on a well-conditioned target, probe d=512 VMEM options, and
re-time a fresh-process compile (was session 1's 467 s wedge recovery or
the per-step reseed?).

Probes P1-P5 bracket the `tpu.transpose on vector<...xi1>` legalization
failure seen for ad_spec(logreg) in session 1:
  P1 elementwise-only density        (diag gaussian)
  P2 tile-ALIGNED matmul density     (X: 256 x 64)
  P3 unaligned matmul density        (X: 208 x 61 — session-1 shape)
  P4 P3 via block-vjp instead of vmap(value_and_grad)
  P5 the full ppl.ingest'd model
"""

import sys
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
        FusedLogRegADVI,
        ad_spec,
        mvnormal_spec,
    )

    key = jax.random.key(0)

    # ---- 0. fresh-process compile time of the SAME kernel as session 1
    try:
        prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
        d = prob.dim
        eng = FusedLogRegADVI(prob.X, prob.y, n_samples=10, lr=1e-3)
        st = eng.init(jnp.zeros(d), 0.1 * jnp.ones(d))
        t0 = time.time()
        st = eng.run_chunk(st, key, steps=50_000)
        e = float(jax.device_get(st.elbo))
        log(
            f"RESULT fresh-process compile+50k: {time.time()-t0:.1f}s "
            f"(session 1: 467s), elbo {e:.2f}"
        )
    except Exception as exc:
        log(f"SECTION 0 FAILED: {exc!r}")

    # ---- ad_spec probes -----------------------------------------------
    def probe(name, spec, dim, steps=2_000):
        try:
            e = FusedADVI(spec, n_samples=8, lr=1e-3)
            s = e.init(jnp.zeros(dim), 0.1 * jnp.ones(dim))
            t0 = time.time()
            s = e.run_chunk(s, key, steps=steps)
            v = float(jax.device_get(s.elbo))
            log(
                f"PROBE {name}: OK compile+run {time.time()-t0:.1f}s, "
                f"elbo {v:.2f}"
            )
            return True
        except Exception as exc:
            msg = repr(exc)
            for tag in ("failed to legalize operation '", "Mosaic"):
                if tag in msg:
                    i = msg.find("failed to legalize operation")
                    msg = msg[i : i + 80] if i >= 0 else msg[:160]
                    break
            else:
                msg = msg[:160]
            log(f"PROBE {name}: FAILED {msg}")
            return False

    # P1 elementwise only
    d1 = 16
    anchor = jnp.linspace(-1.0, 1.0, d1)
    spec1 = avt.FusedModelSpec.from_log_density(
        lambda t, a: -0.5 * jnp.sum((t - a) ** 2), d1, data=anchor
    )
    probe("P1 elementwise", spec1, d1)

    # P2 aligned matmul (X: 256 x 64)
    rng = np.random.default_rng(0)
    Xa = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
    ya = jnp.asarray((rng.random(256) < 0.5).astype(np.float32))

    def logreg_ld(t, data):
        X, y = data
        beta = t[: X.shape[1]]
        logits = X @ beta
        return (
            jnp.sum(y * logits - jax.nn.softplus(logits))
            - 0.5 * jnp.sum(beta * beta)
        )

    spec2 = avt.FusedModelSpec.from_log_density(
        logreg_ld, 64, data=(Xa, ya)
    )
    probe("P2 aligned matmul", spec2, 64)

    # P3 unaligned matmul (the session-1 failing shape family)
    Xu = jnp.asarray(rng.normal(size=(208, 61)).astype(np.float32))
    yu = jnp.asarray((rng.random(208) < 0.5).astype(np.float32))
    spec3 = avt.FusedModelSpec.from_log_density(
        logreg_ld, 61, data=(Xu, yu)
    )
    probe("P3 unaligned matmul", spec3, 61)

    # P4: the real flagship target (transforms + hierarchy) again, for a
    # clean one-line record of the current ad_spec state
    prob2 = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    probe("P4 ad_spec(flagship logreg)", ad_spec(prob2.unconstrained()),
          prob2.dim)

    # P5 ppl model
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
        probe("P5 ppl model", avt.fused_spec_for(m.target), m.dim)
    except Exception as exc:
        log(f"P5 build FAILED: {exc!r}")

    # ---- full-rank on a WELL-CONDITIONED dense target -----------------
    try:
        for dd, lr, steps in ((256, 1e-3, 5_000), (384, 1e-3, 3_000)):
            k1, k2 = jax.random.split(jax.random.key(dd))
            L = jnp.eye(dd) + 0.1 * jnp.tril(
                jax.random.normal(k1, (dd, dd)), -1
            ) / np.sqrt(dd)
            mu_t = jax.random.normal(k2, (dd,))
            spec = mvnormal_spec(mu_t, L)
            engf = FusedADVI(spec, family=FULLRANK, n_samples=8, lr=lr)
            stf = engf.init(jnp.zeros(dd), 0.1 * jnp.eye(dd))
            t0 = time.time()
            runf = jax.jit(lambda s, e=engf: e.run_chunk(s, key, steps=steps))
            stf = runf(stf)
            ef = float(jax.device_get(stf.elbo))
            tc = time.time() - t0
            t0 = time.time()
            stf = runf(stf)
            ef = float(jax.device_get(stf.elbo))
            sps = steps / (time.time() - t0)
            loc_err = float(
                jnp.linalg.norm(
                    jax.device_get(engf.q(stf, averaged=False).location)
                    - mu_t
                )
            ) / float(jnp.linalg.norm(mu_t))
            log(
                f"RESULT fullrank d={dd} (well-cond): compile {tc:.1f}s, "
                f"{sps/1e3:.2f}k steps/s, elbo {ef:.2f}, rel_loc_err "
                f"{loc_err:.3f}"
            )
    except Exception as exc:
        log(f"FULLRANK SECTION FAILED: {exc!r}")

    # ---- d=512 VMEM probe: raise the scoped limit ----------------------
    try:
        dd = 512
        k1, k2 = jax.random.split(jax.random.key(7))
        L = jnp.eye(dd) + 0.1 * jnp.tril(
            jax.random.normal(k1, (dd, dd)), -1
        ) / np.sqrt(dd)
        mu_t = jax.random.normal(k2, (dd,))
        spec = mvnormal_spec(mu_t, L)
        engf = FusedADVI(spec, family=FULLRANK, n_samples=8, lr=1e-3)
        stf = engf.init(jnp.zeros(dd), 0.1 * jnp.eye(dd))

        import functools

        from advancedvi_jl_tpu.ops.pallas import fused_advi as fa

        # compiler-options escape hatch: scoped-vmem limit 24 MB
        lowered = jax.jit(
            lambda s: engf.run_chunk(s, key, steps=1_000)
        ).lower(stf)
        compiled = lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": 24_576}
        )
        t0 = time.time()
        stf = compiled(stf)
        ef = float(jax.device_get(stf.elbo))
        t1 = time.time()
        stf = compiled(stf)
        ef = float(jax.device_get(stf.elbo))
        sps = 1_000 / (time.time() - t1)
        log(
            f"RESULT fullrank d=512 w/ scoped-vmem 24MB: compile+run "
            f"{t1-t0:.1f}s, {sps/1e3:.2f}k steps/s, elbo {ef:.2f}"
        )
    except Exception as exc:
        msg = repr(exc)
        log(f"RESULT fullrank d=512 scoped-vmem probe FAILED: {msg[:300]}")

    log(f"CHIP SESSION 2 COMPLETE in {time.time()-t00:.1f}s")


if __name__ == "__main__":
    main()
