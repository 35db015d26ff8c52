"""Benchmark: ELBO-gradient steps/s on the flagship logreg model (one chip).

Workload: mean-field ADVI + sticking-the-landing entropy on the hierarchical
logistic-regression model (reference README.md:27-67; sonar-shaped data
208 x 61), n_samples=10 per gradient, Adam(1e-3) + ClipScale + polynomial
averaging — the reference CI benchmark's configuration family
(bench/benchmarks.jl:56-100) on its flagship model.

Engine: the whole-loop fused Pallas kernel (ops/pallas/fused_advi.py) — the
ENTIRE optimization loop (on-chip RNG, reparameterized draw, hand-derived
gradient, STL correction, Adam, ClipScale, averaging) runs inside one
kernel dispatch per chunk.  Its update math is pinned step-by-step against
the general ``alg.step`` path (tests/test_fused_advi.py) and its converged
posterior matches the general path on chip (BENCH_NOTES "Round 3/4").

Stage order balances loss-proofing (round-3 lesson: the round artifact
was lost to a TPU-side hang AFTER a successful mid-run — wedged-chip risk
is real, so time-to-JSON matters) against metric continuity (VERDICT r4
weak #1: the general-path number lived in stderr only, one missing field
from losing the longitudinal series):
  1. fused engine: compile (fori_loop — length-independent, seconds),
     time 3 x 50k-step chunks.
  2. general-path comparison (alg.step under a 20k-step scan), wrapped so
     ANY failure leaves stage 1's result intact (fields go null).
  -> print THE one JSON line: fused headline + general_steps_per_s +
     warmup_s/wedge_recovered provenance (a recovered-from-wedge run is
     distinguishable from a clean one in the artifact itself).
  3. perf regression gate vs the last parsed BENCH_r*.json: BOTH series
     (fused-vs-fused and general-vs-general, ±10% band); stderr only,
     after the JSON so a gate crash can never destroy the artifact.
  4. multi-chain fused aggregate (C=128 chains in one kernel): stderr only.

Convergence is REPORTED (``converged`` field, general-path elbo lands
~-103 at this horizon), never asserted — a diverged run still records its
timing.  ``vs_baseline`` is vs the documented nominal proxy
REF_STEPS_PER_S for the reference's single-core CPU hot loop on this
workload (the reference publishes no absolute numbers, BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}
"""

import json
import math
import sys
import time

import jax
import jax.numpy as jnp

# Documented proxy for the Julia/CPU reference implementation's throughput on
# this workload (no published absolute baseline exists; see BASELINE.md).
REF_STEPS_PER_S = 2000.0

FUSED_CHUNK = 50_000
GENERAL_CHUNK = 20_000
N_CHUNKS = 3

# Shared workload config: single source of truth, also imported by
# tests/test_fused_advi.py::test_bench_config_matches_engine_defaults so the
# fused-engine defaults can never drift from what this bench times.
BENCH_CONFIG = dict(
    n_data=208, n_features=60, n_samples=10, lr=1e-3, data_seed=11,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _bench_general(alg, state):
    """steps/s of the general alg.step path under a carry-only scan."""

    def chunk(state, n):
        def body(carry, _):
            st, _ = carry
            new_state, info = alg.step(st)
            return (new_state, info["elbo"]), None

        (st, last), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=n, unroll=8
        )
        return st, last

    run = jax.jit(lambda s: chunk(s, GENERAL_CHUNK))
    state, elbo = run(state)
    _ = float(jax.device_get(elbo))
    best, e = 1e9, float("nan")
    for _ in range(N_CHUNKS):
        t0 = time.time()
        state, elbo = run(state)
        e = float(jax.device_get(elbo))
        best = min(best, time.time() - t0)
    return GENERAL_CHUNK / best, e


def main():
    import advancedvi_jl_tpu as avt
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedLogRegADVI

    t_start = time.time()
    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = BENCH_CONFIG
    prob = make_logreg(
        jax.random.key(cfg["data_seed"]),
        n_data=cfg["n_data"],
        n_features=cfg["n_features"],
    )
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    # ---- stage 1: fused whole-loop engine (the headline number) ----
    eng = FusedLogRegADVI(
        prob.X, prob.y, n_samples=cfg["n_samples"], lr=cfg["lr"]
    )
    f = eng.init(q0.location, q0.scale_diag)
    key = jax.random.key(0)
    run = jax.jit(lambda s: eng.run_chunk(s, key, steps=FUSED_CHUNK))
    f = run(f)
    _ = float(jax.device_get(f.elbo))
    warmup_s = time.time() - t_start
    log(f"fused warmup+compile: {warmup_s:.1f}s")
    times = []
    elbo = float("nan")
    for _ in range(N_CHUNKS):
        t0 = time.time()
        f = run(f)
        elbo = float(jax.device_get(f.elbo))
        times.append(time.time() - t0)
    best = min(times)
    steps_per_s = FUSED_CHUNK / best
    log(f"fused chunks: {[f'{t:.3f}s' for t in times]}  elbo: {elbo:.3f}")
    # converged = landed in the flagship posterior region (general-path
    # elbo ~-103 at this horizon); reported, never asserted.
    converged = bool(jnp.isfinite(elbo)) and elbo > -150.0

    # loss-proofing (round-3 lesson): stage 1's number is now on disk
    # BEFORE the stage-2 TPU work — a wedge/hang there (the exact r03
    # failure mode, which a try/except cannot catch) no longer destroys
    # the fused headline.  The single stdout JSON line stays the
    # authoritative artifact; this side file is the recovery record.
    try:
        import os

        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_PROVISIONAL.json"), "w"
        ) as fh:
            json.dump(
                {
                    "metric": "elbo_grad_steps_per_s_logreg_advi_stl",
                    "value": round(steps_per_s, 1),
                    "unit": "steps/s",
                    "engine": "fused_pallas_whole_loop",
                    "converged": converged,
                    "elbo": round(elbo, 3) if math.isfinite(elbo) else None,
                    "warmup_s": round(warmup_s, 1),
                    "provisional": True,
                },
                fh,
            )
    except Exception as exc:
        log(f"provisional artifact write failed (non-fatal): {exc!r}")

    # ---- stage 2: general-path comparison (parsed field; failure-safe) ----
    gen_sps = gen_elbo = None
    try:
        import optax

        alg = avt.KLMinRepGradDescent(
            entropy=avt.STL,
            n_samples=cfg["n_samples"],
            optimizer=optax.adam(cfg["lr"]),
            operator=avt.ClipScale(),
        )
        # rbg keys ride the TPU's hardware RNG instruction (BENCH_NOTES).
        state = alg.init(
            jax.random.key(0, impl="rbg"), q0, prob.unconstrained()
        )
        t0 = time.time()
        gen_sps, gen_elbo = _bench_general(alg, state)
        log(
            f"general path: {gen_sps:.0f} steps/s (elbo {gen_elbo:.3f}, "
            f"warmup+bench {time.time() - t0:.1f}s) — "
            f"fused speedup {steps_per_s / gen_sps:.2f}x"
        )
    except Exception as exc:  # stage must not damage the artifact
        log(f"general path FAILED (artifact keeps null fields): {exc!r}")

    parsed = {
        "metric": "elbo_grad_steps_per_s_logreg_advi_stl",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / REF_STEPS_PER_S, 3),
        "engine": "fused_pallas_whole_loop",
        "converged": converged,
        # strict-JSON safe: NaN/inf elbo becomes null, not the
        # unparseable bare NaN token json.dumps would emit
        "elbo": round(elbo, 3) if math.isfinite(elbo) else None,
        # longitudinal general-path series (VERDICT r4 #4: parsed, not
        # stderr) + run provenance so cross-round band comparisons can
        # separate clean runs from wedge-recovered ones
        "general_steps_per_s": (
            round(gen_sps, 1) if gen_sps is not None else None
        ),
        "general_elbo": (
            round(gen_elbo, 3)
            if gen_elbo is not None and math.isfinite(gen_elbo) else None
        ),
        "fused_chunk_steps": FUSED_CHUNK,
        "warmup_s": round(warmup_s, 1),
        # a clean fused warmup is ~25-60 s through the tunnel; BENCH_r04's
        # wedge-recovered run took 430 s (VERDICT r4 weak #2)
        "wedge_recovered": warmup_s > 180.0,
    }
    print(json.dumps(parsed), flush=True)

    # ---- stage 3: perf regression gate, BOTH series (stderr only) ----
    try:
        from perf_gate import check_all

        verdict, ok = check_all(parsed)
        log(verdict)
    except Exception as exc:
        log(f"perf gate errored (artifact unaffected): {exc!r}")

    # ---- stage 4: multi-chain fused aggregate (stderr only) ----
    try:
        from advancedvi_jl_tpu.ops.pallas.fused_advi import logreg_spec
        from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI

        C, csteps = 128, 20_000
        eng_c = FusedChainsADVI(
            logreg_spec(prob.X, prob.y), n_chains=C,
            n_samples=cfg["n_samples"], lr=cfg["lr"],
        )
        locs = 0.3 * jax.random.normal(jax.random.key(1), (C, d))
        st_c = eng_c.init(locs, 0.1 * jnp.ones((C, d)))
        key_c = jax.random.key(7)
        run_c = jax.jit(lambda s: eng_c.run_chunk(s, key_c, steps=csteps))
        t0 = time.time()
        st_c = run_c(st_c)
        _ = float(jax.device_get(st_c.elbo[0]))
        t1 = time.time()
        st_c = run_c(st_c)
        _ = float(jax.device_get(st_c.elbo[0]))
        agg = C * csteps / (time.time() - t1)
        log(
            f"fused chains C={C}: {agg/1e6:.2f}M aggregate chain-steps/s "
            f"(compile {t1 - t0:.1f}s)"
        )
    except Exception as exc:
        log(f"fused chains stage FAILED (artifact unaffected): {exc!r}")

    log(f"total bench wall-clock: {time.time() - t_start:.1f}s")


if __name__ == "__main__":
    main()
