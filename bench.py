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
posterior matches the general path (BENCH_NOTES "Round 3").  The general
path's throughput is printed to stderr alongside.

Timing methodology: the axon tunnel costs ~24 ms per dispatch round-trip
(measured), so chunks are sized to amortize it (50k steps/chunk fused,
20k general); the quoted number is measured wall-clock steps/s including
that residual overhead, NOT an extrapolated device rate.

The reference publishes NO absolute numbers (BASELINE.md): its CI tracks
relative regressions only.  ``vs_baseline`` is therefore reported against a
documented nominal proxy REF_STEPS_PER_S for the reference's single-core CPU
hot loop on this workload; >1.0 means faster than the proxy.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}
"""

import json
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
    best = 1e9
    for _ in range(N_CHUNKS):
        t0 = time.time()
        state, elbo = run(state)
        e = float(jax.device_get(elbo))
        best = min(best, time.time() - t0)
    assert jnp.isfinite(e)
    return GENERAL_CHUNK / best, e


def main():
    import optax

    import advancedvi_jl_tpu as avt
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedLogRegADVI

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = prob.unconstrained()
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=10,
        optimizer=optax.adam(1e-3),
        operator=avt.ClipScale(),
    )
    # rbg keys ride the TPU's hardware RNG instruction (BENCH_NOTES).
    state = alg.init(jax.random.key(0, impl="rbg"), q0, target)

    t0 = time.time()
    gen_sps, gen_elbo = _bench_general(alg, state)
    print(
        f"general path: {gen_sps:.0f} steps/s (elbo {gen_elbo:.3f}, "
        f"warmup+bench {time.time() - t0:.1f}s)",
        file=sys.stderr,
    )

    # fused whole-loop engine (same workload, same update math)
    eng = FusedLogRegADVI(prob.X, prob.y, n_samples=10, lr=1e-3)
    f = eng.init(q0.location, q0.scale_diag)
    key = jax.random.key(0)
    run = jax.jit(lambda s: eng.run_chunk(s, key, steps=FUSED_CHUNK))
    f = run(f)
    _ = float(jax.device_get(f.elbo))
    times = []
    for _ in range(N_CHUNKS):
        t0 = time.time()
        f = run(f)
        elbo = float(jax.device_get(f.elbo))
        times.append(time.time() - t0)
    best = min(times)
    steps_per_s = FUSED_CHUNK / best
    print(
        f"fused chunks: {[f'{t:.3f}s' for t in times]}  elbo: {elbo:.3f}",
        file=sys.stderr,
    )
    assert jnp.isfinite(elbo), "bench run diverged"
    # sanity: the fused run must actually be converged to the flagship
    # posterior region (general-path elbo lands ~-105 at this horizon)
    assert elbo > -150.0, f"fused elbo {elbo} not in the converged region"

    print(
        json.dumps(
            {
                "metric": "elbo_grad_steps_per_s_logreg_advi_stl",
                "value": round(steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / REF_STEPS_PER_S, 3),
                "engine": "fused_pallas_whole_loop",
                "general_path_steps_per_s": round(gen_sps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
