"""Benchmark: ELBO-gradient steps/s on the flagship logreg model (one chip).

Workload: mean-field ADVI + sticking-the-landing entropy on the hierarchical
logistic-regression model (reference README.md:27-67; sonar-shaped data
208 x 61), n_samples=10 per gradient — the reference CI benchmark's
configuration family (bench/benchmarks.jl:56-100) on its flagship model.

The reference publishes NO absolute numbers (BASELINE.md): its CI tracks
relative regressions only.  ``vs_baseline`` is therefore reported against a
documented nominal proxy REF_STEPS_PER_S for the reference's single-core CPU
hot loop on this workload; >1.0 means faster than the proxy.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# Documented proxy for the Julia/CPU reference implementation's throughput on
# this workload (no published absolute baseline exists; see BASELINE.md).
REF_STEPS_PER_S = 2000.0

WARMUP_STEPS = 200
TIMED_CHUNK = 2000
N_CHUNKS = 3


def main():
    import advancedvi_jl_tpu as avt
    from advancedvi_jl_tpu.models.logreg import make_logreg

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    import optax

    target = make_logreg(
        jax.random.key(11), n_data=208, n_features=60
    ).unconstrained()
    d = 62
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    # Adam(1e-3) matches the reference CI benchmark configuration
    # (bench/benchmarks.jl: Adam + ClipScale).
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=10,
        optimizer=optax.adam(1e-3),
        operator=avt.ClipScale(),
    )
    # rbg keys ride the TPU's hardware RNG instruction instead of ~90
    # threefry ALU ops per draw: +13% on this op-count-bound step.  Same
    # public API (the key impl propagates through fold_in/sample); threefry
    # stays the library default for cross-version bitwise reproducibility
    # and partitionable sharding (BENCH_NOTES.md "Headline profile").
    state = alg.init(jax.random.key(0, impl="rbg"), q0, target)

    def chunk(state, n):
        # Carry-only info (no stacked per-step output): the per-step
        # dynamic-update-slice write is one of ~16 fused kernels in the
        # step, worth +12% at this size.  optimize(log_every>1) uses the
        # same shape for long production runs.
        def body(carry, _):
            st, _ = carry
            new_state, info = alg.step(st)
            return (new_state, info["elbo"]), None

        (st, last), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=n, unroll=8
        )
        return st, last

    run_warm = jax.jit(lambda s: chunk(s, WARMUP_STEPS))
    run_timed = jax.jit(lambda s: chunk(s, TIMED_CHUNK))

    t0 = time.time()
    state, elbo = run_warm(state)
    _ = float(jax.device_get(elbo))  # full host sync
    print(f"warmup+compile: {time.time() - t0:.1f}s", file=sys.stderr)
    # compile the timed chunk outside the timing loop
    state, elbo = run_timed(state)
    _ = float(jax.device_get(elbo))

    times = []
    final_elbo = 0.0
    for _ in range(N_CHUNKS):
        t0 = time.time()
        state, elbo = run_timed(state)
        # device_get of the result forces a real round-trip sync (the axon
        # tunnel's block_until_ready returns early on remote buffers).
        final_elbo = float(jax.device_get(elbo))
        times.append(time.time() - t0)
    best = min(times)
    steps_per_s = TIMED_CHUNK / best
    print(
        f"chunks: {[f'{t:.3f}s' for t in times]}  final elbo: {final_elbo:.3f}",
        file=sys.stderr,
    )
    assert jnp.isfinite(final_elbo), "bench run diverged"

    print(
        json.dumps(
            {
                "metric": "elbo_grad_steps_per_s_logreg_advi_stl",
                "value": round(steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / REF_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
