"""Sample-sharding scaling-efficiency harness (BASELINE.md target: >=80%
efficiency from 1 to N devices).

Methodology (weak scaling): fix the per-device sample count S; at N devices
run the flagship ADVI step with n_samples = S * N sharded over the "mc" mesh
axis.  Efficiency(N) = steps/s(N) / steps/s(1).  Because parameters and
optimizer state are replicated and only the sample means reduce (one psum
over ICI), efficiency should stay near 1 while effective samples/s scales
with N.

On real multi-chip hardware run:  python bench_scaling.py
On a CPU-simulated mesh (plumbing check ONLY — virtual devices share the same
host cores, so total work grows with N on fixed silicon and measured
"efficiency" is meaningless; real efficiency requires real chips):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py

Prints one JSON line per device count.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


SAMPLES_PER_DEVICE = 512
STEPS = 300


def run(n_devices: int, base_steps_per_s=None):
    import advancedvi_jl_tpu as avt
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh

    target = make_logreg(
        jax.random.key(11), n_data=208, n_features=60
    ).unconstrained()
    d = 62
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL,
        n_samples=SAMPLES_PER_DEVICE * n_devices,
        operator=avt.ClipScale(),
        mc_axis=MC_AXIS if n_devices > 1 else None,
    )
    mesh = make_vi_mesh(n_mc=n_devices, devices=jax.devices()[:n_devices])

    def chunk(s):
        def body(c, _):
            s2, info = alg.step(c)
            return s2, info["elbo"]

        return jax.lax.scan(body, s, None, length=STEPS)

    with jax.set_mesh(mesh):
        from advancedvi_jl_tpu.parallel.mesh import replicate_state

        state = replicate_state(
            alg.init(jax.random.key(0), q0, target), mesh
        )
        f = jax.jit(chunk)
        state, el = f(state)
        _ = float(jax.device_get(el[-1]))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            state, el = f(state)
            _ = float(jax.device_get(el[-1]))
            best = min(best, time.time() - t0)

    sps = STEPS / best
    eff = None if base_steps_per_s is None else sps / base_steps_per_s
    print(
        json.dumps(
            {
                "metric": "scaling_steps_per_s",
                "devices": n_devices,
                "samples_per_step": SAMPLES_PER_DEVICE * n_devices,
                "value": round(sps, 1),
                "unit": "steps/s",
                "efficiency_vs_1dev": None if eff is None else round(eff, 3),
            }
        )
    )
    return sps


def main():
    n = len(jax.devices())
    print(f"devices available: {n}", file=sys.stderr)
    base = run(1)
    k = 2
    while k <= n:
        run(k, base_steps_per_s=base)
        k *= 2


if __name__ == "__main__":
    main()
