"""On-chip validation + throughput of the fused whole-loop ADVI engine.

1. Statistical: fused engine (on-chip RNG) for 30k steps must land on the
   same posterior approximation as the general path (loc/scale close).
2. Throughput: steps/s at chunk sizes 2k/10k, vs the general path.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedLogRegADVI


def main():
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = prob.unconstrained()
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    # --- general path reference (30k steps) ---
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=10, optimizer=optax.adam(1e-3),
        operator=avt.ClipScale(),
    )
    state = alg.init(jax.random.key(0, impl="rbg"), q0, target)

    @jax.jit
    def chunk(s, n=2000):
        def body(c, _):
            st, _ = c
            s2, info = alg.step(st)
            return (s2, info["elbo"]), None

        (s2, el), _ = jax.lax.scan(
            body, (s, jnp.zeros(())), None, length=n, unroll=8
        )
        return s2, el

    state, el = chunk(state)
    _ = float(jax.device_get(el))
    t0 = time.time()
    best_gen = 1e9
    for _ in range(15):
        t1 = time.time()
        state, el = chunk(state)
        e_gen = float(jax.device_get(el))
        best_gen = min(best_gen, time.time() - t1)
    q_gen = alg.output(state)
    print(
        f"general: {2000/best_gen:.0f} steps/s  elbo={e_gen:.3f}",
        flush=True,
    )

    # --- fused engine ---
    eng = FusedLogRegADVI(prob.X, prob.y, n_samples=10, lr=1e-3)
    f = eng.init(q0.location, q0.scale_diag)
    key = jax.random.key(123)
    run2k = jax.jit(lambda s: eng.run_chunk(s, key, steps=2000))
    f = run2k(f)
    _ = float(jax.device_get(f.elbo))
    best = 1e9
    for _ in range(15):
        t1 = time.time()
        f = run2k(f)
        e_f = float(jax.device_get(f.elbo))
        best = min(best, time.time() - t1)
    print(
        f"fused(chunk=2k): {2000/best:.0f} steps/s  elbo={e_f:.3f}",
        flush=True,
    )

    run10k = jax.jit(lambda s: eng.run_chunk(s, key, steps=10000))
    f10 = run10k(f)
    _ = float(jax.device_get(f10.elbo))
    best10 = 1e9
    for _ in range(6):
        t1 = time.time()
        f10 = run10k(f10)
        e10 = float(jax.device_get(f10.elbo))
        best10 = min(best10, time.time() - t1)
    print(
        f"fused(chunk=10k): {10000/best10:.0f} steps/s  elbo={e10:.3f}",
        flush=True,
    )

    # statistical agreement of the converged posteriors
    q_f = eng.q(f10)
    dloc = np.max(np.abs(np.asarray(q_f.location) - np.asarray(q_gen.location)))
    rel = dloc / (np.max(np.abs(np.asarray(q_gen.location))) + 1e-12)
    dsc = np.max(
        np.abs(np.asarray(q_f.scale_diag) - np.asarray(q_gen.scale_diag))
    )
    print(
        f"posterior gap: max|dloc|={dloc:.4f} (rel {rel:.4f}) "
        f"max|dscale|={dsc:.4f}",
        flush=True,
    )
    # ELBO of the fused output under the general estimator
    e_eval = -float(
        jax.device_get(
            alg.estimate_objective(jax.random.key(9), q_f, target, 4096)
        )
    )
    e_eval_gen = -float(
        jax.device_get(
            alg.estimate_objective(jax.random.key(9), q_gen, target, 4096)
        )
    )
    print(f"eval ELBO: fused={e_eval:.4f} general={e_eval_gen:.4f}", flush=True)


if __name__ == "__main__":
    main()
