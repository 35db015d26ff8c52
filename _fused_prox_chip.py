"""On-chip validation + throughput of the fused proximal ADVI engines.

1. Convergence: FusedProxADVI (on-chip RNG) must land on the same
   posterior as the general-path KLMinRepGradProxDescent on the flagship
   logreg (mean-field, DoWG) and hit the analytic optimum on the
   full-rank normal-lognormal (descent).
2. Throughput: steps/s per chunk size; full-rank prox skips the
   in-kernel back-substitution (closed_form_zero_grad), so it should be
   far cheaper than full-rank STL.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.models.normallognormal import make_normallognormal
from advancedvi_jl_tpu.ops.pallas.fused_advi import (
    FULLRANK,
    FusedProxADVI,
    logreg_spec,
    normallognormal_spec,
)


def time_chunks(run, f, steps, reps=10):
    f = run(f)
    _ = float(jax.device_get(f.elbo))  # compile + sync
    best = 1e9
    for _ in range(reps):
        t1 = time.time()
        f = run(f)
        e = float(jax.device_get(f.elbo))
        best = min(best, time.time() - t1)
    return f, steps / best, e


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = prob.unconstrained()
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

    # --- general-path prox reference (30k steps, scan chunks) ---
    alg = avt.KLMinRepGradProxDescent(
        entropy_zerograd=avt.CLOSED_FORM_ZERO_GRAD, n_samples=10,
        optimizer=avt.dowg(),
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
    best_gen = 1e9
    for _ in range(15):
        t1 = time.time()
        state, el = chunk(state)
        e_gen = float(jax.device_get(el))
        best_gen = min(best_gen, time.time() - t1)
    q_gen = alg.output(state)
    print(f"general prox-dowg: {2000/best_gen:.0f} steps/s  elbo={e_gen:.3f}",
          flush=True)

    # --- fused prox engine, meanfield logreg ---
    eng = FusedProxADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=10, optimizer="dowg",
    )
    key = jax.random.key(123)
    for steps in (20_000, 50_000):
        run = jax.jit(lambda s, n=steps: eng.run_chunk(s, key, steps=n))
        f, sps, e_f = time_chunks(run, eng.init(q0.location, q0.scale_diag),
                                  steps, reps=6)
        print(f"fused prox mf(chunk={steps//1000}k): {sps:.0f} steps/s  "
              f"elbo={e_f:.3f}", flush=True)

    # converged-posterior agreement vs general path (independent streams)
    q_f = eng.q(f)
    dloc = np.max(np.abs(np.asarray(q_f.location - q_gen.location)))
    dsc = np.max(np.abs(np.asarray(q_f.scale_diag - q_gen.scale_diag)))
    ek = jax.random.key(7)
    e_eval_f = float(jax.device_get(
        -alg.estimate_objective(ek, q_f, target, n_samples=4096)))
    e_eval_g = float(jax.device_get(
        -alg.estimate_objective(ek, q_gen, target, n_samples=4096)))
    print(f"posterior agreement: max|dloc|={dloc:.4f} max|dscale|={dsc:.4f}  "
          f"eval elbo fused={e_eval_f:.4f} general={e_eval_g:.4f}", flush=True)

    # --- fused prox full-rank logreg (no backsub) vs fused STL full-rank ---
    from advancedvi_jl_tpu.ops.pallas.fused_advi import FusedADVI

    q0fr = avt.FullRankGaussian(jnp.zeros(d), 0.1 * jnp.eye(d))
    eng_fr = FusedProxADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        family=FULLRANK, n_samples=10, optimizer="dowg",
    )
    run = jax.jit(lambda s: eng_fr.run_chunk(s, key, steps=20_000))
    f_fr, sps_fr, e_fr = time_chunks(
        run, eng_fr.init(q0fr.location, q0fr.scale), 20_000, reps=6)
    print(f"fused prox fullrank logreg(chunk=20k): {sps_fr:.0f} steps/s  "
          f"elbo={e_fr:.3f}", flush=True)

    eng_stl = FusedADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        family=FULLRANK, n_samples=10, lr=1e-3,
    )
    run = jax.jit(lambda s: eng_stl.run_chunk(s, key, steps=20_000))
    _, sps_stl, e_stl = time_chunks(
        run, eng_stl.init(q0fr.location, q0fr.scale), 20_000, reps=6)
    print(f"fused STL fullrank logreg(chunk=20k): {sps_stl:.0f} steps/s  "
          f"elbo={e_stl:.3f}  (prox speedup {sps_fr/sps_stl:.2f}x)",
          flush=True)

    # --- full-rank normal-lognormal vs analytic optimum ---
    nln, _, _ = make_normallognormal(jax.random.key(7), n_dims=10)
    dn = nln.dim
    mean_true = jnp.concatenate([nln.mu_y[None], nln.mu_x])
    std_true = jnp.concatenate([nln.sigma_y[None], nln.sigma_x])
    eng_n = FusedProxADVI(
        normallognormal_spec(nln), family=FULLRANK, n_samples=10,
        optimizer="dowg",
    )
    q0n = avt.FullRankGaussian(jnp.zeros(dn), 0.1 * jnp.eye(dn))
    run = jax.jit(lambda s: eng_n.run_chunk(s, key, steps=50_000))
    f_n, sps_n, e_n = time_chunks(
        run, eng_n.init(q0n.location, q0n.scale), 50_000, reps=6)
    q_n = eng_n.q(f_n)
    loc_err = np.max(np.abs(np.asarray(q_n.location - mean_true)))
    diag_err = np.max(np.abs(
        np.asarray(jnp.diagonal(q_n.scale) - std_true)))
    print(f"fused prox fullrank NLN(chunk=50k): {sps_n:.0f} steps/s  "
          f"elbo={e_n:.4f}  loc_err={loc_err:.4f} scale_diag_err={diag_err:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
