"""On-chip throughput + convergence of the fused ScoreGrad (VarGrad/BBVI)
engine vs the general KLMinScoreGradDescent path (ClipScale on both arms;
the IdentityOperator default lets sigma cross zero on logreg in BOTH
paths - the library warns about exactly this)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.models.normallognormal import make_normallognormal
from advancedvi_jl_tpu.ops.pallas.fused_advi import (
    FusedScoreGradVI,
    logreg_spec,
    normallognormal_spec,
)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = prob.unconstrained()
    d = prob.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    key = jax.random.key(123)

    alg = avt.KLMinScoreGradDescent(
        n_samples=10, optimizer=avt.dowg(), operator=avt.ClipScale(),
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
    best = 1e9
    for _ in range(15):
        t1 = time.time()
        state, el = chunk(state)
        e_gen = float(jax.device_get(el))
        best = min(best, time.time() - t1)
    q_gen = alg.output(state)
    print(f"general bbvi(dowg+clip): {2000/best:.0f} steps/s  "
          f"elbo={e_gen:.3f}", flush=True)

    eng = FusedScoreGradVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_samples=10, optimizer="dowg", operator="clip",
    )
    f = eng.init(q0.location, q0.scale_diag)
    run = jax.jit(lambda s: eng.run_chunk(s, key, steps=50_000))
    f = run(f)
    _ = float(jax.device_get(f.elbo))
    best_f = 1e9
    for _ in range(6):
        t1 = time.time()
        f = run(f)
        e_f = float(jax.device_get(f.elbo))
        best_f = min(best_f, time.time() - t1)
    sps = 50_000 / best_f
    print(f"fused bbvi(dowg+clip, 50k chunks): {sps:.0f} steps/s  "
          f"elbo={e_f:.3f}  speedup {sps/(2000/best):.2f}x", flush=True)

    q_f = eng.q(f)
    dloc = np.max(np.abs(np.asarray(q_f.location - q_gen.location)))
    dsc = np.max(np.abs(np.asarray(q_f.scale_diag - q_gen.scale_diag)))
    ek = jax.random.key(7)
    e_eval_f = float(jax.device_get(
        -alg.estimate_objective(ek, q_f, target, n_samples=4096)))
    e_eval_g = float(jax.device_get(
        -alg.estimate_objective(ek, q_gen, target, n_samples=4096)))
    print(f"posterior agreement: max|dloc|={dloc:.4f} max|dscale|={dsc:.4f}"
          f"  eval elbo fused={e_eval_f:.4f} general={e_eval_g:.4f}",
          flush=True)

    # convergence on the analytic target (BBVI's variance needs adam here)
    nln, _, _ = make_normallognormal(jax.random.key(7), n_dims=10)
    dn = nln.dim
    mean_true = jnp.concatenate([nln.mu_y[None], nln.mu_x])
    std_true = jnp.concatenate([nln.sigma_y[None], nln.sigma_x])
    engn = FusedScoreGradVI(
        normallognormal_spec(nln), n_samples=16, optimizer="adam",
        lr=2e-3, operator="clip",
    )
    fn_ = engn.init(jnp.zeros(dn), 0.1 * jnp.ones(dn))
    runn = jax.jit(lambda s: engn.run_chunk(s, key, steps=50_000))
    for _ in range(4):
        fn_ = runn(fn_)
    e_n = float(jax.device_get(fn_.elbo))
    q_n = engn.q(fn_)
    loc_err = float(jnp.max(jnp.abs(q_n.location - mean_true)))
    sd_err = float(jnp.max(jnp.abs(q_n.scale_diag - std_true)))
    print(f"fused bbvi NLN d=11 (adam+clip, 200k steps): elbo={e_n:.4f}  "
          f"loc_err={loc_err:.4f} sd_err={sd_err:.4f}", flush=True)


if __name__ == "__main__":
    main()
