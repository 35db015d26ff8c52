"""On-chip demo: sweep 64 learning rates in ONE kernel dispatch
(FusedChainsADVI per-chain lr), then report the winner."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.ops.pallas.fused_advi import logreg_spec
from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = prob.unconstrained()
    d = prob.dim
    C = 64
    lrs = jnp.logspace(-4.5, -1.5, C)  # 3 decades
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        n_chains=C, n_samples=10, lr=lrs,
    )
    st = eng.init(jnp.zeros((C, d)), 0.1 * jnp.ones((C, d)))
    run = jax.jit(lambda s: eng.run_chunk(s, jax.random.key(0), 30_000))
    t0 = time.time()
    st = run(st)
    st = run(st)  # 60k steps per lr
    el = np.asarray(jax.device_get(st.elbo))[:C]
    wall = time.time() - t0
    # evaluate the winner on the common estimator
    evalg = avt.KLMinRepGradDescent(entropy=avt.STL, n_samples=10)
    qs = eng.q(st)
    best = int(np.nanargmax(el))
    q_best = avt.MeanFieldGaussian(qs.location[best], qs.scale_diag[best])
    e_best = -float(jax.device_get(
        evalg.estimate_objective(jax.random.key(9), q_best, target, 4096)))
    print(f"swept {C} lrs x 60k steps in {wall:.1f}s (incl. compile): "
          f"best lr={float(lrs[best]):.2e} in-kernel elbo={el[best]:.3f} "
          f"eval elbo={e_best:.4f}", flush=True)
    lo = np.asarray(lrs)
    good = el > -110
    print(f"lrs landing in the posterior band (elbo > -110): "
          f"[{lo[good].min():.2e}, {lo[good].max():.2e}] "
          f"({int(good.sum())}/{C})", flush=True)


if __name__ == "__main__":
    main()
