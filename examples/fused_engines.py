"""The whole fused-engine surface on the flagship logreg model (TPU).

All three reference algorithm constructors run as whole-loop Pallas
kernels (one dispatch per chunk of steps), plus the multi-chain engine:

- FusedADVI        = KLMinRepGradDescent  (ADVI + STL + Adam + ClipScale)
- FusedProxADVI    = KLMinRepGradProxDescent (DoWG + entropy prox step)
- FusedScoreGradVI = KLMinScoreGradDescent (VarGrad; no model gradient)
- FusedChainsADVI  = C independent chains inside ONE kernel

Run: python examples/fused_engines.py   (requires the TPU)
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg

prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
target = prob.unconstrained()
d = prob.dim
q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
spec = avt.fused_spec_for(target)
evalg = avt.KLMinRepGradDescent(entropy=avt.STL, n_samples=10)


def eval_elbo(q):
    return -float(evalg.estimate_objective(jax.random.key(9), q, target, 4096))


# --- ADVI (Adam + ClipScale) ---
eng = avt.FusedADVI(spec, n_samples=10, lr=1e-3)
q, infos, _ = eng.optimize(jax.random.key(0), 100_000, q0, log_every=10_000)
print(f"FusedADVI:         eval ELBO {eval_elbo(q):.3f}")

# --- proximal descent (in-kernel DoWG + closed-form entropy prox) ---
engp = avt.FusedProxADVI(spec, n_samples=10, optimizer="dowg")
qp, _, _ = engp.optimize(jax.random.key(1), 100_000, q0, log_every=10_000)
print(f"FusedProxADVI:     eval ELBO {eval_elbo(qp):.3f}")

# --- BBVI (VarGrad score gradient; model gradient never evaluated) ---
engs = avt.FusedScoreGradVI(spec, n_samples=10, optimizer="dowg",
                            operator="clip")
qs, _, _ = engs.optimize(jax.random.key(2), 100_000, q0, log_every=10_000)
print(f"FusedScoreGradVI:  eval ELBO {eval_elbo(qs):.3f}")

# --- 64 jittered chains in one kernel ---
engc = avt.FusedChainsADVI(spec, n_chains=64, n_samples=10, lr=1e-3)
stc = engc.init(
    q0.location + 0.3 * jax.random.normal(jax.random.key(3), (64, d)),
    jnp.broadcast_to(q0.scale_diag, (64, d)),
)
stc = engc.run_chunk(stc, jax.random.key(4), steps=100_000)
elbos = jax.device_get(stc.elbo)[:64]
print(f"FusedChainsADVI:   64 chains, elbo range "
      f"[{elbos.min():.2f}, {elbos.max():.2f}]")

# --- hyperparameter sweep: 64 learning rates, one dispatch ---
lrs = jnp.logspace(-4.5, -1.5, 64)
engl = avt.FusedChainsADVI(spec, n_chains=64, n_samples=10, lr=lrs)
stl = engl.init(jnp.zeros((64, d)), 0.1 * jnp.ones((64, d)))
stl = engl.run_chunk(stl, jax.random.key(5), steps=60_000)
el = jax.device_get(stl.elbo)[:64]
best = int(el.argmax())
print(f"lr sweep:          best lr {float(lrs[best]):.2e} "
      f"(in-kernel elbo {el[best]:.2f})")
