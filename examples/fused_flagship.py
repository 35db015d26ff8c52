"""Whole-loop fused ADVI on the flagship logreg model (TPU).

The entire training loop (on-chip RNG, reparameterized draw, gradient,
Adam, ClipScale, polynomial averaging) runs inside one Pallas kernel —
one dispatch per 50k-step chunk, ~1M steps/s on a v5e chip (4x the
already-scan-fused general path; BENCH_NOTES "Round 4").

Run: python examples/fused_flagship.py   (requires the TPU)
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg

prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
d = prob.dim
q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))

# the registry maps supported targets to in-kernel model specs
eng = avt.FusedADVI(
    avt.fused_spec_for(prob.unconstrained()), n_samples=10, lr=1e-3
)
q, infos, state = eng.optimize(
    jax.random.key(0), 150_000, q0, log_every=1_000, show_progress=True,
)
print(f"\nfinal elbo {infos[-1]['elbo']:.3f} after {infos[-1]['iteration']} steps")

# the same posterior through the general API (for comparison / evaluation)
alg = avt.KLMinRepGradDescent(entropy=avt.STL, n_samples=10)
elbo = -float(alg.estimate_objective(jax.random.key(9), q, prob.unconstrained(), 4096))
print(f"eval ELBO (n=4096): {elbo:.3f}")
