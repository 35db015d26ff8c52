"""Any model in the fused whole-loop engine — no hand-derived gradients.

Round-5 surface (ops/pallas/fused_advi.ad_spec): the fused engines trace
``jax.vmap(jax.value_and_grad(log_density))`` INSIDE the Pallas kernel,
so any jnp-only target runs whole-loop fused the way the reference's AD
serves any model in its hot loop (repgradelbo.jl:142-149):

1. a ppl.ingest'd probabilistic program (effect handlers, bijections),
2. a raw log-density via FusedModelSpec.from_log_density,
3. an HBM-streamed 500k-row subsampled logreg (per-step DMA slabs).

Run: python examples/fused_ad_models.py   (requires the TPU)
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import advancedvi_jl_tpu as avt
import advancedvi_jl_tpu.ppl as ppl

# --- 1. a probabilistic program, fused -------------------------------
rng = np.random.default_rng(0)
n, p = 512, 8
X = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
w_true = jnp.asarray(rng.normal(size=p).astype(np.float32))
y = jnp.asarray(
    (rng.random(n) < jax.nn.sigmoid(X @ w_true)).astype(np.float32)
)


def model(data):
    sigma = ppl.sample("sigma", ppl.LogNormal(0.0, 1.0))
    beta = ppl.sample("beta", ppl.Normal(jnp.zeros(p), sigma))
    logits = data["X"] @ beta
    ppl.sample("y", ppl.Bernoulli(logits=logits), obs=data["y"])


m = ppl.ingest(model, data={"X": X, "y": y})
spec = avt.fused_spec_for(m.target)          # -> AD-derived spec
eng = avt.FusedADVI(spec, n_samples=10, lr=5e-3)
q, infos, _ = eng.optimize(jax.random.key(0), 60_000, m.q_init(),
                           log_every=10_000)
print(f"ppl model fused:      final elbo {infos[-1]['elbo']:.2f}")
beta_hat = m.constrain(np.asarray(q.location))["beta"]
print(f"  beta err            {float(jnp.linalg.norm(beta_hat - w_true)):.3f}")

# --- 2. a raw log-density, fused --------------------------------------
d = 16
anchor = jnp.linspace(-2.0, 2.0, d)
spec2 = avt.FusedModelSpec.from_log_density(
    lambda t, a: -0.5 * jnp.sum((t - a) ** 2) - 0.05 * jnp.sum(t ** 4),
    d, data=anchor,
)
eng2 = avt.FusedADVI(spec2, n_samples=10, lr=1e-2)
q2, _, _ = eng2.optimize(
    jax.random.key(1), 60_000,
    avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d)),
    log_every=10_000,
)
print(f"custom log-density:   loc[0..3] {np.asarray(q2.location[:4]).round(2)}")

# --- 3. HBM-streamed 500k-row doubly-stochastic logreg ----------------
n_big = 500_000
Xb = jax.random.normal(jax.random.key(2), (n_big, p), jnp.float32)
yb = (
    jax.random.uniform(jax.random.key(3), (n_big,))
    < jax.nn.sigmoid(Xb @ w_true)
).astype(jnp.float32)
spec3 = avt.logreg_minibatch_hbm_spec(Xb, yb, batch_size=512,
                                      key=jax.random.key(4))
eng3 = avt.FusedADVI(spec3, n_samples=10, lr=1e-3)
q3, infos3, _ = eng3.optimize(
    jax.random.key(5), 60_000,
    avt.MeanFieldGaussian(jnp.zeros(p + 1), 0.1 * jnp.ones(p + 1)),
    log_every=10_000,
)
print(f"streamed 500k logreg: final elbo {infos3[-1]['elbo']:.1f}, "
      f"beta err {float(jnp.linalg.norm(q3.location[:p] - w_true)):.3f}")
