"""Round-5 chip session 9: the mixed per-chain RULE sweep on hardware —
one dispatch, 40 chains, all five update rules (8 chains each), per-rule
aggregate numbers (VERDICT r4 #9's done-criterion)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.time()
    print(f"device: {jax.devices()[0]}", flush=True)
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import logreg_spec
    from advancedvi_jl_tpu.ops.pallas.fused_chains import FusedChainsADVI

    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = prob.dim
    rules = ["adam", "descent", "dowg", "dog", "cocob"] * 8
    C = len(rules)
    lrs = jnp.full((C,), 1e-3)
    eng = FusedChainsADVI(
        logreg_spec(prob.X, prob.y), n_chains=C, n_samples=10,
        lr=lrs, optimizer=rules,
    )
    rng = np.random.default_rng(0)
    st = eng.init(
        jnp.asarray(rng.normal(0, 0.3, (C, d)).astype(np.float32)),
        0.1 * jnp.ones((C, d), jnp.float32),
    )
    key = jax.random.key(7)
    steps = 30_000
    run = jax.jit(lambda s: eng.run_chunk(s, key, steps=steps))
    tc0 = time.time()
    st = run(st)
    _ = float(jax.device_get(st.elbo[0]))
    tc = time.time() - tc0
    t1 = time.time()
    st = run(st)
    el = np.asarray(jax.device_get(st.elbo[:C]))
    agg = C * steps / (time.time() - t1)
    print(f"RESULT mixed-rule sweep C={C} (5 rules x 8 chains, one "
          f"dispatch): compile {tc:.1f}s, {agg/1e6:.2f}M chain-steps/s",
          flush=True)
    for r in ("adam", "descent", "dowg", "dog", "cocob"):
        idx = [i for i, o in enumerate(rules) if o == r]
        v = el[idx]
        print(f"  {r:8s}: median elbo {np.median(v):8.2f}  "
              f"range [{v.min():8.2f}, {v.max():8.2f}]  finite "
              f"{np.isfinite(v).sum()}/8", flush=True)
    print(f"CHIP SESSION 9 COMPLETE in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
