"""On-chip validation of the fused traced driver (FusedADVI.optimize).

1. Mosaic lowering of the in-kernel trace store (pl.when + dynamic row
   store) — interpret mode cannot validate this.
2. Driver contract: infos rows on the log_every grid, convergence.
3. Trace overhead: traced vs untraced chunk throughput.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.models.normallognormal import make_normallognormal
from advancedvi_jl_tpu.ops.pallas.fused_advi import FULLRANK, FusedADVI


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    lg = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = lg.dim
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), 0.1 * jnp.ones(d))
    eng = avt.FusedLogRegADVI(lg.X, lg.y, n_samples=10, lr=1e-3)

    t0 = time.time()
    q, infos, state = eng.optimize(
        jax.random.key(0), 150_000, q0, chunk_size=50_000, log_every=1_000,
    )
    wall = time.time() - t0
    iters = [r["iteration"] for r in infos]
    assert iters == list(range(1_000, 150_001, 1_000)), iters[:5]
    elbos = np.array([r["elbo"] for r in infos])
    assert np.isfinite(elbos).all()
    assert elbos[-1] > -110.0, elbos[-1]
    assert elbos[0] < elbos[-1]  # descent direction
    print(
        f"meanfield optimize(150k, log_every=1k): {wall:.2f}s "
        f"({150_000/wall:.0f} steps/s incl. compile), "
        f"elbo {elbos[0]:.2f} -> {elbos[-1]:.2f}, {len(infos)} rows",
        flush=True,
    )

    # trace overhead: traced vs untraced 50k chunks (same compiled state)
    st = eng.init(q0.location, q0.scale_diag)
    key = jax.random.key(1)
    run_plain = jax.jit(lambda s: eng.run_chunk(s, key, 50_000))
    run_traced = jax.jit(
        lambda s: eng.run_chunk_traced(s, key, 50_000, log_every=1_000)
    )
    st = run_plain(st)
    _ = float(jax.device_get(st.elbo))
    best_p = 1e9
    for _ in range(3):
        t0 = time.time()
        st = run_plain(st)
        _ = float(jax.device_get(st.elbo))
        best_p = min(best_p, time.time() - t0)
    st2, tr = run_traced(st)
    _ = float(jax.device_get(st2.elbo))
    best_t = 1e9
    for _ in range(3):
        t0 = time.time()
        st2, tr = run_traced(st2)
        _ = float(jax.device_get(st2.elbo))
        best_t = min(best_t, time.time() - t0)
    print(
        f"50k chunk: plain {50_000/best_p:.0f} steps/s, traced "
        f"{50_000/best_t:.0f} steps/s ({100*(best_t/best_p-1):.1f}% "
        "overhead)",
        flush=True,
    )
    tr = np.asarray(jax.device_get(tr))
    assert tr.shape == (50,) and np.isfinite(tr).all()

    # full-rank NLN through the driver
    nln, mu_true, sd_true = make_normallognormal(jax.random.key(7), 10)
    engf = FusedADVI(
        avt.fused_spec_for(nln.unconstrained()), family=FULLRANK,
        n_samples=10, lr=2e-3,
    )
    qf0 = avt.FullRankGaussian(jnp.zeros(nln.dim), 0.1 * jnp.eye(nln.dim))
    qf, infosf, _ = engf.optimize(
        jax.random.key(2), 60_000, qf0, chunk_size=60_000, log_every=5_000,
    )
    err = float(jnp.max(jnp.abs(qf.location - mu_true)))
    print(
        f"fullrank NLN optimize(60k): loc err {err:.4f}, "
        f"final elbo {infosf[-1]['elbo']:.4f}, rows {len(infosf)}",
        flush=True,
    )
    assert err < 0.02
    print("FUSED DRIVER CHIP VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main()
