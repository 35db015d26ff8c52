"""Round-5 chip session 7: seed study of the scoregrad RNG-validation
FAIL (-104.67 vs band -103.77±0.3 under the step-indexed stream).

Question: seed sensitivity of VarGrad+DoWG (band mis-calibrated for this
estimator's variance), or a systematic defect of the per-step-reseeded
stream?  Evidence: final eval-ELBO across 6 fused seeds + the general
path (XLA threefry stream, same algorithm/horizon) for reference.
"""

import time

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, flush=True)


def main():
    t00 = time.time()
    log(f"device: {jax.devices()[0]}")
    import advancedvi_jl_tpu as avt
    from advancedvi_jl_tpu.models.logreg import make_logreg
    from advancedvi_jl_tpu.ops.pallas.fused_advi import (
        FusedScoreGradVI,
        logreg_spec,
    )

    lg = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = lg.unconstrained()
    dl = lg.dim
    spec = logreg_spec(lg.X, lg.y)
    evalg = avt.KLMinRepGradDescent(entropy=avt.STL, n_samples=10)

    def eval_elbo(q):
        return -float(jax.device_get(evalg.estimate_objective(
            jax.random.key(9), q, target, 4096
        )))

    engs = FusedScoreGradVI(spec, n_samples=10, optimizer="dowg",
                            operator="clip")
    vals = []
    for seed in (5, 0, 1, 2, 3, 4):
        key = jax.random.key(seed)
        sts = engs.init(jnp.zeros(dl), 0.1 * jnp.ones(dl))
        run = jax.jit(lambda s, k=key: engs.run_chunk(s, k, 50_000))
        for _ in range(3):
            sts = run(sts)
        e = eval_elbo(engs.q(sts))
        vals.append(e)
        log(f"  fused scoregrad seed {seed}: eval elbo {e:.4f}")
    import numpy as np

    v = np.asarray(vals)
    log(
        f"RESULT fused scoregrad 6 seeds: mean {v.mean():.3f}, "
        f"min {v.min():.3f}, max {v.max():.3f}, std {v.std():.3f}"
    )

    # general path, same algorithm/horizon, one seed (XLA stream)
    try:
        alg = avt.KLMinScoreGradDescent(
            n_samples=10, optimizer=avt.dowg(), operator=avt.ClipScale()
        )
        state = alg.init(jax.random.key(5), avt.MeanFieldGaussian(
            jnp.zeros(dl), 0.1 * jnp.ones(dl)), target)

        def chunk(s):
            def body(c, _):
                st, _ = c
                st2, info = alg.step(st)
                return (st2, info["elbo"]), None
            (s2, e), _ = jax.lax.scan(
                body, (s, jnp.zeros(())), None, length=25_000
            )
            return s2, e

        rung = jax.jit(chunk)
        for _ in range(6):
            state, _ = rung(state)
        eg = eval_elbo(alg.output(state))
        log(f"RESULT general scoregrad (threefry stream): eval elbo {eg:.4f}")
    except Exception as exc:
        log(f"general scoregrad FAILED: {repr(exc)[:200]}")

    log(f"CHIP SESSION 7 COMPLETE in {time.time()-t00:.1f}s")


if __name__ == "__main__":
    main()
