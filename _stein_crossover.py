"""hessian='stein' vs 'exact' crossover on chip (VERDICT r2 #7 bench row):
KLMinNaturalGradDescent on the well-conditioned Gaussian at d=512/1024,
n=16 — steps/s for both estimators + agreement of the converged scale."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.algorithms.measure_space import KLMinNaturalGradDescent
from advancedvi_jl_tpu.models.normal import normal_fullrank_wellcond


def main():
    for d in (512, 1024):
        target, mu, L = normal_fullrank_wellcond(jax.random.key(3), d)
        res = {}
        for h in ("exact", "stein"):
            alg = KLMinNaturalGradDescent(
                stepsize=1e-2, n_samples=16, hessian=h
            )
            q0 = avt.FullRankGaussian(jnp.zeros(d))
            state = alg.init(jax.random.key(0, impl="rbg"), q0, target)

            @jax.jit
            def chunk(s):
                def body(c, _):
                    s2, info = alg.step(c)
                    return s2, None

                s2, _ = jax.lax.scan(body, s, None, length=300)
                return s2

            state = chunk(state)
            jax.device_get(state.q.location)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                state = chunk(state)
                jax.device_get(state.q.location)
                best = min(best, time.time() - t0)
            q = alg.output(state)
            loc_err = float(
                jnp.linalg.norm(q.location - mu) / jnp.linalg.norm(mu)
            )
            res[h] = (300 / best, q, loc_err)
            print(
                f"d={d} hessian={h}: {300/best:.0f} steps/s "
                f"rel_loc_err={loc_err:.5f}",
                flush=True,
            )
        qe, qs = res["exact"][1], res["stein"][1]
        dcov = float(
            jnp.linalg.norm(qe.cov() - qs.cov()) / jnp.linalg.norm(qe.cov())
        )
        print(f"d={d} stein-vs-exact rel cov gap: {dcov:.4f}", flush=True)


if __name__ == "__main__":
    main()
