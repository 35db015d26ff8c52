"""Converged-posterior parity: solve_mode='pallas' vs 'solve' at d=1024.

The Pallas solve's on-chip rounding (MXU f32) perturbs each gradient by
~5e-3 relative; this checks the OPTIMUM is unaffected: train both modes
7.5k steps on the well-conditioned Gaussian, compare locations, scales,
and an independent high-n ELBO evaluation.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_fullrank_wellcond


def main():
    d, n = 1024, 256
    target, mu, L = normal_fullrank_wellcond(jax.random.key(3), d)
    tgt = target.solve_free()
    outs = {}
    for mode in ("solve", "pallas"):
        q0 = avt.FullRankGaussian(
            jnp.zeros(d), compute_dtype="bfloat16", solve_mode=mode
        )
        alg = avt.KLMinRepGradDescent(
            entropy=avt.STL, n_samples=n, optimizer=optax.adam(2e-3),
            operator=avt.ClipScale(),
        )
        state = alg.init(jax.random.key(0, impl="rbg"), q0, tgt)

        @jax.jit
        def chunk(s):
            def body(c, _):
                st, _ = c
                s2, info = alg.step(st)
                return (s2, info["elbo"]), None

            (s2, el), _ = jax.lax.scan(
                body, (s, jnp.zeros(())), None, length=1500
            )
            return s2, el

        for _ in range(5):
            state, el = chunk(state)
        elbo = float(jax.device_get(el))
        q = alg.output(state)
        nelbo_eval = float(
            jax.device_get(
                alg.estimate_objective(jax.random.key(9), q, tgt, 2048)
            )
        )
        loc_err = float(jnp.linalg.norm(q.location - mu) / jnp.linalg.norm(mu))
        outs[mode] = (q, elbo, -nelbo_eval, loc_err)
        print(
            f"mode={mode}: train_elbo={elbo:.4f} eval_elbo={-nelbo_eval:.4f} "
            f"rel_loc_err={loc_err:.5f}",
            flush=True,
        )
    qa, qb = outs["solve"][0], outs["pallas"][0]
    dloc = float(
        jnp.max(jnp.abs(qa.location - qb.location))
        / (jnp.max(jnp.abs(qa.location)) + 1e-12)
    )
    Ca, Cb = jnp.tril(qa.scale), jnp.tril(qb.scale)
    dsc = float(jnp.linalg.norm(Ca - Cb) / jnp.linalg.norm(Ca))
    print(f"between-mode: rel max dloc={dloc:.5f} rel fro dscale={dsc:.5f}",
          flush=True)


if __name__ == "__main__":
    main()
