"""ELBO trajectory of the fused prox full-rank logreg engine (on-chip
RNG): is it converging, just slower than the general path's trajectory,
or stuck?"""

import jax
import jax.numpy as jnp

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg
from advancedvi_jl_tpu.ops.pallas.fused_advi import (
    FULLRANK,
    FusedProxADVI,
    logreg_spec,
)


def main():
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    d = prob.dim
    q0 = avt.FullRankGaussian(jnp.zeros(d), 0.1 * jnp.eye(d))
    eng = FusedProxADVI(
        logreg_spec(prob.X, prob.y, prior_scale=prob.prior_scale,
                    likeadj=float(prob.likeadj)),
        family=FULLRANK, n_samples=10, optimizer="dowg",
    )
    state = eng.init(q0.location, q0.scale)
    for k in range(8):
        state, trace = eng.run_chunk_traced(
            state, jax.random.key(123), steps=10_000, log_every=2_000
        )
        tr = [f"{float(e):.1f}" for e in jax.device_get(trace)]
        v = float(jax.device_get(state.v_mu[0, 0]))
        r = float(jax.device_get(state.v_mu[0, 1]))
        eta = r * r / v ** 0.5
        print(f"steps={10_000*(k+1):6d}  trace={tr}  eta={eta:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
