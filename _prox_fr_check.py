"""Does the GENERAL-path KLMinRepGradProxDescent on full-rank logreg show
the same slow convergence the fused prox engine shows? (parity check at
the algorithm level, on chip)."""

import time

import jax
import jax.numpy as jnp

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.logreg import make_logreg


def main():
    prob = make_logreg(jax.random.key(11), n_data=208, n_features=60)
    target = prob.unconstrained()
    d = prob.dim
    q0 = avt.FullRankGaussian(jnp.zeros(d), 0.1 * jnp.eye(d))

    alg = avt.KLMinRepGradProxDescent(
        entropy_zerograd=avt.CLOSED_FORM_ZERO_GRAD, n_samples=10,
        optimizer=avt.dowg(),
    )
    state = alg.init(jax.random.key(0, impl="rbg"), q0, target)

    @jax.jit
    def chunk(s, n=2000):
        def body(c, _):
            st, _ = c
            s2, info = alg.step(st)
            return (s2, info["elbo"]), None

        (s2, el), _ = jax.lax.scan(
            body, (s, jnp.zeros(())), None, length=n, unroll=8
        )
        return s2, el

    for k in range(15):
        state, el = chunk(state)
        e = float(jax.device_get(el))
        if k % 3 == 0 or k == 14:
            eta = float(jax.device_get(
                avt.stepsize_from_opt_state(state.opt_state)))
            print(f"steps={2000*(k+1):6d}  elbo={e:9.3f}  eta={eta:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
