"""A/B on chip: solve_mode 'solve' vs 'pallas' — standalone slope timing of
the solve op and full FLOP-bound step throughput at both shapes."""

import sys
import time

import jax
import jax.numpy as jnp
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_fullrank_wellcond
from advancedvi_jl_tpu.ops.pallas.trisolve_kernels import solve_right

L1, L2 = 50, 250


def out(*a):
    print(*a, flush=True)


def timeit_slope(op, reps=4):
    def mk(length):
        @jax.jit
        def run(c0):
            def body(c, _):
                return c + 1e-30 * op(c), None

            c, _ = jax.lax.scan(body, c0, None, length=length)
            return c

        return run

    c0 = jnp.zeros(())
    outs = []
    for length in (L1, L2):
        run = mk(length)
        c = run(c0)
        jax.device_get(c)
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            c = run(c0)
            jax.device_get(c)
            best = min(best, time.time() - t0)
        outs.append(best)
    return (outs[1] - outs[0]) / (L2 - L1)


def main():
    for d, n in ((1024, 256), (2048, 128)):
        C = jnp.tril(
            jax.random.normal(jax.random.key(1), (d, d)) * 0.02
            + 2.0 * jnp.eye(d)
        )
        V = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)

        def xla_op(c):
            return jax.lax.linalg.triangular_solve(
                C, (V + c).T, left_side=True, lower=True, transpose_a=True
            ).T[0, 0]

        def pls_op(c):
            return solve_right(C, V + c, mode="C")[0, 0]

        def pls_ct_op(c):
            return solve_right(C, V + c, mode="CT")[0, 0]

        t_x = timeit_slope(xla_op)
        t_p = timeit_slope(pls_op)
        t_pct = timeit_slope(pls_ct_op)
        out(
            f"d={d} n={n} solve op: xla={t_x*1e6:.1f}us "
            f"pallas_C={t_p*1e6:.1f}us pallas_CT={t_pct*1e6:.1f}us "
            f"({t_x/t_p:.2f}x)"
        )
        # correctness on chip
        W = solve_right(C, V, mode="C")
        ref = jax.lax.linalg.triangular_solve(
            C, V.T, left_side=True, lower=True, transpose_a=True
        ).T
        err = float(jnp.max(jnp.abs(W - ref)) / jnp.max(jnp.abs(ref)))
        out(f"d={d} on-chip rel err vs xla: {err:.2e}")

        target, mu, L = normal_fullrank_wellcond(jax.random.key(3), d)
        tgt = target.solve_free()
        for mode in ("solve", "pallas"):
            q0 = avt.FullRankGaussian(
                jnp.zeros(d), compute_dtype="bfloat16", solve_mode=mode
            )
            alg = avt.KLMinRepGradDescent(
                entropy=avt.STL, n_samples=n, optimizer=optax.adam(1e-3),
                operator=avt.ClipScale(),
            )
            state = alg.init(jax.random.key(0, impl="rbg"), q0, tgt)

            @jax.jit
            def steps500(s):
                def body(c, _):
                    st, _ = c
                    s2, info = alg.step(st)
                    return (s2, info["elbo"]), None

                (s2, el), _ = jax.lax.scan(
                    body, (s, jnp.zeros(())), None, length=500
                )
                return s2, el

            state, el = steps500(state)
            e0 = float(jax.device_get(el))
            best = 1e9
            for _ in range(4):
                t0 = time.time()
                state, el = steps500(state)
                elast = float(jax.device_get(el))
                best = min(best, time.time() - t0)
            out(
                f"d={d} n={n} mode={mode}: {500/best:.0f} steps/s "
                f"elbo_chunk1={e0:.4f} last={elast:.4f}"
            )


if __name__ == "__main__":
    main()
