"""A/B: solve_mode 'solve' vs 'inverse' (contiguous pair-merge trinv) on the
FLOP-bound full-rank configs, plus standalone op timings.  Run on chip."""

import sys
import time

import jax
import jax.numpy as jnp
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_fullrank_wellcond
from advancedvi_jl_tpu.ops.trinv import tril_inverse


def out(*a):
    print(*a)
    sys.stdout.flush()


def timeit(f, *args, reps=10):
    o = f(*args)
    jax.device_get(jax.tree.leaves(o)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        o = f(*args)
        jax.device_get(jax.tree.leaves(o)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    for d, n in ((1024, 256), (2048, 128)):
        target, mu, L = normal_fullrank_wellcond(jax.random.key(3), d)
        tgt = target.solve_free()

        # standalone: XLA triangular_solve vs blocked inverse + matmul
        C = jnp.tril(
            jax.random.normal(jax.random.key(1), (d, d)) * 0.02
            + 2.0 * jnp.eye(d)
        )
        V = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)

        @jax.jit
        def via_solve(C, V):
            return jax.lax.linalg.triangular_solve(
                C, V.T, left_side=True, lower=True, transpose_a=True
            ).T.sum()

        @jax.jit
        def via_inv(C, V):
            T = tril_inverse(C)
            return (V @ T).sum()

        @jax.jit
        def inv_only(C):
            return tril_inverse(C).sum()

        t_solve = timeit(via_solve, C, V)
        t_inv = timeit(via_inv, C, V)
        t_invonly = timeit(inv_only, C)
        out(
            f"d={d} n={n} standalone: solve={t_solve*1e6:.0f}us "
            f"inv+mm={t_inv*1e6:.0f}us inv_only={t_invonly*1e6:.0f}us"
        )

        # full step A/B
        for mode in ("solve", "inverse"):
            q0 = avt.FullRankGaussian(
                jnp.zeros(d), compute_dtype="bfloat16", solve_mode=mode
            )
            alg = avt.KLMinRepGradDescent(
                entropy=avt.STL, n_samples=n, optimizer=optax.adam(1e-3),
                operator=avt.ClipScale(),
            )
            state = alg.init(jax.random.key(0, impl="rbg"), q0, tgt)

            @jax.jit
            def steps100(s):
                def body(c, _):
                    st, _ = c
                    s2, info = alg.step(st)
                    return (s2, info["elbo"]), None

                (s2, el), _ = jax.lax.scan(
                    body, (s, jnp.zeros(())), None, length=100
                )
                return s2, el

            state, el = steps100(state)
            elbo0 = float(jax.device_get(el))
            best = 1e9
            for _ in range(4):
                t0 = time.time()
                state, el = steps100(state)
                elast = float(jax.device_get(el))
                best = min(best, time.time() - t0)
            out(
                f"d={d} n={n} mode={mode}: {100/best:.0f} steps/s "
                f"elbo(after warm chunk)={elbo0:.4f} last={elast:.4f}"
            )


if __name__ == "__main__":
    main()
