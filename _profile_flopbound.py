"""Component-level timing of the FLOP-bound full-rank step (d=1024/2048).

Method: each op runs inside lax.scan with a REAL carry dependence
(c += 1e-30 * scalar(op_output)), timed at two loop lengths; the
per-iteration cost is the slope — immune to the ~24 ms axon tunnel
round-trip and to any constant dispatch overhead.
"""

import time

import jax
import jax.numpy as jnp
import optax

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_fullrank_wellcond

L1, L2 = 50, 250


def _timed(run, c0, reps=4):
    c = run(c0)
    jax.device_get(c)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        c = run(c0)
        jax.device_get(c)
        best = min(best, time.time() - t0)
    return best


def timeit_slope(op, reps=4):
    """op: carry scalar -> output scalar (really computed, scaled into carry).
    Returns per-iteration seconds from the (L2 - L1) slope."""

    def mk(length):
        @jax.jit
        def run(c0):
            def body(c, _):
                return c + 1e-30 * op(c), None

            c, _ = jax.lax.scan(body, c0, None, length=length)
            return c

        return run

    c0 = jnp.zeros(())
    t1 = _timed(mk(L1), c0, reps)
    t2 = _timed(mk(L2), c0, reps)
    return (t2 - t1) / (L2 - L1)


def main():
    for d, n in ((1024, 256), (2048, 128)):
        target, mu, L = normal_fullrank_wellcond(jax.random.key(3), d)
        tgt = target.solve_free()
        q0 = avt.FullRankGaussian(jnp.zeros(d), compute_dtype="bfloat16")
        alg = avt.KLMinRepGradDescent(
            entropy=avt.STL, n_samples=n, optimizer=optax.adam(1e-3),
            operator=avt.ClipScale(),
        )
        state = alg.init(jax.random.key(0, impl="rbg"), q0, tgt)

        @jax.jit
        def burn(s):
            def body(c, _):
                s2, _ = alg.step(c)
                return s2, None

            s2, _ = jax.lax.scan(body, s, None, length=50)
            return s2

        state = burn(state)
        q = state.q
        key = jax.random.key(7, impl="rbg")
        V = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)
        A = jax.random.normal(jax.random.key(2), (d, d), jnp.float32)
        g = jax.tree.map(jnp.ones_like, q)
        opt = optax.adam(1e-3)
        opt_state = opt.init(q)
        z_fix = q.sample(key, n)

        rows = {}

        def full_step(c):
            s2, info = alg.step(state.replace(iteration=c.astype(jnp.int32)))
            return info["elbo"] + s2.q.scale[0, 0]

        rows["full_step"] = timeit_slope(full_step)

        def sample_fwd(c):
            k = jax.random.fold_in(key, c.astype(jnp.int32))
            z, u = q.sample_with_base(k, n)
            return z[0, 0]

        rows["sample_fwd"] = timeit_slope(sample_fwd)

        def sample_fwd_bwd(c):
            k = jax.random.fold_in(key, c.astype(jnp.int32))

            def f(qq):
                z, u = qq.sample_with_base(k, n)
                return z.sum()

            return jax.grad(f)(q).scale[0, 0]

        rows["sample_fwd_bwd"] = timeit_slope(sample_fwd_bwd)

        def logp_grad(c):
            zz = z_fix + c
            f = lambda z2: jnp.sum(jax.vmap(tgt.log_density)(z2))
            return jax.grad(f)(zz)[0, 0]

        rows["target_logp_grad"] = timeit_slope(logp_grad)

        def solve_op(c):
            return q.apply_inv_scale_T(V + c)[0, 0]

        rows["stl_solve_nrhs"] = timeit_slope(solve_op)

        def adam_op(c):
            gg = jax.tree.map(lambda a: a + c, g)
            updates, os2 = opt.update(gg, opt_state, q)
            q2 = jax.tree.map(lambda a, b: a + b, q, updates)
            q3 = avt.ClipScale().apply(q2, os2)
            return q3.scale[0, 0]

        rows["adam_clipscale"] = timeit_slope(adam_op)

        def tril_op(c):
            return jnp.tril(q.scale + c)[d - 1, 0]

        rows["tril_mask_pass"] = timeit_slope(tril_op)

        def mm_op(c):
            return ((V + c) @ A)[0, 0]

        rows["matmul_f32_nd_dd"] = timeit_slope(mm_op)

        def mm_bf16_op(c):
            return jnp.matmul(
                (V + c).astype(jnp.bfloat16),
                A.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )[0, 0]

        rows["matmul_bf16_nd_dd"] = timeit_slope(mm_bf16_op)

        from advancedvi_jl_tpu.ops.trinv import tril_inverse

        def trinv_op(c):
            return tril_inverse(jnp.tril(q.scale + c))[d - 1, 0]

        rows["tril_inverse"] = timeit_slope(trinv_op)

        print(f"=== d={d} n={n} ===", flush=True)
        full = rows["full_step"]
        for k2, v in rows.items():
            print(
                f"{k2:22s} {v*1e6:9.1f} us   {100*v/full:6.1f}% of step",
                flush=True,
            )


if __name__ == "__main__":
    main()
