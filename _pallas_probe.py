"""Isolation probes for Pallas TPU lowering features the fused engine
relies on — run each in a SEPARATE process (`python _pallas_probe.py N`)
so a remote-compile crash is attributable to one feature:

  1: fori_loop + dynamic ref LOAD (pl.ds) per iteration    [noise path]
  2: fori_loop + dynamic ref STORE (pl.ds) per iteration   [elbo trace]
  3: fori_loop + pl.when-conditional dynamic store         [old trace]
  4: lax.rem-scheduled dynamic load (minibatch window)      [minibatch]

Each probe is a tiny kernel (compile should take seconds); a hang or
crash identifies the unsupported feature.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 16


def probe1():
    def kernel(x_ref, o_ref):
        def body(i, acc):
            row = x_ref[pl.ds(i * 8, 8), :]
            return acc + jnp.sum(row)

        acc = jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
        o_ref[:] = jnp.full((1, 128), acc)

    x = jnp.ones((STEPS * 8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(x)
    assert float(out[0, 0]) == STEPS * 8 * 128


def probe2():
    def kernel(o_ref):
        o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

        def body(i, acc):
            acc = acc + 1.0
            o_ref[pl.ds(i, 1), :] = jnp.full((1, 128), acc)
            return acc

        jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))

    out = pl.pallas_call(
        kernel,
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, 128), jnp.float32),
    )()
    assert float(out[-1, 0]) == STEPS


def probe3():
    def kernel(o_ref):
        o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

        def body(i, acc):
            acc = acc + 1.0

            @pl.when(i % 2 == 1)
            def _():
                o_ref[pl.ds(i // 2, 1), :] = jnp.full((1, 128), acc)

            return acc

        jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))

    out = pl.pallas_call(
        kernel,
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS // 2, 128), jnp.float32),
    )()
    assert float(out[-1, 0]) == STEPS


def probe4():
    def kernel(x_ref, o_ref):
        def body(i, acc):
            k = jax.lax.rem(i, 3)
            row = x_ref[pl.ds(k * 8, 8), :]
            return acc + jnp.sum(row)

        acc = jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
        o_ref[:] = jnp.full((1, 128), acc)

    x = jnp.ones((24, 128), jnp.float32)
    _ = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(x)


if __name__ == "__main__":
    n = int(sys.argv[1])
    t0 = time.time()
    print(f"device: {jax.devices()[0]}  probe {n}", flush=True)
    [probe1, probe2, probe3, probe4][n - 1]()
    print(f"probe {n} OK in {time.time() - t0:.1f}s", flush=True)
