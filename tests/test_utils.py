"""Profiling-guard and misc utils tests."""

import jax
import jax.numpy as jnp
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_meanfield
from advancedvi_jl_tpu.utils.profiling import RetraceError, retrace_guard


def test_retrace_guard_passes_on_stable_step(key):
    target, _, _ = normal_meanfield(jax.random.key(1), 5)
    q0 = avt.MeanFieldGaussian(jnp.zeros(5), jnp.ones(5))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=4, operator=avt.ClipScale()
    )
    state = alg.init(key, q0, target)
    step = jax.jit(alg.step)
    state, _ = step(state)  # warmup
    with retrace_guard(step):
        for _ in range(20):
            state, _ = step(state)


def test_retrace_guard_detects_retrace(key):
    @jax.jit
    def f(x):
        return x * 2

    f(jnp.ones(3))
    with pytest.raises(RetraceError):
        with retrace_guard(f):
            f(jnp.ones(4))  # new shape -> retrace
