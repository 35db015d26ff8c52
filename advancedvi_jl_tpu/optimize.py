"""The `optimize` driver loop.

TPU-native redesign of the reference driver (reference: src/optimize.jl:42-94).
The reference runs a host loop calling a dynamically-dispatched `step`; here
the step is compiled once and driven either

- in **scan mode** (default): `lax.scan` over chunks of iterations — the host
  syncs only once per chunk, so tiny VI models run at device speed instead of
  host-dispatch speed (the main perf design decision, SURVEY.md §7); or
- in **callback mode**: a host loop around the jitted step, used when a
  per-iteration Python callback is supplied (host sync per step, same
  semantics as the reference's callback contract, common.jl:106-118).

Per-iteration ``info`` dicts come back as stacked device arrays (scan mode)
and are converted to a list of dicts for reference parity.  Warm-starting via
``state=`` reproduces the reference's split-run == single-run invariant
(test/general/optimize.jl:30-41) because the PRNG key and iteration counter
live in the state.
"""

from __future__ import annotations

import weakref
from typing import Any, Callable, Optional

import jax


class DivergenceError(RuntimeError):
    """Raised when the objective became non-finite (reference: common.jl:83-89)."""


# Compiled-step cache keyed on the algorithm object: repeated optimize()
# calls with the same algorithm (warm-start segments, periodic evaluation
# loops) reuse the jitted scan instead of recompiling.  WeakKey so dropping
# the algorithm frees the executables.
_JIT_CACHE: "weakref.WeakKeyDictionary[Any, dict]" = weakref.WeakKeyDictionary()


def _cached_jit(algorithm, kind: str, make):
    try:
        per_alg = _JIT_CACHE.setdefault(algorithm, {})
    except TypeError:  # unhashable/non-weakrefable algorithm
        return make()
    if kind not in per_alg:
        per_alg[kind] = make()
    return per_alg[kind]


def _steps_scanned(alg, state, n_steps: int, unroll: int = 1):
    def body(carry, _):
        new_state, info = alg.step(carry)
        return new_state, info

    return jax.lax.scan(body, state, None, length=n_steps, unroll=unroll)


def _steps_grouped(
    alg, state, n_groups: int, group: int, start_it,
    unroll: int = 1, early_exit: bool = True,
):
    """Nested scan recording one info row per ``group`` steps.

    Host memory stays O(n_groups) instead of O(n_groups * group) — the
    scalable path for 10^6-iteration runs (the reference streams to a
    progress meter instead of materializing, optimize.jl:64-78; here the
    device loop keeps only each group's last info).

    Early-exit divergence (only when the driver will raise on it, i.e.
    ``check_divergence=True``): once a step reports ``diverged``, every
    later step is skipped via ``lax.cond`` (the skip branch just forwards
    the carry, so the rest of the scan is ~free) and the exact first bad
    iteration is carried out for the host-side raise.  With
    ``early_exit=False`` every step runs unconditionally — a user who
    disabled divergence checking to push through transient non-finite
    objectives keeps optimizing.
    """
    import jax.numpy as jnp

    _, info_shape = jax.eval_shape(alg.step, state)
    info0 = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), info_shape
    )
    t0 = jnp.asarray(start_it, jnp.int64 if jax.config.jax_enable_x64
                     else jnp.int32)

    def body(carry, _):
        st, info_prev, div, first_bad, t = carry

        if early_exit:
            def do(args):
                st, _ = args
                return alg.step(st)

            def skip(args):
                return args

            st_new, info = jax.lax.cond(div, skip, do, (st, info_prev))
        else:
            st_new, info = alg.step(st)
        d_step = info.get("diverged", jnp.asarray(False))
        div_new = div | d_step
        first_bad = jnp.where(div_new & ~div, t + 1, first_bad)
        return (st_new, info, div_new, first_bad, t + 1), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(body, carry, None, length=group,
                                unroll=unroll)
        return carry, carry[1]  # last info of the group

    init = (state, info0, jnp.asarray(False), jnp.zeros_like(t0), t0)
    (state, _, div, first_bad, _), infos = jax.lax.scan(
        outer, init, None, length=n_groups
    )
    return state, infos, div, first_bad


def optimize(
    key: jax.Array,
    algorithm,
    max_iter: int,
    prob,
    q_init,
    *,
    state: Optional[Any] = None,
    callback: Optional[Callable] = None,
    chunk_size: Optional[int] = None,
    show_progress: bool = False,
    check_divergence: bool = True,
    mesh: Optional[Any] = None,
    unroll: int = 1,
    log_every: int = 1,
):
    """Run a variational inference algorithm.

    Returns ``(output, info, state)`` exactly like the reference
    (output distribution, list of per-iteration info dicts, warm-start state).

    ``mesh``: optional ``jax.sharding.Mesh`` (see parallel.make_vi_mesh); the
    whole run executes under it with state replicated and the MC/data axes
    sharded per the objective's ``mc_axis`` / the target's ``data_axis``
    annotations.

    ``log_every``: record one info row per ``log_every`` iterations (the last
    of each group).  With the default 1 every iteration is recorded, like the
    reference.  For long runs (10^5+ iterations) a larger value keeps host
    memory flat — the thinning happens ON DEVICE (scan mode), divergence is
    still detected at the exact offending step, and all later steps are
    skipped at ~zero cost.
    """
    if log_every < 1:
        raise ValueError(f"log_every must be >= 1, got {log_every}")
    if mesh is not None:
        from .parallel.mesh import replicate_state

        with jax.set_mesh(mesh):
            if state is None:
                state = algorithm.init(key, q_init, prob)
            state = replicate_state(state, mesh)
            return _optimize_loop(
                algorithm, max_iter, state, callback, chunk_size,
                show_progress, check_divergence, unroll, log_every,
            )
    if state is None:
        state = algorithm.init(key, q_init, prob)
    return _optimize_loop(
        algorithm, max_iter, state, callback, chunk_size,
        show_progress, check_divergence, unroll, log_every,
    )


def _optimize_loop(
    algorithm,
    max_iter: int,
    state: Any,
    callback: Optional[Callable],
    chunk_size: Optional[int],
    show_progress: bool,
    check_divergence: bool,
    unroll: int = 1,
    log_every: int = 1,
):

    infos: list = []

    if callback is not None:
        # Host loop: jitted single step + Python callback per iteration.
        step_fn = _cached_jit(
            algorithm, "step", lambda: jax.jit(algorithm.step)
        )
        for t in range(max_iter):
            state, info = step_fn(state)
            info = {k: jax.device_get(v) for k, v in info.items()}
            if check_divergence and bool(info.get("diverged", False)):
                raise DivergenceError(
                    f"The objective value is {info.get('elbo')} at iteration "
                    f"{t + 1}. This indicates that the optimization diverged."
                )
            extra = callback(
                iteration=int(jax.device_get(state.iteration)),
                state=state,
                info=info,
            )
            if extra:
                info.update(extra)
            info["iteration"] = t + 1
            if (t + 1) % log_every == 0 or t + 1 == max_iter:
                infos.append(info)
            if show_progress and (t + 1) % max(1, max_iter // 20) == 0:
                elbo = info.get("elbo")
                print(f"  iter {t + 1}/{max_iter}  elbo={elbo}")
    elif log_every > 1:
        # Thinned scan mode: on-device nested scan, one info row per
        # log_every steps; with check_divergence, early-exit after
        # divergence and raise at the exact bad iteration.
        # Chunks are normalized to a multiple of log_every so recorded
        # iterations stay on the log_every grid and only the final
        # max_iter-remainder group (if any) compiles a second program.
        chunk = chunk_size or max_iter
        chunk = max(log_every, (chunk // log_every) * log_every)
        done = 0
        while done < max_iter:
            n = min(chunk, max_iter - done)
            groups = [(n // log_every, log_every)]
            if n % log_every:
                groups.append((1, n % log_every))
            for n_groups, group in groups:
                if n_groups == 0:
                    continue
                fn = _cached_jit(
                    algorithm,
                    f"grouped_{n_groups}_{group}_{unroll}_{check_divergence}",
                    lambda: jax.jit(
                        lambda s, t0: _steps_grouped(
                            algorithm, s, n_groups, group, t0,
                            unroll=unroll, early_exit=check_divergence,
                        )
                    ),
                )
                state, stacked, div, first_bad = fn(state, done)
                stacked = jax.device_get(stacked)
                if check_divergence and bool(jax.device_get(div)):
                    raise DivergenceError(
                        "The objective became non-finite at iteration "
                        f"{int(jax.device_get(first_bad))}. This indicates "
                        "that the optimization diverged."
                    )
                for g in range(n_groups):
                    row = {k: v[g] for k, v in stacked.items()}
                    row["iteration"] = done + (g + 1) * group
                    infos.append(row)
                done += n_groups * group
            if show_progress:
                elbo = infos[-1].get("elbo")
                print(f"  iter {done}/{max_iter}  elbo={elbo}")
    else:
        # Scan mode: device-side loop, one host sync per chunk.
        chunk = chunk_size or max_iter

        def make_scan(n):
            return jax.jit(lambda s: _steps_scanned(algorithm, s, n, unroll))

        done = 0
        while done < max_iter:
            n = min(chunk, max_iter - done)
            fn = _cached_jit(
                algorithm, f"scan_{n}_{unroll}", lambda: make_scan(n)
            )
            state, stacked = fn(state)
            stacked = jax.device_get(stacked)
            if check_divergence and "diverged" in stacked:
                div = stacked["diverged"]
                if div.any():
                    bad = int(div.argmax()) + done + 1
                    raise DivergenceError(
                        f"The objective became non-finite at iteration {bad}. "
                        "This indicates that the optimization diverged."
                    )
            for i in range(n):
                row = {k: v[i] for k, v in stacked.items()}
                row["iteration"] = done + i + 1
                infos.append(row)
            done += n
            if show_progress:
                elbo = infos[-1].get("elbo")
                print(f"  iter {done}/{max_iter}  elbo={elbo}")

    return algorithm.output(state), infos, state
