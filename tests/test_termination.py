"""Early-termination protocol + callback payload parity (VERDICT r2 #4/#6).

The reference's ``step`` returns ``(state, terminate, info)`` and ``optimize``
breaks on it (reference: src/optimize.jl:67-74, protocol at
src/AdvancedVI.jl:244); its param-space callbacks receive the gradient and
averaged params (reference: src/algorithms/common.jl:106-118).  Here the
channel is ``info["terminate"]`` watched by the device-side scan, and
callbacks opt into ``gradient`` / ``averaged_params`` by declaring them.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_meanfield
from advancedvi_jl_tpu.optimize import DivergenceError


def _alg(**kw):
    return avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=4, operator=avt.ClipScale(), **kw
    )


def _setup(d=4):
    target, mu, sd = normal_meanfield(jax.random.key(3), d)
    q0 = avt.MeanFieldGaussian(jnp.zeros(d), jnp.ones(d))
    return target, mu, sd, q0


# ---------------------------------------------------------------------------
# Algorithm-driven termination (scan + thinned + callback modes)
# ---------------------------------------------------------------------------


def test_target_elbo_early_stop_scan_mode(key):
    """WithTermination + elbo_at_least stops the device-side loop at the
    exact first iteration whose ELBO estimate reaches the target."""
    target, mu, sd, q0 = _setup()
    alg = avt.WithTermination(_alg(), avt.elbo_at_least(-1.0))

    out, infos, state = avt.optimize(key, alg, 5000, target, q0)

    stop_it = infos[-1]["iteration"]
    assert stop_it < 5000  # it does converge past -1 nat long before 5000
    assert int(state.iteration) == stop_it  # post-stop steps were skipped
    assert float(infos[-1]["elbo"]) >= -1.0
    assert all(float(r["elbo"]) < -1.0 for r in infos[:-1])
    # The returned output reflects the state AT the stopping iteration.
    assert np.all(np.isfinite(np.asarray(out.location)))


def test_target_elbo_early_stop_matches_dense_prefix(key):
    """The terminated run's info rows are exactly the prefix of the
    untermininated run's rows (same PRNG stream, same steps)."""
    target, mu, sd, q0 = _setup()
    _, infos_full, _ = avt.optimize(key, _alg(), 300, target, q0)
    alg = avt.WithTermination(_alg(), avt.elbo_at_least(-1.0))
    _, infos_term, _ = avt.optimize(key, alg, 300, target, q0)

    assert len(infos_term) < 300
    for row, dense in zip(infos_term, infos_full):
        np.testing.assert_array_equal(
            np.asarray(row["elbo"]), np.asarray(dense["elbo"])
        )


def test_termination_thinned_mode_exact_iteration(key):
    """With log_every > 1 the final recorded row carries the exact
    terminating iteration, not its group boundary."""
    target, mu, sd, q0 = _setup()
    alg = avt.WithTermination(_alg(), avt.elbo_at_least(-1.0))

    _, infos_dense, state_d = avt.optimize(key, alg, 5000, target, q0)
    _, infos_thin, state_t = avt.optimize(
        key, alg, 5000, target, q0, log_every=50
    )

    stop_it = infos_dense[-1]["iteration"]
    assert infos_thin[-1]["iteration"] == stop_it
    assert int(state_t.iteration) == int(state_d.iteration) == stop_it
    # Earlier rows sit on the log_every grid.
    assert all(r["iteration"] % 50 == 0 for r in infos_thin[:-1])


def test_termination_callback_mode(key):
    """Callback mode honors info['terminate'] from the algorithm."""
    target, mu, sd, q0 = _setup()
    alg = avt.WithTermination(_alg(), avt.elbo_at_least(-1.0))
    calls = []

    def cb(iteration, info):
        calls.append(iteration)
        return {}

    _, infos, state = avt.optimize(key, alg, 5000, target, q0, callback=cb)
    assert len(calls) == int(state.iteration) < 5000
    assert infos[-1]["iteration"] == int(state.iteration)


def test_termination_works_on_measure_space_algorithms(key):
    """WithTermination wraps any init/step/output algorithm, including the
    measure-space genre."""
    target, mu, sd, q0 = _setup()
    full = avt.FullRankGaussian(jnp.zeros(4), jnp.eye(4))
    alg = avt.WithTermination(
        avt.KLMinNaturalGradDescent(stepsize=0.1, n_samples=8),
        avt.elbo_at_least(-0.5),
    )
    _, infos, state = avt.optimize(key, alg, 2000, target, full)
    assert infos[-1]["iteration"] == int(state.iteration) < 2000


def test_divergence_wins_over_simultaneous_terminate(key):
    """A criterion that fires on a NaN ELBO must not mask the divergence
    raise (NaN >= target is False, so use a custom always-true criterion
    once diverged)."""
    target, mu, sd, q0 = _setup()
    blowup = avt.WithTermination(
        _alg(optimizer=optax.sgd(1e8)),
        lambda state, info: info["diverged"],
    )
    with pytest.raises(DivergenceError):
        avt.optimize(key, blowup, 500, target, q0)


# ---------------------------------------------------------------------------
# Exact-step divergence cost in the default (log_every=1) mode — VERDICT #6
# ---------------------------------------------------------------------------


class _NaNAtStep:
    """Minimal algorithm whose objective goes NaN at a fixed step, with each
    step burning enough FLOPs that skipped steps are measurably cheaper."""

    def __init__(self, nan_at: int, work: int = 128):
        self.nan_at = nan_at
        self.work = work

    def init(self, key, q_init, prob):
        from advancedvi_jl_tpu.algorithms.paramspace import ParamSpaceSGDState

        return ParamSpaceSGDState(
            prob=None, q=jnp.eye(self.work), iteration=jnp.asarray(0),
            obj_state=None, opt_state=None, avg_state=None, key=key,
        )

    def step(self, state):
        it = state.iteration + 1
        q = state.q @ state.q * 1e-3 + jnp.eye(self.work)  # real matmul work
        elbo = jnp.where(it >= self.nan_at, jnp.nan, -1.0 / it)
        new = state.replace(q=q, iteration=it)
        return new, {"elbo": elbo, "diverged": ~jnp.isfinite(elbo)}

    def output(self, state):
        return state.q


def test_step3_nan_raises_at_3_in_default_mode(key):
    """A NaN at step 3 of a 10^4-iteration single-chunk default-mode run
    raises at exactly iteration 3, and the post-divergence steps are skipped
    on device (run is much faster than the full 10^4-step run)."""
    alg = _NaNAtStep(nan_at=3)

    with pytest.raises(DivergenceError, match="iteration 3"):
        avt.optimize(key, alg, 10_000, None, None)

    # Cost check: the same program with divergence at step 9_999 must take
    # visibly longer than divergence at step 3 (both compile the same scan;
    # compare warm second runs to exclude compile time).
    def timed(nan_at):
        a = _NaNAtStep(nan_at=nan_at)
        for _ in range(2):  # first run compiles
            t0 = time.perf_counter()
            with pytest.raises(DivergenceError):
                avt.optimize(jax.random.key(0), a, 10_000, None, None)
            dt = time.perf_counter() - t0
        return dt

    fast, slow = timed(3), timed(9_999)
    assert fast < slow * 0.5, (fast, slow)


# ---------------------------------------------------------------------------
# Callback payload parity (reference common.jl:106-118)
# ---------------------------------------------------------------------------


def test_callback_receives_gradient(key):
    """A callback declaring ``gradient`` gets the raw gradient pytree of the
    step — gradient-norm monitoring, the standard VI diagnostic."""
    target, mu, sd, q0 = _setup()
    norms = []

    def cb(iteration, gradient, info):
        leaves = jax.tree.leaves(gradient)
        assert leaves, "gradient pytree is empty"
        gnorm = float(
            jnp.sqrt(sum(jnp.sum(g**2) for g in leaves))
        )
        norms.append(gnorm)
        return {"grad_norm": gnorm}

    _, infos, _ = avt.optimize(key, _alg(), 600, target, q0, callback=cb)
    assert len(norms) == 600
    assert all(np.isfinite(n) and n >= 0 for n in norms)
    assert "grad_norm" in infos[-1]
    # STL gradients vanish at the optimum: late norms << early norms.
    assert np.mean(norms[-100:]) < 0.5 * np.mean(norms[:100])


def test_callback_gradient_matches_direct_value_and_grad(key):
    """The callback's gradient is THE step's gradient: recompute it from the
    same (q, key) via the objective and compare (fp tolerance: the callback
    path runs under jit, the recomputation eagerly — fusion differs)."""
    target, mu, sd, q0 = _setup()
    alg = _alg()
    seen = {}

    def cb(iteration, state, gradient):
        if iteration == 1:
            seen["grad"] = gradient
        return {}

    _, _, state0 = avt.optimize(key, alg, 1, target, q0, callback=cb)

    init_state = alg.init(key, q0, target)
    step_key = jax.random.fold_in(init_state.key, init_state.iteration)
    grad, _, _ = alg.objective.value_and_grad(
        init_state.q, init_state.prob, step_key, init_state.obj_state
    )
    for a, b in zip(jax.tree.leaves(seen["grad"]), jax.tree.leaves(grad)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_callback_receives_averaged_params(key):
    """A callback declaring ``averaged_params`` gets the averaged-iterate
    family (what ``output`` would return at that step)."""
    target, mu, sd, q0 = _setup()
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=4, operator=avt.ClipScale(),
        averager=avt.PolynomialAveraging(),
    )
    got = []

    def cb(iteration, averaged_params, state):
        got.append(averaged_params)
        return {}

    _, _, state = avt.optimize(key, alg, 20, target, q0, callback=cb)
    assert len(got) == 20
    assert type(got[-1]) is type(q0)  # the variational family pytree
    np.testing.assert_array_equal(
        np.asarray(got[-1].location),
        np.asarray(alg.output(state).location),
    )
    # The averaged iterate differs from the raw one (averaging is active).
    assert not np.array_equal(
        np.asarray(got[-1].location), np.asarray(state.q.location)
    )


def test_callback_terminate_by_return(key):
    """Returning {'terminate': True} from a callback stops the loop — e.g.
    patience-based stopping on a host-side moving average."""
    target, mu, sd, q0 = _setup()
    best = {"elbo": -np.inf, "since": 0}

    def cb(iteration, info):
        e = float(info["elbo"])
        if e > best["elbo"] + 1e-3:
            best["elbo"], best["since"] = e, 0
        else:
            best["since"] += 1
        return {"terminate": best["since"] >= 25}

    _, infos, state = avt.optimize(key, _alg(), 5000, target, q0, callback=cb)
    assert int(state.iteration) < 5000
    assert infos[-1]["iteration"] == int(state.iteration)
    # 'terminate' is consumed by the driver, not stored as an info column.
    assert "terminate" not in infos[-1]


def test_callback_legacy_signature_unchanged(key):
    """Old-style (iteration, state, info) callbacks keep working and pay no
    gradient-plumbing cost (step is jitted without with_grad)."""
    target, mu, sd, q0 = _setup()
    rows = []

    def cb(iteration, state, info):
        rows.append((iteration, float(info["elbo"])))
        return None

    _, infos, _ = avt.optimize(key, _alg(), 10, target, q0, callback=cb)
    assert len(rows) == 10 and len(infos) == 10


def test_callback_kwargs_signature_gets_everything(key):
    """A **kwargs callback receives the full payload (gradient requires
    algorithm support; ParamSpaceSGD provides it)."""
    target, mu, sd, q0 = _setup()
    keys_seen = set()

    def cb(**kw):
        keys_seen.update(kw)
        return {}

    avt.optimize(key, _alg(), 3, target, q0, callback=cb)
    assert {"iteration", "state", "info", "gradient",
            "averaged_params"} <= keys_seen
