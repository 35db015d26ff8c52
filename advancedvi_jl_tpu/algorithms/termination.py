"""Algorithm-driven early termination.

The reference's ``step`` protocol returns ``(state, terminate, info)`` and
``optimize`` breaks out of the loop when ``terminate`` is set
(reference: src/optimize.jl:67-74, protocol at src/AdvancedVI.jl:244).  Here
the channel is a boolean ``info["terminate"]``: the driver's device-side scan
watches it, skips every later step via ``lax.cond`` (~free), and returns with
the info log truncated at the exact terminating iteration — so target-ELBO or
patience stopping costs O(steps actually run), not O(max_iter).

``WithTermination`` wraps ANY algorithm (parameter-space or measure-space)
with a jit-compatible stopping criterion ``criterion(state, info) -> bool``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp


class WithTermination:
    """Wrap an algorithm with a termination criterion.

    Args:
      algorithm: any object with the init/step/output protocol.
      criterion: jittable ``(new_state, info) -> bool array`` evaluated after
        every step; True stops the optimization at that step.
    """

    def __init__(self, algorithm: Any, criterion: Callable):
        self.algorithm = algorithm
        self.criterion = criterion

    @property
    def supports_grad(self) -> bool:
        return getattr(self.algorithm, "supports_grad", False)

    def init(self, key, q_init, prob):
        return self.algorithm.init(key, q_init, prob)

    def step(self, state, **kwargs):
        new_state, info = self.algorithm.step(state, **kwargs)
        term = jnp.asarray(self.criterion(new_state, info), dtype=bool)
        info = {**info, "terminate": term}
        return new_state, info

    def output(self, state):
        return self.algorithm.output(state)

    def estimate_objective(self, *args, **kwargs):
        return self.algorithm.estimate_objective(*args, **kwargs)


def elbo_at_least(target_elbo: float) -> Callable:
    """Stop once the per-step ELBO estimate reaches ``target_elbo``.

    The single-sample ELBO estimate is noisy; for a robust criterion compose
    with a larger ``n_samples`` objective or use a callback-mode moving
    average.
    """

    def criterion(state, info):
        return info["elbo"] >= target_elbo

    return criterion
