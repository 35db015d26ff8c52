"""Iterate averaging (reference: src/optimization/averaging.jl:7-53).

Averager state is a pytree threaded through the jitted step; ``value`` is read
once at the end of optimization (reference protocol: init/apply/value,
src/AdvancedVI.jl:132-170).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field


@pytree_dataclass
class NoAveraging:
    """Return the last iterate."""

    def init(self, params) -> Any:
        return params

    def apply(self, state, params) -> Any:
        return params

    def value(self, state) -> Any:
        return state


@pytree_dataclass
class PolynomialAveraging:
    """Polynomial averaging (Shamir & Zhang 2013):
    x_bar <- (1 - w) x_bar + w x,  w = (eta + 1) / (t + eta), default eta=8
    (reference: averaging.jl:26-53)."""

    eta: float = static_field(default=8.0)

    def init(self, params) -> Tuple[Any, jax.Array]:
        return (params, jnp.asarray(1, jnp.int32))

    def apply(self, state, params) -> Tuple[Any, jax.Array]:
        x_bar, t = state
        dtype = jnp.result_type(*jax.tree.leaves(params))
        eta = jnp.asarray(self.eta, dtype)
        w = (eta + 1.0) / (t.astype(dtype) + eta)
        new_bar = jax.tree.map(
            lambda xb, x: (1.0 - w) * xb + w * x, x_bar, params
        )
        return (new_bar, t + 1)

    def value(self, state) -> Any:
        return state[0]
