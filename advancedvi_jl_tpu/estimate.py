"""Module-level ``estimate_objective`` (reference parity).

The reference exposes ``estimate_objective([rng,] alg_or_obj, q, prob;
n_samples)`` as a free function dispatched per algorithm/objective
(reference: src/algorithms/common.jl:29-38 and each measure-space file).
Here every algorithm and objective carries an ``estimate_objective`` method;
this function is the uniform entry point.
"""

from __future__ import annotations

from typing import Any, Optional

import jax


def estimate_objective(
    key: jax.Array,
    alg_or_objective: Any,
    q: Any,
    prob: Any,
    n_samples: Optional[int] = None,
) -> jax.Array:
    """Estimate the algorithm's monitoring objective (neg-ELBO for the KL
    minimizers, covariance-weighted Fisher for batch-and-match)."""
    return alg_or_objective.estimate_objective(key, q, prob, n_samples)
