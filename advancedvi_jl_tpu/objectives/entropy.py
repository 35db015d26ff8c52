"""Entropy estimation strategies for ELBO objectives.

Five strategies that differ only in how the entropy term H(q) enters the AD
graph (reference: src/algorithms/entropy.jl:11-90).  `q_stop` is the same
family with gradients stopped (TPU-native: ``jax.lax.stop_gradient`` on the
whole pytree), replacing the reference's detached ``restructure(params)``.

- ClosedFormEntropy:        entropy(q), differentiated.
- ClosedFormEntropyZeroGradient: entropy(q_stop), detached — used with the
  proximal entropy operator.
- MonteCarloEntropy:        -mean log q(z) with z and q both live.
- StickingTheLandingEntropy: -mean log q_stop(z) — only the path derivative
  through the samples remains (Roeder et al. 2017).
- StickingTheLandingEntropyZeroGradient: STL minus entropy(q) plus
  entropy(q_stop), so the entropy gradient has mean zero (for proximal steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLOSED_FORM = "closed_form"
CLOSED_FORM_ZERO_GRAD = "closed_form_zero_grad"
MONTE_CARLO = "monte_carlo"
STL = "stl"
STL_ZERO_GRAD = "stl_zero_grad"

ALL_ENTROPY_ESTIMATORS = (
    CLOSED_FORM,
    CLOSED_FORM_ZERO_GRAD,
    MONTE_CARLO,
    STL,
    STL_ZERO_GRAD,
)

# Estimators compatible with the proximal entropy operator: the gradient of
# the entropy estimate must have mean zero (reference: constructors.jl:122-157
# restricts KLMinRepGradProxDescent to these).
ZERO_GRAD_ESTIMATORS = (CLOSED_FORM_ZERO_GRAD, STL_ZERO_GRAD)


def estimate_entropy(estimator: str, samples: jax.Array, q, q_stop) -> jax.Array:
    """Estimate H(q) given (n, d) reparameterized samples.

    ``samples`` must be live w.r.t. the variational parameters (reparameterized
    draws); ``q_stop`` must be a stop-gradient copy of ``q``.
    """
    if estimator == CLOSED_FORM:
        return q.entropy()
    if estimator == CLOSED_FORM_ZERO_GRAD:
        return q_stop.entropy()
    if estimator == MONTE_CARLO:
        return -jnp.mean(q.log_prob(samples))
    if estimator == STL:
        return -jnp.mean(q_stop.log_prob(samples))
    if estimator == STL_ZERO_GRAD:
        # STL estimate whose gradient has mean zero
        # (reference: entropy.jl:80-90 combined zero-gradient method).
        ent_stl = -jnp.mean(q_stop.log_prob(samples))
        return ent_stl - q.entropy() + q_stop.entropy()
    raise ValueError(f"unknown entropy estimator: {estimator!r}")
