"""Normalizing-flow variational families.

The reference's docs point users at NormalizingFlows.jl for flow-based q's;
its objectives only require ``rand`` + ``logpdf``.  Here the equivalent
contract is ``sample_and_log_prob`` (reparameterized draws together with
their log-density accumulated through the flow), consumed by ``FlowELBO`` —
the Monte-Carlo-entropy ELBO, which is the standard flow objective.

Demonstrated with planar flows (Rezende & Mohamed 2015):

    z = f_K(...f_1(u)),  f(z) = z + a_hat * tanh(w . z + b),  u ~ N(m0, S0)

with the invertibility reparameterization a_hat = a + (softplus(w.a) - 1 -
w.a) w / ||w||^2 (guarantees w . a_hat >= -1).  Sticking-the-landing entropy
is intentionally NOT offered here: it requires evaluating the frozen density
at live samples, i.e. an analytic flow inverse, which planar flows lack.

Every layer update is a (n, d) elementwise block plus one (n, d) x (d,)
contraction — the scan over layers stays on-device and fuses well.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field


@pytree_dataclass
class PlanarFlowFamily:
    """Mean-field Gaussian base pushed through K planar-flow layers."""

    base_location: jax.Array  # (d,)
    base_scale_diag: jax.Array  # (d,)
    w: jax.Array  # (K, d)
    a: jax.Array  # (K, d)
    b: jax.Array  # (K,)

    @property
    def dim(self) -> int:
        return self.base_location.shape[-1]

    @property
    def n_layers(self) -> int:
        return self.w.shape[0]

    def _a_hat(self, w, a):
        wa = jnp.dot(w, a)
        m = jax.nn.softplus(wa) - 1.0
        return a + (m - wa) * w / (jnp.sum(jnp.square(w)) + 1e-12)

    def sample_and_log_prob(self, key: jax.Array, n_samples: int):
        """Reparameterized samples and their log-density under q."""
        d = self.dim
        u = jax.random.normal(key, (n_samples, d), self.base_location.dtype)
        z = u * self.base_scale_diag + self.base_location
        logq = (
            jnp.sum(-0.5 * jnp.square(u), axis=-1)
            - 0.5 * d * math.log(2.0 * math.pi)
            - jnp.sum(jnp.log(jnp.abs(self.base_scale_diag)))
        )

        def layer(carry, params):
            z, logq = carry
            w, a, b = params
            a_hat = self._a_hat(w, a)
            lin = z @ w + b  # (n,)
            z_new = z + jnp.tanh(lin)[:, None] * a_hat
            # |det J| = |1 + (1 - tanh^2(lin)) w . a_hat|
            psi = 1.0 - jnp.square(jnp.tanh(lin))
            det = 1.0 + psi * jnp.dot(w, a_hat)
            logq = logq - jnp.log(jnp.abs(det) + 1e-12)
            return (z_new, logq), None

        (z, logq), _ = jax.lax.scan(layer, (z, logq), (self.w, self.a, self.b))
        return z, logq

    def sample(self, key: jax.Array, n_samples: int) -> jax.Array:
        return self.sample_and_log_prob(key, n_samples)[0]


def planar_flow(
    key: jax.Array, dim: int, n_layers: int = 8, dtype=jnp.float32
) -> PlanarFlowFamily:
    """Fresh near-identity planar-flow family."""
    kw, ka = jax.random.split(key)
    return PlanarFlowFamily(
        base_location=jnp.zeros(dim, dtype),
        base_scale_diag=jnp.ones(dim, dtype),
        w=0.1 * jax.random.normal(kw, (n_layers, dim), dtype),
        a=0.1 * jax.random.normal(ka, (n_layers, dim), dtype),
        b=jnp.zeros(n_layers, dtype),
    )


@pytree_dataclass
class RadialFlowFamily:
    """Mean-field Gaussian base pushed through K radial-flow layers
    (Rezende & Mohamed 2015, the reference tutorial's other flow):

        f(z) = z + beta_hat * h(alpha, r) * (z - z0),   r = ||z - z0||,
        h = 1 / (alpha + r)

    with alpha = softplus(alpha_raw) > 0 and the invertibility
    reparameterization beta_hat = -alpha + softplus(beta_raw) >= -alpha.
    log|det J| = (d-1) log(1 + beta_hat h) + log(1 + beta_hat h - beta_hat
    r / (alpha + r)^2)."""

    base_location: jax.Array  # (d,)
    base_scale_diag: jax.Array  # (d,)
    z0: jax.Array  # (K, d)
    alpha_raw: jax.Array  # (K,)
    beta_raw: jax.Array  # (K,)

    @property
    def dim(self) -> int:
        return self.base_location.shape[-1]

    @property
    def n_layers(self) -> int:
        return self.z0.shape[0]

    def sample_and_log_prob(self, key: jax.Array, n_samples: int):
        d = self.dim
        u = jax.random.normal(key, (n_samples, d), self.base_location.dtype)
        z = u * self.base_scale_diag + self.base_location
        logq = (
            jnp.sum(-0.5 * jnp.square(u), axis=-1)
            - 0.5 * d * math.log(2.0 * math.pi)
            - jnp.sum(jnp.log(jnp.abs(self.base_scale_diag)))
        )

        def layer(carry, params):
            z, logq = carry
            z0, alpha_raw, beta_raw = params
            alpha = jax.nn.softplus(alpha_raw)
            beta = -alpha + jax.nn.softplus(beta_raw)
            diff = z - z0  # (n, d)
            r = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12)  # (n,)
            h = 1.0 / (alpha + r)
            z_new = z + (beta * h)[:, None] * diff
            bh = beta * h
            # d/dr of h(r) = -1/(alpha+r)^2, so the radial eigenvalue is
            # 1 + beta h + beta h'(r) r = 1 + beta h - beta r/(alpha+r)^2
            radial = 1.0 + bh - beta * r / jnp.square(alpha + r)
            logdet = (d - 1) * jnp.log(jnp.abs(1.0 + bh) + 1e-12) + jnp.log(
                jnp.abs(radial) + 1e-12
            )
            return (z_new, logq - logdet), None

        (z, logq), _ = jax.lax.scan(
            layer, (z, logq), (self.z0, self.alpha_raw, self.beta_raw)
        )
        return z, logq

    def sample(self, key: jax.Array, n_samples: int) -> jax.Array:
        return self.sample_and_log_prob(key, n_samples)[0]


def radial_flow(
    key: jax.Array, dim: int, n_layers: int = 8, dtype=jnp.float32
) -> RadialFlowFamily:
    """Fresh near-identity radial-flow family (beta ~ 0 at init)."""
    kz = key
    return RadialFlowFamily(
        base_location=jnp.zeros(dim, dtype),
        base_scale_diag=jnp.ones(dim, dtype),
        z0=0.1 * jax.random.normal(kz, (n_layers, dim), dtype),
        # softplus(1.0) ~ 1.31 => alpha ~ 1.31; beta_hat = -alpha +
        # softplus(beta_raw) ~ 0 when softplus(beta_raw) ~ alpha
        alpha_raw=jnp.full((n_layers,), 1.0, dtype),
        beta_raw=jnp.full((n_layers,), 1.0, dtype),
    )


@pytree_dataclass
class FlowELBO:
    """Monte-Carlo-entropy ELBO for families with ``sample_and_log_prob``.

    Drop-in objective for ParamSpaceSGD: grad of
    ``-(E[log pi(z)] - E[log q(z)])`` with reparameterized z.
    """

    n_samples: int = static_field(default=1)
    mc_axis: Optional[str] = static_field(default=None)

    def init(self, key, q, prob):
        return ()

    def loss(self, q, prob, key: jax.Array) -> jax.Array:
        from ..objectives.repgradelbo import _constrain_mc

        z, logq = q.sample_and_log_prob(key, self.n_samples)
        z = _constrain_mc(z, self.mc_axis)
        energy = jnp.mean(jax.vmap(prob.log_density)(z))
        return -(energy - jnp.mean(logq))

    def value_and_grad(self, q, prob, key: jax.Array, obj_state=()):
        nelbo, grad = jax.value_and_grad(self.loss)(q, prob, key)
        return grad, obj_state, {"elbo": -nelbo}

    def estimate_objective(self, key, q, prob, n_samples=None):
        n = n_samples if n_samples is not None else self.n_samples
        z, logq = q.sample_and_log_prob(key, n)
        return -(jnp.mean(jax.vmap(prob.log_density)(z)) - jnp.mean(logq))
