"""Normal-LogNormal bench model (bijector-constrained support).

The BASELINE config "full-rank Gaussian on normal-lognormal with
bijector-constrained support": a (d+1)-dim target

    y ~ LogNormal(mu_y, sigma_y)        (positive scalar)
    x ~ Normal(mu_x, sigma_x^2 I_d)

with the VI family living in unconstrained space via an Exp bijector on y.
The joint is exactly a Gaussian in (log y, x), so the optimum of a full-rank
Gaussian in unconstrained space is analytic: location [mu_y, mu_x], scale
diag([sigma_y, sigma_x...]).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.problem import ORDER_JAX
from ..core.pytree import pytree_dataclass
from ..core.transforms import Exp, Identity, TransformedTarget, stacked


@pytree_dataclass
class NormalLogNormal:
    mu_y: jax.Array  # scalar
    sigma_y: jax.Array  # scalar
    mu_x: jax.Array  # (d,)
    sigma_x: jax.Array  # (d,)

    @property
    def dim(self) -> int:
        return self.mu_x.shape[0] + 1

    def order(self) -> int:
        return ORDER_JAX

    def log_density(self, theta: jax.Array) -> jax.Array:
        """theta = [y, x] in constrained space (y > 0)."""
        y, x = theta[0], theta[1:]
        logy = jnp.log(y)
        lp_y = (
            -0.5 * jnp.square((logy - self.mu_y) / self.sigma_y)
            - logy
            - jnp.log(self.sigma_y)
            - 0.5 * math.log(2.0 * math.pi)
        )
        lp_x = jnp.sum(
            -0.5 * jnp.square((x - self.mu_x) / self.sigma_x)
            - jnp.log(self.sigma_x)
            - 0.5 * math.log(2.0 * math.pi)
        )
        return lp_y + lp_x

    def unconstrained(self) -> TransformedTarget:
        return TransformedTarget(
            prob=self,
            transform=stacked((Exp(), 1), (Identity(), self.mu_x.shape[0])),
        )


def make_normallognormal(key: jax.Array, n_dims: int = 10, dtype=jnp.float32):
    """Returns (target, mu_unc_true, scale_diag_unc_true) — the analytic
    optimum of the unconstrained-space Gaussian approximation."""
    k1, k2, k3 = jax.random.split(key, 3)
    mu_y = jax.random.normal(k1, (), dtype)
    sigma_y = jnp.asarray(0.7, dtype)
    mu_x = jax.random.normal(k2, (n_dims,), dtype)
    sigma_x = 0.5 + jax.random.uniform(k3, (n_dims,), dtype)
    target = NormalLogNormal(
        mu_y=mu_y, sigma_y=sigma_y, mu_x=mu_x, sigma_x=sigma_x
    )
    mu_true = jnp.concatenate([mu_y[None], mu_x])
    scale_true = jnp.concatenate([sigma_y[None], sigma_x])
    return target, mu_true, scale_true
