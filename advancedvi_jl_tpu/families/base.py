"""Univariate base distributions for location-scale families.

The reference's ``MvLocationScale`` takes an arbitrary ``Distributions.jl``
univariate base (Normal / Student-T / Laplace are documented,
reference: docs/src/families.md:74-110).  Here the base is a small static
pytree with closed-form entropy and elementwise log-pdf, chosen so the whole
sampling path ``z = C u + m`` compiles to one fused XLA program.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
# Host-side (Python-float) special functions: these normalization constants
# depend only on the STATIC df, so they must not be staged into the trace
# (jax.scipy.special under jit would turn them into traced subgraphs).
from scipy.special import betaln, digamma

from ..core.pytree import pytree_dataclass, static_field

_HALF_LOG_2PI_E = 0.5 * (math.log(2.0 * math.pi) + 1.0)


@pytree_dataclass
class Normal:
    """Standard normal base: z = C u + m gives a Gaussian family."""

    def sample(self, key, shape, dtype):
        return jax.random.normal(key, shape, dtype=dtype)

    def log_prob(self, u):
        return -0.5 * (u * u) - 0.5 * math.log(2.0 * math.pi)

    def score(self, u):
        """Elementwise d log_prob / du (drives the solve-free STL backward)."""
        return -u

    def entropy(self):
        return _HALF_LOG_2PI_E

    def mean(self):
        return 0.0

    def var(self):
        return 1.0

    def symmetric(self):
        """True iff -u has the same law as u (antithetic-sampling validity)."""
        return True


@pytree_dataclass
class StudentT:
    """Standard Student-t base (heavy tails); df is static."""

    df: float = static_field(default=5.0)

    def sample(self, key, shape, dtype):
        return jax.random.t(key, self.df, shape, dtype=dtype)

    def log_prob(self, u):
        nu = self.df
        lognorm = -0.5 * math.log(nu) - float(betaln(nu / 2.0, 0.5))
        return lognorm - (nu + 1.0) / 2.0 * jnp.log1p(u * u / nu)

    def score(self, u):
        nu = self.df
        return -(nu + 1.0) * u / (nu + u * u)

    def entropy(self):
        nu = self.df
        return float(
            (nu + 1.0) / 2.0 * (digamma((nu + 1.0) / 2.0) - digamma(nu / 2.0))
            + 0.5 * math.log(nu)
            + betaln(nu / 2.0, 0.5)
        )

    def mean(self):
        return 0.0

    def var(self):
        return self.df / (self.df - 2.0) if self.df > 2.0 else float("inf")

    def symmetric(self):
        return True


@pytree_dataclass
class Laplace:
    """Standard Laplace base."""

    def sample(self, key, shape, dtype):
        return jax.random.laplace(key, shape, dtype=dtype)

    def log_prob(self, u):
        return -jnp.abs(u) - math.log(2.0)

    def score(self, u):
        return -jnp.sign(u)

    def entropy(self):
        return 1.0 + math.log(2.0)

    def mean(self):
        return 0.0

    def var(self):
        return 2.0

    def symmetric(self):
        return True
