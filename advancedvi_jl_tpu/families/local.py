"""Per-datapoint (local-latent / amortized-q) mean-field family.

The reference subsamples the variational family alongside the target
(``subsample(q, batch)``, reference: src/algorithms/subsampledobjective.jl:81)
so that models with per-datapoint latents can be fit doubly-stochastically:
each step only touches the minibatch's local parameters.  This family is the
concrete implementation of that hook: mean-field Gaussians over N local
latent blocks of size k, stored as (N, k) arrays, whose ``subsample`` gathers
the minibatch rows.

Unbiasedness: the full ELBO is a SUM of N per-datapoint terms
``E[log p(y_i, z_i)] + H(q_i)``; a batch of B rows estimates it as
``(N/B) * sum_{i in batch} [...]``.  The target handles the model terms via
its own ``likeadj``; this family carries the matching ``weight = N/B`` on its
density bookkeeping, so ``entropy`` and ``log_prob`` (hence every entropy
estimator: closed-form, MC, STL) scale consistently.  ``weight`` is static —
batch shapes are static under XLA, so it is a trace-time constant.

Gradients: the row gather in ``subsample`` transposes to a scatter-add, so
rows outside the minibatch get exact zero gradients (stateful optimizers
with per-parameter accumulators see zeros for untouched rows — the standard
sparse-SVI caveat; plain SGD/Adam behave as expected).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field
from .base import Normal


@pytree_dataclass
class PerDatapointMeanField:
    """N independent mean-field Gaussian blocks q_i = N(loc_i, diag(scale_i^2)).

    ``sample`` returns draws over the FLATTENED (rows * k) space so the
    family plugs into every objective unchanged; the target sees
    theta of dimension rows * k (the minibatch's local latents, in row
    order matching the subsampled data).
    """

    location: jax.Array  # (rows, k)
    scale_diag: jax.Array  # (rows, k)
    base: Any = static_field(default=Normal())
    weight: float = static_field(default=1.0)  # N / batch under subsampling

    @property
    def n_rows(self) -> int:
        return self.location.shape[0]

    @property
    def dim(self) -> int:
        return self.location.shape[0] * self.location.shape[1]

    def subsample(self, indices: jax.Array) -> "PerDatapointMeanField":
        return PerDatapointMeanField(
            location=jnp.take(self.location, indices, axis=0),
            scale_diag=jnp.take(self.scale_diag, indices, axis=0),
            base=self.base,
            weight=self.weight * (self.n_rows / indices.shape[0]),
        )

    def _flat(self):
        return self.location.reshape(-1), self.scale_diag.reshape(-1)

    def sample(self, key: jax.Array, n_samples: int) -> jax.Array:
        loc, sd = self._flat()
        u = self.base.sample(key, (n_samples, loc.shape[0]), loc.dtype)
        return u * sd + loc

    def log_prob(self, z: jax.Array) -> jax.Array:
        """WEIGHTED density: weight * sum_i log q_i — the estimator term the
        subsampled ELBO needs (see module docstring); weight is 1.0 for the
        full family, so unsubsampled use is the ordinary density."""
        loc, sd = self._flat()
        u = (z - loc) / sd
        raw = jnp.sum(self.base.log_prob(u), axis=-1) - jnp.sum(
            jnp.log(jnp.abs(sd))
        )
        return self.weight * raw

    def entropy(self) -> jax.Array:
        loc, sd = self._flat()
        d = loc.shape[0]
        raw = d * jnp.asarray(
            self.base.entropy(), dtype=loc.dtype
        ) + jnp.sum(jnp.log(jnp.abs(sd)))
        return self.weight * raw

    def mean(self) -> jax.Array:
        return self._flat()[0]

    def var(self) -> jax.Array:
        return self.base.var() * jnp.square(self._flat()[1])


def per_datapoint_meanfield(
    n_data: int, k: int = 1, scale: float = 0.1, dtype=jnp.float32
) -> PerDatapointMeanField:
    """Fresh local-latent family: N blocks of k latents each."""
    return PerDatapointMeanField(
        location=jnp.zeros((n_data, k), dtype),
        scale_diag=scale * jnp.ones((n_data, k), dtype),
    )


@pytree_dataclass
class GlobalLocalFamily:
    """Product family q(theta_g) x prod_i q(z_i): hierarchical-model VI.

    The standard doubly-stochastic decomposition for models with both global
    parameters and per-datapoint local latents (random-effects regressions,
    deep latent-variable models): any family over the ``dg`` global dims
    composed with a :class:`PerDatapointMeanField` over the N local rows.
    ``ppl.ingest(model, data=...)`` assembles this automatically for models
    whose plates contain latent sites (the reference handles the analogous
    case through the family-subsampling hook,
    reference: src/algorithms/subsampledobjective.jl:81 +
    ext/AdvancedVIDynamicPPLExt.jl:188-209).

    Flat sample layout (matches ``ppl.Model``'s local-latent layout):
    ``[global dims (dg)] ++ [local block, row-major (rows * k)]``.

    ``subsample(idx)`` gathers the minibatch's local rows — the global block
    never subsamples — and the local density/entropy bookkeeping carries the
    N/B ``weight`` (see PerDatapointMeanField's module docstring for the
    unbiasedness argument; the global entropy enters every batch estimate
    unscaled because it is a single global ELBO term, not a per-datapoint
    sum).
    """

    global_q: Any
    local_q: PerDatapointMeanField

    @property
    def dim(self) -> int:
        return self.global_q.dim + self.local_q.dim

    @property
    def weight(self) -> float:
        # != 1 only under subsampling; objectives that are nonlinear in
        # log q (VarGrad, IWELBO) use this to reject weighted densities.
        return self.local_q.weight

    def subsample(self, indices: jax.Array) -> "GlobalLocalFamily":
        return GlobalLocalFamily(
            global_q=self.global_q,
            local_q=self.local_q.subsample(indices),
        )

    def sample(self, key: jax.Array, n_samples: int) -> jax.Array:
        kg, kl = jax.random.split(key)
        zg = self.global_q.sample(kg, n_samples)
        zl = self.local_q.sample(kl, n_samples)
        return jnp.concatenate([zg, zl], axis=-1)

    def log_prob(self, z: jax.Array) -> jax.Array:
        dg = self.global_q.dim
        return self.global_q.log_prob(z[..., :dg]) + self.local_q.log_prob(
            z[..., dg:]
        )

    def entropy(self) -> jax.Array:
        return self.global_q.entropy() + self.local_q.entropy()

    def mean(self) -> jax.Array:
        return jnp.concatenate([self.global_q.mean(), self.local_q.mean()])

    def var(self) -> jax.Array:
        return jnp.concatenate([self.global_q.var(), self.local_q.var()])
