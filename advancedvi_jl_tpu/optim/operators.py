"""Post-update projection / proximal operators.

Applied to the variational family after each optimizer update inside the
jitted step (reference protocol: ``AbstractOperator.apply``,
src/AdvancedVI.jl:173-204).  The reference restructures params -> family ->
mutate -> destructure; here the family IS the params, so operators are pure
pytree -> pytree maps that XLA fuses into the step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field
from ..families.blockdiag import BlockDiagLocationScale
from ..families.local import GlobalLocalFamily, PerDatapointMeanField
from ..families.location_scale import (
    FullRankLocationScale,
    MeanFieldLocationScale,
)
from ..families.low_rank import LowRankLocationScale
from ..families.mixture import MixtureFullRank, MixtureMeanField
from .rules import stepsize_from_opt_state


@pytree_dataclass
class IdentityOperator:
    """No-op (reference: src/AdvancedVI.jl:197-199)."""

    def apply(self, q, opt_state):
        return q


@pytree_dataclass
class ClipScale:
    """Project the scale so its eigenvalues are >= epsilon.

    Reference: src/optimization/clip_scale.jl:8-41 — clamps the scale diagonal
    (mean-field / full-rank Cholesky) or ``scale_diag`` (low-rank).
    """

    epsilon: float = static_field(default=1e-5)

    def apply(self, q, opt_state):
        eps = self.epsilon
        if isinstance(q, GlobalLocalFamily):
            return q.replace(
                global_q=self.apply(q.global_q, opt_state),
                local_q=self.apply(q.local_q, opt_state),
            )
        if isinstance(q, (MeanFieldLocationScale, PerDatapointMeanField)):
            return q.replace(scale_diag=jnp.maximum(q.scale_diag, eps))
        if isinstance(q, FullRankLocationScale):
            # with_scale_diag zeroes then sets, so clamped entries are
            # exactly eps (no catastrophic cancellation).  Off-diagonal
            # storage is kept as-is: the strict upper triangle (dense
            # layout) is inert by contract, and rewriting it (e.g.
            # tril-masking) would perturb DoG/DoWG's global distance
            # ||x - x0|| when the initial scale carried upper-triangle
            # values.  Layout-agnostic (dense or packed).
            diag = q.scale_diag_view()
            return q.with_scale_diag(jnp.maximum(diag, eps))
        if isinstance(q, LowRankLocationScale):
            return q.replace(scale_diag=jnp.maximum(q.scale_diag, eps))
        if isinstance(q, MixtureMeanField):
            return q.replace(scale_diags=jnp.maximum(q.scale_diags, eps))
        if isinstance(q, (MixtureFullRank, BlockDiagLocationScale)):
            diag = jnp.diagonal(q.scales, axis1=-2, axis2=-1)  # (K|B, k)
            delta = jnp.maximum(diag, eps) - diag
            eye = jnp.eye(diag.shape[-1], dtype=q.scales.dtype)
            return q.replace(scales=q.scales + delta[:, :, None] * eye)
        raise TypeError(
            f"ClipScale is not defined for family {type(q).__name__}"
        )


@pytree_dataclass
class ProximalLocationScaleEntropy:
    """Closed-form proximal step for the entropy of a location-scale family.

    prox(lambda) = argmin_l' -H(q_l') + ||lambda - l'||^2 / (2 gamma_t);
    on the scale diagonal this solves to
        sigma' = sigma / 2 + sqrt(sigma^2 + 4 gamma_t) / 2
    (reference: src/optimization/proximal_location_scale_entropy.jl:20-61).
    ``gamma_t`` is the live step size extracted from the optimizer state
    (Descent / DoG / DoWG only).
    """

    def apply(self, q, opt_state):
        gamma = stepsize_from_opt_state(opt_state)
        if gamma is None:
            raise ValueError(
                "ProximalLocationScaleEntropy requires an optimizer whose "
                "step size is extractable from its state: descent, dog, dowg."
            )

        def prox(sigma):
            return sigma / 2.0 + jnp.sqrt(jnp.square(sigma) + 4.0 * gamma) / 2.0

        if isinstance(q, (MeanFieldLocationScale, PerDatapointMeanField)):
            return q.replace(scale_diag=prox(q.scale_diag))
        if isinstance(q, FullRankLocationScale):
            # Only the diagonal moves; layout-agnostic (dense or packed).
            diag = q.scale_diag_view()
            return q.with_scale_diag(prox(diag))
        # NOTE: the low-rank family is deliberately NOT supported (matching
        # the reference, proximal_location_scale_entropy.jl:23): its entropy
        # carries a logdet-lemma term coupling scale_diag to the low-rank
        # factor, so the diagonal-only closed form would be inexact.
        if isinstance(q, BlockDiagLocationScale):
            diag = jnp.diagonal(q.scales, axis1=-2, axis2=-1)  # (B, k)
            delta = prox(diag) - diag
            eye = jnp.eye(diag.shape[-1], dtype=q.scales.dtype)
            return q.replace(scales=q.scales + delta[:, :, None] * eye)
        raise TypeError(
            "ProximalLocationScaleEntropy only supports location-scale "
            f"families, got {type(q).__name__}"
        )
