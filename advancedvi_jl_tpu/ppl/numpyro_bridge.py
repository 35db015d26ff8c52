"""NumPyro model adapter (optional; gated on numpyro being installed).

The direct analogue of the reference's DynamicPPL extension
(reference: ext/AdvancedVIDynamicPPLExt.jl:72-211): take a model written for
an external PPL and expose it through this framework's target protocol in
UNCONSTRAINED space, so every algorithm/objective/family here applies
unchanged.

Uses NumPyro's own machinery (trace/seed handlers for site discovery,
``biject_to(support)`` for constrained->unconstrained bijections,
``potential_energy`` for the transformed log-joint), so any numpyro model —
including ``numpyro.plate``-structured ones — works.  Subsampling note: for
doubly-stochastic VI prefer the native DSL (``ppl.ingest(model, data=...)``),
which subsamples inside the jitted step; numpyro's own ``subsample_size``
plates draw batch indices host-side and are not static-shape-stable under
``lax.scan``.

numpyro is NOT a dependency of this package; importing this module without
it raises ImportError with install guidance.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..core.problem import ORDER_JAX
from ..core.pytree import pytree_dataclass, static_field


def _require_numpyro():
    try:
        import numpyro  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "from_numpyro requires the optional dependency numpyro "
            "(pip install numpyro). For a dependency-free path, write the "
            "model with advancedvi_jl_tpu.ppl.sample/plate and use "
            "ppl.ingest(...)."
        ) from e


@pytree_dataclass
class NumPyroTarget:
    """Unconstrained-space log-joint of a numpyro model.

    ``log_density(x)`` unravels the flat vector into numpyro's per-site
    unconstrained pytree and evaluates ``-potential_energy`` (which already
    includes the log-det-Jacobian of numpyro's support bijections).
    """

    model_args: Any
    model_kwargs: Any
    unravel_fn: Callable = static_field()
    model: Callable = static_field()
    dim: int = static_field()

    def order(self) -> int:
        return ORDER_JAX

    def log_density(self, x: jax.Array) -> jax.Array:
        from numpyro.infer.util import potential_energy

        params = self.unravel_fn(x)
        return -potential_energy(
            self.model,
            tuple(self.model_args),
            dict(self.model_kwargs),
            params,
        )


class NumPyroModel:
    """Bundle mirroring ppl.Model for numpyro-authored models."""

    def __init__(self, model, target, unravel_fn, constrain_fn, dim):
        self.model = model
        self.target = target
        self.dim = dim
        self._unravel = unravel_fn
        self._constrain = constrain_fn

    def q_init(self, scale: float = 0.1):
        from ..families.location_scale import MeanFieldGaussian

        return MeanFieldGaussian(
            jnp.zeros(self.dim), scale * jnp.ones(self.dim)
        )

    def constrain(self, x: jax.Array) -> Dict[str, jax.Array]:
        return self._constrain(self._unravel(x))

    def sample_posterior(self, key, q, n_samples: int):
        z = q.sample(key, n_samples)
        return jax.vmap(self.constrain)(z)


def from_numpyro(model, *model_args, seed: int = 0, **model_kwargs):
    """numpyro model -> NumPyroModel with a fit-ready unconstrained target.

    Matches NumPyro's own SVI/AutoNormal parameterization: the VI family
    lives in the flat unconstrained space, posteriors map back through the
    per-site support bijections.
    """
    _require_numpyro()
    from jax.flatten_util import ravel_pytree
    from numpyro import handlers
    from numpyro.distributions.transforms import biject_to
    from numpyro.infer.util import constrain_fn as np_constrain_fn

    with handlers.seed(rng_seed=seed):
        tr = handlers.trace(model).get_trace(*model_args, **model_kwargs)
    unconstrained = {}
    for name, site in tr.items():
        if site["type"] != "sample" or site.get("is_observed", False):
            continue
        transform = biject_to(site["fn"].support)
        unconstrained[name] = transform.inv(site["value"])
    if not unconstrained:
        raise ValueError("numpyro model declares no latent sample sites")
    flat, unravel_fn = ravel_pytree(unconstrained)

    target = NumPyroTarget(
        model_args=list(model_args),
        model_kwargs=dict(model_kwargs),
        unravel_fn=unravel_fn,
        model=model,
        dim=flat.shape[0],
    )

    def constrain(params):
        return np_constrain_fn(
            model, tuple(model_args), dict(model_kwargs), params
        )

    return NumPyroModel(model, target, unravel_fn, constrain, flat.shape[0])
