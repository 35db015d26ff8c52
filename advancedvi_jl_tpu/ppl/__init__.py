"""Probabilistic-program ingestion (the reference's PPL-bridge layer, L8).

Native DSL: write models with ``ppl.sample``/``ppl.plate``, turn them into
fit-ready unconstrained targets with ``ppl.ingest`` (automatic support
transforms, plate-aware subsampling).  External: ``ppl.from_numpyro`` adapts
numpyro-authored models when numpyro is installed.
"""

from .dists import (
    Bernoulli,
    Beta,
    Categorical,
    Dirichlet,
    Exponential,
    Gamma,
    HalfCauchy,
    HalfNormal,
    Laplace,
    LogNormal,
    Normal,
    Poisson,
    StudentT,
    Uniform,
)
from .model import Model, PPLTarget, ingest, plate, prior_predictive, sample
from .numpyro_bridge import from_numpyro

__all__ = [
    "Bernoulli",
    "Beta",
    "Categorical",
    "Dirichlet",
    "Exponential",
    "Gamma",
    "HalfCauchy",
    "HalfNormal",
    "Laplace",
    "LogNormal",
    "Normal",
    "Poisson",
    "StudentT",
    "Uniform",
    "Model",
    "PPLTarget",
    "ingest",
    "plate",
    "prior_predictive",
    "sample",
    "from_numpyro",
]
