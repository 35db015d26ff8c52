"""Model ingestion: a probabilistic-program function -> ready-to-fit target.

TPU-native analogue of the reference's DynamicPPL extension
(reference: ext/AdvancedVIDynamicPPLExt.jl:72-211), which turns a PPL model
into (a) an unconstrained parameter vector, (b) a weighted log-joint
``likeadj * loglike + logprior - logjac``, and (c) an in-place ``subsample``.
Here the user writes a plain Python function using ``ppl.sample`` /
``ppl.plate`` effect primitives:

    import advancedvi_jl_tpu.ppl as ppl

    def model(data):
        sigma = ppl.sample("sigma", ppl.LogNormal(0.0, 3.0))
        beta = ppl.sample("beta", ppl.Normal(jnp.zeros(d), sigma))
        logits = data["X"] @ beta
        with ppl.plate("obs", n_data):
            ppl.sample("y", ppl.Bernoulli(logits=logits), obs=data["y"])

    m = ppl.ingest(model, data=data)
    q, infos, _ = avt.optimize(key, alg, n_iter, m.target, m.q_init())
    posterior = m.sample_posterior(key2, q, 1000)   # dict of site draws

Ingestion runs ONE trace pass (prior draws, host-side) to discover latent
sites — names, shapes, supports — then assembles:

- the constrained -> unconstrained ``Stacked`` bijection from the declared
  supports (core/transforms.py), with the log-det-Jacobian fused into the
  jitted ELBO path (the reference's varinfo "linking"),
- ``logprior_fn`` / ``loglike_fn`` closures that REPLAY the model function
  with latent values substituted from the flat vector (pure, jit-traceable),
- a ``FactorizedTarget`` when ``data`` is given, so plate-observed sites get
  static-shape minibatch subsampling with automatic n/batch likelihood
  rescaling (the ``likeadj`` Ref dance of the reference, :188-209).

Plate semantics: observed sites INSIDE a ``plate`` form the subsampled
likelihood; observed sites OUTSIDE any plate are global evidence terms and
are never rescaled (they join the prior accumulator).  Latent sites inside a
plate are PER-DATAPOINT local latents (scalar dist params broadcast to one
draw per plate row, numpyro-style): full-batch they join the flat vector
like any site; with ``data=`` subsampling, ingest assembles the
doubly-stochastic composition automatically — ``q_init()`` returns a
:class:`~advancedvi_jl_tpu.families.local.GlobalLocalFamily` whose local
block subsamples in lockstep with the data rows, per-datapoint priors and
log-det-Jacobians ride the rescalable likelihood accumulator, and the
amortized scatter-add gradient machinery (families/local.py) does the rest
(reference: ext/AdvancedVIDynamicPPLExt.jl:188-209 +
src/algorithms/subsampledobjective.jl:81).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..core.problem import ORDER_JAX, fn_target
from ..core.pytree import pytree_dataclass, static_field
from ..core.transforms import (
    Blockwise,
    Identity,
    Sigmoid,
    Softplus,
    StickBreakingSimplex,
    TransformedDistribution,
    TransformedTarget,
    stacked,
)

# ---------------------------------------------------------------------------
# Effect-handler machinery
# ---------------------------------------------------------------------------

_HANDLER_STACK: List[Any] = []
_PLATE_STACK: List["plate"] = []


def sample(name: str, dist: Any, obs: Optional[jax.Array] = None):
    """Declare a random site.  Latent when ``obs`` is None, observed otherwise."""
    if not _HANDLER_STACK:
        raise RuntimeError(
            "ppl.sample() used outside a model execution context; call the "
            "model through ppl.ingest(...) (or ppl.prior_predictive)."
        )
    return _HANDLER_STACK[-1].process(
        name, dist, obs, in_plate=len(_PLATE_STACK) > 0
    )


class plate:
    """Marks the subsampled-data axis.  Observed sites inside the plate form
    the per-datapoint likelihood (rescaled under minibatching); everything
    outside is global."""

    def __init__(self, name: str, size: int):
        self.name = name
        self.size = size

    def __enter__(self):
        _PLATE_STACK.append(self)
        return self

    def __exit__(self, *exc):
        _PLATE_STACK.pop()
        return False


class _HandlerCtx:
    def __init__(self, handler):
        self.handler = handler

    def __enter__(self):
        _HANDLER_STACK.append(self.handler)
        return self.handler

    def __exit__(self, *exc):
        _HANDLER_STACK.pop()
        return False


class _Tracer:
    """Discovery pass: draws latent sites from their priors, records metadata."""

    def __init__(self, key: jax.Array):
        self.key = key
        self.counter = 0
        self.sites: Dict[str, dict] = {}

    def process(self, name, dist, obs, in_plate):
        if name in self.sites:
            raise ValueError(f"duplicate site name {name!r}")
        if obs is not None:
            self.sites[name] = {"observed": True, "in_plate": in_plate}
            return obs
        support = dist.support
        if support == "discrete":
            raise ValueError(
                f"latent site {name!r} has a discrete distribution "
                f"({type(dist).__name__}); discrete latents are not "
                "supported by VI — marginalize them or observe the site."
            )
        val = dist.sample(jax.random.fold_in(self.key, self.counter))
        self.counter += 1
        plate_size = None
        if in_plate:
            # Plate = conditional independence over the data axis: a latent
            # site inside a plate is PER-DATAPOINT.  Scalar (or per-event)
            # distribution parameters broadcast to one draw per plate row —
            # the numpyro-style contract that keeps the model function valid
            # at ANY batch size (the replay substitutes a (batch, ...)-shaped
            # value and the same scalar params broadcast against it).  A
            # site whose leading dim already equals the plate size is kept
            # as-is (explicitly sized, full-batch-only style).
            if len(_PLATE_STACK) > 1:
                raise ValueError(
                    f"latent site {name!r} sits inside nested plates; "
                    "local-latent VI supports one plate level."
                )
            plate_size = _PLATE_STACK[-1].size
            if not (jnp.ndim(val) >= 1 and jnp.shape(val)[0] == plate_size):
                val = jnp.broadcast_to(
                    val, (plate_size,) + jnp.shape(val)
                )
        self.sites[name] = {
            "observed": False,
            "in_plate": in_plate,
            "plate_size": plate_size,
            "shape": jnp.shape(val),
            "support": support,
            "dist_type": type(dist).__name__,
            "interval": (
                (dist.lo, dist.hi) if support == "interval" else None
            ),
            "init": val,
        }
        return val


class _Replayer:
    """Scoring pass: substitutes latent values, accumulates log densities."""

    def __init__(self, values: Dict[str, jax.Array]):
        self.values = values
        self.logprior = 0.0  # priors + global (non-plate) evidence
        self.loglike = 0.0  # plate-observed likelihood (rescalable)

    def process(self, name, dist, obs, in_plate):
        if obs is not None:
            term = jnp.sum(dist.log_prob(obs))
            if in_plate:
                self.loglike = self.loglike + term
            else:
                self.logprior = self.logprior + term
            return obs
        val = self.values[name]
        term = jnp.sum(dist.log_prob(val))
        if in_plate:
            # Per-datapoint latent priors are part of the rescalable
            # per-datapoint sum: under minibatching sum_i log p(z_i | ...)
            # must scale by N/B exactly like the likelihood (full-batch:
            # likeadj = 1, so the total is unchanged).
            self.loglike = self.loglike + term
        else:
            self.logprior = self.logprior + term
        return val


# ---------------------------------------------------------------------------
# Support -> Transform assembly
# ---------------------------------------------------------------------------


def _site_transform(meta):
    s = meta["support"]
    if s == "real":
        return Identity()
    if s == "positive":
        return Softplus()
    if s == "unit_interval":
        return Sigmoid(lo=0.0, hi=1.0)
    if s == "interval":
        lo, hi = meta["interval"]
        return Sigmoid(lo=lo, hi=hi)
    if s == "simplex":
        # The simplex is a BLOCK support over the LAST axis: a (..., K)
        # Dirichlet site is prod(batch) independent K-simplices, each with
        # its own stick-breaking map and Jacobian — not one flattened
        # (prod(shape))-simplex.
        shape = meta["shape"]
        k = shape[-1]
        n_blocks = int(math.prod(shape[:-1])) if len(shape) > 1 else 1
        if n_blocks == 1:
            return StickBreakingSimplex()
        return Blockwise(
            inner=StickBreakingSimplex(),
            n_blocks=n_blocks,
            block_in=k - 1,
            block_out=k,
        )
    raise ValueError(f"unknown support {s!r}")


def _constrained_size(meta) -> int:
    return int(math.prod(meta["shape"])) if meta["shape"] else 1


def _unconstrained_size(meta) -> int:
    if meta["support"] == "simplex":
        shape = meta["shape"]
        n_blocks = int(math.prod(shape[:-1])) if len(shape) > 1 else 1
        return n_blocks * (shape[-1] - 1)
    return _constrained_size(meta)


# ---------------------------------------------------------------------------
# The ingested model
# ---------------------------------------------------------------------------


@pytree_dataclass
class PPLTarget:
    """logprior(theta) + likeadj * loglike(theta, data) with ONE model replay.

    Same contract as core.factorized.FactorizedTarget (the DynamicPPL-bridge
    analogue: weighted log-joint + static-shape minibatch subsample,
    reference: ext/AdvancedVIDynamicPPLExt.jl:188-209), but prior and
    likelihood come from a single replay of the model function — the replay
    returns both accumulators, so subsampled steps never touch full data.
    """

    data: Any
    likeadj: jax.Array
    replay_fn: Callable = static_field()  # (theta, data) -> (logprior, loglike)
    dim: int = static_field()
    n_data: int = static_field()
    data_axis: Optional[str] = static_field(default=None)
    # Per-datapoint latent dims: > 0 in local-latent mode, where theta's
    # trailing rows*local_k block holds the minibatch's local latents and
    # the target's dim SHRINKS with the batch (the family subsamples in
    # lockstep via GlobalLocalFamily.subsample).
    local_k: int = static_field(default=0)

    def order(self) -> int:
        return ORDER_JAX

    def log_density(self, theta: jax.Array) -> jax.Array:
        data = self.data
        if self.data_axis is not None:
            from ..parallel.mesh import shard_axis0

            data = jax.tree.map(
                lambda x: shard_axis0(x, self.data_axis), data
            )
        logprior, loglike = self.replay_fn(theta, data)
        return logprior + self.likeadj * loglike

    def subsample(self, indices: jax.Array) -> "PPLTarget":
        batch = indices.shape[0]
        return PPLTarget(
            data=jax.tree.map(
                lambda x: jnp.take(x, indices, axis=0), self.data
            ),
            likeadj=self.likeadj * (self.n_data / batch),
            replay_fn=self.replay_fn,
            dim=self.dim - (self.n_data - batch) * self.local_k,
            n_data=self.n_data,
            data_axis=self.data_axis,
            local_k=self.local_k,
        )


class Model:
    """Bundle of target + parameter-space bookkeeping for one model function."""

    def __init__(
        self, model_fn, data, latents, model_args, model_kwargs,
        data_axis=None,
    ):
        self._fn = model_fn
        self._data = data
        self.latents = latents  # ordered {name: meta}
        self._args = model_args
        self._kwargs = model_kwargs
        self._data_axis = data_axis

        self.local_names = [
            n for n, m in latents.items()
            if m["in_plate"] and data is not _NO_DATA
        ]
        self.global_names = [
            n for n in latents if n not in self.local_names
        ]
        if self.local_names:
            self._init_local_mode(latents)
            return

        names = list(latents)
        self._slices = {}
        off = 0
        for n in names:
            sz = _constrained_size(latents[n])
            self._slices[n] = (off, sz, latents[n]["shape"])
            off += sz
        self.dim_constrained = off
        self.transform = stacked(
            *[
                (_site_transform(latents[n]), _unconstrained_size(latents[n]))
                for n in names
            ]
        )
        self.dim = sum(_unconstrained_size(latents[n]) for n in names)
        self.target = self._build_target()

    # -- local-latent (doubly-stochastic) mode -------------------------------
    def _init_local_mode(self, latents) -> None:
        """Plate-local latent sites + data subsampling (VERDICT r2 #8).

        The VI vector is ``[global unconstrained | (rows, k) local block,
        row-major]``; ``q_init`` returns the matching
        :class:`~advancedvi_jl_tpu.families.local.GlobalLocalFamily`, whose
        ``subsample`` gathers the minibatch's local rows in lockstep with the
        target's data rows (the reference routes this through the
        family-subsampling hook, subsampledobjective.jl:81 +
        AdvancedVIDynamicPPLExt.jl:188-209).  Constrained supports are
        handled INSIDE the replay — per-datapoint log-det-Jacobians belong
        to the rescalable per-datapoint sum, so they accumulate on the
        likelihood side — which keeps the layout valid at every batch size
        (a Stacked bijection over the flat vector would bake in N).
        """
        n_data = jax.tree.leaves(self._data)[0].shape[0]
        for n in self.local_names:
            m = latents[n]
            if m["support"] == "simplex":
                raise ValueError(
                    f"local latent site {n!r} has simplex support; only "
                    "elementwise supports (real/positive/interval) are "
                    "supported inside a subsampled plate."
                )
            if m["plate_size"] != n_data:
                raise ValueError(
                    f"plate size {m['plate_size']} of local site {n!r} != "
                    f"data leading dimension {n_data}."
                )

        # global block: ordinary stacked layout
        self._slices = {}
        off = 0
        for n in self.global_names:
            sz = _constrained_size(latents[n])
            self._slices[n] = (off, sz, latents[n]["shape"])
            off += sz
        self._dg_con = off
        self.transform = stacked(
            *[
                (_site_transform(latents[n]), _unconstrained_size(latents[n]))
                for n in self.global_names
            ]
        ) if self.global_names else None
        self._dg_unc = sum(
            _unconstrained_size(latents[n]) for n in self.global_names
        )

        # local block: per-row slices (event shape = site shape minus the
        # plate dim)
        self._local_slices = {}
        row_off = 0
        for n in self.local_names:
            event_shape = latents[n]["shape"][1:]
            k = int(math.prod(event_shape)) if event_shape else 1
            self._local_slices[n] = (
                row_off, k, event_shape, _site_transform(latents[n])
            )
            row_off += k
        self.local_k = row_off
        self.n_data = n_data

        self.dim = self._dg_unc + n_data * self.local_k
        self.dim_constrained = self._dg_con + n_data * self.local_k

        def replay_fn(theta, batch_data):
            rows = jax.tree.leaves(batch_data)[0].shape[0]
            values, g_ldj, l_ldj = self._decode(theta, rows)
            rep = _Replayer(values)
            with _HandlerCtx(rep):
                self._fn(batch_data, *self._args, **self._kwargs)
            return rep.logprior + g_ldj, rep.loglike + l_ldj

        self.target = PPLTarget(
            data=self._data,
            likeadj=jnp.ones(()),
            replay_fn=replay_fn,
            dim=self.dim,
            n_data=n_data,
            data_axis=self._data_axis,
            local_k=self.local_k,
        )

    def _decode(self, theta, rows: int):
        """Unconstrained flat [global | (rows, k) local] -> ({site: constrained
        value}, global ldj, per-datapoint ldj)."""
        values = {}
        zero = jnp.zeros((), dtype=theta.dtype)
        g_ldj = zero
        if self.global_names:
            g_con, g_ldj = self.transform.forward_and_ldj(
                theta[: self._dg_unc]
            )
            for n, (off, sz, shape) in self._slices.items():
                # static slice (offsets are Python ints): stays
                # Mosaic-lowerable when the replay runs INSIDE a fused
                # Pallas kernel via an AD-derived spec (fused_advi.ad_spec)
                v = g_con[off : off + sz]
                values[n] = v.reshape(shape) if shape else v[0]
        local = theta[self._dg_unc :].reshape(rows, self.local_k)
        l_ldj = zero
        for n, (off, k, event_shape, tf) in self._local_slices.items():
            blk = local[:, off : off + k]
            con, ldj = tf.forward_and_ldj(blk)
            values[n] = con.reshape((rows,) + event_shape)
            l_ldj = l_ldj + ldj
        return values, g_ldj, l_ldj

    # -- target assembly ---------------------------------------------------
    def _replay(self, theta_constrained, data):
        values = self.unpack(theta_constrained)
        rep = _Replayer(values)
        with _HandlerCtx(rep):
            if data is _NO_DATA:
                self._fn(*self._args, **self._kwargs)
            else:
                self._fn(data, *self._args, **self._kwargs)
        return rep

    def _build_target(self):
        if self._data is _NO_DATA:

            def logjoint(theta, _):
                rep = self._replay(theta, _NO_DATA)
                return rep.logprior + rep.loglike

            base = fn_target(logjoint, dim=self.dim_constrained)
        else:
            n_data = jax.tree.leaves(self._data)[0].shape[0]

            def replay_fn(theta, batch):
                rep = self._replay(theta, batch)
                return rep.logprior, rep.loglike

            base = PPLTarget(
                data=self._data,
                likeadj=jnp.ones(()),
                replay_fn=replay_fn,
                dim=self.dim_constrained,
                n_data=n_data,
                data_axis=self._data_axis,
            )
        return TransformedTarget(prob=base, transform=self.transform)

    # -- parameter-space helpers --------------------------------------------
    def unpack(self, theta_constrained: jax.Array) -> Dict[str, jax.Array]:
        """Flat constrained vector -> {site: value} with original shapes."""
        out = {}
        for n, (off, sz, shape) in self._slices.items():
            # static slice — see _decode (Pallas-lowerable under ad_spec)
            v = theta_constrained[off : off + sz]
            out[n] = v.reshape(shape) if shape else v[0]
        return out

    def constrain(self, x_unconstrained: jax.Array) -> Dict[str, jax.Array]:
        """Unconstrained vector (the VI space) -> {site: constrained value}."""
        if self.local_names:
            rows = (x_unconstrained.shape[0] - self._dg_unc) // self.local_k
            values, _, _ = self._decode(x_unconstrained, rows)
            return values
        return self.unpack(self.transform.forward(x_unconstrained))

    def q_init(self, scale: float = 0.1):
        """Initial family in the unconstrained space: a mean-field Gaussian
        (the standard ADVI initialization), or — in local-latent mode — a
        :class:`GlobalLocalFamily` whose local block subsamples with the
        data."""
        from ..families.location_scale import MeanFieldGaussian

        if self.local_names:
            from ..families.local import (
                GlobalLocalFamily,
                per_datapoint_meanfield,
            )

            return GlobalLocalFamily(
                global_q=MeanFieldGaussian(
                    jnp.zeros(self._dg_unc),
                    scale * jnp.ones(self._dg_unc),
                ),
                local_q=per_datapoint_meanfield(
                    self.n_data, self.local_k, scale
                ),
            )
        return MeanFieldGaussian(
            jnp.zeros(self.dim), scale * jnp.ones(self.dim)
        )

    def posterior(self, q) -> TransformedDistribution:
        """Push the fitted unconstrained family to the constrained space."""
        if self.local_names:
            raise ValueError(
                "local-latent models have no single flat bijection "
                "(per-site transforms are applied per plate row); use "
                "sample_posterior() or constrain()."
            )
        return TransformedDistribution(base=q, transform=self.transform)

    def sample_posterior(
        self, key: jax.Array, q, n_samples: int
    ) -> Dict[str, jax.Array]:
        """Constrained posterior draws per site, stacked on axis 0."""
        if self.local_names:
            z = q.sample(key, n_samples)
            return jax.vmap(self.constrain)(z)
        z = self.posterior(q).sample(key, n_samples)
        return jax.vmap(self.unpack)(z)


_NO_DATA = object()


def ingest(
    model_fn: Callable,
    data: Any = _NO_DATA,
    *model_args,
    seed: int = 0,
    data_axis: Optional[str] = None,
    **model_kwargs,
) -> Model:
    """Trace ``model_fn`` once and build the fit-ready target.

    ``data``: optional pytree of arrays (leading dim = plate size) passed as
    the model's first argument; enables static-shape minibatch subsampling of
    plate-observed sites with automatic likelihood rescaling.  Without it the
    model function takes only ``model_args``/``model_kwargs`` (close over
    constants) and the target is full-batch.
    """
    tracer = _Tracer(jax.random.key(seed))
    with _HandlerCtx(tracer):
        if data is _NO_DATA:
            model_fn(*model_args, **model_kwargs)
        else:
            model_fn(data, *model_args, **model_kwargs)
    latents = {
        n: m for n, m in tracer.sites.items() if not m["observed"]
    }
    if not latents:
        raise ValueError("model declares no latent sites; nothing to infer")
    return Model(
        model_fn, data, latents, model_args, model_kwargs,
        data_axis=data_axis,
    )


def prior_predictive(
    model_fn: Callable, key: jax.Array, data: Any = _NO_DATA,
    *model_args, **model_kwargs,
) -> Dict[str, jax.Array]:
    """One joint draw of all latent sites from the prior."""
    tracer = _Tracer(key)
    with _HandlerCtx(tracer):
        if data is _NO_DATA:
            model_fn(*model_args, **model_kwargs)
        else:
            model_fn(data, *model_args, **model_kwargs)
    return {
        n: m["init"] for n, m in tracer.sites.items() if not m["observed"]
    }
