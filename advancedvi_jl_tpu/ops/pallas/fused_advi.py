"""Whole-loop fused ADVI engine for the flagship model (Pallas TPU).

The flagship benchmark step (mean-field ADVI + STL on hierarchical
logistic regression, d=62, n_samples=10) is op-count-bound, not
FLOP-bound: the XLA path compiles to ~12 fused kernels whose per-kernel
dispatch (~1.3 us) is the measured ceiling (BENCH_NOTES "Headline
profile"); the arithmetic itself is microseconds.  The TPU-native answer
is to stop dispatching: this module runs the ENTIRE optimization loop —
on-chip RNG, reparameterized draw, likelihood + hierarchical prior
gradient (hand-derived), STL entropy correction, Adam, ClipScale, and
polynomial parameter averaging — inside ONE Pallas kernel, with a
``fori_loop`` over steps and all state resident in VMEM.  One dispatch
per chunk of steps instead of ~12 per step.

Semantics match ``KLMinRepGradDescent(entropy=STL, n_samples=n,
optimizer=optax.adam(lr), operator=ClipScale())`` + ``PolynomialAveraging``
on ``LogReg(...).unconstrained()`` exactly, EXCEPT the RNG stream: base
normals come from the on-chip PRNG (Box–Muller, as the samplers in
location_scale_kernels.py), not from the JAX key hierarchy.  The update
math is pinned against the general path by injecting the general path's
own base draws through the ``noise`` debug input and asserting the
resulting states match (tests/test_fused_advi.py); the RNG path is
validated statistically on hardware.

Gradient derivation (model: models/logreg.py, bijector: Exp on sigma;
theta = [beta (db), t], sigma = e^t, db = X.shape[1], s = prior_scale):

    log pi(z) = likeadj * sum_j [y_j l_j - softplus(l_j)]   (l = X beta)
              - |beta|^2 e^{-2t} / 2 - db*t - t^2/(2 s^2)
              - log s - (db+1)/2 * log 2 pi                  (+t - t cancel)
    d/dbeta   = likeadj * X^T (y - sigmoid(l)) - beta e^{-2t}
    d/dt      = |beta|^2 e^{-2t} - db - t/s^2

STL: dL/dz_i = -(1/n) [grad log pi(z_i) + u_i / sigma_q]  (the entropy
estimate -mean log q_stop(z) contributes -grad_z log q_stop = -u/sigma_q,
so the bracket vanishes at q = pi: sticking-the-landing);
dmu = sum_i dL/dz_i, dsig = sum_i dL/dz_i * u_i.

No reference counterpart: the reference's hot loop is one Julia
iteration per step (src/optimize.jl:40-77); this is the TPU-first
redesign of the entire loop, not of one op.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .location_scale_kernels import _box_muller, key_to_seed

D_PAD = 128     # lane-padded parameter dimension (d <= 128)
N_PAD = 16      # sublane-padded sample count (n_samples <= 16)
_L2PI = math.log(2.0 * math.pi)
_GOLD = -1640531527  # int32 golden-ratio mix (as the samplers)


class FusedADVIState(NamedTuple):
    """Kernel-resident optimizer state, lane-padded to (1, 128).

    Padded entries are inert by construction: ``sig`` is 1.0 there (so
    whitening never divides by zero) and every gradient is masked to the
    real dimensions, so Adam moments stay exactly zero in the padding.
    """

    mu: jax.Array        # (1, D_PAD) location
    sig: jax.Array       # (1, D_PAD) scale diagonal
    m_mu: jax.Array      # Adam first moments
    v_mu: jax.Array      # Adam second moments
    m_sig: jax.Array
    v_sig: jax.Array
    avg_mu: jax.Array    # polynomial-averaged parameters
    avg_sig: jax.Array
    iteration: jax.Array  # () int32
    elbo: jax.Array      # () f32, last step's estimate


def _kernel(
    # static
    n_samples, n_data, db, steps, use_noise,
    # refs
    seed_ref, it0_ref, hyp_ref,
    X_ref, y_ref, noise_ref,
    mu_ref, sig_ref, mmu_ref, vmu_ref, msig_ref, vsig_ref,
    amu_ref, asig_ref,
    mu_o, sig_o, mmu_o, vmu_o, msig_o, vsig_o, amu_o, asig_o, elbo_o,
):
    lr = hyp_ref[0]
    b1 = hyp_ref[1]
    b2 = hyp_ref[2]
    eps = hyp_ref[3]
    likeadj = hyp_ref[4]
    s_prior = hyp_ref[5]
    avg_eta = hyp_ref[6]
    clip_eps = hyp_ref[7]

    it0 = it0_ref[0]
    if not use_noise:
        # Chunk-unique stream: fold the starting iteration into seed word 0
        # (v5e: max 2 seed words).  Skipped entirely on the noise-injection
        # debug path so interpret mode never touches TPU RNG primitives.
        pltpu.prng_seed(seed_ref[0] + it0 * _GOLD, seed_ref[1])

    data_pad = X_ref.shape[0]
    # masks (f32): valid q dims j < db+1; beta dims j < db; data rows < n_data
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D_PAD), 1)
    maskd = (lane < db + 1).astype(jnp.float32)
    maskb = (lane < db).astype(jnp.float32)
    onehot_t = (lane == db).astype(jnp.float32)
    dlane = jax.lax.broadcasted_iota(jnp.int32, (1, data_pad), 1)
    maskdata = (dlane < n_data).astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (N_PAD, D_PAD), 0)
    maskn = (rowi < n_samples).astype(jnp.float32)

    X = X_ref[:]          # (data_pad, D_PAD), padded cols/rows zero
    Xt = X.T              # hoisted out of the step loop
    y = y_ref[:]          # (1, data_pad)
    inv_n = 1.0 / n_samples
    ln_b1 = jnp.log(b1)
    ln_b2 = jnp.log(b2)

    def body(i, carry):
        mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig, _ = carry
        it_f = (it0 + i).astype(jnp.float32)

        if use_noise:
            u = noise_ref[pl.ds(i * N_PAD, N_PAD), :]
        else:
            u = _box_muller((N_PAD, D_PAD))
        u = u * maskn * maskd

        z = mu + sig * u                      # (N_PAD, D_PAD)
        beta = z * maskb
        tcol = jnp.sum(z * onehot_t, axis=1, keepdims=True)   # (N_PAD, 1)
        inv_sig2 = jnp.exp(-2.0 * tcol)
        beta_sq = jnp.sum(beta * beta, axis=1, keepdims=True)

        logits = jnp.dot(
            beta, Xt, preferred_element_type=jnp.float32
        )                                     # (N_PAD, data_pad)
        p = jax.nn.sigmoid(logits)
        # stable softplus
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        loglike = jnp.sum((y * logits - sp) * maskdata, axis=1, keepdims=True)

        logpi = (
            likeadj * loglike
            - 0.5 * beta_sq * inv_sig2
            - db * tcol
            - tcol * tcol / (2.0 * s_prior * s_prior)
            - jnp.log(s_prior)
            - 0.5 * (db + 1) * _L2PI
        )                                     # (N_PAD, 1)

        # grad log pi
        gl = likeadj * ((y - p) * maskdata)   # (N_PAD, data_pad)
        gbeta = jnp.dot(gl, X, preferred_element_type=jnp.float32)
        gt = beta_sq * inv_sig2 - db - tcol / (s_prior * s_prior)
        grad_logpi = maskb * (gbeta - beta * inv_sig2) + onehot_t * gt

        # STL: dL/dz = -(1/n)(grad_logpi + u / sigma_q); the bracket is the
        # score mismatch and vanishes at q = pi (sticking the landing)
        g_z = -inv_n * (grad_logpi + u / sig) * maskn * maskd
        dmu = jnp.sum(g_z, axis=0, keepdims=True)             # (1, D_PAD)
        dsig = jnp.sum(g_z * u, axis=0, keepdims=True)

        # ELBO estimate (info channel): energy + STL entropy value
        row_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (N_PAD, 1), 0) < n_samples
        ).astype(jnp.float32)
        energy = inv_n * jnp.sum(logpi * row_valid)
        ent = (
            jnp.sum(jnp.log(sig) * maskd)
            + inv_n * jnp.sum(0.5 * u * u)
            + 0.5 * (db + 1) * _L2PI
        )
        elbo = energy + ent

        # Adam (optax.scale_by_adam semantics, count_inc = it + 1)
        c = it_f + 1.0
        bc1 = 1.0 - jnp.exp(c * ln_b1)
        bc2 = 1.0 - jnp.exp(c * ln_b2)

        def adam(m, v, g, p_):
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * g * g
            upd = -lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            return m2, v2, p_ + upd

        m_mu, v_mu, mu = adam(m_mu, v_mu, dmu, mu)
        m_sig, v_sig, sig = adam(m_sig, v_sig, dsig, sig)
        sig = jnp.maximum(sig, clip_eps)      # ClipScale

        # PolynomialAveraging: w = (eta + 1) / (t + eta), t = it + 1
        w = (avg_eta + 1.0) / (c + avg_eta)
        a_mu = (1.0 - w) * a_mu + w * mu
        a_sig = (1.0 - w) * a_sig + w * sig

        return (mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig, elbo)

    init = (
        mu_ref[:], sig_ref[:], mmu_ref[:], vmu_ref[:],
        msig_ref[:], vsig_ref[:], amu_ref[:], asig_ref[:],
        jnp.float32(0.0),
    )
    mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig, elbo = jax.lax.fori_loop(
        0, steps, body, init
    )
    mu_o[:] = mu
    sig_o[:] = sig
    mmu_o[:] = m_mu
    vmu_o[:] = v_mu
    msig_o[:] = m_sig
    vsig_o[:] = v_sig
    amu_o[:] = a_mu
    asig_o[:] = a_sig
    elbo_o[:] = jnp.full((1, D_PAD), elbo)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_samples", "n_data", "db", "steps", "use_noise", "interpret"
    ),
)
def _run_chunk(
    seed, it0, hyp, X_pad, y_pad, noise, state_arrays,
    n_samples, n_data, db, steps, use_noise, interpret,
):
    data_pad = X_pad.shape[0]
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((1, D_PAD), jnp.float32) for _ in range(9)
    )
    kernel = functools.partial(
        _kernel, n_samples, n_data, db, steps, use_noise
    )
    return pl.pallas_call(
        kernel,
        in_specs=[smem, smem, smem, vec, vec, vec] + [vec] * 8,
        out_specs=tuple(vec for _ in range(9)),
        out_shape=out_shape,
        interpret=interpret,
    )(seed, it0, hyp, X_pad, y_pad, noise, *state_arrays)


def _pad_lane(x, width=D_PAD, fill=0.0):
    v = jnp.full((1, width), fill, jnp.float32)
    return v.at[0, : x.shape[0]].set(x.astype(jnp.float32))


class FusedLogRegADVI:
    """Whole-loop fused engine: mean-field ADVI + STL + Adam + ClipScale +
    polynomial averaging on the (unconstrained) hierarchical logreg target,
    one Pallas dispatch per ``steps`` chunk.

    Drop-in for the flagship benchmark loop; see module docstring for the
    exact general-path configuration it reproduces.
    """

    def __init__(
        self,
        X: jax.Array,
        y: jax.Array,
        prior_scale: float = 3.0,
        likeadj: float = 1.0,
        n_samples: int = 10,
        lr: float = 1e-3,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        avg_eta: float = 8.0,
        clip_eps: float = 1e-5,
        interpret: bool = False,
    ):
        n_data, db = X.shape
        if db + 1 > D_PAD:
            raise ValueError(
                f"fused engine supports dim <= {D_PAD}, got {db + 1}"
            )
        if n_samples > N_PAD:
            raise ValueError(
                f"fused engine supports n_samples <= {N_PAD}, got {n_samples}"
            )
        data_pad = -(-n_data // 256) * 256
        self.X_pad = jnp.zeros((data_pad, D_PAD), jnp.float32).at[
            :n_data, :db
        ].set(X.astype(jnp.float32))
        self.y_pad = jnp.zeros((1, data_pad), jnp.float32).at[0, :n_data].set(
            y.astype(jnp.float32)
        )
        self.n_data = n_data
        self.db = db
        self.dim = db + 1
        self.n_samples = n_samples
        self.hyp = jnp.array(
            [lr, b1, b2, eps, likeadj, prior_scale, avg_eta, clip_eps],
            jnp.float32,
        )
        self.interpret = interpret

    def init(self, location: jax.Array, scale_diag: jax.Array) -> FusedADVIState:
        d = self.dim
        if location.shape != (d,) or scale_diag.shape != (d,):
            raise ValueError(f"expected ({d},) location/scale_diag")
        zeros = jnp.zeros((1, D_PAD), jnp.float32)
        mu = _pad_lane(location)
        sig = _pad_lane(scale_diag, fill=1.0)  # padded lanes 1.0: inert
        return FusedADVIState(
            mu=mu, sig=sig,
            m_mu=zeros, v_mu=zeros, m_sig=zeros, v_sig=zeros,
            avg_mu=mu, avg_sig=sig,
            iteration=jnp.asarray(0, jnp.int32),
            elbo=jnp.float32(0.0),
        )

    def run_chunk(
        self,
        state: FusedADVIState,
        key: jax.Array,
        steps: int,
        noise: Optional[jax.Array] = None,
    ) -> FusedADVIState:
        """Advance ``steps`` iterations in one kernel dispatch.

        ``noise``: optional (steps * N_PAD, D_PAD) pre-drawn base normals
        (debug/parity path; replaces the on-chip RNG)."""
        use_noise = noise is not None
        if not use_noise:
            noise = jnp.zeros((N_PAD, D_PAD), jnp.float32)
        seed = key_to_seed(key)
        it0 = state.iteration.reshape(1)
        arrays = (
            state.mu, state.sig, state.m_mu, state.v_mu,
            state.m_sig, state.v_sig, state.avg_mu, state.avg_sig,
        )
        out = _run_chunk(
            seed, it0, self.hyp, self.X_pad, self.y_pad, noise, arrays,
            n_samples=self.n_samples, n_data=self.n_data, db=self.db,
            steps=steps, use_noise=use_noise, interpret=self.interpret,
        )
        return FusedADVIState(
            mu=out[0], sig=out[1], m_mu=out[2], v_mu=out[3],
            m_sig=out[4], v_sig=out[5], avg_mu=out[6], avg_sig=out[7],
            iteration=state.iteration + steps,
            elbo=out[8][0, 0],
        )

    # -- output in library types ------------------------------------------

    def q(self, state: FusedADVIState, averaged: bool = True):
        """Current variational family (averaged parameters by default,
        matching ``ParamSpaceSGD.output``)."""
        from ...families.location_scale import MeanFieldGaussian

        mu = state.avg_mu if averaged else state.mu
        sig = state.avg_sig if averaged else state.sig
        d = self.dim
        return MeanFieldGaussian(mu[0, :d], sig[0, :d])
