"""Whole-loop fused multi-chain ADVI: C independent mean-field chains in
ONE Pallas kernel (TPU).

``parallel/chains.py`` vmaps the general step over a chain axis — many
XLA dispatches per step.  This module goes further: the chain axis lives
INSIDE the fused whole-loop kernel, so C complete mean-field ADVI+STL
optimizations (on-chip RNG, model gradient, Adam, ClipScale, polynomial
averaging) advance together with ONE dispatch per chunk of steps.  All
per-chain (1, D_PAD) rows become (C_PAD, D_PAD) blocks: the VPU/MXU work
that was 94% padding waste at one chain becomes dense, so aggregate
chain-steps/s scales far better than chain count costs.

Row layout: the (R, D_PAD) sample block has R = n_samples * C_PAD rows
with row r belonging to chain ``r % C_PAD``, sample ``r // C_PAD``.
Chain-to-row broadcast is a static concatenate of n_samples copies;
row-to-chain reduction is a static sum of n_samples (C_PAD, D_PAD)
slices — no selector matmuls, no layout gathers, no alignment hazards
(C_PAD is a multiple of 8, D_PAD = 128).

Model side: any ``FusedModelSpec`` works UNCHANGED — the step factories
are row-generic (they map (rows, D_PAD) z blocks to per-row (logpi,
grad)), so the single-chain and multi-chain engines share the exact same
model registry.  Semantics per chain match ``FusedADVI`` (and therefore
``KLMinRepGradDescent(entropy=STL, optimizer=adam, operator=ClipScale())``
+ polynomial averaging); the per-chain update math is pinned against C
independent general-path runs by injected noise (tests/test_fused_chains
.py).  RNG stream as fused_advi.run_chunk: step-indexed (per-iteration
reseed with the global step), so chunked runs resume bitwise.

No reference counterpart: the reference optimizes one chain per process
(src/optimize.jl); multi-start VI there is a shell loop.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_advi import (
    ALGO_ADAM,
    ALGO_COCOB,
    ALGO_DESCENT,
    ALGO_DOG,
    ALGO_DOWG,
    ETA_ALGOS,
    D_PAD,
    D_PAD_MAX,
    ENT_CF_ZERO,
    ENT_STL,
    ENT_STL_ZERO,
    GE_REPGRAD,
    GE_SCOREGRAD,
    OP_CLIP,
    OP_NONE,
    OP_PROX,
    _GOLD,
    _adam_candidate,
    _cocob_update,
    _dog_step,
    _dowg_step,
    FusedModelSpec,
    Masks,
    _box_muller,
    d_pad_for,
)
from .location_scale_kernels import key_to_seed

_L2PI = math.log(2.0 * math.pi)

N_SAMPLES_MAX = 64   # round 5: lifted from 16 (joint VMEM check below)
C_PAD_MAX = 128  # VMEM budget: R = 16 * 128 rows of (R, 128) f32 blocks

# per-chain rule codes for MIXED optimizer sweeps (kernel rcol values)
RULE_CODES = {
    ALGO_ADAM: 0.0,
    ALGO_DESCENT: 1.0,
    ALGO_DOWG: 2.0,
    ALGO_DOG: 3.0,
    ALGO_COCOB: 4.0,
}


class FusedChainsState(NamedTuple):
    """Kernel-resident state for C_PAD chains; every array (C_PAD, D_PAD)
    with chain c on row c (rows >= n_chains and lanes >= d are inert
    padding: scale rows 1.0, everything else 0)."""

    mu: jax.Array
    sig: jax.Array
    m_mu: jax.Array
    v_mu: jax.Array
    m_sig: jax.Array
    v_sig: jax.Array
    avg_mu: jax.Array
    avg_sig: jax.Array
    iteration: jax.Array   # () int32, shared across chains
    elbo: jax.Array        # (C_PAD,) f32, per-chain last-step estimate
    # COCOB's extra per-coordinate accumulators (as FusedADVIState.ext)
    ext: Optional[tuple] = None


def _chains_kernel(
    # static
    step_factory, static_cfg, n_consts, n_scratch, n_chains, c_pad,
    n_samples, d, steps, use_noise, use_lrs, use_rules, use_ext, traced,
    algo, entropy, grad_est, operator,
    # refs
    *refs,
):
    # input layout: [seed, it0, hyp, mscal, *consts, *state(8), noise?,
    # lrs?]; the per-chain learning-rate column replaces the scalar lr
    # when use_lrs (hyperparameter sweeps: C optimizers, C step sizes,
    # one kernel).
    #
    # Traced mode (VERDICT r4 #6 — per-chain divergence channel): a
    # sequential grid of G rows, each executing ``steps`` (= log_every)
    # iterations and storing the PER-CHAIN last-step ELBO as one row of
    # the (G, c_pad) trace — same structure as fused_advi._kernel's
    # traced mode (state persists in the revisited output refs; one
    # dynamic row store per GRID step, which avoids both Mosaic traps
    # recorded in CLAUDE.md).
    seed_ref, it0_ref, hyp_ref, mscal_ref = refs[:4]
    const_refs = refs[4 : 4 + n_consts]
    state_in = refs[4 + n_consts : 12 + n_consts]
    k = 12 + n_consts
    ext_in = refs[k : k + 6] if use_ext else ()
    k += 6 if use_ext else 0
    noise_ref = refs[k] if use_noise else None
    k += 1 if use_noise else 0
    lrs_ref = refs[k] if use_lrs else None
    k += 1 if use_lrs else 0
    rules_ref = refs[k] if use_rules else None
    scratch_refs = refs[len(refs) - n_scratch :] if n_scratch else ()
    n_out = 9 + (6 if use_ext else 0) + (1 if traced else 0)
    outs_all = refs[len(refs) - n_scratch - n_out : len(refs) - n_scratch]
    (mu_o, sig_o, mmu_o, vmu_o, msig_o, vsig_o, amu_o, asig_o,
     elbo_o) = outs_all[:9]
    ext_o = outs_all[9:15] if use_ext else ()
    trace_o = outs_all[-1] if traced else None

    lr = lrs_ref[:] if use_lrs else hyp_ref[0]   # (c_pad, 1) | scalar
    b1 = hyp_ref[1]
    b2 = hyp_ref[2]
    eps = hyp_ref[3]
    avg_eta = hyp_ref[4]
    clip_eps = hyp_ref[5]

    if traced:
        gidx = pl.program_id(0)
        outs = (mu_o, sig_o, mmu_o, vmu_o, msig_o, vsig_o, amu_o, asig_o)

        @pl.when(gidx == 0)
        def _seed_state():
            for src, dst in zip(
                state_in + tuple(ext_in), outs + tuple(ext_o)
            ):
                dst[:] = src[:]

        state_refs = outs
        ext_refs = ext_o
        block_off = gidx * steps
    else:
        state_refs = state_in
        ext_refs = ext_in
        block_off = 0

    it0 = it0_ref[0] + block_off

    R = n_samples * c_pad
    dp = state_in[0].shape[1]      # lane width, static at trace time
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, dp), 1)
    maskd = (lane < d).astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (R, dp), 0)
    # row r belongs to chain r % c_pad; rows of padded chains are invalid
    maskR = (jax.lax.rem(rowi, c_pad) < n_chains).astype(jnp.float32)
    chain_col = jax.lax.broadcasted_iota(jnp.int32, (c_pad, 1), 0)
    maskC = (chain_col < n_chains).astype(jnp.float32)   # (c_pad, 1)
    masks = Masks(lane=lane, maskd=maskd, maskn=maskR, d=d,
                  n_samples=n_samples, it0=it0, steps=steps)
    if n_scratch:
        model_fn = step_factory(
            static_cfg, masks, const_refs, mscal_ref, scratch_refs
        )
    else:
        model_fn = step_factory(static_cfg, masks, const_refs, mscal_ref)
    model_epilogue = None
    if isinstance(model_fn, tuple):
        model_fn, model_epilogue = model_fn

    inv_n = 1.0 / n_samples
    ln_b1 = jnp.log(b1)
    ln_b2 = jnp.log(b2)

    def chain_sum(x):
        # (R, D_PAD) -> (c_pad, D_PAD): static sum over the sample slices
        acc = x[0:c_pad]
        for s in range(1, n_samples):
            acc = acc + x[s * c_pad : (s + 1) * c_pad]
        return acc

    def rows(x):
        # (c_pad, D_PAD) -> (R, D_PAD): chain-to-row broadcast
        return jnp.concatenate([x] * n_samples, axis=0)

    def body(i, carry):
        mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig = carry[:8]
        ext = carry[8:-1]     # COCOB accumulators (empty otherwise)
        it_f = (it0 + i).astype(jnp.float32)

        if use_noise:
            u = noise_ref[pl.ds((block_off + i) * R, R), :]
        else:
            # step-indexed stream, as fused_advi._kernel: the draw at
            # iteration t depends on (key, t) only -> bitwise resume
            pltpu.prng_seed(seed_ref[0] + (it0 + i) * _GOLD, seed_ref[1])
            u = _box_muller((R, dp))
        u = u * maskR * maskd

        sig_rows = rows(sig)
        z = rows(mu) + sig_rows * u
        logpi, grad_logpi = model_fn(z, it0 + i)

        logdet = jnp.sum(jnp.log(sig) * maskd, axis=1, keepdims=True)
        energy = inv_n * chain_sum(logpi)          # (c_pad, 1)
        if grad_est == GE_SCOREGRAD:
            # per-chain VarGrad closed form (see fused_advi._kernel):
            # f centered within each chain, dlogq/dmu = u/sigma,
            # dlogq/dsigma = (u^2 - 1)/sigma.
            u2row = jnp.sum(0.5 * u * u, axis=1, keepdims=True)  # (R, 1)
            logq = -(u2row + rows(logdet) + 0.5 * d * _L2PI)
            f = logq - logpi                                     # (R, 1)
            fbar = inv_n * chain_sum(f)                          # (c_pad, 1)
            ci = (f - rows(fbar)) * inv_n
            dmu = maskd * chain_sum(ci * (u / sig_rows))
            dsig = maskd * chain_sum(ci * ((u * u - 1.0) / sig_rows))
            dmu = dmu * maskC
            dsig = dsig * maskC
            elbo_c = energy - inv_n * chain_sum(logq)
        else:
            if entropy == ENT_CF_ZERO:
                g_z = -inv_n * grad_logpi * maskR * maskd
            else:
                # STL per chain: dL/dz = -(1/n)(grad_logpi + u/sigma)
                g_z = -inv_n * (grad_logpi + u / sig_rows) * maskR * maskd
            dmu = chain_sum(g_z)
            dsig = chain_sum(g_z * u)
            if entropy == ENT_STL_ZERO:
                dsig = dsig + maskC * (maskd / sig)
            # per-chain ELBO estimate: energy + entropy value
            if entropy == ENT_CF_ZERO:
                ent = logdet + 0.5 * d * (1.0 + _L2PI)
            else:
                u2 = chain_sum(0.5 * u * u)
                ent = (
                    logdet
                    + inv_n * jnp.sum(u2, axis=1, keepdims=True)
                    + 0.5 * d * _L2PI
                )
            elbo_c = energy + ent                  # (c_pad, 1)

        c = it_f + 1.0
        if use_rules:
            # MIXED per-chain rules (round 5): every rule's update is
            # computed as a candidate and blended per chain row —
            # optimizer arithmetic is a small slice of the step, so the
            # 3-4x redundancy costs little while one dispatch compares
            # {adam, descent, dowg, dog, cocob} on the same model.
            # Slot meanings are PER ROW (m_* = adam first moment OR the
            # frozen x0/x1; v_* = second moment OR [v, r] lanes OR
            # COCOB's L); candidates computed from a foreign row's slots
            # are finite garbage that the blend discards.
            rcol = rules_ref[:]                     # (c_pad, 1) f32 codes
            is_adam = (rcol == 0.0).astype(jnp.float32)
            is_desc = (rcol == 1.0).astype(jnp.float32)
            is_dowg = (rcol == 2.0).astype(jnp.float32)
            is_dog = (rcol == 3.0).astype(jnp.float32)
            is_cocob = (rcol == 4.0).astype(jnp.float32)
            eta_rows = is_desc + is_dowg + is_dog

            # adam candidate (shared helper: the per-chain-pinning
            # contract requires bit-identical math to the single-rule
            # branches)
            bc1 = 1.0 - jnp.exp(c * ln_b1)
            bc2 = 1.0 - jnp.exp(c * ln_b2)
            am_mu, av_mu, aupd_mu = _adam_candidate(
                lr, b1, b2, eps, bc1, bc2, m_mu, v_mu, dmu
            )
            am_sig, av_sig, aupd_sig = _adam_candidate(
                lr, b1, b2, eps, bc1, bc2, m_sig, v_sig, dsig
            )

            # dowg/dog candidate (shared [v, r] slot scheme)
            l0 = (lane == 0).astype(jnp.float32)
            l1 = (lane == 1).astype(jnp.float32)
            v_prev = jnp.sum(v_mu * l0, axis=1, keepdims=True)
            r_prev = jnp.sum(v_mu * l1, axis=1, keepdims=True)
            dist = jnp.sqrt(
                jnp.sum((mu - m_mu) ** 2, axis=1, keepdims=True)
                + jnp.sum((sig - m_sig) ** 2, axis=1, keepdims=True)
            )
            r = jnp.maximum(dist, r_prev)
            gsq = (
                jnp.sum(dmu * dmu, axis=1, keepdims=True)
                + jnp.sum(dsig * dsig, axis=1, keepdims=True)
            )
            v_dowg, eta_dowg = _dowg_step(v_prev, r, gsq)
            v_dog, eta_dog = _dog_step(v_prev, r, gsq)
            v2 = is_dowg * v_dowg + is_dog * v_dog
            eta_pf = is_dowg * eta_dowg + is_dog * eta_dog
            eta = is_desc * lr + eta_pf
            pf_v_mu = l0 * v2 + l1 * r

            # cocob candidate (engine ships ext whenever any row is cocob)
            if use_ext:
                ca = hyp_ref[6]
                g_mu, r_mu, t_mu, g_sig, r_sig, t_sig = ext
                cmu, cL_mu, cg_mu, cr_mu, ct_mu = _cocob_update(
                    ca, mu, m_mu, v_mu, g_mu, r_mu, t_mu, dmu
                )
                csig, cL_sig, cg_sig, cr_sig, ct_sig = _cocob_update(
                    ca, sig, m_sig, v_sig, g_sig, r_sig, t_sig, dsig
                )
                ext = (
                    is_cocob * cg_mu + (1.0 - is_cocob) * g_mu,
                    is_cocob * cr_mu + (1.0 - is_cocob) * r_mu,
                    is_cocob * ct_mu + (1.0 - is_cocob) * t_mu,
                    is_cocob * cg_sig + (1.0 - is_cocob) * g_sig,
                    is_cocob * cr_sig + (1.0 - is_cocob) * r_sig,
                    is_cocob * ct_sig + (1.0 - is_cocob) * t_sig,
                )
            else:
                cmu = csig = 0.0
                cL_mu = cL_sig = 0.0

            mu = (
                is_adam * (mu + aupd_mu)
                + eta_rows * (mu - eta * dmu)
                + is_cocob * cmu
            )
            sig = (
                is_adam * (sig + aupd_sig)
                + eta_rows * (sig - eta * dsig)
                + is_cocob * csig
            )
            m_mu = is_adam * am_mu + (1.0 - is_adam) * m_mu
            m_sig = is_adam * am_sig + (1.0 - is_adam) * m_sig
            v_mu = (
                is_adam * av_mu
                + (is_dowg + is_dog) * pf_v_mu
                + is_cocob * cL_mu
                + is_desc * v_mu
            )
            v_sig = (
                is_adam * av_sig
                + is_cocob * cL_sig
                + (1.0 - is_adam - is_cocob) * v_sig
            )
        elif algo == ALGO_ADAM:
            # Adam (optax.scale_by_adam, count_inc = it + 1), elementwise
            # per chain; padded chains receive exactly zero gradients.
            bc1 = 1.0 - jnp.exp(c * ln_b1)
            bc2 = 1.0 - jnp.exp(c * ln_b2)
            m_mu, v_mu, upd = _adam_candidate(
                lr, b1, b2, eps, bc1, bc2, m_mu, v_mu, dmu
            )
            mu = mu + upd
            m_sig, v_sig, upd = _adam_candidate(
                lr, b1, b2, eps, bc1, bc2, m_sig, v_sig, dsig
            )
            sig = sig + upd
        elif algo == ALGO_COCOB:
            # per-coordinate coin betting — COCOB is fully elementwise, so
            # the multi-chain form is literally the single-chain form on
            # (c_pad, D_PAD) blocks: the SHARED _cocob_update keeps the
            # two kernels numerically identical by construction.
            ca = hyp_ref[6]
            g_mu, r_mu, t_mu, g_sig, r_sig, t_sig = ext
            mu, v_mu, g_mu, r_mu, t_mu = _cocob_update(
                ca, mu, m_mu, v_mu, g_mu, r_mu, t_mu, dmu
            )
            sig, v_sig, g_sig, r_sig, t_sig = _cocob_update(
                ca, sig, m_sig, v_sig, g_sig, r_sig, t_sig, dsig
            )
            ext = (g_mu, r_mu, t_mu, g_sig, r_sig, t_sig)
        else:
            # per-chain Descent / DoWG / DoG (optim/rules.py, global norms
            # computed WITHIN each chain)
            if algo in (ALGO_DOWG, ALGO_DOG):
                # per-chain parameter-free state in the Adam slots:
                # m_* = x0, v_mu[:, 0] = v_c, v_mu[:, 1] = r_c.
                l0 = (lane == 0).astype(jnp.float32)
                l1 = (lane == 1).astype(jnp.float32)
                v_prev = jnp.sum(v_mu * l0, axis=1, keepdims=True)
                r_prev = jnp.sum(v_mu * l1, axis=1, keepdims=True)
                dist = jnp.sqrt(
                    jnp.sum((mu - m_mu) ** 2, axis=1, keepdims=True)
                    + jnp.sum((sig - m_sig) ** 2, axis=1, keepdims=True)
                )
                r = jnp.maximum(dist, r_prev)
                gsq = (
                    jnp.sum(dmu * dmu, axis=1, keepdims=True)
                    + jnp.sum(dsig * dsig, axis=1, keepdims=True)
                )
                # padded chains: v stays 0 -> the shared helpers floor
                # the division
                if algo == ALGO_DOWG:
                    v, eta = _dowg_step(v_prev, r, gsq)
                else:
                    v, eta = _dog_step(v_prev, r, gsq)
                v_mu = l0 * v + l1 * r
            else:
                eta = lr
            mu = mu - eta * dmu
            sig = sig - eta * dsig

        if operator == OP_CLIP:
            sig = jnp.maximum(sig, clip_eps)       # ClipScale
        elif operator == OP_PROX:
            proxed = 0.5 * sig + 0.5 * jnp.sqrt(sig * sig + 4.0 * eta)
            sig = sig + maskC * maskd * (proxed - sig)

        # PolynomialAveraging: w = (eta + 1) / (t + eta)
        w = (avg_eta + 1.0) / (c + avg_eta)
        a_mu = (1.0 - w) * a_mu + w * mu
        a_sig = (1.0 - w) * a_sig + w * sig

        return (mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig) + ext + (
            elbo_c,
        )

    init = (
        tuple(r[:] for r in state_refs)
        + tuple(r[:] for r in ext_refs)
        + (jnp.zeros((c_pad, 1), jnp.float32),)
    )
    res = jax.lax.fori_loop(0, steps, body, init)
    mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig = res[:8]
    elbo_c = res[-1]
    for dst, val in zip(ext_o, res[8:-1]):
        dst[:] = val
    mu_o[:] = mu
    sig_o[:] = sig
    mmu_o[:] = m_mu
    vmu_o[:] = v_mu
    msig_o[:] = m_sig
    vsig_o[:] = v_sig
    amu_o[:] = a_mu
    asig_o[:] = a_sig
    elbo_o[:] = elbo_c + jnp.zeros((c_pad, dp), jnp.float32)
    if model_epilogue is not None:
        model_epilogue()
    if traced:
        # this grid step's (1, c_pad) row of the per-chain ELBO trace —
        # a NaN/diverged chain is visible at log_every granularity
        # without a full run (VERDICT r4 #6).  Full-array trace block
        # (constant index map), one dynamic row store per grid step.
        trace_o[pl.ds(pl.program_id(0), 1)] = jnp.reshape(elbo_c, (1, c_pad))


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_factory", "static_cfg", "n_chains", "c_pad", "n_samples",
        "d", "steps", "use_noise", "use_ext", "interpret", "d_pad",
        "use_lrs", "use_rules", "log_every", "algo", "entropy", "grad_est",
        "operator", "const_spaces", "scratch",
    ),
)
def _run_chains_chunk(
    seed, it0, hyp, mscal, consts, noise, state_arrays,
    step_factory, static_cfg, n_chains, c_pad, n_samples, d, steps,
    use_noise, interpret, d_pad=D_PAD, lrs=None, use_lrs=False,
    rules=None, use_rules=False, log_every=0, algo=ALGO_ADAM,
    entropy=ENT_STL, grad_est=GE_REPGRAD, operator=OP_CLIP, ext=(),
    use_ext=False, const_spaces=None, scratch=(),
):
    shape = (c_pad, d_pad)
    out_shape = tuple(
        jax.ShapeDtypeStruct(shape, jnp.float32)
        for _ in range(9 + (6 if use_ext else 0))
    )
    operands = (seed, it0, hyp, mscal) + tuple(consts) + tuple(state_arrays)
    if use_ext:
        operands = operands + tuple(ext)
    if use_noise:
        operands = operands + (noise,)
    if use_lrs:
        operands = operands + (lrs,)
    if use_rules:
        operands = operands + (rules,)
    traced = log_every > 0
    if traced and steps % log_every:
        raise ValueError(
            f"traced chunks need steps % log_every == 0, got "
            f"{steps}/{log_every}"
        )
    from .fused_advi import _const_specs, _materialize_scratch

    scratch_shapes = _materialize_scratch(scratch)
    kernel = functools.partial(
        _chains_kernel, step_factory, static_cfg, len(consts),
        len(scratch_shapes), n_chains, c_pad, n_samples, d,
        log_every if traced else steps, use_noise, use_lrs, use_rules,
        use_ext, traced, algo, entropy, grad_est, operator,
    )
    if not traced:
        vec = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = (
            [smem, smem, smem, smem]
            + _const_specs(consts, const_spaces)
            + [vec] * 8
            + ([vec] * 6 if use_ext else [])
            + ([vec] if use_noise else [])
            + ([vec] if use_lrs else [])
            + ([vec] if use_rules else [])
        )
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=tuple(vec for _ in out_shape),
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*operands)

    # Traced: sequential grid of G = steps/log_every rows; every operand
    # and state output is a full-array block with a constant index map
    # (state persists across grid steps), only the (G, c_pad) trace
    # advances — the structure of fused_advi._run_chunk's traced mode.
    G = steps // log_every

    def whole(x, space=pltpu.VMEM):
        nd = len(x.shape)
        return pl.BlockSpec(
            x.shape, lambda g, _n=nd: (0,) * _n, memory_space=space
        )

    n_c = len(consts)
    const_whole = [
        pl.BlockSpec(memory_space=pl.ANY)
        if const_spaces is not None and const_spaces[i] == "any"
        else whole(consts[i])
        for i in range(n_c)
    ]
    in_specs = (
        [whole(x, pltpu.SMEM) for x in operands[:4]]
        + const_whole
        + [whole(x) for x in operands[4 + n_c :]]
    )
    trace_struct = jax.ShapeDtypeStruct((G, c_pad), jnp.float32)
    full_out = out_shape + (trace_struct,)
    out_specs = tuple(whole(s) for s in full_out)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=full_out,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)


class FusedChainsADVI:
    """C independent mean-field ADVI+STL chains in one whole-loop kernel.

    Per-chain semantics identical to ``FusedADVI`` (adam/ClipScale/
    polynomial averaging).  Chains share the model and hyperparameters
    and differ in initial parameters (and their RNG slice).  Use
    ``run_sharded`` to spread the chain axis over a device mesh (one
    kernel per device via shard_map).
    """

    def __init__(
        self,
        model: FusedModelSpec,
        n_chains: int,
        n_samples: int = 10,
        lr: float = 1e-3,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        avg_eta: float = 8.0,
        clip_eps: float = 1e-5,
        interpret: bool = False,
        optimizer: str = ALGO_ADAM,
        entropy: str = ENT_STL,
        grad_est: str = GE_REPGRAD,
        operator: str = OP_CLIP,
        alpha: float = 1e-6,
    ):
        # MIXED per-chain rule sweeps (round 5): optimizer may be a
        # sequence of n_chains rule names — one dispatch runs a different
        # update rule per chain (the kernel blends per-row candidates).
        self.rules = None
        if optimizer == "mixed":
            # "mixed" is the internal sentinel set AFTER a per-chain rule
            # list validates; the bare string has no rule list to run
            raise ValueError(
                "pass the per-chain rule NAMES as a list/tuple (e.g. "
                "optimizer=['adam', 'dowg', ...]), not the string 'mixed'"
            )
        if isinstance(optimizer, (list, tuple)):
            if len(optimizer) != n_chains:
                raise ValueError(
                    f"per-chain optimizer needs {n_chains} entries, got "
                    f"{len(optimizer)}"
                )
            bad = [o for o in optimizer if o not in RULE_CODES]
            if bad:
                raise ValueError(f"unknown optimizers in sweep: {bad!r}")
            if operator == OP_PROX:
                raise ValueError(
                    "operator='prox' is not supported with a mixed rule "
                    "sweep (the step size is undefined on adam/cocob rows)"
                )
            self._rule_list = tuple(optimizer)
            optimizer = "mixed"
        if optimizer != "mixed" and optimizer not in (
            ALGO_ADAM, ALGO_DESCENT, ALGO_DOWG, ALGO_DOG, ALGO_COCOB,
        ):
            raise ValueError(f"unknown optimizer {optimizer!r}")
        if entropy not in (ENT_STL, ENT_CF_ZERO, ENT_STL_ZERO):
            raise ValueError(f"unknown entropy {entropy!r}")
        if grad_est not in (GE_REPGRAD, GE_SCOREGRAD):
            raise ValueError(f"unknown grad_est {grad_est!r}")
        if operator not in (OP_CLIP, OP_PROX, OP_NONE):
            raise ValueError(f"unknown operator {operator!r}")
        if operator == OP_PROX:
            if optimizer not in ETA_ALGOS:
                raise ValueError(
                    "operator='prox' needs an extractable step size: use "
                    f"one of {ETA_ALGOS}"
                )
            if grad_est == GE_SCOREGRAD or entropy == ENT_STL:
                raise ValueError(
                    "operator='prox' pairs with the zero-gradient RepGrad "
                    "entropies (closed_form_zero_grad / stl_zero_grad)"
                )
        if grad_est == GE_SCOREGRAD and n_samples < 2:
            raise ValueError(
                "the VarGrad estimator needs n_samples >= 2 (sample "
                f"variance), got {n_samples}"
            )
        if n_samples > N_SAMPLES_MAX:
            raise ValueError(
                f"fused chains support n_samples <= {N_SAMPLES_MAX}, got "
                f"{n_samples}"
            )
        n_pad_c = -(-n_samples // 8) * 8
        if model.dim > D_PAD_MAX:
            raise ValueError(
                f"fused engine supports dim <= {D_PAD_MAX}, got {model.dim}"
            )
        c_pad = -(-n_chains // 8) * 8
        d_pad = d_pad_for(model.dim)
        # VMEM budget: the (R, d_pad) sample blocks must stay small; cap
        # the JOINT row-block footprint at the validated
        # n_samples=16 x C=128 x d_pad=128 size (round 5: n_samples and
        # n_chains trade off inside one budget).
        if c_pad * d_pad > C_PAD_MAX * D_PAD:
            raise ValueError(
                f"fused chains support n_chains * d_pad <= "
                f"{C_PAD_MAX * D_PAD} per kernel (VMEM), got "
                f"{c_pad} * {d_pad}; shard more chains over devices with "
                "run_sharded"
            )
        if n_pad_c * c_pad * d_pad > 16 * C_PAD_MAX * D_PAD:
            raise ValueError(
                f"fused chains support n_samples_pad * n_chains * d_pad "
                f"<= {16 * C_PAD_MAX * D_PAD} per kernel (VMEM sample "
                f"block), got {n_pad_c} * {c_pad} * {d_pad}; use fewer "
                "chains per kernel (run_sharded) or fewer samples"
            )
        self.model = model
        self.d_pad = d_pad
        self.dim = model.dim
        self.n_chains = n_chains
        self.c_pad = c_pad
        self.n_samples = n_samples
        # lr may be per-chain: an (n_chains,) array sweeps C step sizes in
        # the one kernel (padded chains get lr 0 — doubly inert).
        self.lrs = None
        if hasattr(lr, "shape") and getattr(lr, "shape", ()) != ():
            if optimizer == "mixed":
                if not any(
                    o in (ALGO_ADAM, ALGO_DESCENT) for o in self._rule_list
                ):
                    raise ValueError(
                        "per-chain lr with a mixed sweep needs at least "
                        "one adam/descent row (the other rules never read "
                        "lr)"
                    )
            elif optimizer not in (ALGO_ADAM, ALGO_DESCENT):
                # ADVICE r4: DoWG is parameter-free — the kernel never
                # reads lr in that branch, so a per-chain lr array would
                # silently run C identical-step-size chains.
                raise ValueError(
                    f"per-chain lr sweeps need a step-size-driven optimizer "
                    f"('{ALGO_ADAM}' or '{ALGO_DESCENT}'); "
                    f"optimizer={optimizer!r} never reads lr"
                )
            lr = jnp.asarray(lr, jnp.float32)
            if lr.shape != (n_chains,):
                raise ValueError(
                    f"per-chain lr must have shape ({n_chains},), got "
                    f"{lr.shape}"
                )
            self.lrs = jnp.zeros((c_pad, 1), jnp.float32).at[
                :n_chains, 0
            ].set(lr)
            lr_scalar = 0.0
        else:
            lr_scalar = float(lr)
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.avg_eta, self.clip_eps = avg_eta, clip_eps
        self.hyp = jnp.array(
            [lr_scalar, b1, b2, eps, avg_eta, clip_eps], jnp.float32
        )
        self.interpret = interpret
        self.algo = optimizer
        self.entropy = entropy
        self.grad_est = grad_est
        self.operator = operator
        self.alpha = alpha
        self.cocob_alpha = 100.0  # COCOB bet-fraction floor (rules.py)
        if self.algo == "mixed":
            # padded chains get the descent code: with their zero
            # gradients (and lr 0 on padded lr-sweep rows) every slot is
            # a no-op, keeping padding inert
            codes = np.asarray(
                [RULE_CODES[o] for o in self._rule_list], np.float32
            )
            col = np.full((self.c_pad, 1), RULE_CODES[ALGO_DESCENT],
                          np.float32)
            col[: self.n_chains, 0] = codes
            self.rules = jnp.asarray(col)

    def init(
        self, locations: jax.Array, scale_diags: jax.Array
    ) -> FusedChainsState:
        """``locations``/``scale_diags``: (n_chains, d) stacked per-chain
        initial parameters (e.g. from a jittered common start)."""
        C, d, cp = self.n_chains, self.dim, self.c_pad
        if locations.shape != (C, d):
            raise ValueError(
                f"expected ({C}, {d}) locations, got {locations.shape}"
            )
        if scale_diags.shape != (C, d):
            raise ValueError(
                f"expected ({C}, {d}) scale_diags, got {scale_diags.shape}"
            )
        mu = jnp.zeros((cp, self.d_pad), jnp.float32).at[:C, :d].set(
            locations.astype(jnp.float32)
        )
        sig = jnp.ones((cp, self.d_pad), jnp.float32).at[:C, :d].set(
            scale_diags.astype(jnp.float32)
        )
        zeros = jnp.zeros((cp, self.d_pad), jnp.float32)
        if self.algo == "mixed":
            # per-ROW slot layout: parameter-free/cocob rows freeze their
            # start point in m_* (x0/x1); dowg/dog rows carry [v, r]
            # lanes in v_mu; adam/descent rows keep zeros.  ext ships
            # whenever any row is cocob.
            rl = self._rule_list
            copy_rows = np.zeros((cp, 1), np.float32)
            pf_rows = np.zeros((cp,), bool)
            for i, o in enumerate(rl):
                if o in (ALGO_DOWG, ALGO_DOG, ALGO_COCOB):
                    copy_rows[i, 0] = 1.0
                if o in (ALGO_DOWG, ALGO_DOG):
                    pf_rows[i] = True
            copy_m = jnp.asarray(copy_rows)
            norm0 = jnp.sqrt(
                jnp.sum(jnp.square(locations.astype(jnp.float32)), axis=1)
                + jnp.sum(jnp.square(scale_diags.astype(jnp.float32)),
                          axis=1)
            )
            r0 = jnp.float32(self.alpha) * (1.0 + norm0)   # (C,)
            r0_col = jnp.zeros((cp,), jnp.float32).at[:C].set(
                jnp.where(jnp.asarray(pf_rows[:C]), r0, 0.0)
            )
            v_mu = zeros.at[:, 1].set(r0_col)
            has_cocob = any(o == ALGO_COCOB for o in rl)
            return FusedChainsState(
                mu=mu, sig=sig,
                m_mu=copy_m * mu, v_mu=v_mu,
                m_sig=copy_m * sig, v_sig=zeros,
                avg_mu=mu, avg_sig=sig,
                iteration=jnp.asarray(0, jnp.int32),
                elbo=jnp.zeros((cp,), jnp.float32),
                ext=(
                    (zeros, zeros, zeros, zeros, zeros, zeros)
                    if has_cocob else None
                ),
            )
        if self.algo == ALGO_COCOB:
            # per-chain COCOB state: x1 = m_* copies, L = v_* (zeros),
            # (G, reward, theta) x (mu, sig) in the ext slots.
            return FusedChainsState(
                mu=mu, sig=sig,
                m_mu=mu, v_mu=zeros, m_sig=sig, v_sig=zeros,
                avg_mu=mu, avg_sig=sig,
                iteration=jnp.asarray(0, jnp.int32),
                elbo=jnp.zeros((cp,), jnp.float32),
                ext=(zeros, zeros, zeros, zeros, zeros, zeros),
            )
        if self.algo in (ALGO_DOWG, ALGO_DOG):
            # per-chain DoWG/DoG state in the Adam slots: m_* = x0 copies,
            # v_mu[:, 0] = v_c (0), v_mu[:, 1] = r_c = alpha(1 + ||x0_c||)
            # over that chain's REAL parameter entries (optim/rules.py).
            norm0 = jnp.sqrt(
                jnp.sum(jnp.square(locations.astype(jnp.float32)), axis=1)
                + jnp.sum(jnp.square(scale_diags.astype(jnp.float32)), axis=1)
            )  # (C,)
            r0 = jnp.float32(self.alpha) * (1.0 + norm0)
            v_mu = zeros.at[:C, 1].set(r0)
            return FusedChainsState(
                mu=mu, sig=sig,
                m_mu=mu, v_mu=v_mu, m_sig=sig, v_sig=zeros,
                avg_mu=mu, avg_sig=sig,
                iteration=jnp.asarray(0, jnp.int32),
                elbo=jnp.zeros((cp,), jnp.float32),
            )
        return FusedChainsState(
            mu=mu, sig=sig,
            m_mu=zeros, v_mu=zeros, m_sig=zeros, v_sig=zeros,
            avg_mu=mu, avg_sig=sig,
            iteration=jnp.asarray(0, jnp.int32),
            elbo=jnp.zeros((cp,), jnp.float32),
        )

    def run_chunk(
        self,
        state: FusedChainsState,
        key: jax.Array,
        steps: int,
        noise: Optional[jax.Array] = None,
    ) -> FusedChainsState:
        """Advance every chain ``steps`` iterations in one dispatch.

        ``noise``: optional (steps * n_samples * c_pad, D_PAD) pre-drawn
        base normals (debug/parity path), row r of a step belonging to
        chain ``r % c_pad``.  RNG stream step-indexed as
        FusedADVI.run_chunk (bitwise chunk-associative).
        """
        state, _ = self._run(state, key, steps, noise, 0)
        return state

    def run_chunk_traced(
        self,
        state: FusedChainsState,
        key: jax.Array,
        steps: int,
        log_every: int,
        noise: Optional[jax.Array] = None,
    ):
        """Like ``run_chunk`` but also returns the PER-CHAIN thinned ELBO
        trace: a ``(steps // log_every, n_chains)`` array holding every
        chain's ELBO estimate at each ``log_every``-th step, recorded
        in-kernel.  A diverged chain is visible at log_every granularity
        (VERDICT r4 #6) — feed the trace to ``first_chain_divergence``.
        """
        if log_every < 1:
            raise ValueError(f"log_every must be >= 1, got {log_every}")
        return self._run(state, key, steps, noise, log_every)

    def _run(self, state, key, steps, noise, log_every, lrs=None):
        if lrs is None:
            lrs = self.lrs
        R = self.n_samples * self.c_pad
        use_noise = noise is not None
        if use_noise:
            expect = (steps * R, self.d_pad)
            if noise.shape != expect:
                raise ValueError(
                    f"noise must have shape {expect} for steps={steps}, "
                    f"got {noise.shape}"
                )
        else:
            noise = jnp.zeros((R, self.d_pad), jnp.float32)
        seed = key_to_seed(key)
        it0 = state.iteration.reshape(1)
        arrays = (
            state.mu, state.sig, state.m_mu, state.v_mu,
            state.m_sig, state.v_sig, state.avg_mu, state.avg_sig,
        )
        use_ext = state.ext is not None
        if (
            self.algo == "mixed"
            and any(o == ALGO_COCOB for o in self._rule_list)
            and not use_ext
        ):
            raise ValueError(
                "this mixed sweep contains cocob rows; init() the state "
                "with this engine so the ext accumulators exist"
            )
        if self.algo == ALGO_COCOB and not use_ext:
            raise ValueError(
                "COCOB needs a state created with optimizer='cocob' "
                "(its ext accumulators are missing)"
            )
        hyp = jnp.append(self.hyp, jnp.float32(self.cocob_alpha))
        out = _run_chains_chunk(
            seed, it0, hyp, self.model.scalars,
            tuple(self.model.consts), noise, arrays,
            step_factory=self.model.step_factory,
            static_cfg=self.model.static_cfg,
            n_chains=self.n_chains, c_pad=self.c_pad,
            n_samples=self.n_samples, d=self.dim, steps=steps,
            use_noise=use_noise, interpret=self.interpret,
            d_pad=self.d_pad,
            lrs=(lrs if lrs is not None
                 else jnp.zeros((1, 1), jnp.float32)),
            use_lrs=lrs is not None,
            rules=(self.rules if self.rules is not None
                   else jnp.zeros((1, 1), jnp.float32)),
            use_rules=self.rules is not None, log_every=log_every,
            algo=self.algo, entropy=self.entropy,
            grad_est=self.grad_est, operator=self.operator,
            ext=(state.ext if use_ext else ()), use_ext=use_ext,
            const_spaces=self.model.const_spaces,
            scratch=self.model.scratch,
        )
        new_state = FusedChainsState(
            mu=out[0], sig=out[1], m_mu=out[2], v_mu=out[3],
            m_sig=out[4], v_sig=out[5], avg_mu=out[6], avg_sig=out[7],
            iteration=state.iteration + steps,
            elbo=out[8][:, 0],
            ext=tuple(out[9:15]) if use_ext else None,
        )
        trace = (
            out[-1][: steps // log_every, : self.n_chains]
            if log_every else None
        )
        return new_state, trace

    def run_sharded(
        self,
        state: FusedChainsState,
        key: jax.Array,
        steps: int,
        mesh,
        axis: str = "mc",
        log_every: int = 0,
    ):
        """``run_chunk`` with the chain axis sharded over ``mesh[axis]``:
        each device runs ONE whole-loop kernel on its contiguous block of
        chains (chains are embarrassingly parallel — zero collectives).

        Requires n_chains == c_pad (multiple of 8) and divisible by the
        axis size, with the per-device block still a multiple of 8.
        Device i advances chains [i*C_loc, (i+1)*C_loc) under key
        fold_in(key, i) — the result is independent of the device count
        in distribution (each chain gets its own stream) but not bitwise.

        ``log_every > 0`` returns ``(state, trace)`` with the per-chain
        ELBO trace gathered to global chain order — the sharded
        divergence channel (feed to ``first_chain_divergence``); 0
        returns just the state.

        Per-chain lr sweeps shard too (round 5): the lr column travels as
        a shard_map operand split over the chain axis, so a 512-lr sweep
        runs as 512/n_dev lrs per device with zero collectives.
        """
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape[axis]
        if self.rules is not None:
            raise ValueError(
                "run_sharded does not yet support mixed per-chain rule "
                "sweeps; run them single-device (one dispatch) or build "
                "one engine per device"
            )
        if self.n_chains != self.c_pad or self.n_chains % n_dev:
            raise ValueError(
                f"run_sharded needs n_chains (= {self.n_chains}) to be a "
                f"multiple of 8 and of the '{axis}' axis size {n_dev}"
            )
        c_loc = self.n_chains // n_dev
        if c_loc % 8:
            raise ValueError(
                f"per-device chain block {c_loc} must be a multiple of 8"
            )
        # Per-chain lr sweeps: the padded lr COLUMN travels as a sharded
        # operand (split over the chain axis) and overrides the local
        # engine's scalar lr inside each device's kernel.
        lr_scalar = 0.0 if self.lrs is not None else self.lr
        local = FusedChainsADVI(
            self.model, c_loc, n_samples=self.n_samples, lr=lr_scalar,
            b1=self.b1, b2=self.b2, eps=self.eps, avg_eta=self.avg_eta,
            clip_eps=self.clip_eps, interpret=self.interpret,
            optimizer=self.algo, entropy=self.entropy,
            grad_est=self.grad_est, operator=self.operator,
            alpha=self.alpha,
        )
        local.cocob_alpha = self.cocob_alpha
        lrs_op = self.lrs  # (c_pad, 1) padded column or None

        spec_leaf = P(axis)
        specs = FusedChainsState(
            mu=spec_leaf, sig=spec_leaf, m_mu=spec_leaf, v_mu=spec_leaf,
            m_sig=spec_leaf, v_sig=spec_leaf, avg_mu=spec_leaf,
            avg_sig=spec_leaf, iteration=P(), elbo=spec_leaf,
            ext=(
                None if state.ext is None
                else tuple(spec_leaf for _ in state.ext)
            ),
        )
        lr_spec = P(axis, None) if lrs_op is not None else P()
        if lrs_op is None:
            lrs_op = jnp.zeros((1, 1), jnp.float32)  # inert placeholder

        def _local_lrs(lr_block):
            return lr_block if self.lrs is not None else None

        if log_every:

            def shard_fn_traced(st: FusedChainsState, lr_block):
                dev_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
                return local._run(
                    st, dev_key, steps, None, log_every,
                    lrs=_local_lrs(lr_block),
                )

            # trace: (G, c_loc) per device -> (G, n_chains) global (the
            # chain axis concatenates in device order)
            # check_vma=False: pallas_call outputs carry no vma annotation
            return jax.shard_map(
                shard_fn_traced, mesh=mesh, in_specs=(specs, lr_spec),
                out_specs=(specs, P(None, axis)), check_vma=False,
            )(state, lrs_op)

        def shard_fn(st: FusedChainsState, lr_block) -> FusedChainsState:
            dev_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            new, _ = local._run(
                st, dev_key, steps, None, 0, lrs=_local_lrs(lr_block)
            )
            return new

        return jax.shard_map(
            shard_fn, mesh=mesh, in_specs=(specs, lr_spec),
            out_specs=specs, check_vma=False,
        )(state, lrs_op)

    def q(self, state: FusedChainsState, averaged: bool = True):
        """Stacked MeanFieldGaussian with (n_chains, d) leaves — directly
        consumable by parallel.chains helpers (scoring, best_chain)."""
        from ...families.location_scale import MeanFieldGaussian

        C, d = self.n_chains, self.dim
        mu = state.avg_mu if averaged else state.mu
        sig = state.avg_sig if averaged else state.sig
        return MeanFieldGaussian(mu[:C, :d], sig[:C, :d])


def first_chain_divergence(trace, log_every: int):
    """First non-finite entry of a per-chain ELBO trace, as
    ``(chain, iteration)`` — or None if every entry is finite.

    ``trace``: the ``(G, n_chains)`` array from ``run_chunk_traced`` /
    ``run_sharded(log_every=...)``; ``iteration`` is chunk-relative (row g
    records the ELBO after ``(g + 1) * log_every`` steps).  The general
    driver's analogue is the exact-step divergence raise
    (optimize.py; reference common.jl:83-89); here exactness would cost a
    per-step host channel, so granularity is log_every — enough to spot
    the BENCH_NOTES scoregrad-outlier scenario (one chain stuck at -1.2e5)
    without a full run.
    """
    import numpy as np

    tr = np.asarray(trace)
    bad = ~np.isfinite(tr)
    if not bad.any():
        return None
    g, c = np.argwhere(bad)[0]      # earliest grid row, lowest chain
    return int(c), int((g + 1) * log_every)
