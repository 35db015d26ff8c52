"""Whole-loop fused ADVI engines (Pallas TPU).

Small-model ADVI steps are op-count-bound, not FLOP-bound: the XLA path
compiles to ~12 fused kernels whose per-kernel dispatch (~1.3 us) is the
measured ceiling (BENCH_NOTES "Headline profile"); the arithmetic itself
is microseconds.  The TPU-native answer is to stop dispatching: this
module runs the ENTIRE optimization loop — on-chip RNG, reparameterized
draw, model gradient, STL entropy correction, Adam, ClipScale, and
polynomial parameter averaging — inside ONE Pallas kernel, with a
``fori_loop`` over steps and all state resident in VMEM.  One dispatch
per chunk of steps instead of ~12 per step.

The engine is generic along two axes (round-4 generalization of the
round-3 logreg special):

- **model**: any target whose log-density gradient can be expressed as a
  Pallas-inlinable ``FusedModelSpec`` — a factory emitting
  ``fn(z) -> (logpi, grad)`` in plain jnp ops over the lane-padded sample
  block, plus padded constant arrays (VMEM) and scalar hyperparameters
  (SMEM).  Shipped models: hierarchical logistic regression
  (``logreg_spec``) and diagonal-Gaussian targets (``gaussian_spec`` —
  which is exactly the unconstrained normal-lognormal BASELINE model).
- **family**: mean-field (diagonal scale) or full-rank (dense
  lower-triangular scale).  The full-rank STL whitening C^{-T}u is an
  in-kernel back-substitution — row-unrolled on one lane tile (d <= 128),
  blocked over 128-tiles with Newton diagonal-block inverses above it
  (d <= D_FULLRANK_MAX) — and the scale gradient tril(g_z^T u) is one MXU
  matmul.

Semantics match ``KLMinRepGradDescent(entropy=STL, n_samples=n,
optimizer=optax.adam(lr), operator=ClipScale())`` + ``PolynomialAveraging``
exactly, EXCEPT the RNG stream: base normals come from the on-chip PRNG
(Box-Muller, as the samplers in location_scale_kernels.py), not from the
JAX key hierarchy.  The stream is STEP-INDEXED — the kernel reseeds each
iteration with the global step index, so draws depend on (key, iteration)
only and chunked/checkpoint-resumed runs are bitwise-identical to
single-run (the library's per-step fold_in invariant, VERDICT r4 #3).
The update math is pinned against the general path by
injecting the general path's own base draws through the ``noise`` debug
input and asserting the resulting states match (tests/test_fused_advi.py);
the RNG path is validated statistically on hardware (BENCH_NOTES).

Logreg gradient derivation (model: models/logreg.py, bijector: Exp on
sigma; theta = [beta (db), t], sigma = e^t, db = X.shape[1],
s = prior_scale):

    log pi(z) = likeadj * sum_j [y_j l_j - softplus(l_j)]   (l = X beta)
              - |beta|^2 e^{-2t} / 2 - db*t - t^2/(2 s^2)
              - log s - (db+1)/2 * log 2 pi                  (+t - t cancel)
    d/dbeta   = likeadj * X^T (y - sigmoid(l)) - beta e^{-2t}
    d/dt      = |beta|^2 e^{-2t} - db - t/s^2

Gaussian (normal-lognormal unconstrained; models/normallognormal.py,
Exp bijector on y — the log-det-Jacobian +t cancels the LogNormal's -log y
term, leaving a diagonal Gaussian in z = [t, x]):

    log pi(z) = -sum_j (z_j - m_j)^2 v_j / 2 + const,  v = 1/stddev^2
    grad      = -(z - m) * v

STL: dL/dz_i = -(1/n) [grad log pi(z_i) + w_i],  w_i = whitened base draw
(u_i / sigma_q mean-field; C^{-T} u_i full-rank) — the entropy estimate
-mean log q_stop(z) contributes -grad_z log q_stop = w, so the bracket
vanishes at q = pi (sticking the landing);
dmu = sum_i dL/dz_i; dsig = sum_i dL/dz_i * u_i (mean-field);
dC = tril(sum_i dL/dz_i u_i^T) (full-rank).

No reference counterpart: the reference's hot loop is one Julia
iteration per step (src/optimize.jl:40-77); this is the TPU-first
redesign of the entire loop, not of one op.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .location_scale_kernels import _box_muller, key_to_seed

D_PAD = 128     # default lane-padded parameter dimension (one lane tile)
N_PAD = 16      # default sublane-padded sample count (minimum row padding)
N_SAMPLES_MAX_SC = 128  # single-chain engines: widest sample-row padding


def n_pad_for(n: int) -> int:
    """Sample-row padding: the next multiple of 8, floored at the
    historical N_PAD = 16 so the noise-injection layout of existing
    callers/tests is unchanged for n_samples <= 16 (round 5 lifted the
    cap — the reference family has no n_samples limit)."""
    return max(N_PAD, -(-n // 8) * 8)
D_PAD_MAX = 2048  # mean-field engines: widest supported lane padding
# full-rank engines: the dense (dp, dp) scale + its 3 optimizer/averager
# companions appear as separate in+out kernel refs (8 dp^2 f32 buffers);
# 512 keeps that under ~8 MB of the ~16 MB VMEM with headroom for the
# kernel's live (dp, dp) temporaries (tril masks, dsig matmul product).
D_FULLRANK_MAX = 512


def d_pad_for(d: int) -> int:
    """Lane padding for a d-dim model: the next multiple of 128.  The
    mean-field engines are fully parametric in this width (state rows are
    (1, d_pad), sample blocks (N_PAD, d_pad)); full-rank engines support
    d <= D_FULLRANK_MAX (row-unrolled back-substitution on one lane tile,
    blocked Newton substitution above it; cap is the 8 dense scale-shaped
    VMEM buffers)."""
    return max(D_PAD, -(-d // D_PAD) * D_PAD)


_L2PI = math.log(2.0 * math.pi)
_GOLD = -1640531527  # int32 golden-ratio mix (as the samplers)

MEANFIELD = "meanfield"
FULLRANK = "fullrank"

# Entropy-estimator names (string-equal to objectives.entropy constants;
# kept local so the kernel module stays import-light — pinned by test).
ENT_STL = "stl"
ENT_CF_ZERO = "closed_form_zero_grad"
ENT_STL_ZERO = "stl_zero_grad"

# Optimizers, post-update operators, and gradient estimators the kernel
# can run (the engine classes pin the valid combinations).
ALGO_ADAM = "adam"
ALGO_DESCENT = "descent"
ALGO_DOWG = "dowg"
ALGO_DOG = "dog"        # distance-over-gradients (rides the DoWG slots)
ALGO_COCOB = "cocob"    # per-coordinate coin betting (needs ext slots)
# step-size-driven rules whose eta the proximal operator can extract
# (optim/rules.py stepsize_from_opt_state; COCOB has no scalar step size)
ETA_ALGOS = (ALGO_DESCENT, ALGO_DOWG, ALGO_DOG)
OP_CLIP = "clip"            # ClipScale on the scale diagonal
OP_PROX = "prox"            # closed-form entropy proximal step (needs eta)
OP_NONE = "none"            # IdentityOperator
GE_REPGRAD = "repgrad"      # reparameterization gradient (entropy strategies)
GE_SCOREGRAD = "scoregrad"  # VarGrad score-function gradient (BBVI)


class FusedModelSpec(NamedTuple):
    """A target model the fused engines can inline.

    ``step_factory(static_cfg, masks, const_refs, scalars)`` is traced
    INSIDE the Pallas kernel once (before the step loop, so it can load
    constants and hoist transposes) and must return
    ``fn(z, it) -> (logpi, grad)`` where z is the (N_PAD, D_PAD) masked
    sample block (padding entries are exactly 0), ``it`` is the global
    iteration index (int32 — minibatch models use it for their window
    schedule), logpi is (N_PAD, 1) and grad is (N_PAD, D_PAD).
    ``const_refs`` are the VMEM refs of ``consts`` — load whole with
    ``ref[:]`` or per step with ``ref[pl.ds(start, rows)]`` (data
    streaming).  Only jnp ops that lower under Pallas TPU are allowed
    (elementwise, reductions, jnp.dot).  ``masks`` is a ``Masks``
    namespace; padded lanes of grad need not be masked (the engine
    masks).

    ``reshuffle(key, consts) -> consts`` (optional): data-order
    refresh; the fused driver calls it between chunks for minibatch
    models (consts are traced inputs, so no recompilation).
    """

    dim: int                            # real latent dimension d
    consts: Tuple[jax.Array, ...]       # padded device arrays (VMEM)
    scalars: jax.Array                  # (k,) f32 scalar params (SMEM)
    step_factory: Callable              # static (hashable) factory
    static_cfg: tuple                   # hashable per-model static config
    reshuffle: Optional[Callable] = None  # (key, consts) -> consts
    # Per-const memory space: "vmem" (default, whole array resident) or
    # "any" (stays in HBM; the factory must DMA slabs into scratch).
    # None means all-VMEM.
    const_spaces: Optional[Tuple[str, ...]] = None
    # Static scratch descriptors the factory needs, materialized by the
    # runner: ("vmem", shape, dtype_str) -> pltpu.VMEM scratch,
    # ("dma",) -> a DMA semaphore.  When non-empty, the factory is called
    # with a fifth argument: the tuple of scratch refs.
    scratch: Tuple = ()

    @classmethod
    def from_log_density(cls, fn: Callable, dim: int, data: Any = None):
        """AD-derived spec: run ANY jnp-only log-density fused, no
        hand-derived gradient needed (VERDICT r4 #1).

        ``fn(theta, data) -> scalar`` maps one (dim,) unconstrained vector
        to its log-density using only ops that lower under Pallas TPU
        (elementwise math, reductions, jnp.dot/matmuls, static slicing —
        no gathers, no data-dependent control flow).  ``data`` is an
        optional pytree of arrays closed over as kernel constants.  The
        gradient is obtained by tracing ``jax.grad`` of ``fn`` INSIDE the
        kernel — trace-time jnp composition, identical math to the general
        path's AD (reference analogue: AD serves any model,
        src/algorithms/repgradelbo.jl:142-149).
        """
        from ...core.problem import fn_target

        return ad_spec(fn_target(fn, dim, data=data))


class Masks(NamedTuple):
    lane: jax.Array     # (1, D_PAD) int32 lane iota
    maskd: jax.Array    # (1, D_PAD) f32, 1.0 on the d real lanes
    maskn: jax.Array    # (N_PAD, D_PAD) f32, 1.0 on the n real rows
    d: int              # real latent dimension
    n_samples: int
    # loop bounds for factories that pipeline cross-step state (e.g. the
    # double-buffered DMA prefetch): it0 is the chunk's starting global
    # iteration (traced int32), steps the kernel-loop length (static).
    it0: Any = None
    steps: Any = None


class FusedADVIState(NamedTuple):
    """Kernel-resident optimizer state, lane-padded.

    ``sig`` holds the family's scale parameter: the (1, D_PAD) diagonal
    for mean-field, or the (D_PAD, D_PAD) dense lower-triangular factor
    for full-rank (padded diagonal entries 1.0 so whitening stays
    well-posed; Adam moments there are exactly zero because every
    gradient is masked to the real dimensions — padding is inert by
    construction).
    """

    mu: jax.Array        # (1, D_PAD) location
    sig: jax.Array       # scale parameter (see above)
    m_mu: jax.Array      # Adam first moments (DoWG/DoG/COCOB: frozen x0)
    v_mu: jax.Array      # Adam second moments (DoWG/DoG: [v, r] lanes;
    #                      COCOB: per-coordinate L)
    m_sig: jax.Array
    v_sig: jax.Array
    avg_mu: jax.Array    # polynomial-averaged parameters
    avg_sig: jax.Array
    iteration: jax.Array  # () int32
    elbo: jax.Array      # () f32, last step's estimate
    # COCOB's remaining per-coordinate accumulators (G, reward, theta) x
    # (mu, sig) — None for every other rule, so the pytree structure (and
    # therefore every existing consumer) is unchanged outside COCOB runs.
    ext: Optional[Tuple[jax.Array, ...]] = None


def _cocob_update(ca, x, x1, L, Gs, Rw, th, g):
    """One COCOB-Backprop coordinate-wise update (optim/rules.py cocob;
    reference rules.jl:78-96) — shared by the single-chain and chains
    kernels so the coin-betting math can never drift between them.
    x1 rides the m_* slots, L the v_* slots, (Gs, Rw, th) the ext slots;
    padded entries see g = 0 forever, so den stays 0 and they hold
    x = x1 (the padded init values) — inert like the general path's
    inert upper triangle."""
    L2 = jnp.maximum(L, jnp.abs(g))
    G2 = Gs + jnp.abs(g)
    R2 = jnp.maximum(Rw + (x - x1) * (-g), 0.0)
    t2 = th - g
    den = L2 * jnp.maximum(G2 + L2, ca * L2)
    bet = jnp.where(den > 0, t2 / jnp.where(den > 0, den, 1.0), 0.0)
    return x1 + bet * (L2 + R2), L2, G2, R2, t2


def _adam_candidate(lr, b1, b2, eps, bc1, bc2, m, v, g):
    """One Adam update candidate (optax.scale_by_adam semantics) — shared
    by the single-chain kernel, the chains kernel's single-rule branch,
    and the mixed-rule blend, so the moment/bias-correction math can
    never drift between them (the per-chain-pinning contract)."""
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * g * g
    upd = -lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
    return m2, v2, upd


def _dowg_step(v_prev, r, gsq):
    """DoWG accumulator + step size (optim/rules.py dowg); the
    max(v, tiny) floor guards the exactly-zero-first-gradient edge
    (ADVICE r4).  Shared across kernels and the mixed-rule blend."""
    v = v_prev + r * r * gsq
    return v, r * r / jnp.sqrt(jnp.maximum(v, 1e-30))


def _dog_step(v_prev, r, gsq):
    """DoG accumulator + step size (optim/rules.py dog) — see _dowg_step."""
    v = v_prev + gsq
    return v, r / jnp.sqrt(jnp.maximum(v, 1e-30))


def _backsub_ct(C, u, d, lane):
    """v = C^{-T} u by back-substitution, unrolled over the d real rows.

    C: (D_PAD, D_PAD) lower-triangular value (padded diag 1.0), u:
    (N_PAD, D_PAD).  Solving C^T v = u row-by-row from j = d-1 down:
    v_j = (u_j - sum_{k>j} C[k, j] v_k) / C[j, j]; after computing v_j,
    its contribution C[j, :j] v_j is subtracted from the running
    residual.  Row extraction and scatter use onehot lane masks (static
    unrolled loop — d is a Python int), each iteration a handful of
    (N_PAD, D_PAD) VPU ops; padded lanes stay exactly zero.
    """
    r = u
    v = jnp.zeros_like(u)
    for j in range(d - 1, -1, -1):
        onehot = (lane == j).astype(jnp.float32)          # (1, D_PAD)
        crow = C[j, :].reshape(1, C.shape[1])             # static row slice
        cjj = jnp.sum(crow * onehot)
        vj = jnp.sum(r * onehot, axis=1, keepdims=True) / cjj  # (N_PAD, 1)
        v = v + vj * onehot
        mask_lt = (lane < j).astype(jnp.float32)
        r = r - vj * (crow * mask_lt)
    return v


def _backsub_ct_blocked(C, u, block=D_PAD):
    """v = C^{-T} u, blocked over 128-column tiles (VERDICT r4 #2).

    Row form: v_i = C^{-T} u_i per sample row is V = U @ C^{-1}, the
    trisolve kernel's right-division mode "C" (ops/pallas/trisolve_kernels
    .py) restated on VALUES inside the fused kernel: walk diagonal blocks
    BACKWARD; per block b, invert the (B, B) diagonal block D_b by the
    exactly-terminating Newton iteration (the diagonal-seed residual is
    strictly triangular, hence nilpotent — ceil(log2 B) doublings are
    exact, all MXU matmuls), form W_b = resid_b @ D_b^{-1}, and subtract
    the FULL-WIDTH right-looking update W_b @ C[bB:(b+1)B, :]: columns
    right of the triangle are zero in C (no-op), the block-b region gets
    corrupted but is never read again (blocks are visited backward), and
    blocks left of b receive exactly the off-diagonal contribution.

    C: (dp, dp) lower-triangular value, padded diag 1.0 (so padded blocks
    invert to identity and their zero residuals stay zero); u: (rows, dp)
    with padded lanes zero.  Static Python loop — dp/128 blocks, each
    2*ceil(log2 128)+2 matmuls: O(dp/128) sequential depth instead of the
    d-row unroll's O(d), and a jaxpr that stays small at d = 512 (the
    unroll was also a compile-time liability).  Reference family has no
    dimension cap (src/families/location_scale.jl:71-87); this lifts the
    fused engine's d <= 128 to D_FULLRANK_MAX.
    """
    dp = C.shape[0]
    nb = dp // block
    row = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    eye = (row == col).astype(jnp.float32)
    nnewton = max(1, (block - 1).bit_length())   # ceil(log2(block))
    ws = u
    out_blocks = [None] * nb
    for b in range(nb - 1, -1, -1):
        D = C[b * block : (b + 1) * block, b * block : (b + 1) * block]
        dvec = jnp.sum(D * eye, axis=1, keepdims=True)   # (B, 1) diagonal
        X = eye / dvec                                   # Newton seed
        for _ in range(nnewton):
            DX = jnp.dot(D, X, preferred_element_type=jnp.float32)
            X = jnp.dot(X, 2.0 * eye - DX, preferred_element_type=jnp.float32)
        resid_b = ws[:, b * block : (b + 1) * block]
        w = jnp.dot(resid_b, X, preferred_element_type=jnp.float32)
        out_blocks[b] = w
        if b:  # the last (leftmost) block needs no further updates
            slab = C[b * block : (b + 1) * block, :]
            ws = ws - jnp.dot(w, slab, preferred_element_type=jnp.float32)
    return jnp.concatenate(out_blocks, axis=1)


def _kernel(
    # static
    family, step_factory, static_cfg, n_consts, n_scratch, n_samples,
    n_pad, d, steps, use_noise, use_ext, traced, algo, entropy, grad_est,
    operator,
    # refs
    *refs,
):
    # ref layout: inputs [seed, it0, hyp, mscal, *consts, *state(8),
    # *ext(6 if use_ext), noise?] then the 9 (+6 if use_ext, +1 if
    # tracing) output refs.  use_ext carries COCOB's extra per-coordinate
    # accumulators (G, reward, theta) x (mu, sig).
    #
    # Traced mode runs a SEQUENTIAL GRID of trace rows: each grid step
    # executes ``steps`` (= log_every) iterations and writes its row of
    # the trace through a STATIC BlockSpec index map — no dynamic stores
    # (a per-step dynamic store made Mosaic compile for ~19 minutes,
    # BENCH_NOTES "Round 4").  State persists across grid steps in the
    # output refs (constant index maps are revisited, not flushed); grid
    # step 0 seeds them from the input refs.
    seed_ref, it0_ref, hyp_ref, mscal_ref = refs[:4]
    const_refs = refs[4 : 4 + n_consts]
    state_in = refs[4 + n_consts : 12 + n_consts]
    k = 12 + n_consts
    ext_in = refs[k : k + 6] if use_ext else ()
    k += 6 if use_ext else 0
    noise_ref = refs[k] if use_noise else None
    # pallas_call appends scratch refs AFTER the outputs
    scratch_refs = refs[len(refs) - n_scratch :] if n_scratch else ()
    n_out = 9 + (6 if use_ext else 0) + (1 if traced else 0)
    outs_all = refs[len(refs) - n_scratch - n_out : len(refs) - n_scratch]
    (mu_o, sig_o, mmu_o, vmu_o, msig_o, vsig_o, amu_o, asig_o,
     elbo_o) = outs_all[:9]
    ext_o = outs_all[9:15] if use_ext else ()
    trace_o = outs_all[-1] if traced else None

    lr = hyp_ref[0]
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
            for src, dst in zip(state_in + tuple(ext_in), outs + tuple(ext_o)):
                dst[:] = src[:]

        state_refs = outs
        ext_refs = ext_o
        block_off = gidx * steps
    else:
        state_refs = state_in
        ext_refs = ext_in
        block_off = 0

    it0 = it0_ref[0] + block_off

    # masks (f32): valid q dims j < d; sample rows < n_samples.
    # Lane width is read off the state refs (static at trace time), so the
    # kernel is fully parametric in d_pad (mean-field d > 128 support).
    dp = state_in[0].shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, dp), 1)
    maskd = (lane < d).astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n_pad, dp), 0)
    maskn = (rowi < n_samples).astype(jnp.float32)
    masks = Masks(lane=lane, maskd=maskd, maskn=maskn, d=d,
                  n_samples=n_samples, it0=it0, steps=steps)

    if n_scratch:
        model_fn = step_factory(
            static_cfg, masks, const_refs, mscal_ref, scratch_refs
        )
    else:
        model_fn = step_factory(static_cfg, masks, const_refs, mscal_ref)
    # factories with cross-step pipeline state return (fn, epilogue);
    # the epilogue runs after the loop (e.g. waiting the final prefetch)
    model_epilogue = None
    if isinstance(model_fn, tuple):
        model_fn, model_epilogue = model_fn

    if family == FULLRANK:
        # lane/sublane iotas for the (D_PAD, D_PAD) scale block
        ri = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
        tril_d = ((ri >= ci) & (ri < d) & (ci < d)).astype(jnp.float32)
        eye = (ri == ci).astype(jnp.float32)
        diag_d = eye * (ri < d).astype(jnp.float32)

    inv_n = 1.0 / n_samples
    ln_b1 = jnp.log(b1)
    ln_b2 = jnp.log(b2)
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n_samples
    ).astype(jnp.float32)

    def body(i, carry):
        mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig = carry[:8]
        ext = carry[8:-1]     # COCOB accumulators (empty otherwise)
        it_f = (it0 + i).astype(jnp.float32)

        if use_noise:
            # chunk-local row: block offset + in-block index (traced grid)
            u = noise_ref[pl.ds((block_off + i) * n_pad, n_pad), :]
        else:
            # STEP-INDEXED stream (VERDICT r4 #3): reseed per step with the
            # GLOBAL iteration folded into seed word 0 (v5e: max 2 seed
            # words), so the draw at iteration t is a function of (key, t)
            # only — run_chunk(a+b) == run_chunk(a); run_chunk(b) bitwise,
            # restoring the library's per-step fold_in resume invariant
            # (optimize.py).  Skipped entirely on the noise-injection debug
            # path so interpret mode never touches TPU RNG primitives.
            pltpu.prng_seed(seed_ref[0] + (it0 + i) * _GOLD, seed_ref[1])
            u = _box_muller((n_pad, dp))
        u = u * maskn * maskd

        if family == MEANFIELD:
            z = mu + sig * u                  # (N_PAD, D_PAD)
            diag = sig
            logdet = jnp.sum(jnp.log(sig) * maskd)
        else:
            # z = mu + u C^T: one MXU matmul over the sample block
            z = mu + jnp.dot(u, sig.T, preferred_element_type=jnp.float32)
            diag = jnp.sum(sig * eye, axis=0, keepdims=True)  # (1, D_PAD)
            # padded diag entries are 1.0 -> log contributes 0
            logdet = jnp.sum(jnp.log(diag) * maskd)

        logpi, grad_logpi = model_fn(z, it0 + i)

        if grad_est == GE_SCOREGRAD:
            # VarGrad (objectives/scoregradelbo.py; reference
            # scoregradelbo.jl:87-94): L = var_n(f)/2, f = log q - log pi,
            # z and log pi detached, only log q differentiated.  With
            # z = mu + sigma u held fixed: dlogq/dmu = u/sigma,
            # dlogq/dsigma = (u^2 - 1)/sigma, so
            # dL/dtheta = (1/n) sum_i (f_i - fbar) dlogq_i/dtheta.
            # Mean-field only (the engine enforces it).
            u2row = jnp.sum(0.5 * u * u, axis=1, keepdims=True)
            logq = -(u2row + logdet + 0.5 * d * _L2PI)       # (N_PAD, 1)
            f = (logq - logpi) * row_valid
            fbar = inv_n * jnp.sum(f)
            ci = (f - fbar) * row_valid * inv_n              # (N_PAD, 1)
            dmu = maskd * jnp.sum(ci * (u / sig), axis=0, keepdims=True)
            dsig = maskd * jnp.sum(
                ci * ((u * u - 1.0) / sig), axis=0, keepdims=True
            )
            # info channel: the plain ELBO estimate, not the VarGrad value
            elbo = inv_n * jnp.sum((logpi - logq) * row_valid)
        elif entropy == ENT_CF_ZERO:
            # entropy(q_stop): detached, no whitening term in dL/dz (the
            # proximal operator supplies the entropy force).  Full-rank
            # skips the back-substitution entirely.
            g_z = -inv_n * grad_logpi * maskn * maskd
        else:
            # STL: dL/dz = -(1/n)(grad_logpi + whiten); the bracket is the
            # score mismatch and vanishes at q = pi (sticking the landing).
            # Full-rank: row-unrolled substitution for one lane tile (VPU,
            # fastest at small d), blocked Newton substitution above it.
            if family == MEANFIELD:
                whiten = u / sig
            elif dp <= D_PAD:
                whiten = _backsub_ct(sig, u, d, lane)
            else:
                whiten = _backsub_ct_blocked(sig, u)
            g_z = -inv_n * (grad_logpi + whiten) * maskn * maskd

        if grad_est == GE_REPGRAD:
            dmu = jnp.sum(g_z, axis=0, keepdims=True)         # (1, D_PAD)
            if family == MEANFIELD:
                dsig = jnp.sum(g_z * u, axis=0, keepdims=True)
            else:
                # dC[a, b] = sum_i g_z[i, a] u[i, b], lower-triangle only
                dsig = tril_d * jnp.dot(
                    g_z.T, u, preferred_element_type=jnp.float32
                )
            if entropy == ENT_STL_ZERO:
                # + dH(q)/dscale = 1/sigma on the (real) diagonal: the
                # combined zero-gradient STL estimator (entropy.jl:80-90)
                # is stl - H(q) + H(q_stop), and L = -(energy + entropy).
                if family == MEANFIELD:
                    dsig = dsig + maskd / sig
                else:
                    dsig = dsig + diag_d * (1.0 / diag)

            # ELBO estimate (info channel): energy + entropy value
            energy = inv_n * jnp.sum(logpi * row_valid)
            if entropy == ENT_CF_ZERO:
                ent = logdet + 0.5 * d * (1.0 + _L2PI)  # closed form H(q)
            else:
                # STL estimate value (== stl_zero's: -H(q)+H(q_stop) = 0)
                ent = (
                    logdet + inv_n * jnp.sum(0.5 * u * u) + 0.5 * d * _L2PI
                )
            elbo = energy + ent

        c = it_f + 1.0
        if algo == ALGO_ADAM:
            # Adam (optax.scale_by_adam semantics, count_inc = it + 1)
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
            # per-coordinate coin betting — see _cocob_update for the
            # slot layout and padding-inertness argument
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
            # Descent / DoWG / DoG + closed-form proximal entropy step
            # (optim/rules.py dowg+dog, optim/operators.py
            # ProximalLocationScaleEntropy; reference rules.jl:17-64,
            # proximal_location_scale_entropy.jl:20-61).
            if algo in (ALGO_DOWG, ALGO_DOG):
                # parameter-free state rides the Adam slots: m_* = x0
                # (fixed), v_mu lane 0 = v, lane 1 = r.  Padded entries of
                # (mu - x0) / (sig - x0) are exactly 0 by construction.
                l0 = (lane == 0).astype(jnp.float32)
                l1 = (lane == 1).astype(jnp.float32)
                v_prev = jnp.sum(v_mu * l0)
                r_prev = jnp.sum(v_mu * l1)
                dist = jnp.sqrt(
                    jnp.sum((mu - m_mu) * (mu - m_mu))
                    + jnp.sum((sig - m_sig) * (sig - m_sig))
                )
                r = jnp.maximum(dist, r_prev)
                gsq = jnp.sum(dmu * dmu) + jnp.sum(dsig * dsig)
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
            if family == MEANFIELD:
                # ClipScale; padded lanes: max(1.0, eps) = 1.0, exact
                sig = jnp.maximum(sig, clip_eps)
            else:
                # clamps the diagonal only (padded diag untouched)
                sig = sig + diag_d * (jnp.maximum(sig, clip_eps) - sig)
        elif operator == OP_PROX:
            # prox: sigma' = sigma/2 + sqrt(sigma^2 + 4 gamma)/2 on the
            # (real) scale diagonal; gamma = the step size just used ==
            # stepsize_from_opt_state of the post-update state (only valid
            # with descent/dowg/dog, where eta is defined - engine-enforced).
            if family == MEANFIELD:
                proxed = 0.5 * sig + 0.5 * jnp.sqrt(sig * sig + 4.0 * eta)
                sig = sig + maskd * (proxed - sig)
            else:
                dpost = jnp.sum(sig * eye, axis=0, keepdims=True)
                proxed = 0.5 * dpost + 0.5 * jnp.sqrt(
                    dpost * dpost + 4.0 * eta
                )
                sig = sig + diag_d * (proxed - dpost)

        # PolynomialAveraging: w = (eta + 1) / (t + eta), t = it + 1
        w = (avg_eta + 1.0) / (c + avg_eta)
        a_mu = (1.0 - w) * a_mu + w * mu
        a_sig = (1.0 - w) * a_sig + w * sig

        return (mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig) + ext + (
            elbo,
        )

    init = (
        tuple(r[:] for r in state_refs)
        + tuple(r[:] for r in ext_refs)
        + (jnp.float32(0.0),)
    )
    res = jax.lax.fori_loop(0, steps, body, init)
    mu, sig, m_mu, v_mu, m_sig, v_sig, a_mu, a_sig = res[:8]
    elbo = res[-1]
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
    elbo_o[:] = jnp.full((1, dp), elbo)
    if model_epilogue is not None:
        model_epilogue()
    if traced:
        # this grid step's row of the thinned ELBO trace.  The trace buffer
        # is a FULL-array block (constant index map, resident in VMEM for
        # the whole kernel): Mosaic rejects a (1, D_PAD) advancing block
        # whenever G is not 1 (the last-two-dims divisibility rule), and a
        # full block is exempt.  One dynamic row store per GRID step — not
        # per loop iteration, so the 19-minute per-step-dynamic-store
        # compile hazard (BENCH_NOTES round 4) does not apply.
        trace_o[pl.ds(pl.program_id(0), 1)] = jnp.full((1, dp), elbo)


@functools.partial(
    jax.jit,
    static_argnames=(
        "family", "step_factory", "static_cfg", "n_samples", "n_pad",
        "d", "steps",
        "use_noise", "use_ext", "interpret", "log_every", "algo", "entropy",
        "d_pad", "grad_est", "operator", "const_spaces", "scratch",
    ),
)
def _run_chunk(
    seed, it0, hyp, mscal, consts, noise, state_arrays,
    family, step_factory, static_cfg, n_samples, d, steps, use_noise,
    interpret, n_pad=N_PAD, log_every=0, algo=ALGO_ADAM, entropy=ENT_STL,
    d_pad=D_PAD, grad_est=GE_REPGRAD, operator=OP_CLIP, ext=(),
    use_ext=False, const_spaces=None, scratch=(),
):
    scale_shape = (
        (1, d_pad) if family == MEANFIELD else (d_pad, d_pad)
    )
    shapes = [(1, d_pad), scale_shape] + [(1, d_pad), (1, d_pad)] + [
        scale_shape, scale_shape,
    ] + [(1, d_pad), scale_shape]
    out_shape = tuple(
        jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes
    ) + (jax.ShapeDtypeStruct((1, d_pad), jnp.float32),)
    if use_ext:
        # COCOB ext accumulators: (G, reward, theta) for mu then sig
        ext_shapes = [(1, d_pad)] * 3 + [scale_shape] * 3
        out_shape = out_shape + tuple(
            jax.ShapeDtypeStruct(s, jnp.float32) for s in ext_shapes
        )
    operands = (seed, it0, hyp, mscal) + tuple(consts) + tuple(state_arrays)
    if use_ext:
        operands = operands + tuple(ext)
    if use_noise:
        operands = operands + (noise,)
    traced = log_every > 0
    if traced and steps % log_every:
        raise ValueError(
            f"traced chunks need steps % log_every == 0, got "
            f"{steps}/{log_every}"
        )
    scratch_shapes = _materialize_scratch(scratch)
    kernel = functools.partial(
        _kernel, family, step_factory, static_cfg, len(consts),
        len(scratch_shapes), n_samples, n_pad, d,
        log_every if traced else steps, use_noise, use_ext, traced, algo,
        entropy, grad_est, operator,
    )
    # d=512 full-rank carries ~18 MB of state+temporaries — past XLA's
    # default 16 MB scoped-vmem budget but well inside the chip's VMEM
    # (ran at 24 MB in chip session 2); raise the kernel's limit only for
    # the wide case so everything else keeps the default accounting.
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        if family == FULLRANK and d_pad >= 512 else None
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
        )
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=tuple(vec for _ in out_shape),
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            interpret=interpret,
        )(*operands)

    # Traced: sequential grid of G = steps/log_every rows.  Every operand
    # and state output is a full-array block with a CONSTANT index map
    # (revisited across grid steps, so state persists on chip); only the
    # trace output advances one (1, D_PAD) row per grid step.
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
    trace_struct = jax.ShapeDtypeStruct((G, d_pad), jnp.float32)
    out_specs = tuple(whole(s) for s in out_shape) + (
        whole(trace_struct),
    )
    out_shape = out_shape + (trace_struct,)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)


def _materialize_scratch(scratch):
    """Static scratch descriptors -> pallas scratch_shapes objects.
    Descriptors stay plain hashable tuples so they can ride the jit
    static args: ("vmem", shape, dtype_str) | ("dma",)."""
    out = []
    for s in scratch:
        if s[0] == "vmem":
            out.append(pltpu.VMEM(tuple(s[1]), jnp.dtype(s[2])))
        elif s[0] == "dma":
            out.append(
                pltpu.SemaphoreType.DMA(tuple(s[1])) if len(s) > 1
                else pltpu.SemaphoreType.DMA
            )
        else:
            raise ValueError(f"unknown scratch descriptor {s!r}")
    return out


def _const_specs(consts, const_spaces):
    """Per-const input specs: whole-array VMEM (default) or ANY (HBM
    resident — the step factory DMAs slabs into scratch)."""
    if const_spaces is None:
        return [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(consts)
    if len(const_spaces) != len(consts):
        raise ValueError(
            f"const_spaces has {len(const_spaces)} entries for "
            f"{len(consts)} consts"
        )
    return [
        pl.BlockSpec(
            memory_space=pl.ANY if sp == "any" else pltpu.VMEM
        )
        for sp in const_spaces
    ]


def _pad_lane(x, width=D_PAD, fill=0.0):
    v = jnp.full((1, width), fill, jnp.float32)
    return v.at[0, : x.shape[0]].set(x.astype(jnp.float32))


def _pad_tril(C, width=D_PAD):
    """Pad a (d, d) lower-triangular factor to (width, width); the padded
    diagonal is 1.0 (inert: gradients there are masked to zero)."""
    d = C.shape[0]
    out = jnp.eye(width, dtype=jnp.float32)
    return out.at[:d, :d].set(jnp.tril(C.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# Model specs
# ---------------------------------------------------------------------------


def _logreg_step_factory(static_cfg, masks, const_refs, mscal_ref):
    n_data, db = static_cfg
    X = const_refs[0][:]          # (data_pad, D_PAD)
    y = const_refs[1][:]          # (1, data_pad)
    likeadj = mscal_ref[0]
    s_prior = mscal_ref[1]
    data_pad = X.shape[0]
    Xt = X.T                      # hoisted out of the step loop
    lane = masks.lane
    maskb = (lane < db).astype(jnp.float32)
    onehot_t = (lane == db).astype(jnp.float32)
    dlane = jax.lax.broadcasted_iota(jnp.int32, (1, data_pad), 1)
    maskdata = (dlane < n_data).astype(jnp.float32)

    def fn(z):
        beta = z * maskb
        tcol = jnp.sum(z * onehot_t, axis=1, keepdims=True)   # (N_PAD, 1)
        inv_sig2 = jnp.exp(-2.0 * tcol)
        beta_sq = jnp.sum(beta * beta, axis=1, keepdims=True)

        logits = jnp.dot(
            beta, Xt, preferred_element_type=jnp.float32
        )                                     # (N_PAD, data_pad)
        p = jax.nn.sigmoid(logits)
        # stable softplus
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        loglike = jnp.sum(
            (y * logits - sp) * maskdata, axis=1, keepdims=True
        )

        logpi = (
            likeadj * loglike
            - 0.5 * beta_sq * inv_sig2
            - db * tcol
            - tcol * tcol / (2.0 * s_prior * s_prior)
            - jnp.log(s_prior)
            - 0.5 * (db + 1) * _L2PI
        )                                     # (N_PAD, 1)

        gl = likeadj * ((y - p) * maskdata)   # (N_PAD, data_pad)
        gbeta = jnp.dot(gl, X, preferred_element_type=jnp.float32)
        gt = beta_sq * inv_sig2 - db - tcol / (s_prior * s_prior)
        grad = maskb * (gbeta - beta * inv_sig2) + onehot_t * gt
        return logpi, grad

    return lambda z, it: fn(z)


def logreg_spec(
    X: jax.Array,
    y: jax.Array,
    prior_scale: float = 3.0,
    likeadj: float = 1.0,
) -> FusedModelSpec:
    """Hierarchical logistic regression (models/logreg.py, Exp bijector on
    sigma) as a fused-engine model; gradient derivation in the module
    docstring."""
    n_data, db = X.shape
    if db + 1 > D_PAD_MAX:
        raise ValueError(
            f"fused engine supports dim <= {D_PAD_MAX}, got {db + 1}"
        )
    dp = d_pad_for(db + 1)
    data_pad = -(-n_data // 256) * 256
    X_pad = jnp.zeros((data_pad, dp), jnp.float32).at[:n_data, :db].set(
        X.astype(jnp.float32)
    )
    y_pad = jnp.zeros((1, data_pad), jnp.float32).at[0, :n_data].set(
        y.astype(jnp.float32)
    )
    return FusedModelSpec(
        dim=db + 1,
        consts=(X_pad, y_pad),
        scalars=jnp.array([likeadj, prior_scale], jnp.float32),
        step_factory=_logreg_step_factory,
        static_cfg=(n_data, db),
    )


def _logreg_mb_math(static_cfg, masks, mscal_ref, yX_ref, start_slab,
                    wait_slab):
    """Shared minibatch-logreg step math.  The slab arrives through a
    two-phase loader so the HBM variant can OVERLAP its DMA with the
    slab-independent compute: ``start_slab(k)`` kicks off (or simply
    slices) batch k's (B, D_PAD) feature load and returns a handle;
    ``wait_slab(handle)`` blocks (no-op for the resident spec) and
    returns the slab.  Everything not touching X — the prior terms, the
    z reductions, and the precomputed-yX likelihood dot — runs between
    the two, hiding most of the per-step DMA round trip."""
    db, B, nb = static_cfg
    likeadj = mscal_ref[0]        # n_data / B (the subsample contract)
    s_prior = mscal_ref[1]
    lane = masks.lane
    maskb = (lane < db).astype(jnp.float32)
    onehot_t = (lane == db).astype(jnp.float32)
    dn = (((1,), (1,)), ((), ()))  # contract on lanes, no batch dims

    def fn(z, it):
        k = jax.lax.rem(it, nb)
        handle = start_slab(k, it)            # slab load in flight
        yXb = yX_ref[pl.ds(k, 1), :]          # sum_j y_j X_j of this batch

        beta = z * maskb
        tcol = jnp.sum(z * onehot_t, axis=1, keepdims=True)
        inv_sig2 = jnp.exp(-2.0 * tcol)
        beta_sq = jnp.sum(beta * beta, axis=1, keepdims=True)
        # sum_j y_j logits_ij = beta . (sum_j y_j X_j): slab-independent
        ylogit = jax.lax.dot_general(
            beta, yXb, dn, preferred_element_type=jnp.float32
        )                                     # (N_PAD, 1)

        Xb = wait_slab(handle)                # first slab use
        # logits without transposing the slab: contract lane dims
        logits = jax.lax.dot_general(
            beta, Xb, dn, preferred_element_type=jnp.float32
        )                                     # (N_PAD, B)
        p = jax.nn.sigmoid(logits)
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        loglike = ylogit - jnp.sum(sp, axis=1, keepdims=True)

        logpi = (
            likeadj * loglike
            - 0.5 * beta_sq * inv_sig2
            - db * tcol
            - tcol * tcol / (2.0 * s_prior * s_prior)
            - jnp.log(s_prior)
            - 0.5 * (db + 1) * _L2PI
        )

        gbeta = likeadj * (
            yXb - jnp.dot(p, Xb, preferred_element_type=jnp.float32)
        )
        gt = beta_sq * inv_sig2 - db - tcol / (s_prior * s_prior)
        grad = maskb * (gbeta - beta * inv_sig2) + onehot_t * gt
        return logpi, grad

    return fn


def _logreg_mb_step_factory(static_cfg, masks, const_refs, mscal_ref):
    db, B, nb = static_cfg
    X_ref, yX_ref = const_refs    # (n_used, D_PAD), (nb_pad, D_PAD)
    return _logreg_mb_math(
        static_cfg, masks, mscal_ref, yX_ref,
        lambda k, it: X_ref[pl.ds(k * B, B), :],  # start = direct slice
        lambda slab: slab,                        # wait  = no-op
    )


def _logreg_mb_hbm_step_factory(
    static_cfg, masks, const_refs, mscal_ref, scratch_refs
):
    """HBM-streamed variant (VERDICT r4 #5): the feature matrix stays in
    HBM; each step DMAs ONE (B, D_PAD) batch slab into the VMEM scratch
    buffer, so n_data is bounded by HBM (~10^7 rows at D_PAD=128), not
    the ~24k-row VMEM residency of the resident spec.  The copy is
    started at the top of the step and waited only at the slab's first
    use, so the slab-independent compute (prior terms, yX likelihood
    dot) hides most of the DMA round trip (~B*D_PAD*4 bytes at HBM
    bandwidth + latency); the per-batch yX rows stay VMEM-resident (nb
    rows — KBs).  Measured on chip in BENCH_NOTES "Round 5"."""
    db, B, nb = static_cfg
    X_hbm, yX_ref = const_refs    # (n_used, D_PAD) in HBM, (nb_pad, D_PAD)
    xbuf, sem = scratch_refs      # (B, D_PAD) VMEM slab + DMA semaphore

    def start_slab(k, it):
        dma = pltpu.make_async_copy(
            X_hbm.at[pl.ds(k * B, B), :], xbuf, sem
        )
        dma.start()
        return dma

    def wait_slab(dma):
        dma.wait()
        return xbuf[:]

    return _logreg_mb_math(
        static_cfg, masks, mscal_ref, yX_ref, start_slab, wait_slab
    )


def _logreg_mb_hbm_db_step_factory(
    static_cfg, masks, const_refs, mscal_ref, scratch_refs
):
    """Double-buffered HBM streaming: batch slab it+1 is PREFETCHED while
    step it computes, hiding the full DMA round trip (the synchronous
    variant costs 1.44x the resident spec; within-step overlap recovered
    nothing because the wait dominates, BENCH_NOTES "Round 5").

    Hazard-free pipeline (zero per-step conditionals — the 19-minute
    pl.when-per-loop-step Mosaic compile trap, CLAUDE.md):
      prologue          start slab(it0)        -> buf[it0 % 2]
      step it           start slab(it+1)       -> buf[(it+1) % 2]
                        wait  slab(it), compute from buf[it % 2]
      epilogue          wait  slab(it0+steps)  (the dangling prefetch)
    Starts == waits, and every buffer's reads finish before its next
    write (loop iterations are sequential)."""
    db, B, nb = static_cfg
    X_hbm, yX_ref = const_refs    # (n_used, D_PAD) HBM, (nb_pad, D_PAD)
    buf, sems = scratch_refs      # (2, B, D_PAD) VMEM, DMA sems (2,)
    it0, steps = masks.it0, masks.steps

    def dma_for(it):
        k = jax.lax.rem(it, nb)
        slot = jax.lax.rem(it, 2)
        return pltpu.make_async_copy(
            X_hbm.at[pl.ds(k * B, B), :], buf.at[slot], sems.at[slot]
        )

    dma_for(it0).start()          # prologue: the chunk's first slab

    def start_slab(k, it):
        dma_for(it + 1).start()   # prefetch the NEXT step's slab
        return it

    def wait_slab(it):
        dma_for(it).wait()
        slot = jax.lax.rem(it, 2)
        blk = buf[pl.ds(slot, 1)]
        return blk.reshape(blk.shape[1], blk.shape[2])

    fn = _logreg_mb_math(
        static_cfg, masks, mscal_ref, yX_ref, start_slab, wait_slab
    )
    return fn, lambda: dma_for(it0 + steps).wait()


def _pack_minibatch_consts(Xp, yp, B, db):
    """(X_perm padded to lanes, per-batch sum_j y_j X_j rows)."""
    n_used = Xp.shape[0]
    nb = n_used // B
    dp = d_pad_for(db + 1)
    X_pad = jnp.zeros((n_used, dp), jnp.float32).at[:, :db].set(
        Xp.astype(jnp.float32)
    )
    yX = (yp.astype(jnp.float32)[:, None] * Xp.astype(jnp.float32)).reshape(
        nb, B, -1
    ).sum(axis=1)
    nb_pad = -(-nb // 8) * 8
    yX_pad = jnp.zeros((nb_pad, dp), jnp.float32).at[:nb, :db].set(yX)
    return (X_pad, yX_pad)


def _logreg_mb_build(X, y, batch_size, prior_scale, key, streamed,
                     prefetch=True):
    """Shared builder for the VMEM-resident and HBM-streamed minibatch
    logreg specs — one copy of the validation, drop-trailing-batch
    permutation, likelihood rescaling, and reshuffle closure (review
    finding r5)."""
    n_data, db = X.shape
    if db + 1 > D_PAD_MAX:
        raise ValueError(
            f"fused engine supports dim <= {D_PAD_MAX}, got {db + 1}"
        )
    if batch_size % 8 != 0:
        raise ValueError(
            f"batch_size must be a multiple of 8, got {batch_size}"
        )
    nb = n_data // batch_size
    if nb < 1:
        raise ValueError(f"batch_size {batch_size} exceeds n_data {n_data}")
    n_used = nb * batch_size
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    if key is not None:
        perm = jax.random.permutation(key, n_data)[:n_used]
        Xp, yp = jnp.take(X, perm, axis=0), jnp.take(y, perm, axis=0)
    else:
        Xp, yp = X[:n_used], y[:n_used]

    def reshuffle(k, consts):
        perm = jax.random.permutation(k, n_data)[:n_used]
        return _pack_minibatch_consts(
            jnp.take(X, perm, axis=0), jnp.take(y, perm, axis=0),
            batch_size, db,
        )

    dp = d_pad_for(db + 1)
    return FusedModelSpec(
        dim=db + 1,
        consts=_pack_minibatch_consts(Xp, yp, batch_size, db),
        scalars=jnp.array([n_data / batch_size, prior_scale], jnp.float32),
        step_factory=(
            (_logreg_mb_hbm_db_step_factory if prefetch
             else _logreg_mb_hbm_step_factory)
            if streamed else _logreg_mb_step_factory
        ),
        static_cfg=(db, batch_size, nb),
        reshuffle=reshuffle,
        const_spaces=("any", "vmem") if streamed else None,
        scratch=(
            ((("vmem", (2, batch_size, dp), "float32"), ("dma", (2,)))
             if prefetch
             else (("vmem", (batch_size, dp), "float32"), ("dma",)))
            if streamed else ()
        ),
    )


def logreg_minibatch_spec(
    X: jax.Array,
    y: jax.Array,
    batch_size: int,
    prior_scale: float = 3.0,
    key: Optional[jax.Array] = None,
) -> FusedModelSpec:
    """Doubly-stochastic hierarchical logreg as a fused-engine model.

    TPU-first subsampling: the dataset lives permuted in VMEM; each step
    loads one contiguous batch slab (``pl.ds``) on a cyclic schedule
    ``batch k = it % nb`` and rescales the likelihood by n_data/B — the
    library's ``subsample`` contract (models/logreg.py), with the
    reference's drop-trailing-batch semantics (reshuffling.jl:48-53:
    trailing rows beyond nb*B are dropped from each permutation).  The
    per-batch ``sum_j y_j X_j`` rows are precomputed so the in-kernel
    likelihood and gradient are matmul-only (no label array on chip).

    Epoch semantics: within a chunk the permutation is FIXED (cyclic
    incremental-gradient passes); ``reshuffle`` re-permutes between
    driver chunks — coarser than the general path's per-epoch reshuffle,
    same unbiased estimator.  Requires n_used = nb*B rows resident in
    VMEM: n_data * 512 bytes <= ~12 MB, i.e. n_data <~ 24k (use
    ``logreg_minibatch_hbm_spec`` beyond that).
    """
    return _logreg_mb_build(X, y, batch_size, prior_scale, key, False)


def logreg_minibatch_hbm_spec(
    X: jax.Array,
    y: jax.Array,
    batch_size: int,
    prior_scale: float = 3.0,
    key: Optional[jax.Array] = None,
    prefetch: bool = True,
) -> FusedModelSpec:
    """Doubly-stochastic hierarchical logreg with the dataset resident in
    HBM (VERDICT r4 #5): same estimator and schedule as
    ``logreg_minibatch_spec``, but the feature matrix never enters VMEM
    whole — each step DMAs one (B, D_PAD) slab into a scratch buffer, so
    n_data scales to HBM capacity (500k rows = 256 MB at D_PAD=128)
    instead of the ~24k-row VMEM cap.  Measured with the default
    double-buffered prefetch: 525.9k steps/s at n=500k, ~1.05x the
    resident spec's per-step cost; the synchronous ``prefetch=False``
    variant costs 1.43x (~400k steps/s) — BENCH_NOTES "Round 5".
    Reference analogue: src/algorithms/subsampledobjective.jl:10-90 has
    no residency constraint (CPU RAM); this is the TPU-native equivalent
    for the large-n regime that motivates subsampling in the first place.
    ``prefetch=True`` (default) double-buffers: the next batch's DMA is
    in flight while the current step computes; ``False`` selects the
    synchronous single-buffer variant (A/B reference).
    """
    return _logreg_mb_build(
        X, y, batch_size, prior_scale, key, True, prefetch=prefetch
    )


def _gaussian_step_factory(static_cfg, masks, const_refs, mscal_ref):
    (d,) = static_cfg
    m, inv_var = (r[:] for r in const_refs)  # (1, D_PAD); inv_var padded 0
    lognorm = mscal_ref[0]

    def fn(z, it):
        diff = z - m              # padded m = 0 and padded z = 0: inert
        logpi = (
            -0.5 * jnp.sum(diff * diff * inv_var, axis=1, keepdims=True)
            + lognorm
        )
        grad = -diff * inv_var
        return logpi, grad

    return fn


def gaussian_spec(mean: jax.Array, stddev: jax.Array) -> FusedModelSpec:
    """Diagonal-Gaussian target as a fused-engine model.

    This is exactly the unconstrained normal-lognormal BASELINE model
    (models/normallognormal.py): with the Exp bijector on y, the
    log-det-Jacobian +t cancels the LogNormal's -log y, leaving
    N([mu_y, mu_x], diag([sigma_y, sigma_x])^2) in z = [t, x].
    """
    mean = jnp.asarray(mean, jnp.float32)
    stddev = jnp.asarray(stddev, jnp.float32)
    d = mean.shape[0]
    if d > D_PAD_MAX:
        raise ValueError(f"fused engine supports dim <= {D_PAD_MAX}, got {d}")
    dp = d_pad_for(d)
    lognorm = float(
        -jnp.sum(jnp.log(stddev)) - 0.5 * d * _L2PI
    )
    return FusedModelSpec(
        dim=d,
        consts=(_pad_lane(mean, dp), _pad_lane(1.0 / (stddev * stddev), dp)),
        scalars=jnp.array([lognorm], jnp.float32),
        step_factory=_gaussian_step_factory,
        static_cfg=(d,),
    )


def normallognormal_spec(prob) -> FusedModelSpec:
    """FusedModelSpec for a models.normallognormal.NormalLogNormal target
    (its unconstrained density is a diagonal Gaussian; see gaussian_spec)."""
    mean = jnp.concatenate([prob.mu_y[None], prob.mu_x])
    stddev = jnp.concatenate([prob.sigma_y[None], prob.sigma_x])
    return gaussian_spec(mean, stddev)


def _mvnormal_step_factory(static_cfg, masks, const_refs, mscal_ref):
    m, prec = (r[:] for r in const_refs)  # (1, D_PAD), (D_PAD, D_PAD)
    lognorm = mscal_ref[0]

    def fn(z, it):
        diff = z - m
        # grad = -Prec diff; Prec symmetric -> one (N, D) x (D, D) matmul
        grad = -jnp.dot(diff, prec, preferred_element_type=jnp.float32)
        logpi = 0.5 * jnp.sum(diff * grad, axis=1, keepdims=True) + lognorm
        return logpi, grad

    return fn


def mvnormal_spec(mean: jax.Array, scale_tril: jax.Array) -> FusedModelSpec:
    """Dense-covariance Gaussian target N(mean, L L^T) (models/normal.py
    NormalTarget) as a fused-engine model: the precision is precomputed
    once, so the in-kernel gradient is one MXU matmul."""
    mean = jnp.asarray(mean, jnp.float32)
    L = jnp.asarray(scale_tril, jnp.float32)
    d = mean.shape[0]
    if d > D_PAD_MAX:
        raise ValueError(f"fused engine supports dim <= {D_PAD_MAX}, got {d}")
    dp = d_pad_for(d)
    from jax.scipy.linalg import solve_triangular

    Linv = solve_triangular(L, jnp.eye(d, dtype=jnp.float32), lower=True)
    prec = Linv.T @ Linv
    prec_pad = jnp.zeros((dp, dp), jnp.float32).at[:d, :d].set(prec)
    lognorm = float(
        -jnp.sum(jnp.log(jnp.abs(jnp.diag(L)))) - 0.5 * d * _L2PI
    )
    return FusedModelSpec(
        dim=d,
        consts=(_pad_lane(mean, dp), prec_pad),
        scalars=jnp.array([lognorm], jnp.float32),
        step_factory=_mvnormal_step_factory,
        static_cfg=(d,),
    )


# ---------------------------------------------------------------------------
# AD-derived model specs (VERDICT r4 #1): run ANY jnp-only target fused
# ---------------------------------------------------------------------------


class _Sw:
    """Lazy 2D-transpose wrapper: logical value = transpose(arr)."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr


def _eval_transpose_folded(closed_jaxpr, consts, *args, pre_t=None):
    """Evaluate a jaxpr with every foldable 2D ``transpose`` eliminated —
    the in-kernel AD layout legalizer behind ``ad_spec``.

    Why: on v5e, transposing an UNALIGNED array (data or an explicit f32
    value) makes Mosaic transpose its partial-tile padding mask too,
    which dies at ``tpu.transpose : vector<...xi1>`` legalization (chip
    sessions 1-4, BENCH_NOTES "Round 5").  ``jax.vmap``/AD of a row-wise
    log-density inject exactly such transposes: batch-axis moves around
    the model's matmuls.  This pass removes them without changing
    semantics:

    - ``transpose`` whose consumers are all dot_generals: deferred as a
      lazy ``_Sw`` wrapper the dots absorb by flipping that operand's
      contraction dims (no physical op).
    - dot_general whose 2D output feeds only ``transpose`` eqns: emitted
      with swapped operands, producing the transposed result directly;
      the downstream transposes cancel to no-ops.
    - a transpose of a CONSTANT leaf: substituted with the pre-transposed
      copy shipped as an extra kernel operand (``pre_t``: id(leaf value)
      -> transposed value; built host-side for free), also used to
      canonicalize dot orientations on const operands.
    - anything else falls back to a real ``lax.transpose`` (aligned
      shapes are fine; unaligned ones would surface the Mosaic error —
      none remain for the vmap(value_and_grad) graphs of row-wise
      densities).
    """
    from jax.extend import core as jex_core

    pre_t = pre_t or {}
    jaxpr = closed_jaxpr.jaxpr

    cons = {}
    for eqn in jaxpr.eqns:
        for v in eqn.invars:
            if not isinstance(v, jex_core.Literal):
                cons.setdefault(v, []).append(eqn)
    for v in jaxpr.outvars:
        if not isinstance(v, jex_core.Literal):
            cons.setdefault(v, []).append("out")

    env = {}

    def read_raw(v):
        return v.val if isinstance(v, jex_core.Literal) else env[v]

    def safe_transpose(x, perm):
        # THE root hazard (chip sessions 1-4): `tpu.transpose` on an i1
        # vector fails to legalize on v5e, and jax.vmap injects exactly
        # such bool transposes (e.g. jax.nn.softplus's inf-guard masks).
        # Route bool through f32 — f32 relayout transposes lower fine.
        if x.dtype == jnp.bool_:
            return jax.lax.transpose(
                x.astype(jnp.float32), perm
            ).astype(jnp.bool_)
        return jax.lax.transpose(x, perm)

    def materialize(x):
        if isinstance(x, _Sw):
            if id(x.arr) in pre_t:
                return pre_t[id(x.arr)]
            return safe_transpose(x.arr, (1, 0))
        return x

    def read(v):
        return materialize(read_raw(v))

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a

    def only_dot_consumers(v):
        cs = cons.get(v, [])
        return bool(cs) and all(
            c != "out" and c.primitive.name == "dot_general" for c in cs
        )

    def only_swap_transpose_consumers(v):
        cs = cons.get(v, [])
        return bool(cs) and all(
            c != "out"
            and c.primitive.name == "transpose"
            and tuple(c.params["permutation"]) == (1, 0)
            for c in cs
        )

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "transpose" and (
            eqn.invars[0].aval.ndim != 2
            or tuple(eqn.params["permutation"]) != (1, 0)
        ):
            # non-2D / non-swap transposes: just keep them bool-safe
            env[eqn.outvars[0]] = safe_transpose(
                read(eqn.invars[0]), tuple(eqn.params["permutation"])
            )
        elif (
            name == "transpose"
            and len(eqn.invars) == 1
            and eqn.invars[0].aval.ndim == 2
            and tuple(eqn.params["permutation"]) == (1, 0)
        ):
            raw = read_raw(eqn.invars[0])
            if isinstance(raw, _Sw):
                env[eqn.outvars[0]] = raw.arr          # double swap: cancel
            elif id(raw) in pre_t:
                env[eqn.outvars[0]] = pre_t[id(raw)]   # free const transpose
            elif only_dot_consumers(eqn.outvars[0]):
                env[eqn.outvars[0]] = _Sw(raw)         # defer into the dots
            else:
                env[eqn.outvars[0]] = safe_transpose(raw, (1, 0))
        elif name == "dot_general":
            (ca, cb), (ba, bb) = eqn.params["dimension_numbers"]

            def unwrap(x, c, bt):
                # absorb a lazy swap by flipping the 2D dim indices
                if isinstance(x, _Sw) and not bt and x.arr.ndim == 2:
                    return x.arr, tuple(1 - i for i in c), bt
                return materialize(x), c, bt

            a2, ca2, ba2 = unwrap(read_raw(eqn.invars[0]), ca, ba)
            b2, cb2, bb2 = unwrap(read_raw(eqn.invars[1]), cb, bb)
            # canonicalize const operands for free: lhs wants its contract
            # dim LAST, rhs wants it FIRST
            if (
                a2.ndim == 2 and not ba2 and tuple(ca2) == (0,)
                and id(a2) in pre_t
            ):
                a2, ca2 = pre_t[id(a2)], (1,)
            if (
                b2.ndim == 2 and not bb2 and tuple(cb2) == (1,)
                and id(b2) in pre_t
            ):
                b2, cb2 = pre_t[id(b2)], (0,)
            kw = dict(
                precision=eqn.params.get("precision"),
                preferred_element_type=eqn.params.get(
                    "preferred_element_type"
                ),
            )
            out_v = eqn.outvars[0]
            if (
                out_v.aval.ndim == 2
                and not (ba2 or bb2)
                and only_swap_transpose_consumers(out_v)
            ):
                # emit the TRANSPOSED result directly (swap lhs/rhs); the
                # consuming transposes then cancel to no-ops.  Batched
                # dots are excluded: swapping their operands does NOT
                # transpose the output (batch dims stay leading) — review
                # finding r5.
                res = jax.lax.dot_general(
                    b2, a2, ((cb2, ca2), (bb2, ba2)), **kw
                )
                env[out_v] = _Sw(res)
            else:
                env[out_v] = jax.lax.dot_general(
                    a2, b2, ((ca2, cb2), (ba2, bb2)), **kw
                )
        elif name in ("pjit", "jit") and "jaxpr" in eqn.params:
            invals = [read(v) for v in eqn.invars]
            inner = eqn.params["jaxpr"]
            ans = _eval_transpose_folded(
                inner, inner.consts, *invals, pre_t=pre_t
            )
            for v, x in zip(eqn.outvars, ans):
                env[v] = x
        elif (
            name in ("custom_jvp_call", "custom_vjp_call",
                     "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr")
            and "call_jaxpr" in eqn.params
        ):
            # forward-only evaluation: AD already ran when the jaxpr was
            # built, so the custom rule is dead weight — evaluate the
            # primal body (recursively, to catch its transposes too)
            invals = [read(v) for v in eqn.invars]
            inner = eqn.params["call_jaxpr"]
            ans = _eval_transpose_folded(
                inner, inner.consts, *invals, pre_t=pre_t
            )
            for v, x in zip(eqn.outvars, ans):
                env[v] = x
        else:
            invals = [read(v) for v in eqn.invars]
            ans = eqn.primitive.bind(*invals, **eqn.params)
            if eqn.primitive.multiple_results:
                for v, x in zip(eqn.outvars, ans):
                    env[v] = x
            else:
                env[eqn.outvars[0]] = ans
    return [read(v) for v in jaxpr.outvars]


def _ad_step_factory(static_cfg, masks, const_refs, mscal_ref):
    """Generic step factory: rebuild the target pytree from the kernel's
    constant refs and trace ``vmap(value_and_grad(log_density))`` INSIDE
    the kernel.  The transforms are trace-time — jax.vmap/jax.value_and_grad
    of a jnp-only function inline to plain jnp ops in the kernel jaxpr, so
    no Pallas-level AD is involved; the gradient math is bit-for-bit the
    general path's AD.  Padding composition: the differentiated function
    slices the d real lanes off the padded row, so the AD transpose
    zero-pads the gradient back to (rows, D_PAD) automatically, and padded
    SAMPLE rows carry z = mu exactly (u is row-masked before the affine
    map), keeping log_density evaluations off-manifold-free."""
    treedef, d, shapes, t_slots = static_cfg
    n_leaves = len(shapes)
    leaves = []
    for ref, shp in zip(const_refs[:n_leaves], shapes):
        v = ref[:]
        if shp == ():
            v = v[0, 0]      # 0-d leaves travel as (1, 1) VMEM consts
        leaves.append(v)
    # pre-transposed copies of 2D leaves (see _canonical_dot): maps the
    # LOADED leaf tracer's id to its transposed buffer's loaded value
    pre_t = {
        id(leaves[leaf_i]): const_refs[slot][:]
        for leaf_i, slot in t_slots
    }
    target = jax.tree_util.tree_unflatten(treedef, leaves)

    def logp_row(zrow):
        return target.log_density(zrow[:d])

    vag = jax.vmap(jax.value_and_grad(logp_row))

    def fn(z, it):
        # round-trip through a jaxpr so the vmap/AD-injected transposes
        # are folded away before Mosaic sees them (_eval_transpose_folded)
        closed = jax.make_jaxpr(vag)(z)
        logpi, grad = _eval_transpose_folded(
            closed, closed.consts, z, pre_t=pre_t
        )
        return logpi.reshape(z.shape[0], 1), grad

    return fn


def ad_spec(target) -> FusedModelSpec:
    """Build a FusedModelSpec for ANY fully-jax-traceable target by tracing
    its ``log_density`` gradient inside the kernel (VERDICT r4 #1).

    The target must be an ORDER_JAX pytree (the library's L0 protocol,
    core/problem.py) whose ``log_density`` uses only Pallas-TPU-lowerable
    jnp ops: elementwise math, reductions, matmuls, static slices/concats.
    Gathers (``jnp.take`` with traced indices), sorts, and data-dependent
    Python control flow will fail at Mosaic lowering with a compiler
    error, not silently.  ``ppl.ingest(...)`` targets satisfy the contract
    for elementwise supports (real/positive/interval); the hand-derived
    specs (logreg_spec, gaussian_spec, ...) remain the faster choice where
    they exist (hoisted transposes, shared subexpressions).

    Reference bar: the reference's AD glue serves any model in its hot
    loop (src/algorithms/repgradelbo.jl:142-149 via src/AdvancedVI.jl:27-111);
    this is the fused-engine equivalent.
    """
    from ...core.problem import ORDER_JAX, dim_of, order_of

    if order_of(target) != ORDER_JAX:
        raise ValueError(
            f"ad_spec needs a fully jax-traceable target (order JAX); "
            f"{type(target).__name__} has order {order_of(target)} — "
            "oracle/external targets cannot run inside a Pallas kernel"
        )
    d = dim_of(target)
    if d > D_PAD_MAX:
        raise ValueError(f"fused engine supports dim <= {D_PAD_MAX}, got {d}")
    leaves, treedef = jax.tree_util.tree_flatten(target)
    consts, shapes = [], []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if arr.dtype == jnp.bool_ or jnp.issubdtype(arr.dtype, jnp.complexfloating):
            raise ValueError(
                f"ad_spec target has a {arr.dtype} leaf; only float/int "
                "array leaves can live in kernel VMEM — cast it in the "
                "target definition"
            )
        shapes.append(arr.shape)
        consts.append(arr.reshape(1, 1) if arr.ndim == 0 else arr)
    # Transposed copies of genuinely-2D leaves, appended as extra consts:
    # the canonical-dot rewrite substitutes them wherever AD/vmap would
    # otherwise transpose the const IN-KERNEL — which Mosaic cannot lower
    # for unaligned arrays (the i1 padding-mask transpose, chip session
    # 3).  Costs one extra VMEM-resident copy per 2D const.
    t_slots = []
    n_leaves = len(consts)
    for i in range(n_leaves):
        a = consts[i]
        if a.ndim == 2 and a.shape[0] > 1 and a.shape[1] > 1:
            t_slots.append((i, len(consts)))
            consts.append(jnp.transpose(a))
    return FusedModelSpec(
        dim=d,
        consts=tuple(consts),
        scalars=jnp.zeros((1,), jnp.float32),
        step_factory=_ad_step_factory,
        static_cfg=(treedef, d, tuple(shapes), tuple(t_slots)),
    )


def fused_spec_for(target) -> FusedModelSpec:
    """Spec for a target: a registered hand-derived spec where one exists
    (faster — hoisted transposes, shared subexpressions), otherwise the
    generic AD-derived spec (``ad_spec``), which serves any jax-traceable
    pytree target the way the reference's AD glue serves any model
    (src/algorithms/repgradelbo.jl:142-149).

    Hand specs: ``TransformedTarget`` over models.logreg.LogReg or
    models.normallognormal.NormalLogNormal under the model's own
    ``unconstrained()`` transform, and models.normal.NormalTarget.  A
    TransformedTarget with any OTHER transform routes to ad_spec (the
    hand-derived gradients hard-code the Exp bijector and would be
    silently wrong there).  Constrained-space LogReg/NormalLogNormal still
    raise: a Gaussian family on a bounded support is a modeling error.
    """
    from ...core.transforms import TransformedTarget
    from ...models.logreg import LogReg
    from ...models.normal import NormalTarget
    from ...models.normallognormal import NormalLogNormal

    if isinstance(target, NormalTarget):
        return mvnormal_spec(target.mu, target.scale_tril)
    if isinstance(target, TransformedTarget):
        inner = target.prob
        if isinstance(inner, (LogReg, NormalLogNormal)):
            expected = inner.unconstrained().transform
            if target.transform == expected:
                if isinstance(inner, LogReg):
                    return logreg_spec(
                        inner.X, inner.y,
                        prior_scale=inner.prior_scale,
                        likeadj=float(inner.likeadj),
                    )
                return normallognormal_spec(inner)
        return ad_spec(target)
    if isinstance(target, (LogReg, NormalLogNormal)):
        raise ValueError(
            f"{type(target).__name__} is constrained-space; the fused "
            "engine works on target.unconstrained()"
        )
    return ad_spec(target)


# ---------------------------------------------------------------------------
# Engines
# ---------------------------------------------------------------------------


class FusedADVI:
    """Whole-loop fused engine: {mean-field, full-rank} ADVI + STL + Adam +
    ClipScale + polynomial averaging on any ``FusedModelSpec`` target, one
    Pallas dispatch per ``steps`` chunk.

    Reproduces ``KLMinRepGradDescent(entropy=STL, n_samples, optimizer=
    optax.adam(lr), operator=ClipScale())`` with ``PolynomialAveraging``
    (see module docstring for the RNG-stream caveat).
    """

    def __init__(
        self,
        model: FusedModelSpec,
        family: str = MEANFIELD,
        n_samples: int = 10,
        lr: float = 1e-3,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        avg_eta: float = 8.0,
        clip_eps: float = 1e-5,
        interpret: bool = False,
    ):
        if family not in (MEANFIELD, FULLRANK):
            raise ValueError(
                f"family must be '{MEANFIELD}' or '{FULLRANK}', got "
                f"{family!r}"
            )
        if n_samples > N_SAMPLES_MAX_SC:
            raise ValueError(
                f"fused engine supports n_samples <= {N_SAMPLES_MAX_SC}, "
                f"got {n_samples}"
            )
        if model.dim > D_PAD_MAX:
            raise ValueError(
                f"fused engine supports dim <= {D_PAD_MAX}, got {model.dim}"
            )
        if family == FULLRANK and model.dim > D_FULLRANK_MAX:
            raise ValueError(
                f"the full-rank fused engine supports dim <= "
                f"{D_FULLRANK_MAX} (VMEM: 8 dense scale-shaped kernel "
                f"buffers), got {model.dim}"
            )
        self.model = model
        self.d_pad = d_pad_for(model.dim)
        self.family = family
        self.dim = model.dim
        self.n_samples = n_samples
        self.n_pad = n_pad_for(n_samples)
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.avg_eta, self.clip_eps = avg_eta, clip_eps
        self.hyp = jnp.array(
            [lr, b1, b2, eps, avg_eta, clip_eps], jnp.float32
        )
        self.interpret = interpret
        self.algo = ALGO_ADAM
        self.entropy = ENT_STL
        self.grad_est = GE_REPGRAD
        self.operator = OP_CLIP
        # default DoWG/DoG r0 scale so init() is self-contained even when a
        # caller sets eng.algo directly (ADVICE r4); subclasses overwrite.
        self.alpha = 1e-6
        self.cocob_alpha = 100.0  # COCOB bet-fraction floor (rules.py)

    def _scale_zeros(self):
        if self.family == MEANFIELD:
            return jnp.zeros((1, self.d_pad), jnp.float32)
        return jnp.zeros((self.d_pad, self.d_pad), jnp.float32)

    def init(self, location: jax.Array, scale: jax.Array) -> FusedADVIState:
        """``scale``: the (d,) diagonal (mean-field) or (d, d)
        lower-triangular factor (full-rank)."""
        d = self.dim
        if location.shape != (d,):
            raise ValueError(f"expected ({d},) location, got {location.shape}")
        mu = _pad_lane(location, self.d_pad)
        if self.family == MEANFIELD:
            if scale.shape != (d,):
                raise ValueError(
                    f"expected ({d},) scale_diag, got {scale.shape}"
                )
            sig = _pad_lane(scale, self.d_pad, fill=1.0)  # padding 1.0: inert
        else:
            if scale.shape != (d, d):
                raise ValueError(
                    f"expected ({d}, {d}) tril scale, got {scale.shape}"
                )
            sig = _pad_tril(scale, self.d_pad)
        zeros = jnp.zeros((1, self.d_pad), jnp.float32)
        zeros_s = self._scale_zeros()
        if self.algo == ALGO_COCOB:
            # COCOB state: x1 = m_* copies, L = v_* (zeros), and the
            # (G, reward, theta) accumulators in the ext slots (all zero
            # at init — optim/rules.py cocob init).
            return FusedADVIState(
                mu=mu, sig=sig,
                m_mu=mu, v_mu=zeros, m_sig=sig, v_sig=zeros_s,
                avg_mu=mu, avg_sig=sig,
                iteration=jnp.asarray(0, jnp.int32),
                elbo=jnp.float32(0.0),
                ext=(zeros, zeros, zeros, zeros_s, zeros_s, zeros_s),
            )
        if self.algo in (ALGO_DOWG, ALGO_DOG):
            # DoWG/DoG state rides the Adam slots: m_* = x0 copies, v_mu =
            # [v, r, 0, ...].  r0 = alpha * (1 + ||x0||) over the REAL
            # parameter entries (optim/rules.py dowg/dog init; padding is
            # excluded because the general path never sees it).
            norm0 = jnp.sqrt(
                jnp.sum(jnp.square(location.astype(jnp.float32)))
                + jnp.sum(jnp.square(
                    scale.astype(jnp.float32) if self.family == MEANFIELD
                    else jnp.tril(scale.astype(jnp.float32))
                ))
            )
            r0 = jnp.float32(self.alpha) * (1.0 + norm0)
            v_mu = zeros.at[0, 1].set(r0)
            return FusedADVIState(
                mu=mu, sig=sig,
                m_mu=mu, v_mu=v_mu, m_sig=sig, v_sig=zeros_s,
                avg_mu=mu, avg_sig=sig,
                iteration=jnp.asarray(0, jnp.int32),
                elbo=jnp.float32(0.0),
            )
        return FusedADVIState(
            mu=mu, sig=sig,
            m_mu=zeros, v_mu=zeros, m_sig=zeros_s, v_sig=zeros_s,
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
        model: Optional[FusedModelSpec] = None,
    ) -> FusedADVIState:
        """Advance ``steps`` iterations in one kernel dispatch.

        ``noise``: optional (steps * N_PAD, D_PAD) pre-drawn base normals
        (debug/parity path; replaces the on-chip RNG).

        RNG stream: STEP-INDEXED (round 5; VERDICT r4 #3) — the kernel
        reseeds the on-chip PRNG each iteration with the global step index
        folded into the seed, so the draw at iteration t is a function of
        (key, t) only.  ``run_chunk(100k)`` == ``run_chunk(50k)`` twice
        bitwise, and checkpoint resume is bitwise-identical, matching the
        library-wide per-step fold_in invariant (chip-validated,
        BENCH_NOTES "Round 5").  The noise-injection path is
        chunk-associative by construction (tests/test_fused_advi.py).

        ``model``: optional FusedModelSpec overriding ``self.model`` (same
        static_cfg/step_factory family — only consts/scalars may differ);
        the functional-driver path threads reshuffled minibatch specs
        through this instead of mutating the engine.
        """
        state, _ = self._run(state, key, steps, noise, 0, model)
        return state

    def run_chunk_traced(
        self,
        state: FusedADVIState,
        key: jax.Array,
        steps: int,
        log_every: int,
        noise: Optional[jax.Array] = None,
        model: Optional[FusedModelSpec] = None,
    ):
        """Like ``run_chunk`` but also returns the thinned on-device ELBO
        trace: a ``(steps // log_every,)`` array holding the ELBO estimate
        of every ``log_every``-th step (the driver's log_every contract,
        recorded in-kernel — zero extra host syncs)."""
        if log_every < 1:
            raise ValueError(f"log_every must be >= 1, got {log_every}")
        return self._run(state, key, steps, noise, log_every, model)

    def _run(self, state, key, steps, noise, log_every, model=None):
        model = self.model if model is None else model
        use_noise = noise is not None
        if use_noise:
            expect = (steps * self.n_pad, self.d_pad)
            if noise.shape != expect:
                raise ValueError(
                    f"noise must have shape {expect} for steps={steps}, "
                    f"got {noise.shape}"
                )
        else:
            noise = jnp.zeros((self.n_pad, self.d_pad), jnp.float32)
        seed = key_to_seed(key)
        it0 = state.iteration.reshape(1)
        arrays = (
            state.mu, state.sig, state.m_mu, state.v_mu,
            state.m_sig, state.v_sig, state.avg_mu, state.avg_sig,
        )
        use_ext = state.ext is not None
        if self.algo == ALGO_COCOB and not use_ext:
            raise ValueError(
                "COCOB needs a state created with algo='cocob' "
                "(its ext accumulators are missing)"
            )
        hyp = jnp.append(self.hyp, jnp.float32(self.cocob_alpha))
        out = _run_chunk(
            seed, it0, hyp, model.scalars, tuple(model.consts),
            noise, arrays,
            family=self.family, step_factory=model.step_factory,
            static_cfg=model.static_cfg, n_samples=self.n_samples,
            d=self.dim, steps=steps, use_noise=use_noise,
            interpret=self.interpret, n_pad=self.n_pad,
            log_every=log_every,
            algo=self.algo, entropy=self.entropy, d_pad=self.d_pad,
            grad_est=self.grad_est, operator=self.operator,
            ext=(state.ext if use_ext else ()), use_ext=use_ext,
            const_spaces=model.const_spaces, scratch=model.scratch,
        )
        new_state = FusedADVIState(
            mu=out[0], sig=out[1], m_mu=out[2], v_mu=out[3],
            m_sig=out[4], v_sig=out[5], avg_mu=out[6], avg_sig=out[7],
            iteration=state.iteration + steps,
            elbo=out[8][0, 0],
            ext=tuple(out[9:15]) if use_ext else None,
        )
        trace = out[-1][: steps // log_every, 0] if log_every else None
        return new_state, trace

    # -- driver with the library contract -----------------------------------

    def optimize(
        self,
        key: jax.Array,
        max_iter: int,
        q_init=None,
        *,
        state: Optional[FusedADVIState] = None,
        chunk_size: int = 50_000,
        log_every: int = 100,
        show_progress: bool = False,
        progress=None,
        check_divergence: bool = True,
    ):
        """Drive the fused engine with the ``optimize`` contract: returns
        ``(q, infos, state)`` — averaged-parameter family, list of
        ``{"iteration", "elbo"}`` rows on the log_every grid (recorded
        IN-KERNEL, zero extra host syncs), warm-startable state.

        ``q_init``: a MeanFieldGaussian (mean-field engine) or
        FullRankGaussian (full-rank engine); or pass ``state=`` to warm
        start.  Divergence is checked per recorded row, so the raise names
        the first non-finite iteration at log_every granularity (the
        general driver is exact-step; here exactness would cost a per-step
        host channel).  The RNG stream is step-indexed (see run_chunk), so
        warm-started runs resume bitwise.
        """
        import numpy as np

        from ...optimize import DivergenceError

        if state is None:
            if q_init is None:
                raise ValueError("pass q_init or state")
            if self.family == MEANFIELD:
                state = self.init(q_init.location, q_init.scale_diag)
            else:
                state = self.init(q_init.location, q_init.scale_matrix())
        if progress is not None:
            show_progress = True
        if show_progress and progress is None:
            from ...utils.progress import ProgressMeter

            progress = ProgressMeter(max_iter)
        chunk = max(log_every, (chunk_size // log_every) * log_every)
        # bound the in-kernel trace buffer to 512 KB VMEM: (G, d_pad) f32
        # rows, so the row budget shrinks with the lane width
        max_rows = max(8, (1024 * 128) // self.d_pad)
        chunk = min(chunk, max_rows * log_every)
        infos: list = []
        # model is threaded FUNCTIONALLY through the loop (reshuffles bind
        # to this local, never to self.model — VERDICT r4 weak #3): a second
        # optimize on the same engine starts from the constructor's data
        # order, identical to a fresh engine.
        model = self.model
        done = int(state.iteration)
        start = done
        end = start + max_iter
        while done < end:
            n = min(chunk, end - done)
            state, trace = self.run_chunk_traced(
                state, key, steps=(n // log_every) * log_every or n,
                log_every=min(log_every, n), model=model,
            )
            tr = np.asarray(jax.device_get(trace))
            rem = n - (n // log_every) * log_every if n >= log_every else 0
            for g, e in enumerate(tr):
                row = {
                    "elbo": float(e),
                    "iteration": done + (g + 1) * min(log_every, n) - start,
                }
                infos.append(row)
                if check_divergence and not np.isfinite(e):
                    raise DivergenceError(
                        "The objective became non-finite by iteration "
                        f"{row['iteration']} (log_every={log_every} "
                        "granularity). This indicates that the "
                        "optimization diverged."
                    )
            done = int(state.iteration)
            if rem:
                state = self.run_chunk(state, key, steps=rem, model=model)
                done = int(state.iteration)
                row = {
                    "elbo": float(jax.device_get(state.elbo)),
                    "iteration": done - start,
                }
                infos.append(row)
                if check_divergence and not np.isfinite(row["elbo"]):
                    raise DivergenceError(
                        "The objective became non-finite by iteration "
                        f"{row['iteration']}. This indicates that the "
                        "optimization diverged."
                    )
            if model.reshuffle is not None and done < end:
                # data-order refresh between chunks (minibatch models);
                # consts are traced inputs, so this never recompiles
                model = model._replace(
                    consts=model.reshuffle(
                        jax.random.fold_in(key, done), model.consts
                    )
                )
            if progress is not None and infos:
                progress.update(done - start, infos[-1])
        if infos and infos[-1]["iteration"] != max_iter:
            row = {
                "elbo": float(jax.device_get(state.elbo)),
                "iteration": max_iter,
            }
            infos.append(row)
            if check_divergence and not np.isfinite(row["elbo"]):
                raise DivergenceError(
                    "The objective became non-finite by iteration "
                    f"{max_iter}. This indicates that the optimization "
                    "diverged."
                )
        if progress is not None:
            progress.close()
        return self.q(state), infos, state

    # -- output in library types ------------------------------------------

    def q(self, state: FusedADVIState, averaged: bool = True):
        """Current variational family (averaged parameters by default,
        matching ``ParamSpaceSGD.output``)."""
        from ...families.location_scale import (
            FullRankGaussian,
            MeanFieldGaussian,
        )

        mu = state.avg_mu if averaged else state.mu
        sig = state.avg_sig if averaged else state.sig
        d = self.dim
        if self.family == MEANFIELD:
            return MeanFieldGaussian(mu[0, :d], sig[0, :d])
        return FullRankGaussian(mu[0, :d], sig[:d, :d])


class FusedProxADVI(FusedADVI):
    """Whole-loop fused proximal ADVI: {mean-field, full-rank} x
    {Descent, DoWG, DoG} with the closed-form entropy proximal step.

    Reproduces ``KLMinRepGradProxDescent(entropy_zerograd=entropy,
    optimizer=descent(lr) | dowg(alpha))`` + ``PolynomialAveraging``
    exactly under injected noise (tests/test_fused_advi.py); same RNG
    caveat as FusedADVI.  With the default ``closed_form_zero_grad``
    entropy the full-rank engine never runs the in-kernel
    back-substitution — the proximal step replaces the whitening term —
    so fused prox full-rank is substantially CHEAPER per step than fused
    STL full-rank.

    DoWG state layout: the Adam slots are repurposed — ``m_mu``/``m_sig``
    hold the frozen initial parameters x0, ``v_mu[0, 0]`` the weighted
    gradient-norm accumulator v, ``v_mu[0, 1]`` the running distance r
    (reference rules.jl:17-34; norms are global over [location, scale]).
    """

    def __init__(
        self,
        model: FusedModelSpec,
        family: str = MEANFIELD,
        n_samples: int = 10,
        optimizer: str = ALGO_DOWG,
        lr: float = 1e-3,
        alpha: float = 1e-6,
        entropy: str = ENT_CF_ZERO,
        avg_eta: float = 8.0,
        interpret: bool = False,
    ):
        if optimizer not in ETA_ALGOS:
            raise ValueError(
                f"optimizer must be one of {ETA_ALGOS}, got {optimizer!r} "
                "(proximal steps need an extractable step size — "
                "optim/rules.py stepsize_from_opt_state)"
            )
        if entropy not in (ENT_CF_ZERO, ENT_STL_ZERO):
            raise ValueError(
                "proximal engines need a zero-gradient entropy estimator "
                f"('{ENT_CF_ZERO}' or '{ENT_STL_ZERO}'), got {entropy!r}"
            )
        super().__init__(
            model, family=family, n_samples=n_samples, lr=lr,
            avg_eta=avg_eta, interpret=interpret,
        )
        self.algo = optimizer
        self.entropy = entropy
        self.operator = OP_PROX
        self.alpha = alpha


class FusedScoreGradVI(FusedADVI):
    """Whole-loop fused BBVI: the VarGrad score-function gradient
    (``KLMinScoreGradDescent`` semantics, objectives/scoregradelbo.py) with
    {Adam, DoWG, DoG, COCOB, descent} x {IdentityOperator, ClipScale}.

    Mean-field only: the in-kernel score closed form uses
    dlogq/dmu = u/sigma and dlogq/dsigma = (u^2 - 1)/sigma.  The model's
    gradient factory output is unused (DCE'd) — like the general
    ScoreGradELBO, the estimator needs only log-density VALUES, so this
    is the fused path for targets whose gradients are expensive;
    n_samples >= 2 (the leave-one-out control variate is a sample
    variance).  Defaults mirror ``KLMinScoreGradDescent()``: DoWG +
    IdentityOperator + polynomial averaging.
    """

    def __init__(
        self,
        model: FusedModelSpec,
        n_samples: int = 10,
        optimizer: str = ALGO_DOWG,
        lr: float = 1e-3,
        alpha: float = 1e-6,
        operator: str = OP_NONE,
        avg_eta: float = 8.0,
        clip_eps: float = 1e-5,
        interpret: bool = False,
    ):
        if optimizer not in (
            ALGO_ADAM, ALGO_DESCENT, ALGO_DOWG, ALGO_DOG, ALGO_COCOB,
        ):
            raise ValueError(
                f"optimizer must be one of ('{ALGO_ADAM}', '{ALGO_DESCENT}'"
                f", '{ALGO_DOWG}', '{ALGO_DOG}', '{ALGO_COCOB}'), got "
                f"{optimizer!r}"
            )
        if operator not in (OP_NONE, OP_CLIP):
            raise ValueError(
                f"operator must be '{OP_NONE}' or '{OP_CLIP}', got "
                f"{operator!r} (the entropy proximal step is specific to "
                "the zero-gradient RepGrad objectives)"
            )
        if n_samples < 2:
            raise ValueError(
                "the VarGrad estimator needs n_samples >= 2 (sample "
                f"variance), got {n_samples}"
            )
        if operator == OP_NONE:
            # constructor warning parity with the general path
            # (algorithms/paramspace.py:106; reference common.jl:42-46) —
            # the engine always runs a location-scale family, and the
            # identity operator is a known on-chip NaN on the flagship
            # target (BENCH_NOTES "Fused ScoreGrad").
            import warnings

            warnings.warn(
                "IdentityOperator is used with a location-scale variational "
                "family. Optimization can fail due to singular scale "
                "matrices; consider using ClipScale. "
                "(reference behavior: common.jl:42-46)"
            )
        super().__init__(
            model, family=MEANFIELD, n_samples=n_samples, lr=lr,
            avg_eta=avg_eta, clip_eps=clip_eps, interpret=interpret,
        )
        self.algo = optimizer
        self.grad_est = GE_SCOREGRAD
        self.operator = operator
        self.alpha = alpha


class FusedLogRegADVI(FusedADVI):
    """Back-compat wrapper: the flagship-benchmark engine (mean-field ADVI
    on hierarchical logreg).  See FusedADVI / logreg_spec."""

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
        super().__init__(
            logreg_spec(X, y, prior_scale=prior_scale, likeadj=likeadj),
            family=MEANFIELD,
            n_samples=n_samples, lr=lr, b1=b1, b2=b2, eps=eps,
            avg_eta=avg_eta, clip_eps=clip_eps, interpret=interpret,
        )
        # model scalars exposed for the bench-config drift test
        self.likeadj = likeadj
        self.prior_scale = prior_scale
