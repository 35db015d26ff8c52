"""Batched right-division by a triangular factor (Pallas TPU kernel).

The STL entropy backward and the full-rank whitening both apply
``C^{-1}``/``C^{-T}`` to a batch of n row vectors.  XLA's
``triangular_solve`` on TPU lowers to a sequential blocked substitution
whose dispatch-and-dependency chain dominates: measured 101.6 us at
(d=1024, n=256) and 232.9 us at (d=2048, n=128) — 55-59% of the entire
FLOP-bound ADVI step (BENCH_NOTES "Round 3 profile").

This kernel restructures the solve as ONE Pallas program: a sequential
grid over block-rows/cols of C with the whole right-looking update in
VMEM, C streamed from HBM one (B, d) slab per grid step (auto
double-buffered by the pipeline), and the per-block inverse computed
IN-KERNEL by an exactly-terminating Newton iteration (the residual of
the diagonal seed is nilpotent, so ceil(log2 B) iterations are exact) —
precomputing those inverses with an XLA batched triangular_solve costs
as much as the solve being replaced and ate the whole win in the first
measurement.

Three tricks keep every step mask-free and fully MXU-shaped:

- The right-looking update ``WS -= W_b @ slab`` runs FULL-WIDTH (n, B) x
  (B, d): columns above the diagonal block are zero in C (no-op), and the
  diagonal-block region of WS gets corrupted by ``-W_b @ D_b`` — but that
  region is overwritten with ``W_b`` in the same step and never read
  again, so no column mask is needed.
- The transposed mode feeds C^T (one d^2 transpose pass), so the slab
  holds exactly the operator blocks and no transposed contraction is
  needed anywhere — including the Newton inversion, which inverts D^T
  directly (the transposed seed residual is nilpotent too).

Modes (both solve a RIGHT division, batched over rows of V):

- ``mode="C"``:  W = V @ C^{-1}   (solves W C = V;   backward block order)
  — the STL fast-entropy backward ``apply_inv_scale_T`` (entropy.py).
- ``mode="CT"``: W = V @ C^{-T}   (solves W C^T = V; forward block order)
  — the log_prob whitening ``scale \\ (z - location)`` batched over rows.

FLOPs are 2x the minimal substitution (full-width updates), but all of it
is MXU work with O(d/B) sequential depth and zero per-step dispatch.
No reference counterpart (the reference delegates to LAPACK trsm,
reference: src/families/location_scale.jl:59-63).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(d: int) -> int:
    # B = 128: the in-kernel Newton inversion costs ~4 B^2 d log2(B) FLOPs
    # total, so the smallest MXU-native tile wins (256 would 4x it while
    # the main right-looking update's FLOPs are B-independent).
    if d % 128 == 0:
        return 128
    return 0


def supports_pallas_trisolve(d: int) -> bool:
    return _pick_block(d) > 0


def _kernel(transpose_c, nblocks, nnewton, c_ref, v_ref, out_ref, ws_ref):
    k = pl.program_id(0)
    B = c_ref.shape[0]
    # mode "C" walks block index b = K-1-k (backward); "CT" walks b = k.
    b = k if transpose_c else nblocks - 1 - k

    @pl.when(k == 0)
    def _init():
        ws_ref[:] = v_ref[:]

    slab = c_ref[:]                              # (B, d) row slab
    resid = ws_ref[:, pl.ds(b * B, B)]           # (n, B)

    # Invert the diagonal block IN-KERNEL by Newton iteration.  The block
    # D sits in the slab at columns [bB, (b+1)B).  With the diagonal seed
    # X0 = diag(1/d_i), the residual R0 = I - D X0 is strictly triangular
    # (nilpotent of index B), and Newton squares it: R_{k+1} = R_k^2, so
    # ceil(log2(B)) iterations terminate EXACTLY — 2 (B, B) MXU matmuls
    # each, all inside the one dispatch.  An XLA batched triangular_solve
    # for these inverses costs as much as the solve being replaced
    # (measured: it ate the kernel's whole win, BENCH_NOTES "Round 3").
    D = c_ref[:, pl.ds(b * B, B)]  # ref slice (value dynamic_slice is not
    #                                lowered by Mosaic)
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    eye = (row == col).astype(jnp.float32)
    dvec = jnp.sum(D * eye, axis=1, keepdims=True)   # (B, 1) diagonal
    X = eye / dvec                                    # diag(1/d_i)
    for _ in range(nnewton):
        DX = jnp.dot(D, X, preferred_element_type=jnp.float32)
        X = jnp.dot(X, 2.0 * eye - DX, preferred_element_type=jnp.float32)

    # In mode "CT" the wrapper feeds C^T, so D here is D_b^T and X its
    # inverse — exactly the operator the transposed solve needs; no
    # transposed contraction required in either mode.
    w = jnp.dot(resid, X, preferred_element_type=jnp.float32)
    # full-width right-looking update (columns past the triangle are zero
    # in the slab; the diagonal-block region is overwritten just below)
    upd = jnp.dot(w, slab, preferred_element_type=jnp.float32)
    ws_ref[:] = ws_ref[:] - upd
    ws_ref[:, pl.ds(b * B, B)] = w
    out_ref[:, pl.ds(b * B, B)] = w


@functools.partial(
    jax.jit, static_argnames=("mode", "block", "interpret")
)
def _solve_raw(C, V, mode, block, interpret):
    n, d = V.shape
    nb = d // block
    transpose_c = mode == "CT"
    if transpose_c:
        # forward block order; the wrapper passes C^T, so slab k is C^T's
        # row slab (C^T)_{k, :} = (C[:, kB:(k+1)B])^T
        c_spec = pl.BlockSpec(
            (block, d), lambda k: (k, 0), memory_space=pltpu.VMEM
        )
    else:
        c_spec = pl.BlockSpec(
            (block, d), lambda k: (nb - 1 - k, 0), memory_space=pltpu.VMEM
        )
    nnewton = max(1, (block - 1).bit_length())  # ceil(log2(block))
    return pl.pallas_call(
        functools.partial(_kernel, transpose_c, nb, nnewton),
        grid=(nb,),
        in_specs=[
            c_spec,
            pl.BlockSpec((n, d), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, d), lambda k: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, d), jnp.float32)],
        interpret=interpret,
    )(C, V)


def solve_right(
    C: jax.Array,
    V: jax.Array,
    mode: str = "C",
    interpret: bool = False,
) -> jax.Array:
    """W = V @ C^{-1} (mode "C") or V @ C^{-T} (mode "CT"), V: (n, d).

    C must be lower-triangular (the wrapper does NOT mask).  Falls back to
    XLA's triangular_solve when the shape gate fails or when either input
    is not float32 (the kernel and its out_shape are f32-only; a silent
    cast would return f32 cotangents for non-f32 primals through the
    vdiv_* custom VJPs — ADVICE r3).  Not differentiable — the
    fast-entropy path calls it inside a custom VJP's backward; wrap it
    yourself for forward-graph use.
    """
    d = C.shape[0]
    block = _pick_block(d)
    f32 = C.dtype == jnp.float32 and V.dtype == jnp.float32
    if block == 0 or V.ndim != 2 or not f32:
        trans = mode == "CT"
        # right division: (C^{-1 or -T} applied to rows) == solve on V^T
        return jax.lax.linalg.triangular_solve(
            C, V.T, left_side=True, lower=True, transpose_a=not trans
        ).T
    if mode == "CT":
        # one d^2 transpose pass so the kernel's slab loads stay row-major
        return _solve_raw(C.T, V, "CT", block, interpret)
    if mode != "C":
        raise ValueError(f"mode must be 'C' or 'CT', got {mode!r}")
    return _solve_raw(C, V, "C", block, interpret)


# ---------------------------------------------------------------------------
# Differentiable wrappers
# ---------------------------------------------------------------------------
#
# For W = V C^{-1}: ct_V = ct @ C^{-T} (one more kernel call) and
# ct_C = -W^T @ ct_V.  For W = V C^{-T}: ct_V = ct @ C^{-1} and
# ct_C = -ct_V^T @ W (note the flipped product order — dC enters
# transposed there).  Each backward is one kernel call + one MXU matmul.
# ct_C is returned dense; the caller's tril-mask VJP (tril_scale) projects
# it, so no masking happens here.  Interpret mode is selected automatically
# off-TPU so the same code path runs under the CPU test mesh.


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def vdiv_c(C: jax.Array, V: jax.Array) -> jax.Array:
    """W = V @ C^{-1} for lower-triangular C, batched over rows of V."""
    return solve_right(C, V, mode="C", interpret=_auto_interpret())


def _vdiv_c_fwd(C, V):
    W = solve_right(C, V, mode="C", interpret=_auto_interpret())
    return W, (C, W)


def _vdiv_c_bwd(res, ct):
    C, W = res
    ct_V = solve_right(C, ct, mode="CT", interpret=_auto_interpret())
    return -W.T @ ct_V, ct_V


vdiv_c.defvjp(_vdiv_c_fwd, _vdiv_c_bwd)


@jax.custom_vjp
def vdiv_ct(C: jax.Array, V: jax.Array) -> jax.Array:
    """W = V @ C^{-T} for lower-triangular C, batched over rows of V."""
    return solve_right(C, V, mode="CT", interpret=_auto_interpret())


def _vdiv_ct_fwd(C, V):
    W = solve_right(C, V, mode="CT", interpret=_auto_interpret())
    return W, (C, W)


def _vdiv_ct_bwd(res, ct):
    C, W = res
    ct_V = solve_right(C, ct, mode="C", interpret=_auto_interpret())
    return -ct_V.T @ W, ct_V


vdiv_ct.defvjp(_vdiv_ct_fwd, _vdiv_ct_bwd)
