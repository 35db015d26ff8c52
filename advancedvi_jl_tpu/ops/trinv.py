"""Level-parallel blocked triangular inverse (matmul-only above the base).

Why: XLA's ``triangular_solve`` on TPU lowers to SEQUENTIAL blocked
substitution — O(d/block) dependent steps whose per-step matmuls are too
small to fill the MXU.  At the VI hot-path shapes (one (d, d) factor,
n ~ 10^2 right-hand sides) the solve's wall-clock is dominated by that
dependency chain, nearly independent of n (measured: halving n_samples
changes step time by <1%, BENCH_NOTES "Step budget").

This kernel restructures the computation as the classic divide-and-conquer
inverse:

    [[A, 0], [B, D]]^{-1} = [[A^{-1}, 0], [-D^{-1} B A^{-1}, D^{-1}]]

evaluated bottom-up: ONE batched 128x128 base inversion (all d/128 diagonal
blocks in parallel), then log2(d/128) levels where every pair's off-diagonal
correction -D^{-1} B A^{-1} is two batched (s, s) matmuls — MXU-shaped,
independent across pairs, O(log d) sequential depth instead of O(d/128).
Total ~2/3 d^3 FLOPs.

Measured on v5e (BENCH_NOTES "Round 3"): a WASH on the full VI step at
d=1024/n=256 (2422 vs 2419 steps/s) — the level-parallel matmuls do beat
the substitution chain, but the tile gather/scatter passes that assemble
each level eat exactly the win.  Kept as a tested opt-in
(``FullRankLocationScale(solve_mode="inverse")``) because the crossover is
shape-dependent (more rhs amortize the inverse's fixed cost; substitution
wins worst-case rounding on ill-conditioned factors).  Parity (values,
gradients, training trajectories) is pinned in tests/test_trinv.py.
Differentiable by construction (solves + matmuls).

No reference counterpart (the reference delegates to LAPACK trsm,
reference: src/families/location_scale.jl:59-63); this is a TPU-first
redesign of that kernel slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

_BASE = 128  # MXU tile edge: base-case inversion size


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def supports_blocked_inverse(d: int, block: int = _BASE) -> bool:
    """Shape gate: d must tile into a power-of-two number of base blocks."""
    return d % block == 0 and _is_pow2(d // block)


def tril_inverse(C: jax.Array, block: int = _BASE) -> jax.Array:
    """Inverse of a lower-triangular (d, d) matrix, level-parallel.

    Falls back to one dense triangular solve against I when the shape gate
    fails (small or odd d) — correctness never depends on the fast path.
    """
    d = C.shape[0]
    if not supports_blocked_inverse(d, block):
        return solve_triangular(
            C, jnp.eye(d, dtype=C.dtype), lower=True
        )

    nb = d // block
    # (nb, nb, block, block) tile view
    tiles = C.reshape(nb, block, nb, block).transpose(0, 2, 1, 3)
    diag_idx = jnp.arange(nb)
    diag_blocks = tiles[diag_idx, diag_idx]  # (nb, block, block)

    eye = jnp.eye(block, dtype=C.dtype)
    base_inv = jax.vmap(
        lambda b: solve_triangular(b, eye, lower=True)
    )(diag_blocks)

    # T starts as blockdiag(base_inv) in tile view; off-diagonal tiles are
    # filled level by level.
    T = jnp.zeros((nb, nb, block, block), dtype=C.dtype)
    T = T.at[diag_idx, diag_idx].set(base_inv)

    s = 1  # current solved tile size, in base-block units
    while s < nb:
        p = nb // (2 * s)  # number of pairs at this level
        starts = jnp.arange(p) * 2 * s  # base-block row/col of each pair's A

        # Gather the pair sub-operators as (p, s*block, s*block) dense mats.
        def gather(M, r0, c0):
            # rows r0..r0+s, cols c0..c0+s of the tile grid, densified
            rows = (starts[:, None] + r0 + jnp.arange(s)[None, :])  # (p, s)
            cols = (starts[:, None] + c0 + jnp.arange(s)[None, :])
            sub = M[rows[:, :, None], cols[:, None, :]]  # (p, s, s, b, b)
            return sub.transpose(0, 1, 3, 2, 4).reshape(
                p, s * block, s * block
            )

        Ai = gather(T, 0, 0)
        Di = gather(T, s, s)
        Ctiles = C.reshape(nb, block, nb, block).transpose(0, 2, 1, 3)
        B = gather(Ctiles, s, 0)

        # -D^{-1} B A^{-1}: two batched MXU matmuls per pair
        O = -jnp.einsum("pij,pjk->pik", Di, jnp.einsum("pij,pjk->pik", B, Ai))

        # scatter O back into T's (s..2s, 0..s) tile positions
        Ob = O.reshape(p, s, block, s, block).transpose(0, 1, 3, 2, 4)
        rows = (starts[:, None] + s + jnp.arange(s)[None, :])  # (p, s)
        cols = (starts[:, None] + jnp.arange(s)[None, :])
        T = T.at[rows[:, :, None], cols[:, None, :]].set(Ob)
        s *= 2

    return T.transpose(0, 2, 1, 3).reshape(d, d)
