"""Fused location-scale reparameterization samplers (Pallas TPU kernels).

SURVEY.md §2.8 item 1: the reference's sampling path materializes the base
draw ``u`` and then applies ``scale * u .+ location`` as separate BLAS calls
(reference: src/families/location_scale.jl:71-87).  These kernels generate
the base normals with the on-chip PRNG and apply the affine map in VMEM, so
``u`` never round-trips through HBM:

- ``meanfield_sample(seed, location, scale_diag, n)``: z = u * sigma + m.
- ``fullrank_sample(seed, location, scale_tril, n)``: z = u @ C^T + m, tiled
  so the (TILE_N, d) x (d, d) product runs on the MXU while RNG generation
  for the next tile overlaps.

Standard normals come from Box–Muller over two uint32 draws.  The draws are
deterministic in (seed, tile index) but use a DIFFERENT stream than
``jax.random.normal`` — callers opt in via ``sampler="pallas"`` on the family
(the default XLA path keeps reference-grade key semantics).

Both samplers return ``(z, u)`` and register a custom VJP (the sampling path
must be differentiable w.r.t. location/scale for the reparameterization
gradient): dz/dm = 1, dz/dsigma = u, dz/dC = ct^T u.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * math.pi


def _uniform01(shape):
    """Uniforms in [0, 1) via the mantissa trick: (bits >> 9) | 0x3F800000
    bitcast to float32 lies in [1, 2).  Exact, branch-free, and independent of
    whether prng_random_bits reports int32 or uint32 (on hardware it is int32;
    a plain astype would go negative)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9)) | jnp.uint32(
        0x3F800000
    )
    return pltpu.bitcast(mant, jnp.float32) - 1.0


def _box_muller(shape):
    """Standard normals from the seeded on-chip PRNG (call prng_seed first)."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    # keep u1 strictly positive for the log (2^-24 = float32 mantissa ulp)
    r = jnp.sqrt(-2.0 * jnp.log(u1 + 5.9604645e-08))
    return r * jnp.cos(_TWO_PI * u2)


def _mix_seed(seed_ref, i):
    # v5e supports at most 2 seed words; fold the tile index into word 0
    # (wrapping int32 golden-ratio mix) so tiles get independent streams.
    return seed_ref[0] + i * (-1640531527), seed_ref[1]


def _meanfield_kernel(seed_ref, loc_ref, sd_ref, z_ref, u_ref):
    s0, s1 = _mix_seed(seed_ref, pl.program_id(0))
    pltpu.prng_seed(s0, s1)
    u = _box_muller(u_ref.shape)
    u_ref[:] = u
    z_ref[:] = u * sd_ref[:] + loc_ref[:]


@functools.partial(jax.jit, static_argnames=("n", "tile_n", "interpret"))
def _meanfield_sample_raw(seed, location, scale_diag, n, tile_n, interpret):
    d = location.shape[0]
    grid = pl.cdiv(n, tile_n)
    out = pl.pallas_call(
        _meanfield_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * tile_n, d), jnp.float32),
            jax.ShapeDtypeStruct((grid * tile_n, d), jnp.float32),
        ),
        interpret=interpret,
    )(seed, location, scale_diag)
    z, u = out
    return z[:n], u[:n]


def _fullrank_kernel(seed_ref, loc_ref, scale_ref, z_ref, u_ref):
    s0, s1 = _mix_seed(seed_ref, pl.program_id(0))
    pltpu.prng_seed(s0, s1)
    u = _box_muller(u_ref.shape)
    u_ref[:] = u
    z_ref[:] = (
        jnp.dot(u, scale_ref[:].T, preferred_element_type=jnp.float32)
        + loc_ref[:]
    )


@functools.partial(jax.jit, static_argnames=("n", "tile_n", "interpret"))
def _fullrank_sample_raw(seed, location, scale_tril, n, tile_n, interpret):
    d = location.shape[0]
    grid = pl.cdiv(n, tile_n)
    out = pl.pallas_call(
        _fullrank_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * tile_n, d), jnp.float32),
            jax.ShapeDtypeStruct((grid * tile_n, d), jnp.float32),
        ),
        interpret=interpret,
    )(seed, location, scale_tril)
    z, u = out
    return z[:n], u[:n]


def _lowrank_kernel(seed_ref, loc_ref, sd_ref, fact_ref, z_ref, u1_ref, u2_ref):
    s0, s1 = _mix_seed(seed_ref, pl.program_id(0))
    pltpu.prng_seed(s0, s1)
    u1 = _box_muller(u1_ref.shape)
    u2 = _box_muller(u2_ref.shape)
    u1_ref[:] = u1
    u2_ref[:] = u2
    z_ref[:] = (
        u1 * sd_ref[:]
        + jnp.dot(u2, fact_ref[:].T, preferred_element_type=jnp.float32)
        + loc_ref[:]
    )


@functools.partial(jax.jit, static_argnames=("n", "tile_n", "interpret"))
def _lowrank_sample_raw(seed, location, scale_diag, scale_factors, n, tile_n,
                        interpret):
    d = location.shape[0]
    r = scale_factors.shape[1]
    grid = pl.cdiv(n, tile_n)
    out = pl.pallas_call(
        _lowrank_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * tile_n, d), jnp.float32),
            jax.ShapeDtypeStruct((grid * tile_n, d), jnp.float32),
            jax.ShapeDtypeStruct((grid * tile_n, r), jnp.float32),
        ),
        interpret=interpret,
    )(seed, location, scale_diag, scale_factors)
    z, u1, u2 = out
    return z[:n], u1[:n], u2[:n]


def key_to_seed(key: jax.Array) -> jax.Array:
    """(2,) int32 seed words from a jax PRNG key (for SMEM prefetch)."""
    data = jax.random.key_data(key).reshape(-1)[:2]
    return jax.lax.bitcast_convert_type(data, jnp.int32)


# ---------------------------------------------------------------------------
# Differentiable wrappers (reparameterization path)
# ---------------------------------------------------------------------------


def _float0_zero(shape):
    # Cotangent for integer-dtype primals (the seed) is float0.
    import numpy as np

    return np.zeros(shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def meanfield_sample(seed, location, scale_diag, n, tile_n=256, interpret=False):
    """Fused z = u * sigma + m; returns (z, u), differentiable in (m, sigma)."""
    return _meanfield_sample_raw(seed, location, scale_diag, n, tile_n, interpret)


def _mf_fwd(seed, location, scale_diag, n, tile_n, interpret):
    z, u = _meanfield_sample_raw(seed, location, scale_diag, n, tile_n, interpret)
    return (z, u), (u, seed.shape)


def _mf_bwd(n, tile_n, interpret, res, cts):
    u, seed_shape = res
    ct_z, _ = cts  # u is a constant w.r.t. parameters
    return (
        _float0_zero(seed_shape),
        jnp.sum(ct_z, axis=0),
        jnp.sum(ct_z * u, axis=0),
    )


meanfield_sample.defvjp(_mf_fwd, _mf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fullrank_sample(seed, location, scale_tril, n, tile_n=256, interpret=False):
    """Fused z = u @ C^T + m; returns (z, u), differentiable in (m, C)."""
    return _fullrank_sample_raw(seed, location, scale_tril, n, tile_n, interpret)


def _fr_fwd(seed, location, scale_tril, n, tile_n, interpret):
    z, u = _fullrank_sample_raw(seed, location, scale_tril, n, tile_n, interpret)
    return (z, u), (u, seed.shape)


def _fr_bwd(n, tile_n, interpret, res, cts):
    u, seed_shape = res
    ct_z, _ = cts
    # z = u C^T + m  =>  dL/dC = ct_z^T u ; dL/dm = sum ct_z
    dC = ct_z.T @ u
    return (_float0_zero(seed_shape), jnp.sum(ct_z, axis=0), jnp.tril(dC))


fullrank_sample.defvjp(_fr_fwd, _fr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def lowrank_sample(seed, location, scale_diag, scale_factors, n, tile_n=256,
                   interpret=False):
    """Fused z = u1 * D + u2 @ U^T + m (diag + low-rank path,
    reference: location_scale_low_rank.jl:79-86); returns (z, u1, u2),
    differentiable in (m, D, U)."""
    return _lowrank_sample_raw(
        seed, location, scale_diag, scale_factors, n, tile_n, interpret
    )


def _lr_fwd(seed, location, scale_diag, scale_factors, n, tile_n, interpret):
    z, u1, u2 = _lowrank_sample_raw(
        seed, location, scale_diag, scale_factors, n, tile_n, interpret
    )
    return (z, u1, u2), (u1, u2, seed.shape)


def _lr_bwd(n, tile_n, interpret, res, cts):
    u1, u2, seed_shape = res
    ct_z = cts[0]  # u1/u2 are constants w.r.t. parameters
    # z = u1 D + u2 U^T + m  =>  dD = sum(ct*u1), dU = ct^T u2, dm = sum ct
    return (
        _float0_zero(seed_shape),
        jnp.sum(ct_z, axis=0),
        jnp.sum(ct_z * u1, axis=0),
        ct_z.T @ u2,
    )


lowrank_sample.defvjp(_lr_fwd, _lr_bwd)
