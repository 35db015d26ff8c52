"""Native-component tests: C++ reshuffle/data engine and Pallas kernel
plumbing (the statistical validation of the on-chip-RNG kernels runs on real
TPU hardware via bench/verify; CPU checks cover schedules, gradients'
formula-level structure, and error paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.utils.data import (
    HostDataLoader,
    fill_permutation,
    gather_rows,
    native_available,
)


def test_native_lib_compiles():
    assert native_available(), "C++ reshuffle library failed to build"


def test_permutation_properties():
    p = fill_permutation(7, 1000)
    assert sorted(p.tolist()) == list(range(1000))
    np.testing.assert_array_equal(p, fill_permutation(7, 1000))
    assert not np.array_equal(p, fill_permutation(8, 1000))


def test_gather_matches_numpy():
    X = np.random.default_rng(0).normal(size=(5000, 64)).astype(np.float32)
    idx = fill_permutation(3, 5000)[:2048]
    np.testing.assert_array_equal(gather_rows(X, idx), X[idx])


def test_host_data_loader_schedule():
    X = np.arange(100 * 4, dtype=np.float32).reshape(100, 4)
    y = np.arange(100, dtype=np.float32)
    dl = HostDataLoader(X, y, batchsize=16, seed=5)
    assert len(dl) == 6
    seen = []
    for _ in range(len(dl)):
        Xb, yb, idx = dl.next_batch()
        assert Xb.shape == (16, 4)
        np.testing.assert_array_equal(Xb, X[idx])
        np.testing.assert_array_equal(yb[:, 0], y[idx])
        seen.extend(idx.tolist())
    assert len(set(seen)) == len(seen)
    assert dl.epoch == 1  # reshuffled for next epoch


def test_pallas_sampler_error_paths():
    q = avt.MeanFieldGaussian(
        jnp.zeros(4), jnp.ones(4), sampler="pallas"
    ).replace(base=avt.StudentT(df=4.0))
    with pytest.raises(ValueError, match="Normal base"):
        q.sample(jax.random.key(0), 8)

    jax.config.update("jax_enable_x64", True)
    try:
        q64 = avt.MeanFieldGaussian(
            jnp.zeros(4, jnp.float64), jnp.ones(4, jnp.float64),
            sampler="pallas",
        )
        with pytest.raises(ValueError, match="float32"):
            q64.sample(jax.random.key(0), 8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_pallas_bwd_formulas():
    """The custom-VJP backward formulas against hand derivation, using the
    bwd functions directly (kernels themselves need TPU hardware)."""
    from advancedvi_jl_tpu.ops.pallas.location_scale_kernels import (
        _fr_bwd,
        _mf_bwd,
    )

    rng = np.random.default_rng(1)
    n, d = 16, 5
    u = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ct_z = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ct_u = jnp.zeros((n, d), jnp.float32)

    _, dm, dsd = _mf_bwd(n, 256, False, (u, (2,)), (ct_z, ct_u))
    np.testing.assert_allclose(np.asarray(dm), np.asarray(ct_z).sum(0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dsd), (np.asarray(ct_z) * np.asarray(u)).sum(0), rtol=1e-6
    )

    _, dm2, dC = _fr_bwd(n, 256, False, (u, (2,)), (ct_z, ct_u))
    np.testing.assert_allclose(np.asarray(dm2), np.asarray(ct_z).sum(0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dC),
        np.tril(np.asarray(ct_z).T @ np.asarray(u)),
        rtol=1e-5,
    )


def test_pallas_lowrank_bwd_formulas():
    """Low-rank fused-sampler VJP: z = u1 D + u2 U^T + m =>
    dm = sum ct, dD = sum(ct * u1), dU = ct^T u2."""
    from advancedvi_jl_tpu.ops.pallas.location_scale_kernels import _lr_bwd

    rng = np.random.default_rng(2)
    n, d, r = 16, 5, 3
    u1 = np.asarray(rng.normal(size=(n, d)), np.float32)
    u2 = np.asarray(rng.normal(size=(n, r)), np.float32)
    ct_z = np.asarray(rng.normal(size=(n, d)), np.float32)
    cts = (jnp.asarray(ct_z), jnp.zeros((n, d), jnp.float32),
           jnp.zeros((n, r), jnp.float32))

    _, dm, dD, dU = _lr_bwd(
        n, 256, False, (jnp.asarray(u1), jnp.asarray(u2), (2,)), cts
    )
    np.testing.assert_allclose(np.asarray(dm), ct_z.sum(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dD), (ct_z * u1).sum(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dU), ct_z.T @ u2, rtol=1e-5)


def test_pallas_lowrank_error_paths():
    q = avt.LowRankGaussian(
        jnp.zeros(4), jnp.ones(4), 0.1 * jnp.ones((4, 2))
    ).replace(sampler="pallas", base=avt.Laplace())
    with pytest.raises(ValueError, match="Normal base"):
        q.sample(jax.random.key(0), 8)
