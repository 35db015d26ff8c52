"""Packed lower-triangular layout (ops/packing.py + layout="packed").

Pins the gather-only pack/unpack pair (values and custom-VJP gradients
against scatter-based autodiff ground truth) and full parity between
dense- and packed-layout full-rank families: densities, entropy, solves,
operators, and whole training trajectories (ADVI and proximal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.ops.packing import (
    packed_diag,
    packed_shape,
    packed_with_diag,
    tril_pack,
    tril_unpack,
)


def _factor(key, d, diag=1.3):
    A = jax.random.normal(key, (d, d)) * (0.3 / d**0.5)
    return jnp.tril(A, -1) + diag * jnp.eye(d)


@pytest.mark.parametrize("d", [1, 5, 64, 130, 256])
def test_pack_unpack_roundtrip(key, d):
    C = _factor(key, d)
    v = tril_pack(C)
    assert v.shape == packed_shape(d)
    np.testing.assert_array_equal(np.asarray(tril_unpack(v, d)), np.asarray(C))
    # pack of a dense matrix ignores the upper triangle
    noise = jnp.triu(jax.random.normal(jax.random.fold_in(key, 1), (d, d)), 1)
    np.testing.assert_array_equal(np.asarray(tril_pack(C + noise)), np.asarray(v))


@pytest.mark.parametrize("d", [9, 130])
def test_pack_unpack_gradients(key, d):
    """pack/unpack are slice/concat compositions; their autodiff must equal
    the adjoint of the plain tril-mask formulation."""
    C = _factor(key, d)
    W = jax.random.normal(jax.random.fold_in(key, 1), (d, d))

    def via_packed(C):
        return jnp.sum(jnp.sin(tril_unpack(tril_pack(C), d)) * W)

    def via_tril(C):
        return jnp.sum(jnp.sin(jnp.tril(C)) * W)

    np.testing.assert_allclose(
        float(via_packed(C)), float(via_tril(C)), rtol=1e-6
    )
    gp, gt = jax.grad(via_packed)(C), jax.grad(via_tril)(C)
    # the packed path never reads the upper triangle, so its grad there is 0;
    # via_tril's grad is also 0 there (tril mask) — compare full matrices
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gt), rtol=1e-6, atol=1e-7)

    # unpack-only gradient: cotangent flows back into the right tiles
    v = tril_pack(C)
    gv = jax.grad(lambda v: jnp.sum(jnp.sin(tril_unpack(v, d)) * W))(v)
    gC = jax.grad(via_tril)(C)
    np.testing.assert_allclose(
        np.asarray(tril_unpack(gv, d)), np.asarray(gC), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("d", [17, 130])
def test_packed_diag_helpers(key, d):
    C = _factor(key, d)
    v = tril_pack(C)
    np.testing.assert_array_equal(
        np.asarray(packed_diag(v, d)), np.asarray(jnp.diag(C))
    )
    new = jnp.arange(1.0, d + 1.0)
    v2 = packed_with_diag(v, d, new)
    C2 = tril_unpack(v2, d)
    np.testing.assert_array_equal(np.asarray(jnp.diag(C2)), np.asarray(new))
    np.testing.assert_array_equal(
        np.asarray(jnp.tril(C2, -1)), np.asarray(jnp.tril(C, -1))
    )


@pytest.mark.parametrize("d", [5, 64])
def test_family_parity_dense_vs_packed(key, d):
    C = _factor(key, d)
    loc = jax.random.normal(jax.random.fold_in(key, 2), (d,))
    qd = avt.FullRankGaussian(loc, C)
    qp = avt.FullRankGaussian(loc, C, layout="packed")
    assert qp.scale.shape == packed_shape(d)

    # identical sample stream (the unpacked factor is bitwise the tril)
    zd = qd.sample(jax.random.fold_in(key, 3), 8)
    zp = qp.sample(jax.random.fold_in(key, 3), 8)
    np.testing.assert_array_equal(np.asarray(zd), np.asarray(zp))

    np.testing.assert_allclose(
        np.asarray(qd.log_prob(zd)), np.asarray(qp.log_prob(zd)), rtol=1e-6
    )
    np.testing.assert_allclose(float(qd.entropy()), float(qp.entropy()), rtol=1e-6)
    V = jax.random.normal(jax.random.fold_in(key, 4), (8, d))
    np.testing.assert_allclose(
        np.asarray(qd.apply_inv_scale_T(V)),
        np.asarray(qp.apply_inv_scale_T(V)),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(qd.cov()), np.asarray(qp.cov()), rtol=1e-6
    )


def test_advi_trajectory_parity(key):
    """Full ADVI+STL+ClipScale trajectories agree between layouts."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    d = 12
    target, mu, L = normal_fullrank(key, d)
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=8, operator=avt.ClipScale()
    )
    outs = {}
    for layout in ("dense", "packed"):
        q0 = avt.FullRankGaussian(jnp.zeros(d), layout=layout)
        out, infos, _ = avt.optimize(jax.random.key(7), alg, 300, target, q0)
        outs[layout] = (out, infos[-1]["elbo"])
    np.testing.assert_allclose(
        np.asarray(outs["dense"][0].location),
        np.asarray(outs["packed"][0].location),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(outs["dense"][0].tril_scale()),
        np.asarray(outs["packed"][0].tril_scale()),
        atol=1e-5,
    )
    np.testing.assert_allclose(outs["dense"][1], outs["packed"][1], atol=1e-4)


def test_proximal_trajectory_parity(key):
    """KLMinRepGradProxDescent exercises with_scale_diag on both layouts."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    d = 8
    target, mu, L = normal_fullrank(key, d)
    alg = avt.KLMinRepGradProxDescent(n_samples=8)
    outs = {}
    for layout in ("dense", "packed"):
        q0 = avt.FullRankGaussian(jnp.zeros(d), layout=layout)
        out, infos, _ = avt.optimize(jax.random.key(9), alg, 200, target, q0)
        outs[layout] = out
    np.testing.assert_allclose(
        np.asarray(outs["dense"].tril_scale()),
        np.asarray(outs["packed"].tril_scale()),
        atol=1e-5,
    )


def test_packed_under_mesh_matches_single(key):
    """mc-axis sharding composes with the packed layout: the sharded
    gradient equals the single-device one (the packed leaf is replicated,
    only the sample axis shards)."""
    from advancedvi_jl_tpu.models.normal import normal_fullrank
    from advancedvi_jl_tpu.parallel.mesh import MC_AXIS, make_vi_mesh

    target, _, _ = normal_fullrank(jax.random.key(3), 5)
    q = avt.FullRankGaussian(jnp.zeros(5), layout="packed")

    obj_single = avt.RepGradELBO(n_samples=64, entropy=avt.STL)
    g_single, _, info_s = jax.jit(
        lambda q: obj_single.value_and_grad(q, target, key)
    )(q)

    mesh = make_vi_mesh(n_mc=8)
    obj_sharded = avt.RepGradELBO(n_samples=64, entropy=avt.STL, mc_axis=MC_AXIS)
    with jax.set_mesh(mesh):
        g_sharded, _, info_m = jax.jit(
            lambda q: obj_sharded.value_and_grad(q, target, key)
        )(q)

    for a, b in zip(
        jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_sharded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(info_s["elbo"]), np.asarray(info_m["elbo"]), rtol=1e-5
    )


def test_packed_rejections(key):
    d = 6
    qp = avt.FullRankGaussian(jnp.zeros(d), layout="packed")
    # measure-space algorithms rebuild dense factors: refuse packed
    from advancedvi_jl_tpu.algorithms.measure_space import (
        KLMinNaturalGradDescent,
    )
    from advancedvi_jl_tpu.models.normal import normal_fullrank

    target, _, _ = normal_fullrank(key, d)
    with pytest.raises(ValueError, match="packed"):
        KLMinNaturalGradDescent(stepsize=1e-3).init(
            jax.random.key(0), qp, target
        )
    # packed + tensor-parallel row sharding is contradictory
    qtp = qp.replace(tp_axis="mc")
    with pytest.raises(ValueError, match="packed"):
        qtp.tril_scale()
    # unknown layout
    with pytest.raises(ValueError, match="layout"):
        qp.replace(layout="sparse").tril_scale()
