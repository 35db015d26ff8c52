"""Optimizer rules, averaging, and operator tests.

Mirrors the reference genre: DoWG/DoG/COCOB must halve a regression loss
(test/general/rules.jl), averaging recursions, ClipScale floor, proximal
operator optimality (test/general/proximal_location_scale_entropy.jl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.optim.rules import (
    DoGState,
    DoWGState,
    stepsize_from_opt_state,
)


@pytest.mark.parametrize(
    "make_opt", [avt.dowg, avt.dog, avt.cocob], ids=["dowg", "dog", "cocob"]
)
def test_rules_halve_regression_loss(make_opt, key):
    """Each parameter-free rule halves a linear-regression loss in 1000 steps
    (reference bar: test/general/rules.jl)."""
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (64, 8))
    w_true = jax.random.normal(k2, (8,))
    y = X @ w_true

    def loss(w):
        return 0.5 * jnp.mean(jnp.square(X @ w - y))

    opt = make_opt()
    w = jnp.zeros(8)
    state = opt.init(w)

    @jax.jit
    def step(w, state):
        g = jax.grad(loss)(w)
        updates, state = opt.update(g, state, w)
        return optax.apply_updates(w, updates), state

    l0 = float(loss(w))
    for _ in range(1000):
        w, state = step(w, state)
    assert float(loss(w)) <= l0 / 2


def test_polynomial_averaging_recursion():
    avg = avt.PolynomialAveraging(eta=8.0)
    xs = [jnp.asarray([float(t)]) for t in range(1, 6)]
    state = avg.init(xs[0])
    for x in xs[1:]:
        state = avg.apply(state, x)
    # Hand-rolled recursion: x_bar <- (1-w) x_bar + w x, w = (eta+1)/(t+eta)
    x_bar, t = np.array([1.0]), 1
    for x in xs[1:]:
        w = 9.0 / (t + 8.0)
        x_bar = (1 - w) * x_bar + w * np.asarray(x)
        t += 1
    np.testing.assert_allclose(np.asarray(avg.value(state)), x_bar, rtol=1e-6)


def test_no_averaging_returns_last():
    avg = avt.NoAveraging()
    state = avg.init(jnp.asarray([1.0]))
    state = avg.apply(state, jnp.asarray([42.0]))
    assert float(avg.value(state)[0]) == 42.0


def test_clip_scale_floor():
    """var(q') >= eps^2 after clipping (reference: test clip_scale.jl)."""
    eps = 1e-2
    op = avt.ClipScale(epsilon=eps)
    q = avt.MeanFieldGaussian(jnp.zeros(3), jnp.asarray([-1.0, 1e-9, 2.0]))
    q2 = op.apply(q, None)
    assert np.all(np.asarray(q2.var()) >= eps**2 - 1e-12)

    qf = avt.FullRankGaussian(
        jnp.zeros(3), jnp.diag(jnp.asarray([-1.0, 1e-9, 2.0]))
    )
    qf2 = op.apply(qf, None)
    assert np.all(np.diag(np.asarray(qf2.scale)) >= eps - 1e-12)

    ql = avt.LowRankGaussian(
        jnp.zeros(3), jnp.asarray([-1.0, 1e-9, 2.0]), jnp.zeros((3, 1))
    )
    ql2 = op.apply(ql, None)
    assert np.all(np.asarray(ql2.scale_diag) >= eps - 1e-12)


def test_proximal_entropy_optimality():
    """The closed-form prox solves argmin_s -log(s) + (s - sigma)^2/(2 gamma):
    first-order condition  -1/s + (s - sigma)/gamma = 0
    (reference: proximal_location_scale_entropy.jl:20-61)."""
    gamma = 0.37
    sigma = jnp.asarray([0.2, 1.0, 3.0])
    op = avt.ProximalLocationScaleEntropy()
    opt = avt.descent(gamma)
    q = avt.MeanFieldGaussian(jnp.zeros(3), sigma)
    opt_state = opt.init(q)
    q2 = op.apply(q, opt_state)
    s = np.asarray(q2.scale_diag)
    resid = -1.0 / s + (s - np.asarray(sigma)) / gamma
    np.testing.assert_allclose(resid, 0.0, atol=1e-5)


def test_stepsize_extraction(key):
    w = jnp.ones(4)
    g = 0.1 * jnp.ones(4)

    opt = avt.descent(0.05)
    st = opt.init(w)
    assert float(stepsize_from_opt_state(st)) == pytest.approx(0.05)

    for make, cls, expect in [
        (avt.dog, DoGState, lambda s: float(s.r / jnp.sqrt(s.v))),
        (avt.dowg, DoWGState, lambda s: float(s.r**2 / jnp.sqrt(s.v))),
    ]:
        opt = make()
        st = opt.init(w)
        _, st = opt.update(g, st, w)
        assert float(stepsize_from_opt_state(st)) == pytest.approx(expect(st))

    assert stepsize_from_opt_state(optax.adam(1e-3).init(w)) is None


def test_dowg_matches_manual_recursion(key):
    """DoWG state recursion parity with the reference formulas
    (rules.jl:17-34): r = max(||x - x0||, r); v += r^2 ||g||^2;
    step = -(r^2/sqrt(v)) g."""
    alpha = 1e-6
    x0 = jnp.asarray([1.0, -2.0])
    opt = avt.dowg(alpha)
    st = opt.init(x0)
    x = x0
    r = alpha * (1 + float(jnp.linalg.norm(x0)))
    v = 0.0
    for t in range(5):
        g = jnp.asarray([0.5, 0.1 * (t + 1)])
        upd, st = opt.update(g, st, x)
        r = max(float(jnp.linalg.norm(x - x0)), r)
        v = v + r * r * float(jnp.sum(g * g))
        expected = -(r * r) / np.sqrt(v) * np.asarray(g)
        np.testing.assert_allclose(np.asarray(upd), expected, rtol=1e-5)
        x = optax.apply_updates(x, upd)


def test_proximal_requires_extractable_stepsize(key):
    """Proximal entropy + an optimizer without an extractable step size
    (optax.adam) must raise (reference: proximal_location_scale_entropy.jl
    stepsize_from_optimizer_state supports Descent/DoG/DoWG only)."""
    import optax

    from advancedvi_jl_tpu.models.normal import normal_meanfield

    target, mu, L = normal_meanfield(jax.random.key(1), 3)
    q0 = avt.MeanFieldGaussian(jnp.zeros(3), jnp.ones(3))
    alg = avt.KLMinRepGradProxDescent(n_samples=4, optimizer=optax.adam(1e-3))
    with pytest.raises(ValueError, match="extractable"):
        avt.optimize(key, alg, 3, target, q0)


def test_unknown_entropy_estimator_raises(key):
    from advancedvi_jl_tpu.models.normal import normal_meanfield

    target, _, _ = normal_meanfield(jax.random.key(1), 3)
    q0 = avt.MeanFieldGaussian(jnp.zeros(3), jnp.ones(3))
    obj = avt.RepGradELBO(n_samples=2, entropy="sticky_landing")  # typo
    with pytest.raises(ValueError, match="unknown entropy"):
        obj.value_and_grad(q0, target, key)
