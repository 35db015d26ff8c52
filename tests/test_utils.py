"""Profiling-guard and misc utils tests."""

import jax
import jax.numpy as jnp
import pytest

import advancedvi_jl_tpu as avt
from advancedvi_jl_tpu.models.normal import normal_meanfield
from advancedvi_jl_tpu.utils.profiling import RetraceError, retrace_guard


def test_retrace_guard_passes_on_stable_step(key):
    target, _, _ = normal_meanfield(jax.random.key(1), 5)
    q0 = avt.MeanFieldGaussian(jnp.zeros(5), jnp.ones(5))
    alg = avt.KLMinRepGradDescent(
        entropy=avt.STL, n_samples=4, operator=avt.ClipScale()
    )
    state = alg.init(key, q0, target)
    step = jax.jit(alg.step)
    state, _ = step(state)  # warmup
    with retrace_guard(step):
        for _ in range(20):
            state, _ = step(state)


def test_retrace_guard_detects_retrace(key):
    @jax.jit
    def f(x):
        return x * 2

    f(jnp.ones(3))
    with pytest.raises(RetraceError):
        with retrace_guard(f):
            f(jnp.ones(4))  # new shape -> retrace


class TestImportanceDiagnostics:
    """PSIS Pareto k-hat: for Gaussians p=N(0,1), q=N(0,s^2) the exact GPD
    shape is k = 1 - s^2 — pins the estimator at both the reliable and
    unreliable ends (Vehtari et al. 2024 interpretation thresholds)."""

    def _logw(self, s, n=20_000, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        x = s * rng.standard_normal(n)
        return -0.5 * x**2 - (-0.5 * (x / s) ** 2 - np.log(s))

    def test_khat_matches_gaussian_theory(self):
        import numpy as np

        import advancedvi_jl_tpu as avt

        # s=0.9 -> k = 0.19 (reliable); s=0.6 -> k = 0.64; s=0.4 -> k = 0.84
        # (finite-tail fits bias slightly toward 0.5, hence the tolerances)
        for s, expect, tol in ((0.9, 0.19, 0.08), (0.6, 0.64, 0.12),
                               (0.4, 0.84, 0.15)):
            k = avt.pareto_khat(self._logw(s))
            assert abs(k - expect) < tol, (s, k, expect)
        # reliable vs unreliable ordering across the 0.7 threshold
        assert avt.pareto_khat(self._logw(0.9)) < 0.5
        assert avt.pareto_khat(self._logw(0.4)) > 0.7

    def test_khat_constant_weights(self):
        import numpy as np

        import advancedvi_jl_tpu as avt

        assert avt.pareto_khat(np.zeros(100)) == -np.inf

    def test_importance_diagnostics_end_to_end(self, key):
        import jax.numpy as jnp
        import numpy as np

        import advancedvi_jl_tpu as avt
        from advancedvi_jl_tpu.models.normal import normal_fullrank

        target, mu, L = normal_fullrank(jax.random.key(3), 4)
        # good proposal: the (near-exact) fitted family
        q_good = avt.FullRankGaussian(mu, L)
        d_good = avt.importance_diagnostics(key, q_good, target, 4096)
        assert d_good["khat"] < 0.5
        assert d_good["ess"] > 0.9
        # bad proposal: underdispersed mean-field at the wrong location
        q_bad = avt.MeanFieldGaussian(mu + 1.0, 0.2 * jnp.ones(4))
        d_bad = avt.importance_diagnostics(key, q_bad, target, 4096)
        assert d_bad["khat"] > d_good["khat"]
        assert d_bad["ess"] < 0.5

    def test_khat_validation(self):
        import numpy as np
        import pytest

        import advancedvi_jl_tpu as avt

        with pytest.raises(ValueError, match="16"):
            avt.pareto_khat(np.zeros(5))
