"""Unit tests for the in-repo perf regression gate (perf_gate.py) —
the reference analogue of Benchmark.yml's 200% alert, with the ±10%
tunnel band and apples-to-apples (metric + engine) guards."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
from perf_gate import check, latest_prior  # noqa: E402


def _write(tmp_path, n, *objs):
    (tmp_path / f"BENCH_r{n:02d}.json").write_text(
        "\n".join(json.dumps(o) for o in objs)
    )


def test_latest_prior_takes_last_concatenated_object(tmp_path):
    # driver-appended retry: the FIRST object has parsed null, the LAST
    # carries the real payload (r3 review finding: the gate used to pin
    # the first and skip the file entirely)
    _write(
        tmp_path, 3,
        {"rc": 124, "parsed": None},
        {"rc": 0, "parsed": {"metric": "m", "value": 100.0, "engine": "e"}},
    )
    got = latest_prior(str(tmp_path))
    assert got == (3, {"metric": "m", "value": 100.0, "engine": "e"})


def test_latest_prior_picks_newest_round(tmp_path):
    _write(tmp_path, 1, {"parsed": {"metric": "m", "value": 1.0}})
    _write(tmp_path, 2, {"parsed": {"metric": "m", "value": 2.0}})
    _write(tmp_path, 3, {"parsed": None})  # r3 timed out: skipped
    n, parsed = latest_prior(str(tmp_path))
    assert n == 2 and parsed["value"] == 2.0


def test_check_band_and_guards(tmp_path):
    _write(
        tmp_path, 2,
        {"parsed": {"metric": "m", "value": 100.0, "engine": "fused"}},
    )
    kw = dict(engine="fused", metric="m", repo=str(tmp_path))
    assert check(95.0, **kw)[1] is True        # inside the ±10% band
    verdict, ok = check(85.0, **kw)
    assert ok is False and "REGRESSION" in verdict
    # metric mismatch: info only, never gates
    assert check(1.0, engine="fused", metric="other", repo=str(tmp_path))[1]
    # engine mismatch: info only
    assert check(1.0, engine="general", metric="m", repo=str(tmp_path))[1]


def test_check_engineless_prior_does_not_gate_fused(tmp_path):
    # r01/r02-style artifacts predate the "engine" field (general path);
    # a fused current value must not be ratio-gated against them
    _write(tmp_path, 2, {"parsed": {"metric": "m", "value": 70_000.0}})
    verdict, ok = check(
        1_000_000.0, engine="fused_pallas_whole_loop", metric="m",
        repo=str(tmp_path),
    )
    assert ok is True and "info only" in verdict


def test_check_no_prior(tmp_path):
    verdict, ok = check(1.0, repo=str(tmp_path))
    assert ok is True and "first run" in verdict


def test_check_all_gates_both_series(tmp_path):
    """VERDICT r4 #4: the gate must actually gate — fused-vs-fused AND
    general-vs-general, each from parsed artifacts, each failable."""
    from perf_gate import check_all

    _write(
        tmp_path, 5,
        {"parsed": {"metric": "m", "value": 1000.0, "engine": "fused",
                    "general_steps_per_s": 200.0}},
    )
    base = {"metric": "m", "engine": "fused"}
    # both inside the band
    verdict, ok = check_all(
        {**base, "value": 980.0, "general_steps_per_s": 195.0},
        repo=str(tmp_path),
    )
    assert ok is True and verdict.count("pass") == 2
    # fused regression fails the conjunction
    verdict, ok = check_all(
        {**base, "value": 800.0, "general_steps_per_s": 195.0},
        repo=str(tmp_path),
    )
    assert ok is False and "REGRESSION" in verdict
    # general regression alone also fails it
    verdict, ok = check_all(
        {**base, "value": 980.0, "general_steps_per_s": 150.0},
        repo=str(tmp_path),
    )
    assert ok is False and "general: REGRESSION" in verdict
    # a failed stage 2 (null general) is info-only, never a gate failure
    verdict, ok = check_all(
        {**base, "value": 980.0, "general_steps_per_s": None},
        repo=str(tmp_path),
    )
    assert ok is True and "no current measurement" in verdict


def test_check_all_general_fallback_prior(tmp_path):
    """A prior artifact WITHOUT general_steps_per_s (r04 and earlier)
    falls back to the documented r04 stderr measurement so the general
    gate is live from the first parsed round."""
    from perf_gate import GENERAL_PRIOR_FALLBACK, check_all

    _write(
        tmp_path, 4,
        {"parsed": {"metric": "m", "value": 887_300.0, "engine": "fused"}},
    )
    prev = GENERAL_PRIOR_FALLBACK[1]
    verdict, ok = check_all(
        {"metric": "m", "engine": "fused", "value": 900_000.0,
         "general_steps_per_s": prev * 0.95},
        repo=str(tmp_path),
    )
    assert ok is True and "r4's" in verdict
    verdict, ok = check_all(
        {"metric": "m", "engine": "fused", "value": 900_000.0,
         "general_steps_per_s": prev * 0.5},
        repo=str(tmp_path),
    )
    assert ok is False and "general: REGRESSION" in verdict
