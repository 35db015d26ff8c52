"""In-repo perf regression gate (reference analogue:
/root/reference/.github/workflows/Benchmark.yml:44-57, alert at 200%).

Compares a freshly measured bench value against the most recent round
artifact ``BENCH_r{N}.json`` that actually parsed (``parsed != null``).
The TPU tunnel's run-to-run noise band is +-10% (CLAUDE.md), so the gate
fails only beyond that band AND only when the comparison is
apples-to-apples (same metric key and same engine).  A prior round with a
different engine is reported for information but does not gate.

Usage (standalone):  python perf_gate.py <value> [engine]
  exit 0 = pass / no comparable prior;  exit 1 = regression.
In-process: ``check(value, engine) -> (verdict: str, ok: bool)`` —
bench.py calls this AFTER printing its JSON line so a gate failure can
never destroy the round artifact.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

NOISE_BAND = 0.10  # documented +-10% tunnel noise (CLAUDE.md)
REPO = os.path.dirname(os.path.abspath(__file__))


def latest_prior(repo: str = REPO) -> tuple[int, dict] | None:
    """(round, parsed-dict) of the newest BENCH_r*.json with parsed data."""
    best = None
    for path in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            # driver artifacts are concatenated JSON objects; the parsed
            # payload we want is the top-level "parsed" of the LAST object
            text = f.read()
        try:
            rec = json.loads(text)
        except json.JSONDecodeError:
            # concatenated objects: parse greedily
            dec = json.JSONDecoder()
            idx, rec = 0, None
            while idx < len(text):
                try:
                    obj, end = dec.raw_decode(text, idx)
                except json.JSONDecodeError:
                    break
                rec = obj  # keep the LAST object (latest driver append)
                idx = end
                while idx < len(text) and text[idx] in " \n\t\r":
                    idx += 1
        if rec is None or rec.get("parsed") is None:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, rec["parsed"])
    return best


# BENCH_r04 measured the general path at 227.5k steps/s but recorded it in
# stderr text only (VERDICT r4 weak #1).  This seeds the general-path gate
# for the first round whose parsed artifact carries general_steps_per_s;
# later rounds compare parsed-vs-parsed.  Source: BENCH_r04.json stderr /
# BENCH_NOTES "Round 4".
GENERAL_PRIOR_FALLBACK = (4, 227_500.0)


def check_all(current: dict, repo: str = REPO) -> tuple[str, bool]:
    """Gate BOTH longitudinal series of the round artifact (VERDICT r4 #4):
    the fused headline ``value`` (same metric + engine as the prior) and
    the general-path ``general_steps_per_s``.  ``current`` is the dict
    bench.py prints as its JSON line.  Returns a two-verdict string and
    the conjunction of both gates; a missing current general measurement
    is info-only (the fused artifact must never be hostage to stage-2
    failures)."""
    prior = latest_prior(repo)   # resolved ONCE for both series
    v, ok = check(
        current["value"], current.get("engine"),
        metric=current.get("metric"), repo=repo, prior=prior,
    )
    lines = ["fused:   " + v]
    gen = current.get("general_steps_per_s")
    if gen is None:
        lines.append("general: no current measurement — info only")
    else:
        prev = rnd = None
        if prior is not None:
            rnd, parsed = prior
            prev = parsed.get("general_steps_per_s")
        if prev is None:
            rnd, prev = GENERAL_PRIOR_FALLBACK
        ratio = gen / prev
        if ratio < 1.0 - NOISE_BAND:
            lines.append(
                f"general: REGRESSION — {gen:.1f} vs r{rnd}'s {prev:.1f} "
                f"({ratio:.2f}x, band -{NOISE_BAND:.0%})"
            )
            ok = False
        else:
            lines.append(
                f"general: pass — {gen:.1f} vs r{rnd}'s {prev:.1f} "
                f"({ratio:.2f}x)"
            )
    return "\n".join(lines), ok


def check(
    value: float,
    engine: str | None = None,
    metric: str | None = None,
    repo: str = REPO,
    prior: tuple[int, dict] | None = None,
) -> tuple[str, bool]:
    if prior is None:
        prior = latest_prior(repo)
    if prior is None:
        return "perf gate: no prior parsed BENCH artifact — pass (first run)", True
    n, parsed = prior
    prev = parsed.get("value")
    prev_engine = parsed.get("engine")
    prev_metric = parsed.get("metric")
    if prev is None:
        return f"perf gate: BENCH_r{n:02d} has no value — pass", True
    ratio = value / prev
    if metric is not None and prev_metric is not None and metric != prev_metric:
        return (
            f"perf gate: prior round r{n} measured metric={prev_metric!r}, "
            f"current={metric!r} — info only: {value:.1f} vs {prev:.1f}"
        ), True
    # priors that predate the "engine" field (r01/r02) measured the general
    # path; treat a missing prior engine as a different engine unless the
    # current engine is also unknown.
    if engine is not None and engine != (prev_engine or "general_scan_path"):
        return (
            f"perf gate: prior round r{n} used engine="
            f"{prev_engine or 'general_scan_path'!r}, current ={engine!r} — "
            f"info only: {value:.1f} vs {prev:.1f} ({ratio:.2f}x)"
        ), True
    if ratio < 1.0 - NOISE_BAND:
        return (
            f"perf gate: REGRESSION — {value:.1f} vs r{n}'s {prev:.1f} "
            f"({ratio:.2f}x, band -{NOISE_BAND:.0%})"
        ), False
    return (
        f"perf gate: pass — {value:.1f} vs r{n}'s {prev:.1f} ({ratio:.2f}x)"
    ), True


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    verdict, ok = check(float(sys.argv[1]), sys.argv[2] if len(sys.argv) > 2 else None)
    print(verdict)
    sys.exit(0 if ok else 1)
