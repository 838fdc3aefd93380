#!/usr/bin/env python
"""Calib-normalized cross-round bench comparison (round-7 verdict #4).

Absolute timings drift between rounds because the sandbox host changes
(measured 2x on identical code). ``bench.py`` emits a ``calib`` block —
fixed micro-workloads measuring host speed — so cross-round deltas can
be DIVIDED by host speed instead of hand-waved.

Usage:
    python scripts/calib_compare.py BENCH_r06.json BENCH_r07.json

Accepts either the driver's wrapper format ({"parsed": {...}}) or
bench.py's raw one-line JSON. Normalization: each new-round timing is
divided by the host factor h = calib_new/calib_ref of the yardstick
matching the query's bound resource (the JVM codegen sum for everything
except the Python/Arrow-kernel queries, which use the pure-Python
loop). A NORMALIZED ratio > FLAG_RATIO is a real regression — the host
excuse is retired by arithmetic; raw ratios are printed beside it so
environment swings stay visible.
"""

from __future__ import annotations

import json
import sys

FLAG_RATIO = 1.3
# queries whose hot loop is Python/numpy (Arrow batches), not JVM codegen
PYTHON_BOUND = {"q_sim_topk_matmul", "q_sim_ivf_layout_topk", "q_multimodal_features"}


def load(path: str) -> dict:
    """Parsed bench document from either format. Tolerates the driver's
    ``parsed: null`` (r10's artifact lost its medians to tail-capture
    truncation — callers see a block with no ``queries``/``calib`` and
    skip it). For a SLIM artifact (r11+: the printed line drops the rep
    spreads to stay under the tail capture), the committed sidecar it
    names in ``detail`` — or the conventional ``BENCH_detail_r{N}.json``
    beside it — is re-merged for its ``spread`` block, but only when the
    sidecar's medians are identical to the artifact's (a sidecar from a
    DIFFERENT run of the same round must not lend its spreads)."""
    import os
    import re

    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed") or doc
    if "spread" in parsed or "queries" not in parsed:
        return parsed
    name = os.path.basename(path)
    m = re.fullmatch(r"BENCH_r(\d+)\.json", name)
    candidates = [parsed.get("detail")] if parsed.get("detail") else []
    if m:
        candidates.append(f"BENCH_detail_r{m.group(1)}.json")
    for cand in candidates:
        detail_path = os.path.join(os.path.dirname(path) or ".", cand)
        try:
            with open(detail_path) as f:
                detail = json.load(f)
        except (OSError, ValueError):
            continue
        if detail.get("queries") == parsed["queries"] and "spread" in detail:
            return {**parsed, "spread": detail["spread"]}
    return parsed


def round_artifacts(
    repo_dir: str, drop_unverifiable_max: bool = True
) -> list[tuple[int, str]]:
    """``(round, path)`` for every COMMITTED ``BENCH_r{N}.json`` in
    ``repo_dir``, ascending by round.

    Committed-only (``git ls-files``) because the round currently being
    produced drops its artifact into the working tree BEFORE the
    close-out commit: a bench re-run in that window would otherwise
    normalize against the current round's own file and degenerate to a
    ~1.0 self-comparison (r9 advice). Outside a git repo (unit tests
    feed tmp dirs) every on-disk artifact counts — but when we ARE in a
    git repo and ``ls-files`` itself failed (git binary missing), the
    on-disk fallback drops the single highest-numbered artifact: it may
    be the in-flight round's uncommitted file, and counting it would
    quietly reintroduce the self-comparison the committed-only filter
    exists to prevent (r10 advice).

    ``drop_unverifiable_max=False`` disables that fallback pop. The pop
    is a REFERENCE-selection safeguard only: for round NUMBERING
    (``bench.next_round_number``) it inverts the risk — when ls-files
    fails BEFORE the in-flight artifact hits the tree, popping the max
    names the current round after the LAST COMMITTED one, and the
    detail sidecar overwrites that committed round's file (r11 advice).
    Numbering one round too HIGH (in-flight artifact already on disk,
    no git) merely degrades that run's robust flags to median-only;
    numbering too LOW destroys committed history — so numbering takes
    the undropped max.
    """
    import glob
    import os
    import re
    import subprocess

    tracked: set[str] | None = None
    try:
        out = subprocess.run(
            ["git", "-C", repo_dir, "ls-files", "--", "BENCH_r*.json"],
            capture_output=True,
            text=True,
            timeout=10,
        )
        if out.returncode == 0:
            tracked = {ln.strip() for ln in out.stdout.splitlines() if ln.strip()}
    except (OSError, subprocess.SubprocessError):
        tracked = None

    found = []
    for path in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        name = os.path.basename(path)
        m = re.fullmatch(r"BENCH_r(\d+)\.json", name)
        if not m:
            continue
        if tracked is not None and name not in tracked:
            continue
        found.append((int(m.group(1)), path))
    found.sort()
    if (
        drop_unverifiable_max
        and tracked is None
        and found
        and os.path.isdir(os.path.join(repo_dir, ".git"))
    ):
        # git repo but ls-files failed: the max-round on-disk artifact
        # may be the in-flight round's (docstring) — drop it
        found.pop()
    return found


def latest_round_artifact(repo_dir: str) -> str | None:
    """Path of the highest-numbered COMMITTED ``BENCH_r{N}.json`` that
    is actually USABLE as a comparison reference (has medians + calib —
    r10's artifact has ``parsed: null``, and normalizing against it
    would silently break the cross-round chain; skip to the newest
    round that carries data).

    Used by ``bench.py`` to self-normalize each round's artifact against
    the previous round's committed one (round-8 verdict #1). Returns
    None when no usable prior artifact exists (round 1).
    """
    for _n, path in reversed(round_artifacts(repo_dir)):
        try:
            doc = load(path)
        except (OSError, ValueError):
            # malformed file: return it anyway — the caller's error
            # stub SURFACES the defect (pinned behavior); silently
            # skipping would hide a corrupted latest artifact
            return path
        if doc.get("queries") and doc.get("calib"):
            return path
    return None


def nearest_host_artifact(
    repo_dir: str, jvm_calib: float, sf: float | None
) -> str | None:
    """Committed artifact whose JVM calib yardstick is CLOSEST (by log
    ratio) to ``jvm_calib``, among artifacts at the same scale factor.

    The sandbox host changes speed between rounds (and within one): the
    latest artifact is the right *progress* reference but can be the
    wrong *noise* reference — r9's flags vs the slow r8 host were
    retired by a MANUAL comparison against r7, the nearest-host round
    (SCALING.md). This automates that tiebreak so the bench artifact
    carries both comparisons itself (r9 verdict #3).
    """
    import math

    best, best_path = None, None
    for _n, path in round_artifacts(repo_dir):
        try:
            doc = load(path)
        except (OSError, ValueError):
            continue
        cal = doc.get("calib") or {}
        jvm = cal.get("jvm_range_sum_20m")
        if not jvm or doc.get("sf") != sf:
            continue
        d = abs(math.log(jvm_calib / jvm))
        if best is None or d < best:
            best, best_path = d, path
    return best_path


def compare(ref: dict, new: dict) -> dict:
    cal_ref, cal_new = ref.get("calib"), new.get("calib")
    if not cal_ref or not cal_new:
        raise SystemExit(
            "calib block missing in one input (pre-r6 rounds have none) — "
            "normalized comparison needs both; raw ratios only would "
            "re-open the host-drift caveat this tool exists to close"
        )
    h_jvm = cal_new["jvm_range_sum_20m"] / cal_ref["jvm_range_sum_20m"]
    h_py = cal_new["python_loop_2m"] / cal_ref["python_loop_2m"]
    sp_ref, sp_new = ref.get("spread", {}), new.get("spread", {})
    # choreography rows (r15, r14 verdict #7): stream-drain clocks
    # dominated by fixed trigger/lock/two-phase-commit choreography —
    # SCALING.md documents them holding flat across a 3.8x CPU-calib
    # swing, so dividing by a host CPU factor over- or under-corrects
    # them structurally. They compare at their RAW ratio (host factor
    # 1.0 — the honest normalization for a CPU-insensitive clock) and
    # carry a "choreography": true marker in their row.
    choreo = set(ref.get("choreography", []) or []) | set(
        new.get("choreography", []) or []
    )
    rows = []
    total_norm_new = 0.0
    for name, t_ref in ref["queries"].items():
        t_new = new["queries"].get(name)
        if t_new is None:
            continue
        if name in choreo:
            h = 1.0
        elif name in PYTHON_BOUND:
            h = h_py
        else:
            h = h_jvm
        raw = t_new / t_ref
        norm = (t_new / h) / t_ref
        total_norm_new += t_new / h
        flag = norm > FLAG_RATIO
        # spread-aware robust flag (r9): both artifacts carry per-query
        # [min, max] over reps. A REAL regression means even the new
        # run's BEST rep (host-normalized) is slower than the ref run's
        # WORST rep — a median that flags while the spreads overlap is
        # the two runs' noise bands touching, which the r8/r9 artifacts
        # showed medians alone misreport. Falls back to the median flag
        # when either spread is absent.
        robust = flag
        if name in sp_ref and name in sp_new:
            robust = flag and (min(sp_new[name]) / h) > max(sp_ref[name])
        row = {
            "query": name,
            "t_ref": t_ref,
            "t_new": t_new,
            "raw_ratio": round(raw, 2),
            "norm_ratio": round(norm, 2),
            "flag": flag,
            "robust": robust,
        }
        if name in choreo:
            row["choreography"] = True
        rows.append(row)
    total_ref = sum(r["t_ref"] for r in rows)
    total_new = sum(r["t_new"] for r in rows)
    return {
        "host_factor_jvm": round(h_jvm, 3),
        "host_factor_python": round(h_py, 3),
        "rows": rows,
        "total_ref": round(total_ref, 3),
        "total_new": round(total_new, 3),
        "total_raw_ratio": round(total_new / total_ref, 2),
        # each query normalized by ITS OWN yardstick, then summed — a
        # single-factor total would misnormalize the python-bound rows
        "total_norm_ratio": round(total_norm_new / total_ref, 2),
        "flagged": [r["query"] for r in rows if r["flag"]],
        # the subset whose spreads ALSO separate — "explain me" vs
        # "this one is load-bearing"
        "flagged_robust": [r["query"] for r in rows if r["robust"]],
    }


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    out = compare(load(sys.argv[1]), load(sys.argv[2]))
    print(
        f"host speed factor (new/ref): jvm {out['host_factor_jvm']}x, "
        f"python {out['host_factor_python']}x"
    )
    print(f"{'query':<28}{'t_ref':>8}{'t_new':>8}{'raw':>7}{'norm':>7}  flag")
    for r in out["rows"]:
        verdict = ""
        if r["robust"]:
            verdict = "REGRESSION"
        elif r["flag"]:
            verdict = "flag (spreads overlap — explain, likely noise)"
        print(
            f"{r['query']:<28}{r['t_ref']:>8.3f}{r['t_new']:>8.3f}"
            f"{r['raw_ratio']:>7.2f}{r['norm_ratio']:>7.2f}  {verdict}"
        )
    print(
        f"{'TOTAL':<28}{out['total_ref']:>8.3f}{out['total_new']:>8.3f}"
        f"{out['total_raw_ratio']:>7.2f}{out['total_norm_ratio']:>7.2f}"
    )
    print("flagged:", out["flagged"] or "none (normalized ratios all <= 1.3)")
    print(
        "flagged_robust (spreads separate — chase these):",
        out["flagged_robust"] or "none",
    )


if __name__ == "__main__":
    main()
