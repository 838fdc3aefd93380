"""Self-normalizing bench artifact (r8 verdict #1).

`BENCH_r08.json` misreported a real 0.77x improvement as a 2.55x
regression because the committed artifact carried a calib block nothing
consumed. `bench.py:self_normalize` now folds the previous round's
committed artifact through `scripts/calib_compare.compare` so every
`BENCH_r{N}.json` carries its own host-adjusted adjudication. These
tests feed two synthetic bench files through that path and pin the
arithmetic.
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load(os.path.join(REPO, "bench.py"), "spark_graft_bench_module")
calib = _load(
    os.path.join(REPO, "scripts", "calib_compare.py"), "spark_graft_calib_module"
)


def _artifact(queries: dict, jvm: float, py: float) -> dict:
    return {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "reps": 3,
        "sf": 0.1,
        "calib": {
            "python_loop_2m": py,
            "jvm_range_sum_20m": jvm,
            "jvm_parallelism": 32,
        },
    }


# reference round: host jvm yardstick 0.10 s, python yardstick 0.10 s
REF = _artifact(
    {"q_jvm_steady": 1.0, "q_jvm_regressed": 1.0, "q_sim_topk_matmul": 1.0},
    jvm=0.10,
    py=0.10,
)
# new round on a 2x-slower JVM host (calib 0.20) with an UNCHANGED python
# yardstick: the steady query doubles raw (pure host), the regressed one
# quadruples raw (2x host x 2x real), the python-bound one is flat raw
# on a flat python host (no change).
NEW = _artifact(
    {"q_jvm_steady": 2.0, "q_jvm_regressed": 4.0, "q_sim_topk_matmul": 1.0},
    jvm=0.20,
    py=0.10,
)


def test_compare_divides_out_the_host_factor():
    out = calib.compare(REF, NEW)
    rows = {r["query"]: r for r in out["rows"]}
    assert out["host_factor_jvm"] == 2.0
    assert out["host_factor_python"] == 1.0
    # raw 2x on a 2x host = no regression
    assert rows["q_jvm_steady"]["raw_ratio"] == 2.0
    assert rows["q_jvm_steady"]["norm_ratio"] == 1.0
    assert not rows["q_jvm_steady"]["flag"]
    # raw 4x on a 2x host = a REAL 2x regression
    assert rows["q_jvm_regressed"]["norm_ratio"] == 2.0
    assert rows["q_jvm_regressed"]["flag"]
    # python-bound queries normalize by the python yardstick, not jvm:
    # flat raw + flat python host = 1.0, NOT 0.5
    assert rows["q_sim_topk_matmul"]["norm_ratio"] == 1.0
    assert out["flagged"] == ["q_jvm_regressed"]


def test_compare_flags_a_host_masked_regression():
    # the r8 failure mode INVERTED: a 1.5x raw ratio on a 1.0x host is a
    # real regression even though 1.5x "looks like noise" next to a 2.55x
    fast_host = _artifact({"q_jvm_steady": 1.5}, jvm=0.10, py=0.10)
    out = calib.compare(REF, fast_host)
    assert out["rows"][0]["norm_ratio"] == 1.5
    assert out["flagged"] == ["q_jvm_steady"]


def test_spread_aware_robust_flags():
    """A >1.3x-normalized median only becomes a ROBUST flag when the rep
    spreads also separate (new best, host-normalized, slower than ref
    worst) — overlapping spreads are two noise bands touching, the exact
    way the r8/r9 committed artifacts misreported medians. Without
    spreads the robust flag falls back to the median flag."""
    ref = dict(
        _artifact({"q_noisy": 1.0, "q_real": 1.0}, jvm=0.10, py=0.10),
        spread={"q_noisy": [0.8, 1.9], "q_real": [0.9, 1.1]},
    )
    new = dict(
        _artifact({"q_noisy": 1.5, "q_real": 1.5}, jvm=0.10, py=0.10),
        spread={"q_noisy": [1.2, 1.8], "q_real": [1.45, 1.6]},
    )
    out = calib.compare(ref, new)
    rows = {r["query"]: r for r in out["rows"]}
    assert rows["q_noisy"]["flag"] and not rows["q_noisy"]["robust"]
    assert rows["q_real"]["flag"] and rows["q_real"]["robust"]
    assert out["flagged"] == ["q_noisy", "q_real"]
    assert out["flagged_robust"] == ["q_real"]
    # spread-less artifacts: robust == flag
    out2 = calib.compare(REF, NEW)
    assert out2["flagged_robust"] == out2["flagged"]


def test_self_normalize_reads_latest_round_artifact(tmp_path):
    # two committed rounds on disk: normalization must pick r7, not r2
    (tmp_path / "BENCH_r2.json").write_text(
        json.dumps({"parsed": _artifact({"q_jvm_steady": 9.9}, jvm=0.10, py=0.10)})
    )
    (tmp_path / "BENCH_r7.json").write_text(json.dumps({"parsed": REF}))
    block = bench.self_normalize(NEW, str(tmp_path))
    assert block["prev_artifact"] == "BENCH_r7.json"
    assert block["host_factor_jvm"] == 2.0
    assert block["ratios"]["q_jvm_steady"] == 1.0
    assert block["ratios"]["q_jvm_regressed"] == 2.0
    assert block["total_norm_ratio"] == round((1.0 + 2.0 + 1.0) / 3.0, 2)
    assert block["flagged"] == ["q_jvm_regressed"]


def test_self_normalize_none_without_prior_or_calib(tmp_path):
    # round 1: no prior artifact at all
    assert bench.self_normalize(NEW, str(tmp_path)) is None
    # pre-r6 prior without a calib block: refuse silently, not die
    legacy = {k: v for k, v in REF.items() if k != "calib"}
    (tmp_path / "BENCH_r1.json").write_text(json.dumps(legacy))
    assert bench.self_normalize(NEW, str(tmp_path)) is None


def test_self_normalize_refuses_cross_sf_comparison(tmp_path):
    # a run at SPARK_GRAFT_SF_DIR=sf1 must not normalize against the
    # committed sf0.1 artifact — every ratio would read ~10x and flag
    (tmp_path / "BENCH_r5.json").write_text(json.dumps(REF))
    sf1_run = dict(NEW, sf=1.0)
    assert bench.self_normalize(sf1_run, str(tmp_path)) is None


def test_self_normalize_survives_a_malformed_prior(tmp_path):
    (tmp_path / "BENCH_r3.json").write_text("{not json")
    block = bench.self_normalize(NEW, str(tmp_path))
    assert "error" in block  # stub, not an exception out of bench.py


def test_latest_round_artifact_skips_uncommitted_current_round(tmp_path):
    """r9 advice: once the CURRENT round's artifact lands in the working
    tree, a bench re-run must still normalize against the previous
    round's COMMITTED artifact — not degenerate to a ~1.0
    self-comparison against its own file. Committed-only selection via
    ``git ls-files``; outside a repo every on-disk artifact counts (the
    other tests in this file rely on that fallback)."""
    import subprocess

    def git(*args):
        subprocess.run(
            ["git", "-C", str(tmp_path), *args],
            check=True,
            capture_output=True,
            env={
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
                "HOME": str(tmp_path),
                "PATH": os.environ["PATH"],
            },
        )

    git("init", "-q")
    (tmp_path / "BENCH_r7.json").write_text(json.dumps({"parsed": REF}))
    git("add", "BENCH_r7.json")
    git("commit", "-qm", "round 7 artifact")
    # the round currently being produced: on disk, NOT committed
    (tmp_path / "BENCH_r8.json").write_text(json.dumps({"parsed": NEW}))
    assert calib.latest_round_artifact(str(tmp_path)).endswith("BENCH_r7.json")
    block = bench.self_normalize(NEW, str(tmp_path))
    assert block["prev_artifact"] == "BENCH_r7.json"
    # once committed it IS the previous round's artifact — included again
    git("add", "BENCH_r8.json")
    git("commit", "-qm", "round 8 artifact")
    assert calib.latest_round_artifact(str(tmp_path)).endswith("BENCH_r8.json")


def test_nearest_host_comparison_clears_a_prev_host_noise_flag(tmp_path):
    """r9 verdict #3: the latest artifact can come from a host whose
    calib yardstick mismatches its query-time speed (within-session
    drift — SCALING.md measured 1.64x on one VM in 2.5 h). A query that
    flags against THAT artifact but is flat against the nearest-host
    round is adjudicated noise; the artifact must carry both blocks so
    the tiebreak is arithmetic, not a by-hand calib_compare run."""
    r7 = _artifact({"q_jvm_steady": 1.0}, jvm=0.10, py=0.10)
    # r8: slow host by calib (0.20) whose query-time blip ran FAST
    # (t=0.4) — normalizing against it inflates the current run 5x
    r8 = _artifact({"q_jvm_steady": 0.4}, jvm=0.20, py=0.10)
    (tmp_path / "BENCH_r7.json").write_text(json.dumps({"parsed": r7}))
    (tmp_path / "BENCH_r8.json").write_text(json.dumps({"parsed": r8}))
    cur = _artifact({"q_jvm_steady": 1.0}, jvm=0.10, py=0.10)

    prev_block = bench.self_normalize(cur, str(tmp_path))
    assert prev_block["prev_artifact"] == "BENCH_r8.json"
    assert prev_block["flagged"] == ["q_jvm_steady"]  # 5.0 vs the blip

    near_block = bench.nearest_host_normalize(cur, str(tmp_path))
    assert near_block["nearest_artifact"] == "BENCH_r7.json"
    assert near_block["ratios"]["q_jvm_steady"] == 1.0
    assert near_block["flagged"] == []


def test_nearest_host_artifact_requires_calib_and_matching_sf(tmp_path):
    # calib-less and cross-sf artifacts must never win the nearest race
    legacy = {k: v for k, v in REF.items() if k != "calib"}
    (tmp_path / "BENCH_r1.json").write_text(json.dumps(legacy))
    (tmp_path / "BENCH_r2.json").write_text(
        json.dumps(dict(_artifact({"q": 1.0}, jvm=0.10, py=0.10), sf=1.0))
    )
    assert calib.nearest_host_artifact(str(tmp_path), 0.10, 0.1) is None
    (tmp_path / "BENCH_r3.json").write_text(
        json.dumps(_artifact({"q": 1.0}, jvm=0.17, py=0.10))
    )
    got = calib.nearest_host_artifact(str(tmp_path), 0.10, 0.1)
    assert got.endswith("BENCH_r3.json")  # only sf-matched calib-bearing one


def _full_headline_result() -> dict:
    """A realistic r11-shaped result: every committed headline row plus
    the streaming row, worst-case float widths, two normalized blocks
    with full ratio maps and flags — the shape whose single-line JSON
    outgrew the driver's 2000-char tail capture in r10."""
    names = list(bench.HEADLINE) + [bench.STREAM_ROW, bench.INGEST_ROW]
    queries = {n: 12.345 for n in names}
    spread = {n: [11.111, 13.999] for n in names}
    block = {
        "prev_artifact": "BENCH_r10.json",
        "host_factor_jvm": 1.234,
        "host_factor_python": 1.345,
        "ratios": {n: 1.23 for n in names},
        "total_norm_ratio": 1.23,
        "flagged": names[:4],
        "flagged_robust": names[:2],
        "warning": (
            "reference medians identical to this run — degenerate "
            "self-comparison (uncommitted current-round artifact?)"
        ),
    }
    result = dict(
        _artifact(queries, jvm=0.1234, py=0.1234),
        spread=spread,
        normalized_vs_prev=block,
        normalized_vs_nearest_host=dict(block, nearest_artifact="BENCH_r06.json"),
    )
    return result


def test_final_line_fits_the_drivers_tail_capture():
    """r10 verdict #1: the committed artifact lost its medians when the
    printed line outgrew the driver's 2000-char tail. The slim line
    must stay under 1800 chars WITH the full headline set + streaming
    row + both normalized blocks carrying flags and a warning, and must
    still parse back to every median + each block's verdict fields."""
    result = _full_headline_result()
    line = bench.slim_final_line(result, "BENCH_detail_r11.json")
    assert len(line) < 1800, f"final line is {len(line)} chars"
    parsed = json.loads(line)
    assert parsed["queries"] == result["queries"]  # every median survives
    assert parsed["detail"] == "BENCH_detail_r11.json"
    assert "spread" not in parsed  # bulk fields live in the sidecar
    for key in ("normalized_vs_prev", "normalized_vs_nearest_host"):
        blk = parsed[key]
        assert "ratios" not in blk
        assert blk["total_norm_ratio"] == 1.23
        assert blk["flagged_robust"] == result[key]["flagged_robust"]
        assert "warning" in blk
    # a None block (round 1 / cross-sf) passes through unchanged
    r2 = dict(result, normalized_vs_prev=None)
    assert json.loads(bench.slim_final_line(r2, "d.json"))["normalized_vs_prev"] is None


def test_load_merges_detail_sidecar_spread(tmp_path):
    """r11+ committed artifacts are slim (no spread); calib_compare
    re-merges the round's committed detail sidecar so cross-round
    robust flags keep working — but only when the sidecar's medians
    match the artifact's (a different run's spreads must not leak)."""
    slim = {k: v for k, v in REF.items()}
    slim["detail"] = "BENCH_detail_r11.json"
    (tmp_path / "BENCH_r11.json").write_text(json.dumps({"parsed": slim}))
    detail = dict(REF, spread={"q_jvm_steady": [0.9, 1.1]})
    (tmp_path / "BENCH_detail_r11.json").write_text(json.dumps(detail))
    doc = calib.load(str(tmp_path / "BENCH_r11.json"))
    assert doc["spread"] == {"q_jvm_steady": [0.9, 1.1]}

    # mismatched medians (sidecar from a different run): no merge
    other = dict(
        _artifact({"q_jvm_steady": 9.9}, jvm=0.10, py=0.10),
        spread={"q_jvm_steady": [9.0, 10.0]},
    )
    (tmp_path / "BENCH_detail_r11.json").write_text(json.dumps(other))
    doc = calib.load(str(tmp_path / "BENCH_r11.json"))
    assert "spread" not in doc


def test_latest_round_artifact_skips_parsed_null(tmp_path):
    """r10's committed artifact has ``parsed: null`` (tail truncation).
    The chain must normalize against the newest round WITH data instead
    of silently dying on the defective one."""
    (tmp_path / "BENCH_r9.json").write_text(json.dumps({"parsed": REF}))
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"parsed": None, "tail": "…truncated…"})
    )
    assert calib.latest_round_artifact(str(tmp_path)).endswith("BENCH_r9.json")
    block = bench.self_normalize(NEW, str(tmp_path))
    assert block["prev_artifact"] == "BENCH_r9.json"
    assert "warning" not in block


def test_degenerate_self_comparison_carries_warning(tmp_path):
    """r10 advice: without git, a mid-round re-run can normalize against
    the current round's own on-disk artifact. Identical median maps are
    flagged with a warning key instead of reading as 'no regressions'."""
    (tmp_path / "BENCH_r8.json").write_text(json.dumps({"parsed": NEW}))
    block = bench.self_normalize(NEW, str(tmp_path))
    assert block["prev_artifact"] == "BENCH_r8.json"
    assert "self-comparison" in block["warning"]
    assert block["total_norm_ratio"] == 1.0


def _mini_git(tmp_path):
    import subprocess

    def git(*args):
        subprocess.run(
            ["git", "-C", str(tmp_path), *args],
            check=True,
            capture_output=True,
            env={
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
                "HOME": str(tmp_path),
                "PATH": os.environ["PATH"],
            },
        )

    return git


def test_next_round_number_is_committed_only(tmp_path):
    """r11 review: the sidecar must name the round being PRODUCED.
    On-disk counting named it one round ahead whenever the driver's
    uncommitted artifact was already in the tree (the exact window
    round_artifacts' committed-only filter exists for)."""
    git = _mini_git(tmp_path)
    git("init", "-q")
    (tmp_path / "BENCH_r7.json").write_text("{}")
    git("add", "BENCH_r7.json")
    git("commit", "-qm", "r7")
    assert bench.next_round_number(str(tmp_path)) == 8
    # the driver drops r8 into the working tree before the commit: a
    # bench re-run in that window still names its sidecar for round 8
    (tmp_path / "BENCH_r8.json").write_text("{}")
    assert bench.next_round_number(str(tmp_path)) == 8
    git("add", "BENCH_r8.json")
    git("commit", "-qm", "r8")
    assert bench.next_round_number(str(tmp_path)) == 9
    # outside a repo: on-disk fallback (unit-test tmp dirs). A subdir
    # of tmp_path would still resolve to the repo above, so use a
    # genuinely repo-free dir.
    import shutil
    import tempfile

    plain = tempfile.mkdtemp(prefix="bench_round_plain_")
    try:
        with open(os.path.join(plain, "BENCH_r3.json"), "w") as fh:
            fh.write("{}")
        assert bench.next_round_number(plain) == 4
    finally:
        shutil.rmtree(plain, ignore_errors=True)


def test_round_artifacts_git_failure_fallback_drops_inflight_round(tmp_path):
    """r10 advice: in a git repo whose ls-files FAILS (git missing or
    broken), the on-disk fallback must not count the max-round artifact
    — it may be the in-flight round's uncommitted file, and normalizing
    against it reintroduces the ~1.0 self-comparison. A plain dir (no
    .git) keeps counting everything: unit tests rely on that."""
    (tmp_path / ".git").mkdir()  # looks like a repo; ls-files errors
    (tmp_path / "BENCH_r7.json").write_text(json.dumps({"parsed": REF}))
    (tmp_path / "BENCH_r8.json").write_text(json.dumps({"parsed": NEW}))
    got = [n for n, _p in calib.round_artifacts(str(tmp_path))]
    assert got == [7]
    # no .git: every on-disk artifact counts
    plain = tmp_path / "plain"
    plain.mkdir()
    (plain / "BENCH_r7.json").write_text(json.dumps({"parsed": REF}))
    (plain / "BENCH_r8.json").write_text(json.dumps({"parsed": NEW}))
    assert [n for n, _p in calib.round_artifacts(str(plain))] == [7, 8]


def test_next_round_number_survives_git_failure(tmp_path):
    """r11 advice: the drop-max fallback is a REFERENCE-selection
    safeguard; inherited by round NUMBERING it names the in-flight
    round after the last committed one whenever ls-files fails before
    the driver drops the new artifact — and the detail sidecar then
    overwrites that committed round's file. Numbering must use the
    undropped on-disk max (err high, never clobber history)."""
    (tmp_path / ".git").mkdir()  # looks like a repo; ls-files errors
    (tmp_path / "BENCH_r7.json").write_text("{}")
    # numbering: undropped max 7 -> producing round 8 (NOT 7, which
    # would resolve the sidecar to the committed BENCH_detail_r7.json)
    assert bench.next_round_number(str(tmp_path)) == 8
    # reference selection keeps the protective pop in the same state
    assert [n for n, _p in calib.round_artifacts(str(tmp_path))] == []


def test_detail_sidecar_diverts_off_sf_runs(tmp_path):
    """r11: the conventional sidecar name is reserved for OFFICIAL_SF
    runs — deterministic by sf, NOT first-writer-wins, so an off-SF
    smoke run can neither clobber the official sidecar nor squat its
    name by landing first in a fresh round window."""
    assert bench.detail_sidecar_name(str(tmp_path), 0.1) == "BENCH_detail_r1.json"
    # off-sf diverts even with no sidecar on disk yet (order-independent)
    assert (
        bench.detail_sidecar_name(str(tmp_path), 0.01)
        == "BENCH_detail_r1_sf0.01.json"
    )
    (tmp_path / "BENCH_detail_r1.json").write_text(json.dumps({"sf": 0.1}))
    assert bench.detail_sidecar_name(str(tmp_path), 0.1) == "BENCH_detail_r1.json"
    assert (
        bench.detail_sidecar_name(str(tmp_path), 0.01)
        == "BENCH_detail_r1_sf0.01.json"
    )


def test_choreography_rows_compare_raw(tmp_path):
    """r15 (r14 verdict #7): a row tagged "choreography" in either
    artifact compares at its RAW ratio (host factor 1.0) — these
    stream-drain clocks are CPU-insensitive, so dividing by a JVM
    calib factor over- or under-corrects them structurally — and the
    row carries the tag so a reader knows which normalization it got.
    Untagged rows keep their CPU normalization."""
    ref = dict(
        _artifact(
            {"q_stream_x": 10.0, "q_jvm_steady": 1.0}, jvm=0.10, py=0.10
        ),
        choreography=["q_stream_x"],
    )
    # 2x-slower JVM host: the jvm row doubles raw (pure host), the
    # stream row is flat raw (choreography does not scale with CPU)
    new = dict(
        _artifact(
            {"q_stream_x": 10.5, "q_jvm_steady": 2.0}, jvm=0.20, py=0.10
        ),
        choreography=["q_stream_x"],
    )
    out = calib.compare(ref, new)
    rows = {r["query"]: r for r in out["rows"]}
    # raw 1.05 stays 1.05 — NOT divided by the 2x host factor (which
    # would have under-read it as 0.53) — and is not flagged
    assert rows["q_stream_x"]["norm_ratio"] == 1.05
    assert rows["q_stream_x"]["choreography"] is True
    assert not rows["q_stream_x"]["flag"]
    assert rows["q_jvm_steady"]["norm_ratio"] == 1.0
    assert "choreography" not in rows["q_jvm_steady"]
    # a genuine choreography regression still flags, at raw ratio
    new2 = dict(
        _artifact({"q_stream_x": 15.0}, jvm=0.20, py=0.10),
        choreography=["q_stream_x"],
    )
    out2 = calib.compare(ref, new2)
    assert out2["rows"][0]["norm_ratio"] == 1.5
    assert out2["flagged"] == ["q_stream_x"]
    # the tag is honored when only ONE side carries it (older ref)
    out3 = calib.compare(_artifact({"q_stream_x": 10.0}, jvm=0.10, py=0.10), new2)
    assert out3["rows"][0]["norm_ratio"] == 1.5


def test_bench_artifact_declares_choreography_rows():
    assert bench.STREAM_ROW in ("q_stream_ivf_append_4ep",)
    assert bench.INGEST_ROW in ("q_stream_ingest_4ep",)
