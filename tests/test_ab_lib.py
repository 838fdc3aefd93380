"""Shared A/B schedule (r10 verdict #5): one untimed warm-up cycle,
then arms interleaved per cycle — the only design whose verdicts held
on the drifting host (SCALING.md run-1/run-2 contrast)."""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "spark_graft_ab_lib", os.path.join(REPO, "scripts", "ab_lib.py")
)
ab_lib = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab_lib)


def test_interleaves_arms_after_one_warmup_cycle():
    calls = []
    arms = {
        "a": lambda ctx: calls.append(("a", ctx)) or "ra",
        "b": lambda ctx: calls.append(("b", ctx)) or "rb",
    }
    setups = []

    def setup(rep):
        setups.append(rep)
        return f"ctx{rep}"

    timings, last = ab_lib.warmup_interleaved(
        arms, reps=2, setup=setup, log=None
    )
    # warm-up cycle first (rep -1, untimed), then a,b per timed cycle —
    # never a,a,...,b,b (the sequential confound)
    assert setups == [-1, 0, 1]
    assert [c[0] for c in calls] == ["a", "b", "a", "b", "a", "b"]
    assert [c[1] for c in calls] == [
        "ctx-1", "ctx-1", "ctx0", "ctx0", "ctx1", "ctx1"
    ]
    assert len(timings["a"]) == len(timings["b"]) == 2  # warm-up excluded
    assert all(w >= 0 for walls in timings.values() for w in walls)
    assert last == {"a": "ra", "b": "rb"}


def test_no_setup_and_no_warmup():
    calls = []
    timings, _ = ab_lib.warmup_interleaved(
        {"x": lambda ctx: calls.append(ctx)}, reps=3, warmup=False, log=None
    )
    assert calls == [None, None, None]
    assert len(timings["x"]) == 3
    with pytest.raises(ValueError, match="reps"):
        ab_lib.warmup_interleaved({"x": lambda c: None}, reps=0)


def test_summarize_shape():
    out = ab_lib.summarize({"arm": [2.0, 1.0, 3.0]})
    assert "min=   1.00s" in out and "median=   2.00s" in out and "max=   3.00s" in out
