"""Bounded exactly-once ledger (r10 verdict #2): epoch-shaped ids fold
into a {query_id: max_epoch} high-water map instead of a forever-growing
flat list; batch ids keep exact membership; pre-r11 metas migrate.

Pure driver-side — no Spark needed: the ledger and the MG store are the
components whose per-epoch cost the verdict flagged, and both are
exercised here at 600 epochs to pin the O(#query ids) size bound.
"""

from __future__ import annotations

import json
import os

import pytest

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import ledger
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.heavy_hitters import (
    MgSummaryStore,
)

QID = "8c1f2a3b-4d5e-6789-abcd-ef0123456789"  # realistic: hyphens inside


def test_split_epoch_shapes():
    assert ledger.split_epoch(f"{QID}-epoch-42") == (QID, 42)
    assert ledger.split_epoch("run-epoch-0") == ("run", 0)
    # NOT epoch-shaped: no suffix, non-digit epoch, bare marker
    for bid in ["b1", "base", "gen3", "x-epoch-", "x-epoch-3a", "-epoch-3"]:
        assert ledger.split_epoch(bid) is None, bid
    # greedy prefix: a query id that itself contains '-epoch-' still
    # parses to the LAST marker (epoch must be the trailing integer)
    assert ledger.split_epoch("a-epoch-3-epoch-7") == ("a-epoch-3", 7)


def test_record_and_is_committed_both_shapes():
    meta = {"committed_ids": [], "epoch_hwm": {}}
    ledger.record(meta, "b1")
    ledger.record(meta, f"{QID}-epoch-0")
    ledger.record(meta, f"{QID}-epoch-3")
    assert meta["committed_ids"] == ["b1"]
    assert meta["epoch_hwm"] == {QID: 3}
    assert ledger.is_committed(meta, "b1")
    assert not ledger.is_committed(meta, "b2")
    # monotonic: every epoch at or below the high-water mark is
    # committed (epochs commit in order; skipped ones were empty)
    for n in range(4):
        assert ledger.is_committed(meta, f"{QID}-epoch-{n}")
    assert not ledger.is_committed(meta, f"{QID}-epoch-4")
    # a different query id is a different ledger line
    assert not ledger.is_committed(meta, "other-epoch-0")
    # out-of-order record never regresses the mark
    ledger.record(meta, f"{QID}-epoch-1")
    assert meta["epoch_hwm"] == {QID: 3}
    # r11 advice: record() is idempotent on the non-epoch path too — a
    # caller that skips the is_committed pre-check must not grow the
    # exact-membership list with duplicates
    ledger.record(meta, "b1")
    ledger.record(meta, "b1")
    assert meta["committed_ids"] == ["b1"]


def test_migrate_preserves_exact_membership():
    """Migration must NOT impose monotonic semantics on historical ids
    (r11 review finding): a pre-r11 batch caller could legally commit
    'nightly-epoch-5' with no ordering meaning, so folding it into the
    high-water map would silently replay-skip a never-ingested
    'nightly-epoch-3'."""
    meta = {
        "committed_ids": ["b0", f"{QID}-epoch-0", f"{QID}-epoch-1", "gen1"],
    }
    ledger.migrate(meta)
    # nothing folded: the list keeps exact membership, hwm starts empty
    assert meta["committed_ids"] == [
        "b0", f"{QID}-epoch-0", f"{QID}-epoch-1", "gen1"
    ]
    assert meta["epoch_hwm"] == {}
    assert ledger.is_committed(meta, f"{QID}-epoch-1")  # via the list
    assert ledger.is_committed(meta, "b0")
    # the finding's scenario: a BELOW-listed, never-committed epoch id
    # must NOT read as committed after migration
    assert not ledger.is_committed(meta, f"{QID}-epoch-2")
    meta2 = ledger.migrate({"committed_ids": ["nightly-epoch-5"]})
    assert not ledger.is_committed(meta2, "nightly-epoch-3")
    # idempotent
    ledger.migrate(meta)
    assert meta["epoch_hwm"] == {}


def test_record_prunes_implied_migrated_ids():
    """Convergence: the first post-migration commit under a prefix
    folds that prefix's listed history into the mark — the list stays
    bounded without retroactive semantics."""
    meta = ledger.migrate(
        {"committed_ids": ["b0", f"{QID}-epoch-0", f"{QID}-epoch-1"]}
    )
    ledger.record(meta, f"{QID}-epoch-2")
    assert meta["committed_ids"] == ["b0"]
    assert meta["epoch_hwm"] == {QID: 2}
    for n in range(3):
        assert ledger.is_committed(meta, f"{QID}-epoch-{n}")
    # a different prefix's listed ids are untouched
    meta3 = ledger.migrate({"committed_ids": ["nightly-epoch-5"]})
    ledger.record(meta3, f"{QID}-epoch-0")
    assert meta3["committed_ids"] == ["nightly-epoch-5"]


def test_mg_store_600_epochs_meta_stays_small(tmp_path):
    """The verdict's size bound, end to end on a real store: 600
    streaming epochs must leave a meta that is O(k + #query ids) bytes,
    not O(#epochs) — and every epoch must still read as committed."""
    store = MgSummaryStore(str(tmp_path / "mg"), k=5)
    for epoch in range(600):
        store.merge_epoch([(f"item{epoch % 3}", 1)], 1, f"{QID}-epoch-{epoch}")
    assert store.total_weight() == 600
    assert store.epoch_high_water() == {QID: 599}
    assert store.committed_ids() == []  # nothing leaked into the list
    for epoch in (0, 123, 599):
        assert store.is_committed(f"{QID}-epoch-{epoch}")
    assert not store.is_committed(f"{QID}-epoch-600")
    meta_bytes = os.path.getsize(tmp_path / "mg" / "_mg_store.json")
    assert meta_bytes < 2048, f"meta grew to {meta_bytes} bytes over 600 epochs"
    # replays (below the mark) are no-ops
    w = store.total_weight()
    store.merge_epoch([("item0", 999)], 999, f"{QID}-epoch-42")
    assert store.total_weight() == w


def test_mg_store_migrates_pre_r11_meta(tmp_path):
    """A pre-r11 meta (epoch keys in the flat committed_ids list) must
    keep its replay guard through migration, and the first new commit
    persists the bounded shape."""
    p = tmp_path / "mg"
    os.makedirs(p)
    old = {
        "k": 5,
        "summary": {"hot": 7},
        "total_w": 10,
        "committed_ids": [f"{QID}-epoch-0", f"{QID}-epoch-1"],
    }
    with open(p / "_mg_store.json", "w") as fh:
        json.dump(old, fh)

    store = MgSummaryStore(str(p), k=5)
    assert store.is_committed(f"{QID}-epoch-1")
    # replay of a migrated epoch is still a no-op
    store.merge_epoch([("hot", 999)], 999, f"{QID}-epoch-0")
    assert store.total_weight() == 10 and store.candidates() == {"hot": 7}
    # a new epoch commits and the persisted meta is in the new shape
    store.merge_epoch([("hot", 1)], 1, f"{QID}-epoch-2")
    with open(p / "_mg_store.json") as fh:
        meta = json.load(fh)
    assert meta["committed_ids"] == []
    assert meta["epoch_hwm"] == {QID: 2}
    assert store.total_weight() == 11


def test_mg_store_k_mismatch_still_loud(tmp_path):
    store = MgSummaryStore(str(tmp_path / "mg"), k=5)
    store.merge_epoch([("a", 1)], 1, "b1")
    with pytest.raises(ValueError, match="was built with k="):
        MgSummaryStore(str(tmp_path / "mg"), k=7).candidates()


# -- property: the bounded ledger is a faithful compression ---------------
from hypothesis import given, settings
from hypothesis import strategies as st

# ids that exercise every shape: epoch-shaped under two prefixes
# (in-order per prefix is appended below), batch ids, and batch ids that
# LOOK epoch-adjacent but aren't (trailing non-digit)
_BATCH_IDS = st.sampled_from(["b1", "b2", "gen1", "base", "x-epoch-3a"])


@st.composite
def _commit_sequences(draw):
    """A plausible commit history: per-prefix epoch commits arrive in
    order (Spark replays only the last uncommitted epoch — the
    monotonicity the high-water map relies on), with replays allowed;
    batch-API ids arrive in any order with repeats."""
    seq = []
    counters = {"qa": -1, "qb": -1}
    for _ in range(draw(st.integers(0, 40))):
        kind = draw(st.sampled_from(["epoch", "replay", "batch"]))
        if kind == "epoch":
            qid = draw(st.sampled_from(["qa", "qb"]))
            counters[qid] += 1
            seq.append(f"{qid}-epoch-{counters[qid]}")
        elif kind == "replay" and seq:
            seq.append(draw(st.sampled_from(seq)))
        else:
            seq.append(draw(_BATCH_IDS))
    return seq


@given(_commit_sequences())
@settings(max_examples=200, deadline=None)
def test_ledger_equals_exact_set_model(seq):
    """For any in-order commit history, the bounded ledger must answer
    is_committed exactly like a naive grow-forever set — while keeping
    the list free of epoch ids (they live in the high-water map)."""
    meta = ledger.migrate({})
    model: set[str] = set()
    for bid in seq:
        assert ledger.is_committed(meta, bid) == (bid in model)
        ledger.record(meta, bid)
        model.add(bid)
        # every id committed so far still reads committed
        for seen in model:
            assert ledger.is_committed(meta, seen), seen
    # boundedness: no epoch-shaped id survives in the exact list
    assert not any(ledger.split_epoch(b) for b in meta["committed_ids"])
    # and the list holds exactly the distinct batch-API ids
    assert set(meta["committed_ids"]) == {
        b for b in model if ledger.split_epoch(b) is None
    }


@given(_commit_sequences(), st.integers(0, 5))
@settings(max_examples=100, deadline=None)
def test_ledger_migration_is_transparent(seq, split_at):
    """Committing through a pre-r11 flat list for a prefix of the
    history, migrating, then continuing through the bounded ledger must
    answer is_committed exactly like never having migrated."""
    k = min(split_at * len(seq) // 5, len(seq))
    meta = {"committed_ids": list(dict.fromkeys(seq[:k]))}  # old shape
    ledger.migrate(meta)
    model = set(seq[:k])
    for bid in seq[k:]:
        assert ledger.is_committed(meta, bid) == (bid in model)
        ledger.record(meta, bid)
        model.add(bid)
    for seen in model:
        assert ledger.is_committed(meta, seen), seen
