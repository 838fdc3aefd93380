"""Operational CLI for the incremental stores — status, compaction,
and drift-triggered retrain as one command::

    python -m dynamics_365_to_bigquery_spark_etl_pipeline_spark.store_admin \\
        <store_dir> [--sweep] [--compact] [--rebuild-if-drift] \\
        [--kmeans-iters N] [--lock-timeout S]

The reference runs its maintenance inline with the nightly job (the
argv surface at ``incremental_etl_v1.py:37-46`` is the whole ops story);
this repo's incremental stores (LSH dedup index, IVF layout store, MG
summary store, BM25 retrieval index, n-gram count store) instead
accrete batch dirs at streaming cadence and need maintenance a CRON
JOB can drive beside the live stream — which the store write locks
make safe (``operators/store_lock.py``): a compact
here serializes against in-flight appends instead of sweeping their
uncommitted dirs. READERS are the one unserialized party: a query
frame built before the compact (``topk``/``past_counts`` are lazy over
a meta snapshot) can fail LOUDLY with FileNotFoundException when its
action runs after the sweep — never wrong data; re-calling re-resolves
to the new generation (see ``operators/store_base.py``).

Store kind is detected by the meta file present. With no action flags
the command prints STATUS — one JSON line with the store's live shape
(batch fan-in, ledger sizes, drift, lock holder) — so a scheduler can
gate maintenance on it (e.g. compact when ``appended_batches`` exceeds
the fold fan-in, rebuild when ``needs_retrain``). Actions report what
they did in the same line. Exit 0 on success, 1 on any error.

``--rebuild-if-drift`` (IVF only) is the loop the drift guard exists
for: when ``needs_retrain`` is set, retrain centroids from the store's
own live corpus (``--kmeans-iters`` Lloyd updates over the current
centroids — ``similarity.refine_centroids``, decimal-exact means) and
``rebuild()`` as a fresh generation; a store within threshold is left
untouched and reports ``rebuilt: false``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .operators import store_lock


def detect_kind(store_dir: str) -> str | None:
    """Which store lives at ``store_dir`` (by meta file), or None."""
    from .operators import bm25_index, dedup_index, ivf_store, ngram_store
    from .streaming import heavy_hitters

    for kind, meta_name in (
        ("ivf", ivf_store.META_NAME),
        ("lsh", dedup_index.META_NAME),
        ("mg", heavy_hitters.META_NAME),
        ("bm25", bm25_index.META_NAME),
        ("ngram", ngram_store.META_NAME),
    ):
        if os.path.isfile(os.path.join(store_dir, meta_name)):
            return kind
    return None


def _lock_status(store_dir: str) -> dict:
    """Who holds the write lock, if anyone — the first thing an
    operator wants when a maintenance job times out.

    Missing (OSError) and present-but-unreadable (garbage pid) are
    DIFFERENT answers: the unreadable case is exactly the unstealable
    empty/corrupt lock the store_lock docstring warns about on
    no-hardlink mounts — every writer is blocking on it, and a status
    line saying "no lock" would send the operator away from the one
    file they need to inspect (r11 advice)."""
    lock_path = os.path.join(store_dir, store_lock.LOCK_NAME)
    try:
        with open(lock_path) as fh:
            holder = int(fh.read().strip() or "0")
    except OSError:
        return {"held": False}
    except ValueError:
        return {"held": True, "holder_pid": None, "holder_alive": None}
    return {
        "held": True,
        "holder_pid": holder or None,
        "holder_alive": bool(holder) and store_lock._pid_alive(holder),
    }


def _orphan_dirs(store, live: list[str]) -> int:
    """DISTINCT batch ids of ``batch=*`` dirs the meta doesn't
    reference, across every data root the store declares — ONE
    definition of "orphan", the chassis's own
    (``BatchDirStore._orphan_roots``/``_orphan_names`` — the same
    enumeration ``sweep()`` acts on, so status and action can never
    disagree about the unit; r14 review). Normally zero transiently
    (a sweep reclaims them); a PERSISTENT nonzero is the disk-leak
    signal the sweep's one-shot warning (r12 verdict #7) can miss
    when nobody reads the log, surfaced here so a scheduler can alert
    on it (same best-effort discipline as ``_dir_bytes``)."""
    ids: set[str] = set()
    for root in store._orphan_roots():
        ids |= {
            n[len("batch="):] for n in store._orphan_names(root, live)
        }
    return len(ids)


def _dir_bytes(store_dir: str) -> int:
    """Best-effort store footprint: files vanishing mid-walk (a live
    writer's tmp-file os.replace, a compact's GC) are skipped — a size
    probe must never take down the status line (r11 review)."""
    total = 0
    for dp, _d, fs in os.walk(store_dir):
        for f in fs:
            try:
                total += os.path.getsize(os.path.join(dp, f))
            except OSError:
                continue
    return total


def _ivf_status(store) -> dict:
    """Every field from ONE meta snapshot: a status assembled from
    several reads beside a live writer would mix two store states —
    e.g. gen N's n_vectors next to gen N+1's batch list (r11 review).
    Same discipline in the other two status builders."""
    from .operators import ledger

    meta = store._read_meta()
    d = store.drift(meta)
    return {
        "generation": meta["generation"],
        "batches": meta["batches"],
        "appended_batches": len(store.appended_batches(meta)),
        "n_vectors": d["n_vectors"],
        "build_mean_sim": d["build_mean_sim"],
        "live_mean_sim": d["live_mean_sim"],
        "degradation": d["degradation"],
        "needs_retrain": d["needs_retrain"],
        "drift_threshold": store.drift_threshold,
        "epoch_hwm": dict(meta[ledger.HWM_KEY]),
        "committed_ids": len(meta[ledger.IDS_KEY]),
        "orphan_dirs": _orphan_dirs(store, meta["batches"]),
    }


def _lsh_status(idx) -> dict:
    from .operators import ledger

    meta = idx._read_meta()
    return {
        "batches": meta["batches"],
        "bucketed_dirs": len(meta.get("buckets_n", {})),
        "epoch_hwm": dict(meta[ledger.HWM_KEY]),
        "committed_ids": len(meta[ledger.IDS_KEY]),
        # DISTINCT orphaned batch ids across buckets/ AND shingles/ —
        # one crashed compact = one orphan, the unit every store kind
        # reports (r13 advice); enumeration shared with sweep() via
        # the chassis _orphan_roots override
        "orphan_dirs": _orphan_dirs(idx, meta["batches"]),
    }


def _ngram_status(store) -> dict:
    from .operators import ledger

    meta = store._read_meta()
    return {
        "generation": meta["generation"],
        "batches": meta["batches"],
        "appended_batches": len(store.appended_batches(meta)),
        "n_windows": meta["n_windows"],
        "epoch_hwm": dict(meta[ledger.HWM_KEY]),
        "committed_ids": len(meta[ledger.IDS_KEY]),
        "orphan_dirs": _orphan_dirs(store, meta["batches"]),
    }


def _bm25_status(idx) -> dict:
    from .operators import ledger

    meta = idx._read_meta()
    return {
        "generation": meta["generation"],
        "batches": meta["batches"],
        "appended_batches": len(idx.appended_batches(meta)),
        "n_docs": meta["n_docs"],
        "s_tokens": meta["s_tokens"],
        "score_mode": meta.get("score_mode", "int64"),
        "epoch_hwm": dict(meta[ledger.HWM_KEY]),
        "committed_ids": len(meta[ledger.IDS_KEY]),
        "orphan_dirs": _orphan_dirs(idx, meta["batches"]),
    }


def _mg_status(store) -> dict:
    from .operators import ledger

    meta = store._read()
    return {
        "k": meta["k"],
        "total_weight": meta["total_w"],
        "n_candidates": len(meta["summary"]),
        "threshold": store.threshold(meta),
        "epoch_hwm": dict(meta[ledger.HWM_KEY]),
        "committed_ids": len(meta[ledger.IDS_KEY]),
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=(
            "python -m "
            "dynamics_365_to_bigquery_spark_etl_pipeline_spark.store_admin"
        ),
        description=(
            "Status / compaction / drift-retrain for the incremental "
            "stores (LSH dedup index, IVF layout, MG summaries, "
            "BM25 retrieval index, n-gram counts)."
        ),
    )
    p.add_argument("store_dir", help="a store directory (kind auto-detected)")
    p.add_argument(
        "--compact",
        action="store_true",
        help="fold live batch dirs into one generation (IVF / LSH / BM25 "
        "/ n-gram counts; "
        "probe fan-in and file counts otherwise grow O(#batches))",
    )
    p.add_argument(
        "--sweep",
        action="store_true",
        help="reclaim orphaned batch=* dirs now, under the write lock "
        "(the dirs the status line's orphan_dirs counts — crashed "
        "appends/compacts); reports removed distinct batch ids and "
        "undeletable-dir failures",
    )
    p.add_argument(
        "--rebuild-if-drift",
        action="store_true",
        help="(IVF) when the drift guard is tripped, retrain centroids "
        "from the live corpus and rebuild as a fresh generation; "
        "otherwise a no-op",
    )
    # the repo's falsy-zero rule, ONE definition (__main__.positive_int):
    # 0 must be an ERROR, not a silent one-iteration fallback — a
    # rebuild "without retraining" is not a thing; re-pinning the same
    # centroids is what compact() is for
    from .__main__ import positive_int

    p.add_argument(
        "--kmeans-iters",
        type=positive_int,
        default=2,
        metavar="N",
        help="Lloyd updates for the retrain's centroids (default 2)",
    )
    p.add_argument(
        "--lock-timeout",
        type=float,
        default=600.0,
        metavar="S",
        help="seconds to wait for the store write lock (default 600 — "
        "a maintenance job expects to queue behind live appends)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    out: dict = {"store": args.store_dir}

    kind = detect_kind(args.store_dir)
    if kind is None:
        out.update(
            status="error",
            error="no store meta found (expected an IVF layout, LSH "
            "dedup index, or MG summary directory)",
        )
        print(json.dumps(out))
        return 1
    out["kind"] = kind
    out["lock"] = _lock_status(args.store_dir)

    try:
        if kind == "mg":
            from .streaming import heavy_hitters

            if args.compact or args.rebuild_if_drift or args.sweep:
                raise ValueError(
                    "the MG store is one atomically-replaced JSON of "
                    "<= k counters — there is nothing to compact, "
                    "sweep, or rebuild"
                )
            with open(
                os.path.join(args.store_dir, heavy_hitters.META_NAME)
            ) as fh:
                meta_k = json.load(fh)["k"]
            store = heavy_hitters.MgSummaryStore(
                args.store_dir, meta_k, lock_timeout=args.lock_timeout
            )
            out.update(_mg_status(store))
        else:
            from .session import get_spark

            spark = get_spark("store-admin")
            if kind == "ivf":
                from .operators.ivf_store import IvfLayoutStore

                store = IvfLayoutStore.open(
                    spark, args.store_dir, lock_timeout=args.lock_timeout
                )
                # rebuild decided FIRST: `--compact --rebuild-if-drift`
                # on a drift-tripped store would otherwise fold the
                # whole corpus into gen N only for the rebuild to
                # rewrite it again as gen N+1 — double the full-corpus
                # I/O at exactly the moment the store is largest (r11
                # review). A rebuild IS a fold; compact after it would
                # be a no-op anyway.
                if args.sweep:
                    out["swept"] = store.sweep()
                rebuilding = (
                    args.rebuild_if_drift
                    and store.drift()["needs_retrain"]
                )
                if args.compact and not rebuilding:
                    out["compacted"] = store.compact()
                if rebuilding:
                    from .operators import similarity as S

                    cents = store.centroids().select(
                        store.id_col, store.vec_col
                    )
                    corpus = store.vectors()
                    for _ in range(args.kmeans_iters):
                        cents = S.refine_centroids(
                            corpus,
                            cents,
                            store.id_col,
                            store.vec_col,
                        )
                    store.rebuild(cents)
                if args.rebuild_if_drift:
                    out["rebuilt"] = rebuilding
                out.update(_ivf_status(store))
            elif kind in ("bm25", "ngram"):
                from .operators.bm25_index import Bm25Index
                from .operators.ngram_store import NgramCountStore

                if args.rebuild_if_drift:
                    raise ValueError(
                        f"--rebuild-if-drift is an IVF action (the "
                        f"{kind} store has no centroids to drift)"
                    )
                cls = Bm25Index if kind == "bm25" else NgramCountStore
                idx = cls.open(
                    spark, args.store_dir, lock_timeout=args.lock_timeout
                )
                if args.sweep:
                    out["swept"] = idx.sweep()
                if args.compact:
                    out["compacted"] = idx.compact()
                out.update(
                    _bm25_status(idx) if kind == "bm25" else _ngram_status(idx)
                )
            else:
                from .operators.dedup_index import LshDedupIndex

                if args.rebuild_if_drift:
                    raise ValueError(
                        "--rebuild-if-drift is an IVF action (the LSH "
                        "index has no centroids to drift)"
                    )
                idx = LshDedupIndex(
                    spark, args.store_dir, lock_timeout=args.lock_timeout
                )
                if args.sweep:
                    out["swept"] = idx.sweep()
                if args.compact:
                    out["compacted"] = idx.compact()
                out.update(_lsh_status(idx))
    except Exception as exc:
        out.update(status="error", error=f"{type(exc).__name__}: {exc}")
        print(json.dumps(out))
        return 1

    out["status"] = "ok"
    out["bytes"] = _dir_bytes(args.store_dir)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
