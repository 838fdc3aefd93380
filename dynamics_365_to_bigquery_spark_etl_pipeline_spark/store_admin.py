"""Operational CLI for the incremental stores — status, compaction,
and drift-triggered retrain as one command::

    python -m dynamics_365_to_bigquery_spark_etl_pipeline_spark.store_admin \\
        <store_dir> [--compact] [--rebuild-if-drift] [--kmeans-iters N] \\
        [--lock-timeout S]

The reference runs its maintenance inline with the nightly job (the
argv surface at ``incremental_etl_v1.py:37-46`` is the whole ops story);
this repo's incremental stores (LSH dedup index, IVF layout store, MG
summary store) instead accrete batch dirs at streaming cadence and need
maintenance a CRON JOB can drive beside the live stream — which the
store write locks make safe (``operators/store_lock.py``): a compact
here serializes against in-flight appends instead of sweeping their
uncommitted dirs.

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
    from .operators import dedup_index, ivf_store
    from .streaming import heavy_hitters

    for kind, meta_name in (
        ("ivf", ivf_store.META_NAME),
        ("lsh", dedup_index.META_NAME),
        ("mg", heavy_hitters.META_NAME),
    ):
        if os.path.isfile(os.path.join(store_dir, meta_name)):
            return kind
    return None


def _lock_status(store_dir: str) -> dict:
    """Who holds the write lock, if anyone — the first thing an
    operator wants when a maintenance job times out."""
    lock_path = os.path.join(store_dir, store_lock.LOCK_NAME)
    try:
        with open(lock_path) as fh:
            holder = int(fh.read().strip() or "0")
    except (OSError, ValueError):
        return {"held": False}
    return {
        "held": True,
        "holder_pid": holder or None,
        "holder_alive": bool(holder) and store_lock._pid_alive(holder),
    }


def _dir_bytes(store_dir: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _d, fs in os.walk(store_dir)
        for f in fs
    )


def _ivf_status(store) -> dict:
    d = store.drift()
    return {
        "generation": store._read_meta()["generation"],
        "batches": store.committed_batches(),
        "appended_batches": len(store.appended_batches()),
        "n_vectors": d["n_vectors"],
        "build_mean_sim": d["build_mean_sim"],
        "live_mean_sim": d["live_mean_sim"],
        "degradation": d["degradation"],
        "needs_retrain": d["needs_retrain"],
        "drift_threshold": store.drift_threshold,
        "epoch_hwm": store.epoch_high_water(),
        "committed_ids": len(store.committed_ids()),
    }


def _lsh_status(idx) -> dict:
    meta = idx._read_meta()
    return {
        "batches": idx.committed_batches(),
        "bucketed_dirs": len(meta.get("buckets_n", {})),
        "epoch_hwm": idx.epoch_high_water(),
        "committed_ids": len(idx.committed_ids()),
    }


def _mg_status(store) -> dict:
    return {
        "k": store.k,
        "total_weight": store.total_weight(),
        "n_candidates": len(store.candidates()),
        "threshold": store.threshold(),
        "epoch_hwm": store.epoch_high_water(),
        "committed_ids": len(store.committed_ids()),
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=(
            "python -m "
            "dynamics_365_to_bigquery_spark_etl_pipeline_spark.store_admin"
        ),
        description=(
            "Status / compaction / drift-retrain for the incremental "
            "stores (LSH dedup index, IVF layout, MG summaries)."
        ),
    )
    p.add_argument("store_dir", help="a store directory (kind auto-detected)")
    p.add_argument(
        "--compact",
        action="store_true",
        help="fold live batch dirs into one generation (IVF / LSH; "
        "probe fan-in and file counts otherwise grow O(#batches))",
    )
    p.add_argument(
        "--rebuild-if-drift",
        action="store_true",
        help="(IVF) when the drift guard is tripped, retrain centroids "
        "from the live corpus and rebuild as a fresh generation; "
        "otherwise a no-op",
    )
    p.add_argument(
        "--kmeans-iters",
        type=int,
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
            from .streaming.heavy_hitters import MgSummaryStore

            if args.compact or args.rebuild_if_drift:
                raise ValueError(
                    "the MG store is one atomically-replaced JSON of "
                    "<= k counters — there is nothing to compact or "
                    "rebuild"
                )
            meta_k = json.load(
                open(os.path.join(args.store_dir, "_mg_store.json"))
            )["k"]
            store = MgSummaryStore(
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
                if args.compact:
                    out["compacted"] = store.compact()
                if args.rebuild_if_drift:
                    if store.drift()["needs_retrain"]:
                        from .operators import similarity as S

                        cents = store.centroids().select(
                            store.id_col, store.vec_col
                        )
                        corpus = store.vectors()
                        for _ in range(max(1, args.kmeans_iters)):
                            cents = S.refine_centroids(
                                corpus,
                                cents,
                                store.id_col,
                                store.vec_col,
                            )
                        store.rebuild(cents)
                        out["rebuilt"] = True
                    else:
                        out["rebuilt"] = False
                out.update(_ivf_status(store))
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
