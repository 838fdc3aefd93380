#!/usr/bin/env python
"""A/B: alternating large-star/small-star contraction vs min-label
propagation for connected components (round-8 verdict #3).

Min-label propagation converges in O(graph diameter) rounds — each
round one join + one groupBy shuffle plus a driver count — which is
fine for shallow near-dup clusters but pathological on long chains
(the min travels ONE hop per round). The star contraction converges in
O(log n) rounds. This harness plants the worst case — k disjoint
1000-link chains with the component min at the FAR end — runs both
methods, asserts identical labels, and prints rounds + wall.

Usage: python scripts/ab_star_cc.py [chain_len] [n_chains]
(defaults 1000, 4; propagate on the default would need ~1000 rounds,
so its leg runs with a reduced chain unless --full-propagate).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def chains(spark, chain_len: int, n_chains: int):
    """k disjoint chains. The component min (the chain's base id) sits
    at one END of each chain, so its label must travel chain_len hops —
    propagation's slowest case by construction. Chain c occupies ids
    [c*(L+1), c*(L+1)+L]."""
    rows = []
    for c in range(n_chains):
        base = c * (chain_len + 1)
        rows.extend((base + i, base + i + 1) for i in range(chain_len))
    return spark.createDataFrame(rows, "id_a long, id_b long")


def run(method: str, pairs, chain_len: int, n_chains: int) -> tuple:
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import dedup as D

    t0 = time.perf_counter()
    labels = {
        (r.id, r.group_id)
        for r in D.connected_components(pairs, method=method).collect()
    }
    wall = time.perf_counter() - t0
    want = {
        (c * (chain_len + 1) + i, c * (chain_len + 1))
        for c in range(n_chains)
        for i in range(chain_len + 1)
    }
    assert labels == want, f"{method}: wrong labels"
    return D.LAST_CC_ROUNDS[method], wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("chain_len", nargs="?", type=int, default=1000)
    ap.add_argument("n_chains", nargs="?", type=int, default=4)
    ap.add_argument(
        "--full-propagate",
        action="store_true",
        help="run propagate at the FULL chain length (O(len) rounds — slow)",
    )
    args = ap.parse_args()

    spark = get_spark("ab-star-cc")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = chains(spark, args.chain_len, args.n_chains)
    n_edges = args.chain_len * args.n_chains
    print(f"graph: {args.n_chains} chains x {args.chain_len} links ({n_edges} edges)")

    r, w = run("star", pairs, args.chain_len, args.n_chains)
    print(f"star:      rounds={r:>5}  wall={w:7.1f}s")

    plen = args.chain_len if args.full_propagate else min(args.chain_len, 100)
    ppairs = (
        pairs if plen == args.chain_len else chains(spark, plen, args.n_chains)
    )
    r, w = run("propagate", ppairs, plen, args.n_chains)
    extra = "" if plen == args.chain_len else f" (chain CAPPED at {plen})"
    print(f"propagate: rounds={r:>5}  wall={w:7.1f}s{extra}")
    spark.stop()


if __name__ == "__main__":
    main()
