#!/usr/bin/env python
"""Deterministic scale-up generator for the driver's synthetic tables.

Replicates every table of a source scale-factor directory K times with
per-copy key shifting, producing a larger scale point with identical
value distributions, join fan-outs, and key density (keys in the
source are dense ``0..N-1``; copy ``i`` shifts each key column by
``i * span``). This preserves exactly what a benchmark needs scaled —
rows per join key, group cardinality ratios, date ranges — without
inventing a new data distribution the correctness oracles never saw.

The driver's testdata is read-only, so output goes to a local dir
(default ``/root/repo/localdata/sf<sf*K>``; ``localdata/`` is
gitignored). Usage::

    python scripts/gen_scale.py [--src /root/testdata/sf0.1] [--factor 10]
                                [--out /root/repo/localdata/sf1]

Notes on what replication means per table:

- ``lineitem``/``orders``/``customer``/``part``/``supplier``: every
  foreign key is shifted by the *referenced* table's span, so copy i
  of lineitem joins copy i of orders/part/supplier — referential
  integrity holds and per-key fan-out is unchanged.
- ``nation``/``region``: tiny dimensions stay fixed (as in TPC-H,
  where they are scale-independent); customer/supplier nationkeys are
  left unshifted so the dim join fan-out grows linearly — exactly the
  broadcast-join shape a 100 TB run would see.
- ``events``: timestamps are kept, so each window carries K× the
  events — window/sessionize cost scales in rows, not in range.
  ``user_id`` is shifted (more users, same per-user activity).
- ``documents``: a deterministic per-copy suffix is appended so the
  scaled corpus is not K exact copies of itself (which would make
  dedup trivially degenerate); token/length distributions shift by
  one trailing token.
- ``embeddings``: vectors are replicated as-is with shifted ids —
  brute-force top-k cost is corpus-linear regardless of values.

Everything is plain deterministic SQL over parquet via DuckDB — no
randomness, no wall-clock dependence; re-running overwrites the same
bytes.
"""

from __future__ import annotations

import argparse
import os
import time

import duckdb

# (table, [key columns shifted by OWN row-span], [(fk col, referenced table)])
SPEC = {
    "region": ([], []),
    "nation": ([], []),
    "customer": (["c_custkey"], []),
    "supplier": (["s_suppkey"], []),
    "part": (["p_partkey"], []),
    "orders": (["o_orderkey"], [("o_custkey", "customer")]),
    "lineitem": (
        [],
        [("l_orderkey", "orders"), ("l_partkey", "part"), ("l_suppkey", "supplier")],
    ),
    "events": (["event_id", "user_id"], []),
    "documents": (["doc_id"], []),
    "embeddings": (["vec_id"], []),
}

# Tables that stay fixed across copies (scale-independent dims).
FIXED = {"region", "nation"}


def span_of(con: duckdb.DuckDBPyConnection, src: str, table: str) -> int:
    """Key span = row count (keys are dense 0..N-1 in the source)."""
    (n,) = con.execute(f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()
    return int(n)


def generate(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    spans = {t: span_of(con, src, t) for t in SPEC}
    # events.user_id lives in its own id space (0..max), not customer's.
    (umax,) = con.execute(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()
    user_span = int(umax)

    for table, (own_keys, fks) in SPEC.items():
        dst = f"{out}/{table}.parquet"
        t0 = time.perf_counter()
        if table in FIXED:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{table}.parquet') TO '{dst}' (FORMAT parquet)"
            )
            print(f"{table}: copied fixed dim ({time.perf_counter() - t0:.1f}s)")
            continue

        cols = [
            (r[0], r[1])
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        shifted = {c: f"{c} + i * {spans[table]}" for c in own_keys}
        for fk, ref in fks:
            shifted[fk] = f"{fk} + i * {spans[ref]}"
        if table == "events":
            shifted["user_id"] = f"user_id + i * {user_span}"
        if table == "documents":
            # Vary text per copy so the scaled corpus is not K exact
            # clones (keeps dedup/fingerprint queries non-degenerate).
            shifted["text"] = "CASE WHEN i = 0 THEN text ELSE text || ' r' || i END"
            shifted["n_chars"] = (
                "CASE WHEN i = 0 THEN n_chars "
                "ELSE n_chars + 2 + length(CAST(i AS VARCHAR)) END"
            )
        select = ", ".join(
            f"CAST({shifted[c]} AS {typ}) AS {c}" if c in shifted else c
            for c, typ in cols
        )
        con.execute(
            f"""
            COPY (
              SELECT {select}
              FROM '{src}/{table}.parquet', range({factor}) t(i)
              ORDER BY i
            ) TO '{dst}' (FORMAT parquet, ROW_GROUP_SIZE 262144)
            """
        )
        (n,) = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()
        print(f"{table}: {n} rows ({time.perf_counter() - t0:.1f}s)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/localdata/sf1")
    args = ap.parse_args()
    generate(args.src, args.out, args.factor)


if __name__ == "__main__":
    main()
