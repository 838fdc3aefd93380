"""Frequent-items (heavy hitters) via mergeable Misra-Gries summaries.

The exact way to find terms above a frequency threshold is GROUP BY
term — but that shuffles EVERY distinct term, and a 100 TB corpus has
billions of rare terms that exist only to be discarded by the HAVING.
The sketch route never shuffles the tail:

1. each partition keeps a k-counter Misra-Gries summary (one pass,
   O(k) memory) — per-partition candidate terms with lower-bound
   counts;
2. the union of per-partition summaries is a GUARANTEED superset of
   every item with global frequency > N/(k+1): an item missing from
   every summary lost ≤ N_p/(k+1) decrements per partition, which sums
   to ≤ N/(k+1) total (Agarwal et al., "Mergeable Summaries", PODS'12
   — public result);
3. a second pass counts ONLY the candidates exactly (broadcast hash
   semi-join against ≤ k × #partitions terms), so the final answer is
   EXACT — the sketch just replaced the all-terms shuffle with a
   candidate-only one.

WEIGHTED streams (r9): every step generalizes verbatim with item
COUNT replaced by item WEIGHT — per-batch exact counting becomes a
groupby-sum of weights, the compress step subtracts the (k+1)-th
largest weighted counter, and the superset guarantee bounds the lost
mass by W_partition/(k+1) (the PODS'12 merge bound is already stated
over arbitrary non-negative increments). This is what lets heavy
hitters run over exact-dedup REPRESENTATIVES weighted by clone count —
identical output to the member-level stream, clone factor never
materialized (see plans/text_queries.q_text_heavy_hitters).

Python is unavoidable for step 1 (a decrement loop is per-row stateful
state no JVM expression carries), so it runs as ``mapInPandas`` over
Arrow batches with the counter dict held across batches of the
partition; steps 2-3 are pure JVM joins/aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_partition_summaries(
    items: DataFrame, col: str, k: int, weight_col: str | None = None
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k rows (item, mg_count)
    per partition; mg_count is a lower bound undercounting by at most
    W_partition/(k+1) (W = row count, or the sum of ``weight_col``)."""
    out_schema = f"{col} string, mg_count long"
    wcol = weight_col

    def run(batches):
        # closure, not module-level: cloudpickle must ship the code, a
        # worker launched from a non-repo cwd can't import the package.
        #
        # Batch-merge form of MG, not the textbook per-row decrement
        # loop: the per-row form pays O(k) Python ops per rare item
        # (every tail item decrements all k counters — measured 170 s
        # over 2.7M bigrams at sf1). Here each Arrow batch is counted
        # exactly at C speed (value_counts / groupby-sum for weighted
        # streams), merged, and the summary compressed by subtracting
        # the (k+1)-th largest count and dropping non-positives — the
        # MERGE operation of Agarwal et al. (PODS'12) with one side
        # exact, which carries the same cumulative error bound: each
        # compress removes >= (k+1)*cut total mass, so the sum of cuts
        # is <= W_partition/(k+1).
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            if wcol is None:
                batch_counts = pdf[col].dropna().value_counts().items()
            else:
                live = pdf[[col, wcol]].dropna(subset=[col])
                # integer weights ONLY (multiplicities — the dedup
                # routing's use): int() on a fractional per-batch sum
                # would truncate (a 0.9-per-batch item accumulates 0
                # forever) and silently break the candidate-superset
                # guarantee (r9 review). Fail loudly instead.
                if not pd.api.types.is_integer_dtype(live[wcol]):
                    raise TypeError(
                        f"weight_col {wcol!r} must be an integer type "
                        f"(multiplicities), got {live[wcol].dtype} — "
                        "fractional weights would truncate in the MG "
                        "merge and lose guaranteed candidates"
                    )
                batch_counts = live.groupby(col, sort=False)[wcol].sum().items()
            for item, c in batch_counts:
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - cut for i, c in counters.items() if c > cut}
        # weighted streams can carry zero/null-weight items that never
        # meet a compress: drop non-positive counters so mg_count keeps
        # its positive-lower-bound contract (unweighted value_counts is
        # always >= 1)
        counters = {i: c for i, c in counters.items() if c > 0}
        yield pd.DataFrame(
            {col: list(counters.keys()), "mg_count": list(counters.values())}
        )

    cols = [col] if wcol is None else [col, wcol]
    return items.select(*cols).mapInPandas(run, schema=out_schema)


def heavy_hitters_exact(
    items: DataFrame,
    col: str,
    phi: float,
    k: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Items with frequency > phi·W, EXACT counts, without shuffling the
    long tail: MG candidates (k = ceil(1/phi) so the superset guarantee
    W/(k+1) < phi·W holds), then an exact count of candidates only.

    Returns (item, n_occurrences) — identical to the naive
    ``GROUP BY col HAVING count > phi*N`` (how the oracle states it),
    with the shuffle carrying only candidate rows. With ``weight_col``,
    every count is the SUM of weights — the result over a
    (distinct-item, multiplicity) stream equals the result over the
    expanded stream, which is how the dedup routing consumes it."""
    import math

    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0,1), got {phi}")
    k = k or math.ceil(1.0 / phi)
    candidates = (
        mg_partition_summaries(items, col, k, weight_col).select(col).distinct()
    )
    n_of = F.count("*") if weight_col is None else F.sum(weight_col)
    counted = (
        items.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(n_of.alias("n_occurrences"))
    )
    total = items.select(n_of.alias("n")).withColumnRenamed("n", "_total_n")
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("_total_n") * phi)
        .drop("_total_n")
    )
