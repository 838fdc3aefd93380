"""Similarity search over embedding columns (Tier B, BASELINE north
star): brute-force cosine top-k as the exactness baseline, and an
IVF-style bucketed variant as the 100 TB scale path.

Cosine is computed JVM-side with higher-order array functions
(``zip_with`` + ``aggregate``) in double precision — no Python UDF, no
Arrow transfer, stays in whole-stage codegen.

Scale design:
- Brute force is a broadcast of the (small) query set against the fully
  partitioned corpus — embarrassingly parallel, no shuffle except the
  final per-query top-k (one window on query_id).
- IVF: centroids are a deterministic subsample; every vector gets a
  nearest-centroid bucket id in one broadcast pass. A query probes only
  its ``nprobe`` nearest buckets — at scale the corpus is partitioned
  by bucket id, so probing prunes partitions instead of scanning.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    """DuckDB mirror: element products summed in list order (doubles)."""
    return (
        f"list_aggregate(list_transform(range(1, LEN({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window top-k.

    Returns (query_id, neighbor_id, rank); the float score is kept out
    of the comparable output (rank is order-robust, scores are FP)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("cvec"), F.col("qvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def grid_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    k_dims: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (cosine >= ``threshold``) WITHOUT an
    all-pairs cross join: grid-bucketed candidate generation with
    guaranteed recall.

    For unit vectors, cos(u,v) >= t implies ||u-v|| <= sqrt(2(1-t)) = g,
    so every coordinate of u-v is bounded by g. Quantizing the first
    ``k_dims`` NORMALIZED coordinates to cells of size g therefore puts
    any true pair within +-1 cell per dimension. Side A keeps its own
    cell key; side B explodes to its 3^k neighbor cells; the equi-join
    on the cell key yields a candidate superset of all true pairs
    (recall = 1 by construction — this is geometric bucketing, not
    probabilistic LSH), and exact cosine prunes false candidates.

    Scale: candidate generation is one 3^k-way explode of (id, cell)
    keys (no vector payload) + one skew-tolerant shuffle on the cell
    key; vectors are joined back for the exact-cosine verify on
    candidates only — the same pairs-then-verify shape as the MinHash
    banding. Raise ``k_dims`` for denser corpora (candidate count per
    cell drops geometrically).
    """
    g = math.sqrt(2.0 * (1.0 - threshold))
    vec = F.col(vec_col)
    nrm = norm(vec)
    cell_cols = [
        F.floor(F.element_at(vec, i + 1).cast("double") / nrm / F.lit(g))
        .cast("int")
        .alias(f"c{i}")
        for i in range(k_dims)
    ]
    keyed = corpus.select(F.col(id_col).alias("id"), *cell_cols)
    a = keyed.select(F.col("id").alias("id_a"), *[f"c{i}" for i in range(k_dims)])
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    *[
                        (F.col(f"c{i}") + F.lit(off[i])).alias(f"p{i}")
                        for i in range(k_dims)
                    ]
                )
                for off in itertools.product((-1, 0, 1), repeat=k_dims)
            ]
        )
    )
    b = keyed.select(F.col("id").alias("id_b"), probes.alias("p")).select(
        "id_b", *[F.col(f"p.p{i}").alias(f"c{i}") for i in range(k_dims)]
    )
    # A pair (a < b) matches exactly once: b's 3^k probe cells are
    # distinct and exactly one equals a's home cell — no distinct needed.
    pairs = a.join(b, [f"c{i}" for i in range(k_dims)]).filter(
        F.col("id_a") < F.col("id_b")
    ).select("id_a", "id_b")
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cosine(F.col("va"), F.col("vb")) >= threshold)
        .select("id_a", "id_b")
    )


def assign_ivf_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (broadcast
    pass; at scale, write the result partitioned by bucket)."""
    from pyspark.sql import Window

    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.crossJoin(F.broadcast(cent)).select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(F.col(vec_col), F.col("cent_vec")).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("bucket_id"))
    )
