"""Multimodal + Pandas-UDF query family (Tier B).

``q_multimodal_features`` drives the real Arrow/mapInPandas plumbing
(binary payload column -> per-batch feature extraction) with an exact
SQL oracle over the byte-level features. ``q_sim_topk_pandas_udf`` is
the vectorized-Python twin of ``q_sim_bruteforce_topk`` — same oracle,
different execution path (numpy over Arrow batches instead of JVM
higher-order functions) — proving the slow-path escape hatch gives the
same answers as the codegen path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..operators.multimodal import attach_binary, extract_features
from .similarity_queries import QUERY_MOD, TOP_K


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched byte-level features."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary(docs))


def _cosine_batch_udf():
    # pandas_udf parses its return-type DDL eagerly, which needs an
    # active SparkSession — so build the UDF at call time, not import.
    @pandas_udf("double")
    def cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        va = np.stack(a.to_numpy()).astype(np.float64)
        vb = np.stack(b.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", va, vb)
        return pd.Series(
            dots / (np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1))
        )

    return cosine_batch


def q_sim_topk_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k via a vectorized Pandas UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec"))
    cosine_batch = _cosine_batch_udf()
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_batch("cvec", "qvec").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


QUERIES = {
    "q_multimodal_features": q_multimodal_features,
    "q_sim_topk_pandas_udf": q_sim_topk_pandas_udf,
}

ORACLES = {
    "q_multimodal_features": """
SELECT doc_id,
  'text/plain' AS mime,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  CAST(CASE WHEN length(text) = 0 THEN -1
            ELSE ascii(substring(text, 1, 1)) END AS INT) AS first_byte,
  md5(text) AS content_md5
FROM documents
""",
}

# q_sim_topk_pandas_udf shares the brute-force oracle.
from .similarity_queries import ORACLES as _SIM_ORACLES  # noqa: E402

ORACLES["q_sim_topk_pandas_udf"] = _SIM_ORACLES["q_sim_bruteforce_topk"]
