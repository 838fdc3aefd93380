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
from ..operators.multimodal import (
    attach_binary,
    extract_features,
    extract_features_arrow,
    make_ppm_tools,
    make_wav_tools,
    sample_frames,
)
from .similarity_queries import QUERY_MOD, TOP_K

FRAME_SIZE = 16
FRAME_STRIDE = 4


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched byte-level features."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary(docs))


def q_multimodal_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow twin of q_multimodal_features (same oracle): binary
    payloads stay in Arrow buffers instead of being boxed into pandas
    object Series."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features_arrow(attach_binary(docs))


def q_udtf_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (the Spark 4 table-function escape hatch, completing
    the §2.7 set: pandas_udf / mapInPandas / mapInArrow /
    applyInPandasWithState / udtf): per document, emit one row per
    token with its position AND absolute character offset. The running
    offset is the naturally-imperative bit — per-row state across the
    emitted rows of one input — that plain explode can't carry without
    a quadratic re-scan. The UDTF is defined in CLOSURE scope so
    cloudpickle ships it by value (workers can't import this package).
    Lateral-joined, so it fans out partition-locally with no shuffle.

    A per-row Python UDTF is a LAST RESORT, not a pattern: it pays
    row-at-a-time Python dispatch on every input row. This query exists
    precisely to exercise that escape hatch; anything expressible as
    JVM functions (explode/posexplode + aggregates) or an Arrow-batched
    pandas UDF / mapInPandas should use those instead — see
    q_token_explode for the JVM-native version of tokenization."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string, char_start int")
    class TokenSpans:
        def eval(self, text: str):
            running = 0
            for i, t in enumerate((text or "").split(" ")):
                if t:
                    yield i, t, running
                running += len(t) + 1

    spark.udtf.register("token_spans", TokenSpans)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        "SELECT doc_id, pos, tok, char_start "
        "FROM __docs_udtf, LATERAL token_spans(text)"
    )


def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary payload: every 4th 16-byte window
    with offset/size/md5 — the mapInPandas fan-out a video keyframe or
    audio-window extractor runs through, with the codec stubbed to
    deterministic byte windows. The oracle mirrors the windows with
    SQL substring+md5 (fixture text is ASCII, so byte windows == char
    windows — the same assumption q_multimodal_features' content_md5
    oracle already relies on)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(
        attach_binary(docs), frame_size=FRAME_SIZE, stride=FRAME_STRIDE
    )


WAV_SPF = 8     # samples per decoded frame window
WAV_STRIDE = 2  # keep every 2nd frame


def q_multimodal_wav_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through a REAL codec (r8 — the decoder slot run
    end to end, not stubbed): every doc gets a planted PCM16 WAV
    payload (channels/sample-rate/sample-count derived from doc_id,
    sample values a deterministic arithmetic series), and
    ``sample_frames`` decodes it with ``make_wav_tools``' RIFF parser —
    header magics validated, fmt fields read little-endian, the data
    chunk located by walking the chunk list — then windows the DECODED
    stream into 8-sample block-aligned frames.

    Because the plant is arithmetic, the DuckDB oracle reproduces the
    expected frame table (offsets/sizes through the header layout the
    parser must recover) with pure SQL — so a parser bug that misreads
    block_align or the data offset hash-mismatches. ``frame_md5`` is
    byte-level ground truth and not SQL-reproducible (DuckDB can't
    build little-endian int16 blobs); it is pinned against hashlib in
    tests/test_multimodal_wav.py instead, along with malformed-payload
    fail-loud behavior."""
    tools = make_wav_tools(samples_per_frame=WAV_SPF)
    encode, frames = tools["encode"], tools["frames"]

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                samples = [
                    ((d * 31 + i * 7) % 65536) - 32768
                    for i in range(50 + d % 40)
                ]
                rows.append(
                    (
                        d,
                        encode(samples, 8000 + 1000 * (d % 3), 1 + d % 2),
                        {"mime": "audio/wav"},
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "meta"])

    bin_df = docs.mapInPandas(
        build, "doc_id long, payload binary, meta struct<mime:string>"
    )
    return sample_frames(
        bin_df, frame_decoder=frames, stride=WAV_STRIDE
    ).select("doc_id", "frame_id", "byte_offset", "n_bytes")


PPM_RPF = 3     # image rows per decoded frame window
PPM_STRIDE = 2  # keep every 2nd frame


def q_multimodal_ppm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the IMAGE codec (r9 — the second modality
    for the decoder slot, proving it codec-generic): every doc gets a
    planted P6 PPM payload (width/height derived from doc_id, raster
    bytes a deterministic arithmetic series), and ``sample_frames``
    decodes it with ``make_ppm_tools``' PNM parser — magic validated,
    header tokens parsed through the whitespace/comment grammar, raster
    located after the single post-maxval whitespace byte — then windows
    the raster into 3-scanline frames.

    Because the plant is arithmetic, the DuckDB oracle reproduces the
    expected frame table (offsets/sizes through the header layout the
    parser must recover) with pure SQL. ``frame_md5`` is byte-level
    ground truth and pinned against hashlib in
    tests/test_multimodal_ppm.py, along with malformed-payload
    fail-loud behavior and non-canonical header layouts."""
    tools = make_ppm_tools(rows_per_frame=PPM_RPF)
    encode, frames = tools["encode"], tools["frames"]

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 3 + d % 5, 4 + d % 7
                raster = bytes(
                    (d * 31 + i * 7) % 256 for i in range(w * h * 3)
                )
                rows.append(
                    (d, encode(raster, w, h), {"mime": "image/x-portable-pixmap"})
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "meta"])

    bin_df = docs.mapInPandas(
        build, "doc_id long, payload binary, meta struct<mime:string>"
    )
    return sample_frames(
        bin_df, frame_decoder=frames, stride=PPM_STRIDE
    ).select("doc_id", "frame_id", "byte_offset", "n_bytes")


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

EXTRA_QUERIES = {
    # mapInPandas frame fan-out variant of the registered
    # q_multimodal_features (registry at the driver's 50-row cap)
    "q_multimodal_framesample": q_multimodal_framesample,
    # mapInArrow escape-hatch twin of the registered q_multimodal_features
    "q_multimodal_features_arrow": q_multimodal_features_arrow,
    # Python UDTF escape hatch (lateral table function with running state)
    "q_udtf_token_spans": q_udtf_token_spans,
    # r8: the decoder slot exercised by a REAL dependency-free codec
    # (RIFF/PCM16 parser) over planted payloads, arithmetic SQL oracle
    "q_multimodal_wav_framesample": q_multimodal_wav_framesample,
    # r9: the second modality — a P6 PPM image parser through the SAME
    # decoder slot, proving it codec-generic (r8 verdict #5)
    "q_multimodal_ppm_framesample": q_multimodal_ppm_framesample,
}

EXTRA_ORACLES = {
    "q_multimodal_features_arrow": ORACLES["q_multimodal_features"],
    "q_udtf_token_spans": """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
x AS (
  SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w
)
SELECT doc_id,
  CAST(i - 1 AS INT) AS pos,
  ws[CAST(i AS INT)] AS tok,
  CAST(COALESCE(list_sum(list_transform(ws[1:CAST(i - 1 AS INT)],
         t -> length(t))), 0) + (i - 1) AS INT) AS char_start
FROM x
WHERE ws[CAST(i AS INT)] <> ''
""",
    "q_multimodal_framesample": f"""
WITH f AS (
  SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents
),
ids AS (
  SELECT doc_id, text, nb,
    unnest(range(0, CAST(ceil(nb / {FRAME_SIZE}.0) AS BIGINT))) AS frame_id
  FROM f
)
SELECT doc_id,
  CAST(frame_id AS INT) AS frame_id,
  CAST(frame_id * {FRAME_SIZE} AS INT) AS byte_offset,
  CAST(LEAST({FRAME_SIZE}, nb - frame_id * {FRAME_SIZE}) AS INT) AS n_bytes,
  md5(substring(text, CAST(frame_id * {FRAME_SIZE} + 1 AS INT), {FRAME_SIZE}))
    AS frame_md5
FROM ids
WHERE frame_id % {FRAME_STRIDE} = 0
""",
    "q_multimodal_wav_framesample": f"""
WITH p AS (
  SELECT doc_id, 1 + doc_id % 2 AS ch, 50 + doc_id % 40 AS n FROM documents
),
f AS (
  SELECT doc_id, ch, n,
    unnest(range(0, CAST(ceil(n / {WAV_SPF}.0) AS BIGINT))) AS fid
  FROM p
)
SELECT doc_id,
  CAST(fid AS INT) AS frame_id,
  CAST(fid * {WAV_SPF} * 2 * ch AS INT) AS byte_offset,
  CAST(LEAST({WAV_SPF}, n - fid * {WAV_SPF}) * 2 * ch AS INT) AS n_bytes
FROM f
WHERE fid % {WAV_STRIDE} = 0
""",
    "q_multimodal_ppm_framesample": f"""
WITH p AS (
  SELECT doc_id, 3 + doc_id % 5 AS w, 4 + doc_id % 7 AS h FROM documents
),
f AS (
  SELECT doc_id, w, h,
    unnest(range(0, CAST(ceil(h / {PPM_RPF}.0) AS BIGINT))) AS fid
  FROM p
)
SELECT doc_id,
  CAST(fid AS INT) AS frame_id,
  CAST(fid * {PPM_RPF} * w * 3 AS INT) AS byte_offset,
  CAST(LEAST({PPM_RPF}, h - fid * {PPM_RPF}) * w * 3 AS INT) AS n_bytes
FROM f
WHERE fid % {PPM_STRIDE} = 0
""",
}
