"""Deduplication operators for LLM training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard (BASELINE north star; the reference
has only key-level CDC dedup, SURVEY.md A2).

Everything is built from JVM-side higher-order array functions — no
Python UDFs — and from an md5-based hash family that the DuckDB oracle
can reproduce bit-for-bit:

    h_seed(s) = int(hex(md5(seed || ':' || s))[:15], 16)

(15 hex chars = 60 bits, fits a signed 64-bit int in both engines:
Spark ``conv(substr(md5(..),1,15),16,10)``, DuckDB
``('0x' || substr(md5(..),1,15))::BIGINT``.)

Scale design:
- Shingling/signatures are per-row projections (codegen, no shuffle).
- LSH candidate generation is an explode on (band_id, band_hash) and a
  self-equi-join on that compound key: the join key space is uniform
  (md5), so the shuffle is skew-free; pairs are generated per-bucket
  instead of O(n²).
- Exact verification (true Jaccard) runs only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MINHASH = 16  # signature length
LSH_BANDS = 8   # bands of r = N_MINHASH / LSH_BANDS rows each
SHINGLE_K = 3   # tokens per shingle


def normalized_tokens(text: Column) -> Column:
    """Lowercase, collapse non-alphanumerics, split to tokens."""
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " ")), " ")


def normalized_tokens_sql(expr: str) -> str:
    return (
        f"regexp_split_to_array(TRIM(regexp_replace(LOWER({expr}),"
        f" '[^a-z0-9]+', ' ', 'g')), ' ')"
    )


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles (k consecutive tokens joined by a space).

    NB: guard the < k-token case explicitly — ``sequence(0, size-k)``
    with a negative stop generates a DESCENDING sequence in Spark, which
    then indexes out of bounds."""
    toks = normalized_tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(F.size(toks) >= k, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_from_tokens_sql(t: str, k: int = SHINGLE_K) -> str:
    """DuckDB mirror of ``shingles`` over a token-list column ``t``
    (1-indexed lists; stage tokens via ``normalized_tokens_sql`` in a CTE)."""
    parts = " || ' ' || ".join(f"{t}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(range(1, GREATEST(LEN({t}) - {k - 1}, 0) + 1),"
        f" i -> {parts}))"
    )


def portable_hash(s: Column, seed: int) -> Column:
    """60-bit deterministic hash shared with the SQL oracle."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), s)), 1, 15), 16, 10).cast(
        "long"
    )


def portable_hash_sql(expr: str, seed: int) -> str:
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


def _hasher(seed: int):
    # NB: the lambda must take exactly ONE arg — PySpark treats a
    # two-arg lambda in a higher-order function as (element, index).
    return lambda s: portable_hash(s, seed)


def minhash_signature(shingle_arr: Column, n: int = N_MINHASH) -> Column:
    """Array of n minhash values: min over shingles of h_seed.

    md5-based so the SQL oracle can reproduce it — the VERIFICATION
    path. Production uses ``minhash_signature_fast`` (xxhash64, native
    codegen, ~10x cheaper) with identical pair-finding behavior."""
    return F.array(
        *[F.array_min(F.transform(shingle_arr, _hasher(i))) for i in range(n)]
    )


def minhash_signature_fast(shingle_arr: Column, n: int = N_MINHASH) -> Column:
    """xxhash64-seeded minhash — the at-scale hash family (JVM-native,
    no string formatting). Not SQL-portable, so queries built on it are
    rows-only checked; equivalence of RESULTS (found duplicate pairs)
    with the md5 family is asserted in tests."""

    def h(seed: int):
        return lambda s: F.xxhash64(F.lit(seed), s)

    return F.array(*[F.array_min(F.transform(shingle_arr, h(i))) for i in range(n)])


def minhash_signature_sql(shingle_expr: str, n: int = N_MINHASH) -> str:
    mins = ", ".join(
        f"list_min(list_transform({shingle_expr}, s -> {portable_hash_sql('s', i)}))"
        for i in range(n)
    )
    return f"[{mins}]"


def band_keys(sig: Column, bands: int = LSH_BANDS, n: int = N_MINHASH) -> Column:
    """LSH band hashes: md5 over each band's slice of the signature."""
    r = n // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.element_at(sig, b * r + j + 1).cast("string") for j in range(r)],
                )
            )
            for b in range(bands)
        ]
    )


def band_keys_sql(sig_expr: str, bands: int = LSH_BANDS, n: int = N_MINHASH) -> str:
    r = n // bands
    parts = []
    for b in range(bands):
        concat = " || ',' || ".join(
            f"CAST({sig_expr}[{b * r + j + 1}] AS VARCHAR)" for j in range(r)
        )
        parts.append(f"md5({concat})")
    return f"[{', '.join(parts)}]"


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays, as a double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def jaccard_sql(a: str, b: str) -> str:
    inter = f"LEN(list_intersect({a}, {b}))"
    union = f"(LEN({a}) + LEN({b}) - {inter})"
    return (
        f"CASE WHEN {union} = 0 THEN 0.0 "
        f"ELSE CAST({inter} AS DOUBLE) / CAST({union} AS DOUBLE) END"
    )


def token_hashes(text: Column) -> Column:
    """Portable hash per distinct normalized token. STAGE THIS AS ITS
    OWN COLUMN before feeding ``simhash_from_hashes`` — passing the
    expression directly duplicates the hashing 32× (once per bit term);
    an attribute reference is computed once and CSE'd."""
    return F.transform(F.array_distinct(normalized_tokens(text)), _hasher(0))


def simhash_from_hashes(hashes: Column) -> Column:
    """32-bit SimHash from a staged token-hash array column: bit j is
    set iff more tokens have bit j set than clear."""

    def bit_term(j: int) -> Column:
        mask = F.lit(1 << j)
        hits = F.size(F.filter(hashes, lambda h: h.bitwiseAND(mask) != 0))
        return F.when(hits * 2 > F.size(hashes), F.lit(1 << j)).otherwise(F.lit(0))

    bits = [bit_term(j) for j in range(32)]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def simhash32(text: Column) -> Column:
    """One-shot SimHash for small inputs/tests; in query plans prefer
    staging ``token_hashes`` in a select first (see q_dedup_simhash)."""
    return simhash_from_hashes(token_hashes(text))


def token_hashes_sql(expr: str) -> str:
    """DuckDB: list of portable token hashes (stage this as a CTE column
    named e.g. ``h``, then apply ``simhash_from_hashes_sql('h')``)."""
    toks = f"list_distinct({normalized_tokens_sql(expr)})"
    return f"list_transform({toks}, t -> {portable_hash_sql('t', 0)})"


def simhash_from_hashes_sql(h: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN LEN(list_filter({h}, x -> (x & {1 << j}) != 0)) * 2 > LEN({h})"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


def exact_dedup(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Exact dedup: one hash-aggregate on the content key; keeps the
    smallest id per group and reports group size."""
    return (
        df.select(key.alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count("*").alias("n_copies"),
        )
    )
