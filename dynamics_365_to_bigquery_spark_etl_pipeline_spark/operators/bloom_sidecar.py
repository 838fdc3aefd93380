"""Per-bucket Bloom sidecars for the batch-dir stores (r14, r13
verdict #2): a small membership summary written beside each batch
dir's bucket files so a BULK probe — a vocabulary too large for the
inline ``IN`` pushdown — can drop the values that are provably absent
from the store BEFORE any scan is planned.

Why this is exact: a Bloom filter has NO false negatives, so a probe
value that misses every live dir's bloom cannot exist in the store —
dropping it changes nothing the caller can observe (``probe_counts``
returns no row for absent grams either way). False positives only
cost reads: survivors fall through to the exact scan + join. The
common bulk shape — a backfill batch whose windows are mostly NEW —
shrinks from the full batch vocabulary to (true duplicates + ~fpp of
the vocabulary), which is small enough to ride the existing
partition-pruned inline tier. That turns the probe's bulk floor from
corpus-shaped (scan every selected bucket) into survivor-shaped.

Scale envelope, stated: bloom bits are ~13 per stored value at the
~0.2% target fpp, so a store of V values carries ~1.6 MB of sidecar
per 1e6 values. Probes broadcast every live dir's sidecar; past
``MAX_BLOOM_BITS`` per bucket the bloom saturates instead of growing
(fpp degrades, survivors grow, and the probe gracefully falls back to
the exact-scan floor when survivors exceed its budget — never wrong).
Probing is a vectorized Arrow pass over the probe frame (the
documented pandas escape hatch; the input is delta-sized).

Hashing is ``pandas.util.hash_array`` (SipHash-based, keyed,
version-stable) with two fixed 16-byte keys and double hashing
h1 + i*h2 — the SAME closures build and probe, so a false negative is
impossible within one environment by construction. Across
environments the coupling is GUARDED, not assumed (r14 verdict #1):
``save_sidecar`` records the h1/h2 of a fixed sentinel vocabulary
computed by the build-side hasher, and ``load_sidecar`` recomputes
them with the probe-side hasher — any divergence (e.g. a pandas
upgrade that changes object-array hashing) fails the canary and the
load returns None, so the probe degrades to the EXACT scan floor
instead of silently reading present grams as absent.

Everything an executor runs ships as CLOSURES from
``make_bloom_tools()`` — the repo's worker-shipping rule (see
``multimodal.make_wav_tools``): cloudpickle sends module-level
functions by reference, and a bare session driven from a non-repo cwd
cannot import this package on its workers.
"""

from __future__ import annotations

import os

import numpy as np

# fpp ~0.2% at 13 bits/value with k=9 probes
BITS_PER_VALUE = 13
K_HASHES = 9
# per-bucket cap: past this the bloom saturates instead of growing
# (graceful fpp degradation, never wrong) — 1 MiB of bits per bucket
# covers ~645k values per bucket at the target fpp
MAX_BLOOM_BITS = 1 << 23
SIDECAR_NAME = "_gram_blooms.npz"
SIDECAR_VERSION = 1

# Canary vocabulary for the build/probe hash self-check: fixed values
# chosen to exercise the hash paths a pandas upgrade could plausibly
# change independently (ascii, empty string, non-ascii unicode, a
# long string, an embedded NUL). The sidecar stores these values'
# h1/h2 as computed AT BUILD TIME; load recomputes and compares.
CANARY_VALUES = (
    "sparkgraft-bloom-canary",
    "",
    "κανάρι-金丝雀-канарейка",
    "x" * 257,
    "nul\x00byte",
)


def make_bloom_tools():
    """Closure bundle: ``bits_for(n) -> m``, ``build(values, m) ->
    uint64 words``, ``contains(words, values) -> bool array`` (True =
    maybe present, False = DEFINITELY absent)."""
    bits_per_value, k_hashes, max_bits = (
        BITS_PER_VALUE,
        K_HASHES,
        MAX_BLOOM_BITS,
    )
    key1, key2 = "sparkgraftbloomA", "sparkgraftbloomB"

    def _hashes(values):
        import numpy as _np
        import pandas as _pd

        obj = _np.asarray(values, dtype=object)
        return (
            _pd.util.hash_array(obj, hash_key=key1, categorize=False),
            _pd.util.hash_array(obj, hash_key=key2, categorize=False),
        )

    def bits_for(n_values: int) -> int:
        m = max(64, ((n_values * bits_per_value + 63) // 64) * 64)
        return min(m, max_bits)

    def build(values, m: int):
        import numpy as _np

        words = _np.zeros(m // 64, dtype=_np.uint64)
        if len(values) == 0:
            return words
        h1, h2 = _hashes(values)
        for i in range(k_hashes):
            pos = (h1 + _np.uint64(i) * h2) % _np.uint64(m)
            _np.bitwise_or.at(
                words,
                (pos // _np.uint64(64)).astype(_np.int64),
                _np.uint64(1) << (pos % _np.uint64(64)),
            )
        return words

    def contains_hashed(words, h1, h2):
        """Membership test from PRE-COMPUTED hashes — a caller testing
        the same values against SEVERAL blooms (one per live dir)
        hashes once and reuses (r14 review: re-hashing per dir
        multiplied the vectorized-probe CPU by the dir count)."""
        import numpy as _np

        m = _np.uint64(len(words) * 64)
        hit = _np.ones(len(h1), dtype=bool)
        for i in range(k_hashes):
            pos = (h1 + _np.uint64(i) * h2) % m
            bit = (
                words[(pos // _np.uint64(64)).astype(_np.int64)]
                >> (pos % _np.uint64(64))
            ) & _np.uint64(1)
            hit &= bit.astype(bool)
        return hit

    def contains(words, values):
        import numpy as _np

        if len(values) == 0:
            return _np.zeros(0, dtype=bool)
        return contains_hashed(words, *_hashes(values))

    return {
        "bits_for": bits_for,
        "build": build,
        "contains": contains,
        "hashes": _hashes,
        "contains_hashed": contains_hashed,
    }


def _driver_canary() -> tuple[np.ndarray, np.ndarray]:
    return make_bloom_tools()["hashes"](
        np.array(CANARY_VALUES, dtype=object)
    )


def executor_canary(spark) -> tuple[np.ndarray, np.ndarray]:
    """The canary hashes as computed ON AN EXECUTOR'S Python worker —
    the environment that actually builds (``build_dir_blooms``'
    ``mapInPandas``) and probes (the survivor pass) the blooms. The
    driver's pandas can differ from the executors' (split images,
    partial upgrades), so a driver-computed canary would validate the
    wrong process (r15 review of the r14-verdict fix). One 1-task job,
    memoized per SparkSession. Residual assumption, stated: executors
    are homogeneous (one image) — the job samples one of them."""
    cached = getattr(spark, "_sparkgraft_bloom_canary", None)
    if cached is not None:
        return cached
    tools = make_bloom_tools()
    vals = CANARY_VALUES

    def one(_it):
        import numpy as _np

        h1, h2 = tools["hashes"](_np.array(vals, dtype=object))
        yield (h1.tobytes(), h2.tobytes())

    row = (
        spark.sparkContext.parallelize([0], 1).mapPartitions(one).collect()
    )[0]
    out = (
        np.frombuffer(row[0], dtype=np.uint64),
        np.frombuffer(row[1], dtype=np.uint64),
    )
    spark._sparkgraft_bloom_canary = out
    return out


def save_sidecar(
    batch_dir: str,
    blooms: dict[int, np.ndarray],
    canary: tuple[np.ndarray, np.ndarray] | None = None,
) -> None:
    """Persist per-bucket blooms inside ``batch_dir`` (underscore name
    — parquet readers ignore it). Atomic rename so a crash mid-write
    leaves no half sidecar (the dir is rewritten whole on retry
    anyway, but the probe must never load garbage). ``canary`` should
    be ``executor_canary(spark)`` when the blooms were built by
    executors (the production path) — it records the hash behavior of
    the processes that SET the bits; defaults to the driver's own
    hashes for driver-built blooms (unit tests)."""
    path = os.path.join(batch_dir, SIDECAR_NAME)
    tmp = path + ".tmp.npz"
    h1, h2 = canary if canary is not None else _driver_canary()
    np.savez(
        tmp,
        __version__=np.int64(SIDECAR_VERSION),
        __k__=np.int64(K_HASHES),
        __canary_h1__=h1,
        __canary_h2__=h2,
        **{f"b{b}": bits for b, bits in blooms.items()},
    )
    os.replace(tmp, path)


def load_sidecar(
    batch_dir: str,
    expected_canary: tuple[np.ndarray, np.ndarray] | None = None,
) -> dict[int, np.ndarray] | None:
    """Per-bucket blooms for one batch dir, or None when the dir
    predates sidecars (legacy store — the probe then keeps its exact
    floor), was written under different bloom parameters, or FAILS THE
    HASH CANARY: the sidecar's recorded h1/h2 of ``CANARY_VALUES``
    must bit-match ``expected_canary`` — the hashes of the environment
    that will PROBE the bits (pass ``executor_canary(spark)`` when the
    probe runs on executors, the production path; defaults to this
    driver process's hashes). A mismatch means the build-time and
    probe-time ``pandas.util.hash_array`` disagree (environment
    drift), under which the bloom's no-false-negative guarantee is
    void — returning None keeps ``probe_counts`` exact (fallback scan)
    instead of silently wrong (r14 verdict #1 / ADVICE)."""
    path = os.path.join(batch_dir, SIDECAR_NAME)
    if not os.path.isfile(path):
        return None
    with np.load(path) as z:
        if (
            int(z["__version__"]) != SIDECAR_VERSION
            or int(z["__k__"]) != K_HASHES
        ):
            return None
        if "__canary_h1__" not in z.files or "__canary_h2__" not in z.files:
            # pre-canary sidecar: its hash provenance is unknowable,
            # so treat it like a legacy dir (exact floor) rather than
            # trusting it
            return None
        h1, h2 = (
            expected_canary
            if expected_canary is not None
            else _driver_canary()
        )
        if not (
            np.array_equal(z["__canary_h1__"], h1)
            and np.array_equal(z["__canary_h2__"], h2)
        ):
            return None
        return {
            int(name[1:]): z[name]
            for name in z.files
            if name.startswith("b")
        }


def build_dir_blooms(
    spark, batch_dir: str, bucket_col: str, value_col: str
) -> dict[int, np.ndarray]:
    """Per-bucket blooms over a WRITTEN batch dir — reading back the
    files just written (one view, provably consistent with what a
    probe will scan). Two distributed passes, both bounded:

    1. per-bucket value counts (one tiny aggregate) fix each bloom's
       size driver-side;
    2. ``mapInPandas`` emits per-task partial bit arrays which an
       ``applyInPandas`` per bucket OR-folds to one row — partials are
       never collected across buckets, so driver traffic is
       n_buckets x bloom bytes regardless of parallelism (and peak
       executor memory for a fold group is #tasks x bloom bytes)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(batch_dir).select(
        F.col(bucket_col).cast("int").alias("b"),
        F.col(value_col).alias("v"),
    )
    sizes = {
        int(r["b"]): make_bloom_tools()["bits_for"](int(r["n"]))
        for r in df.groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    if not sizes:
        return {}
    tools = make_bloom_tools()  # ships by value (closures)

    def partials(batches):
        import pandas as _pd

        build = tools["build"]
        for pdf in batches:
            for b, grp in pdf.groupby("b"):
                bits = build(grp["v"].to_numpy(), sizes[int(b)])
                yield _pd.DataFrame(
                    {"b": [int(b)], "bits": [bits.tobytes()]}
                )

    def or_fold(pdf):
        import numpy as _np
        import pandas as _pd

        acc = None
        for raw in pdf["bits"]:
            w = _np.frombuffer(raw, dtype=_np.uint64)
            acc = w.copy() if acc is None else (acc | w)
        return _pd.DataFrame(
            {"b": [int(pdf["b"].iloc[0])], "bits": [acc.tobytes()]}
        )

    schema = "b int, bits binary"
    folded = (
        df.mapInPandas(partials, schema)
        .groupBy("b")
        .applyInPandas(or_fold, schema)
        .collect()
    )
    return {
        int(r["b"]): np.frombuffer(r["bits"], dtype=np.uint64)
        for r in folded
    }
