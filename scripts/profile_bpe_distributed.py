#!/usr/bin/env python
"""Wall-clock for the r15 batched distributed BPE trainer (r14 verdict
#2) over a vocabulary PAST the driver-local threshold: >500k distinct
words, 32k merges, ``local_threshold=0`` so every round runs the
distributed loop (pair-count round + trigram-bound round + batched
fold — ``operators/bpe.py:train_bpe``).

The synthetic vocabulary is multilingual-shaped: words drawn over a
~1.2k-character alphabet spanning several Unicode blocks (Latin,
Greek, Cyrillic, CJK sample) with Zipf-ish counts — the 100 TB-corpus
shape the r14 verdict named, and the shape where batched rounds
amortize (a wide symbol alphabet keeps the top pairs mostly
component-disjoint). The small-alphabet worst case is pinned
separately in tests/test_bpe.py (it degenerates toward one merge per
round, by design of the exactness guard).

Also verifies BIT-IDENTITY of the full 32k-merge table against the
driver-local incremental trainer run on the same vocabulary — the
same oracle relationship the pytest suite pins at small scale.

Usage: python scripts/profile_bpe_distributed.py [n_words] [n_merges]
(defaults 600000, 32000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (  # noqa: E402
    bpe,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def make_vocab(n_words: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    blocks = (
        list(range(0x61, 0x7B))      # latin a-z
        + list(range(0x3B1, 0x3CA))  # greek
        + list(range(0x430, 0x450))  # cyrillic
        + list(range(0x4E00, 0x4E00 + 1100))  # CJK sample
    )
    alpha = np.array([chr(c) for c in blocks])
    words: set[str] = set()
    # over-generate then dedupe to the target distinct-word count
    while len(words) < n_words:
        need = n_words - len(words)
        lens = rng.integers(2, 9, int(need * 1.2) + 16)
        picks = rng.integers(0, len(alpha), int(lens.sum()))
        pos = 0
        for ln in lens:
            words.add("".join(alpha[picks[pos : pos + ln]]))
            pos += ln
            if len(words) >= n_words:
                break
    wl = sorted(words)
    counts = np.minimum(rng.zipf(1.3, len(wl)), 10_000).astype(np.int64)
    return pd.DataFrame({"word": wl, "n": counts})


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000
    pdf = make_vocab(n_words)
    assert len(pdf) > 500_000 or n_words <= 500_000

    spark = get_spark("bpe-distributed-profile")
    wc_df = spark.createDataFrame(pdf).repartition(32).localCheckpoint()

    rounds: list[int] = []
    orig = bpe._apply_merge_batch

    def spy(df, batch):
        rounds.append(len(batch))
        return orig(df, batch)

    bpe._apply_merge_batch = spy
    try:
        t0 = time.monotonic()
        merges = bpe.train_bpe(wc_df, n_merges, local_threshold=0)
        wall = time.monotonic() - t0
    finally:
        bpe._apply_merge_batch = orig

    t1 = time.monotonic()
    local = bpe._train_bpe_local(
        list(pdf.itertuples(index=False, name=None)), n_merges, 1
    )
    local_wall = time.monotonic() - t1
    identical = [tuple(m) for m in merges] == [tuple(m) for m in local]

    print(
        json.dumps(
            {
                "n_words": len(pdf),
                "n_merges_requested": n_merges,
                "n_merges_emitted": len(merges),
                "distributed_wall_sec": round(wall, 1),
                "rounds": len(rounds) + 1,
                "mean_batch": round(
                    (sum(rounds) or len(merges)) / max(1, len(rounds)), 1
                ),
                "sec_per_merge": round(wall / max(1, len(merges)), 4),
                "local_wall_sec": round(local_wall, 1),
                "bit_identical_to_local": identical,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
