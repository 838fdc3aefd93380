"""q_bpe_token_ids (r14, r13 verdict #4): the trained-tokenizer
pipeline end to end — corpus -> train_bpe -> segment_words -> piece-id
assignment -> concat-and-chop packing — pinned EXACTLY against a
pure-Python pipeline built from tests/test_bpe.py's reference trainer
(the iterative trainer is not SQL-expressible, so this is the oracle
the driver's rows-only check delegates to)."""

from __future__ import annotations

from dynamics_365_to_bigquery_spark_etl_pipeline_spark import catalog
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import bpe
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup import (
    normalized_tokens,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (
    BPE_MERGES,
    BPE_PACK_SEQ_LEN,
    q_bpe_token_ids,
)

from tests.test_bpe import _ref_apply, _word_syms, reference_bpe

SF_DIR = "/root/testdata/sf0.001"


def _python_pipeline(docs_tokens, seq_len):
    """(doc_id, source, tokens) -> the full reference pipeline."""
    # 1. word frequencies + reference training
    wc: dict[str, int] = {}
    for _d, _s, toks in docs_tokens:
        for t in toks:
            wc[t] = wc.get(t, 0) + 1
    merges = reference_bpe(wc, BPE_MERGES)

    # 2. reference segmentation of the distinct vocabulary
    seg: dict[str, tuple[str, ...]] = {}
    for w in wc:
        syms = list(_word_syms(w))
        for _r, a, b, _m, _c in merges:
            syms = _ref_apply(syms, a, b)
        seg[w] = tuple(syms)

    # 3. piece ids: (corpus piece count DESC, piece ASC)
    pc: dict[str, int] = {}
    for w, n in wc.items():
        for p in seg[w]:
            pc[p] = pc.get(p, 0) + n
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    pid = {p: i for i, (p, _c) in enumerate(ranked)}

    # 4. encode + 5. per-source concat-and-chop packing
    rows = {}
    offsets: dict[str, int] = {}
    by_source: dict[str, list] = {}
    for d, s, toks in docs_tokens:
        by_source.setdefault(s, []).append((d, toks))
    for s, ds in by_source.items():
        off = 0
        for d, toks in sorted(ds):
            ids = [pid[p] for t in toks for p in seg[t]]
            n = len(ids)
            seq_id = off // seq_len
            end = off + max(n, 1) - 1
            rows[d] = (
                d,
                s,
                n,
                tuple(ids),
                seq_id,
                off % seq_len,
                int(end // seq_len > seq_id),
            )
            off += n
        offsets[s] = off
    return rows


def test_q_bpe_token_ids_matches_pure_python_pipeline(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents")
    toks = {
        (r.doc_id, r.source): list(r.t)
        for r in docs.select(
            "doc_id", "source", normalized_tokens(docs.text).alias("t")
        ).collect()
    }
    docs_tokens = [
        (d, s, [t for t in ts if t]) for (d, s), ts in toks.items()
    ]
    want = _python_pipeline(docs_tokens, BPE_PACK_SEQ_LEN)
    got = {
        r.doc_id: (
            r.doc_id,
            r.source,
            r.n_pieces,
            tuple(r.piece_ids),
            r.seq_id,
            r.offset_in_seq,
            r.spans_boundary,
        )
        for r in q_bpe_token_ids(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d], d
    # non-degenerate: pieces exist, some doc is multi-piece, packing
    # crosses at least one boundary somewhere
    assert any(v[2] > 0 for v in want.values())
    assert any(v[6] == 1 for v in want.values())
