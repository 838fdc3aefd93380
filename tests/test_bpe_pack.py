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


def _python_encode(word, merges, pid, unk_id):
    """The reference encode chain: segment via replay, then per piece
    vocab id -> character fallback (END stays folded) -> UNK."""
    syms = list(_word_syms(word))
    for _r, a, b, _m, _c in merges:
        syms = _ref_apply(syms, a, b)
    ids = []
    for p in syms:
        if p in pid:
            ids.append(pid[p])
            continue
        if p.endswith(bpe.END):
            core = p[: -len(bpe.END)]
            chars = [*core[:-1], core[-1] + bpe.END]
        else:
            chars = list(p)
        ids.extend(pid.get(ch, unk_id) for ch in chars)
    return ids


def test_q_bpe_encode_oov_matches_pure_python(spark):
    """r15 (r14 verdict #3): encoding the held-out half of the corpus
    through the trained artifact drops ZERO words — every encode-side
    word appears in the output with >= 1 id — and every row matches
    the reference encode chain exactly."""
    docs = catalog.load_table(spark, SF_DIR, "documents")
    rows = docs.select(
        "doc_id", normalized_tokens(docs.text).alias("t")
    ).collect()
    wc: dict[str, int] = {}
    other_words: set[str] = set()
    for r in rows:
        for t in r.t:
            if not t:
                continue
            if r.doc_id % 2 == 0:
                wc[t] = wc.get(t, 0) + 1
            else:
                other_words.add(t)
    merges = reference_bpe(wc, BPE_MERGES)
    seg: dict[str, tuple[str, ...]] = {}
    for w in wc:
        syms = list(_word_syms(w))
        for _r, a, b, _m, _c in merges:
            syms = _ref_apply(syms, a, b)
        seg[w] = tuple(syms)
    pc: dict[str, int] = {}
    for w, n in wc.items():
        for p in seg[w]:
            pc[p] = pc.get(p, 0) + n
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    pid = {p: i for i, (p, _c) in enumerate(ranked)}
    unk_id = len(pid)

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (
        OOV_PROBE_WORDS,
        q_bpe_encode_oov,
    )

    other_words |= set(OOV_PROBE_WORDS)
    got = {
        r.word: (r.n_pieces, r.n_unk, r.first_id)
        for r in q_bpe_encode_oov(spark, SF_DIR).collect()
    }
    # zero dropped words: the output covers EXACTLY the encode side
    assert set(got) == other_words
    for w in other_words:
        ids = _python_encode(w, merges, pid, unk_id)
        assert got[w] == (
            len(ids),
            sum(1 for i in ids if i == unk_id),
            ids[0],
        ), w
        assert len(ids) >= 1
    # non-degenerate: the probe words are genuinely OOV (the corpus
    # halves themselves can fully share a vocabulary at tiny SFs —
    # the probes guarantee the fallback chain fires at every scale)
    for w in OOV_PROBE_WORDS:
        assert w not in wc and got[w][1] >= 1, w
    assert any(w in wc for w in other_words)


def test_encode_words_disjoint_alphabet_and_artifact_vocab(spark, tmp_path):
    """encode_words on a FULLY disjoint corpus (no shared characters):
    everything resolves to UNK, nothing drops; the artifact embeds and
    round-trips the vocab; a corrupt vocab refuses to load."""
    import json

    import pytest

    wc = spark.createDataFrame(
        [("abab", 5), ("ab", 3)], "word string, n long"
    )
    merges = bpe.train_bpe(wc, 2)
    seg = {
        r.word: list(r.pieces)
        for r in bpe.segment_words(wc.select("word"), merges).collect()
    }
    pc: dict[str, int] = {}
    counts = {"abab": 5, "ab": 3}
    for w, ps in seg.items():
        for p in ps:
            pc[p] = pc.get(p, 0) + counts[w]
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = [(p, i) for i, (p, _c) in enumerate(ranked)]
    unk = len(vocab)

    disjoint = spark.createDataFrame([("xyz",), ("q",)], "word string")
    got = {
        r.word: list(r.piece_ids)
        for r in bpe.encode_words(disjoint, merges, vocab).collect()
    }
    # no shared characters -> every char falls through to UNK; word
    # lengths preserved (one id per character, END folded on last)
    assert got == {"xyz": [unk] * 3, "q": [unk]}

    # mixed word: known subword pieces resolve, unknown chars -> UNK
    pid = dict(vocab)
    mixed = spark.createDataFrame([("abz",), ("ab",)], "word string")
    got2 = {
        r.word: list(r.piece_ids)
        for r in bpe.encode_words(mixed, merges, vocab).collect()
    }
    assert got2["ab"] == [pid["ab" + bpe.END]]
    # 'abz': segmentation gives pieces; each resolves via vocab or
    # char-fallback with END folded onto 'z'
    want_abz = []
    syms = ["a", "b", "z" + bpe.END]
    for _r, a, b, _m, _c in [tuple(m) for m in merges]:
        out, pend = [], None
        for x in syms:
            if pend is None:
                pend = x
            elif pend == a and x == b:
                out.append(a + b)
                pend = None
            else:
                out.append(pend)
                pend = x
        if pend is not None:
            out.append(pend)
        syms = out
    for p in syms:
        if p in pid:
            want_abz.append(pid[p])
        elif p.endswith(bpe.END):
            core = p[: -len(bpe.END)]
            for ch in [*core[:-1], core[-1] + bpe.END]:
                want_abz.append(pid.get(ch, unk))
        else:
            for ch in p:
                want_abz.append(pid.get(ch, unk))
    assert got2["abz"] == want_abz and unk in got2["abz"]

    # artifact round-trip with vocab
    p = str(tmp_path / "tok.json")
    bpe.save_merges(p, merges, vocab=vocab)
    assert bpe.load_merges(p) == merges  # merges-only readers unaffected
    assert bpe.load_vocab(p) == vocab
    # merges-only artifact: load_vocab is loud
    p2 = str(tmp_path / "m.json")
    bpe.save_merges(p2, merges)
    with pytest.raises(ValueError, match="no piece vocab"):
        bpe.load_vocab(p2)
    # corrupt vocab (duplicate piece / id hole) refuses
    raw = json.load(open(p))
    raw["vocab"][0][1] = raw["vocab"][-1][1]
    bad = str(tmp_path / "bad.json")
    json.dump(raw, open(bad, "w"))
    with pytest.raises(ValueError, match="corrupt vocab"):
        bpe.load_vocab(bad)


def test_encode_words_duplicate_rows_and_extra_columns(spark):
    """encode_words dedupes its input on word (r15 review pass 2): an
    exploded token frame — duplicate word occurrences, extra columns —
    is the natural 'encode any corpus' input, and before the fix the
    final groupBy concatenated each duplicate's ids ([5,5,7,7] instead
    of [5,7]) with no error. One row per DISTINCT word, ids identical
    to the distinct-input encode."""
    wc = spark.createDataFrame(
        [("abab", 5), ("ab", 3)], "word string, n long"
    )
    merges = bpe.train_bpe(wc, 2)
    seg = {
        r.word: list(r.pieces)
        for r in bpe.segment_words(wc.select("word"), merges).collect()
    }
    pc: dict[str, int] = {}
    counts = {"abab": 5, "ab": 3}
    for w, ps in seg.items():
        for p in ps:
            pc[p] = pc.get(p, 0) + counts[w]
    vocab = [
        (p, i)
        for i, (p, _c) in enumerate(
            sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    ]

    distinct_in = spark.createDataFrame(
        [("ab",), ("abz",)], "word string"
    )
    want = {
        r.word: list(r.piece_ids)
        for r in bpe.encode_words(distinct_in, merges, vocab).collect()
    }

    # same words as an exploded token frame: duplicates + extra cols
    dup_in = spark.createDataFrame(
        [(0, "ab"), (1, "abz"), (2, "ab"), (3, "ab"), (4, "abz")],
        "pos long, word string",
    )
    got_rows = bpe.encode_words(dup_in, merges, vocab).collect()
    got = {r.word: list(r.piece_ids) for r in got_rows}
    assert len(got_rows) == 2, "one row per DISTINCT word"
    assert got == want
