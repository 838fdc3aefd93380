"""Distributed BPE tokenizer training (r13): the Spark-side trainer
must reproduce the reference algorithm EXACTLY — same merge sequence,
same segmentation — against a pure-Python implementation of Sennrich
et al. 2015 run on the identical word-frequency dict, with the same
deterministic tie-break (count DESC, left ASC, right ASC)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import bpe

SF_DIR = "/root/testdata/sf0.001"


def _word_syms(word: str) -> tuple[str, ...]:
    return tuple([*word[:-1], word[-1] + bpe.END])


def reference_bpe(wc: dict[str, int], n_merges: int, min_count: int = 1):
    """The sequential textbook algorithm — the oracle the distributed
    trainer must match bit for bit."""
    vocab = {_word_syms(w): n for w, n in wc.items()}
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        pairs = {p: c for p, c in pairs.items() if c >= min_count}
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, c))
        vocab = {
            tuple(_ref_apply(syms, a, b)): n for syms, n in vocab.items()
        }
    return merges


def _ref_apply(syms, a, b):
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
    return out


def _corpus_words(spark):
    docs = load_table(spark, SF_DIR, "documents").select("text")
    return bpe.word_counts(docs)


def test_trained_merges_match_pure_python_reference(spark):
    """BOTH trainer paths (r14 driver-local fast path; the distributed
    loop forced via local_threshold=0) must reproduce the reference
    merge sequence bit for bit."""
    wc_df = _corpus_words(spark)
    wc = {r.word: r.n for r in wc_df.collect()}
    want = reference_bpe(wc, 24)
    got_local = [tuple(m) for m in bpe.train_bpe(wc_df, 24)]
    got_dist = [
        tuple(m) for m in bpe.train_bpe(wc_df, 24, local_threshold=0)
    ]
    assert got_local == want and len(got_local) == 24
    assert got_dist == want


def test_segmentation_matches_reference_and_reassembles(spark):
    """BOTH segmentation impls (r14 single_pass default; the r13 JVM
    fold) must match the reference replay bit for bit."""
    wc_df = _corpus_words(spark).localCheckpoint()
    wc = {r.word: r.n for r in wc_df.collect()}
    merges = bpe.train_bpe(wc_df, 16)
    seg = {
        r.word: tuple(r.pieces)
        for r in bpe.segment_words(wc_df.select("word"), merges).collect()
    }
    seg_fold = {
        r.word: tuple(r.pieces)
        for r in bpe.segment_words(
            wc_df.select("word"), merges, checkpoint_every=5, impl="fold"
        ).collect()
    }
    assert seg == seg_fold
    # reference replay over the same merge list
    for word in wc:
        syms = list(_word_syms(word))
        for m in merges:
            syms = _ref_apply(syms, m.left, m.right)
        assert seg[word] == tuple(syms), word
    # every segmentation reassembles to word + END marker
    for word, pieces in seg.items():
        assert "".join(pieces) == word + bpe.END


def test_tiebreak_and_greedy_leftmost_nonoverlapping(spark):
    """'aaa': pairs (a,a) and (a,a</w>) tie at the word count — the
    lexicographic tie-break picks (a,a); the greedy fold then merges
    leftmost-nonoverlapping, [aa, a</w>], never [a, aa</w>]."""
    docs = spark.createDataFrame([("aaa aaa",)], "text string")
    wc = bpe.word_counts(docs)
    merges = bpe.train_bpe(wc, 1)
    assert [(m.left, m.right) for m in merges] == [("a", "a")]
    seg = bpe.segment_words(wc.select("word"), merges).collect()
    assert tuple(seg[0].pieces) == ("aa", "a" + bpe.END)


def test_dry_corpus_stops_early_and_validation(spark):
    docs = spark.createDataFrame([("ab ab",)], "text string")
    wc = bpe.word_counts(docs)
    # 'ab' exhausts after one merge: [a, b</w>] -> [ab</w>], no pairs left
    merges = bpe.train_bpe(wc, 10)
    assert len(merges) == 1
    with pytest.raises(ValueError, match="n_merges"):
        bpe.train_bpe(wc, 0)
    with pytest.raises(ValueError, match="min_count"):
        bpe.train_bpe(wc, 1, min_count=0)
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe.segment_words(
            wc.select("word"), merges, checkpoint_every=0, impl="fold"
        )
    with pytest.raises(ValueError, match="impl"):
        bpe.segment_words(wc.select("word"), merges, impl="nope")
    # min_count above every pair count: empty merge table, not an error
    assert bpe.train_bpe(wc, 3, min_count=99) == []
    assert bpe.train_bpe(wc, 3, min_count=99, local_threshold=0) == []


def test_single_char_and_empty_words(spark):
    docs = spark.createDataFrame([("a a a bc",)], "text string")
    wc = bpe.word_counts(docs)
    merges = bpe.train_bpe(wc, 3)
    # 'a' contributes no pairs; 'bc' gives exactly one
    assert [(m.left, m.right) for m in merges] == [("b", "c" + bpe.END)]
    seg = {
        r.word: tuple(r.pieces)
        for r in bpe.segment_words(wc.select("word"), merges).collect()
    }
    assert seg["a"] == ("a" + bpe.END,)
    assert seg["bc"] == ("bc" + bpe.END,)


def test_local_trainer_property_random_corpora():
    """Hypothesis pin for the r14 incremental local trainer: the lazy
    heap + delta bookkeeping (including merged-string collisions like
    (a,bc)/(ab,c) -> abc re-increasing a pair it already saw) must
    reproduce the naive-recount reference on random corpora, merge
    budgets, and min_counts. Pure Python — no Spark in the loop."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        st.dictionaries(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
            min_size=1,
            max_size=10,
        ),
        st.integers(min_value=1, max_value=14),
        st.integers(min_value=1, max_value=3),
    )
    def check(wc, n_merges, min_count):
        got = [
            tuple(m)
            for m in bpe._train_bpe_local(list(wc.items()), n_merges, min_count)
        ]
        assert got == reference_bpe(wc, n_merges, min_count)

    check()


def test_single_pass_degenerate_words_match_fold(spark):
    """r14 review pin: the default single_pass segmenter must mirror
    the fold impl on degenerate rows — NULL word -> NULL pieces,
    '' -> [''] — instead of crashing the Python worker."""
    df = spark.createDataFrame([("",), (None,), ("ab",)], "word string")
    merges = [bpe.Merge(0, "a", "b", "ab", 1)]
    got = {
        r.word: r.pieces
        for r in bpe.segment_words(df, merges).collect()
    }
    want = {
        r.word: r.pieces
        for r in bpe.segment_words(df, merges, impl="fold").collect()
    }
    assert got == want
    assert got[None] is None and got[""] == [""]


def test_merge_table_artifact_roundtrip(spark, tmp_path):
    """r14: the trained tokenizer persists as a versioned artifact —
    reloaded merges segment bit-identically; version / marker / rank
    holes refuse to load instead of silently segmenting differently."""
    import json
    import os

    wc = _corpus_words(spark).localCheckpoint()
    merges = bpe.train_bpe(wc, 12)
    p = str(tmp_path / "tokenizer.json")
    bpe.save_merges(p, merges)
    back = bpe.load_merges(p)
    assert back == merges
    seg_a = {r.word: tuple(r.pieces) for r in bpe.segment_words(wc.select("word"), merges).collect()}
    seg_b = {r.word: tuple(r.pieces) for r in bpe.segment_words(wc.select("word"), back).collect()}
    assert seg_a == seg_b
    # corruption modes are loud
    raw = json.load(open(p))
    for doctor, match in (
        (lambda d: d.update(version=99), "version"),
        (lambda d: d.update(end="<eow>"), "marker"),
        (lambda d: d["merges"].pop(0), "corrupt"),
    ):
        d = json.loads(json.dumps(raw))
        doctor(d)
        bad = str(tmp_path / "bad.json")
        json.dump(d, open(bad, "w"))
        with pytest.raises(ValueError, match=match):
            bpe.load_merges(bad)
    assert not os.path.exists(p + ".tmp")


def test_select_batch_stop_rules():
    """r15 batched rounds: each _select_batch stop rule pinned as a
    pure function — prefix stop on component reuse, the created-pair
    trigram-bound guard (c must STRICTLY exceed the running max),
    stop-after-collision (alphabet or in-batch duplicate merged
    string); the first candidate always selected."""
    sb = bpe._select_batch
    chars = set("abcdefgh")
    # disjoint candidates under zero bounds: all taken
    cands = [("a", "b", 10), ("c", "d", 8), ("e", "f", 6)]
    assert sb(cands, {}, chars) == cands
    # sharing a LEFT with a left (or a right with a right) is
    # harmless — sites can never overlap, counts are independent
    cands = [("a", "b", 10), ("a", "c", 8), ("d", "c", 6)]
    assert sb(cands, {}, chars) == cands
    # CROSS-conflict STOPS the batch (no skipping past it): a merge
    # site "a b" destroys (x,a) and (b,y) adjacencies
    cands = [("a", "b", 10), ("b", "c", 8), ("e", "f", 6)]
    assert sb(cands, {}, chars) == [("a", "b", 10)]
    cands = [("a", "b", 10), ("c", "a", 8), ("e", "f", 6)]
    assert sb(cands, {}, chars) == [("a", "b", 10)]
    # a self-pair poisons both sides
    cands = [("a", "a", 10), ("a", "c", 8)]
    assert sb(cands, {}, chars) == [("a", "a", 10)]
    # created-pair guard: the next count must STRICTLY exceed the
    # running max of selected members' trigram bounds
    cands = [("a", "b", 10), ("c", "d", 9)]
    assert sb(cands, {("a", "b"): 9}, chars) == [("a", "b", 10)]
    assert sb(cands, {("a", "b"): 8}, chars) == cands  # 9 > 8 passes
    # the guard is a MAX across members, not a sum
    cands = [("a", "b", 10), ("c", "d", 9), ("e", "f", 7)]
    assert sb(cands, {("a", "b"): 4, ("c", "d"): 4}, chars) == cands
    assert sb(cands, {("a", "b"): 4, ("c", "d"): 8}, chars) == [
        ("a", "b", 10),
        ("c", "d", 9),
    ]  # third: 7 <= max(4, 8)
    # merged-string collision with an existing symbol stops AFTER the
    # colliding member (later members could see boosted counts)
    cands = [("a", "b", 10), ("c", "d", 9)]
    assert sb(cands, {}, chars | {"ab"}) == [("a", "b", 10)]
    # two members producing the SAME merged string: second one stops
    # the batch (their creations would stack on the same pair strings)
    cands = [("a", "bc", 10), ("ab", "c", 9), ("e", "f", 7)]
    assert sb(cands, {}, {"a", "bc", "ab", "c", "e", "f"}) == [
        ("a", "bc", 10),
        ("ab", "c", 9),
    ]
    # the first candidate is always taken, even colliding
    assert sb([("a", "b", 1)], {("a", "b"): 99}, chars | {"ab"}) == [
        ("a", "b", 1)
    ]


def test_batched_distributed_matches_reference_random(spark):
    """The r15 batched distributed loop must stay bit-identical to the
    sequential reference on small-alphabet random corpora — the worst
    case for batching (every stop rule fires constantly), so this
    exercises the equivalence argument, not just the happy path."""
    import random

    for seed, n_merges, min_count, max_batch in (
        (0, 10, 1, 512),
        (1, 10, 2, 512),
        (2, 12, 1, 3),
    ):
        rnd = random.Random(seed)
        words = {
            "".join(
                rnd.choice("abcdef") for _ in range(rnd.randint(1, 8))
            ): rnd.randint(1, 9)
            for _ in range(40)
        }
        wc_df = spark.createDataFrame(
            list(words.items()), "word string, n long"
        )
        want = reference_bpe(words, n_merges, min_count)
        got = [
            tuple(m)
            for m in bpe.train_bpe(
                wc_df,
                n_merges,
                min_count=min_count,
                local_threshold=0,
                max_batch=max_batch,
            )
        ]
        assert got == want, (seed, n_merges, min_count, max_batch)


def test_batched_rounds_amortize_on_wide_alphabet(spark, monkeypatch):
    """On a wide symbol alphabet (the multilingual-corpus shape) the
    top pairs are mostly disjoint, so one round emits MANY merges —
    the mechanism that turns 32k driver-coordinated rounds into
    hundreds. Pinned: far fewer fold rounds than merges, and the
    result still bit-matches the sequential reference."""
    import random

    rnd = random.Random(7)
    alpha = [chr(0x3B1 + i) for i in range(48)]  # Greek block: 48 chars
    words = {
        "".join(rnd.choice(alpha) for _ in range(rnd.randint(2, 6))): rnd.randint(1, 9)
        for _ in range(300)
    }
    calls = []
    orig = bpe._apply_merge_batch

    def spy(df, batch):
        calls.append(len(batch))
        return orig(df, batch)

    monkeypatch.setattr(bpe, "_apply_merge_batch", spy)
    wc_df = spark.createDataFrame(list(words.items()), "word string, n long")
    got = [
        tuple(m) for m in bpe.train_bpe(wc_df, 40, local_threshold=0)
    ]
    assert got == reference_bpe(words, 40)
    assert len(got) == 40
    # the final batch is never folded, so rounds = len(calls) + 1
    assert len(calls) + 1 <= 12, calls
