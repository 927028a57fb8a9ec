"""Text-analysis operator unit tests (BPE training semantics)."""

def test_bpe_train_textbook_semantics(spark, tmp_path):
    """bpe_train must reproduce textbook (Sennrich) BPE on a corpus built
    to exercise the tricky branches: overlapping pair counting ('aaa'
    contributes (a,a) twice), left-to-right non-overlapping application
    on runs ('aaaa' -> 'aa aa', never 'a aa a'), and the (count DESC,
    pair ASC) tie-break."""
    from vector_search_spark.operators.lm import bpe_train

    rows = [(1, "aaaa aaa bc bc bc")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["rank"], r["sym_a"], r["sym_b"], r["n"])
        for r in bpe_train(docs, "text", k=3).collect()
    ]
    # round 1 pairs: 'aaaa' -> (a,a)x3 ; 'aaa' -> (a,a)x2 ; (a,</w>)x2 ;
    # 'bc'x3 -> (b,c)x3, (c,</w>)x3  => best (a,a) n=5
    # apply: 'aaaa' -> [aa, aa, </w>], 'aaa' -> [aa, a, </w>]
    # round 2 pairs: (aa,aa)x1, (aa,</w>)x1, (aa,a)x1, (a,</w>)x1,
    #                (b,c)x3, (c,</w>)x3 => best (b,c) n=3
    # apply: 'bc' -> [bc, </w>]
    # round 3: (bc,</w>)x3 wins over the aa singles => (bc,</w>) n=3
    assert got == [(1, "a", "a", 5), (2, "b", "c", 3), (3, "bc", "</w>", 3)]


def test_global_exclusive_cumsum_equals_single_window(spark):
    """Two-level distributed prefix sum == the plain single-window form,
    with block=4 forcing many blocks (offsets + within-block paths both
    exercised), gapped/unsorted ids, and a zero value."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_search_spark.operators.packing import global_exclusive_cumsum

    rng = random.Random(5)
    ids = rng.sample(range(0, 500), 60)  # gapped, unsorted insert order
    rows = [(i, rng.randint(0, 9)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    got = {
        r.doc_id: r.cum_before
        for r in global_exclusive_cumsum(df, "doc_id", "tok", block=4).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.doc_id: r.cum
        for r in df.select(
            "doc_id", F.coalesce(F.sum("tok").over(w), F.lit(0)).alias("cum")
        ).collect()
    }
    assert got == want


def test_pack_sequences_invariants(spark):
    """Every sequence except the last carries exactly ctx tokens; a doc
    spanning a boundary splits with contiguous spans; per-doc spans sum
    to the doc's token count; tok=0 docs vanish."""
    from vector_search_spark.operators.packing import pack_sequences

    rows = [(1, 6), (2, 3), (3, 0), (4, 10), (5, 2)]  # ctx=8: doc 4 splits 2x
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    out = pack_sequences(df, "doc_id", "tok", ctx=8).collect()
    spans = {(r.seq_id, r.doc_id): (r.doc_tok_start, r.n_toks, r.is_split) for r in out}
    # doc1 [0,6) seq0; doc2 [6,8)+... 6+3=9 -> splits at 8: seq0 gets 2, seq1 gets 1
    assert spans[(0, 1)] == (0, 6, 0)
    assert spans[(0, 2)] == (0, 2, 1)
    assert spans[(1, 2)] == (2, 1, 1)
    # doc4: cum_before=9 -> [9,19): seq1 tokens 9..16 (7), seq2 16..19 (3)
    assert spans[(1, 4)] == (0, 7, 1)
    assert spans[(2, 4)] == (7, 3, 1)
    # doc5: cum_before=19 -> seq2, start_in_doc 0, 2 toks
    assert spans[(2, 5)] == (0, 2, 0)
    assert 3 not in {d for _, d in spans}  # tok=0 dropped
    # per-seq totals: all ctx except last
    import collections

    per_seq = collections.Counter()
    for (s, _), (_, n, _) in spans.items():
        per_seq[s] += n
    last = max(per_seq)
    assert all(v == 8 for s, v in per_seq.items() if s != last)
    assert per_seq[last] == 21 - 16
    # per-doc span sums == tok and spans are contiguous from 0
    per_doc = collections.defaultdict(list)
    for (s, d), (st, n, _) in spans.items():
        per_doc[d].append((s, st, n))
    for d, tok in rows:
        if tok == 0:
            continue
        sp = sorted(per_doc[d])
        assert sp[0][1] == 0 and sum(n for _, _, n in sp) == tok
        for (_, st0, n0), (_, st1, _) in zip(sp, sp[1:]):
            assert st1 == st0 + n0


def test_packing_guards(spark):
    """Negative token counts are excluded BEFORE the prefix sum (cannot
    shift later docs' positions), and the temp-column collision raises."""
    import pytest

    from vector_search_spark.operators.packing import (
        global_exclusive_cumsum,
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, -3), (3, 5)], "doc_id long, tok long"
    )
    out = {
        (r.seq_id, r.doc_id): (r.doc_tok_start, r.n_toks)
        for r in pack_sequences(df, "doc_id", "tok", ctx=8).collect()
    }
    # doc 3 starts at global position 5 (doc 2 fully excluded): seq0 gets
    # tokens 5..8 (3 of them), seq1 gets the remaining 2
    assert out == {(0, 1): (0, 5), (0, 3): (0, 3), (1, 3): (3, 2)}

    clash = spark.createDataFrame([(1, 2, 9)], "doc_id long, tok long, _blk long")
    with pytest.raises(ValueError, match="_blk"):
        global_exclusive_cumsum(clash, "doc_id", "tok")


def test_packing_param_guards(spark):
    import pytest

    from vector_search_spark.operators.packing import (
        global_exclusive_cumsum,
        pack_sequences,
    )

    df = spark.createDataFrame([(1, 2)], "doc_id long, tok long")
    with pytest.raises(ValueError, match="ctx"):
        pack_sequences(df, "doc_id", "tok", ctx=0)
    with pytest.raises(ValueError, match="block"):
        global_exclusive_cumsum(df, "doc_id", "tok", block=0)


def test_cumsum_wide_order_col_exact_block_assignment(spark):
    """order_col values near 2^60: float division would misassign blocks
    (2^53 rounding); the exact `div` must keep the two-level form equal to
    the single-window form."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_search_spark.operators.packing import global_exclusive_cumsum

    base = 1 << 59
    # adjacent ids straddling block boundaries at the wide end
    ids = [base + d for d in (0, 1, 4095, 4096, 4097, 8191, 8192)]
    rows = [(i, 3) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    got = {
        r.doc_id: r.cum_before
        for r in global_exclusive_cumsum(df, "doc_id", "tok").collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.doc_id: r.cum
        for r in df.select(
            "doc_id", F.coalesce(F.sum("tok").over(w), F.lit(0)).alias("cum")
        ).collect()
    }
    assert got == want


def test_bpe_train_stops_when_no_pairs_remain(spark):
    """A corpus whose every word collapses to a single symbol before k
    rounds must return the merges learned so far, not IndexError; an
    empty corpus returns zero merges."""
    from vector_search_spark.operators.lm import bpe_train

    # 'ab' -> [a, b, </w>]: round 1 merges (a,b), round 2 merges (ab,</w>),
    # round 3 has no adjacent pairs left -> early stop with 2 merges
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = [
        (r["rank"], r["sym_a"], r["sym_b"], r["n"])
        for r in bpe_train(docs, "text", k=5).collect()
    ]
    assert got == [(1, "a", "b", 2), (2, "ab", "</w>", 2)]

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(empty, "text", k=2).count() == 0


def test_bpe_train_driver_path_matches_distributed(spark, sf_dir):
    """r14: the small-vocabulary DRIVER fast path must be bit-identical
    to the distributed rounds — merges AND the returned sequence state.
    The loop is integer counts + string tie-breaks + the left-to-right
    non-overlap scan (no float channel), so equality is exact, not
    tolerance-based. driver_max_words=0 forces the distributed rounds on
    the same corpus."""
    from vector_search_spark.operators.lm import bpe_train
    from vector_search_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    m_drv, s_drv = bpe_train(docs, "text", k=5, return_state=True)
    m_dist, s_dist = bpe_train(
        docs, "text", k=5, return_state=True, driver_max_words=0
    )
    assert sorted(map(tuple, m_drv.collect())) == sorted(
        map(tuple, m_dist.collect())
    )

    def canon(df):
        return sorted(
            (r["wid"], r["cnt"], tuple(r["syms"])) for r in df.collect()
        )

    assert canon(s_drv) == canon(s_dist)
