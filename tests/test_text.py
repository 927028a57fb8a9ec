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
