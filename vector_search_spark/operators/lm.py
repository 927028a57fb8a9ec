"""Corpus-trained language-model scoring (training-data quality family).

The KenLM-style perplexity filter a 100 TB pretraining pipeline runs over
every document: train a counts-only word-bigram model on the corpus (one
groupBy), score each document's average negative log-likelihood, filter on
the score. Reference counterpart: the reference delegates all text-quality
judgment to an external LLM (nl_targeting_save.py); this is the
engine-side statistical twin.

Scale contract: the model's row count grows with corpus VOCABULARY (not
corpus size, but still unbounded — billions of distinct bigrams on web
text), so the score join carries NO broadcast hint. At gate scale AQE
auto-broadcasts the tiny model; past the broadcast threshold the planner
falls back to sort-merge and the job still completes (probed — see
``bigram_smj`` in SCALING.md). Callers who want a bounded map-side model
pass ``min_count`` to prune rare bigrams first (what a real perplexity
filter does anyway: rare-bigram NLL is noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NLL_SCALE = 1_000_000_000


def bigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) — one row per adjacent word pair, stride 1.

    Single-token documents have no bigrams and are filtered BEFORE the
    position explode: ``sequence(1, 0)`` would descend and
    ``element_at(toks, 0)`` throws (1-based arrays)."""
    return (
        docs.select(F.col(id_col).alias("id"), F.split(text_col, " ").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
            "toks",
        )
        .select(
            "id",
            F.element_at("toks", F.col("i")).alias("w1"),
            F.element_at("toks", F.col("i") + 1).alias("w2"),
        )
    )


def bigram_model(bg: DataFrame, min_count: int = 1) -> DataFrame:
    """(w1, w2, nll): conditional-probability negative log-likelihood per
    observed bigram, in scaled-integer space (×1e9, rounded) so downstream
    per-document sums are exact under any partial-sum order. Unigram
    totals derive from the bigram counts — no second corpus pass.
    ``min_count`` > 1 prunes rare bigrams, bounding the model for
    broadcast-sized deployments (scored docs then skip unseen bigrams,
    standard for count-pruned LMs)."""
    model = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    if min_count > 1:
        model = model.filter(F.col("c2") >= min_count)
    uni = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return model.join(uni, "w1").select(
        "w1",
        "w2",
        F.round(-F.log(F.col("c2") / F.col("c1")) * NLL_SCALE, 0)
        .cast("long")
        .alias("nll"),
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """(id, n_bigrams, avg_nll): corpus-trained bigram-LM quality score per
    document. The score join is hint-free (see module docstring); the
    corpus streams through the bigram explode once for training and once
    for scoring."""
    bg = bigrams(docs, text_col, id_col)
    m = bigram_model(bg, min_count)
    return (
        bg.join(m, ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("nll").alias("_nll_sum"),
        )
        # SUM(int)/count/1e9 is an exact rational: truncate via pure
        # integer division (floor at 6 digits == nll_sum div (n*1000)) —
        # double division here could round UP across an integer boundary;
        # `div` stays in BIGINT (hazard class, CLAUDE.md)
        .select(
            "id",
            "n_bigrams",
            (
                F.expr("_nll_sum div (n_bigrams * 1000)").cast("double")
                / 1000000
            ).alias("avg_nll"),
        )
    )


def bm25_scaled_contrib(
    docs: DataFrame,
    query_terms,
    doc_id: str = "doc_id",
    toks_col: str = "toks",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Scaled-integer BM25 contributions ``(doc_id, term, ci)`` for a set
    of query terms over ``docs(doc_id, toks)`` — the ONE implementation of
    the k1=1.2 / b=0.75 scoring expression shared by ``t_bm25_topk``,
    ``v_hybrid_rrf``, and the scale probe (three hand copies of the
    constant soup is how engines silently fork).

    Each per-(doc, term) contribution rounds into 1e-9-scaled integer
    space BEFORE any aggregation, so downstream per-doc sums are exact
    under any partial-sum order (both engines rank identical integers).
    ``query_terms`` is either a Python list (becomes a pushed-down
    ``isin`` on the token explode — the serve shape when terms arrive as
    input) or a 1-column ``term`` DataFrame (broadcast-joined — the shape
    when terms are themselves corpus-derived). Doc length rides through
    the explode; N/avgdl broadcast as a 1-row scalar; df is a window over
    the already-filtered slice."""
    from pyspark.sql import Window

    tok = docs.select(
        doc_id, F.size(toks_col).alias("dl"), F.explode(toks_col).alias("term")
    )
    if isinstance(query_terms, DataFrame):
        sliced = tok.join(F.broadcast(query_terms), "term")
    else:
        sliced = tok.filter(F.col("term").isin(list(query_terms)))
    tfq = sliced.groupBy(doc_id, "term", "dl").agg(F.count("*").alias("tf"))
    d = tfq.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    stats = docs.agg(
        F.sum(F.size(toks_col)).alias("s_tok"), F.count("*").alias("n_docs")
    )
    s = d.join(F.broadcast(stats))
    avgdl = F.col("s_tok").cast("double") / F.col("n_docs")
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / avgdl))
    )
    return s.select(
        doc_id, "term", F.round(contrib * 1e9, 0).cast("long").alias("ci")
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    return_state: bool = False,
    driver_max_words: int = 200_000,
):
    """Learn the first ``k`` BPE merges from a corpus — TOKENIZER TRAINING
    as a distributed job (Sennrich et al. 2016 semantics, exactly):

    1. CORPUS STAGE (the 100 TB part): word-frequency table via one
       map-side-combined groupBy — industrial BPE trains on the word-count
       dictionary, never re-scanning raw text per round, so the corpus is
       read ONCE and every round operates on the vocabulary-sized state.
    2. Init: word → [chars..., '</w>'] symbol sequences.
    3. Per round: adjacent-pair counts weighted by word frequency
       (overlapping occurrences counted, textbook), argmax pair with
       (count DESC, pair ASC) tie-break — a ONE-ROW driver scalar, the
       r_q15 bounded-scalar pattern — then the merge applied to every
       sequence left-to-right non-overlapping via an Arrow stage
       (vocabulary-sized; checkpointed per round, iterative-loop rule).

    Returns the learned merge table (rank, sym_a, sym_b, n) — n is the
    pair's weighted count at selection time. The DuckDB oracle replays
    every round in pure SQL: the left-to-right non-overlap rule is
    relational because for sym_a != sym_b adjacent matches cannot
    overlap, and for sym_a == sym_b greedy scan = keeping the odd
    positions of each consecutive-match run (run-parity windows).
    Reference counterpart: the tokenizer the reference's embedding
    calls assume; north-star "token counting (BPE-ish)" taken to the
    training side."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    spark = docs.sparkSession
    wf = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    seqs = wf.select(
        F.col("w").alias("wid"),
        "cnt",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substr("w", i, F.lit(1)),
            ),
            F.array(F.lit("</w>")),
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    schema = StructType(
        [
            StructField("wid", StringType()),
            StructField("cnt", LongType()),
            StructField("syms", ArrayType(StringType())),
        ]
    )
    # Small-vocabulary fast path (r14; the dup_clusters driver-union-find
    # precedent): the per-round state is the VOCABULARY-sized sequence
    # table, and every round costs a full Spark job (pair groupBy +
    # driver argmax) plus an Arrow merge stage — ~0.3 s/round of pure
    # scheduling at gate scale, 8 rounds deep. When the vocabulary is
    # bounded (<= ``driver_max_words``; the eager checkpoint above makes
    # the count free-ish), run the identical merge loop on the driver:
    # integer counts, string tie-breaks, and the left-to-right
    # non-overlap scan are engine-independent — BIT-exact with the
    # distributed path by construction (no float channel at all; pinned
    # in tests/test_lm.py). Corpora past the bound take the distributed
    # rounds unchanged — the corpus-sized stage (the word-frequency
    # groupBy) is distributed in BOTH forms.
    if seqs.count() <= driver_max_words:
        pdf = seqs.toPandas()
        cnts = pdf["cnt"].tolist()
        seq_state = [list(s) for s in pdf["syms"]]
        merges = []
        for r in range(k):
            totals: dict = {}
            for cnt, L in zip(cnts, seq_state):
                for i in range(len(L) - 1):
                    p = (L[i], L[i + 1])
                    totals[p] = totals.get(p, 0) + cnt
            if not totals:
                break
            # argmax with (count DESC, a ASC, b ASC) — the exact
            # distributed tie-break
            (a, b), tot = min(
                totals.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((r + 1, a, b, int(tot)))
            ab = a + b
            for w, L in enumerate(seq_state):
                res, i, n = [], 0, len(L)
                while i < n:
                    if i + 1 < n and L[i] == a and L[i + 1] == b:
                        res.append(ab)
                        i += 2
                    else:
                        res.append(L[i])
                        i += 1
                seq_state[w] = res
        out = spark.createDataFrame(
            merges, "rank long, sym_a string, sym_b string, n long"
        )
        if not return_state:
            return out
        state = spark.createDataFrame(
            pd.DataFrame(
                {"wid": pdf["wid"], "cnt": pdf["cnt"], "syms": seq_state}
            ),
            schema,
        )
        return out, state
    merges = []
    for r in range(k):
        n1 = F.size("syms") - 1
        pairs = seqs.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n1),
                    F.slice("syms", 2, n1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            # empty corpus, or every word already collapsed to one symbol:
            # no adjacent pairs remain — stop with the merges learned so far
            break
        best = top[0]
        a, b, tot = best["a"], best["b"], int(best["total"])
        merges.append((r + 1, a, b, tot))

        def apply_merge(batches, a=a, b=b):
            ab = a + b
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    L = list(syms)
                    res, i = [], 0
                    while i < len(L):
                        if i + 1 < len(L) and L[i] == a and L[i + 1] == b:
                            res.append(ab)
                            i += 2
                        else:
                            res.append(L[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame(
                    {"wid": pdf["wid"], "cnt": pdf["cnt"], "syms": out}
                )

        # lazy checkpoint: the apply stage materializes inside the NEXT
        # round's argmax job (one job per round, not two); both consumers
        # of the checkpointed state read the same materialization
        seqs = seqs.mapInPandas(apply_merge, schema).localCheckpoint(
            eager=False
        )
    out = spark.createDataFrame(
        merges, "rank long, sym_a string, sym_b string, n long"
    )
    # return_state: the final sequence relation IS the trained tokenizer
    # applied to every vocabulary word — the apply side (tokenizing a
    # corpus) is a word join against it, never a re-scan of the rounds
    return (out, seqs) if return_state else out
