"""Text-analysis expression library (north-star LLM-data-pipeline surface).

Everything here is pure Catalyst expressions (HOFs over arrays of tokens /
characters) — no Python UDFs in the hot path, so the operators run JVM-side
at any scale. The portable polynomial hash is arithmetic-only and therefore
bit-identical in the DuckDB oracle (verified), which lets even MinHash/LSH
candidate generation be oracle-checked exactly.

Hash design: fold ``(a*31 + ascii(ch)) % 1000000007`` over the characters,
then an avalanche step ``((h+13) * 2654435761) % 1000000007`` so short
tokens don't monotonically produce small values (min-hash would otherwise
always pick the shortest token). All intermediates < 2^62 — no overflow in
either engine. For 100 TB runs where oracle parity is not needed, swap in
``F.xxhash64`` (faster, same API shape) via ``hash_fn="xxhash64"``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

HASH_MOD = 1_000_000_007
HASH_MIX = 2_654_435_761
# Second, independent mix constant for the wide (two-stream) shingle-hash
# composition — must stay < 2^31 so wh * HASH_MIX2 + wh' < 2^62 is exact.
HASH_MIX2 = 1_779_033_703

# Marker token sets for the heuristic language/domain classifier.
LANG_MARKERS = {
    "article": ["the", "a"],
    "engine": ["spark", "query", "table", "join"],
    "data": ["vector", "row", "column", "value"],
}
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: ColumnOrName, pattern: str = " ") -> Column:
    """Whitespace tokenization (F5: split + strip)."""
    return F.split(_c(col), pattern)


def distinct_tokens(col: ColumnOrName) -> Column:
    return F.array_distinct(tokens(col))


def poly_hash(col: ColumnOrName) -> Column:
    """Portable 30-bit polynomial string hash (identical in DuckDB SQL).

    Folds over ``split(s, '')`` — per-character array access is O(1),
    whereas ``substr(s, i, 1)`` re-seeks the UTF8 string from the front and
    makes the fold quadratic in string length."""
    s = _c(col)
    folded = F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda a, ch: (a * 31 + F.ascii(ch).cast("long")) % F.lit(HASH_MOD),
    )
    return ((folded + 13) * F.lit(HASH_MIX)) % F.lit(HASH_MOD)


def minhash_perm(h: Column, s: Column) -> Column:
    """Universal-hash permutation of a base hash ``h`` for seed ``s``:
    ``(h * a_s + b_s) mod p`` with arithmetically-derived odd multipliers.
    All intermediates < 1.1e18 < 2^63 — overflow-free in Spark and DuckDB."""
    a = ((s * 2 + 1) * F.lit(HASH_MIX)) % F.lit(HASH_MOD)
    b = s * F.lit(40503) + F.lit(7)
    return (h * a + b) % F.lit(HASH_MOD)


def minhash_signature(
    tokens_col: ColumnOrName, n_hashes: int = 16, hash_fn: str = "poly"
) -> Column:
    """MinHash signature. The character-fold hash runs ONCE per token; the
    ``n_hashes`` signature slots are arithmetic permutations of that base
    hash (classic universal-hashing MinHash) — 16× less char-folding than
    hashing ``token#seed`` per seed, same collision statistics.

    ``hash_fn='poly'`` is oracle-portable; ``'xxhash64'`` is the fast path
    for production scale (JVM intrinsic, not reproducible in DuckDB).
    """
    tk = _c(tokens_col)

    if hash_fn == "xxhash64":
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda s: F.array_min(F.transform(tk, lambda t: F.xxhash64(t, s))),
        )

    return minhash_signature_from_hashes(F.transform(tk, poly_hash), n_hashes)


def minhash_signature_from_hashes(
    hashes_col: ColumnOrName, n_hashes: int = 16
) -> Column:
    """MinHash signature from precomputed base hashes. Feed this a bound
    column (project the hash array in a separate ``select`` first) so the
    char-fold runs once per row instead of once per signature slot."""
    hs = _c(hashes_col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(F.transform(hs, lambda h: minhash_perm(h, s))),
    )


def simhash30(tokens_col: ColumnOrName) -> Column:
    """30-bit SimHash from portable token hashes: bit j of the result is 1
    iff Σ_tokens (±1 depending on bit j of hash(token)) > 0."""
    tk = _c(tokens_col)
    hashes = F.transform(tk, poly_hash)

    def bit_vote(j: Column) -> Column:
        # shiftright/shiftleft only take literal shift amounts — use exact
        # integer arithmetic instead: bit j of h == (h div 2^j) % 2.
        p2 = F.pow(F.lit(2.0), j).cast("long")
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when((h / p2).cast("long") % 2 == 1, 1).otherwise(-1),
        )
        return F.when(votes > 0, p2).otherwise(F.lit(0).cast("long"))

    bits = F.transform(F.sequence(F.lit(0), F.lit(29)), bit_vote)
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


def word_shingles(col: ColumnOrName, n: int = 3) -> Column:
    """Distinct n-word shingles (the standard MinHash unit). On a random-word
    corpus unigram token sets collide constantly; n-word shingles are
    near-unique per document, so near-dup detection finds real duplicates
    instead of vocabulary overlap. Documents shorter than ``n`` words yield
    an empty shingle set (mirrors generate_series(1, 0) = [] in the oracle)."""
    tk = tokens(col)
    cnt = F.size(tk) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.array_join(F.slice(tk, i, F.lit(n)), " "),
    )
    empty = F.slice(tk, 1, 0)
    return F.array_distinct(F.when(cnt >= 1, grams).otherwise(empty))


def word_shingle_hashes(col: ColumnOrName, n: int = 3) -> Column:
    """Distinct WIDE hashes of n-word shingles, composed from per-WORD
    poly hashes as two parallel modular streams packed into one bigint:
    ``lo = ((wh_1*MIX + wh_2) % MOD * MIX + wh_3) % MOD`` (same with
    ``MIX2`` for ``hi``), result ``h = lo * MOD + hi``.

    Serves the same ROLE as ``poly_hash(word_shingles(...))`` — a distinct
    per-shingle fingerprint — but the VALUES differ (the old form folds the
    shingle's characters including the joining spaces; this folds per-word
    hashes), so the two are not interchangeable mid-pipeline. Each word's
    characters are folded ONCE instead of once per overlapping shingle —
    O(chars + shingles) vs O(shingles x shingle_len), ~3x fewer
    interpreted lambda steps for n=3. Collision bound: the packed hash
    lives in the ``MOD^2`` ~ 1e18 (~60-bit) space — a collision needs
    BOTH independently-mixed streams to collide on the same tuple pair,
    so even a 1e9-distinct-shingle corpus expects < 1 merged pair
    (vs ~0.4 per 30k-shingle DOCUMENT in the old single-stream ~30-bit
    form, which degraded shared-shingle counts with corpus size). The
    residual collision source is two different WORDS colliding in
    ``poly_hash``'s 30-bit space (both streams then agree by
    construction) — vocabulary-birthday-bounded, ~5e-4 per distinct word
    pair at a 1M-word vocabulary, and shared by every hash consumer. All
    intermediates stay below ``HASH_MOD * HASH_MIX`` ~ 2.7e18 < 2^63 and
    the pack below ``MOD^2 + MOD`` ~ 1e18 < 2^63, so the integer math is
    exact and engine-portable (the DuckDB mirror is
    ``_DUCK_WORD_SHINGLE_HASHES3`` in plans/queries.py). Documents shorter
    than ``n`` words yield an empty set, matching ``word_shingles``.

    Implementation note: the word-hash array is bound ONCE per row by
    wrapping it in a 1-element array and entering a ``transform`` lambda —
    referencing a non-trivial subexpression from inside a higher-order
    lambda re-evaluates it per ELEMENT (measured 3x slower than the
    per-shingle fold it was meant to replace). Shingle composition is then
    ``zip_with`` over shifted slices of the bound array — no per-element
    re-evaluation anywhere."""
    return F.array_distinct(
        _positional_gram_hashes(F.transform(tokens(col), poly_hash), n)
    )


def _positional_gram_hashes(wk_expr: Column, n: int) -> Column:
    """POSITIONAL packed two-stream ``n``-gram hashes over a per-word
    hash array expression (order-preserving, duplicates kept) — the ONE
    definition of the engine-portability-critical composition that
    ``word_shingle_hashes`` (distinct) and ``winnow_fingerprints``
    (window minima) both consume; the DuckDB oracle strings mirror this
    arithmetic char-for-char, so the composition must never fork.
    ``wk_expr`` is bound once per row via the 1-element-array
    ``transform`` trick (see ``word_shingle_hashes``)."""

    def compose(full):
        cnt = F.greatest(F.size(full) - (n - 1), F.lit(0))
        lo = F.slice(full, 1, cnt)
        hi = F.slice(full, 1, cnt)
        for j in range(1, n):
            nxt = F.slice(full, 1 + j, cnt)
            lo = F.zip_with(
                lo, nxt,
                lambda a, b: (a * F.lit(HASH_MIX) + b) % F.lit(HASH_MOD),
            )
            hi = F.zip_with(
                hi, nxt,
                lambda a, b: (a * F.lit(HASH_MIX2) + b) % F.lit(HASH_MOD),
            )
        return F.zip_with(lo, hi, lambda a, b: a * F.lit(HASH_MOD) + b)

    return F.element_at(F.transform(F.array(wk_expr), compose), 1)


def winnow_fingerprints(col: ColumnOrName, k: int = 3, w: int = 4) -> Column:
    """Robust-winnowing fingerprint set (Schleimer/Wilkerson/Aiken 2003,
    the MOSS scheme): positional wide ``k``-gram hashes (same two-stream
    composition as ``word_shingle_hashes`` but KEEPING positions), then
    one fingerprint per sliding window of ``w`` consecutive gram hashes —
    the window MINIMUM — distinct per document. Guarantee: any shared
    token run of length >= ``w + k - 1`` contributes at least one shared
    fingerprint (the shared windows select the same minimum), while only
    ~``2/(w+1)`` of grams are kept — sampling WITH a detection guarantee,
    unlike 0-mod-p fingerprinting. Value-set winnowing (distinct selected
    hash VALUES, not positions) — the dedup-relevant form.

    All arithmetic is the exact engine-portable integer hash space, so the
    selected minima are bit-identical in the DuckDB oracle. Both array
    stages bind their input via the 1-element-array ``transform`` trick
    (a lambda referencing an outer non-trivial expression re-evaluates it
    per element — see ``word_shingle_hashes``); the gram composition
    itself is the shared ``_positional_gram_hashes`` (one definition,
    mirrored by the oracles). Windows shorter than ``w`` (docs under
    ``w + k - 1`` tokens) yield an empty set."""

    def winnow(ghb: Column) -> Column:
        wcnt = F.size(ghb) - (w - 1)
        mins = F.transform(
            F.sequence(F.lit(1), wcnt),
            lambda j: F.array_min(F.slice(ghb, j, w)),
        )
        empty = F.slice(ghb, 1, 0)
        return F.array_distinct(F.when(wcnt >= 1, mins).otherwise(empty))

    gh = _positional_gram_hashes(F.transform(tokens(col), poly_hash), k)
    return F.element_at(F.transform(F.array(gh), winnow), 1)


def char_ngrams(col: ColumnOrName, n: int = 3) -> Column:
    """Character n-gram shingles."""
    s = _c(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(0))),
        lambda i: F.substr(s, i, F.lit(n)),
    )


def rolling_fingerprint(col: ColumnOrName) -> Column:
    """Whole-document rolling-hash fingerprint (north-star doc fingerprint)."""
    return poly_hash(col)


def stopword_ratio(tokens_col: ColumnOrName, stopwords: list[str] | None = None) -> Column:
    tk = _c(tokens_col)
    sw = [F.lit(w) for w in (stopwords or STOPWORDS)]
    n_stop = F.size(F.filter(tk, lambda t: t.isin(*[w for w in (stopwords or STOPWORDS)])))
    return n_stop.cast("double") / F.size(tk)


def marker_score(tokens_col: ColumnOrName, markers: list[str]) -> Column:
    tk = _c(tokens_col)
    return F.size(F.filter(tk, lambda t: t.isin(*markers)))
