"""Text analysis suite (training-data-pipeline operators): language-ID,
quality scoring, token counting, document fingerprinting.

Pure column expressions (codegen) over the ``documents`` table; ratios are
emitted as integer basis points (``round(x*10000)::bigint``) so every
operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword marker sets for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "sk": ("a", "je", "na", "sa", "to", "z", "v", "že"),
}

STOPWORDS_EN = LANG_MARKERS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, trimmed)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count word pieces + punctuation via regex — the classic
    'tokens ≈ words + punct + 0.3·long-word splits' estimator, here as the
    count of regex matches of word chunks of ≤4 chars."""
    # split every word into ceil(len/4) pieces: sum over words
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


def _marker_hits(text_tokens: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(text_tokens, lambda t: F.lower(t).isin(*markers)))


def lang_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Per-language marker-hit counts + predicted language (argmax, ties →
    lexicographic)."""
    toks = tokens(F.col(text_col))
    out = df
    for lang, markers in sorted(LANG_MARKERS.items()):
        out = out.withColumn(f"hits_{lang}", _marker_hits(toks, markers))
    # argmax with ties → lexicographically smallest language: build the
    # when-chain so the smallest lang is tested OUTERMOST (last wrap wins ties)
    pred = F.lit("unk")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            F.col(f"hits_{lang}")
            >= F.greatest(*[F.col(f"hits_{l2}") for l2 in sorted(LANG_MARKERS) if l2 != lang], F.lit(1)),
            F.lit(lang),
        ).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-scoring features: length, token count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio — integer/bps outputs."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop_hits = _marker_hits(toks, STOPWORDS_EN)
    bps = lambda num, den: F.round(num * 10000.0 / den).cast("long")  # noqa: E731
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        bps(F.length(F.regexp_replace(t, r"\s", "")), n_tok).alias("mean_word_len_centi"),
        bps(punct, F.length(t)).alias("punct_bps"),
        bps(upper, F.length(t)).alias("upper_bps"),
        bps(stop_hits, n_tok).alias("stopword_bps"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (portable rolling-hash stand-in with an exact oracle)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# PII patterns kept to constructs with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): explicit classes + bounded repetition, no
# backrefs/lookaround.  Redaction order matters for overlaps and is fixed:
# email → phone → ipv4.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phones", r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4s", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
)


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction signals (pre-training scrub stage): per-doc match
    counts per PII class (counted on the ORIGINAL text, independently per
    class) plus the md5 fingerprint of the fully redacted text — enough for
    a downstream policy (drop / keep-redacted) without shipping raw PII.

    Pure codegen column expressions (regexp_count / chained
    regexp_replace) — linear scan, no shuffle, no UDF."""
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]
    red = t
    for _name, pat, tok in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return df.select(F.col(id_col), *counts, F.md5(red).alias("redacted_fingerprint"))


def _ngram_counts(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id_col, gram, cnt) — per-doc n-gram occurrence counts (gram kept as
    the raw space-joined string: counts are per-doc, so volume is bounded by
    the doc's own token count and never shuffles cross-doc keys)."""
    tk = tokens(F.col(text_col))
    grams_arr = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(grams_arr).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def gopher_repetition(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al.,
    arXiv:2112.11446 table A1 — the "fraction of characters in the most
    common n-gram / in duplicate n-grams" quality filters), re-expressed on
    token counts so every ratio is an exact integer:

      - ``top2gram_bps``  = floor(10⁴ · 2·max₂cnt / n_tokens) — token mass of
        the most frequent 2-gram;
      - ``top3gram_bps``  = same for 3-grams;
      - ``dup2gram_bps``  = floor(10⁴ · 2·Σ{cnt≥2} cnt / n_tokens) — token
        mass of ALL repeated 2-grams.

    Docs with fewer tokens than the gram length emit 0 for that signal.

    Scale shape: each n-gram count groups on (doc, gram) — keys never cross
    documents, so the aggregation is partial-combined and skew-free; the
    doc-level rollup is a second linear pass on doc id.  No cross-doc join
    anywhere (contrast ``duplicated_span_stats``, which is the CROSS-doc
    variant)."""
    base = df.select(
        F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
    )

    def roll(n: int, prefix: str) -> DataFrame:
        cnts = _ngram_counts(df, id_col, text_col, n)
        return cnts.groupBy(id_col).agg(
            F.max("cnt").alias(f"{prefix}_max"),
            F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias(f"{prefix}_dup"),
        )

    r2 = roll(2, "g2")
    r3 = roll(3, "g3")
    bps = lambda num: F.when(  # noqa: E731
        F.col("n_tokens") == 0, F.lit(0).cast("long")
    ).otherwise((num * 10000).cast("long") / F.col("n_tokens")).cast("long")
    return (
        base.join(r2, id_col, "left")
        .join(r3, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            bps(F.coalesce("g2_max", F.lit(0)) * 2).alias("top2gram_bps"),
            bps(F.coalesce("g3_max", F.lit(0)) * 3).alias("top3gram_bps"),
            bps(F.coalesce("g2_dup", F.lit(0)) * 2).alias("dup2gram_bps"),
        )
    )


def duplicated_span_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Exact duplicated-substring detection à la Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (arXiv:2107.06499): every
    n-token window of every document is fingerprinted; a window whose exact
    token sequence also occurs in another document is a duplicate span.
    Emits per doc ``(n_windows, dup_windows, dup_bps)`` with ``dup_bps`` =
    floor(dup·10⁴/total) — integer, so the DuckDB oracle is hash-exact.

    Scale shape (100 TB): the window explode is linear in corpus tokens and
    map-side; windows shuffle ONCE as fixed-width md5 keys (never the raw
    n-gram strings), the per-key distinct-doc count is a partial-aggregated
    groupBy on a well-mixed key (no skew), and the doc-level rollup is a
    second linear pass keyed on ``id_col``.  Same shingle-join shape as
    ``dedup.ngram_jaccard`` — no all-pairs product anywhere.  (At petabyte
    scale you would fingerprint with xxhash64 instead of md5 and accept the
    2⁻⁶⁴ collision rate; md5 is kept here because both engines implement it
    identically, which keeps the oracle exact.)
    """
    tk = tokens(F.col(text_col))
    # guard: F.sequence(1, size-n+1) DESCENDS when size < n — emit [] instead
    grams_arr = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tk, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(F.col(id_col), F.explode(grams_arr).alias("gkey"))
    per_gram = grams.groupBy("gkey").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    per_doc = (
        grams.join(per_gram, "gkey")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("dup_windows"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("dup_windows * 10000 div n_windows"))
            .alias("dup_bps"),
        )
    )


def _disjoint_blocks(df: DataFrame, text_col: str, k: int, *keep_cols) -> DataFrame:
    """Explode each document into its disjoint ``k``-token blocks:
    one row per (``keep_cols``…, pos, block, bkey=md5(block)).  Shared by
    the block-dedup and boilerplate-strip operators so both see identical
    block boundaries."""
    tk = tokens(F.col(text_col))
    n_blocks = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.ceil(F.size(tk) / F.lit(k)).cast("int"))
    blocks_arr = F.when(
        n_blocks > 0,
        F.transform(
            F.sequence(F.lit(1), n_blocks),
            lambda i: F.array_join(F.slice(tk, (i - 1) * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(*keep_cols, F.posexplode(blocks_arr).alias("pos", "block")).withColumn(
        "bkey", F.md5("block")
    )


def remove_duplicate_blocks(
    df: DataFrame, id_col: str, text_col: str, k: int = 10
) -> DataFrame:
    """C4-style corpus-level duplicate-span REMOVAL (Raffel et al.,
    arXiv:1910.10683 §2.2: "we discarded all but one of any three-sentence
    span occurring more than once in the data set") — the cleaning
    counterpart of :func:`duplicated_span_stats`, which only measures.

    Spans here are DISJOINT ``k``-token blocks (the synthetic corpus has no
    sentence boundaries; disjoint blocks are the standard token-level
    restatement and guarantee each token belongs to exactly one span, so
    removal never double-deletes).  Global first-occurrence-wins: for every
    block content (md5 key) the single occurrence with the smallest
    ``(doc id, block position)`` is kept; every other occurrence — including
    repeats INSIDE one document — is deleted.  Emits the rebuilt document.

    Output: ``(id, n_blocks, removed_blocks, clean_text)``.

    Scale shape (100 TB): the block explode is ~|tokens|/k rows per doc
    (k× lighter than the sliding-window stats operator); blocks shuffle once
    as fixed-width md5 keys (well mixed, no skew), the global winner per key
    is one partial-aggregated ``min(struct(id, pos))`` groupBy, and the doc
    rebuild is a second groupBy on the doc id whose ``collect_list`` is
    bounded by the document's own length.  No all-pairs product, no window
    over the corpus, no UDF — three linear passes.
    """
    b = _disjoint_blocks(df, text_col, k, F.col(id_col))
    winners = b.groupBy("bkey").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("w")
    )
    tagged = b.join(winners, "bkey").withColumn(
        "kept", (F.col(id_col) == F.col("w.i")) & (F.col("pos") == F.col("w.p"))
    )
    per_doc = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("removed_blocks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("kept"), F.struct("pos", "block")))
                ),
                lambda s: s["block"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("removed_blocks", F.lit(0)).cast("long").alias("removed_blocks"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# Serving-side weights of a linear quality classifier (the GPT-3-style
# "quality filter": a logistic model scored over cheap doc features; Brown
# et al. arXiv:2005.14165 appendix A).  Training happens offline — these are
# MODEL STATE like the IVF codebook, inlined as integer literals so the
# logit is exact integer arithmetic and the keep decision oracle-exact.
QUALITY_CLF_WEIGHTS: dict[str, int] = {
    "__bias__": -60_000,
    "n_tokens": 200,           # longer docs score higher…
    "mean_word_len_centi": 1,  # …with plausible word lengths
    "stopword_bps": 40,        # English-function-word mass is the big signal
    "punct_bps": -8,           # punctuation walls / boilerplate punish
    "upper_bps": -12,          # SHOUTING punishes
}


def classifier_quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, int] | None = None,
    threshold: int = 0,
) -> DataFrame:
    """Model-based quality filtering: score each document with a linear
    classifier over :func:`quality_features` and emit
    ``(id, logit, keep)`` where ``logit = bias + Σ wᵢ·fᵢ`` (all integers —
    exact in any engine) and ``keep = logit ≥ threshold``.  The sigmoid is
    monotone, so thresholding the logit IS thresholding the probability;
    keeping it integer avoids the one float that would break hash-exact
    oracles.

    Scale shape: one codegen scan — features and dot product are column
    expressions, no shuffle, no UDF; the weight vector is a literal."""
    w = dict(QUALITY_CLF_WEIGHTS if weights is None else weights)
    bias = int(w.pop("__bias__", 0))
    feats = quality_features(df, id_col, text_col)
    logit = F.lit(bias).cast("long")
    for name, wi in sorted(w.items()):
        logit = logit + F.lit(int(wi)) * F.coalesce(F.col(name), F.lit(0))
    return feats.select(
        F.col(id_col),
        logit.alias("logit"),
        (logit >= threshold).alias("keep"),
    )


def vocab_coverage(df: DataFrame, id_col: str, text_col: str, k: int = 100) -> DataFrame:
    """Tokenizer-planning analytics: the corpus's top-``k`` vocabulary with
    cumulative token-mass coverage — the curve that decides vocab size /
    byte-fallback rates when fitting a tokenizer to a new corpus.

    Output: ``(rank, term, cnt, cum_share_bps)`` — rank by (count desc,
    term asc); ``cum_share_bps = (Σ_{r≤rank} cnt · 10⁴) div total_tokens``
    (integer, oracle-exact).

    Scale shape (100 TB): one partial-aggregated groupBy on term (the only
    O(corpus) shuffle, well-mixed key); the top-k is
    TakeOrderedAndProject (per-partition heads merged on the driver, never
    a global sort); the cumulative window runs over k rows only.  The
    1-row total is a scalar broadcast."""
    from pyspark.sql import Window

    terms = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    cnts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = terms.agg(F.count(F.lit(1)).alias("total"))
    top = cnts.orderBy(F.col("cnt").desc(), F.col("term")).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("term"))))
        .withColumn("cum_share_bps", F.expr("(sum(cnt) OVER (ORDER BY cnt DESC, term ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000) div total"))
        .select("rank", "term", "cnt", "cum_share_bps")
    )


def length_quantiles(
    df: DataFrame, id_col: str, text_col: str, strata_col: str, qs: tuple[int, ...] = (50, 90)
) -> DataFrame:
    """Exact per-stratum token-length quantiles (dataset-card analytics):
    for each stratum, ``p{q}_dl`` = the discrete q-th percentile of document
    token counts — the value at rank ⌈q·n/100⌉ under (length, id) order,
    i.e. ``percentile_disc`` semantics, stated in integer arithmetic so any
    engine agrees.

    Scale shape (100 TB): NOT a per-stratum row window (that funnels each
    stratum through one task).  Instead a histogram formulation: one
    partial-aggregated groupBy on (stratum, length) — bounded by distinct
    lengths, not documents — then the cumulative window runs over
    |distinct lengths| rows per stratum.  The quantile is the smallest
    length whose cumulative count reaches the target rank (identical to the
    rank definition)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(strata_col).alias("stratum"),
        F.size(tokens(F.col(text_col))).alias("dl"),
    )
    hist = base.groupBy("stratum", "dl").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("stratum").orderBy("dl").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("stratum")
    cum = hist.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(wn)
    )
    aggs = [F.max("n").alias("n_docs")]
    for q in qs:
        target = F.expr(f"({q} * n + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("dl"))).alias(f"p{q}_dl")
        )
    return cum.groupBy("stratum").agg(*aggs)


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, size: int = 64, stride: int = 48
) -> DataFrame:
    """Sliding-window document chunking (pretraining/RAG prep): token windows
    of ``size`` starting every ``stride`` tokens (overlap = size − stride),
    the standard long-document treatment when sequences exceed the context
    window.  Chunk i covers tokens [i·stride+1 .. i·stride+size]; chunks are
    emitted while their start is in range, so the tail chunk may be short.
    Empty documents emit no chunks.

    Output: ``(id, chunk_idx, chunk_text, n_chunk_tokens)``.

    Scale shape: pure map-side — tokenize, slice, explode; output volume is
    ~|tokens|/stride rows per doc; no shuffle at all (downstream packing /
    shard-writing owns the exchange)."""
    tk = tokens(F.col(text_col))
    n = token_count(F.col(text_col))
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        F.floor((n - 1) / stride).cast("int") + 1
    )
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.array_join(F.slice(tk, i * stride + 1, size), " ").alias("chunk_text"),
                F.least(F.lit(size), n - i * stride).cast("int").alias("n_chunk_tokens"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_idx:int,chunk_text:string,n_chunk_tokens:int>>"))
    return df.select(F.col(id_col), F.explode(chunks).alias("ch")).select(
        F.col(id_col),
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.chunk_text").alias("chunk_text"),
        F.col("ch.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def bigram_coherence(
    df: DataFrame, id_col: str, text_col: str, k: int = 200
) -> DataFrame:
    """Bigram-LM coherence proxy (the integer-exact stand-in for KenLM-style
    perplexity filtering): score each document by the share of its adjacent
    token pairs that land in the corpus's top-``k`` bigram table.  Fluent
    in-domain text reuses the corpus's frequent collocations; gibberish,
    boilerplate keyword stuffing, and wrong-language text do not — the same
    signal an n-gram LM perplexity threshold captures, without floating
    point (count ratios in basis points, so the oracle is hash-exact).

    Output: ``(doc_id, n_bigrams, top_hits, coherence_bps)`` with
    ``coherence_bps = top_hits·10⁴ div n_bigrams`` (0 for <2-token docs).

    Scale shape (100 TB): bigrams are formed INSIDE the token array
    (``transform`` over the array — map-side, no per-doc window/shuffle);
    the corpus bigram count is the one O(corpus) partial-aggregated groupBy
    on a well-mixed key; top-k is TakeOrderedAndProject (deterministic
    (cnt desc, bigram) order); scoring is a broadcast semi-join of the k-row
    table against the exploded pairs — the corpus never re-shuffles."""
    bg = F.when(
        F.col("n") >= 2,
        F.expr("transform(sequence(0, n - 2), i -> concat(tk[i], ' ', tk[i + 1]))"),
    ).otherwise(F.expr("array()").cast("array<string>"))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("tk"),
        token_count(F.col(text_col)).alias("n"),
    ).withColumn("bg", bg)
    pairs = base.select("doc_id", F.explode("bg").alias("b"))
    top = (
        pairs.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("b"))
        .limit(k)
        .select("b")
    )
    hits = (
        pairs.join(F.broadcast(top), "b", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("top_hits"))
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.size("bg").cast("long").alias("n_bigrams"),
            F.coalesce("top_hits", F.lit(0)).cast("long").alias("top_hits"),
            F.when(F.size("bg") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("(coalesce(top_hits, 0) * 10000) div size(bg)")
            )
            .alias("coherence_bps"),
        )
    )


def strip_boilerplate_blocks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 5,
    min_docs: int = 2,
    min_doc_bps: int = 0,
) -> DataFrame:
    """Per-group (per-host / per-source) boilerplate REMOVAL, CCNet-style
    (Wenzek et al., arXiv:1911.00359 strip repeated lines per shard; nav
    bars, cookie banners, footers repeat across one site's pages).  The
    frequency-threshold counterpart of :func:`remove_duplicate_blocks`:
    C4 keeps the FIRST occurrence of a duplicated span globally, while
    boilerplate is defined by how many of the group's documents contain the
    block — and every occurrence is stripped, the first included.

    A block is boilerplate within its group iff it appears in
    ``>= min_docs`` distinct documents AND in ``>= min_doc_bps`` basis
    points of the group's documents (both integer-exact).  Blocks are the
    same disjoint ``k``-token spans as the block-dedup operator (the
    synthetic corpus has no newlines; on real pages the splitter would be
    line-level).

    Output: ``(id, group, n_blocks, boiler_blocks, clean_text)``.

    Scale shape (100 TB): one block explode (|tokens|/k rows), a distinct +
    partial-aggregated count on (group, bkey) — fixed-width md5 keys, well
    mixed, no skew even when one host dominates the corpus — one tiny
    group-size aggregate joined group-wise, then one hash join of blocks
    against the flagged set on the same mixed key and a per-document
    rebuild groupBy bounded by each document's own length.  No window over
    the corpus, no all-pairs, no UDF."""
    b = _disjoint_blocks(df, text_col, k, F.col(id_col), F.col(group_col))
    docfreq = (
        b.select(group_col, "bkey", id_col)
        .distinct()
        .groupBy(group_col, "bkey")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    gsize = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__gdocs"))
    flagged = (
        docfreq.join(F.broadcast(gsize), group_col)
        .filter(
            (F.col("doc_freq") >= min_docs)
            & (F.col("doc_freq") * 10000 >= F.col("__gdocs") * min_doc_bps)
        )
        .select(group_col, "bkey", F.lit(True).alias("__boiler"))
    )
    tagged = b.join(flagged, [group_col, "bkey"], "left").withColumn(
        "kept", F.col("__boiler").isNull()
    )
    per_doc = tagged.groupBy(id_col, group_col).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("boiler_blocks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("kept"), F.struct("pos", "block")))
                ),
                lambda s: s["block"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        df.select(id_col, group_col)
        .join(per_doc, [id_col, group_col], "left")
        .select(
            F.col(id_col),
            F.col(group_col),
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("boiler_blocks", F.lit(0)).cast("long").alias("boiler_blocks"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def cdc_chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 3,
    divisor: int = 8,
) -> DataFrame:
    """Content-defined chunking (CDC — the FastCDC/rsync boundary idea,
    token-level): a chunk boundary falls AFTER token ``i`` iff the hash of
    the ``w``-token window ending at ``i`` satisfies ``h % divisor == 0``.
    Boundaries depend only on LOCAL content, so an insertion or deletion
    re-chunks a bounded neighborhood and every other chunk keeps its
    identity — the property that makes chunk-level dedup robust to edits,
    where fixed blocks (:func:`_disjoint_blocks`) shift wholesale after any
    insertion.

    Hash: the first 4 hex nibbles of md5 of the space-joined window — an
    integer in [0, 65536) identical in any engine (no rolling state needed
    for correctness; a deployment would swap in a gear hash for speed, same
    boundaries contract).  Expected chunk length ≈ ``divisor`` tokens; no
    min/max clamp (a clamp makes eligibility depend on the previous
    boundary — sequential — and breaks pure content-definedness).

    Output: ``(id, chunk_idx, start_pos, n_tokens, chunk_text, chunk_hash)``
    (1-based start_pos; docs shorter than ``w`` are one chunk).

    Scale shape (100 TB): boundary detection, chunk slicing, and hashing
    are all array expressions INSIDE each row — zero shuffle, zero UDF,
    zero windows over the corpus; chunk rows explode bounded by the doc's
    own length (the oracle uses the equivalent relational window form)."""
    tk = tokens(F.col(text_col))
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(tk))

    def h16(win: Column) -> Column:
        return F.conv(F.substring(F.md5(win), 1, 4), 16, 10).cast("long")

    cut = F.when(
        n >= w,
        F.filter(
            F.sequence(F.lit(w), n),
            lambda i: h16(F.array_join(F.slice(tk, i - w + 1, w), " ")) % divisor == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    # bounds = [0, cut..., n] (distinct keeps order; n may repeat the last cut)
    bounds = F.concat(
        F.array(F.lit(0)), F.array_distinct(F.concat(cut, F.array(n)))
    )
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), F.size(bounds) - 1),
            lambda j: F.struct(
                (j - 1).alias("chunk_idx"),
                (F.element_at(bounds, j) + 1).alias("start_pos"),
                (F.element_at(bounds, j + 1) - F.element_at(bounds, j)).alias(
                    "n_tokens"
                ),
                F.array_join(
                    F.slice(
                        tk,
                        F.element_at(bounds, j) + 1,
                        F.element_at(bounds, j + 1) - F.element_at(bounds, j),
                    ),
                    " ",
                ).alias("chunk_text"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:int,start_pos:int,n_tokens:int,chunk_text:string>>"
    ))
    return df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        F.col(id_col),
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.start_pos").cast("long").alias("start_pos"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.md5(F.col("c.chunk_text")).alias("chunk_hash"),
    )


# -- BPE merge-pair counting (tokenizer-training prep) --------------------------

def bpe_pair_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the first merge step
    of BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units"): the highest-count pair
    is the first merge rule; re-running after each merge yields the full
    vocabulary.  This computes the counting kernel the trainer loops on.

    Pairs are word-internal (BPE never merges across whitespace), counted
    over word INSTANCES so frequent words weigh more, via pure codegen:
    explode words, explode positions 1..len-1, substring(w, i, 2), one
    partial-aggregated groupBy.  No Python, no window; at 100 TB the pair
    domain is ≤ |charset|² keys so the final aggregate is tiny.

    Returns (pair string, n long).
    """
    w = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    return (
        w.select(
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
            F.col("w"),
        )
        .select(F.substring(F.col("w"), F.col("i"), 2).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
