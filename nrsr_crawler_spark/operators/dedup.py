"""Document deduplication suite — the training-data-pipeline operators the
task brief adds beyond the reference (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

Design rules:
 - everything is DataFrame ops (explode/join/groupBy) — shuffles keyed on
   shingles/signatures, never on document text;
 - hash primitives are portable (md5 / integer arithmetic) so every operator
   has an exact DuckDB oracle;
 - pair thresholds use INTEGER cross-multiplied comparisons
   (``common·2 ≥ union``) where possible, so float rounding can't flip a
   pair in or out.

Scale notes (100 TB of documents):
 - shingle explode multiplies rows by ~|doc|; the shuffle key (shingle) is
   high-cardinality and well distributed — no skew, linear in corpus size;
 - all-pairs verification happens ONLY within LSH buckets / shared shingles;
   brute-force O(n²) paths exist solely as tiny-side baselines;
 - stop-shingle guard: shingles shared by > ``max_df`` docs are dropped
   before the self-join (classic MinHash trick) so one boilerplate sentence
   cannot create a quadratic bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# -- tokenization / shingling (portable: split on single space) ---------------

def words(text: Column) -> Column:
    return F.split(text, " ")


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    posexplode + self-align via (pos, pos+1, .., pos+n-1) — expressed with
    array slicing so it stays in codegen.
    """
    arr = words(F.col(text_col))
    # shingle starting at i = words[i..i+n-1]: array slice + join stays in
    # codegen (a lead()-window formulation would shuffle per doc)
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(arr) - n, F.lit(-1))),
                lambda i: F.array_join(F.slice(arr, i + 1, n), " "),
            )
        ).alias("shingle"),
    )
    return sh.dropDuplicates([id_col, "shingle"])


# -- exact dedup ----------------------------------------------------------------

def exact_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: (content md5, kept id = min id, group size)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("kept_id"), F.count(F.lit(1)).alias("group_size"))
    )


# -- n-gram Jaccard (exact pairwise over shared shingles) -----------------------

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with |∩|/|∪| ≥ threshold_num/threshold_den —
    integer arithmetic: common·den ≥ (na+nb-common)·num.

    Only docs sharing ≥1 shingle are compared (self-join on shingle).
    """
    sh = word_shingles(df, id_col, text_col, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(df_counts.filter(F.col("df") <= max_df), "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .filter(
            F.col("common") * threshold_den
            >= (F.col("na") + F.col("nb") - F.col("common")) * threshold_num
        )
    )
    return out.select("id_a", "id_b", "common", "na", "nb")


# -- MinHash + LSH ---------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<string>): sig_j = min over shingles of md5(j || ':' || shingle).

    md5-as-minhash keeps the operator exactly reproducible in any engine
    (the DuckDB oracle computes the identical signature).  For raw speed the
    kernel can swap to xxhash64(shingle, j) without changing shape.
    Pass ``shingles`` (a :func:`word_shingles` result, ideally persisted) to
    avoid recomputing the explode when the caller needs it again.
    """
    sh = shingles if shingles is not None else word_shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(F.col(id_col), F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int = 2, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature, bucket-join: docs agreeing on ALL rows of ≥1 band."""
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Full pipeline: shingle → minhash → band → bucket join → exact Jaccard
    verification of the LSH candidates ONLY.

    Scale shape: the exact verification joins the candidate pairs back to
    their own shingle sets — work ∝ Σ|shingles(candidate docs)|, never the
    all-pairs shingle self-join (that quadratic join is what LSH exists to
    avoid; see :func:`jaccard_pairs` for the capped-frequency variant when
    you really want all pairs).

    The shingle explode (the dominant cost — |doc| rows per doc) is computed
    ONCE and persisted; signatures+sizes come out of a single fused
    aggregation over it, and the verification joins reuse the same cached
    shingles instead of re-exploding (halved the sf0.1 bench wall).  The
    surviving-pair result is materialized (localCheckpoint) so both caches
    can be unpersisted before returning — a long-lived driver calling this
    repeatedly must not leak cached shingle partitions (ADVICE r2)."""
    rows_per_band = num_hashes // bands
    sh = word_shingles(df, id_col, text_col, n).persist()
    # one shuffle on id computes the minhash signature AND the shingle count
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"h{j}")
        for j in range(num_hashes)
    ] + [F.count(F.lit(1)).alias("n_sh")]
    sig_sz = sh.groupBy(id_col).agg(*aggs).persist()
    sigs = sig_sz.select(
        F.col(id_col), F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig")
    )
    sizes = sig_sz.select(F.col(id_col), "n_sh")
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    a_sh = cands.join(sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
    common = (
        a_sh.join(sh.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .filter(
            F.col("common") * threshold_den
            >= (F.col("na") + F.col("nb") - F.col("common")) * threshold_num
        )
        .select("id_a", "id_b", "common", "na", "nb")
        .localCheckpoint()  # pair list is tiny; eager so the caches below can go
    )
    sh.unpersist()
    sig_sz.unpersist()
    return out


# -- SimHash ------------------------------------------------------------------------

def _hex4_to_int(h: Column) -> Column:
    """Portable hex-nibble → int (first 4 hex chars = 16 bits) using only
    instr/substring arithmetic so DuckDB can mirror it exactly."""
    digits = "0123456789abcdef"
    nib = lambda i: (F.instr(F.lit(digits), F.substring(h, i, 1)) - 1).cast("long")  # noqa: E731
    return nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over word tokens: bit_j = sign of Σ_tokens (±1 per token
    depending on token-hash bit j).  (id, simhash int)."""
    toks = df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("w"))
    th = toks.withColumn("h16", _hex4_to_int(F.md5(F.col("w"))))
    bit_sums = th.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h16"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(16)
        ]
    )
    sim = bit_sums.select(
        F.col(id_col),
        sum(
            [F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(16)],
            F.lit(0),
        ).alias("simhash"),
    )
    return sim


def simhash_pairs(sim: DataFrame, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance over the 16-bit simhash.

    Banding: split 16 bits into 4 nibbles; pairs within ``max_hamming ≤ 3``
    must agree on ≥1 nibble (pigeonhole) → bucket-join per nibble, then exact
    popcount verify.  Scales as Σ bucket², not n²."""
    nib = lambda c, i: F.shiftright(c, i * 4).bitwiseAND(15)  # noqa: E731
    banded = sim.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("band"), nib(F.col("simhash"), i).alias("key")) for i in range(4)])
        ).alias("bb"),
    ).select(F.col(id_col), "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    ham = sum(
        [F.shiftright(xor, j).bitwiseAND(1) for j in range(16)],
        F.lit(0),
    )
    return cands.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


# -- embedding cosine near-dup -----------------------------------------------------

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — JVM-side
    zip_with/aggregate, no Python."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_near_dups(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Brute-force O(n²) cosine pairs ≥ threshold (baseline; tiny inputs).

    The scale path is similarity.lsh_topk — random-hyperplane buckets first.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = pairs.withColumn(
        "cos_sim",
        cosine_sim(
            F.transform(F.col("va"), lambda x: x.cast("double")),
            F.transform(F.col("vb"), lambda x: x.cast("double")),
        ),
    )
    return sim.filter(F.col("cos_sim") >= threshold).select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    )


# -- incremental (cross-snapshot) dedup ----------------------------------------

def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Classify a NEW ingest batch against an EXISTING corpus snapshot —
    the production shape of dedup at 100 TB: the corpus is the crawl to
    date, the batch is today's increment, and re-deduplicating the whole
    union every day is exactly what must not happen.

    Verdict per batch doc (precedence order):
      - ``exact_dup``: byte-identical text exists in the corpus
        (md5 equi-join; ``matched_id`` = min such corpus id);
      - ``near_dup``: shares a full LSH band with a corpus doc AND the
        exact shingle Jaccard (verified, candidates only) clears
        ``threshold_num/threshold_den`` (``matched_id`` = min verified
        corpus id);
      - ``novel``: neither — the only rows that enter the corpus.

    Scale shape: batch-side work is O(|batch|); corpus-side work is one
    signature pass (at deploy scale the corpus signatures/banded buckets are
    PRECOMPUTED and stored — they are append-only state like the URL-seen
    set, so the daily cost is the batch side plus a bucket-join against the
    stored bands).  Shingle verification joins only candidate docs' shingle
    sets, never corpus×batch.  Batch-vs-corpus joins are on well-mixed md5
    keys; the band join inherits LSH's bucket cap behavior."""
    bid, cid = F.col(id_col).alias("batch_id"), F.col(id_col).alias("corpus_id")
    rows_per_band = num_hashes // bands
    b_ids = batch.select(bid)
    # exact layer
    c_exact = (
        corpus.select(F.md5(F.col(text_col)).alias("content_hash"), cid)
        .groupBy("content_hash")
        .agg(F.min("corpus_id").alias("exact_id"))
    )
    b_hash = batch.select(bid, F.md5(F.col(text_col)).alias("content_hash"))
    exact = b_hash.join(c_exact, "content_hash", "left").select("batch_id", "exact_id")
    # near layer: LSH bands both sides, candidates = (batch, corpus) bucket hits
    b_sh = word_shingles(batch, id_col, text_col, n)
    c_sh = word_shingles(corpus, id_col, text_col, n)
    b_sigs = minhash_signatures(batch, id_col, text_col, n, num_hashes, shingles=b_sh)
    c_sigs = minhash_signatures(corpus, id_col, text_col, n, num_hashes, shingles=c_sh)

    def banded(sigs: DataFrame, out_id: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(out_id),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    *[
                                        F.col("sig")[b * rows_per_band + r]
                                        for r in range(rows_per_band)
                                    ],
                                )
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(out_id, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    cands = (
        banded(b_sigs.withColumnRenamed(id_col, id_col), "batch_id")
        .join(banded(c_sigs, "corpus_id"), ["band", "bucket"])
        .select("batch_id", "corpus_id")
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    b_sizes = b_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("nb"))
    c_sizes = c_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("nc"))
    common = (
        cands.join(b_sh.select(F.col(id_col).alias("batch_id"), "shingle"), "batch_id")
        .join(
            c_sh.select(F.col(id_col).alias("corpus_id"), "shingle"),
            ["corpus_id", "shingle"],
        )
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    near = (
        common.join(b_sizes.select(F.col(id_col).alias("batch_id"), "nb"), "batch_id")
        .join(c_sizes.select(F.col(id_col).alias("corpus_id"), "nc"), "corpus_id")
        .filter(
            F.col("common") * threshold_den
            >= (F.col("nb") + F.col("nc") - F.col("common")) * threshold_num
        )
        .groupBy("batch_id")
        .agg(F.min("corpus_id").alias("near_id"))
    )
    return (
        b_ids.join(exact, "batch_id", "left")
        .join(near, "batch_id", "left")
        .select(
            "batch_id",
            F.when(F.col("exact_id").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
            F.coalesce("exact_id", "near_id").alias("matched_id"),
        )
    )


def neardup_keep_best(
    docs: DataFrame, pairs: DataFrame, id_col: str, quality_col: str
) -> DataFrame:
    """Quality-aware keep-one over near-dup components — the TEXT counterpart
    of image_dedup.neardup_manifest: instead of keeping the min-id member,
    keep the HIGHEST-QUALITY member of every connected component (ties → min
    id), so dedup removes the worse copy, not an arbitrary one.

    ``docs`` carries ``id_col`` and an integer ``quality_col`` (e.g. the
    classifier_quality_filter logit — integer so argmax is exact in any
    engine); ``pairs`` is the verified near-dup edge set (id_a, id_b).

    Output: one row per component ``(group_id, n_members, kept_id,
    kept_quality)``.

    Scale shape: components from the bounded-round min-label kernel; the
    winner per component is ONE partial-aggregated min(struct(-quality, id))
    groupBy — no window, no all-pairs, no UDF."""
    from nrsr_crawler_spark.operators.image_dedup import phash_connected_groups

    labels = phash_connected_groups(
        pairs.select("id_a", "id_b"), docs.select(id_col), id_col=id_col
    )
    member_q = labels.join(docs.select(id_col, quality_col), id_col)
    return (
        member_q.groupBy(F.col("rep").alias("group_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(
                F.struct(
                    (-F.col(quality_col)).alias("nq"), F.col(id_col).alias("i")
                )
            ).alias("w"),
        )
        .select(
            "group_id",
            "n_members",
            F.col("w.i").alias("kept_id"),
            (-F.col("w.nq")).alias("kept_quality"),
        )
    )


# -- Containment (asymmetric near-dup) -----------------------------------------

def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 8,
    threshold_den: int = 10,
    max_df: int | None = None,
) -> DataFrame:
    """Directed pairs where doc A is CONTAINED in doc B: Broder containment
    C(A,B) = |S(A)∩S(B)| / |S(A)| ≥ threshold (Broder 1997, "On the
    resemblance and containment of documents").

    Complements symmetric Jaccard: a short quote-post wholly embedded in a
    long article has tiny Jaccard (union is dominated by the article) but
    containment ≈ 1 — exactly the subset/expansion duplicates a training
    corpus needs pruned (keep the superset, drop the fragment).  Integer
    cross-multiplied threshold: common·den ≥ n_contained·num.

    Returns (contained_id, container_id, common, n_contained, n_container);
    both directions of an unordered pair may appear when the docs mutually
    contain each other (high resemblance).

    Scale shape: same as :func:`jaccard_pairs` — only docs sharing ≥1
    shingle meet (self-join on shingle, ``max_df`` stop-shingle cap kills
    hot shingles), one pair-count groupBy, two broadcast-size joins; the
    directed emit is a union of two filters over the SAME pair aggregate,
    not a second shingle join.
    """
    sh = word_shingles(df, id_col, text_col, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(df_counts.filter(F.col("df") <= max_df), "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
    )
    # single pass over the pair aggregate: a UNION of two filtered selects
    # would re-execute the whole shingle join + groupBy subtree twice (the
    # optimizer does not CSE across union branches); exploding a per-row
    # conditional array emits 0-2 directed rows from ONE aggregate.
    def arm(cid: str, kid: str, nc: str, nk: str) -> Column:
        return F.when(
            F.col("common") * threshold_den >= F.col(nc) * threshold_num,
            F.struct(
                F.col(cid).alias("contained_id"),
                F.col(kid).alias("container_id"),
                F.col("common").alias("common"),
                F.col(nc).alias("n_contained"),
                F.col(nk).alias("n_container"),
            ),
        )

    return (
        common.select(
            F.explode(
                F.filter(
                    F.array(arm("id_a", "id_b", "na", "nb"), arm("id_b", "id_a", "nb", "na")),
                    lambda s: s.isNotNull(),
                )
            ).alias("p")
        )
        .select("p.*")
    )
