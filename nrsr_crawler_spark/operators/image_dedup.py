"""Image near-duplicate detection over the input_hint table's ``phash``
column (image_id, bytes, w, h, fmt, caption, phash:int64) — the image-payload
counterpart of the text SimHash dedup (operators/dedup.py simhash_pairs).

A perceptual hash maps visually-similar images to int64s within a small
Hamming distance, so near-dup detection is a Hamming-ball self-join on the
phash column — no pixel decode in the hot path; bytes stay untouched.

Scale shape (the part that must survive 10^10 rows): split the 64-bit hash
into ``n_bands`` byte bands; by pigeonhole, any pair within Hamming
``max_hamming ≤ n_bands - 1`` agrees exactly on at least one band.  Join on
(band_index, band_value) buckets, then verify candidates with one
``bit_count(xor)`` — work is Σ bucket², never n², and the band join
shuffles on well-mixed single-byte keys.  Same construction the text-side
SimHash uses (dedup.py:249), lifted to 64 bits / 8 bands.

Caveat a real corpus needs handled: a constant-ish band (e.g. flat-sky
images all hashing 0x00 in band 7) creates a hot bucket.  ``max_df`` drops
band-values whose bucket exceeds the cap — identical semantics to the
stop-shingle cap in the n-gram dedup (dedup.py:70) — trading recall only on
pairs whose OTHER agreeing bands are also capped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phash_bands(images: DataFrame, id_col: str = "image_id", phash_col: str = "phash", n_bands: int = 8) -> DataFrame:
    """(id, phash, band, key): one row per byte band of the 64-bit phash."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col(phash_col), i * width).bitwiseAND(mask).alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    return images.select(F.col(id_col), F.col(phash_col), F.explode(bands).alias("bb")).select(
        F.col(id_col), F.col(phash_col), F.col("bb.band").alias("band"), F.col("bb.key").alias("key")
    )


def phash_neardup_pairs(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 6,
    n_bands: int = 8,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a, id_b, hamming) with Hamming(phash_a, phash_b) ≤
    ``max_hamming``, id_a < id_b.  Exact (full recall) while
    ``max_hamming ≤ n_bands - 1`` and no bucket is dropped by ``max_df``."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"pigeonhole needs max_hamming <= n_bands-1 ({max_hamming} > {n_bands - 1})"
        )
    banded = phash_bands(images, id_col, phash_col, n_bands)
    if max_df is not None:
        hot = (
            banded.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("band", "key")
        )
        banded = banded.join(hot, ["band", "key"], "left_anti")
    a = banded.select(F.col(id_col).alias("id_a"), F.col(phash_col).alias("ph_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), F.col(phash_col).alias("ph_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def phash_neardup_groups(
    pairs: DataFrame, images: DataFrame, id_col: str = "image_id"
) -> DataFrame:
    """Min-id representative per near-dup cluster (single-link over the pair
    edges' first hop — the exact-dedup convention of dedup.py): every id
    maps to the smallest id it pairs with, itself if none.  One pass, no
    iterative connected components — sufficient for the keep-one-of-each
    training-data policy where pair edges are already transitive within a
    Hamming ball."""
    best = (
        pairs.select(F.col("id_b").alias(id_col), F.col("id_a").alias("rep"))
        .groupBy(id_col)
        .agg(F.min("rep").alias("rep"))
    )
    return images.select(id_col).join(best, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("rep"), F.col(id_col)).alias("rep"),
    )


def phash_connected_groups(
    pairs: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    max_rounds: int = 30,
    method: str = "propagate",
) -> DataFrame:
    """FULL connected components over the near-dup pair edges — the flagged
    alternative to :func:`phash_neardup_groups`' single-hop convention, for
    CHAIN-shaped clusters (a—b—c within distance d pairwise-adjacent but
    a—c beyond it): single-hop maps c→b while the whole chain is one
    component and should keep one representative.

    Iterated min-label propagation to fixpoint: each round every node takes
    the min label among itself and its neighbors — one join + one aggregate
    over (|edges| + |nodes|) rows, ``localCheckpoint`` truncating lineage.
    Round count is the component DIAMETER, which for near-dup balls is small
    and bounded (a Hamming-ball chain of length L needs L rounds; real
    near-dup graphs are dense blobs, 2-4 rounds).  Raises after
    ``max_rounds`` instead of silently under-merging.

    Returns (id, rep) for EVERY image, rep = min id of its component —
    deterministic, engine-portable (a recursive-CTE oracle derives the same
    fixpoint).

    ``method="star"`` dispatches to :func:`star_contraction_components`
    (same contract, ~⌈log₂ diameter⌉ rounds) — the flagged choice for
    adversarial chain-shaped components; ``propagate`` (default, frozen
    behavior) is fine for near-dup balls (diameter 2-4)."""
    if method == "star":
        return star_contraction_components(
            pairs, images, id_col=id_col, max_rounds=max_rounds
        )
    if method != "propagate":
        raise ValueError(f"method {method!r}")
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = images.select(F.col(id_col).alias("a"), F.col(id_col).alias("rep")).localCheckpoint()
    for _ in range(max_rounds):
        prop = edges.join(labels, "a").select(F.col("b").alias("a"), "rep")
        new_labels = (
            labels.unionByName(prop).groupBy("a").agg(F.min("rep").alias("rep"))
        ).localCheckpoint()
        changed = (
            new_labels.join(labels.withColumnRenamed("rep", "__old"), "a")
            .filter(F.col("rep") != F.col("__old"))
            .count()
        )
        old = labels
        labels = new_labels
        old.unpersist()
        if changed == 0:
            return labels.select(F.col("a").alias(id_col), "rep")
    raise RuntimeError(
        f"phash_connected_groups did not converge in {max_rounds} rounds "
        f"(component diameter exceeds the bound; raise max_rounds)"
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star step (Kiveris et al., 'Connected Components in MapReduce
    and Beyond', SOCC 2014, Alg. 3): every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.least(F.col("mn"), F.col("a")).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star step (ibid., Alg. 4): orient every edge high→low, then every
    node connects its (smaller) neighbors and itself to the minimum one."""
    oriented = (
        edges.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("mn"))
    nbrs = oriented.join(mins, "a").select(F.col("b").alias("a"), F.col("mn").alias("b"))
    selfe = mins.select("a", F.col("mn").alias("b"))
    return nbrs.unionByName(selfe).filter(F.col("a") != F.col("b")).distinct()


def star_contraction_components(
    pairs: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    max_rounds: int = 20,
    rounds_out: list | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star contraction
    (Kiveris et al., SOCC 2014) — the O(log n)-round alternative to
    :func:`phash_connected_groups`' min-label propagation, whose round count
    is the component DIAMETER.  For adversarial chain shapes (a path of L
    pairwise-near images) propagation needs L rounds; star contraction
    converges in ~⌈log₂ L⌉ rounds (asserted in tests/test_image_dedup.py on
    the chain fixture), because each alternation at least halves every
    non-star component's height.

    Same contract as phash_connected_groups: returns (id, rep) for EVERY
    image, rep = min id of its component, matching the recursive-CTE oracle.

    Scale shape: each round is two groupBy+join passes over O(|E|) rows; the
    edge set never exceeds |E|+|V| (large-star emits ≤1 edge per symmetric
    edge, small-star ≤1 per oriented edge + 1 per node), and
    ``localCheckpoint`` truncates lineage so the plan stays O(1) per round.
    Hot keys (a huge component's root accumulating degree) are exactly the
    case the algorithm is designed for — the root's bucket is the component,
    already the output.  ``rounds_out``, when a list, receives the converged
    round count (for bound assertions / metrics)."""
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).localCheckpoint()
    for rnd in range(1, max_rounds + 1):
        nxt = _small_star(_large_star(edges)).localCheckpoint()
        stable = (
            nxt.count() == edges.count()
            and nxt.subtract(edges).count() == 0
        )
        old = edges
        edges = nxt
        old.unpersist()
        if stable:
            if rounds_out is not None:
                rounds_out.append(rnd)
            stars = edges.select(F.col("a").alias(id_col), F.col("b").alias("rep"))
            return images.select(id_col).join(stars, id_col, "left").select(
                F.col(id_col),
                F.coalesce(F.col("rep"), F.col(id_col)).alias("rep"),
            )
    raise RuntimeError(
        f"star_contraction_components did not converge in {max_rounds} rounds"
    )


def neardup_manifest(
    groups: DataFrame,
    quality: DataFrame,
    id_col: str = "image_id",
) -> DataFrame:
    """Near-dup-aware training-data manifest: from each near-dup group keep
    the SMALLEST-id member that passes the quality gate — the step a
    multimodal pretraining pipeline runs between dedup and shard-writing
    (keep one copy per visual cluster, and make it a usable one, instead of
    blindly keeping the min id which may be the corrupt/tiny variant).

    ``groups`` is (id, rep) from :func:`phash_neardup_groups` or
    :func:`phash_connected_groups`; ``quality`` is (id, ok:boolean).  Output
    one row per group with at least one passing member:
    (rep, kept_id = min passing id, n_members, n_quality).  Groups whose
    every member fails the gate are dropped — nothing worth training on.

    Scale shape: one broadcast-or-shuffle equi-join on id + one groupBy on
    rep.  Group keys are near-dup representatives — high cardinality, no
    skew (group sizes are Hamming-ball sized, not power-law)."""
    joined = groups.join(quality, id_col)
    return (
        joined.groupBy("rep")
        .agg(
            F.min(F.when(F.col("ok"), F.col(id_col))).alias("kept_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("ok").cast("int")).alias("n_quality"),
        )
        .filter(F.col("kept_id").isNotNull())
    )


def caption_star_edges(
    images: DataFrame, id_col: str = "image_id", caption_col: str = "caption"
) -> DataFrame:
    """Exact-caption duplicate edges in STAR form: every image links to the
    min-id member of its caption class (id_a < id_b, class singletons emit
    nothing).  Stars induce the same connected components as the full
    per-class clique at O(n) edges instead of O(n²) — the only shape that
    survives a popular caption (e.g. "stock photo" × 10^6) at corpus scale."""
    reps = (
        images.groupBy(caption_col)
        .agg(F.min(id_col).alias("id_a"), F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select(caption_col, "id_a")
    )
    return (
        images.join(reps, caption_col)
        .filter(F.col(id_col) != F.col("id_a"))
        .select("id_a", F.col(id_col).alias("id_b"))
    )


def crossmodal_groups(
    images: DataFrame,
    phash_pairs: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    max_rounds: int = 30,
) -> DataFrame:
    """Cross-modal near-dup grouping: two records are duplicates if their
    IMAGES are perceptually close (``phash_pairs``) OR their CAPTIONS are
    exactly equal — the union graph's connected components.  Catches the two
    multimodal-corpus failure modes a single-modality pass misses: the same
    photo recaptioned, and the same boilerplate caption on recropped
    variants.  Returns (id, rep) for every image."""
    edges = phash_pairs.select("id_a", "id_b").unionByName(
        caption_star_edges(images, id_col, caption_col)
    )
    return phash_connected_groups(edges, images, id_col=id_col, max_rounds=max_rounds)


# -- tile hashing: crop/re-encode-resistant near-dup ---------------------------

TILE_SCHEMA = "image_id string, tr int, tc int, tile_hash long"


def tile_hashes(images: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes", tile: int = 16) -> DataFrame:
    """Per-image grid of origin-aligned ``tile``×``tile`` pixel tiles, each
    perceptually hashed — the robust-hash family behind crop-resistant image
    dedup (Steinebach 2011-style segment hashing): a single global phash
    flips many bits when an image is padded or cropped, but interior tiles
    hash identically, so near-dups survive as "≥ m matching tiles".

    Resists: lossy re-encode (per-tile phash, not byte hash), right/bottom
    crops and pad-extends (tiles are ORIGIN-aligned absolute pixel blocks,
    so surviving regions keep their (tr, tc) coordinates).  Arbitrary-offset
    crops shift tile boundaries and need keypoint alignment — out of scope,
    documented, same limitation as the published segment-hash schemes.

    One Arrow decode pass (mapInPandas over the bytes column, the only
    pixel touch); emits (image_id, tr, tc, tile_hash) — ≤ (w//tile)·(h//tile)
    rows per image, partial tiles at the ragged edge skipped so a crop
    can't perturb kept hashes.
    """
    import pandas as pd

    from nrsr_crawler_spark.sources.images import decode_image_any, phash64

    src = images.select(F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"))

    def _gen(batches):
        for pdf in batches:
            out = {"image_id": [], "tr": [], "tc": [], "tile_hash": []}
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px, _ = decode_image_any(bytes(data))
                h, w = px.shape
                for r in range(h // tile):
                    for c in range(w // tile):
                        t = px[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile]
                        out["image_id"].append(iid)
                        out["tr"].append(r)
                        out["tc"].append(c)
                        out["tile_hash"].append(phash64(t))
            yield pd.DataFrame(out)

    return src.mapInPandas(_gen, schema=TILE_SCHEMA)


def tile_neardup_pairs(
    tiles: DataFrame,
    min_matching_tiles: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, n_match) sharing ≥ ``min_matching_tiles`` tiles at
    the SAME (tr, tc) coordinate with the SAME tile hash.

    Scale shape: self-join on the (tr, tc, tile_hash) bucket key — work is
    Σ bucket², never n²; ``max_df`` drops hot buckets (flat black/white
    tiles that would otherwise pair every letterboxed image with every
    other) with the same semantics as the stop-shingle cap in
    dedup.jaccard_pairs; one pair-count groupBy ends the plan.
    """
    key = ["tr", "tc", "tile_hash"]
    t = tiles
    if max_df is not None:
        hot = (
            t.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select(*key)
        )
        t = t.join(hot, key, "left_anti")
    a = t.select(F.col("image_id").alias("id_a"), *key)
    b = t.select(F.col("image_id").alias("id_b"), *key)
    return (
        a.join(b, key)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_match"))
        .filter(F.col("n_match") >= min_matching_tiles)
    )
