"""phash Hamming near-dup invariants: banded pair search equals brute
force (full recall at max_hamming ≤ n_bands-1), hot-bucket cap semantics,
cluster representative mapping."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import image_dedup as ID


def _images(spark, n=400, seed=3, planted=40):
    """Random 64-bit phashes + ``planted`` near-dup partners at Hamming 1-3."""
    rng = np.random.default_rng(seed)
    base = rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
    rows = [(f"img{i:06d}", int(base[i])) for i in range(n)]
    for j in range(planted):
        src = int(base[j])
        flipped = src
        for b in rng.choice(64, size=int(rng.integers(1, 4)), replace=False):
            flipped ^= 1 << int(b)
        # two's-complement wrap in pure Python ints: an out-of-bound uint64→
        # int64 numpy cast is deprecated (future numpy hard-fails it)
        v = flipped & (2**64 - 1)
        rows.append((f"img{j:06d}_nd", v - 2**64 if v >= 2**63 else v))
    return spark.createDataFrame(rows, "image_id string, phash long")


def _bruteforce(spark, images, max_hamming):
    a = images.select(F.col("image_id").alias("id_a"), F.col("phash").alias("ph_a"))
    b = images.select(F.col("image_id").alias("id_b"), F.col("phash").alias("ph_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def test_banded_equals_bruteforce(spark):
    images = _images(spark)
    got = ID.phash_neardup_pairs(images, max_hamming=6, n_bands=8)
    want = _bruteforce(spark, images, 6)
    assert got.count() == want.count() >= 40  # planted partners all found
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_pigeonhole_bound_enforced(spark):
    images = _images(spark, n=10, planted=0)
    try:
        ID.phash_neardup_pairs(images, max_hamming=8, n_bands=8)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_max_df_drops_hot_bucket_only(spark):
    """All-zero phashes share every band (one giant bucket).  With max_df
    the hot buckets drop and the pathological n² pair-out disappears, while
    a disjoint well-mixed pair is still found."""
    n = 200
    rows = [(f"z{i:04d}", 0) for i in range(n)]
    rows += [("wm0001", 0x1234_5678_9ABC_DEF0), ("wm0002", 0x1234_5678_9ABC_DEF1)]
    images = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = ID.phash_neardup_pairs(images, max_hamming=3, n_bands=8, max_df=50)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("wm0001", "wm0002") in got
    assert not any(a.startswith("z") for a, _ in got)  # hot bucket capped


def test_group_representatives(spark):
    images = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 3), ("d", 0x00FF00FF00FF00FF)],
        "image_id string, phash long",
    )
    pairs = ID.phash_neardup_pairs(images, max_hamming=2, n_bands=8)
    reps = {r["image_id"]: r["rep"] for r in ID.phash_neardup_groups(pairs, images).collect()}
    assert reps == {"a": "a", "b": "a", "c": "a", "d": "d"}


def _chain_images(spark, groups=6, length=5):
    """Chains: member j of a group flips bits 8..8+j-1 of the group base, so
    consecutive members are Hamming 1 apart and the ends are ``length-1``."""
    rng = np.random.default_rng(11)
    rows = []
    for g in range(groups):
        base = int(rng.integers(-(2**63), 2**63 - 1, dtype=np.int64))
        for j in range(length):
            v = (base ^ (((1 << j) - 1) << 8)) & (2**64 - 1)
            rows.append((f"img{g:03d}_{j}", v - 2**64 if v >= 2**63 else v))
    return spark.createDataFrame(rows, "image_id string, phash long")


def _union_find_oracle(rows, pairs):
    parent = {r: r for r, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for r, _ in rows:
        comp.setdefault(find(r), []).append(r)
    return {i: min(members) for root, members in comp.items() for i in members}


def test_connected_groups_merge_chains_where_single_hop_undermerges(spark):
    images = _chain_images(spark)
    pairs = ID.phash_neardup_pairs(images, max_hamming=1, n_bands=8)
    pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    rows = [(r["image_id"], r["phash"]) for r in images.collect()]

    expected = _union_find_oracle(rows, pair_rows)
    got = {r["image_id"]: r["rep"] for r in ID.phash_connected_groups(pairs, images).collect()}
    assert got == expected
    # each chain is ONE component rooted at its j=0 member
    assert all(rep.endswith("_0") for rep in got.values())

    # the single-hop convention demonstrably under-merges the chain tails
    single = {r["image_id"]: r["rep"] for r in ID.phash_neardup_groups(pairs, images).collect()}
    assert single != expected
    assert any(not rep.endswith("_0") for rep in single.values())


def test_crossmodal_groups_merge_caption_and_phash_edges(spark):
    from nrsr_crawler_spark.operators.image_dedup import (
        caption_star_edges,
        crossmodal_groups,
    )

    # a,b: phash-close, different captions; b,c: same caption, far phash;
    # d: singleton on both modalities
    images = spark.createDataFrame(
        [
            ("a", 0b1000, "x"),
            ("b", 0b1001, "y"),
            ("c", 0b1111111100000000, "y"),
            ("d", -1, "z"),
        ],
        "image_id string, phash long, caption string",
    )
    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    stars = caption_star_edges(images).collect()
    assert [(r.id_a, r.id_b) for r in stars] == [("b", "c")]
    groups = {r.image_id: r.rep for r in crossmodal_groups(images, pairs).collect()}
    # a-b (phash) and b-c (caption) chain into one component; d stays alone
    assert groups == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_star_contraction_matches_oracle_with_log_rounds(spark):
    """Round-4 verdict item 4: the flagged star-contraction CC (Kiveris et
    al. 2014) matches the union-find oracle on an adversarial chain in
    ~log2(L) rounds, where min-label propagation needs L rounds (diameter)."""
    import math

    length = 40
    images = _chain_images(spark, groups=2, length=length)
    pairs = ID.phash_neardup_pairs(images, max_hamming=1, n_bands=8)
    pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    rows = [(r["image_id"], r["phash"]) for r in images.collect()]
    expected = _union_find_oracle(rows, pair_rows)

    rounds: list[int] = []
    got = {
        r["image_id"]: r["rep"]
        for r in ID.star_contraction_components(pairs, images, rounds_out=rounds).collect()
    }
    assert got == expected
    assert rounds and rounds[0] <= math.ceil(math.log2(length)) + 2

    # propagation's round count is the component diameter — a 40-chain
    # overruns a 12-round budget where star contraction converged above
    with pytest.raises(RuntimeError, match="did not converge"):
        ID.phash_connected_groups(pairs, images, max_rounds=12)

    # the flagged dispatch reaches the same fixpoint
    via = {
        r["image_id"]: r["rep"]
        for r in ID.phash_connected_groups(pairs, images, method="star").collect()
    }
    assert via == expected


def test_star_contraction_singletons_and_method_flag(spark):
    images = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "image_id string, phash long"
    )
    empty = spark.createDataFrame([], "id_a string, id_b string")
    got = {r["image_id"]: r["rep"] for r in ID.star_contraction_components(empty, images).collect()}
    assert got == {"a": "a", "b": "b", "c": "c"}
    with pytest.raises(ValueError):
        ID.phash_connected_groups(empty, images, method="nope")


# -- tile hashing (crop/re-encode resistance) ----------------------------------


def test_tile_hashes_catch_crop_that_breaks_global_phash(spark):
    from nrsr_crawler_spark.operators.image_dedup import tile_hashes, tile_neardup_pairs
    from nrsr_crawler_spark.sources.images import encode_image, original_pixels, phash64

    px = original_pixels("tile-demo", min_px=48, max_px=48)  # 48x48, 3x3 tile grid
    rows = [
        ("crop", bytearray(encode_image(px[:32, :32], "png"))),  # bottom/right crop
        ("orig", bytearray(encode_image(px, "png"))),
        ("reenc", bytearray(encode_image(px, "jpeg"))),  # lossy re-encode
    ]
    # the crop flips the GLOBAL phash far past any Hamming ball...
    assert bin(phash64(px) ^ phash64(px[:32, :32])).count("1") > 8
    imgs = spark.createDataFrame(rows, "image_id string, bytes binary")
    tiles = tile_hashes(imgs, tile=16)
    # ...but origin-aligned tiles survive: 4/4 for the crop, 7/9 for the
    # 6-bit-quantized re-encode (deterministic FIMG codec)
    pairs = {
        (r.id_a, r.id_b): r.n_match
        for r in tile_neardup_pairs(tiles, min_matching_tiles=3).collect()
    }
    assert pairs == {("crop", "orig"): 4, ("orig", "reenc"): 7, ("crop", "reenc"): 3}


def test_tile_neardup_hot_bucket_cap(spark):
    from nrsr_crawler_spark.operators.image_dedup import tile_neardup_pairs

    # 20 unrelated images all sharing one flat "letterbox" tile at (0,0);
    # img0/img1 additionally share 3 real tiles
    rows = [(f"img{i:02d}", 0, 0, 0) for i in range(20)]
    rows += [(f"img{i:02d}", 1, t, 100 + 10 * i + t) for i in range(2, 20) for t in range(3)]
    rows += [(f"img{i:02d}", 1, t, 7000 + t) for i in (0, 1) for t in range(3)]
    tiles = spark.createDataFrame(rows, "image_id string, tr int, tc int, tile_hash long")
    # uncapped: the hot tile alone pairs nothing at min 2, but img0-img1 get 4
    got = {(r.id_a, r.id_b): r.n_match for r in tile_neardup_pairs(tiles, 2).collect()}
    assert got == {("img00", "img01"): 4}
    # capped: the 20-row bucket is dropped, the pair keeps only its 3 real tiles
    got = {(r.id_a, r.id_b): r.n_match for r in tile_neardup_pairs(tiles, 2, max_df=10).collect()}
    assert got == {("img00", "img01"): 3}
