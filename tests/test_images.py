"""Image path invariants (BASELINE.json input_hint): PSNR≥40dB for lossy,
exact for lossless, caption equality — per row (SURVEY §5 item 4)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nrsr_crawler_spark.sources import images as I


def test_codec_roundtrip_lossless():
    px = I.original_pixels("img0000000001")
    dec, fmt = I.decode_image(I.encode_image(px, "png"))
    assert fmt == "png" and np.array_equal(dec, px)


def test_codec_lossy_bounded():
    px = I.original_pixels("img0000000002")
    dec, fmt = I.decode_image(I.encode_image(px, "jpeg"))
    assert fmt == "jpeg"
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 3
    assert I.psnr(px, dec) >= 40.0


def test_unsupported_fmt_is_explicit_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        I.encode_image(I.original_pixels("imgx"), "webp")


def test_phash_deterministic_and_discriminative():
    a = I.phash64(I.original_pixels("img0000000003"))
    b = I.phash64(I.original_pixels("img0000000003"))
    c = I.phash64(I.original_pixels("img0000000099"))
    assert a == b
    assert a != c


def test_images_table_invariants(spark):
    captions = spark.createDataFrame(
        [(f"img{i:010d}", f"Poslanec č. {i} (7. obdobie)") for i in range(1, 41)],
        "image_id string, caption string",
    )
    images = I.build_images(spark, captions)
    assert images.schema.simpleString() == (
        "struct<image_id:string,bytes:binary,w:int,h:int,fmt:string,caption:string,phash:bigint>"
    )
    report = I.verify_images(images, captions)
    rows = report.collect()
    assert len(rows) == 40
    for r in rows:
        assert r["caption_ok"] and r["w_ok"] and r["h_ok"] and r["phash_ok"], r
        if r["fmt"] == "png":
            assert r["exact"], r
        else:
            assert r["psnr_db"] >= 40.0, r
    # both codec paths exercised
    fmts = {r["fmt"] for r in rows}
    assert fmts == {"png", "jpeg"}


def test_crawled_members_produce_images(spark):
    # member detail pages carry image refs (members.py:136-137) → captions
    from nrsr_crawler_spark.sources.synthetic_site import generate_site

    site = generate_site(periods=1, pages_per_period=2, details_per_page=2, members_per_period=3)
    pairs = [
        (p.image_id, p.payload["caption"])
        for p in site.values()
        if p.kind == "detail_member"
    ]
    captions = spark.createDataFrame(pairs, "image_id string, caption string")
    report = I.verify_images(I.build_images(spark, captions), captions)
    assert report.filter(
        ~(F.col("caption_ok") & F.col("phash_ok") & ((F.col("psnr_db") >= 40) | F.col("exact")))
    ).count() == 0


def test_extract_patches_tile_the_canvas_exactly(spark):
    from pyspark.sql import functions as F

    from nrsr_crawler_spark.operators.multimodal import block_resize, extract_patches
    from nrsr_crawler_spark.sources.images import build_images, decode_image

    caps = spark.createDataFrame(
        [(f"img{i:010d}", f"cap {i}") for i in range(1, 9)],
        "image_id string, caption string",
    )
    imgs = build_images(spark, caps)
    rows = extract_patches(imgs, patch=8, grid=4).collect()
    by_img = {}
    for r in rows:
        by_img.setdefault(r["image_id"], []).append(r)
    assert set(len(v) for v in by_img.values()) == {16}
    for iid, ps in by_img.items():
        assert sorted(p["patch_idx"] for p in ps) == list(range(16))
        assert all(p["ph"] == 8 and p["pw"] == 8 for p in ps)
        # exact coverage: tiles partition the canvas
        assert sum(p["patch_sum"] for p in ps) == ps[0]["canvas_sum"]
    # ground truth for one image: recompute the canvas locally
    img0 = imgs.filter(F.col("image_id") == "img0000000001").collect()[0]
    px, _ = decode_image(bytes(img0["bytes"]))
    canvas = block_resize(px, 32, 32)
    expect00 = int(canvas[0:8, 0:8].astype("int64").sum())
    got00 = next(
        p["patch_sum"]
        for p in by_img["img0000000001"]
        if p["prow"] == 0 and p["pcol"] == 0
    )
    assert got00 == expect00
