"""Joint image×caption sample filter (operators/pair_gate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import image_quality as IQ
from nrsr_crawler_spark.operators import pair_gate as PG
from nrsr_crawler_spark.sources.images import encode_image, original_pixels

import numpy as np


def test_caption_reason_cases(spark):
    rows = [
        ("a", ""),  # short (0 tokens)
        ("b", "  solo  "),  # short (1 token)
        ("c", "A A A A " * 40),  # long (160 tokens > 64)
        ("d", "AAAA BBBB CCCC DDDD"),  # shouty
        ("e", "Poslanec Jan Novak (7. obdobie)"),  # ok
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    got = {
        r.image_id: r.reason
        for r in df.select("image_id", PG.caption_reason(F.col("caption")).alias("reason")).collect()
    }
    assert got == {"a": "short", "b": "short", "c": "long", "d": "shouty", "e": "ok"}


def test_pair_gate_precedence(spark):
    flat = encode_image(np.full((8, 8), 50, dtype=np.uint8), "png")
    nat = encode_image(original_pixels("imgN"), "png")
    imgs = spark.createDataFrame(
        [("badimg_badcap", flat), ("badcap", nat), ("goodpair", nat), ("badimg", flat)],
        "image_id string, bytes binary",
    )
    gated = IQ.quality_gate(IQ.quality_stats(imgs))
    caps = spark.createDataFrame(
        [
            ("badimg_badcap", "SHOUTY CAPS HERE NOW"),
            ("badcap", ""),
            ("goodpair", "a fine caption"),
            ("badimg", "a fine caption"),
        ],
        "image_id string, caption string",
    )
    out = {r.image_id: (r.keep, r.drop_reason) for r in PG.pair_gate(gated, caps).collect()}
    assert out == {
        "badimg_badcap": (0, "image_flat"),  # image reason wins precedence
        "badcap": (0, "caption_short"),
        "goodpair": (1, None),
        "badimg": (0, "image_flat"),
    }
