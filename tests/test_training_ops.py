"""Unit tests: benchmark decontamination, Gopher repetition signals,
aspect-ratio bucketing (training-data-pipeline additions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.buckets import (
    DEFAULT_BUCKETS,
    assign_aspect_buckets,
    bucket_stats,
)
from nrsr_crawler_spark.operators.decontaminate import decontaminate
from nrsr_crawler_spark.operators.text import gopher_repetition


# ---------------------------------------------------------------- decontaminate

def test_decontaminate_flags_planted_overlap(spark):
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = 1 window
    corpus = spark.createDataFrame(
        [
            # contains the eval 8-gram verbatim inside a longer doc
            (1, "prefix " + eval_text + " suffix"),
            # shares only a 7-token prefix → NOT contaminated at n=8
            (2, "alpha beta gamma delta epsilon zeta eta DIFFERENT tail tail"),
            # too short for any window
            (3, "tiny doc"),
            # no overlap at all
            (4, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in decontaminate(corpus, eval_set, n=8).collect()}
    assert rows[1]["contaminated"] == 1 and rows[1]["eval_hit_windows"] == 1
    assert rows[2]["contaminated"] == 0
    assert rows[3]["contaminated"] == 0 and rows[3]["n_windows"] == 0
    assert rows[4]["contaminated"] == 0
    assert rows[1]["n_windows"] == 3  # 10 tokens → 3 windows of 8


def test_decontaminate_counts_multiple_hits(spark):
    # corpus doc repeats the eval window twice → both windows hit
    ev = "a b c d e f g h"
    corpus = spark.createDataFrame(
        [(1, ev + " " + ev)], "doc_id long, text string"
    )
    eval_set = spark.createDataFrame([(9, ev)], "doc_id long, text string")
    row = decontaminate(corpus, eval_set, n=8).collect()[0]
    assert row["n_windows"] == 9  # 16 tokens
    assert row["eval_hit_windows"] == 2  # positions 1 and 9
    assert row["contaminated"] == 1


def test_decontaminate_shuffle_fallback_matches_broadcast(spark):
    # every token is doc-suffixed so no 8-gram crosses docs; doc 7 equals
    # the eval text verbatim and is the only contaminated row
    corpus = spark.createDataFrame(
        [(i, " ".join(f"{w}{i}" for w in "wxyzqrstuv")) for i in range(20)],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(99, " ".join(f"{w}7" for w in "wxyzqrstuv"))], "doc_id long, text string"
    )
    a = sorted(map(tuple, decontaminate(corpus, eval_set, broadcast_eval=True).collect()))
    b = sorted(map(tuple, decontaminate(corpus, eval_set, broadcast_eval=False).collect()))
    assert a == b
    assert sum(r[3] for r in a) == 1  # only doc 7 contaminated


# ---------------------------------------------------------- gopher repetition

def test_gopher_repetition_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # 2-grams: "a b"×3, "b a"×2; 3-grams ×2 max
            (2, "unique words only here"),
            (3, "solo"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_repetition(df, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert r1["top2gram_bps"] == 3 * 2 * 10000 // 6  # 10000
    assert r1["top3gram_bps"] == 2 * 3 * 10000 // 6  # 10000
    assert r1["dup2gram_bps"] == (3 + 2) * 2 * 10000 // 6  # 16666
    r2 = rows[2]
    assert r2["top2gram_bps"] == 1 * 2 * 10000 // 4  # max cnt 1, no dups
    assert r2["dup2gram_bps"] == 0
    assert rows[3]["top2gram_bps"] == 0 and rows[3]["top3gram_bps"] == 0
    assert rows[4]["n_tokens"] == 0 and rows[4]["dup2gram_bps"] == 0


# ------------------------------------------------------------- aspect buckets

def _argmin_bucket(w: int, h: int) -> int:
    dists = [(abs(w * bh - h * bw), i) for i, (bw, bh) in enumerate(DEFAULT_BUCKETS)]
    return min(dists)[1]


@pytest.mark.parametrize(
    "w,h",
    [(1024, 1024), (512, 2048), (2048, 512), (3, 4), (100, 100), (640, 480), (1920, 1080)],
)
def test_aspect_bucket_matches_python_argmin(spark, w, h):
    df = spark.createDataFrame([(1, w, h)], "image_id long, w long, h long")
    row = assign_aspect_buckets(df).collect()[0]
    exp = _argmin_bucket(w, h)
    assert row["bucket_id"] == exp
    assert (row["bucket_w"], row["bucket_h"]) == DEFAULT_BUCKETS[exp]


def test_aspect_bucket_exact_match_and_stats(spark):
    df = spark.createDataFrame(
        [(i, bw, bh) for i, (bw, bh) in enumerate(DEFAULT_BUCKETS)],
        "image_id long, w long, h long",
    )
    assigned = assign_aspect_buckets(df)
    for r in assigned.collect():
        assert r["bucket_id"] == r["image_id"]  # every bucket maps to itself
    stats = {r["bucket_id"]: r for r in bucket_stats(assigned).collect()}
    assert len(stats) == len(DEFAULT_BUCKETS)
    assert all(r["n_images"] == 1 for r in stats.values())
    b0 = DEFAULT_BUCKETS[0]
    assert stats[0]["total_px"] == b0[0] * b0[1]


def test_aspect_bucket_is_pure_codegen(spark):
    """Plan gate: assignment is column exprs — no join/exchange anywhere."""
    df = spark.createDataFrame([(1, 640, 480)], "image_id long, w long, h long")
    plan = assign_aspect_buckets(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------- pii scrub

def test_pii_scrub_counts_and_redaction(spark):
    from nrsr_crawler_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.org and c.d@y.co.uk tel 12-345-678-9012 ip 10.1.2.3"),
            (2, "nothing sensitive here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df, "doc_id", "text").collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ipv4s"]) == (2, 1, 1)
    assert (rows[2]["n_emails"], rows[2]["n_phones"], rows[2]["n_ipv4s"]) == (0, 0, 0)
    # redaction is total: fingerprint equals md5 of the hand-redacted text
    import hashlib
    exp = hashlib.md5(
        b"mail <EMAIL> and <EMAIL> tel <PHONE> ip <IP>"
    ).hexdigest()
    assert rows[1]["redacted_fingerprint"] == exp
    # clean text round-trips unchanged
    exp2 = hashlib.md5(b"nothing sensitive here").hexdigest()
    assert rows[2]["redacted_fingerprint"] == exp2


# -- C4-style corpus-level duplicate-block removal ---------------------------


def test_remove_duplicate_blocks_first_occurrence_wins(spark):
    from nrsr_crawler_spark.operators.text import remove_duplicate_blocks

    # k=3 blocks.  doc 1: [a b c][d e f]; doc 2 repeats [a b c] then a unique
    # block; doc 3 repeats its own first block INSIDE the doc.
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
            (3, "p q r p q r"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_blocks(df, "doc_id", "text", k=3).collect()
    }
    # doc 1 owns the global first occurrence of [a b c]: untouched
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[1]["n_blocks"] == 2 and out[1]["removed_blocks"] == 0
    # doc 2 loses the repeated span but keeps its unique tail, order preserved
    assert out[2]["clean_text"] == "x y z"
    assert out[2]["removed_blocks"] == 1
    # in-document repeat: second copy removed too
    assert out[3]["clean_text"] == "p q r"
    assert out[3]["removed_blocks"] == 1
    # empty doc: zero blocks, empty rebuilt text
    assert out[4]["n_blocks"] == 0 and out[4]["clean_text"] == ""


def test_remove_duplicate_blocks_partial_tail_block(spark):
    from nrsr_crawler_spark.operators.text import remove_duplicate_blocks

    # 4 tokens at k=3 -> blocks [a b c][d]; the short tail is its own span
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "d")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_blocks(df, "doc_id", "text", k=3).collect()
    }
    assert out[1]["n_blocks"] == 2 and out[1]["removed_blocks"] == 0
    assert out[2]["clean_text"] == "" and out[2]["removed_blocks"] == 1


# -- linear quality classifier ------------------------------------------------


def test_classifier_quality_filter_hand_weights(spark):
    from nrsr_crawler_spark.operators.text import classifier_quality_filter

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "ZZZZ!!!! ZZZZ!!!!")],
        "doc_id long, text string",
    )
    w = {"__bias__": -100, "n_tokens": 10, "punct_bps": -1}
    out = {r["doc_id"]: r for r in classifier_quality_filter(df, "doc_id", "text", weights=w).collect()}
    # doc 1: 6 tokens, no [.,;:!?] punct -> logit = -100 + 60 = -40
    assert out[1]["logit"] == -40 and not out[1]["keep"]
    # doc 2: 2 tokens, 8 of 17 chars are '!' -> punct_bps = round(80000/17)=4706
    assert out[2]["logit"] == -100 + 20 - 4706
    # threshold shift flips the decision
    out_t = {
        r["doc_id"]: r
        for r in classifier_quality_filter(df, "doc_id", "text", weights=w, threshold=-50).collect()
    }
    assert out_t[1]["keep"] and not out_t[2]["keep"]


# -- exact length quantiles -----------------------------------------------------


def test_length_quantiles_match_rank_definition(spark):
    from nrsr_crawler_spark.operators.text import length_quantiles

    # stratum a: lengths 1..10 -> p50 = value at rank ceil(500/100)=5, p90 at 9
    rows = [(i, "a", "w " * i) for i in range(1, 11)] + [(100, "b", "x y z")]
    df = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows], "doc_id long, src string, text string"
    )
    out = {r["stratum"]: r for r in length_quantiles(df, "doc_id", "text", "src").collect()}
    assert out["a"]["n_docs"] == 10 and out["a"]["p50_dl"] == 5 and out["a"]["p90_dl"] == 9
    # single-doc stratum: every quantile is that doc's length
    assert out["b"]["n_docs"] == 1 and out["b"]["p50_dl"] == 3 and out["b"]["p90_dl"] == 3


def test_length_quantiles_with_duplicate_lengths(spark):
    from nrsr_crawler_spark.operators.text import length_quantiles

    # lengths [2,2,2,7]: p50 target rank ceil(200/100)=2 -> 2; p90 rank 4 -> 7
    df = spark.createDataFrame(
        [(1, "s", "a b"), (2, "s", "c d"), (3, "s", "e f"), (4, "s", "a b c d e f g")],
        "doc_id long, src string, text string",
    )
    (row,) = length_quantiles(df, "doc_id", "text", "src").collect()
    assert row["p50_dl"] == 2 and row["p90_dl"] == 7


# -- sliding-window chunking -----------------------------------------------------


def test_chunk_documents_overlap_and_tail(spark):
    from nrsr_crawler_spark.operators.text import chunk_documents

    # 7 tokens, size=4, stride=3 -> chunks [1..4], [4..7], [7] (starts 1,4,7)
    df = spark.createDataFrame([(1, "t1 t2 t3 t4 t5 t6 t7"), (2, "")],
                               "doc_id long, text string")
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, "doc_id", "text", size=4, stride=3).collect()
    )
    assert out == [
        (1, 0, "t1 t2 t3 t4", 4),
        (1, 1, "t4 t5 t6 t7", 4),
        (1, 2, "t7", 1),
    ]  # empty doc 2 emits nothing


def test_chunk_documents_exact_multiple_no_empty_tail(spark):
    from nrsr_crawler_spark.operators.text import chunk_documents

    # 6 tokens, size=3, stride=3 -> exactly 2 full chunks, no empty third
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", size=3, stride=3).collect()
    assert len(out) == 2
    assert {r["chunk_text"] for r in out} == {"a b c", "d e f"}


# -- per-source boilerplate stripping ------------------------------------------


def test_strip_boilerplate_frequency_threshold(spark):
    from nrsr_crawler_spark.operators.text import strip_boilerplate_blocks

    # k=3 blocks.  "nav bar x" appears in 2 of host-a's 3 docs → boilerplate
    # there; the SAME block appears once on host-b → NOT boilerplate on b
    # (frequency is per group).  Unlike C4 keep-one, ALL occurrences on
    # host-a are stripped, including the first.
    df = spark.createDataFrame(
        [
            (1, "a", "nav bar x p q r"),
            (2, "a", "nav bar x s t u"),
            (3, "a", "v w x y z zz"),
            (4, "b", "nav bar x only here"),
        ],
        "doc_id long, host string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_blocks(
            df, "doc_id", "text", "host", k=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "p q r" and out[1]["boiler_blocks"] == 1
    assert out[2]["clean_text"] == "s t u" and out[2]["boiler_blocks"] == 1
    assert out[3]["boiler_blocks"] == 0
    # host-b sees the block only once → kept verbatim
    assert out[4]["clean_text"] == "nav bar x only here"
    assert out[4]["boiler_blocks"] == 0


def test_strip_boilerplate_min_doc_bps_gate(spark):
    from nrsr_crawler_spark.operators.text import strip_boilerplate_blocks

    # 10 docs on one host, a block shared by exactly 2 → doc_freq 2 = 2000
    # bps.  min_doc_bps=3000 suppresses the flag; 2000 allows it.
    rows = [(i, "h", f"unique{i} tok{i} fill{i}") for i in range(8)]
    rows += [(8, "h", "foo bar baz a b c"), (9, "h", "foo bar baz d e f")]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")

    strict = strip_boilerplate_blocks(
        df, "doc_id", "text", "host", k=3, min_docs=2, min_doc_bps=3000
    )
    assert all(r["boiler_blocks"] == 0 for r in strict.collect())

    loose = {
        r["doc_id"]: r
        for r in strip_boilerplate_blocks(
            df, "doc_id", "text", "host", k=3, min_docs=2, min_doc_bps=2000
        ).collect()
    }
    assert loose[8]["clean_text"] == "a b c" and loose[8]["boiler_blocks"] == 1
    assert loose[9]["clean_text"] == "d e f" and loose[9]["boiler_blocks"] == 1


def test_strip_boilerplate_in_doc_repeat_not_boilerplate(spark):
    from nrsr_crawler_spark.operators.text import strip_boilerplate_blocks

    # a block repeated INSIDE one doc has doc_freq 1 — frequency is distinct
    # docs, so it survives (C4 block-dedup would remove the second copy)
    df = spark.createDataFrame(
        [(1, "h", "p q r p q r"), (2, "h", "x y z w w2 w3"), (3, "h", "")],
        "doc_id long, host string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_blocks(
            df, "doc_id", "text", "host", k=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "p q r p q r" and out[1]["boiler_blocks"] == 0
    assert out[3]["n_blocks"] == 0 and out[3]["clean_text"] == ""


# -- content-defined chunking ----------------------------------------------


def test_cdc_chunks_cover_document_exactly(spark):
    from nrsr_crawler_spark.operators.text import cdc_chunk_documents

    text = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    rows = cdc_chunk_documents(df, "doc_id", "text", w=3, divisor=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: chunks are contiguous, ordered, and rebuild the document
    cs = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert cs[0]["start_pos"] == 1
    for a, b in zip(cs, cs[1:]):
        assert b["start_pos"] == a["start_pos"] + a["n_tokens"]
        assert b["chunk_idx"] == a["chunk_idx"] + 1
    assert " ".join(c["chunk_text"] for c in cs) == text
    assert sum(c["n_tokens"] for c in cs) == 40
    # doc shorter than the window: one chunk, itself
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b"
    # empty doc: no chunk rows
    assert 3 not in by_doc


def test_cdc_chunks_are_insertion_robust(spark):
    """THE CDC property: prepending one token re-chunks only a bounded
    prefix — most chunk hashes survive, while fixed disjoint blocks all
    shift.  Dedup keyed on chunk_hash therefore still matches the edited
    document's bulk."""
    from nrsr_crawler_spark.operators.text import cdc_chunk_documents

    import random

    rng = random.Random(13)
    words = [f"w{rng.randrange(10_000)}" for _ in range(400)]
    base = " ".join(words)
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    rows = cdc_chunk_documents(df, "doc_id", "text", w=3, divisor=8).collect()
    h1 = [r["chunk_hash"] for r in rows if r["doc_id"] == 1]
    h2 = [r["chunk_hash"] for r in rows if r["doc_id"] == 2]
    shared = len(set(h1) & set(h2))
    # all but the first few boundary-shifted chunks survive the edit
    assert shared >= 0.8 * len(h1), (shared, len(h1))
    # contrast: fixed disjoint blocks share (almost) nothing after a shift
    from nrsr_crawler_spark.operators.text import _disjoint_blocks
    from pyspark.sql import functions as F

    blocks = _disjoint_blocks(df, "text", 8, F.col("doc_id")).collect()
    b1 = {r["bkey"] for r in blocks if r["doc_id"] == 1}
    b2 = {r["bkey"] for r in blocks if r["doc_id"] == 2}
    assert len(b1 & b2) <= 0.1 * len(b1)


def test_cdc_boundary_definition_is_local(spark):
    """The same w-token context produces the same boundary decision no
    matter the document: chunks of a document embedded VERBATIM inside
    another (at any offset past the window warm-up) reappear identically."""
    from nrsr_crawler_spark.operators.text import cdc_chunk_documents

    import random

    rng = random.Random(29)
    inner = " ".join(f"x{rng.randrange(10_000)}" for _ in range(200))
    prefix = " ".join(f"p{rng.randrange(10_000)}" for _ in range(57))
    df = spark.createDataFrame(
        [(1, inner), (2, prefix + " " + inner)], "doc_id long, text string"
    )
    rows = cdc_chunk_documents(df, "doc_id", "text", w=3, divisor=8).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    assert len(h1 & h2) >= 0.7 * len(h1)
