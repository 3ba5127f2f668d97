"""Training-funnel token ledger (operators/token_ledger.py): per-stage
monotonicity, exact-dedup drop behavior, and packing arithmetic."""

from __future__ import annotations

from nrsr_crawler_spark.operators.token_ledger import token_ledger

# Stopwords interleaved with per-doc unique tokens so no two distinct docs
# share an 8-consecutive-token window by accident; contamination is PLANTED
# only where the test wants it.
_EVAL_RUN = "orange silver marble window copper hidden velvet stone"  # 8 tokens


def _text(i: int) -> str:
    return (
        f"w{i} the x{i} a y{i} of z{i} and q{i} to r{i} in s{i} is t{i} it "
        f"u{i} the v{i} a m{i} of n{i} and o{i} to p{i} in k{i} is j{i} it"
    )


def _docs(spark):
    rows = []
    for i in range(1, 41):
        if i % 20 == 0:
            text = f"{_EVAL_RUN} e{i} the f{i} a g{i} of h{i} and b{i} to c{i} is d{i} it"
        elif i % 7 == 0:
            text = "dup{} the dup a dup of dup and dup to dup in dup is dup it".format("")
        elif i in (5, 11):
            text = f"AAAA BBBB CCCC DDD{i}"  # shouty + short → quality-gate drop
        elif i in (3, 9):
            text = _text(i) + " " + _EVAL_RUN  # planted eval 8-gram → contaminated
        else:
            text = _text(i)
        rows.append((i, "en" if i % 3 else "sk", f"src{i % 2}", text, len(text)))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string, n_chars long"
    )


def test_ledger_monotone_funnel_and_packing(spark):
    led = {
        r["stage"]: r
        for r in token_ledger(_docs(spark), n_total=10, seq_len=64).collect()
    }
    assert set(led) == {
        "exact_dedup", "quality_gate", "decontaminate", "mixture_quota", "packing",
    }
    # chained: each stage's input equals the previous stage's kept
    order = ["exact_dedup", "quality_gate", "decontaminate", "mixture_quota"]
    for prev, nxt in zip(order, order[1:] + ["packing"]):
        assert led[nxt]["docs_in"] == led[prev]["docs_kept"]
        assert led[nxt]["tokens_in"] == led[prev]["tokens_kept"]
    # monotone: no stage keeps more than it was given
    for s in led.values():
        assert 0 <= s["docs_kept"] <= s["docs_in"]
        assert 0 <= s["tokens_kept"] <= s["tokens_in"]
    # exact dups by construction: ids {7,14,21,28,35} share one body → 1 kept
    d = led["exact_dedup"]
    assert d["docs_in"] == 40 and d["docs_kept"] == 36
    # the two shouty docs fall at the quality gate
    q = led["quality_gate"]
    assert q["docs_kept"] == q["docs_in"] - 2
    # decontamination drops the eval split itself (ids 20, 40) plus the two
    # planted-contamination docs (ids 3, 9)
    c = led["decontaminate"]
    assert c["docs_kept"] == c["docs_in"] - 4
    # mixture quota caps at n_total with a sqrt-smoothed split
    m = led["mixture_quota"]
    assert 0 < m["docs_kept"] <= 10
    # packing drops nothing and its arithmetic closes:
    # n_seqs * seq_len == tokens_kept + pad_tokens
    p = led["packing"]
    assert p["docs_kept"] == p["docs_in"] and p["tokens_kept"] == p["tokens_in"]
    assert p["n_seqs"] * 64 == p["tokens_kept"] + p["pad_tokens"]
    assert p["n_seqs"] > 0
