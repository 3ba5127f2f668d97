"""Integer PageRank (operators/linkrank.py): exactness vs an independent
pure-Python implementation of the same floor-division recurrence, dangling
mass handling, and determinism."""

from __future__ import annotations

from nrsr_crawler_spark.operators.linkrank import DAMP_DEN, DAMP_NUM, SCALE, pagerank_fixed


def _py_pagerank(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out: dict[int, int] = {}
    for u, _ in e:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    base = ((3 * SCALE) // DAMP_DEN) // n
    r = {v: SCALE // n for v in nodes}
    for _ in range(k):
        c = {v: 0 for v in nodes}
        for u, v in e:
            c[v] += r[u] // out[u]
        dangling = sum(r[u] for u in nodes if u not in out)
        r = {v: base + (DAMP_NUM * (c[v] + dangling // n)) // DAMP_DEN for v in nodes}
    return r


def test_pagerank_matches_python_reference_with_dangling(spark):
    # 1→2→3→1 cycle, 3→4, 4 dangling, 5→1 feeder, duplicate edge 1→2 again
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_fixed(df, iterations=3).collect()}
    assert got == _py_pagerank(edges, 3)
    # node 4 is dangling but still holds rank; node 5 (no in-edges) floors
    assert got[4] > 0
    assert got[5] == min(got.values())


def test_pagerank_shuffle_regime_matches_broadcast_regime(spark):
    # the web-scale path (rank table shuffled to pre-partitioned edges) must
    # be bit-identical to the small-N broadcast path
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank_fixed(df, iterations=3, broadcast_ranks=False).collect()
    }
    assert got == _py_pagerank(edges, 3)


def test_pagerank_mass_conservation_bound(spark):
    # floor-division truncation may only LEAK mass, never create it, and the
    # leak is bounded by a few units per node per iteration
    edges = [(i, (i * 7 + 3) % 50) for i in range(50)] + [(i, (i + 1) % 50) for i in range(50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank_fixed(df, iterations=3).collect()
    mass = sum(r.rank for r in out)
    n = len(out)
    assert mass <= SCALE
    assert mass >= SCALE - 10 * n * 3  # ≤ ~10 units lost per node-iteration


# -- anchor-text rollup -------------------------------------------------------


def test_anchor_text_rollup_frequency_beats_lexicographic(spark):
    from nrsr_crawler_spark.operators.linkrank import anchor_text_rollup

    pages = spark.createDataFrame(
        [
            ("p1", '<a href="t">zebra</a><a href="t">zebra</a><a href="u">only</a>'),
            ("p2", '<a href="t">aardvark</a>junk no links here'),
            ("p3", "no links at all"),
        ],
        "page_url string, html string",
    )
    out = {r["target_url"]: r for r in anchor_text_rollup(pages, "page_url", "html").collect()}
    # target t: zebra×2 beats lexicographically-smaller aardvark×1
    assert out["t"]["in_degree"] == 3 and out["t"]["n_texts"] == 2
    assert out["t"]["top_text"] == "zebra"
    assert out["u"]["in_degree"] == 1 and out["u"]["top_text"] == "only"
    assert set(out) == {"t", "u"}


def test_anchor_text_rollup_tie_breaks_lexicographic(spark):
    from nrsr_crawler_spark.operators.linkrank import anchor_text_rollup

    pages = spark.createDataFrame(
        [("p", '<a href="t">bbb</a><a href="t">aaa</a>')],
        "page_url string, html string",
    )
    (row,) = anchor_text_rollup(pages, "page_url", "html").collect()
    assert row["top_text"] == "aaa" and row["n_texts"] == 2


# -- HITS hub/authority -------------------------------------------------------


def _py_hits(edges: list[tuple[int, int]], k: int) -> dict[int, tuple[int, int]]:
    from nrsr_crawler_spark.operators.linkrank import HITS_SCALE

    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)

    def half(score: dict[int, int], src_to_dst: bool) -> dict[int, int]:
        raw = {v: 0 for v in nodes}
        for u, v in e:
            if src_to_dst:
                raw[v] += score[u]
            else:
                raw[u] += score[v]
        total = sum(raw.values()) or 1
        return {v: (raw[v] * HITS_SCALE) // total for v in nodes}

    hub = {v: HITS_SCALE // n for v in nodes}
    auth = hub
    for _ in range(k):
        auth = half(hub, True)
        hub = half(auth, False)
    return {v: (auth[v], hub[v]) for v in nodes}


def test_hits_matches_python_reference(spark):
    from nrsr_crawler_spark.operators.linkrank import hits_fixed

    # hub node 1 points at 2,3,4; 2,3 also cross-link; 5 isolated-ish feeder
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (3, 2), (5, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.auth, r.hub) for r in hits_fixed(df, iterations=2).collect()}
    assert got == _py_hits(edges, 2)
    # node 1 links every content page -> top hub; it has one weak in-link
    assert got[1][1] == max(h for _, h in got.values())
    # node 4 has in-links only -> zero hub
    assert got[4][1] == 0


def test_hits_shuffle_regime_matches_broadcast_regime(spark):
    # the web-scale path (pre-partitioned edge copies, shuffled score join)
    # must be bit-identical to the small-N broadcast path
    from nrsr_crawler_spark.operators.linkrank import hits_fixed

    edges = [(i, (i * 5 + 2) % 23) for i in range(23)] + [(i, (i + 7) % 23) for i in range(23)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.auth, r.hub) for r in hits_fixed(df, iterations=2, broadcast_scores=False).collect()}
    assert got == _py_hits(edges, 2)


def test_hits_l1_renormalization_bound(spark):
    from nrsr_crawler_spark.operators.linkrank import HITS_SCALE, hits_fixed

    edges = [(i, (i * 5 + 2) % 40) for i in range(40)] + [(i, (i + 3) % 40) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = hits_fixed(df, iterations=2).collect()
    n = len(out)
    for col in ("auth", "hub"):
        mass = sum(r[col] for r in out)
        # floor division may only leak, never create, mass
        assert mass <= HITS_SCALE
        assert mass >= HITS_SCALE - n
