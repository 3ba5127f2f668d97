"""Round-4 wave E: HyperBall neighborhood function."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.hyperball import hyperball_nf


def _exact_nf(edges, k):
    """Exact neighborhood function by BFS (test-side reference)."""
    adj: dict[int, set[int]] = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    out = []
    balls = {v: {v} for v in nodes}
    out.append(sum(len(b) for b in balls.values()))
    for _ in range(k):
        balls = {
            v: b | set().union(*(balls[w] for w in adj.get(v, ()))) if adj.get(v) else b
            for v, b in balls.items()
        }
        out.append(sum(len(b) for b in balls.values()))
    return out


def test_hyperball_tracks_exact_nf_within_hll_error(spark):
    # a 3-chain of 30-node layers: balls grow 1 → ~31 → ~61 → ~91
    edges = []
    for i in range(30):
        edges.append((1, 100 + i))
        edges.append((100 + i, 200 + (i % 10)))
        edges.append((200 + (i % 10), 300 + (i % 5)))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["t"]: r["nf_est"] for r in hyperball_nf(df, iterations=3, p=6).collect()}
    exact = _exact_nf(edges, 3)
    for t in range(4):
        # 64 registers → ~13% stddev per node; balls here are small so the
        # corrected (linear-counting) path keeps error tight — allow 25%
        assert abs(got[t] - exact[t]) <= max(4, exact[t] // 4), (t, got[t], exact[t])


def test_hyperball_monotone_and_saturating(spark):
    # cycle: every ball saturates to the whole cycle by t = n-1
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = sorted(hyperball_nf(df, iterations=3, p=6).collect(), key=lambda r: r["t"])
    ests = [r["nf_est"] for r in rows]
    assert all(a <= b for a, b in zip(ests, ests[1:])), ests  # N(t) is monotone
    assert all(r["n_nodes"] == n for r in rows)


def test_hyperball_state_equals_true_ball_sketch(spark):
    # max-merge invariance: iterated union == direct sketch of the exact
    # ball membership (here: path 1→2→3, t=2 ball of 1 is {1,2,3})
    from nrsr_crawler_spark.operators.sketches import _hll_register, _hll_rho

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["t"]: r["nf_est"] for r in hyperball_nf(edges, iterations=2, p=6).collect()}
    members = {0: [[1], [2], [3]], 1: [[1, 2], [2, 3], [3]], 2: [[1, 2, 3], [2, 3], [3]]}
    for t, balls in members.items():
        total = 0
        for ball in balls:
            df = spark.createDataFrame([(u,) for u in ball], "u long")
            regs = (
                df.select(
                    _hll_register(F.col("u").cast("string"), 64).alias("register"),
                    _hll_rho(F.col("u").cast("string")).alias("rho"),
                )
                .groupBy("register")
                .agg(F.max("rho").alias("rho_max"))
            )
            rows = regs.collect()
            s = sum(1 << (33 - r["rho_max"]) for r in rows) + (64 - len(rows)) * (1 << 33)
            raw = (709 * 64 * 64 * (1 << 33)) // (1000 * s)
            if raw <= 160 and len(rows) < 64:
                from nrsr_crawler_spark.operators.sketches import hll_lc_table

                raw = hll_lc_table(64)[64 - len(rows)]
            total += raw
        assert got[t] == total, (t, got[t], total)
