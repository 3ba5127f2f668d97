"""Cross-checks for the round-4 wave operators against pure-Python
mirrors and algebraic invariants — no oracle/registry surface, pure
pytest hardening."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.bloom_sim import bloom_calibration
from nrsr_crawler_spark.operators.kcore import kcore_peel
from nrsr_crawler_spark.operators.redirects import resolve_redirects
from nrsr_crawler_spark.operators.transitions import transition_matrix
from nrsr_crawler_spark.operators.warc import warc_plan


def test_kcore_matches_python_peeling_fixpoint(spark):
    rng = random.Random(7)
    edges = set()
    for _ in range(300):
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]

    # pure-Python peel to TRUE fixpoint
    k = 3
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    alive = set(adj)
    while True:
        drop = {v for v in alive if sum(1 for u in adj[v] if u in alive) < k}
        if not drop:
            break
        alive -= drop
    expect = {
        v: sum(1 for u in adj[v] if u in alive) for v in alive
    }

    df = spark.createDataFrame(sym, "src long, dst long")
    # enough rounds to guarantee fixpoint on 40 nodes
    got = {r["node"]: r["deg"] for r in kcore_peel(df, k=k, rounds=12).collect()}
    assert got == expect


def test_redirects_match_python_walk(spark):
    rng = random.Random(11)
    nodes = [f"u{i}" for i in range(60)]
    # functional map over a random subset (some targets outside the domain)
    mapping = {}
    for n in nodes[:40]:
        mapping[n] = rng.choice(nodes)

    def walk(u, max_hops=8):
        hops, cur = 0, u
        seen = {u}
        while cur in mapping and hops < max_hops:
            cur = mapping[cur]
            hops += 1
            if cur in seen:
                break
            seen.add(cur)
        return cur, hops

    df = spark.createDataFrame(list(mapping.items()), "src string, dst string")
    got = {r["src"]: r for r in resolve_redirects(df, doublings=3).collect()}
    assert set(got) == set(mapping)
    for u, r in got.items():
        if r["resolved"]:
            # a resolved chain must agree with the python walk's terminal
            term, hops = walk(u, max_hops=64)
            assert term not in mapping
            assert r["final_url"] == term and r["hops"] == hops
        else:
            # unresolved ⇒ still pointing into the domain (cycle or >8 hops)
            assert r["final_url"] in mapping


def test_warc_shard_totals_are_byte_exact(spark):
    rows = [(f"https://h/{i}", f"d{i % 30}", 100 + i) for i in range(200)]
    df = spark.createDataFrame(rows, "url string, digest string, payload_len long")
    got = warc_plan(df).collect()
    # last offset + last length per shard == shard byte total
    per_shard: dict[str, list] = {}
    for r in got:
        per_shard.setdefault(r["shard"], []).append(r)
    for recs in per_shard.values():
        total = sum(r["rec_len"] for r in recs)
        last = max(recs, key=lambda r: r["byte_offset"])
        assert last["byte_offset"] + last["rec_len"] == total
    # exactly one response per distinct digest
    responses = sum(1 for r in got if r["rec_type"] == "response")
    assert responses == 30


def test_bloom_fp_rate_monotone_in_filter_size(spark):
    ins = spark.createDataFrame([(f"u{i}",) for i in range(400)], "url string")
    probes = spark.createDataFrame([(f"p{i}",) for i in range(300)], "url string")
    # 65536 is the largest legal m (4-hex-char slice range; larger raises)
    fp_small = bloom_calibration(ins, probes, m=256, k=4).collect()[0]["n_fp"]
    fp_big = bloom_calibration(ins, probes, m=65536, k=4).collect()[0]["n_fp"]
    assert fp_small >= fp_big
    assert fp_small == 300  # 256 bits for 400 keys is saturated


def test_transition_rows_sum_to_one_within_rounding(spark):
    rng = random.Random(3)
    rows = []
    for i in range(500):
        rows.append((i, rng.randrange(20), i, rng.choice("abcde")))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    out = transition_matrix(df, "user_id", "ts", "event_type", "event_id").collect()
    by_cur: dict[str, list] = {}
    for r in out:
        by_cur.setdefault(r["cur"], []).append(r)
    for cur, rs in by_cur.items():
        total_bps = sum(r["p_bps"] for r in rs)
        # floor division loses < 1 bp per outgoing row
        assert 10000 - len(rs) < total_bps <= 10000
        # and the raw counts are consistent
        assert all(r["p_bps"] == r["n"] * 10000 // sum(x["n"] for x in rs) for r in rs)


def test_md5_hash_u32_matches_python(spark):
    from nrsr_crawler_spark.operators.bottomk import hash_u32

    vals = ["a", "xyz", "42", ""]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", hash_u32(F.col("s")).alias("h")).collect()}
    for v in vals:
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
