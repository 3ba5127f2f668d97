"""Partitioned Bloom-filter URL-seen set (SURVEY §2.3 J4 — the engine's core
custom operator, north_star).

Replaces the reference's in-memory Scrapy dupefilter + per-spider dicts
(/root/reference/nrsr/settings.py:114; votings.py:18) with a structure that
survives 10^10 keys:

 - the exact seen set is a table of ``url_hash`` partitioned by
   ``segment_id = url_hash mod n_segments`` (the per-partition
   ``filter_segment_id`` lineage column of north_rule);
 - per segment, a Bloom bitset is built with a vectorized numpy kernel inside
   ``applyInPandas`` (Arrow batches — no per-row Python);
 - probing cogroups candidates with their segment's bitset
   (``groupBy(segment_id).cogroup``) so each task touches exactly one bitset;
 - bloom-negative candidates are DEFINITELY unseen (zero false negatives) and
   skip the exact anti-join entirely; only bloom-positive candidates (true
   positives + FP rate ε) hit the exact ``seen`` table.

At 10^10 URLs with ~1% new per epoch this turns a 10^10-row anti-join probe
into an ε-sized one.  Segments are rebuildable from the ``seen`` table, so a
resumed run reconstructs identical filters (north_rule byte-identical resume).

Double hashing (Kirsch–Mitzenmacher): position_i = h1 + i*h2 (mod m), h1 =
url_hash, h2 = odd multiplier mix — standard public construction.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEGMENTS_SCHEMA = "segment_id int, m long, k int, n_keys long, bits binary"
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain construction) — full avalanche.

    Needed because with power-of-two ``m`` a LINEAR h2 (e.g. ``h1*c|1``)
    makes every probe position a function of h1's low bits and the probe set
    an arithmetic progression — probes become correlated and the measured FP
    rate collapses to ~single-probe fill (observed 1e-2 instead of 1e-8)."""
    z = x.astype(np.uint64) + _MIX
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def segment_id(url_hash_col, n_segments: int):
    return F.pmod(url_hash_col, F.lit(n_segments)).cast("int")


def _positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; vectorized."""
    raw = hashes.astype(np.uint64)
    h1 = _mix64(raw)
    h2 = _mix64(raw ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n, k) positions → (n,) all-bits-set."""
    return ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)


def bits_for(n_keys: int, fp_rate: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for a target false-positive rate."""
    n = max(n_keys, 1)
    m = max(64, int(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_segments(
    seen: DataFrame,
    n_segments: int = 16,
    m_bits: int = 1 << 16,
    k: int = 7,
) -> DataFrame:
    """Build one Bloom bitset per segment from the exact seen table
    (column ``url_hash``).  Deterministic: depends only on the key set."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment_id"].iloc[0])
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h = pdf["url_hash"].to_numpy()
        _set_bits(bits, _positions(h, m_bits, k))
        return pd.DataFrame(
            {"segment_id": [seg], "m": [m_bits], "k": [k], "n_keys": [len(pdf)], "bits": [bits.tobytes()]}
        )

    with_seg = seen.select("url_hash").withColumn("segment_id", segment_id(F.col("url_hash"), n_segments))
    return with_seg.groupBy("segment_id").applyInPandas(_build, schema=SEGMENTS_SCHEMA)


def merge_segments(
    segments: DataFrame,
    new_hashes: DataFrame,
    n_segments: int = 16,
    m_bits: int = 1 << 16,
    k: int = 7,
) -> DataFrame:
    """Incrementally fold a delta of ``url_hash`` keys into existing segment
    bitsets (bitwise OR) — bit-identical to rebuilding from the union of key
    sets, at delta cost instead of full-history cost.

    This is how the epoch loop stays O(delta) per epoch: rebuilding segments
    from the whole seen table is a full 10^10-row scan every epoch, while
    Bloom bitsets OR-merge exactly (positions depend only on the key), so
    only the newly enqueued keys need hashing.  Segments with no prior
    bitset are built fresh; bitsets with no delta pass through unchanged.
    """

    def _merge(key, seg: pd.DataFrame, delta: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(key[0])
        if seg.empty:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            m, kk, n_keys = m_bits, k, 0
        else:
            bits = np.frombuffer(seg["bits"].iloc[0], dtype=np.uint8).copy()
            m, kk, n_keys = int(seg["m"].iloc[0]), int(seg["k"].iloc[0]), int(seg["n_keys"].iloc[0])
        if not delta.empty:
            h = delta["url_hash"].to_numpy()
            _set_bits(bits, _positions(h, m, kk))
            n_keys += len(h)
        return pd.DataFrame(
            {"segment_id": [seg_id], "m": [m], "k": [kk], "n_keys": [n_keys], "bits": [bits.tobytes()]}
        )

    delta_seg = new_hashes.select("url_hash").withColumn(
        "segment_id", segment_id(F.col("url_hash"), n_segments)
    )
    return (
        segments.groupBy("segment_id")
        .cogroup(delta_seg.groupBy("segment_id"))
        .applyInPandas(_merge, schema=SEGMENTS_SCHEMA)
    )


def bloom_flag(candidates: DataFrame, segments: DataFrame, n_segments: int = 16) -> DataFrame:
    """Add ``maybe_seen boolean`` to candidates (column ``url_hash``).

    Cogroup by segment so each task loads exactly one bitset; candidates in
    segments with no bitset are definitely unseen.
    """
    cand_cols = candidates.columns

    def _probe(cand: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=[*cand_cols, "__segment_id", "maybe_seen"]).iloc[:0]
        if seg.empty:
            cand = cand.copy()
            cand["maybe_seen"] = False
            return cand
        bits = np.frombuffer(seg["bits"].iloc[0], dtype=np.uint8)
        m = int(seg["m"].iloc[0])
        k = int(seg["k"].iloc[0])
        pos = _positions(cand["url_hash"].to_numpy(), m, k)
        cand = cand.copy()
        cand["maybe_seen"] = _test_bits(bits, pos)
        return cand

    from pyspark.sql.types import BooleanType, StructField, StructType

    cand_seg = candidates.withColumn("__segment_id", segment_id(F.col("url_hash"), n_segments))
    seg_seg = segments.withColumnRenamed("segment_id", "__segment_id")
    # NB: StructType.add() MUTATES the df's shared schema object — build fresh
    probe_schema = StructType(list(cand_seg.schema.fields) + [StructField("maybe_seen", BooleanType())])
    flagged = (
        cand_seg.groupBy("__segment_id")
        .cogroup(seg_seg.groupBy("__segment_id"))
        .applyInPandas(lambda c, s: _probe(c, s), schema=probe_schema)
    )
    return flagged.drop("__segment_id")


_BROADCAST_BITS_LIMIT = 256 << 20  # 256 MB of bitsets comfortably broadcasts
_BROADCAST_KEYS_LIMIT = 5_000_000  # beyond this, broadcasting the exact seen
                                   # table (~40 MB hash relation at 5M longs)
                                   # risks driver/executor OOM — use the
                                   # partitioned regime


def collect_segments(spark, segments: DataFrame):
    """Materialize + broadcast the segment bitsets once (returns the
    broadcast handle).  An epoch loop reuses this across candidate batches
    until the seen-set grows a new snapshot — re-collecting per probe adds a
    driver round-trip to every pass."""
    segs = {
        int(r["segment_id"]): (np.frombuffer(r["bits"], dtype=np.uint8), int(r["m"]), int(r["k"]))
        for r in segments.collect()
    }
    return spark.sparkContext.broadcast(segs)


def bloom_flag_broadcast(
    candidates: DataFrame, segments: DataFrame, n_segments: int = 16, bc=None
) -> DataFrame:
    """Broadcast-regime probe: ship ALL segment bitsets to every executor and
    flag candidates with a scalar pandas UDF over ``url_hash`` alone.

    Zero shuffle and zero wide-row Arrow transfer — only the hash column
    crosses the Python boundary.  Valid whenever the total bitset size fits
    executor memory (≲10^8-key seen sets); past that, the cogrouped
    :func:`bloom_flag` keeps per-task memory at one segment.
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    spark = candidates.sparkSession
    if bc is None:
        bc = collect_segments(spark, segments)

    @pandas_udf("boolean")
    def probe(url_hash: pd.Series) -> pd.Series:
        table = bc.value
        h = url_hash.to_numpy()
        out = np.zeros(len(h), dtype=bool)
        seg_ids = (h % np.int64(n_segments) + n_segments) % np.int64(n_segments)
        for seg in np.unique(seg_ids):
            entry = table.get(int(seg))
            if entry is None:
                continue
            bits, m, k = entry
            mask = seg_ids == seg
            out[mask] = _test_bits(bits, _positions(h[mask], m, k))
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", probe(F.col("url_hash")))


def dedup_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    segments: DataFrame,
    n_segments: int = 16,
    broadcast_bits: bool | None = None,
    bc=None,
) -> DataFrame:
    """J4 end-to-end: bloom-negative rows pass straight through; only
    bloom-positive rows are exact-checked against ``seen``.  Result equals a
    plain anti-join (zero false negatives), at a fraction of the probe cost.

    Two physical regimes, picked (unless forced) from the segments'
    metadata — total key count AND total bitset size, both O(n_segments)
    driver-side reads, no scan of ``seen``:
     - broadcast: :func:`bloom_flag_broadcast` — no shuffle; valid only
       while the EXACT seen table is also broadcastable (the branch
       broadcasts ``seen`` for the exact check), hence the key-count gate;
     - partitioned (10^10 scale): :func:`bloom_flag` cogroups candidates
       with their segment so each task holds exactly one bitset.
    """
    if broadcast_bits is None:
        if bc is not None:
            broadcast_bits = True
        else:
            est = segments.agg(
                F.sum("n_keys").alias("nk"), F.sum(F.length("bits")).alias("nb")
            ).collect()[0]
            broadcast_bits = (est["nk"] or 0) <= _BROADCAST_KEYS_LIMIT and (
                est["nb"] or 0
            ) <= _BROADCAST_BITS_LIMIT
    if broadcast_bits:
        # Single left-anti with a compound condition: bloom-negative rows can
        # never match (maybe_seen=false) and stream through; bloom-positive
        # rows drop iff their hash is in ``seen``.  One pass over the input —
        # a filter-then-union formulation references the candidate pipeline
        # twice and re-evaluates canon+agg+probe per branch (measured 2×
        # wall on the sf0.1 frontier).
        flagged = bloom_flag_broadcast(candidates, segments, n_segments, bc=bc)
        s = F.broadcast(seen.select(F.col("url_hash").alias("__seen_hash")))
        return flagged.join(
            s,
            (F.col("url_hash") == F.col("__seen_hash")) & F.col("maybe_seen"),
            "left_anti",
        ).drop("maybe_seen")
    # Partitioned regime (bitsets too big to broadcast ⇒ ``seen`` is far too
    # big to broadcast): only bloom-positive rows (ε of candidates) enter the
    # shuffle anti-join — that asymmetry is the whole point at 10^10 keys.
    # Callers iterating epochs should persist() candidates first: the two
    # branches below each consume the probe output.
    flagged = bloom_flag(candidates, segments, n_segments)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybes.join(seen.select("url_hash"), "url_hash", "left_anti")
    return definite_new.unionByName(confirmed_new)
