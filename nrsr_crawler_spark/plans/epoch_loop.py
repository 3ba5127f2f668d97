"""The crawl engine: semi-naive frontier fixpoint as batch epochs
(SURVEY §2.9, §3.1 — the Spark-native replacement for Scrapy's reactor loop).

Per epoch:
  pop (per-host politeness budget, LIFO priority order)
    → fetch (deterministic page-table lookup — the sandbox stand-in for the
       HTTP/Splash stage, SURVEY §2.1 S3/S4)
    → parse (mapInPandas over body bytes: children in document order + items)
    → canonicalize/fingerprint + robots filter (schedule-time, like the
       dupefilter) → in-batch dedup → bloom-pruned anti-join vs seen
    → append deltas (frontier, fetch_log, edges, items, metrics)
    → atomic manifest commit.

Determinism: every column written is a pure function of committed inputs —
``seq`` encodes (epoch, parent_seq, child_idx) bit-packed, NOT
monotonically_increasing_id — so a killed run re-runs its last uncommitted
epoch and converges to identical table contents (north_rule resume).

Ordering equivalence with the reference (north_rule): with
``budget_per_host=1`` on a single-host site the pop order IS the reference's
LIFO depth-first order (tests/test_crawl_golden.py asserts equality with the
simulator).  In bulk mode (budget ≫ 1) epochs are BFS-like waves — the final
seen set is provably identical (dedup is order-insensitive), and
plans/replay.py recomputes the reference fetch order from the logged edge
lineage for certification.

Scale notes (10^10 frontier):
  - pop is the two-level salted window (operators/politeness.py) — immune to
    single-host skew;
  - the seen anti-join probe is bloom-pruned (operators/seen.py) so the
    exact check only sees maybe-positives;
  - per-epoch state is append-only deltas; at deploy scale these are Iceberg
    appends with periodic compaction, and bloom segments update
    incrementally instead of rebuilding (lake/table.py docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.functions import urls as U
from nrsr_crawler_spark.lake.table import EpochLake
from nrsr_crawler_spark.operators import frontier as frontier_ops
from nrsr_crawler_spark.operators import parse as parse_ops
from nrsr_crawler_spark.operators import politeness, robots, seen as seen_ops

FRONTIER_SCHEMA = (
    "url string, canon_url string, url_hash long, host string, host_shard long, "
    "depth int, priority int, seq long, parent_hash long, segment_id int"
)
FETCHLOG_SCHEMA = "url_hash long, canon_url string, seq long, depth int, pop_rank int"
EDGES_SCHEMA = "parent_hash long, parent_seq long, child_idx int, url string, canon_url string, url_hash long"

_SEQ_EPOCH_SHIFT = 40
_SEQ_PARENT_BITS = 20
_SEQ_CHILD_BITS = 20


@dataclass
class CrawlStats:
    epochs: int
    fetched: int
    enqueued: int
    items: int


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        lake_root: str,
        budget_per_host: int = 1,
        robots_rules: list[dict] | None = None,
        num_salts: int = 16,
        n_segments: int = 16,
        use_bloom: bool = True,
        base_url: str = "https://www.nrsr.sk/web/",
    ):
        self.spark = spark
        self.lake = EpochLake(lake_root)
        self.budget = budget_per_host
        self.robots_rules = robots_rules or []
        self.num_salts = num_salts
        self.n_segments = n_segments
        self.use_bloom = use_bloom
        self.base_url = base_url
        # page table keyed by canonical fingerprint (the deterministic "server")
        pages_path = str(self.lake.root / "pages")
        pages.withColumn("page_canon", U.canonicalize(F.col("url"))).withColumn(
            "page_hash", U.url_hash(F.col("page_canon"))
        ).write.mode("overwrite").parquet(pages_path)
        self.pages = spark.read.parquet(pages_path)

    # -- helpers -------------------------------------------------------------
    def _child_seq(self, epoch: int):
        return (
            (F.lit(epoch + 1).cast("long") * (1 << _SEQ_EPOCH_SHIFT))
            + (F.pmod(F.col("parent_seq"), F.lit(1 << _SEQ_PARENT_BITS)) * (1 << _SEQ_CHILD_BITS))
            + F.least(F.col("child_idx"), F.lit((1 << _SEQ_CHILD_BITS) - 1))
        )

    def _finish_frontier_cols(self, df: DataFrame) -> DataFrame:
        return df.select(
            "url",
            "canon_url",
            "url_hash",
            "host",
            U.host_shard(F.col("host"), F.col("url_hash"), num_shards=64, salt=self.num_salts).alias("host_shard"),
            "depth",
            "priority",
            "seq",
            "parent_hash",
            seen_ops.segment_id(F.col("url_hash"), self.n_segments).alias("segment_id"),
        )

    def enqueue_seeds(self, seeds: list[str]) -> None:
        rows = [(u, i) for i, u in enumerate(seeds)]
        raw = self.spark.createDataFrame(rows, "url string, seq long").select(
            "url",
            U.canonicalize(F.col("url")).alias("canon_url"),
            "seq",
            F.lit(0).alias("depth"),
            F.lit(0).alias("priority"),
            F.lit(None).cast("long").alias("parent_hash"),
        ).filter(F.col("canon_url").isNotNull()).withColumn(
            "url_hash", U.url_hash(F.col("canon_url"))
        ).withColumn("host", U.url_host(F.col("canon_url")))
        if self.robots_rules:
            raw = raw.filter(robots.allowed_expr(self.robots_rules, F.col("canon_url"), F.col("host")))
        # dupefilter applies to seeds too: first-scheduled wins
        raw = frontier_ops.prepare_in_batch(raw)
        delta = self._finish_frontier_cols(raw)
        self.lake.write_delta("frontier", delta, 0)
        n = delta.count()
        self.lake.commit(0, {"kind": "seed", "enqueued": n, "popped": 0, "items": 0, "edges": 0})

    # -- the loop ------------------------------------------------------------
    def run(self, seeds: list[str] | None = None, max_epochs: int = 100000) -> CrawlStats:
        if self.lake.last_committed() < 0:
            if seeds is None:
                raise ValueError("fresh lake needs seeds")
            self.enqueue_seeds(seeds)

        total_fetched = total_enqueued = total_items = 0
        segments = None  # incremental bloom state, built once then OR-merged
        for _ in range(max_epochs):
            epoch = self.lake.last_committed() + 1
            enqueued = self.lake.read_all(self.spark, "frontier")
            fetched_log = self.lake.read_all(self.spark, "fetch_log", schema=FETCHLOG_SCHEMA + ", epoch int")
            active = enqueued.join(fetched_log.select("url_hash"), "url_hash", "left_anti")

            batch = politeness.pop_budget(
                active, budget=self.budget, num_salts=self.num_salts, tiebreak=[F.col("canon_url")]
            ).persist()
            n_popped = batch.count()
            if n_popped == 0:
                batch.unpersist()
                break

            fetched = batch.join(
                self.pages.select(F.col("page_hash").alias("url_hash"), "body"),
                "url_hash",
                "left",
            ).persist()

            # children: resolve reference-style (absolute pass-through, else
            # BASE_URL concat — members.py:76), canon+hash+robots at schedule time
            edges = U.with_canon(
                parse_ops.extract_children(fetched).withColumn(
                    "url",
                    F.when(
                        F.col("href").startswith("http://") | F.col("href").startswith("https://"),
                        F.col("href"),
                    ).otherwise(F.concat(F.lit(self.base_url), F.col("href"))),
                ),
                hash_col="url_hash",
                valid_col="url_ok",
            ).persist()

            cand = (
                edges.filter(F.col("url_ok"))
                .drop("url_ok")
                .withColumn("depth", F.col("parent_depth") + 1)
                .withColumn("priority", F.lit(0))
                .withColumn("seq", self._child_seq(epoch))
            )
            if self.robots_rules:
                cand = cand.filter(
                    robots.allowed_expr(self.robots_rules, F.col("canon_url"), F.col("host"))
                )
            # in-batch dedup: first-scheduled wins = min seq
            cand = frontier_ops.prepare_in_batch(cand)
            # cross-epoch dedup (J4): bloom-pruned anti-join vs everything
            # enqueued.  Segments are built ONCE (covers seeds or the resumed
            # lake) then OR-merged with each epoch's delta — O(delta keys) per
            # epoch, never a re-scan of the whole 10^10-key seen table.
            if self.use_bloom:
                if segments is None:
                    segments = seen_ops.build_segments(enqueued, self.n_segments).persist()
                    seen_count = enqueued.count()
                    # broadcast regime while the seen hash-set is broadcastable
                    # (≲5M keys ≈ 40 MB); the partitioned cogroup regime takes
                    # over beyond that — decided from the loop's own counter,
                    # no extra per-epoch sizing job
                    use_bcast = seen_count <= 5_000_000
                    seg_bc = seen_ops.collect_segments(self.spark, segments) if use_bcast else None
                new = seen_ops.dedup_with_bloom(
                    cand, enqueued, segments, self.n_segments,
                    broadcast_bits=use_bcast, bc=seg_bc,
                )
            else:
                new = cand.join(enqueued.select("url_hash"), "url_hash", "left_anti")
            new_delta = self._finish_frontier_cols(new)

            items = parse_ops.extract_items(fetched)

            self.lake.write_delta("fetch_log", batch.select(
                "url_hash", "canon_url", "seq", "depth", F.col("rk").alias("pop_rank")
            ), epoch)
            self.lake.write_delta(
                "edges",
                edges.select("parent_hash", "parent_seq", "child_idx", "url", "canon_url", "url_hash"),
                epoch,
            )
            self.lake.write_delta("frontier", new_delta, epoch)
            self.lake.write_delta("items", items, epoch)

            n_new = self.spark.read.parquet(self.lake.delta_path("frontier", epoch)).count()
            n_items = self.spark.read.parquet(self.lake.delta_path("items", epoch)).count()
            n_edges = self.spark.read.parquet(self.lake.delta_path("edges", epoch)).count()
            self.lake.commit(
                epoch,
                {"kind": "crawl", "popped": n_popped, "enqueued": n_new, "items": n_items, "edges": n_edges},
            )
            total_fetched += n_popped
            total_enqueued += n_new
            total_items += n_items
            if self.use_bloom and n_new > 0:
                new_hashes = self.spark.read.parquet(
                    self.lake.delta_path("frontier", epoch)
                ).select("url_hash")
                merged = seen_ops.merge_segments(segments, new_hashes, self.n_segments).persist()
                seen_count += n_new
                use_bcast = seen_count <= 5_000_000
                seg_bc = seen_ops.collect_segments(self.spark, merged) if use_bcast else None
                segments.unpersist()
                segments = merged
            batch.unpersist()
            fetched.unpersist()
            edges.unpersist()
        if segments is not None:
            segments.unpersist()
        return CrawlStats(epochs=self.lake.last_committed(), fetched=total_fetched, enqueued=total_enqueued, items=total_items)

    # -- final state ----------------------------------------------------------
    def seen_set(self) -> DataFrame:
        """Final URL-seen set (dupefilter contents): everything ever enqueued."""
        return self.lake.read_all(self.spark, "frontier").select("url_hash", "canon_url")

    def fetch_order(self) -> DataFrame:
        """Fetch order as executed: (epoch, pop_rank) lexicographic."""
        log = self.lake.read_all(self.spark, "fetch_log", schema=FETCHLOG_SCHEMA + ", epoch int")
        return log.orderBy("epoch", "pop_rank").select("epoch", "pop_rank", "canon_url", "url_hash", "depth")
