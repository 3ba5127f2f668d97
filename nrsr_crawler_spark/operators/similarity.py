"""Approximate-nearest-neighbor search over an embedding column
(training-data-pipeline operator; task brief: brute-force cosine top-k
baseline + an LSH-bucketed scale path).

 - ``bruteforce_topk`` — exact top-k by cosine for a (small) query set
   against the full corpus: broadcast the queries, one pass over the corpus,
   per-query top-k via window.  Exact baseline; corpus-size-linear.
 - ``lsh_topk`` — random-hyperplane LSH: sign-bit bucket per vector from a
   deterministic seeded plane set; candidates = corpus sharing a bucket with
   the query under ≥1 of ``tables`` independent plane sets; exact cosine +
   top-k among candidates only.  Recall is tunable via (bits, tables); the
   planes are plain float literals so the operator stays engine-portable
   (DuckDB oracle uses the same literals).

Scale notes: at 10^9 vectors the corpus never self-joins — buckets shard the
corpus (shuffle key = bucket id), queries broadcast, and per-bucket
candidate lists stay bounded because ``bits`` grows with log(n).  A true IVF
(k-means coarse quantizer) drops in by replacing the bucketer; the pipeline
shape is identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nrsr_crawler_spark.operators.dedup import cosine_sim


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def random_planes(dim: int, bits: int, table: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes (seeded, reproducible anywhere)."""
    rng = np.random.default_rng(seed * 1000 + table)
    return [[float(v) for v in rng.standard_normal(dim)] for _ in range(bits)]


def integer_planes(dim: int, bits: int, table: int, seed: int = 42) -> list[list[int]]:
    """Deterministic INTEGER hyperplanes in [-9, 9].

    Why integers: bucket bit = sign(dot(quantized_vec, plane)).  With the
    vector quantized to round(x*1000) every product and partial sum is an
    integer exactly representable in a double, so the sign is identical in
    ANY engine regardless of summation order — which makes the whole
    bucketing (and hence the candidate set) DuckDB-oracle-exact.  Direction
    distribution is close enough to uniform for LSH recall purposes."""
    rng = np.random.default_rng(seed * 1000 + table)
    return [[int(v) for v in rng.integers(-9, 10, size=dim)] for _ in range(bits)]


def quantize_vec(vec: Column, scale: int = 1000) -> Column:
    """array<double> → integer-valued doubles round(x*scale) (exact in any
    engine; mirrors DuckDB ``list_transform(e, x -> round(x*scale))``)."""
    return F.transform(vec, lambda x: F.round(x * scale))


def plane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of ``vec`` against literal planes — pure JVM
    expressions (zip_with dot product per plane)."""
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in p])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sim_decimals: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query (query_id, neighbor_id, cos_sim, rank).

    Similarity is rounded BEFORE ranking so rank order is reproducible across
    engines with different summation order; ties break on neighbor id.
    """
    q = broadcast(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(_as_double(F.col("qv")), _as_double(F.col("cv"))), sim_decimals).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _l2_to(qcol: Column, cvec: list[float]) -> Column:
    """Integer-exact squared L2 from a quantized vector column to a literal
    centroid (integral doubles throughout — shared by IVF and k-means)."""
    lit_c = F.array(*[F.lit(v) for v in cvec])
    return F.aggregate(
        F.zip_with(qcol, lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, val: a + val,
    )


def _best_cell(qcol: Column, centroids: dict[int, list[float]]) -> Column:
    """struct<d, cid> of the nearest centroid (ties → smaller cid)."""
    dists = F.array(
        *[
            F.struct(_l2_to(qcol, cv).alias("d"), F.lit(cid).alias("cid"))
            for cid, cv in sorted(centroids.items())
        ]
    )
    return F.element_at(F.array_sort(dists), 1)


def _lloyd_refine(
    v: DataFrame, centroids: dict[int, list[float]], iterations: int
) -> dict[int, list[float]]:
    """``iterations`` Lloyd update passes over a frame with quantized column
    ``__q``: assign (map-side literal argmin) → per-(cell, dim)
    floor(sum/count) means (ONE partial-aggregated groupBy, K×D output rows
    fetched as model state).  Empty cells keep their previous centroid."""
    centroids = dict(centroids)
    for _ in range(iterations):
        assigned = v.select(_best_cell(F.col("__q"), centroids)["cid"].alias("cell"), "__q")
        upd_rows = (
            assigned.select("cell", F.posexplode("__q").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.floor(F.sum("val") / F.count(F.lit(1))).alias("cval"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("cv")
            )
            .collect()
        )
        centroids.update(
            {int(r["cell"]): [float(x) for x in r["cv"]] for r in upd_rows}
        )
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    sim_decimals: int = 6,
    train_iterations: int = 0,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into centroid
    cells, probe the query's ``nprobe`` nearest cells, exact cosine + top-k
    among cell members only.  Same output shape as :func:`bruteforce_topk`.

    Codebook: the quantized vectors of the ``n_centroids`` smallest ids,
    optionally refined with ``train_iterations`` integer-exact Lloyd passes
    (:func:`_lloyd_refine` — the trained-codebook path; assignments stay
    oracle-exact because the whole recurrence is).  The codebook is fetched
    ONCE to the driver and inlined as literals — model state like the LSH
    planes, not per-row data movement — so cell assignment is pure map-side
    column expressions: zero shuffle until the bucket join.  Cell distance
    is integer L2 over :func:`quantize_vec` vectors (exact in any engine,
    ties→smaller centroid id), which makes the candidate set — and with
    rounded cosine the full result — DuckDB-oracle-exact.

    Scale shape (10^9 vectors): corpus shards on cell id (one cell per
    vector), queries broadcast with ``nprobe`` cells each; per-cell work is
    corpus_size/n_centroids on average, and a trained codebook grows as
    √n keeping cells bounded."""
    cent_rows = (
        corpus.filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("cid"),
            quantize_vec(_as_double(F.col(vec_col))).alias("cv"),
        )
        .collect()
    )
    cent_map = {int(r["cid"]): [float(x) for x in r["cv"]] for r in cent_rows}
    if train_iterations > 0:
        cv = corpus.select(
            quantize_vec(_as_double(F.col(vec_col))).alias("__q")
        ).localCheckpoint()
        cent_map = _lloyd_refine(cv, cent_map, train_iterations)
        cv.unpersist()
    centroids = sorted(cent_map.items())
    dist_to = _l2_to

    def with_cells(df: DataFrame, idc: str, probes: int) -> DataFrame:
        out = df.select(F.col(idc), _as_double(F.col(vec_col)).alias("__v")).withColumn(
            "__q", quantize_vec(F.col("__v"))
        )
        dists = F.array(
            *[
                F.struct(dist_to(F.col("__q"), cv).alias("d"), F.lit(cid).alias("cid"))
                for cid, cv in centroids
            ]
        )
        # array_sort on struct<d,cid> orders by (d asc, cid asc) — the tiebreak
        cells = F.transform(F.slice(F.array_sort(dists), 1, probes), lambda s: s["cid"])
        return out.select(F.col(idc), "__v", F.explode(cells).alias("cell"))

    qc = broadcast(
        with_cells(queries, id_col, nprobe).select(
            F.col(id_col).alias("query_id"), F.col("__v").alias("qv"), "cell"
        )
    )
    cc = with_cells(corpus, id_col, 1).select(
        F.col(id_col).alias("neighbor_id"), F.col("__v").alias("cv"), "cell"
    )
    cands = qc.join(cc, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    sims = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("qv"), F.col("cv")), sim_decimals).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    threshold: float = 0.95,
    sim_decimals: int = 6,
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv:2303.09540):
    cluster the embedding space with a coarse quantizer, compare pairs ONLY
    within a cluster, and mark every vector whose rounded cosine to a
    lower-id cluster-mate reaches ``threshold`` as a semantic duplicate of
    the smallest such id.  Output per vector:
    ``(id, cell, dup_of nullable, kept boolean)``.

    Codebook: same deterministic k-means stand-in as :func:`ivf_topk` (the
    quantized vectors of the ``n_centroids`` smallest ids, fetched once and
    inlined as literals — model state, not data movement), integer-L2 cell
    assignment so the cluster partition — and hence the verdicts — are
    DuckDB-oracle-exact.  Keep policy is single-hop min-id (the paper keeps
    one arbitrary member per ε-ball; min-id makes that deterministic).  Like
    the paper, CROSS-cluster near-dups are missed by design — that locality
    is exactly what makes the method linear.

    Scale shape (10^9 vectors): cell assignment is map-side column
    expressions (zero shuffle); the only shuffle keys on cell id; per-cell
    pair work is Σ|cell|² with |cell| ≈ n/k and a trained codebook growing
    as √n keeps it bounded; ``max_cell`` drops degenerate overfull cells
    before the self-join (same hot-bucket cap as the LSH/phash operators).
    """
    cent_rows = (
        emb.filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("cid"),
            quantize_vec(_as_double(F.col(vec_col))).alias("cv"),
        )
        .collect()
    )
    centroids = sorted((int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows)

    def dist_to(qcol: Column, cvec: list[float]) -> Column:
        lit_c = F.array(*[F.lit(v) for v in cvec])
        return F.aggregate(
            F.zip_with(qcol, lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, v: a + v,
        )

    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")).withColumn(
        "__q", quantize_vec(F.col("__v"))
    )
    dists = F.array(
        *[
            F.struct(dist_to(F.col("__q"), cv).alias("d"), F.lit(cid).alias("cid"))
            for cid, cv in centroids
        ]
    )
    cells = base.select(
        F.col(id_col),
        "__v",
        F.array_sort(dists)[0]["cid"].alias("cell"),
    )
    joinable = cells
    if max_cell is not None:
        ok = (
            cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_cell)
            .select("cell")
        )
        joinable = cells.join(ok, "cell", "left_semi")
    a = joinable.select(F.col(id_col).alias("id_a"), F.col("__v").alias("va"), "cell")
    b = joinable.select(F.col(id_col).alias("id_b"), F.col("__v").alias("vb"), "cell")
    edges = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine_sim(F.col("va"), F.col("vb")), sim_decimals) >= threshold
        )
    )
    dups = edges.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
    return (
        cells.select(F.col(id_col), "cell")
        .join(dups, F.col(id_col) == F.col("id_b"), "left")
        .select(
            F.col(id_col),
            "cell",
            F.col("dup_of"),
            F.col("dup_of").isNull().alias("kept"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    sim_decimals: int = 6,
) -> DataFrame:
    """LSH-bucketed ANN: same output shape as bruteforce_topk, approximate
    (rank within retrieved candidates).

    Bucketing uses :func:`integer_planes` over the quantized vector so the
    candidate set is bit-identical across engines (see ``integer_planes``);
    the final cosine runs on the ORIGINAL double-cast vector."""
    def bucketize(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        out = df.select(F.col(idc), _as_double(F.col(vecc)).alias("__v")).withColumn(
            "__q", quantize_vec(F.col("__v"))
        )
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    plane_bucket(F.col("__q"), integer_planes(dim, bits, t, seed)).alias("bucket"),
                )
                for t in range(tables)
            ]
        )
        return out.select(F.col(idc), "__v", F.explode(buckets).alias("tb")).select(
            F.col(idc), "__v", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
        )

    qb = broadcast(
        bucketize(queries, id_col, vec_col).select(
            F.col(id_col).alias("query_id"), F.col("__v").alias("qv"), "table", "bucket"
        )
    )
    cb = bucketize(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__v").alias("cv"), "table", "bucket"
    )
    cands = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("qv"), F.col("cv")), sim_decimals).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
    sim_decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed — the SCALE path that
    ``dedup.embedding_near_dups`` (labeled tiny-side crossJoin baseline)
    defers to: candidates are pairs agreeing on all ``bits`` hyperplane sign
    bits in ≥1 of ``tables`` tables, verified with the exact cosine on the
    original vectors.  Bucketing uses :func:`integer_planes` over the
    quantized vector, so the candidate set (hence the result) is bit-exact
    in any engine — full DuckDB oracle.

    Scale shape (10^9 vectors): corpus explodes ×``tables`` into buckets
    (map-side), the self-join runs WITHIN (table, bucket) — expected bucket
    population n/2^bits, so the join is Σ b_i², not n²; ``max_bucket`` drops
    overfull buckets before the join (same hot-bucket frequency cap as
    minhash's max_df / phash's band cap — a semantically-degenerate bucket,
    e.g. the all-zeros region, cannot go quadratic).  Recall: a pair at
    cosine ≥ 0.95 disagrees on any one plane with prob θ/π ≈ 0.10, so one
    8-bit table retains ~0.43 of true pairs and 4 tables ~0.90; raise
    ``tables`` for higher recall at linear cost.
    """
    b = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")).withColumn(
        "__q", quantize_vec(F.col("__v"))
    )
    buckets_arr = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                plane_bucket(F.col("__q"), integer_planes(dim, bits, t, seed)).alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    bucketed = b.select(F.col(id_col), "__v", F.explode(buckets_arr).alias("tb")).select(
        F.col(id_col), "__v", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )
    if max_bucket is not None:
        ok = (
            bucketed.groupBy("table", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("table", "bucket")
        )
        bucketed = bucketed.join(ok, ["table", "bucket"], "left_semi")
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("va"), "table", "bucket"
    )
    c = bucketed.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("vb"), "table", "bucket"
    )
    cands = (
        a.join(c, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sims = cands.select(
        "id_a",
        "id_b",
        F.round(cosine_sim(F.col("va"), F.col("vb")), sim_decimals).alias("cos_sim"),
    )
    return sims.filter(F.col("cos_sim") >= threshold)


def kmeans_fixed(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means over quantized vectors — the TRAINED
    codebook the IVF docstring promises (ivf_topk ships with a min-id
    codebook; this trains one with the same integer-exact conventions, so
    swapping it in changes nothing above).

    Exactness (the whole point): vectors quantize via :func:`quantize_vec`
    (integral doubles), distances are the integer L2 expansion
    q·q − 2·q·c + c·c, centroid updates are per-dimension
    ``floor(sum/count)`` — every quantity is an integral double < 2⁵³, and
    IEEE division is correctly rounded, so assignments, updates, and the
    final cells are bit-identical in any engine (full DuckDB oracle with
    the recurrence unrolled).  Ties → smaller centroid id; a cell that
    attracts nothing keeps its previous centroid.

    Init: the quantized vectors of the ``k`` smallest ids (the same
    deterministic convention as ivf_topk's codebook).

    Returns the FINAL assignment ``(id, cell, dist2)`` after ``iterations``
    assignment passes (``iterations - 1`` centroid updates between them).

    Scale shape (10^9 vectors): the centroid table is model state — K×D
    values fetched to the driver per update (bounded, like the IVF
    codebook) and inlined as literals, so every assignment pass is pure
    map-side column expressions; the update is ONE partial-aggregated
    groupBy on (cell, dim) producing K×D rows.  Per iteration: one scan +
    one tiny shuffle, no joins against the corpus, no UDF."""
    v = emb.select(
        F.col(id_col), quantize_vec(_as_double(F.col(vec_col))).alias("__q")
    ).localCheckpoint()
    cent_rows = (
        v.filter(F.col(id_col) < k)
        .select(F.col(id_col).alias("cid"), F.col("__q").alias("cv"))
        .collect()
    )
    centroids: dict[int, list[float]] = {
        int(r["cid"]): [float(x) for x in r["cv"]] for r in cent_rows
    }
    centroids = _lloyd_refine(v, centroids, iterations - 1)
    best = _best_cell(F.col("__q"), centroids)
    # materialize the (id, cell, dist2) result BEFORE releasing the quantized
    # frame — its lineage was truncated by the checkpoint, so an unpersisted
    # parent could not be recomputed by a later action
    out = v.select(
        F.col(id_col),
        best["cid"].alias("cell"),
        best["d"].cast("long").alias("dist2"),
    ).localCheckpoint()
    v.unpersist()
    return out
