"""Training-data-pipeline query battery (dedup / similarity / text) with
DuckDB oracles, registered into entry_queries.QUERIES/ORACLES.

Oracle-portability choices (why these constructions):
 - minhash = lexicographic min of md5(j || ':' || shingle) — identical in any
   engine, no engine-specific hash;
 - thresholds compared with cross-multiplied INTEGER arithmetic;
 - cosine = explicit dot/norm formula on DOUBLE[] (not the built-in
   list_cosine_similarity) so both engines run the same float expression;
 - similarities rounded to 6 decimals BEFORE ranking/filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import ORACLES, QUERIES, query
from nrsr_crawler_spark.operators import dedup as D
from nrsr_crawler_spark.operators import similarity as SIM
from nrsr_crawler_spark.operators import text as T
from nrsr_crawler_spark.sources.tpch import load

# shared SQL fragment: distinct word-trigram shingles per doc
SHINGLES_CTE = """
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
    SELECT DISTINCT doc_id, s AS shingle
    FROM words, UNNEST(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS t(s)
)
"""


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS kept_id, COUNT(*) AS group_size
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_groups(load(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, common, sa.n AS na, sb.n AS nb
    FROM pairs JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE common * 100 >= (sa.n + sb.n - common) * 3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.jaccard_pairs(load(spark, sf_dir, "documents"), "doc_id", "text", 3, 3, 100)


_MINHASH_SQL = ", ".join(
    f"MIN(md5('{j}:' || shingle)) AS h{j}" for j in range(8)
)


@query(
    "dedup_minhash_lsh",
    f"""
    WITH {SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_MINHASH_SQL} FROM sh GROUP BY doc_id),
    banded AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sigs
        UNION ALL
        SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sigs
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    verified AS (
        SELECT p.id_a, p.id_b, p.common, sa.n AS na, sb.n AS nb
        FROM pairs p JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
        WHERE p.common * 2 >= (sa.n + sb.n - p.common) * 1
    )
    SELECT v.* FROM verified v JOIN cands c ON c.id_a = v.id_a AND c.id_b = v.id_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_dedup(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_hashes=8, bands=2,
        threshold_num=1, threshold_den=2,
    )


# -- connected components over the minhash near-dup graph ---------------------
#
# Same phash_connected_groups kernel as the image CC query — the operator is
# modality-generic (any (id_a, id_b) edge set + node list).  The oracle
# re-derives the SAME pair set (full minhash pipeline as CTEs) and closes it
# with a recursive-CTE fixpoint.


@query(
    "dedup_minhash_groups",
    f"""
    WITH RECURSIVE {SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_MINHASH_SQL} FROM sh GROUP BY doc_id),
    banded AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sigs
        UNION ALL
        SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sigs
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    prs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    vpairs AS (
        SELECT p.id_a, p.id_b
        FROM prs p
        JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
        JOIN cands c ON c.id_a = p.id_a AND c.id_b = p.id_b
        WHERE p.common * 2 >= (sa.n + sb.n - p.common) * 1
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM vpairs
              UNION ALL SELECT id_b, id_a FROM vpairs),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id
    """,
)
def dedup_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components clusters over the verified minhash near-dup
    pairs (text counterpart of images_phash_cc_groups — the CC kernel is
    modality-generic)."""
    from nrsr_crawler_spark.operators.image_dedup import phash_connected_groups

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=2,
        threshold_num=1, threshold_den=2,
    ).select("id_a", "id_b")
    return phash_connected_groups(pairs, docs.select("doc_id"), id_col="doc_id")


_NIB = "(strpos('0123456789abcdef', substr(md5(w), {i}, 1)) - 1)"
_H16 = f"({_NIB.format(i=1)} * 4096 + {_NIB.format(i=2)} * 256 + {_NIB.format(i=3)} * 16 + {_NIB.format(i=4)})"
_BITSUMS = ", ".join(
    f"SUM(CASE WHEN (h16 >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(16)
)
_SIMHASH = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16))


@query(
    "dedup_simhash",
    f"""
    WITH toks AS (
        SELECT doc_id, u.w FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
    ),
    th AS (SELECT doc_id, {_H16} AS h16 FROM toks),
    bitsums AS (SELECT doc_id, {_BITSUMS} FROM th GROUP BY doc_id)
    SELECT doc_id, {_SIMHASH} AS simhash FROM bitsums
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash16(load(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_embedding_cosine",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.e, b.e)
                 / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))), 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.e, b.e)
                / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))), 6) >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    out = D.embedding_near_dups(emb, "vec_id", "embedding", threshold=-1.0)
    return out.filter(F.col("cos_sim") >= 0.45)


@query(
    "ann_bruteforce_topk",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
    sims AS (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               ROUND(list_dot_product(qe, e)
                     / (SQRT(list_dot_product(qe, qe)) * SQRT(list_dot_product(e, e))), 6) AS cos_sim
        FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM sims
    ) WHERE rank <= 5
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = SIM.bruteforce_topk(emb, queries, k=5)
    return out.select("query_id", "neighbor_id", "cos_sim", "rank")


def _lsh_oracle_sql(dim: int = 64, bits: int = 4, tables: int = 16, seed: int = 42, k: int = 5) -> str:
    """Generate the DuckDB mirror of ``SIM.lsh_topk``: the integer plane
    literals are emitted into the SQL (mechanical but exact — every dot
    product is integer-valued, so bucket assignment is engine-independent;
    see similarity.integer_planes)."""
    parts = []
    for t in range(tables):
        planes = SIM.integer_planes(dim, bits, t, seed)
        bucket = " + ".join(
            "(CASE WHEN list_dot_product(v, [{vals}]) >= 0 THEN {w} ELSE 0 END)".format(
                vals=", ".join(f"{float(x)}" for x in p), w=1 << j
            )
            for j, p in enumerate(planes)
        )
        parts.append(f"SELECT vec_id, {t} AS tbl, {bucket} AS bucket FROM qv")
    buckets = "\n    UNION ALL\n    ".join(parts)
    return f"""
    WITH qv AS (
        SELECT vec_id,
               list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v,
               embedding::DOUBLE[] AS e
        FROM embeddings
    ),
    buckets AS ({buckets}),
    cands AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM buckets q JOIN buckets c USING (tbl, bucket)
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
    ),
    sims AS (
        SELECT query_id, neighbor_id,
               ROUND(list_dot_product(a.e, b.e)
                     / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))), 6) AS cos_sim
        FROM cands JOIN qv a ON a.vec_id = query_id JOIN qv b ON b.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM sims
    ) WHERE rank <= {k}
    """


@query("ann_lsh_bucketed", _lsh_oracle_sql())
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN with a full DuckDB oracle (plane literals emitted
    into the SQL; recall vs brute force additionally asserted in
    tests/test_similarity_text.py::test_lsh_topk_recall)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.lsh_topk(emb, queries, dim=64, k=5, bits=4, tables=16).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@query(
    "ann_ivf_topk",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
               FROM embeddings),
    c AS (SELECT vec_id AS cid, qv AS cv FROM v WHERE vec_id < 8),
    ad AS (SELECT v.vec_id, c.cid,
                  list_dot_product(v.qv, v.qv) - 2 * list_dot_product(v.qv, c.cv)
                      + list_dot_product(c.cv, c.cv) AS d
           FROM v CROSS JOIN c),
    cell AS (SELECT vec_id, cid AS cell, rn FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                 FROM ad) WHERE rn <= 2),
    corpus_cell AS (SELECT vec_id, cell FROM cell WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, cell FROM cell WHERE vec_id < 5),
    cands AS (SELECT q.query_id, cc.vec_id AS neighbor_id
              FROM q JOIN corpus_cell cc USING (cell)
              WHERE cc.vec_id <> q.query_id),
    sims AS (SELECT query_id, neighbor_id,
                    ROUND(list_dot_product(qe.e, ne.e)
                          / (SQRT(list_dot_product(qe.e, qe.e))
                             * SQRT(list_dot_product(ne.e, ne.e))), 6) AS cos_sim
             FROM cands
             JOIN v qe ON qe.vec_id = cands.query_id
             JOIN v ne ON ne.vec_id = cands.neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM sims
    ) WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (the task brief's IVF scale path): corpus
    sharded into centroid cells, queries probe their 2 nearest cells, exact
    rounded cosine + top-k within cells — candidate set oracle-exact via
    integer-L2 cell assignment."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=2).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@query(
    "dedup_semantic",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
               FROM embeddings),
    c AS (SELECT vec_id AS cid, qv AS cv FROM v WHERE vec_id < 8),
    ad AS (SELECT v.vec_id, c.cid,
                  list_dot_product(v.qv, v.qv) - 2 * list_dot_product(v.qv, c.cv)
                      + list_dot_product(c.cv, c.cv) AS d
           FROM v CROSS JOIN c),
    cell AS (SELECT vec_id, cid AS cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                 FROM ad) WHERE rn = 1),
    edges AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM cell a JOIN cell b USING (cell)
              JOIN v va ON va.vec_id = a.vec_id
              JOIN v vb ON vb.vec_id = b.vec_id
              WHERE a.vec_id < b.vec_id
                AND ROUND(list_dot_product(va.e, vb.e)
                          / (SQRT(list_dot_product(va.e, va.e))
                             * SQRT(list_dot_product(vb.e, vb.e))), 6) >= 0.9),
    dups AS (SELECT id_b AS vec_id, MIN(id_a) AS dup_of FROM edges GROUP BY id_b)
    SELECT cell.vec_id, cell.cell, dups.dup_of, dups.dup_of IS NULL AS kept
    FROM cell LEFT JOIN dups USING (vec_id)
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: coarse-quantizer clustering + within-cluster
    rounded-cosine keep-one (min-id), cluster partition oracle-exact via
    integer-L2 cell assignment (same codebook stand-in as ``ann_ivf_topk``)."""
    emb = load(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, n_centroids=8, threshold=0.9)


@query(
    "text_quality",
    """
    WITH toks AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           len(tk) AS n_tokens,
           CAST(ROUND(LENGTH(regexp_replace(text, '\\s', '', 'g')) * 10000.0 / len(tk)) AS BIGINT) AS mean_word_len_centi,
           CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS punct_bps,
           CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS upper_bps,
           CAST(ROUND(len(list_filter(tk, t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) * 10000.0 / len(tk)) AS BIGINT) AS stopword_bps
    FROM toks
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_features(load(spark, sf_dir, "documents"), "doc_id", "text")


_HITS_SQL = ", ".join(
    "len(list_filter(tk, t -> list_contains([{words}], lower(t)))) AS hits_{lang}".format(
        words=", ".join(f"'{w}'" for w in ws), lang=lang
    )
    for lang, ws in sorted(T.LANG_MARKERS.items())
)


@query(
    "text_lang_id",
    f"""
    WITH toks AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    hits AS (SELECT doc_id, lang, {_HITS_SQL} FROM toks)
    SELECT doc_id, lang, hits_de, hits_en, hits_sk,
           CASE WHEN hits_de >= greatest(hits_en, hits_sk, 1) THEN 'de'
                WHEN hits_en >= greatest(hits_de, hits_sk, 1) THEN 'en'
                WHEN hits_sk >= greatest(hits_de, hits_en, 1) THEN 'sk'
                ELSE 'unk' END AS pred_lang
    FROM hits
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return T.lang_scores(docs, "text").select(
        "doc_id", "lang", "hits_de", "hits_en", "hits_sk", "pred_lang"
    )


@query(
    "text_fingerprint",
    """
    SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(load(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_substring_dedup",
    """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    grams AS (
        SELECT doc_id, md5(array_to_string(tk[i:i+7], ' ')) AS gkey
        FROM toks, UNNEST(CASE WHEN len(tk) >= 8 THEN range(1, len(tk) - 6) ELSE [] END) AS u(i)
    ),
    per_g AS (SELECT gkey, COUNT(DISTINCT doc_id) AS n_docs FROM grams GROUP BY gkey),
    per_doc AS (
        SELECT g.doc_id,
               COUNT(*) AS n_windows,
               SUM(CASE WHEN p.n_docs >= 2 THEN 1 ELSE 0 END) AS dup_windows
        FROM grams g JOIN per_g p USING (gkey) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_windows, 0) AS n_windows,
           CAST(COALESCE(dup_windows, 0) AS BIGINT) AS dup_windows,
           CAST(CASE WHEN COALESCE(n_windows, 0) = 0 THEN 0
                ELSE (dup_windows * 10000) // n_windows END AS BIGINT) AS dup_bps
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated 8-token-span stats per document (exact substring dedup)."""
    return T.duplicated_span_stats(load(spark, sf_dir, "documents"), "doc_id", "text", n=8)


@query(
    "text_block_dedup",
    """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE CAST(ceil(len(regexp_split_to_array(trim(text), '\\s+')) / 10.0) AS INT)
               END AS nb
        FROM documents
    ),
    blocks AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(tk[(i-1)*10+1 : (i-1)*10+10], ' ') AS block
        FROM toks, UNNEST(CASE WHEN nb > 0 THEN range(1, nb + 1) ELSE [] END) AS u(i)
    ),
    tagged AS (
        SELECT doc_id, pos, block,
               ROW_NUMBER() OVER (PARTITION BY md5(block) ORDER BY doc_id, pos) = 1 AS kept
        FROM blocks
    ),
    per_doc AS (
        SELECT doc_id,
               COUNT(*) AS n_blocks,
               SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS removed_blocks,
               COALESCE(string_agg(CASE WHEN kept THEN block END, ' ' ORDER BY pos), '') AS clean_text
        FROM tagged GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_blocks, 0) AS n_blocks,
           CAST(COALESCE(removed_blocks, 0) AS BIGINT) AS removed_blocks,
           COALESCE(clean_text, '') AS clean_text
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
)
def text_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level duplicate-span removal: global
    first-occurrence-wins over disjoint 10-token blocks, rebuilt clean text
    per document (the cleaning counterpart of ``text_substring_dedup``)."""
    return T.remove_duplicate_blocks(load(spark, sf_dir, "documents"), "doc_id", "text", k=10)


@query(
    "text_token_counts",
    """
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                        w -> CAST(ceil(LENGTH(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_ish
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    )


@query(
    "images_table",
    """
    SELECT printf('img%010d', c_custkey) AS image_id,
           'Poslanec ' || c_name || ' (7. obdobie)' AS caption,
           1 AS psnr_ok, 1 AS lossless_ok, 1 AS caption_ok, 1 AS dims_ok, 1 AS phash_ok
    FROM customer WHERE c_custkey <= 200
    """,
)
def images_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint image+caption table, hash-gated: the query encodes each
    image (FIMG fake codec), decodes it back, and emits the per-row
    input_hint invariants as integer columns whose expected value (1) the
    DuckDB oracle derives from the same customer rows — if any decode/PSNR/
    caption/dims/phash invariant breaks, the value hash mismatches.
    Raw bytes can't be built in SQL; full byte-level round-trip additionally
    asserted in tests/test_images.py."""
    from nrsr_crawler_spark.sources.images import build_images, verify_images

    captions = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            F.concat(F.lit("Poslanec "), F.col("c_name"), F.lit(" (7. obdobie)")).alias("caption"),
        )
    )
    imgs = build_images(spark, captions)
    ver = verify_images(imgs, captions)
    return ver.join(captions, "image_id").select(
        "image_id",
        "caption",
        (F.col("psnr_db") >= 40.0).cast("int").alias("psnr_ok"),
        ((F.col("fmt") != "png") | F.col("exact")).cast("int").alias("lossless_ok"),
        F.col("caption_ok").cast("int").alias("caption_ok"),
        (F.col("w_ok") & F.col("h_ok")).cast("int").alias("dims_ok"),
        F.col("phash_ok").cast("int").alias("phash_ok"),
    )


@query(
    "multimodal_features",
    """
    SELECT printf('img%010d', c_custkey) AS image_id,
           1 AS decode_ok, 1 AS dims_ok, 1 AS stats_ok, 1 AS phash_ok,
           1 AS resize_ok, 1 AS features_ok
    FROM customer WHERE c_custkey <= 100
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / resize / feature-extract over the image table, hash-gated:
    each mapInPandas kernel's output is checked against the image table's
    stored metadata and emitted as integer invariant columns the DuckDB
    oracle mirrors (expected value 1 per row)."""
    from nrsr_crawler_spark.operators.multimodal import decode_stats, extract_features, resize_images
    from nrsr_crawler_spark.sources.images import build_images

    captions = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            F.col("c_name").alias("caption"),
        )
    )
    imgs = build_images(spark, captions).persist()
    stats = decode_stats(imgs)
    resized = decode_stats(resize_images(imgs, out_h=16, out_w=16)).select(
        "image_id", F.col("w").alias("rw"), F.col("h").alias("rh")
    )
    feats = extract_features(imgs, bins=16).select(
        "image_id",
        F.size("features").alias("n_feats"),
        F.round(F.aggregate(F.col("features"), F.lit(0.0), lambda a, v: a + v), 3).alias("feat_sum"),
    )
    meta = imgs.select("image_id", F.col("w").alias("mw"), F.col("h").alias("mh"), F.col("phash").alias("mphash"))
    return (
        stats.join(meta, "image_id")
        .join(resized, "image_id")
        .join(feats, "image_id")
        .select(
            "image_id",
            ((F.col("w") > 0) & (F.col("h") > 0)).cast("int").alias("decode_ok"),
            ((F.col("w") == F.col("mw")) & (F.col("h") == F.col("mh"))).cast("int").alias("dims_ok"),
            ((F.col("mean_px") >= 0) & (F.col("mean_px") <= 255) & (F.col("std_px") >= 0)).cast("int").alias("stats_ok"),
            (F.col("phash") == F.col("mphash")).cast("int").alias("phash_ok"),
            ((F.col("rw") == 16) & (F.col("rh") == 16)).cast("int").alias("resize_ok"),
            ((F.col("n_feats") == 16) & (F.col("feat_sum") == 1.0)).cast("int").alias("features_ok"),
        )
    )


# ---------------------------------------------------------------------------
# north_rule tie-in: the frontier pass running OVER the image+caption
# substrate — schedule photo fetches for image records whose phash hasn't
# been computed yet (image_id space = the images_table id space; "already
# decoded" = custkey % 3 == 0).  Same kernel as the flagship (canon →
# xxhash64 → in-batch first-writer dedup → seen anti-join → politeness pop),
# fully DuckDB-oracle-checked.
# ---------------------------------------------------------------------------
@query(
    "images_frontier_schedule",
    """
    WITH cand AS (
        SELECT 'https://www.nrsr.sk/web/Dynamic/PoslanecPhoto.aspx?PoslanecID='
                   || (c_custkey % 5000) || '&large=1' AS canon_url,
               c_custkey AS seq
        FROM customer
    ), dedup AS (
        SELECT canon_url, MIN(seq) AS seq FROM cand GROUP BY canon_url
    ), fresh AS (
        SELECT d.* FROM dedup d
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c
            WHERE c.c_custkey % 3 = 0 AND c.c_custkey < 300
              AND 'https://www.nrsr.sk/web/Dynamic/PoslanecPhoto.aspx?PoslanecID='
                      || (c.c_custkey % 5000) || '&large=1' = d.canon_url
        )
    )
    SELECT canon_url, seq, rk FROM (
        SELECT canon_url, seq,
               row_number() OVER (ORDER BY seq DESC, canon_url) AS rk
        FROM fresh
    ) WHERE rk <= 50
    """,
)
def images_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import frontier, politeness

    cust = load(spark, sf_dir, "customer")
    raw = cust.select(
        F.concat(
            F.lit("HTTPS://WWW.NRSR.SK/web/Dynamic/PoslanecPhoto.aspx?large=1&PoslanecID="),
            F.col("c_custkey") % 5000,
            F.lit("#frag"),
        ).alias("url"),
        F.col("c_custkey").alias("seq"),
        F.lit(0).alias("priority"),
    )
    cand = frontier.prepare_candidates(raw)
    seen = cust.filter((F.col("c_custkey") % 3 == 0) & (F.col("c_custkey") < 300)).select(
        F.xxhash64(
            F.concat(
                F.lit("https://www.nrsr.sk/web/Dynamic/PoslanecPhoto.aspx?PoslanecID="),
                F.col("c_custkey") % 5000,
                F.lit("&large=1"),
            )
        ).alias("url_hash")
    )
    fresh = frontier.dedup_against_seen(cand, seen)
    popped = politeness.pop_budget(fresh, budget=50, tiebreak=[F.col("canon_url")])
    return popped.select("canon_url", "seq", "rk")


# ---------------------------------------------------------------------------
# Image near-dup by perceptual-hash Hamming ball (input_hint phash column):
# banded byte-bucket join + bit_count(xor) verify — operators/image_dedup.py.
# The phash values are derived from c_custkey with engine-portable integer
# arithmetic (groups of 4 images whose hashes differ by ≤2 flipped bits) so
# DuckDB mirrors the exact pair set; on real data the same operator runs on
# build_images' codec-computed phashes (tests/test_image_dedup.py).
# ---------------------------------------------------------------------------
_PH_SQL = """
        SELECT printf('img%010d', c_custkey) AS image_id,
               CAST(xor(
                 ((((c_custkey - 1) // 4) * 2654435761) % 2147483648)
                 + ((((c_custkey - 1) // 4) * 2246822519 + 2531011) % 2147483648) * 2147483648,
                 CASE WHEN c_custkey % 4 <> 0
                      THEN (CAST(1 AS BIGINT) << CAST((c_custkey % 4) * 13 AS INTEGER))
                      ELSE 0 END
               ) AS BIGINT) AS phash
        FROM customer WHERE c_custkey BETWEEN 1 AND 2000
"""


@query(
    "images_phash_neardup",
    f"""
    WITH ph AS ({_PH_SQL})
    SELECT a.image_id AS id_a, b.image_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM ph a JOIN ph b ON a.image_id < b.image_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """,
)
def images_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.image_dedup import phash_neardup_pairs

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey").between(1, 2000))
    base = F.floor((F.col("c_custkey") - 1) / 4).cast("long")
    m1 = (base * 2654435761) % 2147483648
    m2 = (base * 2246822519 + 2531011) % 2147483648
    flip = F.expr(
        "CASE WHEN c_custkey % 4 <> 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), CAST((c_custkey % 4) * 13 AS INT)) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    images = cust.select(
        F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
        (m1 + m2 * 2147483648).bitwiseXOR(flip).alias("phash"),
    )
    pairs = phash_neardup_pairs(images, max_hamming=3, n_bands=8)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


# ---------------------------------------------------------------------------
# Connected-components grouping over the near-dup graph: CHAIN-shaped phash
# clusters (groups of 5 whose masks nest — consecutive members differ by ONE
# bit, the chain's ends by four) where the single-hop min-id convention
# under-merges; phash_connected_groups iterates min-label propagation to the
# fixpoint a recursive-CTE oracle derives independently.
# ---------------------------------------------------------------------------
_PH_CHAIN_SQL = """
        SELECT printf('img%010d', c_custkey) AS image_id,
               CAST(xor(
                 ((((c_custkey - 1) // 5) * 2654435761) % 2147483648)
                 + ((((c_custkey - 1) // 5) * 2246822519 + 2531011) % 2147483648) * 2147483648,
                 ((CAST(1 AS BIGINT) << CAST((c_custkey - 1) % 5 AS INTEGER)) - 1) * 256
               ) AS BIGINT) AS phash
        FROM customer WHERE c_custkey BETWEEN 1 AND 1000
"""


@query(
    "images_phash_cc_groups",
    f"""
    WITH RECURSIVE ph AS ({_PH_CHAIN_SQL}),
    pairs AS (
        SELECT a.image_id AS id_a, b.image_id AS id_b
        FROM ph a JOIN ph b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 1
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT image_id, image_id FROM ph
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    )
    SELECT id AS image_id, MIN(r) AS rep FROM reach GROUP BY id
    """,
)
def images_phash_cc_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.image_dedup import (
        phash_connected_groups,
        phash_neardup_pairs,
    )

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey").between(1, 1000))
    base = F.floor((F.col("c_custkey") - 1) / 5).cast("long")
    m1 = (base * 2654435761) % 2147483648
    m2 = (base * 2246822519 + 2531011) % 2147483648
    # nested masks: member j of a group flips bits 8..8+j-1 — hamming between
    # members i and j is |i-j|, so max_hamming=1 admits ONLY the chain edges
    mask = F.expr(
        "(shiftleft(CAST(1 AS BIGINT), CAST((c_custkey - 1) % 5 AS INT)) - 1) * 256"
    )
    images = cust.select(
        F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
        (m1 + m2 * 2147483648).bitwiseXOR(mask).alias("phash"),
    )
    pairs = phash_neardup_pairs(images, max_hamming=1, n_bands=8)
    return phash_connected_groups(pairs, images)


# ---------------------------------------------------------------------------
# Crawl-trap templates: URL-shape explosion guard (operators/traps.py) — a
# calendar/session-id family generating one distinct URL per row must be
# flagged while a bounded id enumeration (500 pages) stays under budget.
# Half the raw URLs arrive messy (uppercase scheme+host, fragment) and must
# collapse through canonicalization before counting.
# ---------------------------------------------------------------------------
@query(
    "crawl_trap_templates",
    """
    WITH urls AS (
        SELECT DISTINCT 'https://www.nrsr.sk/web/Default.aspx?ID=' || (o_orderkey % 500)
               || '&sid=zakony' AS canon_url
        FROM orders
        UNION
        SELECT DISTINCT 'https://www.nrsr.sk/web/calendar.aspx?day=' || o_orderkey
               || '&session=s' || o_orderkey
        FROM orders
    )
    SELECT host, template, n_urls FROM (
        SELECT 'www.nrsr.sk' AS host,
               regexp_replace(canon_url, '[0-9]+', 'N', 'g') AS template,
               COUNT(*) AS n_urls
        FROM urls GROUP BY 1, 2
    ) WHERE n_urls > 600
    """,
)
def crawl_trap_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import frontier, traps

    orders = load(spark, sf_dir, "orders")
    # messy variants (uppercase scheme+host + fragment) on even orderkeys:
    # canon must collapse them onto the lowercase form before templating
    prefix = F.when(
        F.col("o_orderkey") % 2 == 0, F.lit("HTTPS://WWW.NRSR.SK")
    ).otherwise(F.lit("https://www.nrsr.sk"))
    frag = F.when(F.col("o_orderkey") % 2 == 0, F.lit("#top")).otherwise(F.lit(""))
    legit = orders.select(
        F.concat(
            prefix,
            F.lit("/web/Default.aspx?ID="),
            F.col("o_orderkey") % 500,
            F.lit("&sid=zakony"),
            frag,
        ).alias("url"),
        F.col("o_orderkey").alias("seq"),
        F.lit(0).alias("priority"),
    )
    trap = orders.select(
        F.concat(
            prefix,
            F.lit("/web/calendar.aspx?day="),
            F.col("o_orderkey"),
            F.lit("&session=s"),
            F.col("o_orderkey"),
            frag,
        ).alias("url"),
        (F.col("o_orderkey") + F.lit(100000000)).alias("seq"),
        F.lit(0).alias("priority"),
    )
    cand = frontier.prepare_candidates(legit.unionByName(trap))
    return traps.trap_templates(cand, max_urls=600)


# ---------------------------------------------------------------------------
# Near-dup-aware training manifest: keep the smallest QUALITY-PASSING member
# of each phash near-dup group (operators/image_dedup.neardup_manifest) —
# the dedup→select→shard step of a multimodal pretraining pipeline.  Groups
# of 4 reuse the images_phash_neardup construction; dims derive from
# c_custkey so the quality gate (min side ≥ 48 px, aspect within 2×) is
# engine-portable integer arithmetic.
# ---------------------------------------------------------------------------
@query(
    "images_train_manifest",
    f"""
    WITH ph AS (
        SELECT image_id, phash,
               32 + (CAST(substr(image_id, 4) AS BIGINT) % 7) * 16 AS w,
               32 + (CAST(substr(image_id, 4) AS BIGINT) % 5) * 16 AS h
        FROM ({_PH_SQL})
    ),
    pairs AS (
        SELECT a.image_id AS id_a, b.image_id AS id_b
        FROM ph a JOIN ph b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
    ),
    grp AS (
        SELECT p.image_id, coalesce(m.rep, p.image_id) AS rep
        FROM ph p LEFT JOIN (
            SELECT id_b AS image_id, MIN(id_a) AS rep FROM pairs GROUP BY id_b
        ) m USING (image_id)
    ),
    q AS (
        SELECT image_id,
               (least(w, h) >= 48 AND w <= 2 * h AND h <= 2 * w) AS ok
        FROM ph
    )
    SELECT rep,
           MIN(CASE WHEN ok THEN image_id END) AS kept_id,
           COUNT(*) AS n_members,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
    FROM grp JOIN q USING (image_id)
    GROUP BY rep
    HAVING MIN(CASE WHEN ok THEN image_id END) IS NOT NULL
    """,
)
def images_train_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.image_dedup import (
        neardup_manifest,
        phash_neardup_groups,
        phash_neardup_pairs,
    )

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey").between(1, 2000))
    base = F.floor((F.col("c_custkey") - 1) / 4).cast("long")
    m1 = (base * 2654435761) % 2147483648
    m2 = (base * 2246822519 + 2531011) % 2147483648
    flip = F.expr(
        "CASE WHEN c_custkey % 4 <> 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), CAST((c_custkey % 4) * 13 AS INT)) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    images = cust.select(
        F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
        (m1 + m2 * 2147483648).bitwiseXOR(flip).alias("phash"),
        (F.lit(32) + (F.col("c_custkey") % 7) * 16).alias("w"),
        (F.lit(32) + (F.col("c_custkey") % 5) * 16).alias("h"),
    )
    pairs = phash_neardup_pairs(images, max_hamming=3, n_bands=8)
    groups = phash_neardup_groups(pairs, images)
    quality = images.select(
        "image_id",
        (
            (F.least("w", "h") >= 48)
            & (F.col("w") <= 2 * F.col("h"))
            & (F.col("h") <= 2 * F.col("w"))
        ).alias("ok"),
    )
    return neardup_manifest(groups, quality)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (operators/sampling.py): fixed quota of
# documents per (predicted language × length bucket) stratum, ordered by
# md5(doc_id) — the training-mixture balancing step.  The Spark side runs
# the salted two-level window (no single-reducer stratum at 10^10 rows); the
# oracle runs the naive single window — identical results because the salted
# level-1 keeps a superset of the true per-stratum top-k.
# ---------------------------------------------------------------------------
@query(
    "docs_stratified_sample",
    f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
    ),
    hits AS (SELECT doc_id, len(tk) AS n_tokens, {_HITS_SQL} FROM toks),
    feat AS (
        SELECT doc_id,
               CASE WHEN hits_de >= greatest(hits_en, hits_sk, 1) THEN 'de'
                    WHEN hits_en >= greatest(hits_de, hits_sk, 1) THEN 'en'
                    WHEN hits_sk >= greatest(hits_de, hits_en, 1) THEN 'sk'
                    ELSE 'unk' END AS pred_lang,
               CAST(least(n_tokens // 25, 3) AS INTEGER) AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM hits
    )
    SELECT doc_id, pred_lang, bucket, CAST(rn AS INTEGER) AS rn FROM (
        SELECT doc_id, pred_lang, bucket,
               row_number() OVER (PARTITION BY pred_lang, bucket ORDER BY ord) AS rn
        FROM feat
    ) WHERE rn <= 10
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.sampling import stratified_topk

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    feat = T.lang_scores(docs, "text").select(
        "doc_id",
        "pred_lang",
        F.least(F.floor(T.token_count(F.col("text")) / 25), F.lit(3))
        .cast("int")
        .alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("__ord"),
    )
    out = stratified_topk(
        feat, ["pred_lang", "bucket"], F.col("__ord"), k=10, num_salts=8
    )
    return out.select("doc_id", "pred_lang", "bucket", "rn")


# ---------------------------------------------------------------------------
# Sitemap source (sources/sitemap.py): Spark must PARSE pretty-printed,
# namespaced sitemap XML (JVM regexp_extract_all, one row per <url> block)
# and reduce to latest-lastmod per canonical URL; the oracle derives the
# same result relationally from the base table.  Second entry per sitemap is
# messy (uppercase scheme+host, fragment, no lastmod) to exercise canon and
# the -1 undated priority.
# ---------------------------------------------------------------------------
@query(
    "sitemap_scan",
    """
    WITH det AS (
        SELECT 'https://www.nrsr.sk/web/Default.aspx?ID=' || (o_orderkey % 300) AS canon_url,
               'www.nrsr.sk' AS host,
               MAX(CAST(o_orderdate AS DATE)) AS lastmod
        FROM orders GROUP BY 1, 2
    ),
    prs AS (
        SELECT DISTINCT 'https://www.nrsr.sk/web/Press.aspx?PressID=' || (o_orderkey % 100) AS canon_url,
               'www.nrsr.sk' AS host, CAST(NULL AS DATE) AS lastmod
        FROM orders
    )
    SELECT canon_url, host, lastmod,
           CAST(coalesce(datediff('day', DATE '1970-01-01', lastmod), -1) AS INTEGER) AS priority
    FROM (SELECT * FROM det UNION ALL SELECT * FROM prs)
    """,
)
def sitemap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.sources.sitemap import sitemap_candidates

    orders = load(spark, sf_dir, "orders")
    body = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'),
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'),
        F.lit(" <url>\n  <loc>\n   https://www.nrsr.sk/web/Default.aspx?ID="),
        F.col("o_orderkey") % 300,
        F.lit("\n  </loc>\n  <lastmod>"),
        F.col("o_orderdate").cast("string"),
        F.lit("</lastmod>\n </url>\n <url><loc>HTTPS://WWW.NRSR.SK/web/Press.aspx?PressID="),
        F.col("o_orderkey") % 100,
        F.lit("#frag</loc></url>\n</urlset>\n"),
    )
    pages = orders.select(
        F.concat(F.lit("https://www.nrsr.sk/sitemap_"), F.col("o_orderkey"), F.lit(".xml")).alias("url"),
        body.cast("binary").alias("body"),
    )
    return sitemap_candidates(pages).select("canon_url", "host", "lastmod", "priority")


# ---------------------------------------------------------------------------
# Cross-modal dedup grouping: components of (phash-near ∪ exact-caption)
# edges — the same photo recaptioned and the same caption on recropped
# variants land in ONE group.  Caption classes of 8 (custkeys 8h+1..8h+8)
# bridge exactly two adjacent 4-member phash groups, so the fixture's true
# 8-member components exist only in the UNION graph; the oracle re-derives
# them with a recursive CTE.  Caption edges are stars (member → class min),
# the only caption-clique shape that scales.
# ---------------------------------------------------------------------------
@query(
    "images_crossmodal_groups",
    f"""
    WITH RECURSIVE ph AS (
        SELECT image_id, phash,
               'cap' || ((CAST(substr(image_id, 4) AS BIGINT) - 1) // 8) AS caption
        FROM ({_PH_SQL})
    ),
    pp AS (
        SELECT a.image_id AS id_a, b.image_id AS id_b
        FROM ph a JOIN ph b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
    ),
    caps AS (
        SELECT caption, MIN(image_id) AS id_a, COUNT(*) AS n
        FROM ph GROUP BY caption
    ),
    ce AS (
        SELECT c.id_a, p.image_id AS id_b
        FROM ph p JOIN caps c USING (caption)
        WHERE c.n > 1 AND p.image_id <> c.id_a
    ),
    und AS (SELECT * FROM pp UNION ALL SELECT * FROM ce),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM und
        UNION ALL SELECT id_b, id_a FROM und
    ),
    reach(id, r) AS (
        SELECT image_id, image_id FROM ph
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    )
    SELECT id AS image_id, MIN(r) AS rep FROM reach GROUP BY id
    """,
)
def images_crossmodal_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.image_dedup import (
        crossmodal_groups,
        phash_neardup_pairs,
    )

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey").between(1, 2000))
    base = F.floor((F.col("c_custkey") - 1) / 4).cast("long")
    m1 = (base * 2654435761) % 2147483648
    m2 = (base * 2246822519 + 2531011) % 2147483648
    flip = F.expr(
        "CASE WHEN c_custkey % 4 <> 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), CAST((c_custkey % 4) * 13 AS INT)) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    images = cust.select(
        F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
        (m1 + m2 * 2147483648).bitwiseXOR(flip).alias("phash"),
        F.concat(F.lit("cap"), F.floor((F.col("c_custkey") - 1) / 8).cast("long")).alias("caption"),
    )
    pairs = phash_neardup_pairs(images, max_hamming=3, n_bands=8)
    return crossmodal_groups(images, pairs)


def _lsh_pairs_oracle_sql(
    dim: int = 64,
    bits: int = 6,
    tables: int = 8,
    seed: int = 42,
    threshold: float = 0.45,
    max_bucket: int = 60,
) -> str:
    """DuckDB mirror of ``SIM.lsh_near_dup_pairs`` (plane literals emitted
    into the SQL, same construction as ``_lsh_oracle_sql``): bucket →
    hot-bucket cap → in-bucket pairs → exact rounded cosine ≥ threshold."""
    parts = []
    for t in range(tables):
        planes = SIM.integer_planes(dim, bits, t, seed)
        bucket = " + ".join(
            "(CASE WHEN list_dot_product(v, [{vals}]) >= 0 THEN {w} ELSE 0 END)".format(
                vals=", ".join(f"{float(x)}" for x in p), w=1 << j
            )
            for j, p in enumerate(planes)
        )
        parts.append(f"SELECT vec_id, {t} AS tbl, {bucket} AS bucket FROM qv")
    buckets = "\n    UNION ALL\n    ".join(parts)
    return f"""
    WITH qv AS (
        SELECT vec_id,
               list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v,
               embedding::DOUBLE[] AS e
        FROM embeddings
    ),
    buckets AS ({buckets}),
    bcount AS (SELECT tbl, bucket, COUNT(*) AS n FROM buckets GROUP BY tbl, bucket),
    fbuckets AS (SELECT b.* FROM buckets b JOIN bcount c USING (tbl, bucket)
                 WHERE c.n <= {max_bucket}),
    cands AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM fbuckets a JOIN fbuckets b USING (tbl, bucket)
        WHERE a.vec_id < b.vec_id
    ),
    sims AS (
        SELECT id_a, id_b,
               ROUND(list_dot_product(a.e, b.e)
                     / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))), 6) AS cos_sim
        FROM cands JOIN qv a ON a.vec_id = id_a JOIN qv b ON b.vec_id = id_b
    )
    SELECT id_a, id_b, cos_sim FROM sims WHERE cos_sim >= {threshold}
    """


@query("dedup_embedding_lsh", _lsh_pairs_oracle_sql())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: LSH-bucketed in-bucket pairs +
    exact cosine verify (upgrades dedup_embedding_cosine's labeled
    tiny-side crossJoin baseline); subset-of-bruteforce and hot-bucket-cap
    semantics asserted in tests/test_similarity_text.py."""
    return SIM.lsh_near_dup_pairs(
        load(spark, sf_dir, "embeddings"),
        dim=64,
        threshold=0.45,
        bits=6,
        tables=8,
        max_bucket=60,
    ).select("id_a", "id_b", "cos_sim")


# Decoded-pixel content gate (operators/image_quality.py): flat / clipped /
# low-entropy images planted deterministically by key arithmetic (custkey%7:
# 0 → constant-flat, 1 → rail-clipped threshold, else untouched), then
# re-detected FROM DECODED PIXELS after the lossy codec round-trip.  The
# oracle derives the expected flag from the same arithmetic — any drift in
# decode, the quality signals, or the gate thresholds hash-mismatches.
@query(
    "images_quality_gate",
    """
    SELECT printf('img%010d', c_custkey) AS image_id,
           CASE c_custkey % 7 WHEN 0 THEN 'flat' WHEN 1 THEN 'clipped'
                ELSE 'ok' END AS flag,
           CAST(c_custkey % 7 >= 2 AS INT) AS keep
    FROM customer WHERE c_custkey <= 300
    """,
)
def images_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import image_quality as IQ

    modes = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            F.col("c_name").alias("caption"),
            F.when(F.pmod(F.col("c_custkey"), F.lit(7)) == 0, F.lit("flat"))
            .when(F.pmod(F.col("c_custkey"), F.lit(7)) == 1, F.lit("clipped"))
            .otherwise(F.lit("ok"))
            .alias("mode"),
        )
    )
    imgs = IQ.build_degraded_images(spark, modes)
    gated = IQ.quality_gate(IQ.quality_stats(imgs))
    return gated.select("image_id", "flag", "keep")


# Training-shard manifest (operators/shards.py): deterministic md5-bucket
# sharding of the document corpus + per-shard manifest row (count / byte
# weight / key range).  The oracle reproduces the shard function from the
# same instr/substring arithmetic — membership, balance, and ranges are all
# hash-gated.  The physical write path (repartition + sortWithinPartitions
# + maxRecordsPerFile) is gated by tests/test_shards.py.
def _shards_oracle_sql() -> str:
    from nrsr_crawler_spark.operators.shards import oracle_shard_sql

    return f"""
    SELECT {oracle_shard_sql('doc_id')} AS shard_id,
           COUNT(*) AS n_rows,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_weight,
           MIN(doc_id) AS first_key,
           MAX(doc_id) AS last_key
    FROM documents GROUP BY 1
    """


@query("train_shards_stats", _shards_oracle_sql())
def train_shards_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import shards as SH

    docs = load(spark, sf_dir, "documents")
    return SH.shard_stats(docs, "doc_id", F.length("text").cast("long"))


# Joint image×caption sample filter (operators/pair_gate.py): image content
# flags planted by custkey%7 (as images_quality_gate), caption defects
# planted by custkey%5 ('' → short, one token → short, ALL-CAPS → shouty).
# The oracle derives both gates and the precedence'd drop ledger from the
# same arithmetic — detection itself runs on decoded pixels / real column
# expressions Spark-side.
@query(
    "multimodal_pair_gate",
    """
    WITH base AS (
        SELECT c_custkey,
               printf('img%010d', c_custkey) AS image_id,
               CASE c_custkey % 7 WHEN 0 THEN 'flat' WHEN 1 THEN 'clipped'
                    ELSE 'ok' END AS image_flag,
               CASE c_custkey % 5 WHEN 1 THEN 'short' WHEN 2 THEN 'short'
                    WHEN 3 THEN 'shouty' ELSE 'ok' END AS caption_reason
        FROM customer WHERE c_custkey <= 280
    )
    SELECT image_id, image_flag, caption_reason,
           CAST(image_flag = 'ok' AND caption_reason = 'ok' AS INT) AS keep,
           CASE WHEN image_flag <> 'ok' THEN 'image_' || image_flag
                WHEN caption_reason <> 'ok' THEN 'caption_' || caption_reason
                ELSE NULL END AS drop_reason
    FROM base
    """,
)
def multimodal_pair_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import image_quality as IQ
    from nrsr_crawler_spark.operators import pair_gate as PG

    base = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 280)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            F.when(F.pmod(F.col("c_custkey"), F.lit(5)) == 1, F.lit(""))
            .when(F.pmod(F.col("c_custkey"), F.lit(5)) == 2, F.lit("x"))
            .when(F.pmod(F.col("c_custkey"), F.lit(5)) == 3, F.lit("AAAA BBBB CCCC DDDD"))
            .otherwise(F.concat(F.lit("Poslanec "), F.col("c_name"), F.lit(" obdobie")))
            .alias("caption"),
            F.when(F.pmod(F.col("c_custkey"), F.lit(7)) == 0, F.lit("flat"))
            .when(F.pmod(F.col("c_custkey"), F.lit(7)) == 1, F.lit("clipped"))
            .otherwise(F.lit("ok"))
            .alias("mode"),
        )
    )
    imgs = IQ.build_degraded_images(spark, base.select("image_id", "caption", "mode"))
    gated = IQ.quality_gate(IQ.quality_stats(imgs))
    return PG.pair_gate(gated, base.select("image_id", "caption"))


# Dataset-card rollup: the per-(source, lang) corpus summary a training run
# documents — volume, token mass, exact-dup rate via fingerprint distinct.
# One map-side-combinable aggregation; full oracle.
@query(
    "corpus_card",
    """
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_unique_fingerprints
    FROM documents GROUP BY source, lang
    """,
)
def corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(T.token_count(F.col("text"))).alias("total_tokens"),
        F.countDistinct(F.md5(norm)).alias("n_unique_fingerprints"),
    )


# Benchmark decontamination: corpus docs sharing an 8-token window with the
# eval split (doc_id % 20 == 0 plays the benchmark suite) are flagged.  The
# eval side's distinct gram keys broadcast; the corpus is never shuffled.
@query(
    "text_decontaminate",
    """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    grams AS (
        SELECT doc_id, md5(array_to_string(tk[i:i+7], ' ')) AS gkey
        FROM toks, UNNEST(CASE WHEN len(tk) >= 8 THEN range(1, len(tk) - 6) ELSE [] END) AS u(i)
    ),
    eval_g AS (SELECT DISTINCT gkey FROM grams WHERE doc_id % 20 = 0),
    corpus_g AS (SELECT * FROM grams WHERE doc_id % 20 <> 0),
    hits AS (
        SELECT c.doc_id,
               COUNT(*) AS n_windows,
               SUM(CASE WHEN e.gkey IS NOT NULL THEN 1 ELSE 0 END) AS eval_hit_windows
        FROM corpus_g c LEFT JOIN eval_g e USING (gkey)
        GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_windows, 0) AS n_windows,
           CAST(COALESCE(eval_hit_windows, 0) AS BIGINT) AS eval_hit_windows,
           CASE WHEN COALESCE(eval_hit_windows, 0) > 0 THEN 1 ELSE 0 END AS contaminated
    FROM documents d LEFT JOIN hits USING (doc_id)
    WHERE d.doc_id % 20 <> 0
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style n-gram decontamination of the corpus vs an eval split."""
    from nrsr_crawler_spark.operators.decontaminate import decontaminate

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) != 0)
    eval_set = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
    return decontaminate(corpus, eval_set, "doc_id", "text", n=8)


# Gopher-style within-document repetition signals (top/duplicate n-gram
# token mass) — per-doc quality filters; counts never cross documents.
@query(
    "text_gopher_repetition",
    """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    base AS (SELECT doc_id, CASE WHEN LENGTH(trim(text)) = 0 THEN 0
                                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
             FROM documents),
    g2 AS (
        SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS gram, COUNT(*) AS cnt
        FROM toks, UNNEST(CASE WHEN len(tk) >= 2 THEN range(1, len(tk)) ELSE [] END) AS u(i)
        GROUP BY doc_id, gram
    ),
    g3 AS (
        SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS gram, COUNT(*) AS cnt
        FROM toks, UNNEST(CASE WHEN len(tk) >= 3 THEN range(1, len(tk) - 1) ELSE [] END) AS u(i)
        GROUP BY doc_id, gram
    ),
    r2 AS (SELECT doc_id, MAX(cnt) AS g2_max,
                  SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS g2_dup
           FROM g2 GROUP BY doc_id),
    r3 AS (SELECT doc_id, MAX(cnt) AS g3_max FROM g3 GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens,
           CAST(CASE WHEN b.n_tokens = 0 THEN 0
                ELSE (COALESCE(g2_max, 0) * 2 * 10000) // b.n_tokens END AS BIGINT) AS top2gram_bps,
           CAST(CASE WHEN b.n_tokens = 0 THEN 0
                ELSE (COALESCE(g3_max, 0) * 3 * 10000) // b.n_tokens END AS BIGINT) AS top3gram_bps,
           CAST(CASE WHEN b.n_tokens = 0 THEN 0
                ELSE (COALESCE(g2_dup, 0) * 2 * 10000) // b.n_tokens END AS BIGINT) AS dup2gram_bps
    FROM base b LEFT JOIN r2 USING (doc_id) LEFT JOIN r3 USING (doc_id)
    """,
)
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.gopher_repetition(load(spark, sf_dir, "documents"), "doc_id", "text")


# Aspect-ratio bucketing (NovelAI / SDXL appendix I): every image to its
# nearest training bucket by the integer cross-aspect metric — pure
# codegen column exprs over a literal bucket list, no join, no shuffle.
from nrsr_crawler_spark.operators.buckets import DEFAULT_BUCKETS as _ASPECT_BUCKETS

_ASPECT_BUCKETS_SQL = "[" + ", ".join(
    f"{{bw: {bw}, bh: {bh}}}" for bw, bh in _ASPECT_BUCKETS
) + "]"


@query(
    "images_aspect_buckets",
    f"""
    WITH dims AS (
        SELECT p_partkey AS image_id,
               64 + (p_partkey * 37) % 1985 AS w,
               64 + (p_partkey * 91) % 1985 AS h
        FROM part WHERE p_partkey <= 2000
    ),
    buckets AS (
        SELECT UNNEST(range(len(bl))) AS idx, UNNEST(bl) AS b
        FROM (SELECT {_ASPECT_BUCKETS_SQL} AS bl)
    ),
    scored AS (
        SELECT d.image_id, d.w, d.h, buckets.idx AS bucket_id,
               b.bw AS bucket_w, b.bh AS bucket_h,
               ROW_NUMBER() OVER (
                   PARTITION BY d.image_id
                   ORDER BY ABS(d.w * b.bh - d.h * b.bw), buckets.idx
               ) AS rn
        FROM dims d CROSS JOIN buckets
    )
    SELECT image_id, w, h, bucket_id, bucket_w, bucket_h
    FROM scored WHERE rn = 1
    """,
)
def images_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.buckets import assign_aspect_buckets

    dims = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 2000)
        .select(
            F.col("p_partkey").alias("image_id"),
            (F.lit(64) + F.pmod(F.col("p_partkey") * 37, F.lit(1985))).cast("long").alias("w"),
            (F.lit(64) + F.pmod(F.col("p_partkey") * 91, F.lit(1985))).cast("long").alias("h"),
        )
    )
    return assign_aspect_buckets(dims).select(
        "image_id", "w", "h", "bucket_id", "bucket_w", "bucket_h"
    )


# Context-window sequence packing: per-doc token span inside fixed 64-token
# training sequences, packed per source stream (window partitioned by
# source — never a global single-task window).
@query(
    "train_seq_packing",
    """
    WITH toks AS (
        SELECT doc_id, source,
               CAST(CASE WHEN LENGTH(trim(text)) = 0 THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
        FROM documents
    ),
    off AS (
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        FROM toks
    )
    SELECT doc_id, source, n_tokens, start_offset,
           start_offset // 64 AS start_seq,
           CASE WHEN n_tokens = 0 THEN start_offset // 64
                ELSE (start_offset + n_tokens - 1) // 64 END AS end_seq,
           CASE WHEN n_tokens = 0 THEN start_offset // 64
                ELSE (start_offset + n_tokens - 1) // 64 END - start_offset // 64 AS n_splits
    FROM off
    """,
)
def train_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.packing import seq_packing

    return seq_packing(load(spark, sf_dir, "documents"), seq_len=64)


# PII scrub (pre-training redaction): per-doc email/phone/IPv4 counts +
# redacted-text fingerprint over contact blurbs synthesized from customer
# rows (the documents fixture carries no PII, so the PII-bearing text is
# derived identically in both engines).
@query(
    "text_pii_scrub",
    """
    WITH blurbs AS (
        SELECT c_custkey AS doc_id,
               c_name || ' reach ' || lower(replace(c_name, ' ', '.')) ||
               '@nrsr.sk tel ' ||
               printf('%02d-%03d-%03d-%04d', c_custkey % 90 + 10,
                      c_custkey % 900 + 100, c_nationkey % 900 + 100,
                      c_custkey % 9000 + 1000) ||
               ' backup ip 10.' || CAST(c_custkey % 256 AS VARCHAR) ||
               '.0.1 ' || c_mktsegment AS text
        FROM customer
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4s,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
               '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g')) AS redacted_fingerprint
    FROM blurbs
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    blurbs = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("doc_id"),
        F.concat(
            F.col("c_name"), F.lit(" reach "),
            F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
            F.lit("@nrsr.sk tel "),
            F.format_string(
                "%02d-%03d-%03d-%04d",
                F.col("c_custkey") % 90 + 10,
                F.col("c_custkey") % 900 + 100,
                F.col("c_nationkey") % 900 + 100,
                F.col("c_custkey") % 9000 + 1000,
            ),
            F.lit(" backup ip 10."), (F.col("c_custkey") % 256).cast("string"),
            F.lit(".0.1 "), F.col("c_mktsegment"),
        ).alias("text"),
    )
    return T.pii_scrub(blurbs, "doc_id", "text")


# -- bucketed seen-store probe (storage-layout regime, lake/bucketed.py) -----
#
# The Spark side persists both sides bucketBy(8, event_id) into a catalog
# database (the Iceberg bucket(N, key) transform stand-in) and runs the
# co-located LEFT ANTI probe — zero Exchange, plan-gated in
# tests/test_bucketed_store.py.  The oracle states the same anti-join
# relationally; values must match regardless of layout.


@query(
    "bucketed_seen_probe",
    """
    SELECT event_id, event_type, user_id
    FROM events
    WHERE event_id NOT IN (
        SELECT event_id FROM events WHERE event_type IN ('click', 'view')
    )
    """,
)
def bucketed_seen_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.lake.bucketed import (
        bucketed_anti_join,
        ensure_db,
        write_bucketed,
    )

    ensure_db(spark, "bucketq", "/tmp/nrsr_bucketq_lake")
    ev = load(spark, sf_dir, "events")
    seen = ev.filter(F.col("event_type").isin("click", "view")).select("event_id")
    cand = ev.select("event_id", "event_type", "user_id")
    write_bucketed(seen, "bucketq.seen_ev", 8, key="event_id")
    write_bucketed(cand, "bucketq.cand_ev", 8, key="event_id")
    return bucketed_anti_join(spark, "bucketq.cand_ev", "bucketq.seen_ev", key="event_id")


# -- temperature-smoothed mixture sampling (sampling.py) ----------------------


@query(
    "mixture_temperature_sample",
    """
    WITH c AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang),
    w AS (SELECT lang, CAST(round(sqrt(n_stratum) * 1000000) AS BIGINT) AS w FROM c),
    t AS (SELECT SUM(w) AS tot FROM w),
    q AS (SELECT lang, CAST((200 * w) // tot AS BIGINT) AS quota FROM w, t),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS pick_rank
          FROM documents)
    SELECT doc_id, lang, pick_rank, quota
    FROM r JOIN q USING (lang) WHERE pick_rank <= quota
    """,
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed (T=2) language-mixture sample over documents:
    skewed language counts are rebalanced by sqrt weights, picks ordered by
    md5(doc_id) — quotas and picks both oracle-exact."""
    from nrsr_crawler_spark.operators.sampling import temperature_mixture_sample

    return temperature_mixture_sample(
        load(spark, sf_dir, "documents"), "doc_id", "lang", n_total=200
    )


# -- model-based quality filter (text.py classifier_quality_filter) ----------
#
# The oracle recomputes the same integer features (text_quality expressions)
# and the same literal weight vector — the logit is exact integer arithmetic
# end-to-end, so keep decisions can never drift between engines.


@query(
    "text_classifier_filter",
    """
    WITH toks AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    f AS (SELECT doc_id,
                 len(tk) AS n_tokens,
                 CAST(ROUND(LENGTH(regexp_replace(text, '\\s', '', 'g')) * 10000.0 / len(tk)) AS BIGINT) AS mean_word_len_centi,
                 CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS punct_bps,
                 CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS upper_bps,
                 CAST(ROUND(len(list_filter(tk, t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) * 10000.0 / len(tk)) AS BIGINT) AS stopword_bps
          FROM toks)
    SELECT doc_id,
           -60000 + 1 * mean_word_len_centi + 200 * n_tokens
                  - 8 * punct_bps + 40 * stopword_bps - 12 * upper_bps AS logit,
           (-60000 + 1 * mean_word_len_centi + 200 * n_tokens
                   - 8 * punct_bps + 40 * stopword_bps - 12 * upper_bps) >= 0 AS keep
    FROM f
    """,
)
def text_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style linear quality classifier (integer logit, exact): keep
    decision = logit >= 0 over the quality-feature vector."""
    return T.classifier_quality_filter(load(spark, sf_dir, "documents"), "doc_id", "text")


# -- integer-BM25 retrieval (operators/retrieval.py) --------------------------

_BM25_QUERIES = {
    "q_engine": ["table", "scan", "filter"],
    "q_stream": ["stream", "window", "batch"],
    "q_biz": ["customer", "order", "value"],
}

_BM25_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in sorted(_BM25_QUERIES.items()) for t in terms
)


@query(
    "text_bm25_topk",
    f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    post AS (SELECT doc_id, term, COUNT(*) AS tf
             FROM toks, UNNEST(tk) AS u(term) GROUP BY doc_id, term),
    dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
    stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(tk)) AS BIGINT) AS t_tokens FROM toks),
    q(query_id, term) AS (VALUES {_BM25_VALUES}),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df_t
            FROM post WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    cand AS (SELECT q.query_id, p.doc_id, p.term, p.tf, dl.dl
             FROM q JOIN post p USING (term) JOIN dl USING (doc_id)),
    scored AS (
        SELECT query_id, doc_id,
               SUM( (((1000000 * (n_docs - df_t)) // n_docs) * tf * 2200)
                    // (tf * 1000
                        + (1200 * (250 + ((750 * dl * n_docs) // t_tokens))) // 1000)
                  ) AS score
        FROM cand CROSS JOIN stats JOIN dft USING (term)
        GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, CAST(score AS BIGINT) AS score, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-BM25 top-10 per literal seed query (data-selection retrieval):
    rational idf + Robertson tf saturation + length normalization, all in
    scaled-integer floor division — scores hash-exact."""
    from nrsr_crawler_spark.operators.retrieval import bm25_topk

    out = bm25_topk(
        load(spark, sf_dir, "documents"), "doc_id", "text", _BM25_QUERIES, k=10
    )
    return out.select("query_id", "doc_id", F.col("score").cast("long").alias("score"), "rank")


# -- vocabulary coverage curve (operators/text.py) -----------------------------


@query(
    "text_vocab_coverage",
    """
    WITH toks AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    terms AS (SELECT u.term FROM toks, UNNEST(tk) AS u(term)),
    cnts AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
    tot AS (SELECT COUNT(*) AS total FROM terms),
    top AS (SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank
            FROM cnts QUALIFY rank <= 50)
    SELECT rank, term, cnt,
           CAST((SUM(cnt) OVER (ORDER BY cnt DESC, term ROWS UNBOUNDED PRECEDING) * 10000) // total AS BIGINT) AS cum_share_bps
    FROM top CROSS JOIN tot
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus vocabulary with cumulative token-mass coverage
    (tokenizer-planning curve) — counts and shares integer-exact."""
    return T.vocab_coverage(load(spark, sf_dir, "documents"), "doc_id", "text", k=50)


# -- exact per-stratum length quantiles (text.py length_quantiles) ------------
#
# The Spark side uses the scalable histogram+cumulative formulation; the
# oracle states the same quantile via the direct rank definition
# (row_number = ceil(q·n/100)) — identical values by construction.


@query(
    "corpus_length_quantiles",
    """
    WITH base AS (SELECT lang AS stratum, doc_id,
                         len(regexp_split_to_array(trim(text), '\\s+')) AS dl
                  FROM documents),
    r AS (SELECT stratum, dl,
                 row_number() OVER (PARTITION BY stratum ORDER BY dl, doc_id) AS rk,
                 COUNT(*) OVER (PARTITION BY stratum) AS n
          FROM base)
    SELECT stratum, MAX(n) AS n_docs,
           MAX(CASE WHEN rk = (50 * n + 99) // 100 THEN dl END) AS p50_dl,
           MAX(CASE WHEN rk = (90 * n + 99) // 100 THEN dl END) AS p90_dl
    FROM r GROUP BY stratum
    """,
)
def corpus_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language p50/p90 document token lengths via the
    histogram+cumulative formulation (no per-stratum row funnel)."""
    return T.length_quantiles(load(spark, sf_dir, "documents"), "doc_id", "text", "lang")


# -- sliding-window document chunking (text.py chunk_documents) ---------------


@query(
    "text_chunk_windows",
    """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk,
                         CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
                  FROM documents)
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text,
           CAST(least(64, n - i*48) AS INT) AS n_chunk_tokens
    FROM toks, UNNEST(CASE WHEN n > 0 THEN range(0, (n - 1) // 48 + 1) ELSE [] END) AS u(i)
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks every 48 tokens (16-token overlap) over documents —
    map-side only, chunk text + exact tail lengths oracle-gated."""
    return T.chunk_documents(load(spark, sf_dir, "documents"), "doc_id", "text", size=64, stride=48)


# -- count-min sketch (operators/sketches.py) ---------------------------------

_CM_NIB = "(strpos('0123456789abcdef', substr(md5(r || ':' || term), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(r || ':' || term), 2, 1)) - 1)"


@query(
    "sketch_countmin_tokens",
    f"""
    WITH toks AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    tok AS (SELECT u.term FROM toks, UNNEST(tk) AS u(term)),
    cells AS (SELECT r, {_CM_NIB} AS c FROM tok, UNNEST(['0','1','2','3']) AS rr(r)),
    grid AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c),
    truth AS (SELECT term, COUNT(*) AS true_cnt FROM tok GROUP BY term),
    probe AS (SELECT term, r, {_CM_NIB} AS c FROM truth, UNNEST(['0','1','2','3']) AS rr(r)),
    est AS (SELECT p.term, MIN(COALESCE(g.cnt, 0)) AS cm_est
            FROM probe p LEFT JOIN grid g USING (r, c) GROUP BY p.term)
    SELECT t.term, t.true_cnt, e.cm_est
    FROM truth t JOIN est e USING (term)
    """,
)
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus tokens: 4×256 portable md5-cell grid,
    point estimates vs true counts (estimate ≥ truth always — the sketch's
    one-sided error, asserted in tests)."""
    from nrsr_crawler_spark.operators.sketches import cm_build, cm_estimate

    toks = load(spark, sf_dir, "documents").select(
        F.explode(T.tokens(F.col("text"))).alias("term")
    )
    truth = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    sketch = cm_build(toks, "term", d=4, w=256)
    est = cm_estimate(sketch, truth.select("term"), "term", d=4, w=256)
    return truth.join(est, "term").select("term", "true_cnt", "cm_est")


# -- HyperLogLog cardinality sketch (operators/sketches.py) -------------------
#
# Same portability discipline as count-min: register = md5-hex decode mod m,
# rho = hex-string leading-zero arithmetic, estimate = int64 floor division
# of the exact rational alpha·m²·2³³/S — the full register table AND the
# estimate hash-match any engine.

_HLL_REG = (
    "((strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16 "
    "+ (strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1)) % 64"
)


from nrsr_crawler_spark.operators.sketches import hll_lc_table as _hll_lc_table

_HLL_RAW = (
    "24945719810981888 // (1000 * (SUM(1::BIGINT << (33 - rho_max)) "
    "+ (64 - COUNT(*)) * 8589934592))"
)
_HLL_LC_CASE = (
    "CASE (64 - COUNT(*)) "
    + " ".join(f"WHEN {v} THEN {e}" for v, e in _hll_lc_table(64).items())
    + " END"
)


@query(
    "sketch_hll_tokens",
    f"""
    WITH toks AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    tok AS (SELECT u.term FROM toks, UNNEST(tk) AS u(term)),
    h AS (SELECT {_HLL_REG} AS register, ltrim(substr(md5(term), 3, 8), '0') AS t FROM tok),
    rho AS (SELECT register,
                   CASE WHEN length(t) = 0 THEN 33
                        ELSE (8 - length(t)) * 4
                             + CASE WHEN substr(t,1,1) = '1' THEN 3
                                    WHEN substr(t,1,1) IN ('2','3') THEN 2
                                    WHEN substr(t,1,1) IN ('4','5','6','7') THEN 1
                                    ELSE 0 END + 1 END AS rho
            FROM h),
    regs AS (SELECT CAST(register AS BIGINT) AS register, CAST(MAX(rho) AS INT) AS rho_max
             FROM rho GROUP BY register),
    est AS (SELECT CAST(COUNT(*) AS BIGINT) AS registers_set,
                   CAST({_HLL_RAW} AS BIGINT) AS hll_est,
                   CAST(CASE WHEN {_HLL_RAW} <= 160 AND COUNT(*) < 64
                             THEN {_HLL_LC_CASE} ELSE {_HLL_RAW} END AS BIGINT) AS hll_est_corrected
            FROM regs),
    truth AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS true_distinct FROM tok)
    SELECT register, rho_max, registers_set, hll_est, hll_est_corrected, true_distinct
    FROM regs CROSS JOIN est CROSS JOIN truth
    """,
)
def sketch_hll_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog over corpus tokens: the 64-register table (portable
    md5-hex construction, exact) + integer raw and small-range-corrected
    estimates vs the true distinct count — the cardinality companion to the
    count-min frequency sketch."""
    from nrsr_crawler_spark.operators.sketches import hll_build, hll_estimate

    toks = load(spark, sf_dir, "documents").select(
        F.explode(T.tokens(F.col("text"))).alias("term")
    )
    regs = hll_build(toks, "term", p=6)
    est = hll_estimate(regs, p=6).select("registers_set", "hll_est", "hll_est_corrected")
    truth = toks.agg(F.countDistinct("term").cast("long").alias("true_distinct"))
    return regs.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(truth)).select(
        F.col("register").cast("long").alias("register"),
        "rho_max",
        "registers_set",
        "hll_est",
        "hll_est_corrected",
        "true_distinct",
    )


# -- bigram-LM coherence scoring (operators/text.py) --------------------------


@query(
    "text_bigram_coherence",
    """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk,
                         CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
                  FROM documents),
    bgs AS (SELECT doc_id,
                   CASE WHEN n >= 2
                        THEN list_transform(range(1, n), i -> tk[i] || ' ' || tk[i + 1])
                        ELSE [] END AS bg
            FROM toks),
    pairs AS (SELECT doc_id, u.b FROM bgs, UNNEST(bg) AS u(b)),
    cnts AS (SELECT b, COUNT(*) AS cnt FROM pairs GROUP BY b),
    top AS (SELECT b FROM cnts ORDER BY cnt DESC, b LIMIT 200),
    hits AS (SELECT doc_id, COUNT(*) AS th FROM pairs JOIN top USING (b) GROUP BY doc_id)
    SELECT g.doc_id,
           CAST(len(bg) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(th, 0) AS BIGINT) AS top_hits,
           CAST(CASE WHEN len(bg) = 0 THEN 0
                     ELSE COALESCE(th, 0) * 10000 // len(bg) END AS BIGINT) AS coherence_bps
    FROM bgs g LEFT JOIN hits ON hits.doc_id = g.doc_id
    """,
)
def text_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact bigram-LM coherence proxy: share of each document's
    adjacent token pairs found in the corpus top-200 bigram table (KenLM-
    perplexity-filter stand-in, no floats)."""
    return T.bigram_coherence(load(spark, sf_dir, "documents"), "doc_id", "text", k=200)


# -- incremental (cross-snapshot) dedup (operators/dedup.py) ------------------
#
# Deterministic snapshot split: batch = docs whose md5(doc_id) starts with a
# hex char in 0-3 (~25%), corpus = the rest — both engines derive the same
# partition, no fixture changes.


@query(
    "dedup_incremental",
    f"""
    WITH b AS (SELECT * FROM documents WHERE strpos('0123', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) > 0),
    c AS (SELECT * FROM documents WHERE strpos('0123', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) = 0),
    cex AS (SELECT md5(text) AS content_hash, MIN(doc_id) AS exact_id FROM c GROUP BY md5(text)),
    bex AS (SELECT b.doc_id AS batch_id, cex.exact_id
            FROM b LEFT JOIN cex ON md5(b.text) = cex.content_hash),
    bw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM b),
    bsh AS (SELECT DISTINCT doc_id, s AS shingle
            FROM bw, UNNEST(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS t(s)),
    cw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM c),
    csh AS (SELECT DISTINCT doc_id, s AS shingle
            FROM cw, UNNEST(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS t(s)),
    bsig AS (SELECT doc_id, {_MINHASH_SQL} FROM bsh GROUP BY doc_id),
    csig AS (SELECT doc_id, {_MINHASH_SQL} FROM csh GROUP BY doc_id),
    bband AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM bsig
        UNION ALL
        SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM bsig
    ),
    cband AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM csig
        UNION ALL
        SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM csig
    ),
    cands AS (SELECT DISTINCT bb.doc_id AS batch_id, cb.doc_id AS corpus_id
              FROM bband bb JOIN cband cb USING (band, bucket)),
    bsz AS (SELECT doc_id, COUNT(*) AS nb FROM bsh GROUP BY doc_id),
    csz AS (SELECT doc_id, COUNT(*) AS nc FROM csh GROUP BY doc_id),
    common AS (SELECT k.batch_id, k.corpus_id, COUNT(*) AS common
               FROM cands k
               JOIN bsh ON bsh.doc_id = k.batch_id
               JOIN csh ON csh.doc_id = k.corpus_id AND csh.shingle = bsh.shingle
               GROUP BY k.batch_id, k.corpus_id),
    near AS (SELECT m.batch_id, MIN(m.corpus_id) AS near_id
             FROM common m
             JOIN bsz ON bsz.doc_id = m.batch_id
             JOIN csz ON csz.doc_id = m.corpus_id
             WHERE m.common * 2 >= (bsz.nb + csz.nc - m.common) * 1
             GROUP BY m.batch_id)
    SELECT b.doc_id AS batch_id,
           CASE WHEN bex.exact_id IS NOT NULL THEN 'exact_dup'
                WHEN near.near_id IS NOT NULL THEN 'near_dup'
                ELSE 'novel' END AS verdict,
           COALESCE(bex.exact_id, near.near_id) AS matched_id
    FROM b
    LEFT JOIN bex ON bex.batch_id = b.doc_id
    LEFT JOIN near ON near.batch_id = b.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: classify a deterministic ~25% ingest
    batch against the remaining corpus — exact_dup (md5), near_dup (LSH band
    + verified shingle Jaccard ≥ 1/2), or novel."""
    docs = load(spark, sf_dir, "documents")
    is_batch = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(*"0123")
    return D.incremental_dedup(
        docs.filter(~is_batch), docs.filter(is_batch), "doc_id", "text",
        n=3, num_hashes=8, bands=2, threshold_num=1, threshold_den=2,
    )


# -- per-source boilerplate stripping (text.strip_boilerplate_blocks) ---------
#
# CCNet-style frequency-based removal: a block is boilerplate within its
# source iff >=2 distinct docs of that source contain it (and >=1% of the
# source's docs); EVERY occurrence is stripped — contrast text_block_dedup's
# global first-occurrence-wins.  Same disjoint-block CTEs as that oracle.


@query(
    "text_boilerplate_strip",
    """
    WITH toks AS (
        SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS tk,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE CAST(ceil(len(regexp_split_to_array(trim(text), '\\s+')) / 5.0) AS INT)
               END AS nb
        FROM documents
    ),
    blocks AS (
        SELECT doc_id, source, i - 1 AS pos,
               array_to_string(tk[(i-1)*5+1 : (i-1)*5+5], ' ') AS block
        FROM toks, UNNEST(CASE WHEN nb > 0 THEN range(1, nb + 1) ELSE [] END) AS u(i)
    ),
    freq AS (
        SELECT source, md5(block) AS bkey, COUNT(DISTINCT doc_id) AS doc_freq
        FROM blocks GROUP BY source, md5(block)
    ),
    gsz AS (SELECT source, COUNT(*) AS gdocs FROM documents GROUP BY source),
    flagged AS (
        SELECT source, bkey FROM freq JOIN gsz USING (source)
        WHERE doc_freq >= 2 AND doc_freq * 10000 >= gdocs * 100
    ),
    tagged AS (
        SELECT b.doc_id, b.source, b.pos, b.block, f.bkey IS NULL AS kept
        FROM blocks b LEFT JOIN flagged f
          ON f.source = b.source AND f.bkey = md5(b.block)
    ),
    per_doc AS (
        SELECT doc_id, source, COUNT(*) AS n_blocks,
               CAST(SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) AS boiler_blocks,
               COALESCE(string_agg(CASE WHEN kept THEN block END, ' ' ORDER BY pos), '') AS clean_text
        FROM tagged GROUP BY doc_id, source
    )
    SELECT d.doc_id, d.source,
           COALESCE(n_blocks, 0) AS n_blocks,
           COALESCE(boiler_blocks, 0) AS boiler_blocks,
           COALESCE(clean_text, '') AS clean_text
    FROM documents d LEFT JOIN per_doc USING (doc_id, source)
    """,
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-block removal (CCNet-style frequency threshold
    — every occurrence stripped, unlike C4's keep-one in text_block_dedup)."""
    return T.strip_boilerplate_blocks(
        load(spark, sf_dir, "documents"), "doc_id", "text", "source",
        k=5, min_docs=2, min_doc_bps=100,
    )


# -- leak-safe splits + quality keep-one over the near-dup graph --------------
#
# Both reuse the verified-minhash-pair CC fixpoint (same CTEs as
# dedup_minhash_groups); split bands are the first hex nibble of md5(id) —
# engine-portable, no engine hash.

_MINHASH_CC_CTES = f"""{SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_MINHASH_SQL} FROM sh GROUP BY doc_id),
    banded AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sigs
        UNION ALL
        SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sigs
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    prs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    vpairs AS (
        SELECT p.id_a, p.id_b
        FROM prs p
        JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
        JOIN cands c ON c.id_a = p.id_a AND c.id_b = p.id_b
        WHERE p.common * 2 >= (sa.n + sb.n - p.common) * 1
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM vpairs
              UNION ALL SELECT id_b, id_a FROM vpairs),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    ),
    cc AS (SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id)"""

_SPLIT_CASE = (
    "CASE substr(md5(CAST({col} AS VARCHAR)), 1, 1) "
    "WHEN '0' THEN 'val' WHEN '1' THEN 'test' ELSE 'train' END"
)


@query(
    "train_split_leakage",
    f"""
    WITH RECURSIVE {_MINHASH_CC_CTES},
    rawsplit AS (
        SELECT doc_id, {_SPLIT_CASE.format(col='doc_id')} AS split_raw FROM documents
    ),
    rep AS (
        SELECT DISTINCT group_id, {_SPLIT_CASE.format(col='group_id')} AS split_final
        FROM cc
    )
    SELECT c.doc_id, c.group_id, r.split_raw, p.split_final,
           r.split_raw <> p.split_final AS moved
    FROM cc c JOIN rawsplit r USING (doc_id) JOIN rep p USING (group_id)
    """,
)
def train_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-safe train/val/test assignment: md5-band raw splits overridden
    group-consistently over near-dup components, `moved` marking the
    documents that would have leaked across splits."""
    from nrsr_crawler_spark.operators.splits import assign_splits_leak_safe

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=2,
        threshold_num=1, threshold_den=2,
    ).select("id_a", "id_b")
    return assign_splits_leak_safe(docs, pairs, id_col="doc_id")


@query(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE {_MINHASH_CC_CTES},
    ranked AS (
        SELECT c.group_id, d.doc_id, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY c.group_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY c.group_id) AS n_members
        FROM cc c JOIN documents d USING (doc_id)
    )
    SELECT group_id, n_members, doc_id AS kept_id, n_chars AS kept_quality
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keep-one per near-dup component (longest member wins,
    ties → min id) — dedup that discards the WORSE copy, not an arbitrary
    one."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=2,
        threshold_num=1, threshold_den=2,
    ).select("id_a", "id_b")
    return D.neardup_keep_best(docs, pairs, "doc_id", "n_chars")


# -- trained coarse quantizer: fixed-iteration integer k-means ----------------
#
# The IVF codebook upgrade path: 2 Lloyd iterations unrolled in the oracle.
# Distances are the integer L2 expansion on quantize_vec doubles, centroid
# updates floor(sum/count) per dimension — integral doubles end-to-end, so
# assignment/update/final cells are bit-identical across engines.


@query(
    "train_kmeans_cells",
    """
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
               FROM embeddings),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM v WHERE vec_id < 4),
    d1 AS (SELECT v.vec_id, c.cid,
                  list_dot_product(v.qv, v.qv) - 2 * list_dot_product(v.qv, c.cv)
                      + list_dot_product(c.cv, c.cv) AS d
           FROM v CROSS JOIN c0 c),
    a1 AS (SELECT vec_id, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1
           ) WHERE rn = 1),
    comp AS (SELECT vec_id, pos, qv[pos] AS val
             FROM v, UNNEST(generate_series(1, 64)) AS t(pos)),
    m1 AS (SELECT a1.cid, comp.pos, FLOOR(SUM(comp.val) / COUNT(*)) AS cval
           FROM comp JOIN a1 USING (vec_id) GROUP BY a1.cid, comp.pos),
    c1 AS (SELECT c0.cid, COALESCE(m.cv, c0.cv) AS cv
           FROM c0 LEFT JOIN (
               SELECT cid, list(cval ORDER BY pos) AS cv FROM m1 GROUP BY cid
           ) m USING (cid)),
    d2 AS (SELECT v.vec_id, c.cid,
                  list_dot_product(v.qv, v.qv) - 2 * list_dot_product(v.qv, c.cv)
                      + list_dot_product(c.cv, c.cv) AS d
           FROM v CROSS JOIN c1 c)
    SELECT vec_id, cid AS cell, CAST(d AS BIGINT) AS dist2 FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d2
    ) WHERE rn = 1
    """,
)
def train_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer k-means (2 Lloyd passes, k=4): the trained
    coarse-quantizer assignment for IVF/SemDeDup — oracle-exact because
    quantization, L2, and floor-div centroid updates are all integral."""
    return SIM.kmeans_fixed(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=4, iterations=2
    )


# -- content-defined chunking (text.cdc_chunk_documents) ----------------------
#
# Boundary AFTER token i iff h16(md5(window of 3 tokens ending at i)) % 8 = 0
# (h16 = first 4 md5 hex nibbles as an integer — same _NIB arithmetic as the
# simhash oracle).  The oracle uses the equivalent relational-window form of
# the same boundary definition.

_CDC_NIB = "(strpos('0123456789abcdef', substr(wh, {i}, 1)) - 1)"
_CDC_H16 = (
    f"({_CDC_NIB.format(i=1)} * 4096 + {_CDC_NIB.format(i=2)} * 256 "
    f"+ {_CDC_NIB.format(i=3)} * 16 + {_CDC_NIB.format(i=4)})"
)


@query(
    "text_cdc_chunks",
    f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
        FROM documents
    ),
    pos AS (
        SELECT doc_id, i AS pos, tk[i] AS token, tk
        FROM toks, UNNEST(CASE WHEN n > 0 THEN range(1, n + 1) ELSE [] END) AS u(i)
    ),
    b AS (
        SELECT doc_id, pos, token,
               CASE WHEN pos >= 3 THEN md5(array_to_string(tk[pos-2:pos], ' ')) END AS wh
        FROM pos
    ),
    flags AS (
        SELECT doc_id, pos, token,
               CASE WHEN wh IS NOT NULL AND {_CDC_H16} % 8 = 0 THEN 1 ELSE 0 END AS bflag
        FROM b
    ),
    cidx AS (
        SELECT doc_id, pos, token,
               CAST(COALESCE(SUM(bflag) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS chunk_idx
        FROM flags
    )
    SELECT doc_id, chunk_idx, MIN(pos) AS start_pos, COUNT(*) AS n_tokens,
           string_agg(token, ' ' ORDER BY pos) AS chunk_text,
           md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_hash
    FROM cidx GROUP BY doc_id, chunk_idx
    """,
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: local-hash boundaries make chunk identity
    robust to insertions/deletions (vs fixed blocks, which shift wholesale)
    — the dedup-stable chunking for edit-heavy corpora."""
    return T.cdc_chunk_documents(
        load(spark, sf_dir, "documents"), "doc_id", "text", w=3, divisor=8
    )


# -- curriculum training order (sampling.curriculum_order) --------------------


@query(
    "train_curriculum_order",
    """
    WITH idx AS (
        SELECT stratum, row_number() OVER (ORDER BY stratum) - 1 AS sidx
        FROM (SELECT DISTINCT lang AS stratum FROM documents)
    ),
    n AS (SELECT COUNT(*) AS ns FROM idx),
    r AS (
        SELECT doc_id, lang AS stratum, n_chars AS difficulty,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS within_rank
        FROM documents
    )
    SELECT doc_id, stratum, difficulty, within_rank,
           (within_rank - 1) * ns + sidx AS order_key
    FROM r JOIN idx USING (stratum), n
    """,
)
def train_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum training order (short = easy) interleaved
    round-robin across languages: difficulty rises within every stratum
    while each curriculum prefix keeps the full language mixture."""
    from nrsr_crawler_spark.operators.sampling import curriculum_order

    docs = load(spark, sf_dir, "documents")
    return curriculum_order(docs, "doc_id", "lang", F.col("n_chars"))


# -- ViT patchify (multimodal.extract_patches) --------------------------------
#
# Same invariant-column convention as multimodal_features: the mapInPandas
# kernel's output is checked against exact integer identities (patch count,
# tile dims, Σ patch_sum == resized-canvas total) and emitted as 0/1 columns
# the oracle mirrors.


@query(
    "multimodal_patches",
    """
    SELECT printf('img%010d', c_custkey) AS image_id,
           1 AS patches_ok, 1 AS dims_ok, 1 AS coverage_ok
    FROM customer WHERE c_custkey <= 100
    """,
)
def multimodal_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch extraction hash-gated by exact integer invariants: 16
    tiles of 8x8 per image whose pixel sums add up to the resized canvas
    total (uint8 sums are integers — engine-exact)."""
    from nrsr_crawler_spark.operators.multimodal import extract_patches
    from nrsr_crawler_spark.sources.images import build_images

    captions = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            F.col("c_name").alias("caption"),
        )
    )
    imgs = build_images(spark, captions).persist()
    patches = extract_patches(imgs, patch=8, grid=4)
    per_img = patches.groupBy("image_id").agg(
        F.count(F.lit(1)).alias("n_patches"),
        F.sum(((F.col("ph") == 8) & (F.col("pw") == 8)).cast("int")).alias("n_dims_ok"),
        F.sum("patch_sum").alias("sum_patches"),
        F.count_distinct(F.col("patch_idx")).alias("n_distinct_idx"),
        F.max("canvas_sum").alias("canvas_sum"),
    )
    return per_img.select(
        "image_id",
        ((F.col("n_patches") == 16) & (F.col("n_distinct_idx") == 16))
        .cast("int")
        .alias("patches_ok"),
        (F.col("n_dims_ok") == 16).cast("int").alias("dims_ok"),
        (F.col("sum_patches") == F.col("canvas_sum")).cast("int").alias("coverage_ok"),
    )


# -- end-to-end dataset build: filter → dedup keep-best → split → curriculum --
#
# The composition query: quality-classifier keep gate, near-dup CC groups
# with highest-logit keep-one, leak-safe split on the group representative,
# curriculum ordering of the surviving train split.  Every stage is an
# existing oracle-exact primitive; the oracle is their CTE composition.

_CLF_LOGIT = (
    "-60000 + 1 * mean_word_len_centi + 200 * n_tokens "
    "- 8 * punct_bps + 40 * stopword_bps - 12 * upper_bps"
)


@query(
    "train_dataset_build",
    f"""
    WITH RECURSIVE {_MINHASH_CC_CTES},
    ftoks AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    feats AS (SELECT doc_id,
                 len(tk) AS n_tokens,
                 CAST(ROUND(LENGTH(regexp_replace(text, '\\s', '', 'g')) * 10000.0 / len(tk)) AS BIGINT) AS mean_word_len_centi,
                 CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS punct_bps,
                 CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS upper_bps,
                 CAST(ROUND(len(list_filter(tk, t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) * 10000.0 / len(tk)) AS BIGINT) AS stopword_bps
          FROM ftoks),
    keepq AS (SELECT doc_id, {_CLF_LOGIT} AS logit FROM feats WHERE ({_CLF_LOGIT}) >= 0),
    members AS (SELECT cc.doc_id, cc.group_id, k.logit
                FROM cc JOIN keepq k USING (doc_id)),
    best AS (SELECT doc_id, group_id, logit FROM (
                 SELECT *, row_number() OVER (PARTITION BY group_id
                                              ORDER BY logit DESC, doc_id) AS rn
                 FROM members) WHERE rn = 1),
    reps AS (SELECT DISTINCT group_id,
                    {_SPLIT_CASE.format(col='group_id')} AS split_final
             FROM members),
    surv AS (SELECT b.doc_id, b.group_id, d.lang AS stratum, d.n_chars
             FROM best b JOIN reps USING (group_id)
             JOIN documents d USING (doc_id)
             WHERE split_final = 'train'),
    idx AS (SELECT stratum, row_number() OVER (ORDER BY stratum) - 1 AS sidx
            FROM (SELECT DISTINCT stratum FROM surv)),
    nn AS (SELECT COUNT(*) AS ns FROM idx),
    rr AS (SELECT doc_id, group_id, stratum, n_chars AS difficulty,
                  row_number() OVER (PARTITION BY stratum
                                     ORDER BY n_chars, doc_id) AS within_rank
           FROM surv)
    SELECT doc_id, group_id, stratum, difficulty, within_rank,
           (within_rank - 1) * ns + sidx AS order_key
    FROM rr JOIN idx USING (stratum), nn
    """,
)
def train_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled training-data pipeline in one plan: classifier keep
    gate → near-dup components → highest-quality member survives → leak-safe
    split on the component representative → curriculum order of the train
    split.  Composes only existing oracle-exact primitives."""
    from pyspark.sql import Window

    from nrsr_crawler_spark.operators.image_dedup import phash_connected_groups
    from nrsr_crawler_spark.operators.sampling import curriculum_order
    from nrsr_crawler_spark.operators.splits import raw_split

    docs = load(spark, sf_dir, "documents")
    quality = T.classifier_quality_filter(docs, "doc_id", "text")
    pairs = D.minhash_lsh_dedup(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=2,
        threshold_num=1, threshold_den=2,
    ).select("id_a", "id_b")
    labels = phash_connected_groups(pairs, docs.select("doc_id"), id_col="doc_id")
    members = labels.withColumnRenamed("rep", "group_id").join(
        quality.filter(F.col("keep")).select("doc_id", "logit"), "doc_id"
    )
    w = Window.partitionBy("group_id").orderBy(F.col("logit").desc(), F.col("doc_id"))
    best = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "logit")
    )
    surv = (
        best.withColumn("split_final", raw_split(F.col("group_id")))
        .filter(F.col("split_final") == "train")
        .join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    )
    ordered = curriculum_order(surv, "doc_id", "lang", F.col("n_chars"))
    return ordered.join(best.select("doc_id", "group_id"), "doc_id")


# -- audio modality (sources/audio.py + multimodal audio kernels) --------------


@query(
    "multimodal_audio",
    """
    SELECT printf('aud%010d', c_custkey) AS audio_id,
           1 AS meta_ok, 1 AS windows_ok, 1 AS counts_ok, 1 AS coverage_ok
    FROM customer WHERE c_custkey <= 100
    """,
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + fixed-window energy features, hash-gated by exact
    integer identities: decoded metadata matches the stored columns, frame
    count/index structure is exact, frame lengths sum to n_samples, and
    Σ frame energy equals the clip total (int64-exact)."""
    from nrsr_crawler_spark.operators.multimodal import (
        audio_window_features,
        decode_audio_stats,
    )
    from nrsr_crawler_spark.sources.audio import build_audio

    ids = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.format_string("aud%010d", F.col("c_custkey")).alias("audio_id"),
            F.col("c_name").alias("caption"),
        )
    )
    auds = build_audio(spark, ids).persist()
    stats = decode_audio_stats(auds)
    meta = auds.select(
        "audio_id",
        F.col("sample_rate").alias("msr"),
        F.col("n_samples").alias("mn"),
    )
    win = audio_window_features(auds, window=256)
    per_clip = win.groupBy("audio_id").agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct("win_idx").alias("d_idx"),
        F.max("n_windows").alias("n_win"),
        F.sum("n").alias("sum_n"),
        F.sum("energy").alias("sum_e"),
        F.max("total_energy").alias("tot_e"),
    )
    return (
        stats.join(meta, "audio_id")
        .join(per_clip, "audio_id")
        .select(
            "audio_id",
            (
                (F.col("sample_rate") == F.col("msr"))
                & (F.col("n_samples") == F.col("mn"))
                & (F.col("peak") <= 32767)
            ).cast("int").alias("meta_ok"),
            (
                (F.col("rows") == F.col("n_win")) & (F.col("d_idx") == F.col("n_win"))
                & (F.col("n_win") == F.ceil(F.col("n_samples") / 256.0))
            ).cast("int").alias("windows_ok"),
            (F.col("sum_n") == F.col("n_samples")).cast("int").alias("counts_ok"),
            (
                (F.col("sum_e") == F.col("tot_e")) & (F.col("tot_e") == F.col("energy"))
            ).cast("int").alias("coverage_ok"),
        )
    )


# -- exact phrase search (retrieval.phrase_topk) -------------------------------

_PHRASES = {
    "p_tbl_val": ["table", "value"],
    "p_fast_tbl": ["fast", "table"],
    "p_key_agg_row": ["key", "agg", "row"],
}

_PHRASE_VALUES = ", ".join(
    f"('{pid}', {i}, '{t}')"
    for pid, terms in sorted(_PHRASES.items())
    for i, t in enumerate(terms)
)


@query(
    "text_phrase_topk",
    f"""
    WITH p(phrase_id, term_idx, term) AS (VALUES {_PHRASE_VALUES}),
    toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    post AS (SELECT doc_id, i AS pos, tk[i] AS term
             FROM toks, UNNEST(range(1, len(tk) + 1)) AS u(i)),
    cand AS (SELECT doc_id, phrase_id, term_idx, pos - term_idx AS anchor
             FROM post JOIN p USING (term)),
    nt AS (SELECT phrase_id, COUNT(*) AS n_terms FROM p GROUP BY phrase_id),
    hits AS (SELECT doc_id, phrase_id, anchor, COUNT(DISTINCT term_idx) AS n_found
             FROM cand GROUP BY doc_id, phrase_id, anchor),
    occ AS (SELECT phrase_id, doc_id, COUNT(*) AS n_occurrences
            FROM hits JOIN nt USING (phrase_id)
            WHERE n_found = n_terms GROUP BY phrase_id, doc_id)
    SELECT phrase_id, doc_id, n_occurrences, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY phrase_id
                                     ORDER BY n_occurrences DESC, doc_id) AS rank
        FROM occ
    ) WHERE rank <= 5
    """,
)
def text_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over positional postings (adjacency anchor join,
    broadcast phrase set, semi-join-pruned postings) — top-5 docs per
    phrase by exact occurrence count."""
    from nrsr_crawler_spark.operators.retrieval import phrase_topk

    out = phrase_topk(
        load(spark, sf_dir, "documents"), "doc_id", "text", _PHRASES, k=5
    )
    return out.select(
        "phrase_id", "doc_id", "n_occurrences", F.col("rank").cast("long").alias("rank")
    )
