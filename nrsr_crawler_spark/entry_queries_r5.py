"""Round-5 wave: end-to-end training-data funnel token ledger.

``train_token_ledger`` (VERDICT r4 next #7) composes the corpus through
exact dedup → quality gate → decontamination → mixture quota → packing
and emits the per-stage (docs, tokens) ledger — the one-table audit a
training run documents.  Every stage is an existing oracle-exact
primitive (operators/dedup, text, decontaminate, sampling, packing); the
oracle below is their CTE composition in exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.sources.tpch import load

# Same integer classifier as train_dataset_build (text.QUALITY_CLF_WEIGHTS)
_LOGIT = (
    "-60000 + 1 * mean_word_len_centi + 200 * n_tok "
    "- 8 * punct_bps + 40 * stopword_bps - 12 * upper_bps"
)

_LEDGER_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang, source, text,
               regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents
    ),
    base AS (
        SELECT doc_id, lang, source, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
        FROM documents
    ),
    keep1 AS (
        SELECT MIN(doc_id) AS doc_id
        FROM (SELECT doc_id,
                     md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
              FROM documents)
        GROUP BY f
    ),
    s1 AS (SELECT b.* FROM base b JOIN keep1 USING (doc_id)),
    feats AS (
        SELECT doc_id,
               len(tk) AS n_tok,
               CAST(ROUND(LENGTH(regexp_replace(text, '\\s', '', 'g')) * 10000.0 / len(tk)) AS BIGINT) AS mean_word_len_centi,
               CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS punct_bps,
               CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS upper_bps,
               CAST(ROUND(len(list_filter(tk, t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) * 10000.0 / len(tk)) AS BIGINT) AS stopword_bps
        FROM toks
    ),
    keepq AS (SELECT doc_id FROM feats WHERE ({_LOGIT}) >= 0),
    s2 AS (SELECT s1.* FROM s1 JOIN keepq USING (doc_id)),
    evalg AS (
        SELECT DISTINCT md5(array_to_string(tk[i:i+7], ' ')) AS gkey
        FROM toks, UNNEST(CASE WHEN len(tk) >= 8 THEN range(1, len(tk) - 6) ELSE [] END) AS u(i)
        WHERE doc_id % 20 = 0
    ),
    contam AS (
        SELECT DISTINCT t.doc_id
        FROM toks t,
             UNNEST(CASE WHEN len(t.tk) >= 8 THEN range(1, len(t.tk) - 6) ELSE [] END) AS u(i)
        JOIN evalg e ON md5(array_to_string(t.tk[i:i+7], ' ')) = e.gkey
    ),
    s3 AS (
        SELECT * FROM s2
        WHERE doc_id % 20 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    cq AS (SELECT lang, COUNT(*) AS n_stratum FROM s3 GROUP BY lang),
    wq AS (SELECT lang, CAST(round(sqrt(n_stratum) * 1000000) AS BIGINT) AS w FROM cq),
    tq AS (SELECT SUM(w) AS tot FROM wq),
    qq AS (SELECT lang, CAST((200 * w) // tot AS BIGINT) AS quota FROM wq, tq),
    rq AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS pick_rank
        FROM s3
    ),
    s4 AS (
        SELECT s3.* FROM s3
        JOIN rq USING (doc_id, lang)
        JOIN qq USING (lang)
        WHERE pick_rank <= quota
    ),
    psrc AS (SELECT source, SUM(n_tokens) AS t FROM s4 GROUP BY source),
    pk AS (
        SELECT CAST(COALESCE(SUM((t + 511) // 512), 0) AS BIGINT) AS n_seqs,
               CAST(COALESCE(SUM(((t + 511) // 512) * 512 - t), 0) AS BIGINT) AS pad_tokens
        FROM psrc
    ),
    m0 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM base),
    m1 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s1),
    m2 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s2),
    m3 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s3),
    m4 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s4)
    SELECT CAST(1 AS BIGINT) AS stage_idx, 'exact_dedup' AS stage,
           m0.d AS docs_in, m1.d AS docs_kept, m0.t AS tokens_in, m1.t AS tokens_kept,
           CAST(0 AS BIGINT) AS n_seqs, CAST(0 AS BIGINT) AS pad_tokens
    FROM m0, m1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'quality_gate', m1.d, m2.d, m1.t, m2.t,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM m1, m2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'decontaminate', m2.d, m3.d, m2.t, m3.t,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM m2, m3
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'mixture_quota', m3.d, m4.d, m3.t, m4.t,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM m3, m4
    UNION ALL
    SELECT CAST(5 AS BIGINT), 'packing', m4.d, m4.d, m4.t, m4.t,
           pk.n_seqs, pk.pad_tokens
    FROM m4, pk
"""


@query("train_token_ledger", _LEDGER_ORACLE)
def train_token_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data funnel as one auditable plan: dedup → quality
    gate → decontamination → mixture quota → packing, per-stage token
    ledger (operators/token_ledger.py)."""
    from nrsr_crawler_spark.operators.token_ledger import token_ledger

    return token_ledger(load(spark, sf_dir, "documents"))
