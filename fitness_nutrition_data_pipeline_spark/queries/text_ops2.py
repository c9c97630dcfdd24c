"""Training-data hygiene operators, wave 2: PII scan/redaction,
benchmark-contamination checking, within-document repetition profiling.

These are the passes a large-scale LLM data pipeline runs between raw
scrape and training shard: strip PII, drop eval-set leakage, flag
degenerate/repetitive documents. Each binds a reusable operator from
``operators/text.py`` to the testdata tables with a DuckDB oracle; all
hot-path logic is JVM-side Column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.operators.text import (
    ngram_contamination,
    pii_scan,
    repetition_features,
)
from fitness_nutrition_data_pipeline_spark.queries import register
from fitness_nutrition_data_pipeline_spark.sources.testdata import load_table

# Patterns applied to lower-cased text. The slimmed customer table has no
# phone/email columns, so the demo blob carries the PII-shaped values it
# does have — the 'Customer#NNNN' identifier and a money amount — plus an
# email pattern exercising the zero-hit path. The operator is
# pattern-agnostic; production runs swap in phone/email/SSN regexes.
_PII_PATTERNS = {
    "custid": r"customer#\d+",
    "money": r"\d+\.\d\d",
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
}

_BENCH_MAX_DOC = 25  # doc_id < 25 plays the held-out benchmark set


@register(
    "pii_scan_redact",
    r"""
    WITH blobs AS (
      SELECT c_custkey,
             concat_ws(' ', c_name, 'balance',
                       printf('%.2f', c_acctbal),
                       'segment', c_mktsegment) AS blob
      FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(blob, '(?i)customer#\d+')) AS INT)
               AS n_custid,
           CAST(len(regexp_extract_all(blob, '\d+\.\d\d')) AS INT) AS n_money,
           CAST(len(regexp_extract_all(blob,
               '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(blob, '(?i)customer#\d+'))
              + len(regexp_extract_all(blob, '\d+\.\d\d'))
              + len(regexp_extract_all(blob,
                  '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS pii_total,
           regexp_replace(
             regexp_replace(
               regexp_replace(blob, '(?i)customer#\d+', '[CUSTID]', 'g'),
               '\d+\.\d\d', '[MONEY]', 'g'),
             '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g') AS redacted
    FROM blobs
    ORDER BY c_custkey
    """,
    sort=("c_custkey",),
    doc="PII detection + redaction over free text (configurable regex "
    "patterns, per-pattern counts, redacted copy) — the training-data "
    "hygiene pass; pure regexp Column expressions, linear scan, no "
    "shuffle. The money amount is %.2f-formatted on both engines so the "
    "blob is bit-identical; patterns are (?i) so the redacted copy keeps the original casing.",
)
def pii_scan_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat_ws(
            " ",
            "c_name",
            F.lit("balance"),
            F.format_string("%.2f", "c_acctbal"),
            F.lit("segment"),
            "c_mktsegment",
        ).alias("blob"),
    )
    return pii_scan(cust, "blob", _PII_PATTERNS).select(
        "c_custkey", "n_custid", "n_money", "n_email", "pii_total", "redacted"
    )


@register(
    "contamination_check",
    rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
    ),
    bench AS (
      SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                      t[i+3] || ' ' || t[i+4] AS gram
      FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      WHERE doc_id < {_BENCH_MAX_DOC}
    ),
    cg AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                              t[i+3] || ' ' || t[i+4] AS gram
      FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      WHERE doc_id >= {_BENCH_MAX_DOC}
    ),
    ng AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id),
    hits AS (
      SELECT cg.doc_id, count(*) AS n_contaminated
      FROM cg JOIN bench USING (gram) GROUP BY cg.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(ng.n_grams, 0) AS INT) AS n_grams,
           CAST(coalesce(hits.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN coalesce(ng.n_grams, 0) > 0
                THEN round(CAST(coalesce(hits.n_contaminated, 0) AS DOUBLE)
                           / ng.n_grams, 4)
           END AS contamination_ratio
    FROM documents d
    LEFT JOIN ng USING (doc_id) LEFT JOIN hits USING (doc_id)
    WHERE d.doc_id >= {_BENCH_MAX_DOC}
    ORDER BY doc_id
    """,
    sort=("doc_id",),
    doc="Benchmark-contamination (decontamination) check: distinct 5-gram "
    "overlap of every corpus doc against a held-out benchmark set. The "
    "benchmark gram set is broadcast — the corpus side never shuffles; "
    "only per-doc counts aggregate. The pass run before training on "
    "scraped data.",
)
def contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") < _BENCH_MAX_DOC)
    corpus = docs.where(F.col("doc_id") >= _BENCH_MAX_DOC)
    return ngram_contamination(corpus, bench, "doc_id", "text", n=5)


@register(
    "repetition_profile",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
    ),
    base AS (
      SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
             round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4)
                 AS distinct_token_ratio
      FROM toks
    ),
    bi AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    bc AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram),
    tops AS (SELECT doc_id, max(c) AS top_c, sum(c) AS total FROM bc GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens, b.distinct_token_ratio,
           CASE WHEN coalesce(tops.total, 0) > 0
                THEN round(CAST(tops.top_c AS DOUBLE) / tops.total, 4)
                ELSE 0.0 END AS top_bigram_share,
           CASE WHEN b.distinct_token_ratio < 0.5
                  OR (CASE WHEN coalesce(tops.total, 0) > 0
                           THEN round(CAST(tops.top_c AS DOUBLE) / tops.total, 4)
                           ELSE 0.0 END) >= 0.2
                THEN 1 ELSE 0 END AS is_repetitive
    FROM base b LEFT JOIN tops USING (doc_id)
    ORDER BY doc_id
    """,
    sort=("doc_id",),
    doc="Within-document repetition profile (Gopher-style quality "
    "signals): distinct-token ratio via per-row array ops, most-frequent-"
    "bigram share via one explode → two-level map-side-combined "
    "aggregation, and a repetitiveness flag.",
)
def repetition_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_features(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_HYG_PATTERNS = {"cust": "customer", "sort": "sort"}


@register(
    "hygiene_batch_replay",
    rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL AND doc_id >= {_BENCH_MAX_DOC}
    ),
    btoks AS (
      SELECT string_split_regex(lower(text), '\s+') AS t FROM documents
      WHERE text IS NOT NULL AND doc_id < {_BENCH_MAX_DOC}
    ),
    bench AS (
      SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                      t[i+3] || ' ' || t[i+4] AS gram
      FROM btoks, unnest(range(1, len(t) - 3)) AS u(i)
    ),
    ctoks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM corpus
    ),
    cg AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                              t[i+3] || ' ' || t[i+4] AS gram
      FROM ctoks, unnest(range(1, len(t) - 3)) AS u(i)
    ),
    alerts AS (
      SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_alert_grams
      FROM cg JOIN bench USING (gram) GROUP BY cg.doc_id
    )
    SELECT c.doc_id, a.n_alert_grams,
           CAST(len(regexp_extract_all(c.text, '(?i)customer')) AS INT)
             AS n_cust,
           CAST(len(regexp_extract_all(c.text, '(?i)sort')) AS INT) AS n_sort,
           CAST(len(regexp_extract_all(c.text, '(?i)customer'))
              + len(regexp_extract_all(c.text, '(?i)sort')) AS INT)
             AS pii_total,
           md5(regexp_replace(
                 regexp_replace(c.text, '(?i)customer', '[CUST]', 'g'),
                 '(?i)sort', '[SORT]', 'g')) AS redacted_md5
    FROM corpus c JOIN alerts a USING (doc_id)
    ORDER BY doc_id
    """,
    sort=("doc_id",),
    doc="Batch replay of the STREAMING hygiene module (streaming/"
    "hygiene.py) — the IDENTICAL two functions the live ingest-edge path "
    "runs, composed: redact_pii_stream (pii_scan projection: per-pattern "
    "counts + redacted copy, hash-pinned here via md5 so the driver "
    "verifies the redacted BYTES, not just counts) feeding "
    "contamination_alerts (distinct-5-gram explode probed against the "
    "broadcast benchmark gram set; one row per matched gram, here "
    "re-aggregated per doc). Both operators are stateless projections/"
    "broadcast joins, so the streaming expressions run bit-identically "
    "on a batch frame — this puts the streaming module's own code path "
    "under the hard oracle signal (the cep/ratelimit replay pattern). "
    "The oracle re-derives tokenization, gram distinctness, alert join, "
    "regexp counts and the redacted md5 in pure SQL.",
)
def hygiene_batch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fitness_nutrition_data_pipeline_spark.streaming.hygiene import (
        contamination_alerts,
        redact_pii_stream,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    bench = docs.where(F.col("doc_id") < _BENCH_MAX_DOC)
    corpus = docs.where(F.col("doc_id") >= _BENCH_MAX_DOC).select("doc_id", "text")
    red = redact_pii_stream(corpus, "text", _HYG_PATTERNS).select(
        "doc_id",
        "text",
        "n_cust",
        "n_sort",
        "pii_total",
        F.md5("redacted").alias("redacted_md5"),
    )
    alerts = contamination_alerts(red, bench, "doc_id", "text", n=5)
    return (
        alerts.groupBy("doc_id", "n_cust", "n_sort", "pii_total", "redacted_md5")
        .agg(F.count(F.lit(1)).alias("n_alert_grams"))
        .select(
            "doc_id", "n_alert_grams", "n_cust", "n_sort", "pii_total",
            "redacted_md5",
        )
    )


@register(
    "cdc_chunk_dedup",
    r"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS tok
      FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS a
            FROM documents)
    ),
    g AS (
      SELECT doc_id, pos, tok,
             md5(concat_ws(' ', tok,
                 lead(tok, 1) OVER w, lead(tok, 2) OVER w,
                 lead(tok, 3) OVER w)) AS h
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    c AS (
      SELECT doc_id, pos, tok,
             sum(CASE WHEN CAST('0x' || substr(h, 1, 2) AS BIGINT) % 8 = 0
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chunk_id
      FROM g
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
             count(*) AS n_toks
      FROM c GROUP BY doc_id, chunk_id
    )
    SELECT count(*) AS total_chunks,
           CAST(count(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks,
           count(*) - CAST(count(DISTINCT chunk_hash) AS BIGINT) AS dup_chunks,
           round(avg(n_toks), 4) AS avg_chunk_tokens
    FROM chunks
    """,
    doc="Content-defined chunking dedup (operators/text.py::cdc_chunks): "
    "Rabin-style rolling 4-gram hash opens a chunk boundary at hash%8==0, "
    "anchoring chunks to content so shared spans between edited/mirrored "
    "documents dedup even when offsets shift — the span-level dedup class "
    "that whole-doc and shingle methods miss. Per-doc windows → "
    "embarrassingly parallel; corpus-wide distinct-hash count is one "
    "map-side-partial aggregate.",
)
def cdc_chunk_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fitness_nutrition_data_pipeline_spark.operators.text import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = cdc_chunks(docs, "doc_id", "text", gram=4, mask=8)
    total = F.count(F.lit(1))
    distinct = F.countDistinct("chunk_hash")
    return chunks.agg(
        total.alias("total_chunks"),
        distinct.alias("distinct_chunks"),
        (total - distinct).alias("dup_chunks"),
        F.round(F.avg("n_toks"), 4).alias("avg_chunk_tokens"),
    )


@register(
    "boilerplate_chunks",
    r"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS tok
      FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS a
            FROM documents)
    ),
    g AS (
      SELECT doc_id, pos, tok,
             md5(concat_ws(' ', tok,
                 lead(tok, 1) OVER w, lead(tok, 2) OVER w,
                 lead(tok, 3) OVER w)) AS h
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    c AS (
      SELECT doc_id, pos, tok,
             sum(CASE WHEN CAST('0x' || substr(h, 1, 2) AS BIGINT) % 8 = 0
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chunk_id
      FROM g
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
             count(*) AS n_toks
      FROM c GROUP BY doc_id, chunk_id
    )
    SELECT chunk_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_occurrences,
           CAST(max(n_toks) AS BIGINT) AS chunk_tokens
    FROM chunks
    GROUP BY chunk_hash
    HAVING count(DISTINCT doc_id) >= 3
    ORDER BY n_occurrences DESC, chunk_hash
    LIMIT 20
    """,
    doc="Boilerplate detector: the content-defined chunks "
    "(operators/text.py::cdc_chunks) that recur across >= 3 distinct "
    "documents, ranked by occurrence — headers/footers/disclaimers that "
    "span-level curation strips before training. Chunk-hash groupBy is "
    "map-side partial; top-20 is a TakeOrdered, so only 20 rows reach "
    "the driver no matter the corpus size.",
)
def boilerplate_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fitness_nutrition_data_pipeline_spark.operators.text import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = cdc_chunks(docs, "doc_id", "text", gram=4, mask=8)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("n_toks").alias("chunk_tokens"),
        )
        .where(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_occurrences"), "chunk_hash")
        .limit(20)
    )
