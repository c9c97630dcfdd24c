r"""Text-analysis wave 3: corpus language-model scoring and lexical
diversity — the quality-filter features a pretraining pipeline computes
per document before sampling (complements doc_quality_score /
lang_id_scores / tfidf_top_terms).

Tokenization parity with the rest of the text suite: lowercase, split on
``\s+``, drop empties — identical expressions on the Spark and DuckDB
sides, so token multisets match exactly and only float rounding (6
digits, far above libm drift) separates the engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.queries import register
from fitness_nutrition_data_pipeline_spark.sources.testdata import load_table


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, tok) — one row per token occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")


@register(
    "unigram_logprob_docs",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ),
    clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    lm AS (
      SELECT tok, count(*) AS c FROM clean GROUP BY tok
    ),
    tot AS (SELECT sum(c) AS n FROM lm)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(CAST(avg(ln(CAST(c AS DOUBLE) / n)) AS DOUBLE), 6)
             AS avg_logprob
    FROM clean JOIN lm USING (tok), tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Corpus-unigram LM score per document: train p(tok)=c/N on the "
    "whole corpus, score each doc by mean log-probability — the cheapest "
    "perplexity proxy for quality filtering (low = rare/garbled text). "
    "Token counts shuffle once to build the LM; scoring is a shuffle join "
    "on tok (the LM is vocab-sized — broadcastable when the vocab fits, "
    "bucketed join otherwise) followed by a doc-grain rollup.",
)
def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(spark, sf_dir).select("doc_id", "tok")
    lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = lm.agg(F.sum("c").alias("n"))
    return (
        toks.join(lm, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("n"))), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "type_token_ratio",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
           round(CAST(count(DISTINCT tok) AS DOUBLE) / count(*), 6) AS ttr
    FROM toks WHERE tok <> ''
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Type-token ratio (lexical diversity) per document — low TTR "
    "flags templated/repetitive text for down-sampling. Single explode → "
    "doc-grain groupBy with a distinct aggregate; partial aggregation "
    "keeps the shuffle at doc grain.",
)
def type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(spark, sf_dir)
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_types"),
            F.round(
                F.countDistinct("tok").cast("double") / F.count(F.lit(1)), 6
            ).alias("ttr"),
        )
        .orderBy("doc_id")
    )


@register(
    "hapax_ratio_by_source",
    r"""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT source, tok, count(*) AS c
      FROM toks WHERE tok <> ''
      GROUP BY source, tok
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_ratio
    FROM vocab
    GROUP BY source
    ORDER BY source
    """,
    doc="Hapax-legomena ratio per source: share of the vocabulary seen "
    "exactly once — high hapax = rich/noisy long tail, near-zero = "
    "templated output. Two map-side-combined shuffles, both on bounded "
    "keys ((source,tok) then source).",
)
def hapax_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(spark, sf_dir)
    vocab = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        vocab.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
            F.round(
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )
