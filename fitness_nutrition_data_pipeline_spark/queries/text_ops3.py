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


@register(
    "bpe_merge_candidates",
    r"""
    WITH words AS (
      SELECT tok, count(*) AS wf
      FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
            FROM documents)
      WHERE tok <> '' AND length(tok) >= 2
      GROUP BY tok
    ),
    pairs AS (
      SELECT substr(tok, CAST(i AS INT), 2) AS pair, wf
      FROM words, unnest(range(1, length(tok))) AS u(i)
    )
    SELECT pair, CAST(sum(wf) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
    doc="One BPE tokenizer-training round: adjacent-symbol pair frequencies "
    "over the word-frequency table (classic BPE counts pairs within word "
    "boundaries, weighted by how often the word occurs) — the top pair is "
    "the next merge. The heavy explode runs over DISTINCT words (vocab "
    "grain, not corpus grain: each word's pairs are generated once and "
    "weighted by its count), so the pair stage is bounded by vocab size "
    "× word length regardless of corpus size — the property that makes "
    "distributed BPE training feasible at 100 TB. Iterating re-runs this "
    "with merged symbols; the plan shape is identical each round.",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(spark, sf_dir)
    words = (
        toks.where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    # positions 1..len-1; Spark sequence() would run DESCENDING for
    # len < 2, hence the length filter above (DuckDB range() is empty)
    pairs = words.select(
        F.posexplode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("_p", "i"),
        "tok",
        "wf",
    ).select(F.expr("substring(tok, i, 2)").alias("pair"), "wf")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(20)
    )


@register(
    "lang_id_kappa",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS t
      FROM documents
    ),
    pred AS (
      SELECT lang AS labeled,
             CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                  WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                  WHEN s_fr >= s_de THEN 'fr'
                  ELSE 'de' END AS predicted
      FROM (
        SELECT doc_id, lang,
               len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS s_en,
               len(list_filter(t, x -> x IN ('el','la','de','que','y'))) AS s_es,
               len(list_filter(t, x -> x IN ('le','la','de','et','un'))) AS s_fr,
               len(list_filter(t, x -> x IN ('der','die','und','das','ein'))) AS s_de
        FROM toks
      )
    ),
    n AS (SELECT count(*) AS n FROM pred),
    po AS (
      SELECT CAST(sum(CASE WHEN labeled = predicted THEN 1 ELSE 0 END) AS DOUBLE)
             / max(n.n) AS po
      FROM pred, n
    ),
    pe AS (
      SELECT sum(lm * pm) AS pe FROM (
        SELECT CAST(count(*) AS DOUBLE) / max(n.n) AS lm, labeled AS cls
        FROM pred, n GROUP BY labeled
      ) l JOIN (
        SELECT CAST(count(*) AS DOUBLE) / max(n.n) AS pm, predicted AS cls
        FROM pred, n GROUP BY predicted
      ) p USING (cls)
    )
    SELECT round(po.po, 6) AS observed_agreement,
           round(pe.pe, 6) AS expected_agreement,
           round((po.po - pe.pe) / (1 - pe.pe), 6) AS cohens_kappa
    FROM po, pe
    ORDER BY cohens_kappa
    """,
    sort=("cohens_kappa",),
    doc="Cohen's kappa between the labeled and predicted language — the "
    "chance-corrected agreement scalar on top of lang_confusion_matrix "
    "(the standard acceptance metric for any labeling/classifier stage "
    "in a data pipeline). Marginals are two tiny aggregates joined on "
    "class; everything after the per-doc scoring pass is broadcast-"
    "sized. The same query shape scores inter-annotator agreement when "
    "two label columns come from different raters.",
)
def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fitness_nutrition_data_pipeline_spark.queries.text_ops import (
        _LANG_MARKERS,
        language_scores,
    )

    d = load_table(spark, sf_dir, "documents").withColumnRenamed("lang", "labeled")
    pred = language_scores(d, "text", _LANG_MARKERS).select(
        "labeled", F.col("predicted_lang").alias("predicted")
    )
    # Diamond restructure (fix-ladder rung 1): every statistic below is a
    # function of the CLASS-GRAIN confusion matrix, so aggregate once to
    # the ≤|L|² cell table (answer-sized, pinned) and derive n / po /
    # marginals from it — the lang-id scoring lineage runs ONE pass over
    # the corpus instead of four (tools/audit_scans.py: 6 scans -> 1).
    cm = (
        pred.groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint()
    )
    n = cm.agg(F.sum("c").alias("n"))
    po = cm.agg(
        F.sum(F.when(F.col("labeled") == F.col("predicted"), F.col("c"))
              .otherwise(0.0)).alias("n_agree")
    ).crossJoin(F.broadcast(n)).select(
        (F.col("n_agree") / F.col("n")).alias("po")
    )
    lm = (
        cm.groupBy(F.col("labeled").alias("cls"))
        .agg(F.sum("c").alias("lc"))
        .crossJoin(F.broadcast(n))
        .select("cls", (F.col("lc") / F.col("n")).alias("lm"))
    )
    pm = (
        cm.groupBy(F.col("predicted").alias("cls"))
        .agg(F.sum("c").alias("pc"))
        .crossJoin(F.broadcast(n))
        .select("cls", (F.col("pc") / F.col("n")).alias("pm"))
    )
    pe = lm.join(pm, "cls").agg(F.sum(F.col("lm") * F.col("pm")).alias("pe"))
    return (
        po.crossJoin(F.broadcast(pe))
        .select(
            F.round("po", 6).alias("observed_agreement"),
            F.round("pe", 6).alias("expected_agreement"),
            F.round((F.col("po") - F.col("pe")) / (1 - F.col("pe")), 6).alias(
                "cohens_kappa"
            ),
        )
    )


@register(
    "bigram_pmi_collocations",
    r"""
    WITH docs_t AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    uni AS (
      SELECT tok, count(*) AS c FROM (
        SELECT unnest(t) AS tok FROM docs_t) GROUP BY tok
    ),
    nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n_uni FROM uni),
    bg AS (
      SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2,
             count(*) AS c_ab
      FROM docs_t, unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
      GROUP BY 1, 2
    ),
    nb AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS n_bg FROM bg)
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
           round(CAST(ln((CAST(c_ab AS DOUBLE) / n_bg)
                 / ((CAST(a.c AS DOUBLE) / n_uni)
                    * (CAST(b.c AS DOUBLE) / n_uni))) AS DOUBLE), 6) AS pmi
    FROM bg JOIN uni a ON a.tok = w1 JOIN uni b ON b.tok = w2, nu, nb
    WHERE c_ab >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
    doc="Pointwise mutual information over adjacent token bigrams (min "
    "support 5): pmi = ln(p(ab) / (p(a)p(b))) with p(ab) over the full "
    "bigram mass and p(w) over the unigram mass — the classic "
    "collocation extractor for building phrase vocabularies before "
    "tokenizer training. Bigram and unigram tables are one explode + "
    "count each (map-side combined); the enrichment joins key on vocab "
    "tokens (vocab-sized, shuffle join that AQE turns broadcast when it "
    "fits), the two mass scalars ride as broadcast 1-row aggregates, "
    "and the result is a TakeOrdered top-20. Support filtering happens "
    "AFTER the mass totals so probabilities stay true corpus "
    "frequencies.",
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    dt = docs.select(t.alias("t"))
    # materialize the two count tables once (vocab- and bigram-grain —
    # tiny next to the corpus): each is consumed by both its mass total
    # and the enrichment joins, and without pinning, every consumer
    # re-runs the corpus explode+count pass (audited: 5 parquet scans)
    uni = (
        dt.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    nu = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    pairs = (
        dt.where(F.size("t") >= 2)
        .select(
            F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
        )
        .select(
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + 1).alias("w2"),
        )
    )
    bg_all = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint()
    )
    nb = bg_all.agg(F.sum("c_ab").cast("double").alias("n_bg"))
    a = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b"))
    return (
        bg_all.where(F.col("c_ab") >= 5)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") / F.col("n_bg"))
                    / (
                        (F.col("c_a").cast("double") / F.col("n_uni"))
                        * (F.col("c_b").cast("double") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


def _clean_toks(text_col: str = "text"):
    """Empty-filtered lowercase whitespace tokens — the r13 queries filter
    empties BEFORE position assignment so Spark positions and DuckDB list
    indices agree even when a document has leading/trailing whitespace."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


@register(
    "skipgram_cooccurrence_topk",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             unnest(tk) AS tok,
             unnest(range(1, len(tk) + 1)) AS pos
      FROM t
    ),
    pairs AS (
      SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos - a.pos IN (1, 2)
    )
    SELECT w1, w2, count(*) AS n_pairs
    FROM pairs GROUP BY w1, w2
    ORDER BY n_pairs DESC, w1, w2
    LIMIT 20
    """,
    doc="Skip-gram co-occurrence counts (word2vec-style preprocessing): "
    "token pairs within a +-2 position window, canonically unordered, "
    "global top-20. The non-equi window condition is turned into an "
    "EQUI-join by exploding the bounded offset set {1,2} on the left "
    "side (pos_b = pos_a + d), so Catalyst plans a hash join keyed on "
    "(doc_id, position) instead of a per-document nested loop — at "
    "100 TB the pair stream shards by document with no quadratic term "
    "(window size is a constant). Counts are exact integers.",
)
def skipgram_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(_clean_toks()).alias("pos", "tok")
    )
    left = toks.withColumn(
        "d", F.explode(F.array(F.lit(1), F.lit(2)))
    ).select(
        "doc_id", F.col("tok").alias("tok_a"), (F.col("pos") + F.col("d")).alias("pos_b")
    )
    right = toks.select("doc_id", F.col("tok").alias("tok_b"), F.col("pos").alias("pos_b"))
    pairs = left.join(right, ["doc_id", "pos_b"]).select(
        F.least("tok_a", "tok_b").alias("w1"),
        F.greatest("tok_a", "tok_b").alias("w2"),
    )
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "w1", "w2")
        .limit(20)
    )


@register(
    "log_odds_ratio_terms",
    r"""
    WITH toks AS (
      SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS corpus,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    cnt AS (SELECT corpus, tok, count(*) AS y FROM toks GROUP BY corpus, tok),
    -- single-row conditional aggregate, NOT per-corpus scalar subqueries:
    -- on a monolingual slice a (SELECT n FROM tot WHERE corpus='en')
    -- relation is EMPTY and the comma-join wipes the result, while the
    -- Spark side's global agg emits one row with NULL n1 — this shape
    -- degenerates identically on both engines (ADVICE r13 #4)
    tot AS (SELECT sum(CASE WHEN corpus = 'en' THEN y END) AS n1,
                   sum(CASE WHEN corpus = 'other' THEN y END) AS n2,
                   count(DISTINCT tok) AS v
            FROM cnt),
    wide AS (
      SELECT t.tok,
             coalesce(max(CASE WHEN t.corpus = 'en' THEN y END), 0) AS y1,
             coalesce(max(CASE WHEN t.corpus = 'other' THEN y END), 0) AS y2
      FROM cnt t GROUP BY t.tok
    ),
    scored AS (
      SELECT w.tok, w.y1, w.y2,
             round(CAST(
               (ln((w.y1 + 1.0) / (t.n1 + t.v - w.y1 - 1.0))
                - ln((w.y2 + 1.0) / (t.n2 + t.v - w.y2 - 1.0)))
               / sqrt(1.0 / (w.y1 + 1.0) + 1.0 / (w.y2 + 1.0))
             AS DOUBLE), 6) AS z
      FROM wide w, tot t
    ),
    final AS (
      SELECT tok, CAST(y1 AS BIGINT) AS y_en, CAST(y2 AS BIGINT) AS y_other, z
      FROM scored
    )
    SELECT * FROM (
      (SELECT * FROM final ORDER BY z DESC, tok LIMIT 10)
      UNION ALL
      (SELECT * FROM final ORDER BY z ASC, tok LIMIT 10)
    ) ORDER BY z, tok
    """,
    sort=("z", "tok"),
    doc="Monroe-style log-odds-ratio with a flat +1 Dirichlet prior, "
    "z-scored: which terms are most over-represented in the English "
    "corpus vs everything else (the classic corpus-comparison statistic "
    "for curation/mixing decisions). Term counts are exact integers; "
    "ln/sqrt touch only the final scalar per term, rounded to 6 digits "
    "before ranking so both engines select identical rows. One shuffle "
    "to (corpus, term) counts with map-side combine; totals and vocab "
    "size are broadcast scalars; the two top-10 windows run on the "
    "term-grain relation (vocabulary-bounded, not data-bounded).",
)
def log_odds_ratio_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.when(F.col("lang") == "en", F.lit("en")).otherwise(F.lit("other")).alias("corpus"),
        F.explode(_clean_toks()).alias("tok"),
    )
    cnt = toks.groupBy("corpus", "tok").agg(F.count(F.lit(1)).alias("y"))
    wide = cnt.groupBy("tok").agg(
        F.coalesce(F.max(F.when(F.col("corpus") == "en", F.col("y"))), F.lit(0)).alias("y1"),
        F.coalesce(F.max(F.when(F.col("corpus") == "other", F.col("y"))), F.lit(0)).alias("y2"),
    )
    tot = cnt.groupBy().agg(
        F.sum(F.when(F.col("corpus") == "en", F.col("y"))).alias("n1"),
        F.sum(F.when(F.col("corpus") == "other", F.col("y"))).alias("n2"),
        F.countDistinct("tok").alias("v"),
    )
    scored = wide.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.col("y1").cast("long").alias("y_en"),
        F.col("y2").cast("long").alias("y_other"),
        F.round(
            (
                F.log((F.col("y1") + 1.0) / (F.col("n1") + F.col("v") - F.col("y1") - 1.0))
                - F.log((F.col("y2") + 1.0) / (F.col("n2") + F.col("v") - F.col("y2") - 1.0))
            )
            / F.sqrt(1.0 / (F.col("y1") + 1.0) + 1.0 / (F.col("y2") + 1.0)),
            6,
        ).alias("z"),
    )
    # materialize the vocab-grain scored relation once (two top-k branches
    # read it), then take each extreme with orderBy+limit — Catalyst plans
    # TakeOrderedAndProject (per-partition heap + driver merge), never a
    # single-task global window
    scored = scored.localCheckpoint()
    top = scored.orderBy(F.desc("z"), "tok").limit(10)
    bot = scored.orderBy(F.asc("z"), "tok").limit(10)
    return top.unionByName(bot)


@register(
    "ngram_novelty_curve",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
      FROM t WHERE len(tk) >= 3
    ),
    firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
    per_doc AS (
      SELECT sh.doc_id,
             count(*) AS n_total,
             sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM sh JOIN firsts f ON sh.s = f.s
      GROUP BY sh.doc_id
    ),
    mx AS (SELECT max(doc_id) + 1 AS m FROM documents)
    SELECT CAST(floor(d.doc_id * 10.0 / mx.m) AS INT) AS bucket,
           CAST(sum(n_total) AS BIGINT) AS shingles_total,
           CAST(sum(n_novel) AS BIGINT) AS shingles_novel,
           round(CAST(sum(n_novel) AS DOUBLE) / sum(n_total), 6) AS novelty_rate
    FROM per_doc d, mx
    GROUP BY 1 ORDER BY 1
    """,
    doc="Corpus novelty curve: per ingestion-order decile, the fraction "
    "of distinct word trigrams never seen in any earlier document — the "
    "diminishing-returns diagnostic a pretraining pipeline reads before "
    "deciding whether the next crawl slice adds information or "
    "duplicates. first-occurrence attribution is a min(doc_id) groupBy "
    "on the shingle key (one shuffle, map-side partial min) followed by "
    "a shingle-keyed join back — both shard by shingle, no window over "
    "data-sized grain. Integer counts; one final division rounded 6dp.",
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _clean_toks()
    length = F.greatest(F.array_size(toks) - 2, F.lit(0))
    g1 = F.slice(toks, 1, length)
    g2 = F.slice(toks, 2, length)
    g3 = F.slice(toks, 3, length)
    tri = F.array_distinct(
        F.zip_with(F.zip_with(g1, g2, lambda a, b: F.concat_ws(" ", a, b)),
                   g3, lambda ab, c: F.concat_ws(" ", ab, c))
    )
    sh = docs.select("doc_id", F.explode(tri).alias("s"))
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    mx = docs.agg((F.max("doc_id") + 1).alias("m"))
    return (
        per_doc.crossJoin(F.broadcast(mx))
        .groupBy(
            F.floor(F.col("doc_id") * 10.0 / F.col("m")).cast("int").alias("bucket")
        )
        .agg(
            F.sum("n_total").cast("long").alias("shingles_total"),
            F.sum("n_novel").cast("long").alias("shingles_novel"),
            F.round(
                F.sum("n_novel").cast("double") / F.sum("n_total"), 6
            ).alias("novelty_rate"),
        )
        .orderBy("bucket")
    )
