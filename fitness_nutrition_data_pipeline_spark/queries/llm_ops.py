"""Large-scale training-data operators (BASELINE.json north star): exact
and near dedup (MinHash+LSH, SimHash, n-gram Jaccard), embedding
similarity search (brute-force top-k + centroid/IVF assignment).

Portability contract: every hash is md5 (identical hex in Spark and
DuckDB), every float reduction is an in-order fold over doubles, and every
ranking is on rounded values with explicit id tie-breaks — so each op stays
hash-verifiable against the oracle while the Spark plan remains the one
you would run at 100 TB (explode → partial-agg → shuffle-on-key; no
driver-side loops, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.queries import register
from fitness_nutrition_data_pipeline_spark.sources.testdata import load_table

N_MINHASH = 8  # permutations
N_BANDS = 4  # LSH bands (rows_per_band = 2)

_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_summary",
    """
    SELECT count(*) AS total_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_texts,
           count(*) - CAST(count(DISTINCT md5(text)) AS BIGINT) AS duplicate_docs
    FROM documents
    """,
    doc="Exact dedup via content-hash groupBy — map-side partial agg, one "
    "shuffle on the hash; at 100 TB this is the standard first dedup pass.",
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    h = F.md5("text")
    return d.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct(h).alias("distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("duplicate_docs"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (candidate pairs = adjacent doc_ids, same-source)
# ---------------------------------------------------------------------------


@register(
    "ngram_jaccard_pairs",
    r"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(string_split_regex(lower(text), '\s+'))),
               i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                    string_split_regex(lower(text), '\s+')[i+1])) AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 4)
               AS jaccard,
           CASE WHEN CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
                THEN 1 ELSE 0 END AS is_near_dup
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
    doc="n-gram (2-shingle) Jaccard similarity on candidate pairs — the "
    "verify stage of near-dedup. Candidates here are adjacent doc_ids; at "
    "scale candidates come from LSH buckets (minhash_lsh_buckets) so the "
    "quadratic compare only runs within buckets.",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explode-join-aggregate instead of whole-array intersect on a
    # self-join: |intersection| comes from an equi-join on (shingle,
    # adjacent ids) with map-side partial counts, |union| from per-doc
    # sizes. This is the plan that survives scale — work is proportional
    # to matching shingles, shuffled by shingle, never quadratic in
    # array length.
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), r"\s+")
    # zip_with over two slices, NOT element_at inside transform: a lambda
    # that indexes the source array re-evaluates the split per element
    # (O(n^2) per doc); slices evaluate it O(1) times per row.
    n = F.array_size(toks)
    shingles = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    sh = d.select("doc_id", shingles.alias("shingles"))
    sizes = sh.select("doc_id", F.array_size("shingles").alias("n_sh"))
    exploded = sh.select("doc_id", F.explode("shingles").alias("shingle"))

    a_sz = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    b_sz = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    pairs = a_sz.join(b_sz, F.col("doc_id_b") == F.col("doc_id_a") + 1)

    ea = exploded.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    eb = exploded.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    inter = (
        ea.join(eb, (F.col("doc_id_b") == F.col("doc_id_a") + 1) & (ea["shingle"] == eb["shingle"]))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.coalesce(F.col("n_common"), F.lit(0)).cast("double") / (
        F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_common"), F.lit(0))
    )
    return pairs.join(inter, ["doc_id_a", "doc_id_b"], "left").select(
        "doc_id_a",
        "doc_id_b",
        F.round(jac, 4).alias("jaccard"),
        F.when(jac >= 0.5, 1).otherwise(0).alias("is_near_dup"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _sig_exprs_sql() -> list[str]:
    """8 minhash signatures from 2 md5 evaluations: each md5 is 128 bits,
    sliced into four 32-bit (8-hex-char) windows; lexicographic min over
    hex ≡ numeric min. Quarters the hash cost vs one md5 per permutation
    with the same plan shape."""
    exprs = []
    for k in range(N_MINHASH):
        seed, window = divmod(k, 4)
        exprs.append(f"min(substr(md5('s{seed}|' || shingle), {window * 8 + 1}, 8)) AS sig{k}")
    return exprs


def _minhash_oracle() -> str:
    sig_cols = ",\n             ".join(_sig_exprs_sql())
    band_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5(sig{2 * b} || sig{2 * b + 1}) AS band_key FROM sigs"
        for b in range(N_BANDS)
    )
    return rf"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(string_split_regex(lower(text), '\s+'))),
               i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                    string_split_regex(lower(text), '\s+')[i+1]))) AS shingle
      FROM documents
    ),
    sigs AS (
      SELECT doc_id,
             {sig_cols}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {band_selects}
    )
    SELECT band_id, band_key, count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
    FROM bands
    GROUP BY band_id, band_key
    HAVING count(*) >= 2
    """


@register(
    "minhash_lsh_buckets",
    _minhash_oracle(),
    doc="MinHash (8 perms, min over md5('s<k>|'||shingle)) + LSH banding "
    "(4 bands × 2 rows): shingle-explode → per-doc min-agg → band-key "
    "groupBy. Buckets with ≥2 docs are the near-dup candidate sets; the "
    "shuffle is on band_key so the pairwise verify never goes quadratic "
    "globally — the canonical 100 TB near-dedup plan.",
)
def minhash_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), r"\s+")
    # zip_with over two slices, NOT element_at inside transform: a lambda
    # that indexes the source array re-evaluates the split per element
    # (O(n^2) per doc); slices evaluate it O(1) times per row.
    n = F.array_size(toks)
    shingles = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    exploded = d.select("doc_id", F.explode(shingles).alias("shingle"))
    sig_aggs = []
    for k in range(N_MINHASH):
        seed, window = divmod(k, 4)
        h = F.md5(F.concat(F.lit(f"s{seed}|"), F.col("shingle")))
        sig_aggs.append(F.min(F.substring(h, window * 8 + 1, 8)).alias(f"sig{k}"))
    sigs = exploded.groupBy("doc_id").agg(*sig_aggs)
    stack_args = ", ".join(
        f"{b}, md5(concat(sig{2 * b}, sig{2 * b + 1}))" for b in range(N_BANDS)
    )
    bands = sigs.select(
        "doc_id",
        F.expr(f"stack({N_BANDS}, {stack_args})").alias("band_id", "band_key"),
    )
    return (
        bands.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
        .where(F.col("n_docs") >= 2)
    )


def _dedup_flags_oracle() -> str:
    sig_cols = ",\n             ".join(_sig_exprs_sql())
    band_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5(sig{2 * b} || sig{2 * b + 1}) AS band_key FROM sigs"
        for b in range(N_BANDS)
    )
    return rf"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(string_split_regex(lower(text), '\s+'))),
               i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                    string_split_regex(lower(text), '\s+')[i+1]))) AS shingle
      FROM documents
    ),
    sigs AS (
      SELECT doc_id,
             {sig_cols}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {band_selects}
    ),
    mins AS (
      SELECT band_id, band_key, min(doc_id) AS bucket_min
      FROM bands GROUP BY band_id, band_key
    )
    SELECT b.doc_id,
           CAST(max(CASE WHEN b.doc_id > m.bucket_min THEN 1 ELSE 0 END) AS INT)
               AS is_dup_candidate
    FROM bands b JOIN mins m USING (band_id, band_key)
    GROUP BY b.doc_id
    """


@register(
    "minhash_dedup_flags",
    _dedup_flags_oracle(),
    doc="LSH dedup decision without pairwise expansion: per-bucket min "
    "doc_id is the canonical survivor; any doc above a bucket minimum is a "
    "near-dup candidate. Linear in corpus size (agg + broadcast-join), "
    "never quadratic — the decision stage of the 100 TB near-dedup plan.",
)
def minhash_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), r"\s+")
    # zip_with over two slices, NOT element_at inside transform: a lambda
    # that indexes the source array re-evaluates the split per element
    # (O(n^2) per doc); slices evaluate it O(1) times per row.
    n = F.array_size(toks)
    shingles = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    exploded = d.select("doc_id", F.explode(shingles).alias("shingle"))
    sig_aggs = []
    for k in range(N_MINHASH):
        seed, window = divmod(k, 4)
        h = F.md5(F.concat(F.lit(f"s{seed}|"), F.col("shingle")))
        sig_aggs.append(F.min(F.substring(h, window * 8 + 1, 8)).alias(f"sig{k}"))
    sigs = exploded.groupBy("doc_id").agg(*sig_aggs)
    stack_args = ", ".join(
        f"{b}, md5(concat(sig{2 * b}, sig{2 * b + 1}))" for b in range(N_BANDS)
    )
    bands = sigs.select(
        "doc_id",
        F.expr(f"stack({N_BANDS}, {stack_args})").alias("band_id", "band_key"),
    )
    mins = bands.groupBy("band_id", "band_key").agg(F.min("doc_id").alias("bucket_min"))
    return (
        bands.join(mins, ["band_id", "band_key"])
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(F.col("doc_id") > F.col("bucket_min"), 1).otherwise(0)
            )
            .cast("int")
            .alias("is_dup_candidate")
        )
    )


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-nibble-parity — portable across engines)
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    odd = "('" + "','".join(_ODD_HEX) + "')"
    bit_sums = ",\n             ".join(
        f"CASE WHEN sum(CASE WHEN substr(md5(tok), {i + 1}, 1) IN {odd} "
        f"THEN 1 ELSE -1 END) > 0 THEN {1 << i} ELSE 0 END AS bit{i}"
        for i in range(16)
    )
    bits_total = " + ".join(f"bit{i}" for i in range(16))
    return rf"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ),
    bits AS (
      SELECT doc_id,
             {bit_sums}
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, CAST({bits_total} AS BIGINT) AS simhash16
    FROM bits
    """


@register(
    "simhash_signatures",
    _simhash_oracle(),
    doc="SimHash (16-bit): per-token md5 nibble parity votes, sign-summed "
    "per bit, assembled into an integer signature — token-explode + one "
    "16-expression groupBy, all codegen'd. Hamming-close signatures = "
    "near-dups; production variant uses 64-bit xxhash64 (same plan shape).",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
    md5c = F.md5("tok")
    bit_aggs = []
    for i in range(16):
        vote = F.when(F.substring(md5c, i + 1, 1).isin(*_ODD_HEX), 1).otherwise(-1)
        bit_aggs.append(
            F.when(F.sum(vote) > 0, F.lit(1 << i)).otherwise(F.lit(0)).alias(f"bit{i}")
        )
    bits = toks.groupBy("doc_id").agg(*bit_aggs)
    total = bits.columns[1]
    expr = F.col("bit0")
    for i in range(1, 16):
        expr = expr + F.col(f"bit{i}")
    return bits.select("doc_id", expr.cast("long").alias("simhash16"))


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------


def _cosine(a, b):
    """In-order double-precision cosine of two array<double> columns."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


_COS_SQL = (
    "list_sum(list_transform(range(1, 65), "
    "i -> {a}[i] * {b}[i])) / "
    "(sqrt(list_sum(list_transform({a}, x -> x * x))) * "
    "sqrt(list_sum(list_transform({b}, x -> x * x))))"
)


@register(
    "embedding_knn_bruteforce",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
    q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
             round({_COS_SQL.format(a="q.q_emb", b="e.emb")}, 6) AS cosine_sim
      FROM q JOIN e ON e.vec_id >= 5
    )
    SELECT q_id, neighbor_id, neighbor_label, cosine_sim
    FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored
    ) t WHERE rn <= 3
    """,
    doc="Brute-force cosine top-k ANN baseline: broadcast the query set, "
    "score every candidate JVM-side (zip_with fold, no UDF), per-query "
    "row_number top-k. At 100 TB the candidate side stays partitioned and "
    "only k rows per query cross the final shuffle.",
)
def embedding_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    cand = e.where(F.col("vec_id") >= 5)
    scored = cand.join(F.broadcast(q)).select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.round(_cosine(F.col("q_emb"), F.col("emb")), 6).alias("cosine_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("q_id", "neighbor_id", "neighbor_label", "cosine_sim")
    )


@register(
    "embedding_centroid_assign",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < 10),
    scored AS (
      SELECT e.vec_id, c.centroid_id,
             round({_COS_SQL.format(a="e.emb", b="c.c_emb")}, 6) AS cosine_sim
      FROM e JOIN c ON true
    ),
    best AS (
      SELECT vec_id, centroid_id, cosine_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cosine_sim DESC, centroid_id) AS rn
      FROM scored
    )
    SELECT centroid_id, count(*) AS n_assigned,
           round(avg(cosine_sim), 6) AS avg_sim
    FROM best WHERE rn = 1
    GROUP BY centroid_id
    """,
    doc="IVF-style coarse quantization: assign every vector to its nearest "
    "of k centroids (broadcast) — the scale path for ANN: probe only the "
    "matching centroid's partition instead of the full corpus.",
)
def embedding_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    c = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    scored = e.join(F.broadcast(c)).select(
        "vec_id",
        "centroid_id",
        F.round(_cosine(F.col("emb"), F.col("c_emb")), 6).alias("cosine_sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cosine_sim"), "centroid_id")
    best = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return best.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.round(F.avg("cosine_sim"), 6).alias("avg_sim"),
    )


@register(
    "embedding_near_dup_pairs",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
    pairs AS (
      SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
             round({_COS_SQL.format(a="a.emb", b="b.emb")}, 6) AS sim
      FROM e a JOIN e b ON a.label = b.label AND b.vec_id > a.vec_id
    )
    SELECT label, count(*) AS n_pairs,
           CAST(sum(CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
           round(max(sim), 6) AS max_sim
    FROM pairs GROUP BY label
    """,
    doc="Embedding-cosine near-dup detection, blocked by label so the "
    "pairwise compare stays within blocks (the embedding analogue of LSH "
    "bucketing): at scale blocks come from coarse quantization and the "
    "cross-block pair space is never materialized.",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )
    a = e.alias("a")
    b = e.alias("b")
    sim = F.round(_cosine(F.col("a.emb"), F.col("b.emb")), 6)
    pairs = a.join(
        b, (F.col("a.label") == F.col("b.label")) & (F.col("b.vec_id") > F.col("a.vec_id"))
    ).select(F.col("a.label").alias("label"), sim.alias("sim"))
    return pairs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("sim") >= 0.9, 1).otherwise(0)).alias("n_near_dup"),
        F.round(F.max("sim"), 6).alias("max_sim"),
    )


@register(
    "embedding_ann_ivf_probe",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < 10),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round({_COS_SQL.format(a="e.emb", b="c.c_emb")}, 6) DESC,
                 c.centroid_id) AS rn
        FROM e JOIN c ON true
      ) WHERE rn = 1
    ),
    q AS (SELECT e.vec_id AS q_id, e.emb AS q_emb, assign.centroid_id
          FROM e JOIN assign ON e.vec_id = assign.vec_id
          WHERE e.vec_id >= 495),
    scored AS (
      SELECT q.q_id, e.vec_id AS neighbor_id,
             round({_COS_SQL.format(a="q.q_emb", b="e.emb")}, 6) AS cosine_sim
      FROM q
      JOIN assign cand ON cand.centroid_id = q.centroid_id AND cand.vec_id <> q.q_id
      JOIN e ON e.vec_id = cand.vec_id
    )
    SELECT q_id, neighbor_id, cosine_sim
    FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    doc="IVF-probed ANN: assign all vectors to their nearest of k "
    "centroids, then answer each query by scanning ONLY its centroid's "
    "cluster — the scale path where brute force scans 1/k of the corpus "
    "per query (nprobe=1). Same result contract as the brute-force "
    "baseline, recall traded for the pruned scan.",
)
def embedding_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    c = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    scored_c = e.join(F.broadcast(c)).select(
        "vec_id",
        "centroid_id",
        F.round(_cosine(F.col("emb"), F.col("c_emb")), 6).alias("c_sim"),
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("c_sim"), "centroid_id")
    assign = (
        scored_c.withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )
    q = (
        e.join(assign, "vec_id")
        .where(F.col("vec_id") >= 495)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("q_emb"),
            F.col("centroid_id").alias("q_centroid"),
        )
    )
    cand = assign.select(
        F.col("vec_id").alias("neighbor_id"), F.col("centroid_id").alias("n_centroid")
    )
    scored = (
        cand.join(F.broadcast(q), (F.col("n_centroid") == F.col("q_centroid"))
                  & (F.col("neighbor_id") != F.col("q_id")))
        .join(e.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("n_emb")),
              "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            F.round(_cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("q_id", "neighbor_id", "cosine_sim")
    )
