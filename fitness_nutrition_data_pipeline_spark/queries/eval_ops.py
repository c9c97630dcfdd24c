r"""Model-evaluation analytics — the metrics a training/eval loop runs
over scored corpora at scale: exact rank-based AUC, calibration
(reliability bins + ECE gaps), and Bradley-Terry preference scores from
pairwise outcomes (the aggregation behind LLM-judge win matrices).

No model runs here (none exists in this container): scores are
deterministic md5 uniforms and labels integer rules, so both engines
derive the identical scored corpus — the operators under test are the
METRIC aggregations, which is exactly the part that has to scale to a
100 TB eval set.

Reference parity note: the reference has no eval surface
(main_etl_pipeline.py is ETL only); this extends the declared
north-star training-pipeline family.

Float discipline: AUC and calibration are EXACT integer computations
(rank sums via the tie-corrected x2 trick, rates in integer ppm) with
one correctly-rounded final division; Bradley-Terry quantizes scores to
integer ppm BETWEEN iterations so every sum is exact cross-engine.
int64 headroom is documented per query; a 100 TB run swaps the scaled
integers for DECIMAL(38) accumulators at the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.queries import register
from fitness_nutrition_data_pipeline_spark.queries.sampling import _BUCKET_SQL
from fitness_nutrition_data_pipeline_spark.sources.testdata import load_table

# deterministic scored corpus over events: 24-bit md5 uniform folded to
# ppm, shifted up for positives so AUC is informative (~0.6, not 0.5)
_SCORE_SQL = f"""
      SELECT least({_BUCKET_SQL.format(key="event_id")} % 1000000
                   + CASE WHEN user_id % 5 = 0 THEN 150000 ELSE 0 END,
                   999999) AS score,
             CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END AS label
      FROM events
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 1000000
    )
    label = F.when(F.col("user_id") % 5 == 0, 1).otherwise(0)
    return ev.select(
        F.least(raw + label * 150000, F.lit(999999)).alias("score"),
        label.alias("label"),
    )


@register(
    "auc_exact_rank",
    f"""
    WITH scored AS ({_SCORE_SQL}),
    h AS (
      SELECT score,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(label) AS BIGINT) AS cnt_pos
      FROM scored GROUP BY score
    ),
    r AS (
      SELECT cnt, cnt_pos,
             coalesce(sum(cnt) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM h
    ),
    agg AS (
      SELECT CAST(sum(cnt_pos * (2 * before + cnt + 1)) AS BIGINT) AS num2,
             CAST(sum(cnt_pos) AS BIGINT) AS n_pos,
             CAST(sum(cnt - cnt_pos) AS BIGINT) AS n_neg
      FROM r
    )
    SELECT n_pos, n_neg,
           CAST(CAST(round(1.0 * (num2 - n_pos * (n_pos + 1))
                           / (2 * n_pos * n_neg), 6) AS DECIMAL(18, 6))
                AS DOUBLE) AS auc,
           CAST(CAST(round(1.0 * (num2 - n_pos * (n_pos + 1))
                           / (n_pos * n_neg) - 1, 6) AS DECIMAL(18, 6))
                AS DOUBLE) AS gini
    FROM agg
    """,
    sort=("n_pos",),
    doc="EXACT rank-based AUC (Mann-Whitney) with average-rank tie "
    "correction, all integer: fold the scored corpus to a score-value "
    "histogram, walk it once for exclusive prefix counts, and apply "
    "2*sum_ranks_pos = sum(cnt_pos*(2*before + cnt + 1)) so the tie "
    "average's /2 never leaves integers; AUC = (num2 - n_pos*(n_pos+1)) "
    "/ (2*n_pos*n_neg) is ONE correctly-rounded division (Gini = "
    "2*AUC-1). approx-free and sample-free — the p99-grade exactness a "
    "release gate wants. Scale: the data-sized shuffle is the "
    "score-grain histogram (bounded by DISTINCT scores, ppm-quantized "
    "to <=1e6 rows); the rank walk is a window over that bounded "
    "relation — the oov_rate_curve convention. int64 headroom: num2 < "
    "2*N^2 caps N at ~2e9 rows; beyond that the same plan runs on "
    "DECIMAL(38) accumulators.",
)
def auc_exact_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        _scored(spark, sf_dir)
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("label").cast("long").alias("cnt_pos"),
        )
    )
    before = F.coalesce(
        F.sum("cnt").over(
            W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    r = h.select("cnt", "cnt_pos", before.alias("before"))
    agg = r.agg(
        F.sum(F.col("cnt_pos") * (2 * F.col("before") + F.col("cnt") + 1))
        .cast("long")
        .alias("num2"),
        F.sum("cnt_pos").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("cnt_pos")).cast("long").alias("n_neg"),
    )
    num = F.col("num2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(F.lit(1.0) * num / (2 * F.col("n_pos") * F.col("n_neg")), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("auc"),
        F.round(
            F.lit(1.0) * num / (F.col("n_pos") * F.col("n_neg")) - 1, 6
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("gini"),
    )


@register(
    "calibration_reliability_bins",
    f"""
    WITH scored AS ({_SCORE_SQL})
    SELECT CAST(score // 100000 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(round(1.0 * sum(score) / count(*)) AS BIGINT)
             AS confidence_ppm,
           CAST(round(1000000.0 * sum(label) / count(*)) AS BIGINT)
             AS accuracy_ppm,
           CAST(abs(round(1.0 * sum(score) / count(*))
                    - round(1000000.0 * sum(label) / count(*))) AS BIGINT)
             AS gap_ppm
    FROM scored
    GROUP BY 1
    ORDER BY bin
    """,
    sort=("bin",),
    doc="Reliability diagram (calibration bins): decile-bin the score, "
    "report per-bin mean confidence vs observed positive rate, both in "
    "integer ppm, and their gap — sum(gap*n)/sum(n) downstream IS the "
    "expected calibration error, and a bin whose confidence outruns "
    "its accuracy is where a model lies. The two per-bin rates are "
    "single correctly-rounded divisions of exact integers; one scan, "
    "one 10-group aggregate with map-side partials — calibration at "
    "100 TB costs exactly one groupBy.",
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _scored(spark, sf_dir)
    conf = F.round(F.lit(1.0) * F.sum("score") / F.count(F.lit(1))).cast("long")
    acc = F.round(
        F.lit(1000000.0) * F.sum("label") / F.count(F.lit(1))
    ).cast("long")
    return (
        s.groupBy(F.expr("score div 100000").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("label").cast("long").alias("n_pos"),
            conf.alias("confidence_ppm"),
            acc.alias("accuracy_ppm"),
            F.abs(conf - acc).cast("long").alias("gap_ppm"),
        )
        .orderBy("bin")
    )


@register(
    "bradley_terry_scores",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    contests AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CASE WHEN a.n > b.n THEN 1 ELSE 0 END AS a_win,
             CASE WHEN b.n > a.n THEN 1 ELSE 0 END AS b_win
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type
      WHERE a.n != b.n
    ),
    pair AS (
      SELECT ta, tb,
             CAST(count(*) AS BIGINT) AS n_games,
             CAST(sum(a_win) AS BIGINT) AS a_wins,
             CAST(sum(b_win) AS BIGINT) AS b_wins
      FROM contests GROUP BY ta, tb
    ),
    sides AS (
      SELECT ta AS t, tb AS opp, n_games, a_wins AS wins FROM pair
      UNION ALL
      SELECT tb AS t, ta AS opp, n_games, b_wins AS wins FROM pair
    ),
    p1 AS (
      SELECT t,
             CAST(sum(wins) AS BIGINT) AS w,
             CAST(sum(n_games) AS BIGINT) AS games,
             CAST(round(2000000.0 * sum(wins) / sum(n_games)) AS BIGINT)
               AS p1_ppm
      FROM sides GROUP BY t
    ),
    terms AS (
      SELECT s.t,
             CAST(round(1000000000000.0 * s.n_games
                        / (pi.p1_ppm + pj.p1_ppm)) AS BIGINT) AS term
      FROM sides s
      JOIN p1 pi ON pi.t = s.t
      JOIN p1 pj ON pj.t = s.opp
    ),
    p2 AS (
      SELECT t, CAST(sum(term) AS BIGINT) AS denom FROM terms GROUP BY t
    )
    SELECT p1.t AS event_type, p1.w AS wins, p1.games,
           p1.p1_ppm,
           CAST(round(1000000000000.0 * p1.w / p2.denom) AS BIGINT) AS p2_ppm
    FROM p1 JOIN p2 USING (t)
    ORDER BY event_type
    """,
    sort=("event_type",),
    doc="Bradley-Terry preference scores from a pairwise win matrix — "
    "the aggregation behind LLM-judge/arena evaluation: daily "
    "event-type counts stage deterministic contests (higher count wins "
    "the day, ties void), and two minorization-maximization updates "
    "refine strengths: p' = 2W/N from uniform, then p'' = W / sum_j "
    "n_ij/(p'_i+p'_j). Scores quantize to integer ppm BETWEEN "
    "iterations, so every cross-engine sum is exact and each update is "
    "one correctly-rounded division — the repo's sketch-contract "
    "discipline applied to an iterative fixpoint (same unroll shape as "
    "supplier_authority_rank). Scale: contests join day-grain "
    "aggregates co-keyed on day; everything after pair grain is "
    "competitor-count-sized, and the MM join touches the tiny pair "
    "relation only.",
)
def bradley_terry_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # day x type grain (~calendar x 5 rows) feeds BOTH sides of the
    # contest self-join and, through sides, the p1/terms lineages —
    # pin it so events scans exactly once (diamond policy; the audit
    # showed 4 scans without the pin)
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .coalesce(1)
        .localCheckpoint()
    )
    a = daily.alias("a")
    b = daily.alias("b")
    contests = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .where(F.col("a.n") != F.col("b.n"))
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
            F.when(F.col("a.n") > F.col("b.n"), 1).otherwise(0).alias("a_win"),
            F.when(F.col("b.n") > F.col("a.n"), 1).otherwise(0).alias("b_win"),
        )
    )
    pair = contests.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).cast("long").alias("n_games"),
        F.sum("a_win").cast("long").alias("a_wins"),
        F.sum("b_win").cast("long").alias("b_wins"),
    )
    sides = pair.select(
        F.col("ta").alias("t"),
        F.col("tb").alias("opp"),
        "n_games",
        F.col("a_wins").alias("wins"),
    ).unionByName(
        pair.select(
            F.col("tb").alias("t"),
            F.col("ta").alias("opp"),
            "n_games",
            F.col("b_wins").alias("wins"),
        )
    )
    # competitor-grain from here down (event types) — pin it: it feeds
    # the strength join TWICE (own + opponent side) and the final join
    p1 = (
        sides.groupBy("t")
        .agg(
            F.sum("wins").cast("long").alias("w"),
            F.sum("n_games").cast("long").alias("games"),
            F.round(F.lit(2000000.0) * F.sum("wins") / F.sum("n_games"))
            .cast("long")
            .alias("p1_ppm"),
        )
        .coalesce(1)
        .localCheckpoint()
    )
    pi = p1.select(F.col("t").alias("t_i"), F.col("p1_ppm").alias("pi_ppm"))
    pj = p1.select(F.col("t").alias("t_j"), F.col("p1_ppm").alias("pj_ppm"))
    terms = (
        sides.join(F.broadcast(pi), F.col("t") == F.col("t_i"))
        .join(F.broadcast(pj), F.col("opp") == F.col("t_j"))
        .select(
            "t",
            F.round(
                F.lit(1000000000000.0)
                * F.col("n_games")
                / (F.col("pi_ppm") + F.col("pj_ppm"))
            )
            .cast("long")
            .alias("term"),
        )
    )
    p2 = terms.groupBy("t").agg(F.sum("term").cast("long").alias("denom"))
    return (
        p1.join(p2, "t")
        .select(
            F.col("t").alias("event_type"),
            F.col("w").alias("wins"),
            "games",
            "p1_ppm",
            F.round(F.lit(1000000000000.0) * F.col("w") / F.col("denom"))
            .cast("long")
            .alias("p2_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "majority_vote_accuracy",
    """
    WITH samples AS (
      SELECT l_orderkey AS task,
             (l_partkey + l_linenumber) % 5 AS ans
      FROM lineitem
    ),
    votes AS (
      SELECT task, ans, count(*) AS c FROM samples GROUP BY task, ans
    ),
    major AS (
      SELECT task, ans FROM (
        SELECT task, ans,
               row_number() OVER (PARTITION BY task ORDER BY c DESC, ans)
                   AS rn
        FROM votes
      ) WHERE rn = 1
    ),
    tasks AS (SELECT task, count(*) AS n FROM samples GROUP BY task)
    SELECT t.n AS n_samples,
           CAST(count(*) AS BIGINT) AS n_tasks,
           CAST(sum(CASE WHEN m.ans = t.task % 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN m.ans = t.task % 5 THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
    FROM tasks t JOIN major m USING (task)
    GROUP BY t.n
    ORDER BY n_samples
    """,
    sort=("n_samples",),
    doc="Self-consistency (majority-vote) accuracy — the sample-k-times-"
    "and-vote eval loop (Wang et al., self-consistency decoding): each "
    "task's samples vote, the plurality answer (smallest-answer "
    "tie-break, pinned in both engines) is scored against gold, and "
    "accuracy is reported per samples-per-task count in exact integer "
    "ppm (floor division — no float crosses the hash). Tasks are "
    "orders, samples their lineitems, answers/gold deterministic "
    "residues, so both engines derive the identical eval set; the "
    "operator under test is the vote: one (task, ans) aggregate, one "
    "per-task argmax window, one join — all keyed on task, one shuffle "
    "family. At 100 TB the vote table is tasks x answer-space, tiny "
    "beside the sample stream it collapses.",
)
def majority_vote_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("task"),
        ((F.col("l_partkey") + F.col("l_linenumber")) % 5).alias("ans"),
    )
    votes = li.groupBy("task", "ans").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("task").orderBy(F.desc("c"), "ans")
    major = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("task", "ans")
    )
    tasks = li.groupBy("task").agg(F.count(F.lit(1)).alias("n"))
    correct = F.sum(
        F.when(F.col("ans") == F.col("task") % 5, 1).otherwise(0)
    )
    return (
        tasks.join(major, "task")
        .groupBy(F.col("n").alias("n_samples"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tasks"),
            correct.cast("long").alias("n_correct"),
            F.expr(
                "CAST(sum(CASE WHEN ans = task % 5 THEN 1 ELSE 0 END) "
                "* 1000000 DIV count(*) AS BIGINT)"
            ).alias("accuracy_ppm"),
        )
    )


@register(
    "passk_estimator",
    """
    WITH samples AS (
      SELECT l_orderkey AS task,
             CASE WHEN (l_partkey + l_linenumber) % 7 = l_orderkey % 7
                  THEN 1 ELSE 0 END AS ok
      FROM lineitem
    ),
    per_task AS (
      SELECT task, count(*) AS n, sum(ok) AS c
      FROM samples GROUP BY task
      HAVING count(*) >= 3
    ),
    scored AS (
      SELECT task, n, c,
             1000000 * c // n AS p1_ppm,
             (1000000 * (n*(n-1)*(n-2) - (n-c)*(n-c-1)*(n-c-2)))
                 // (n*(n-1)*(n-2)) AS p3_ppm
      FROM per_task
    )
    SELECT k, n_tasks, mean_pass_ppm FROM (
      SELECT CAST(1 AS BIGINT) AS k,
             CAST(count(*) AS BIGINT) AS n_tasks,
             CAST(sum(p1_ppm) // count(*) AS BIGINT) AS mean_pass_ppm
      FROM scored
      UNION ALL
      SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
             CAST(sum(p3_ppm) // count(*) AS BIGINT)
      FROM scored
    ) ORDER BY k
    """,
    sort=("k",),
    doc="Unbiased pass@k (Chen et al., HumanEval): per task with n >= k "
    "samples and c passing, pass@k = 1 - C(n-c,k)/C(n,k), computed as "
    "the EXACT rational (n(n-1)(n-2) - m(m-1)(m-2)) / n(n-1)(n-2) for "
    "k=3 (falling-factorial form — C(m,3)/C(n,3) with the /6 cancelled"
    ") quantized to integer ppm by floor division, then averaged over "
    "tasks in integer ppm — no float ever crosses the hash, and "
    "C(m,3)=0 whenever fewer than 3 samples fail, exactly the "
    "estimator's m<k convention. One aggregate to task grain, integer "
    "arithmetic after; the sample stream is touched once. Tasks are "
    "orders, samples lineitems, pass = deterministic residue match.",
)
def passk_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("task"),
        F.when(
            (F.col("l_partkey") + F.col("l_linenumber")) % 7
            == F.col("l_orderkey") % 7,
            1,
        )
        .otherwise(0)
        .alias("ok"),
    )
    per_task = (
        li.groupBy("task")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ok").alias("c"))
        .where(F.col("n") >= 3)
    )
    scored = per_task.select(
        F.expr("1000000 * c DIV n").alias("p1_ppm"),
        F.expr(
            "(1000000 * (n*(n-1)*(n-2) - (n-c)*(n-c-1)*(n-c-2))) "
            "DIV (n*(n-1)*(n-2))"
        ).alias("p3_ppm"),
    )
    one = scored.agg(
        F.lit(1).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        F.expr("CAST(sum(p1_ppm) DIV count(*) AS BIGINT)").alias(
            "mean_pass_ppm"
        ),
    )
    three = scored.agg(
        F.lit(3).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        F.expr("CAST(sum(p3_ppm) DIV count(*) AS BIGINT)").alias(
            "mean_pass_ppm"
        ),
    )
    return one.unionByName(three)


@register(
    "fleiss_kappa_raters",
    """
    WITH ratings AS (
      SELECT doc_id, r,
             CASE WHEN (doc_id * 7 + r * 11) % 10 < 7 THEN doc_id % 3
                  ELSE (doc_id + r) % 3 END AS label
      FROM documents
      CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS raters(r)
    ),
    cell AS (
      SELECT doc_id, label, count(*) AS nij
      FROM ratings GROUP BY doc_id, label
    ),
    tot AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_items,
             CAST(sum(nij * nij) AS BIGINT) AS sq
      FROM cell
    ),
    cat AS (SELECT label, CAST(sum(nij) AS BIGINT) AS c FROM cell
            GROUP BY label),
    c2 AS (SELECT CAST(sum(c * c) AS BIGINT) AS c2 FROM cat)
    SELECT n_items,
           CAST(1000000 * (sq - 5 * n_items) // (20 * n_items) AS BIGINT)
               AS pbar_ppm,
           CAST(1000000 * c2 // (25 * n_items * n_items) AS BIGINT)
               AS pe_ppm,
           CAST(1000000 * (5 * (sq - 5 * n_items) * n_items - 4 * c2)
                // (4 * (25 * n_items * n_items - c2)) AS BIGINT)
               AS kappa_ppm
    FROM tot, c2
    """,
    sort=("n_items",),
    doc="Fleiss' kappa over a 5-rater x 3-category synthetic labeling "
    "of the documents (raters agree with gold ~70% by a deterministic "
    "residue rule, so kappa is positive by construction — integer "
    "floor division diverges between engines below zero). All three "
    "statistics are EXACT integer ppm: per-item agreement P_i has "
    "fixed denominator n(n-1)=20, so P-bar = (sum nij^2 - N*n)/(20N) "
    "and P_e = sum(c_j^2)/(Nn)^2 are rationals of exact integer "
    "aggregates, and kappa reduces to X/(4Y) with X = 5N*S1 - 4*C2, "
    "Y = 25N^2 - C2 (int64-safe to ~1e9 items; a 100 TB run swaps in "
    "DECIMAL(38) accumulators at the same plan). One (item, label) "
    "aggregate and one category rollup — the rating stream is touched "
    "once; this is the inter-annotator-agreement gate a labeling "
    "pipeline runs before trusting a rater pool.",
)
def fleiss_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    ratings = d.withColumn(
        "r", F.explode(F.array(*[F.lit(i) for i in range(5)]))
    ).select(
        "doc_id",
        F.when(
            (F.col("doc_id") * 7 + F.col("r") * 11) % 10 < 7,
            F.col("doc_id") % 3,
        )
        .otherwise((F.col("doc_id") + F.col("r")) % 3)
        .alias("label"),
    )
    cell = ratings.groupBy("doc_id", "label").agg(
        F.count(F.lit(1)).alias("nij")
    )
    tot = cell.agg(
        F.countDistinct("doc_id").cast("long").alias("n_items"),
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("sq"),
    )
    c2 = (
        cell.groupBy("label")
        .agg(F.sum("nij").cast("long").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("c2"))
    )
    return tot.crossJoin(F.broadcast(c2)).selectExpr(
        "n_items",
        "CAST(1000000 * (sq - 5 * n_items) DIV (20 * n_items) AS BIGINT)"
        " AS pbar_ppm",
        "CAST(1000000 * c2 DIV (25 * n_items * n_items) AS BIGINT)"
        " AS pe_ppm",
        "CAST(1000000 * (5 * (sq - 5 * n_items) * n_items - 4 * c2)"
        " DIV (4 * (25 * n_items * n_items - c2)) AS BIGINT)"
        " AS kappa_ppm",
    )
