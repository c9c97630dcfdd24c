"""Analytics wave 5 (r10): calendar streaks (gaps-and-islands), state-
duration-weighted averages (the TSDB time-in-state aggregate), exact
weighted medians, and t-closeness — four classic shapes the inventory
didn't cover.

Float discipline (the house rule): every statistic that crosses the
driver hash is exact-integer — epoch microseconds, cent/centi-unit
quantization through DECIMAL, integer floor division for ratios in
ppm — so both engines do identical arithmetic on identical integers.

Scale notes: streaks and time-in-state are one shuffle each (hash by
user), windows partition-local; weighted median is a per-group sorted
prefix-sum (one shuffle on the group key) — no global sort; t-closeness
aggregates to (segment × bucket) grain then joins the bucket-grain
global distribution back, both tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.queries import register
from fitness_nutrition_data_pipeline_spark.sources.testdata import load_table


@register(
    "activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dnum
      FROM events WHERE ts IS NOT NULL
    ),
    isl AS (
      SELECT user_id, dnum,
             dnum - row_number() OVER (PARTITION BY user_id ORDER BY dnum)
                 AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
      FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY user_id
    ORDER BY user_id
    """,
    sort=("user_id",),
    doc="Gaps-and-islands over the activity calendar: consecutive "
    "active days collapse to streaks via the classic dnum - row_number "
    "anchor (consecutive days share an anchor; any gap starts a new "
    "island), reporting active days / streak count / longest streak "
    "per user. Dates become integer epoch-day numbers BEFORE the "
    "arithmetic so both engines subtract exact integers. One shuffle "
    "on user_id; the window and both aggregates are partition-local "
    "thereafter — streak depth never matters, only rows per user.",
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("dnum"),
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("dnum")
    isl = days.withColumn(
        "anchor", F.col("dnum") - F.row_number().over(w)
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


@register(
    "time_in_state_twa",
    """
    WITH stream AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS t_us,
             CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS v_centi
      FROM events WHERE ts IS NOT NULL
    ),
    held AS (
      SELECT user_id, event_type, v_centi,
             (lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
              - t_us) // 1000 AS dt_ms
      FROM stream
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt_ms) AS BIGINT) AS state_ms,
           CAST(sum(v_centi * dt_ms) // sum(dt_ms) AS BIGINT)
               AS twa_value_centi
    FROM held WHERE dt_ms IS NOT NULL AND dt_ms > 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    sort=("event_type",),
    doc="Time-in-state weighted average (the TSDB time_weight/state-"
    "timeline aggregate): each event holds its type and value as the "
    "user's state until the next event, so the mean is weighted by "
    "HELD DURATION, not event count — the correct average for "
    "irregularly sampled gauges. Durations are exact integer epoch-"
    "microsecond differences floored to ms, values centi-quantized; "
    "the weighted mean is one integer floor division (documented "
    "headroom: per-type sum(v_centi*dt_ms) peaks ~1.4e17 at sf0.1, "
    "60x under int64; a 100 TB run re-buckets by day first so the "
    "products stay bounded). One shuffle on user_id for the lead "
    "window, one group-by on the held states.",
)
def time_in_state_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("t_us"),
            F.round(F.coalesce(F.col("value"), F.lit(0)) * 100)
            .cast("long")
            .alias("v_centi"),
        )
    )
    w = W.partitionBy("user_id").orderBy("t_us")
    held = ev.withColumn(
        "dt_ms",
        F.expr("(lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us)"
               " - t_us) DIV 1000"),
    ).where(F.col("dt_ms").isNotNull() & (F.col("dt_ms") > 0))
    return held.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dt_ms").cast("long").alias("state_ms"),
        F.expr("CAST(sum(v_centi * dt_ms) DIV sum(dt_ms) AS BIGINT)").alias(
            "twa_value_centi"
        ),
    )


@register(
    "weighted_median_price",
    """
    WITH w AS (
      SELECT l_returnflag AS grp,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    per_price AS (
      SELECT grp, price_cents, sum(qty) AS wt
      FROM w GROUP BY grp, price_cents
    ),
    cum AS (
      SELECT grp, price_cents, wt,
             sum(wt) OVER (PARTITION BY grp ORDER BY price_cents
                           ROWS UNBOUNDED PRECEDING) AS cw,
             sum(wt) OVER (PARTITION BY grp) AS tw
      FROM per_price
    )
    SELECT grp,
           CAST(min(price_cents) AS BIGINT) AS weighted_median_cents,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cw >= tw
    GROUP BY grp
    ORDER BY grp
    """,
    sort=("grp",),
    doc="Exact weighted median (lower weighted median: smallest value "
    "whose cumulative weight reaches half the total) of lineitem price "
    "weighted by quantity, per return flag — the robust center a "
    "skewed money distribution needs where the quantity-blind median "
    "misleads. Prices go through DECIMAL cents; weights and cumulative "
    "sums are exact integers, and the 2*cw >= tw threshold avoids any "
    "division. Distributed shape: pre-aggregate to (group, price) "
    "grain first — the window then runs over the COLLAPSED relation "
    "(distinct prices, not rows), one shuffle on the group key; no "
    "global sort anywhere.",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    per_price = li.groupBy("grp", "price_cents").agg(
        F.sum("qty").alias("wt")
    )
    w_cum = (
        W.partitionBy("grp")
        .orderBy("price_cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = per_price.withColumn("cw", F.sum("wt").over(w_cum)).withColumn(
        "tw", F.sum("wt").over(W.partitionBy("grp"))
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("grp")
        .agg(
            F.min("price_cents").cast("long").alias("weighted_median_cents"),
            F.min("tw").cast("long").alias("total_weight"),
        )
    )


@register(
    "t_closeness_audit",
    """
    WITH buck AS (
      SELECT c_mktsegment AS seg,
             (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
              + 100000) // 110000 AS b
      FROM customer
    ),
    g AS (SELECT seg, b, CAST(count(*) AS BIGINT) AS gc
          FROM buck GROUP BY seg, b),
    gt AS (SELECT seg, CAST(sum(gc) AS BIGINT) AS gtot FROM g GROUP BY seg),
    a AS (SELECT b, CAST(count(*) AS BIGINT) AS ac FROM buck GROUP BY b),
    at AS (SELECT CAST(sum(ac) AS BIGINT) AS atot FROM a),
    grid AS (
      SELECT s.seg, a.b, coalesce(g.gc, 0) AS gc, a.ac
      FROM (SELECT DISTINCT seg FROM buck) s
      CROSS JOIN a
      LEFT JOIN g ON g.seg = s.seg AND g.b = a.b
    ),
    cums AS (
      SELECT seg, b,
             sum(gc) OVER (PARTITION BY seg ORDER BY b
                           ROWS UNBOUNDED PRECEDING) AS cg,
             sum(ac) OVER (PARTITION BY seg ORDER BY b
                           ROWS UNBOUNDED PRECEDING) AS ca
      FROM grid
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM a)
    SELECT c.seg,
           CAST(gt.gtot AS BIGINT) AS n_rows,
           CAST(1000000 * sum(abs(c.cg * at.atot - c.ca * gt.gtot))
                // ((m.nb - 1) * gt.gtot * at.atot) AS BIGINT)
               AS emd_ppm
    FROM cums c
    CROSS JOIN at CROSS JOIN m
    JOIN gt ON gt.seg = c.seg
    GROUP BY c.seg, gt.gtot, at.atot, m.nb
    ORDER BY c.seg
    """,
    sort=("seg",),
    doc="t-closeness audit (Li et al.): per quasi-identifier group "
    "(market segment), the earth-mover's distance between the group's "
    "distribution over ordered sensitive buckets (account balance in "
    "fixed 1100-dollar bands, integer-cents bucketing) and the global "
    "distribution — EMD over an ordered attribute is the mean absolute "
    "cumulative-probability gap, computed here as EXACT integers with "
    "common denominator gtot*atot and quantized to ppm by one floor "
    "division. Completes the privacy family (k-anonymity, l-diversity "
    "already registered): a group whose emd_ppm exceeds t leaks the "
    "sensitive attribute through group membership. Bucket grid is "
    "(segments x bands) — tiny; the only data-sized pass is the one "
    "bucketing aggregate.",
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the bucketed grain fans out into FIVE consumer paths (gt, a ->
    # {grid, atot, nb}, segs, grid's left join) — unpinned, the executed
    # plan re-scanned customer 6 times for one (seg, band) aggregate
    # (tools/audit_reuse.py, the last r13-queue item). The grain is
    # bounded (|segments| x |bands| — bands are fixed 1100-dollar windows
    # over the acctbal domain, ~50 rows at ANY scale factor), so
    # localCheckpoint is admissible by the repo rule and cuts the plan to
    # ONE customer scan; the global per-bucket counts (a) re-derive from
    # the group counts by a second grouping of the pinned grain instead
    # of a second raw pass, and segs collapses the grain, not the scan.
    g = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.expr(
                "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " + 100000) DIV 110000"
            ).alias("b"),
        )
        .groupBy("seg", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("gc"))
        .localCheckpoint()
    )
    gt = g.groupBy("seg").agg(F.sum("gc").cast("long").alias("gtot"))
    a = g.groupBy("b").agg(F.sum("gc").cast("long").alias("ac"))
    atot = a.agg(F.sum("ac").cast("long").alias("atot"))
    nb = a.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    segs = g.select("seg").distinct()
    grid = (
        segs.crossJoin(F.broadcast(a))
        .join(g, ["seg", "b"], "left")
        .select("seg", "b", F.coalesce("gc", F.lit(0)).alias("gc"), "ac")
    )
    w_cum = (
        W.partitionBy("seg").orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    )
    cums = grid.select(
        "seg",
        "b",
        F.sum("gc").over(w_cum).alias("cg"),
        F.sum("ac").over(w_cum).alias("ca"),
    )
    return (
        cums.join(F.broadcast(gt), "seg")
        .crossJoin(F.broadcast(atot))
        .crossJoin(F.broadcast(nb))
        .groupBy("seg", "gtot", "atot", "nb")
        .agg(
            F.expr(
                "CAST(1000000 * sum(abs(cg * atot - ca * gtot))"
                " DIV ((nb - 1) * gtot * atot) AS BIGINT)"
            ).alias("emd_ppm")
        )
        .select(
            "seg",
            F.col("gtot").cast("long").alias("n_rows"),
            "emd_ppm",
        )
    )


# Poisson(1) inverse-CDF thresholds in ppm (e^-1 series, precomputed once
# in Python and embedded as literals in BOTH engines — the NDCG-weights
# precedent), capped at 6: P(X > 6) < 6e-5
_POIS_CASE = (
    "CASE WHEN {u} < 367879 THEN 0 WHEN {u} < 735759 THEN 1 "
    "WHEN {u} < 919699 THEN 2 WHEN {u} < 981012 THEN 3 "
    "WHEN {u} < 996340 THEN 4 WHEN {u} < 999406 THEN 5 ELSE 6 END"
)


@register(
    "poisson_bootstrap_ci",
    f"""
    WITH reps AS (SELECT unnest(range(32)) AS b),
    drawn AS (
      SELECT e.event_type, r.b,
             {_POIS_CASE.format(
                 u="CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR)"
                   " || ':' || CAST(r.b AS VARCHAR)), 1, 6)) AS BIGINT)"
                   " % 1000000")} AS m,
             CAST(round(coalesce(e.value, 0) * 1000) AS BIGINT) AS v_milli
      FROM events e CROSS JOIN reps r
    ),
    rep_means AS (
      SELECT event_type, b,
             sum(m * v_milli) // sum(m) AS wmean
      FROM drawn GROUP BY event_type, b
      HAVING sum(m) > 0
    ),
    base AS (
      SELECT event_type,
             CAST(sum(CAST(round(coalesce(value, 0) * 1000) AS BIGINT))
                  // count(*) AS BIGINT) AS mean_milli
      FROM events GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(count(*) AS BIGINT) AS n_replicas,
           CAST(min(b2.mean_milli) AS BIGINT) AS mean_milli,
           CAST(list(r.wmean ORDER BY r.wmean)[2] AS BIGINT) AS ci_lo_milli,
           CAST(list(r.wmean ORDER BY r.wmean)[31] AS BIGINT) AS ci_hi_milli
    FROM rep_means r JOIN base b2 USING (event_type)
    GROUP BY r.event_type
    ORDER BY r.event_type
    """,
    sort=("event_type",),
    doc="Poisson bootstrap confidence interval (Chamandy et al., 'the "
    "bootstrap at terabyte scale'): classic resampling needs a global "
    "index per resample; the Poisson trick gives each row an "
    "independent Poisson(1) multiplicity per replica, so 32 bootstrap "
    "replicas are ONE pass over the data with a 32-way explode — "
    "embarrassingly parallel, no coordination, the only correct "
    "bootstrap at 100 TB. Multiplicities come from a deterministic "
    "md5-uniform through the Poisson inverse CDF (ppm thresholds "
    "precomputed in Python, embedded as literals in both engines); "
    "replica means are exact integer milli-unit floor divisions; the "
    "CI is the 2nd/31st order statistic of the 32 sorted replica "
    "means — integers end to end, so the driver hash pins the entire "
    "resampling pipeline, not a float approximation of it.",
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0)) * 1000)
        .cast("long")
        .alias("v_milli"),
    )
    drawn = ev.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(31)))
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("event_id").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % 1000000,
    ).withColumn("m", F.expr(_POIS_CASE.format(u="u")))
    rep_means = (
        drawn.groupBy("event_type", "b")
        .agg(
            F.expr("sum(m * v_milli) DIV sum(m)").alias("wmean"),
            F.sum("m").alias("tm"),
        )
        .where(F.col("tm") > 0)
    )
    base = ev.groupBy("event_type").agg(
        F.expr("CAST(sum(v_milli) DIV count(*) AS BIGINT)").alias(
            "mean_milli"
        )
    )
    return (
        rep_means.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_replicas"),
            F.element_at(F.array_sort(F.collect_list("wmean")), 2)
            .cast("long")
            .alias("ci_lo_milli"),
            F.element_at(F.array_sort(F.collect_list("wmean")), 31)
            .cast("long")
            .alias("ci_hi_milli"),
        )
        .join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            "n_replicas",
            "mean_milli",
            "ci_lo_milli",
            "ci_hi_milli",
        )
    )
