"""Regression tests for the round-2 VERDICT/ADVICE findings.

Each test pins a specific diagnosed bug so it cannot silently return:
1. load_table must work on a BARE SparkSession (no repo config) — the
   driver's correctness harness builds its own session, and events.parquet
   is TIMESTAMP(NANOS) which a default session refuses to scan.
2. streaming dedup_by_content must not collide adjacent payload fields.
3. word_shingles / winnowing must not crash on docs shorter than the gram.
4. as_of_join must carry the WHOLE latest right row (NULL fields included),
   never mix values across right rows.
"""

from datetime import datetime

from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.operators.asof import as_of_join
from fitness_nutrition_data_pipeline_spark.operators.text import (
    word_shingles,
    winnowing_fingerprint_summary,
)
from fitness_nutrition_data_pipeline_spark.sources.testdata import load_table


def test_load_table_events_on_bare_session(spark, sf_dir):
    """Simulate the driver's harness: a session WITHOUT
    spark.sql.legacy.parquet.nanosAsLong must still read events.parquet.
    newSession() gives an isolated SQLConf; unset drops the conf to its
    default (false), which is what a bare builder.getOrCreate() has."""
    bare = spark.newSession()
    try:
        bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    assert bare.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    df = load_table(bare, sf_dir, "events")
    # must be exactly TIMESTAMP (LTZ): Spark 4.1+ scans TIMESTAMP(NANOS)
    # as TIMESTAMP_NTZ, which unix_micros/epoch functions reject — the
    # round-3 bench and two driver queries died on exactly that. "timestamp"
    # (not "timestamp_ntz") proves load_table normalized it.
    ts_type = dict(df.dtypes)["ts"]
    assert ts_type == "timestamp", ts_type
    n = df.where(F.unix_micros("ts").isNotNull()).count()
    assert n > 0


def test_streaming_content_fp_no_adjacent_field_collision(spark):
    """("ab","c") and ("a","bc") concatenate identically without a field
    delimiter; both records must survive content dedup. Exercises the same
    fingerprint expression dedup_by_content keys on, in batch (the
    expression is identical; streaming state semantics are covered in
    test_streaming.py)."""
    from fitness_nutrition_data_pipeline_spark.streaming import dedup as sdp

    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc"), (None, "x"), ("", "x"), ("\x1f", "x")],
        "f1 string, f2 string",
    )
    # reuse the module's fingerprint by running dedup on a batch frame via
    # the same expression: build it exactly as dedup_by_content does
    import inspect

    src = inspect.getsource(sdp.dedup_by_content)
    assert 'concat_ws(\n            "\x01"' in src or '"\x01"' in src
    fp = F.md5(
        F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>\x00"))
                for c in ("f1", "f2")
            ],
        )
    )
    fps = [r.fp for r in df.select(fp.alias("fp")).collect()]
    assert len(set(fps)) == 5, "all five distinct payloads must fingerprint apart"


def test_word_shingles_short_docs_no_crash(spark):
    """Docs with fewer tokens than the shingle width must yield empty
    shingle arrays (negative slice length crashes Spark)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "one two three four")],
        "id long, text string",
    )
    rows = {
        r.id: r.sh
        for r in df.select("id", word_shingles("text", 3).alias("sh")).collect()
    }
    assert rows[2] == []
    assert rows[3] == []
    assert rows[4] == ["one two three", "two three four"]


def test_winnowing_short_docs_no_crash(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"),
         (4, "a b c d e f g h i j k l")],
        "id long, text string",
    )
    out = winnowing_fingerprint_summary(df, "id", "text", gram=3, window=4)
    got = {r.id: r.n_fingerprints for r in out.collect()}
    # short docs simply produce no fingerprints (absent from the groupBy)
    assert 4 in got and got[4] >= 1
    assert 1 not in got and 2 not in got and 3 not in got


def test_asof_join_null_field_in_latest_row(spark):
    """If the latest right row has v=NULL, ASOF must return (that row's id,
    NULL) — not splice in the previous row's non-NULL v. Matches DuckDB
    ASOF JOIN row semantics."""
    t = lambda m: datetime(2024, 1, 1, 0, m, 0)
    left = spark.createDataFrame([(1, 10, t(20))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, t(2), 1.0), (101, 10, t(15), None)],
        "rid long, k long, ts timestamp, v double",
    )
    out = as_of_join(
        left, right, "k", "ts", "ts", right_value_cols=["rid", "v"]
    ).collect()
    assert len(out) == 1
    assert out[0].asof_rid == 101
    assert out[0].asof_v is None, "must not mix v from an earlier right row"


def test_load_table_pins_utc_on_non_utc_session(spark, sf_dir):
    """A harness session running in a non-UTC machine timezone must still
    produce the same calendar dates the (timezone-naive) DuckDB oracle
    sees: load_table pins spark.sql.session.timeZone to UTC."""
    bare = spark.newSession()
    bare.conf.set("spark.sql.session.timeZone", "America/New_York")
    df = load_table(bare, sf_dir, "events")
    assert bare.conf.get("spark.sql.session.timeZone") == "UTC"
    # a midnight-adjacent timestamp must not shift its date
    import duckdb

    want = duckdb.sql(
        f"SELECT CAST(min(CAST(ts AS DATE)) AS VARCHAR) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    got = df.select(F.min(F.to_date("ts")).cast("string")).first()[0]
    assert got == want


def test_division_by_zero_null_on_both_engines(spark):
    """Round-5 ADVICE: jaccard 0/0 on an empty-shingle pair. The operator
    (operators/dedup.py::jaccard_on_adjacent_pairs) emits a NULL for the
    degenerate pair instead of filtering it (a pushed-down denom>0
    predicate re-evaluates array_intersect per row — measured 1.6× on
    ngram_jaccard_pairs). That is only sound if both engines produce the
    same NULL: Spark 4 runs ANSI mode where plain `/` by zero THROWS, so
    the operator must use try_divide; DuckDB's plain division already
    yields NULL. Pin both behaviors."""
    import duckdb

    spark_row = spark.sql(
        "SELECT try_divide(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS a,"
        "       try_divide(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS b"
    ).collect()[0]
    assert spark_row.a is None and spark_row.b is None
    duck_row = duckdb.sql(
        "SELECT CAST(0.0 AS DOUBLE)/CAST(0.0 AS DOUBLE) AS a,"
        "       CAST(1.0 AS DOUBLE)/CAST(0.0 AS DOUBLE) AS b"
    ).fetchone()
    assert duck_row == (None, None)
    # and the ANSI default that motivates try_divide really is on
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_half_boundary_rounding_diverges_and_integer_formula_agrees(spark):
    """Round-5 finding (caught by cross-SF verification of tpch_q2): when a
    mean of exact 2-decimal money lands exactly on a half boundary
    (e.g. avg(10.01, 10.02) = 10.015), Spark and DuckDB round the DOUBLE
    in opposite directions — Spark rounds the shortest decimal repr
    half-up (10.02), DuckDB rounds the binary value (10.0149999… →
    10.01). Queries must therefore round such averages with exact integer
    half-up over cent sums (floor((2*cents + n) / (2*n))), the pattern
    used by tpch_q2_min_cost_supplier and monthly_customer_spend. Pin the
    divergence (so we notice if an engine changes) and the formula."""
    import duckdb

    # 583.43/8 = 72.92875 exactly; its nearest double is BELOW the
    # boundary (72.928749999…), so DuckDB (binary value) rounds down
    # while Spark (shortest decimal repr "72.92875", HALF_UP) rounds up.
    # (Which side the binary value falls on varies per literal — 10.015's
    # double is above its boundary and both engines round it up — which
    # is exactly why no double-rounding convention can be portable.)
    s = spark.sql(
        "SELECT round(CAST(583.43 AS DOUBLE) / 8, 4) AS r"
    ).collect()[0].r
    d = duckdb.sql("SELECT round(CAST(583.43 AS DOUBLE) / 8, 4) AS r").fetchone()[0]
    assert s == 72.9288 and d == 72.9287  # the trap: engines disagree

    # the exact integer formula agrees with decimal HALF_UP on both
    # engines: sp/sq in cents-scaled units, result in 1e4ths (4dp)
    sp, sq = 58343, 800  # 583.43 and 8.00, cents-scaled
    expect = 729288  # 72.9288 in 1e4ths, half-up
    s2 = spark.sql(
        f"SELECT (CAST({sp} AS BIGINT) * 20000 + {sq}) DIV (2 * {sq}) AS c"
    ).collect()[0].c
    d2 = duckdb.sql(
        f"SELECT (CAST({sp} AS BIGINT) * 20000 + {sq}) // (2 * {sq}) AS c"
    ).fetchone()[0]
    assert s2 == expect and d2 == expect


def test_avg_half_boundary_integer_formula(spark):
    """sf0.001 sweep regression: 307.03/8 = 38.37875 exactly — a 4dp half
    boundary where Spark's round (BigDecimal HALF_UP on the double's
    exact value) gives .3788 while DuckDB's scale-multiply can land a ulp
    below the midpoint and give .3787. incremental_agg_merge's integer
    half-up formula must produce the same digits as DuckDB's version of
    the same integer formula, boundary included."""
    import duckdb

    df = spark.createDataFrame([(307.03, 8)], "total double, n long")
    got = (
        df.select(
            (
                # the DECIMAL cast before scaling is load-bearing: a raw
                # double total*100 can land at 30702.999... and truncate
                F.expr(
                    "CAST(((CAST(CAST(total AS DECIMAL(18,2)) * 100 AS LONG)"
                    " * 100 * 2 + n) div (2 * n)) AS DOUBLE)"
                )
                / 10000
            ).alias("avg4")
        )
        .first()
        .avg4
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT CAST((CAST(307.03 * 100 AS BIGINT) * 100 * 2 + 8) "
            "// (2 * 8) AS DOUBLE) / 10000"
        )
        .fetchone()[0]
    )
    assert got == want == 38.3788


def test_load_failure_drops_registered_views(spark, tmp_path):
    """ADVICE r12 #3: temp views register on load_warehouse's writer
    threads, so one failing write must not leave a caller that catches
    the exception with a partially-populated catalog — the error path
    drops every view this call could have registered."""
    import pytest as _pytest

    from fitness_nutrition_data_pipeline_spark.load import load_warehouse

    good = spark.range(3).toDF("DateKey")
    # fails at ACTION time (after sibling writes may have registered)
    bad = spark.range(1).select(
        F.assert_true(F.col("id") > 100).alias("x"), F.col("id")
    )
    with _pytest.raises(Exception):
        load_warehouse(
            spark,
            {"Dim_Date": good, "Dim_User": bad},
            str(tmp_path / "wh"),
        )
    assert not spark.catalog.tableExists("Dim_Date")
    assert not spark.catalog.tableExists("Dim_User")

    # and a clean retry on the same session repopulates normally
    paths = load_warehouse(
        spark,
        {"Dim_Date": good, "Dim_User": spark.range(2).toDF("UserKey")},
        str(tmp_path / "wh2"),
    )
    assert set(paths) == {"Dim_Date", "Dim_User"}
    assert spark.table("Dim_Date").count() == 3


def test_load_failure_cleanup_waits_for_inflight_writers(spark, tmp_path):
    """ADVICE r13 #1: pool.map raises as soon as the FAILING table's
    result is consumed, while a slower sibling writer may still be
    running — the cleanup must join all in-flight writers before
    sweeping the catalog, or the sibling re-registers its view AFTER
    the sweep and a catching-and-retrying caller observes the
    partially-populated catalog anyway. The failing table comes FIRST
    in LOAD_ORDER here (the r12 regression test had it last, which
    masked the race)."""
    import time

    import pytest as _pytest

    from fitness_nutrition_data_pipeline_spark.load import load_warehouse

    # Dim_Date precedes Dim_User in LOAD_ORDER, so pool.map consumes the
    # failing result first — while the slow sibling is still asleep
    bad = spark.range(1).select(
        F.assert_true(F.col("id") > 100).alias("x"), F.col("id")
    ).toDF("DateKey", "id")

    def _slow(batches):
        time.sleep(1.5)
        yield from batches

    slow_good = spark.range(3).toDF("UserKey").mapInPandas(
        _slow, "UserKey long"
    )
    with _pytest.raises(Exception):
        load_warehouse(
            spark,
            {"Dim_Date": bad, "Dim_User": slow_good},
            str(tmp_path / "wh"),
        )
    # the slow writer finished (and registered) BEFORE the sweep — both
    # views must be gone, with no straggler re-registration to come
    time.sleep(0.2)
    assert not spark.catalog.tableExists("Dim_Date")
    assert not spark.catalog.tableExists("Dim_User")


def test_log_odds_oracle_degenerates_like_spark(spark, tmp_path):
    """ADVICE r13 #4: on a MONOLINGUAL corpus slice the old oracle's
    per-corpus scalar subqueries produced an empty relation and wiped
    the result through the comma-join, while the Spark side's global
    agg emits one row with NULL totals and 20 null-z rows — a strict
    hash-mismatch waiting on any single-language data slice. Both
    engines must now degenerate identically."""
    import duckdb
    import pandas as pd

    from fitness_nutrition_data_pipeline_spark.queries import all_specs

    docs = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [f"alpha beta w{i} gamma" for i in range(30)],
            "lang": ["en"] * 30,  # no 'other' corpus at all
            "source": ["s"] * 30,
            "n_chars": [20] * 30,
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))

    spec = all_specs()["log_odds_ratio_terms"]
    got = spec.builder(spark, str(tmp_path)).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    want = con.execute(spec.oracle).df()
    assert len(got) == len(want) == 20
    assert got["z"].isna().all() and want["z"].isna().all()
    assert sorted(got["tok"]) == sorted(want["tok"])


def test_subset_digest_write_refuses_normalizer_mismatch(monkeypatch):
    """ADVICE r12 #2: a subset --write into a map written under a
    different normalizer version must refuse (Spark-free check), while
    a matching version or an empty/absent map proceeds."""
    from tools import registry_digest as rd

    monkeypatch.setattr(
        rd, "load_committed_raw",
        lambda: {rd._META_KEY: rd.NORMALIZER_VERSION - 1, "q1": "aa"},
    )
    assert rd.subset_write_refusal(["q1"]) is not None
    # full regeneration is always allowed
    assert rd.subset_write_refusal(None) is None

    monkeypatch.setattr(
        rd, "load_committed_raw",
        lambda: {rd._META_KEY: rd.NORMALIZER_VERSION, "q1": "aa"},
    )
    assert rd.subset_write_refusal(["q1"]) is None

    monkeypatch.setattr(rd, "load_committed_raw", lambda: {})
    assert rd.subset_write_refusal(["q1"]) is None
