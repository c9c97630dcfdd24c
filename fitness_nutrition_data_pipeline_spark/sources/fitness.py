"""Readers for the fitness/nutrition source files (SURVEY §1.3, §2.1).

Explicit StructType schemas everywhere — the source files carry messy
string columns ("0.1g", "3/25/2016 11:59:59 PM") where inference guesses
wrong, and a declared schema keeps the scan prunable and deterministic at
any scale (reference relies on pandas inference: main_etl_pipeline.py:77,
108, 122).

Missing-file tolerance matches the reference (skip + warn,
main_etl_pipeline.py:74-76): extraction returns only the sources present.

Excel ingestion (S3): read natively via the stdlib zip+XML parser
(sources/xlsx.py — no openpyxl needed; reference parity pinned in
tests/test_xlsx_source.py), with openpyxl as an import-gated fallback
for exotic sheets. Pre-converted CSV/parquet siblings still take
precedence in `read_tabular` (they're faster and splittable).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

# --- declared schemas -------------------------------------------------------

DAILY_ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("ActivityDate", T.StringType()),  # M/d/yyyy — parsed downstream
        T.StructField("TotalSteps", T.LongType()),
        T.StructField("TotalDistance", T.DoubleType()),
        T.StructField("TrackerDistance", T.DoubleType()),
        T.StructField("LoggedActivitiesDistance", T.DoubleType()),
        T.StructField("VeryActiveDistance", T.DoubleType()),
        T.StructField("ModeratelyActiveDistance", T.DoubleType()),
        T.StructField("LightActiveDistance", T.DoubleType()),
        T.StructField("SedentaryActiveDistance", T.DoubleType()),
        T.StructField("VeryActiveMinutes", T.LongType()),
        T.StructField("FairlyActiveMinutes", T.LongType()),
        T.StructField("LightlyActiveMinutes", T.LongType()),
        T.StructField("SedentaryMinutes", T.LongType()),
        T.StructField("Calories", T.LongType()),
    ]
)

HEARTRATE_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("Time", T.StringType()),  # M/d/yyyy h:mm:ss a
        T.StructField("Value", T.LongType()),
    ]
)

HOURLY_CALORIES_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("ActivityHour", T.StringType()),
        T.StructField("Calories", T.LongType()),
    ]
)

WEIGHT_LOG_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("Date", T.StringType()),
        T.StructField("WeightKg", T.DoubleType()),
        T.StructField("WeightPounds", T.DoubleType()),
        T.StructField("Fat", T.DoubleType()),
        T.StructField("BMI", T.DoubleType()),
        T.StructField("IsManualReport", T.BooleanType()),
        T.StructField("LogId", T.LongType()),
    ]
)

MINUTE_SLEEP_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("date", T.StringType()),
        T.StructField("value", T.LongType()),
        T.StructField("logId", T.LongType()),
    ]
)

FITBIT_FILES: dict[str, tuple[str, T.StructType]] = {
    "daily_activity": ("dailyActivity_merged.csv", DAILY_ACTIVITY_SCHEMA),
    "heartrate": ("heartrate_seconds_merged.csv", HEARTRATE_SCHEMA),
    "hourly_calories": ("hourlyCalories_merged.csv", HOURLY_CALORIES_SCHEMA),
    "weight_log": ("weightLogInfo_merged.csv", WEIGHT_LOG_SCHEMA),
    "sleep_minutes": ("minuteSleep_merged.csv", MINUTE_SLEEP_SCHEMA),
}

# gym_members / mendeley / nutrition carry free-form headers (spaces,
# parens, 77 nutrient columns) — read as all-string with header, normalize
# + cast downstream. Numeric coercion is explicit in the transforms, which
# is where the reference's to_numeric(errors='coerce') semantics live.


def _read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    # escape='"' → RFC4180 doubled-quote escaping (what pandas/csv write);
    # Spark's default backslash-escape silently corrupts quoted fields.
    reader = spark.read.option("header", True).option("escape", '"')
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # all-string: every cast is explicit downstream (coerce semantics)
        reader = reader.option("inferSchema", False)
    return reader.csv(path)


def read_excel_via_pandas(spark: SparkSession, path: str) -> DataFrame | None:
    """xlsx → DataFrame via pandas/openpyxl, if available (driver-side —
    xlsx is not a splittable format; at scale convert once to parquet)."""
    try:
        import pandas as pd  # noqa: F401
        import openpyxl  # noqa: F401
    except ImportError:
        logger.warning("openpyxl not installed; cannot read %s directly", path)
        return None
    import pandas as pd

    pdf = pd.read_excel(path)
    pdf.columns = [str(c) for c in pdf.columns]
    # all-string for parity with the CSV path; blank → NULL
    pdf = pdf.astype(object).where(pd.notna(pdf), None).astype(str)
    pdf = pdf.replace({"None": None, "nan": None})
    return spark.createDataFrame(pdf)


def read_tabular(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a source that may exist as xlsx, csv, or parquet.

    Preference order: parquet sibling, csv sibling, native xlsx (if
    openpyxl available). Returns None when nothing is present.
    """
    base, _ = os.path.splitext(path)
    if os.path.exists(base + ".parquet"):
        return spark.read.parquet(base + ".parquet")
    if os.path.exists(base + ".csv"):
        return _read_csv(spark, base + ".csv")
    if os.path.exists(path) and path.endswith(".xlsx"):
        # native stdlib parser first (zipfile+XML — no openpyxl needed);
        # pandas/openpyxl only as a fallback for exotic sheets
        try:
            from fitness_nutrition_data_pipeline_spark.sources.xlsx import read_xlsx

            # pin the parsed sheet as ONE executor block: the driver-side
            # relation would otherwise be re-serialized into every job
            # that touches this source (the warehouse DAG touches each
            # source many times — measured +6s on transform_load), and a
            # dim-sized sheet doesn't need scan parallelism (it ends up
            # broadcast downstream anyway)
            return read_xlsx(spark, path).coalesce(1).localCheckpoint()
        except Exception:  # noqa: BLE001 — e.g. formula/serial-date sheets
            # keep the original traceback visible: in environments without
            # openpyxl the fallback raises ModuleNotFoundError, which would
            # otherwise mask a genuine bug in the stdlib parser (ADVICE r6)
            logger.warning(
                "stdlib xlsx parse failed for %s; trying openpyxl",
                path,
                exc_info=True,
            )
            return read_excel_via_pandas(spark, path)
    if os.path.exists(path):
        return _read_csv(spark, path)
    logger.warning("source not found: %s, skipping", path)
    return None


def extract_fitbit(spark: SparkSession, fitbit_dir: str) -> dict[str, DataFrame]:
    """S1: the five Fitbit CSVs, skip-if-missing, per-file isolation
    (main_etl_pipeline.py:58-84)."""
    out: dict[str, DataFrame] = {}
    for key, (filename, schema) in FITBIT_FILES.items():
        path = os.path.join(fitbit_dir, filename)
        if not os.path.exists(path):
            logger.warning("fitbit file not found: %s, skipping", path)
            continue
        out[key] = _read_csv(spark, path, schema)
    return out


def extract_all(spark: SparkSession, cfg) -> dict[str, object]:
    """All sources (main_etl_pipeline.py:956-959): fitbit dict + gym CSV +
    mendeley/nutrition tabular. Only present sources appear in the dict.

    The four source groups are independent, so they extract on a thread
    pool: the CSV schema scans and the xlsx localCheckpoint jobs run
    JVM-side (GIL released). Big xlsx sheets PREWARM on the main thread
    first — the fork-parallel chunk parse is main-thread-only (forking
    from a worker thread while sibling threads hold py4j/logging locks
    is the ADVICE r7 deadlock hazard), so the rows are parsed and
    cached here and the pooled read_tabular calls hit the cache."""
    from concurrent.futures import ThreadPoolExecutor

    from fitness_nutrition_data_pipeline_spark.sources.xlsx import prewarm_rows_many

    to_warm = []
    for fname in ("gym_recommendation.xlsx", "nutrition.xlsx"):
        p = os.path.join(cfg.data_dir, fname)
        base, _ = os.path.splitext(p)
        # only when the xlsx itself will be parsed (read_tabular prefers
        # parquet/csv siblings, which never fork)
        if (
            os.path.exists(p)
            and not os.path.exists(base + ".parquet")
            and not os.path.exists(base + ".csv")
        ):
            to_warm.append(p)
    if to_warm:
        try:
            # one call: the files' fork-parallel parses overlap
            prewarm_rows_many(to_warm)
        except Exception:  # noqa: BLE001 — read_tabular handles/logs
            pass

    tasks = {
        "fitbit": lambda: extract_fitbit(spark, cfg.fitbit_dir),
        "gym_members": lambda: read_tabular(
            spark, os.path.join(cfg.data_dir, "gym_members_exercise_tracking.csv")
        ),
        "mendeley_health": lambda: read_tabular(
            spark, os.path.join(cfg.data_dir, "gym_recommendation.xlsx")
        ),
        "nutrition": lambda: read_tabular(
            spark, os.path.join(cfg.data_dir, "nutrition.xlsx")
        ),
    }
    with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
        futures = {name: pool.submit(fn) for name, fn in tasks.items()}
        results = {name: f.result() for name, f in futures.items()}
    # the prewarmed rows have been consumed (each xlsx became a pinned
    # executor block above) — drop the driver-side copies rather than
    # carrying hundreds of MB of parsed strings for the process lifetime
    from fitness_nutrition_data_pipeline_spark.sources.xlsx import _ROWS_CACHE

    _ROWS_CACHE.clear()
    # fitbit is a dict (empty = every file missing); the rest are
    # DataFrame-or-None
    return {
        name: df
        for name, df in results.items()
        if df is not None and (name != "fitbit" or df)
    }
