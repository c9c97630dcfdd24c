"""Registry-wide output-type lints for the cross-engine hash gate.

The driver fetches the DuckDB oracle via Arrow/pandas and stringifies
both engines' values before hashing.  Any type whose string form
differs between the lanes is a silent hash-red:

* HUGEINT (DuckDB bare ``sum()`` over integers) -> float64: ``60.0``
  vs Spark's ``60`` (three r6 reds).
* DECIMAL -> float64: the oracle lane reprs ``0.05`` while Spark
  collects fixed-scale ``Decimal('0.050000')`` -> ``'0.050000'`` —
  red iff any value's decimal string has trailing zeros (five r7
  reds, six latent).  The SAME defect class, one type later.

Instead of chasing types one-by-one, both lints are allowlists:

* every final ORACLE column must type as one of
  BIGINT/INTEGER/SMALLINT/TINYINT/DOUBLE/VARCHAR/DATE/BOOLEAN —
  anything else (HUGEINT, DECIMAL, TIMESTAMP, FLOAT, lists, ...) must
  be canonicalized inside the SQL (``CAST(... AS DOUBLE)``,
  ``CAST(... AS VARCHAR)``);
* every final SPARK schema from a registered query must use only
  Long/Integer/Short/Byte/Double/String/Date/Boolean — in particular
  no ``DecimalType``: quantize through decimal for cross-engine
  exactness, then ``.cast("double")`` (the stats_ops ``ks_stat``
  pattern).

Cost honesty: the ORACLE half is binder-only (no execution). The
SPARK half lints the REAL registered builders rather than a parallel
registry that could drift; since r13 it reads schemas from the shared
one-pass ``registry_plans`` fixture (conftest) instead of re-building
all ~300 queries itself — the build cost (including the sink-executing
audit builders) is paid once per suite run, shared with the digest,
cartesian and output-order gates.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import types as T

from fitness_nutrition_data_pipeline_spark.oracle_types import (
    ALLOWED_ORACLE_TYPES,
)  # single source of truth — shared with tools/verify_queries.py
from fitness_nutrition_data_pipeline_spark.queries import all_specs

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

ALLOWED_SPARK_TYPES = (
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.StringType,
    T.DateType,
    T.BooleanType,
    # mirrors the oracle allowlist: timestamps stringify identically
    # across the lanes; driver-green since r5.
    T.TimestampType,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_oracle_output_types_allowlisted(con):
    offenders = {}
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)  # binder only; no execution
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() not in ALLOWED_ORACLE_TYPES
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracle output columns outside the Arrow-stable allowlist "
        f"{sorted(ALLOWED_ORACLE_TYPES)}: {offenders} — the driver's "
        f"pandas/Arrow fetch coerces these (HUGEINT/DECIMAL -> float64, "
        f"TIMESTAMP -> Timestamp) so the value hash diverges from "
        f"Spark's str(); canonicalize with CAST(... AS DOUBLE/BIGINT/"
        f"VARCHAR) as the final projection"
    )


def test_spark_output_types_allowlisted(registry_plans):
    specs = all_specs()
    offenders = {}
    for name, plans in registry_plans.items():
        if specs[name].oracle is None:
            continue
        schema = plans["schema"]
        bad = [
            (f.name, f.dataType.simpleString())
            for f in schema.fields
            if not isinstance(f.dataType, ALLOWED_SPARK_TYPES)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"registered queries with final schema types outside "
        f"Long/Int/Short/Byte/Double/String/Date/Boolean: {offenders} — "
        f"Spark collects DecimalType as fixed-scale Decimal "
        f"('0.050000') while the driver's oracle lane reprs float64 "
        f"('0.05'); finish every decimal quantization with "
        f'.cast("double") (stats_ops ks_stat pattern)'
    )


def test_lints_are_not_vacuous(con, spark):
    """Self-test: the allowlists must actually REJECT the two defect
    classes that cost rounds 6 and 7 — a bare integer sum() (HUGEINT)
    and a DECIMAL cast — on both engines' lanes."""
    from pyspark.sql import functions as F

    rel = con.sql(
        "SELECT sum(r_regionkey) AS s, "
        "CAST(1.5 AS DECIMAL(18,2)) AS d FROM region"
    )
    bad = [
        str(t)
        for t in rel.types
        if str(t).upper() not in ALLOWED_ORACLE_TYPES
    ]
    assert len(bad) == 2, f"expected HUGEINT+DECIMAL rejected, got {bad}"

    sdf = spark.range(1).select(
        F.lit(1.5).cast("decimal(18,2)").alias("d"),
        F.lit(1).alias("ok"),
    )
    bad_s = [
        f.dataType.simpleString()
        for f in sdf.schema.fields
        if not isinstance(f.dataType, ALLOWED_SPARK_TYPES)
    ]
    assert bad_s == ["decimal(18,2)"], bad_s
