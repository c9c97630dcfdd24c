"""Registry-wide lint: no oracle may output a HUGEINT column.

DuckDB's bare ``sum()`` over INTEGER/BIGINT returns int128 (HUGEINT).
``fetchall()`` silently converts it to Python int — invisible locally —
but the driver fetches the oracle result via Arrow/pandas, which
coerces HUGEINT to float64, so the driver hashes ``60.0`` against
Spark's ``60``: rows match, schema matches, hash fails.  This cost
three rounds of red marks (winsorized_price_stats,
drift_monitor_batch_replay, multimodal_meta_profile — VERDICT r6).

The lint binds every registered oracle against the sf0.001 views and
fails if any output column types as HUGEINT (or UHUGEINT).  Binding a
relation is plan-only — nothing executes — so walking all ~200 oracles
is cheap.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from fitness_nutrition_data_pipeline_spark.queries import all_specs

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_outputs_hugeint(con):
    offenders = {}
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)  # binder only; no execution
        bad = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"HUGEINT oracle output columns (driver's Arrow fetch coerces "
        f"int128 to float64 and the value hash fails): {offenders} — "
        f"wrap each in CAST(... AS BIGINT)"
    )
