"""Audit the testdata for half-boundary rounding hazards.

The money/value columns in the synthetic tables are EXACT 2-decimal, so a
small group's average can land exactly on a half boundary (x.xx5), where
Spark and DuckDB round doubles in opposite directions (shortest-decimal
repr half-up vs binary value — see
tests/test_advice_regressions.py::test_half_boundary_rounding_diverges...).
A query can be green today and flip when the driver regenerates testdata:
monthly_customer_spend carried 5 boundary groups at sf0.1 that were
masked only by its top-10 LIMIT.

This tool enumerates, per scale factor, the boundary groups at every
avg-rounding grain the registry uses, so a future round can see the
hazard BEFORE the driver does. Queries listed with nonzero counts either
already use exact integer half-up rounding (tpch_q2, monthly_customer_
spend) or need it.

Usage: python tools/audit_rounding_boundaries.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import duckdb

DEFAULT_SFS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)

# (query, round-dp, grain SQL producing per-group integer value sums in
# cents and counts). Boundary condition for rounding value/n at k decimal
# places of the ORIGINAL unit: fractional part of (cents * 10^(k-2)) / n
# is exactly 1/2  ⇔  (2 * cents * 10^(k-2)) % (2n) == n.
AUDITS = [
    (
        "monthly_customer_spend (avg_order, 2dp) — integer-rounded since r5",
        """
        WITH g AS (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                     AS cents, count(*) AS n
          FROM '{sf}/orders.parquet'
          GROUP BY o_custkey, date_trunc('month', o_orderdate)
        )
        SELECT count(*) FROM g WHERE (2 * cents) % (2 * n) = n
        """,
    ),
    (
        "tpch_q2 unit_cost (sum price / sum qty, 4dp) — integer-rounded since r5",
        """
        WITH g AS (
          SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * 100) AS BIGINT)
                     AS sp,
                 CAST(sum(CAST(l_quantity AS DECIMAL(8,2)) * 100) AS BIGINT) AS sq
          FROM '{sf}/lineitem.parquet'
          GROUP BY l_partkey, l_suppkey
        )
        SELECT count(*) FROM g WHERE (2 * sp * 10000) % (2 * sq) = sq
        """,
    ),
    (
        "daily_rollup_mean (avg value, 4dp, (user,day,click) groups)",
        """
        WITH g AS (
          SELECT CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT) AS cents,
                 count(*) AS n
          FROM '{sf}/events.parquet'
          WHERE event_type = 'click' AND value IS NOT NULL
          GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT count(*) FROM g WHERE (2 * cents * 100) % (2 * n) = n
        """,
    ),
    (
        "distribution_stats / winsorized raw_mean (avg price, 2dp, priority grain)",
        """
        WITH g AS (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                     AS cents, count(*) AS n
          FROM '{sf}/orders.parquet' GROUP BY o_orderpriority
        )
        SELECT count(*) FROM g WHERE (2 * cents) % (2 * n) = n
        """,
    ),
    (
        "tpch_q1 avg_price (4dp, returnflag x linestatus grain)",
        """
        WITH g AS (
          SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                     AS cents, count(*) AS n
          FROM '{sf}/lineitem.parquet'
          WHERE l_shipdate <= TIMESTAMP '2001-09-01'
          GROUP BY l_returnflag, l_linestatus
        )
        SELECT count(*) FROM g WHERE (2 * cents * 100) % (2 * n) = n
        """,
    ),
]


def main(sf_dirs: list[str]) -> int:
    hazard = 0
    for sf in sf_dirs:
        print(f"== {sf}")
        for label, sql in AUDITS:
            n = duckdb.sql(sql.format(sf=sf)).fetchone()[0]
            flag = "  OK " if n == 0 else "RISK " if "since r5" not in label else "info "
            if n and "since r5" not in label:
                hazard += 1
            print(f"  {flag} {n:>4} boundary groups | {label}")
    if hazard:
        print(f"\n{hazard} grain(s) carry live boundary groups in queries that "
              "still round double averages — apply the integer half-up pattern.")
    return 1 if hazard else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or list(DEFAULT_SFS)))
