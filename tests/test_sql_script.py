"""S7 script-runner: reference-parity parsing + lenient execution."""

from fitness_nutrition_data_pipeline_spark.sql_script import parse_sql_statements, run_sql_script

SCRIPT = """
-- a comment
SET @min_v = 2;

/* block comment
   spanning lines */

SELECT 'RANGE check' AS check_name,
       count(*) AS violations
FROM t_vals WHERE v < @min_v;

SELECT count(*) AS total FROM t_vals;

SELECT broken FROM no_such_table;

INSERT INTO nowhere VALUES (1);
"""


def test_parse_statements():
    stmts = parse_sql_statements(SCRIPT)
    assert stmts[0].startswith("SET @min_v")
    assert len(stmts) == 5
    assert all("block comment" not in s for s in stmts)


def test_lenient_execution_with_vars(spark):
    spark.createDataFrame([(1,), (2,), (3,)], "v int").createOrReplaceTempView("t_vals")
    seen = []
    stats = run_sql_script(spark, SCRIPT, process_row=seen.append)
    assert stats["executed"] == 2          # two SELECTs succeed
    assert stats["failed"] == 2            # bad table + INSERT both swallowed
    # @min_v substituted: violations counts v < 2 → 1
    assert {r.get("check_name", r.get("total")) for r in seen} == {"RANGE check", 3}
    byname = {r["check_name"]: r["violations"] for r in seen if "check_name" in r}
    assert byname["RANGE check"] == 1
