"""Diamond-DAG audit (SCALE.md policy): for every registered query, count
the real `Scan parquet` nodes per table in the STATIC plan and flag
queries that scan some table more often than a declared allowance.

A table scanned N>1 times means the plan re-reads (and re-computes the
lineage over) that table N times at 100 TB. Allowed repeats must be
deliberate and documented (incremental snapshot+delta, genuinely
different text representations); everything else is a bug per the fix
ladder (restructure → localCheckpoint answer-sized → accept+document).

Usage: python tools/audit_scans.py [--max N]   (default flag threshold 2)
Prints one line per flagged query: name, table, scan count. Exit 0
always — this is an audit report, not a gate; the per-round review
decides which flags become fixes.
"""

from __future__ import annotations

import io
import contextlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fitness_nutrition_data_pipeline_spark.queries import all_specs  # noqa: E402
from fitness_nutrition_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
_TABLE_RE = re.compile(r"(\w+)\.parquet")


def main() -> int:
    threshold = 2
    if "--max" in sys.argv:
        threshold = int(sys.argv[sys.argv.index("--max") + 1])
    spark = get_spark("audit_scans")
    flagged = 0
    for name, spec in all_specs().items():
        try:
            df = spec.builder(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="simple")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            continue
        counts: dict[str, int] = {}
        for m in _TABLE_RE.finditer(plan):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
        for tbl, n in sorted(counts.items()):
            if n > threshold:
                print(f"FLAG {name}: {tbl} scanned {n}x")
                flagged += 1
    print(f"\n{flagged} flags at threshold >{threshold}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
