"""Plan-drift detector: compare the CURRENT AQE-final physical plans of
named queries against the plans committed in PLANS.md at a given git
rev, normalizing expression ids (#N) and lambda-variable counters —
the evidence tool behind SCALE.md's "the physics never changed" claims
(r9→r10 bench wall-clock drift adjudication).

Usage: python tools/plan_diff.py [REV] [name ...]
       (default REV=HEAD, default names = bench.py HEADLINE)
Exit 0 when every requested plan is structurally identical; 1 otherwise.
"""

from __future__ import annotations

import contextlib
import difflib
import io
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")


def _norm(text: str) -> list[str]:
    text = re.sub(r"#\d+", "#X", text)
    text = re.sub(r"plan_id=\d+", "plan_id=N", text)
    # lambda variable counters are allocation-order artifacts
    text = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_N", text)
    # common-subexpression aliases use a SESSION-GLOBAL counter (same
    # class of artifact; verified absent from every headline plan, so
    # bench.py's digest continuity is unaffected)
    text = re.sub(r"_common_expr_\d+", "_common_expr_N", text)
    return [
        line
        for line in text.splitlines()
        if line.strip()
        and not line.startswith("```")
        and not line.startswith("*")
    ]


def main() -> int:
    args = sys.argv[1:]
    from fitness_nutrition_data_pipeline_spark.queries import all_specs as _specs

    known = set(_specs())
    if args and args[0] not in known:
        rev, names = args[0], args[1:]
    else:
        rev, names = "HEAD", args
    if not names:
        import bench

        names = list(bench.HEADLINE)

    committed = subprocess.run(
        ["git", "show", f"{rev}:PLANS.md"], capture_output=True, text=True
    ).stdout
    if not committed:
        print(f"no PLANS.md at {rev}")
        return 1

    from fitness_nutrition_data_pipeline_spark.queries import all_specs
    from fitness_nutrition_data_pipeline_spark.session import get_spark

    spark = get_spark("plan_diff")
    specs = all_specs()
    drifted = 0
    for name in names:
        m = re.search(rf"## {re.escape(name)}\n(.*?)(?=\n## |\Z)", committed, re.S)
        if not m:
            print(f"{name}: not in {rev} PLANS.md — skipped")
            continue
        df = specs[name].builder(spark, SF_DIR)
        df.collect()  # AQE-final
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        a, b = _norm(m.group(1)), _norm(buf.getvalue())
        diff = list(difflib.unified_diff(a, b, lineterm=""))
        if diff:
            drifted += 1
            print(f"{name}: DRIFTED ({len(diff)} diff lines)")
            print("\n".join(diff[:20]))
        else:
            print(f"{name}: identical ({len(a)} plan lines)")
    return 1 if drifted else 0


if __name__ == "__main__":
    raise SystemExit(main())
