"""Per-query measurement harness for the r17 optimization round.

Times individual registered queries through the noop sink (guide §1.4)
with job labels (§1.5), bracketing host probes, and optional formatted-
plan capture — the isolation tool behind OPTIMIZATION_r17.md's numbers.

Usage:
  python tools/opt_measure.py Q1 Q2 ...            # 3 reps each, sf0.1
  python tools/opt_measure.py --reps 5 Q1 ...
  python tools/opt_measure.py --plans DIR Q1 ...   # also dump explain("formatted") to DIR/<q>.txt
  SPARK_GRAFT_SF_DIR=... overrides the data dir.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import host_probe_mc_sec, host_probe_sec  # noqa: E402
from fitness_nutrition_data_pipeline_spark.queries import all_specs  # noqa: E402
from fitness_nutrition_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    plans_dir = None
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
        os.makedirs(plans_dir, exist_ok=True)
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    probe_pre = (host_probe_sec(), host_probe_mc_sec())
    spark = get_spark("opt_measure")
    specs = all_specs()

    from fitness_nutrition_data_pipeline_spark.sources.testdata import (
        TABLES,
        load_table,
    )

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    out: dict[str, dict] = {}
    for name in names:
        builder = specs[name].builder
        if plans_dir:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                builder(spark, sf_dir).explain(mode="formatted")
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        runs = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"opt_measure:{name}#{r}")
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if runs:
            out[name] = {"best": min(runs), "runs": runs}
            print(f"MEASURE {name}: best={min(runs)} runs={runs}", file=sys.stderr)
    probe_post = (host_probe_sec(), host_probe_mc_sec())
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "probe_pre": probe_pre,
                "probe_post": probe_post,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
