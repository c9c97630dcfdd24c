"""Property-style engine parity for the streaming drift monitor
(VERDICT r12 ask #6, extending the r12 watermark/ratelimit/CEP trilogy
to a fourth §2.8 family): the windowed value histogram's FINAL
(window_start, bin, n) table must be invariant to HOW the feed is split
across micro-batches and to arrival ORDER within each micro-batch, and
must equal the single-pass batch groupBy over the same rows.

hypothesis draws each event's window assignment (non-decreasing across
the feed so no row is ever late — lateness semantics are covered by the
watermark property test; this one isolates BATCHING invariance), its
bin-determining value, the micro-batch split points, and a permutation
within each micro-batch. Each example drives the REAL withWatermark +
window() aggregation engine once per micro-batch (availableNow against
a shared checkpoint, append mode via foreachBatch), with a final flush
batch far in the future so every real window crosses the watermark and
emits exactly once.
"""


from __future__ import annotations

# slow tier (r18): heavy replay/property suite, excluded from the
# default pytest run (see pytest.ini) -- run with -m slow
import pytest

pytestmark = pytest.mark.slow

import datetime
import os
import shutil
import sys
import tempfile

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = 36
T0 = datetime.datetime(2016, 4, 1, 10, 0, 0)
WINDOW_MIN = 10  # tumbling window + allowed lateness, minutes


@st.composite
def feed(draw):
    # windows non-decreasing across the feed => nothing is ever dropped
    # (window_end > max_ts - lateness holds for every row by construction)
    wins = sorted(
        draw(st.lists(st.integers(0, 2), min_size=N_EVENTS, max_size=N_EVENTS))
    )
    vals = draw(
        st.lists(st.integers(0, 49), min_size=N_EVENTS, max_size=N_EVENTS)
    )
    cuts = sorted(
        draw(st.lists(st.integers(1, N_EVENTS - 1), max_size=3, unique=True))
    )
    bounds = [0, *cuts, N_EVENTS]
    perms = [
        draw(st.permutations(range(bounds[b], bounds[b + 1])))
        for b in range(len(bounds) - 1)
    ]
    return wins, vals, perms


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(feed())
def test_drift_histogram_invariant_to_batching(spark, case):
    from fitness_nutrition_data_pipeline_spark.streaming.drift import (
        windowed_value_histogram,
    )

    wins, vals, perms = case
    rows = [
        (
            i,
            T0 + datetime.timedelta(minutes=wins[i] * WINDOW_MIN, seconds=i),
            float(vals[i]),
        )
        for i in range(N_EVENTS)
    ]
    flush_ts = T0 + datetime.timedelta(minutes=100 * WINDOW_MIN)
    work = tempfile.mkdtemp(prefix="drift_prop_")
    try:
        src = os.path.join(work, "in")
        os.makedirs(src)
        emitted: list[tuple] = []

        def run_batch(batch_rows, b):
            with open(os.path.join(src, f"batch{b}.csv"), "w") as f:
                f.write("event_id,ts,value\n")
                for eid, ts, v in batch_rows:
                    f.write(f"{eid},{ts},{v}\n")
            stream = (
                spark.readStream.schema(
                    "event_id LONG, ts TIMESTAMP, value DOUBLE"
                )
                .option("header", True)
                .csv(src)
            )
            hist = windowed_value_histogram(
                stream,
                "ts",
                "value",
                window_len=f"{WINDOW_MIN} minutes",
                bin_width=10.0,
                late_threshold=f"{WINDOW_MIN} minutes",
            )

            def sink(df, _epoch, _out=emitted):
                _out.extend(
                    (r["window_start"], r["bin"], r["n"]) for r in df.collect()
                )

            q = (
                hist.writeStream.foreachBatch(sink)
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .start()
            )
            q.awaitTermination()

        for b, perm in enumerate(perms):
            run_batch([rows[j] for j in perm], b)
        run_batch([(9999, flush_ts, 0.0)], len(perms))

        got = sorted(t for t in emitted if t[0] != flush_ts)
        # append mode emits each closed window exactly once — duplicates
        # would mean state re-emission across micro-batches
        assert len(got) == len({(w, bn) for w, bn, _ in got})

        batch_df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double"
        )
        want = sorted(
            (r["window_start"], r["bin"], r["n"])
            for r in batch_df.groupBy(
                F.window("ts", f"{WINDOW_MIN} minutes").alias("w"),
                F.floor(F.col("value") / 10.0).cast("long").alias("bin"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "bin", "n")
            .collect()
        )
        assert got == want, (
            f"cuts at {[len(p) for p in perms]} "
            f"engine-only={set(got) - set(want)} "
            f"batch-only={set(want) - set(got)}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
