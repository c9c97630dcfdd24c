"""Per-key streaming rate limiting (quota admission control) — a second
custom stateful operator beside the ``applyInPandasWithState`` sessionizer
(streaming/sessions.py).

State: one admitted-count per key, updated per micro-batch; admission is
deterministic (event_id order within a batch). Memory is bounded by key
cardinality, never volume — the 100 TB-stream posture.

API note: Spark 4.x's second-generation ``transformWithStateInPandas``
(named/TTL'd state primitives + timers over RocksDB) is the natural home
for quota state, but its Python state-server protocol needs the
``google.protobuf`` package, which this container does not ship — the
import is gated and verified by test. The first-generation
``applyInPandasWithState`` implementation below is the working path and
carries identical semantics minus TTL expiry (swap in a timer-based
eviction when protobuf is available).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ADMITTED_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("admitted_no", T.LongType()),  # 1-based admission index
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("n_admitted", T.LongType())])


def second_gen_available() -> bool:
    """True when transformWithStateInPandas can actually run here (its
    state-server wire protocol imports google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _limiter(limit: int):
    def admit(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        n = state.get[0] if state.exists else 0
        # A key's batch arrives as MULTIPLE Arrow chunks (~10k rows each);
        # sorting per-chunk would make admission chunk-order dependent, so
        # concatenate the whole group first and sort event_id ONCE. Also
        # fully drains the iterator (an early break would leave it partially
        # consumed). Memory-safe: we keep only the event_id column, and the
        # admitted output is bounded by `limit`.
        ids = pd.concat(
            [pdf["event_id"] for pdf in pdfs], ignore_index=True
        ).sort_values()
        out = []
        for eid in ids:
            if n >= limit:
                break
            n += 1
            out.append((user_id, int(eid), n))
        state.update((n,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "admitted_no"])

    return admit


def rate_limit_stream(
    spark: SparkSession, input_dir: str, *, limit: int = 3
) -> DataFrame:
    """Admit at most ``limit`` events per user over the stream's lifetime;
    drop the rest. Emits (user_id, event_id, admitted_no) per admission."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return src.groupBy("user_id").applyInPandasWithState(
        _limiter(limit),
        outputStructType=ADMITTED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_rate_limiter_once(
    spark: SparkSession, input_dir: str, name: str, *, limit: int = 3
) -> DataFrame:
    """Drain available files through the limiter into a memory table."""
    q = (
        rate_limit_stream(spark, input_dir, limit=limit)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
