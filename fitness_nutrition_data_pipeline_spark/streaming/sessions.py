"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState`` (north-star "custom stateful operators").

Batch twin: queries/relational2.py::sessionize_events (lag + running sum).
Here the same 30-minute-gap semantics run incrementally: per-user state
holds the open session (start, last-seen, count); a new event either
extends it or closes it (emitting the finished session) and starts the
next. Arrow-batched — the Python hop happens once per user-group per
micro-batch, not per event.

State size = one small tuple per active user; eviction is the closed
session emit, so memory is bounded by concurrently-active users, not
history. That's the 100 TB-stream posture: state proportional to
cardinality, never to volume.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(
    key, pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = None
        n = 0

    closed: list[tuple[int, int, int, int]] = []
    for pdf in pdfs:
        # pandas datetime64[ns] → epoch micros (int64 view is nanoseconds)
        ts_us = (pdf["ts"].astype("int64") // 1000).sort_values()
        for t in ts_us:
            t = int(t)
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > GAP_US:
                closed.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us = t
                n += 1

    if last_us is not None:
        state.update((start_us, last_us, n))

    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )


def stream_sessionize(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming sessionizer over a parquet event feed. Emits one row per
    CLOSED session (append mode); the open tail per user lives in state."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        src.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionizer_once(spark: SparkSession, input_dir: str, name: str) -> DataFrame:
    """Drain available files through the sessionizer into a memory table."""
    q = (
        stream_sessionize(spark, input_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


try:  # Spark 4 API surface; absent on 3.x clusters (backend above still works)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]


class _SessionProcessor(StatefulProcessor):
    """Spark 4 ``StatefulProcessor`` running the SAME 30-minute-gap
    algorithm as ``_sessionize_group`` — the third sessionizer backend,
    on the ``transformWithState`` API (typed per-state ValueState in the
    RocksDB-backed store, state TTL and timers available, initial-state
    bootstrap supported) instead of the 3.x ``applyInPandasWithState``
    flat-tuple GroupState. Parity-tested against both the 3.x backend
    and the batch sessionizer in tests/test_streaming_sessions.py, so
    either backend can serve the operator depending on the cluster's
    Spark line."""

    def init(self, handle) -> None:
        self._open = handle.getValueState("open_session", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        (user_id,) = key
        prior = self._open.get() if self._open.exists() else None
        start_us, last_us, n = prior if prior is not None else (None, None, 0)

        closed: list[tuple[int, int, int, int]] = []
        for pdf in rows:
            ts_us = (pdf["ts"].astype("int64") // 1000).sort_values()
            for t in ts_us:
                t = int(t)
                if last_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > GAP_US:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us = t
                    n += 1

        if last_us is not None:
            self._open.update((start_us, last_us, n))

        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start_us", "session_end_us", "n_events",
                ],
            )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """True when the transformWithState backend can actually run here:
    the API needs the RocksDB state store AND ``google.protobuf`` (the
    state-server wire protocol). This container ships neither pip nor
    protobuf, so the backend is capability-gated exactly like the Avro
    sink and the Pillow image decode — the operator code is real and the
    parity test runs wherever the dependency exists."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def stream_sessionize_tws(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming sessionizer on the Spark 4 ``transformWithStateInPandas``
    API. Requires the RocksDB state store provider (set by the runner /
    test fixture) plus protobuf (see ``tws_available``); semantics
    identical to ``stream_sessionize``."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    proc = _SessionProcessor()
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def run_sessionizer_tws_once(
    spark: SparkSession, input_dir: str, name: str
) -> DataFrame:
    """Drain available files through the transformWithState sessionizer
    into a memory table (RocksDB provider pinned for the run)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            stream_sessionize_tws(spark, input_dir)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def stream_sessionize_native(
    spark: SparkSession,
    input_dir: str,
    *,
    gap: str = "30 minutes",
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Sessionization via Spark's NATIVE merging session windows — the
    streaming twin of queries/relational2.py::sessionize_native_window
    and the engine-managed alternative to the custom
    ``applyInPandasWithState`` sessionizer above (same 30-minute-gap
    semantics, state merged/evicted by the engine under the watermark
    instead of hand-rolled tuples). Append mode: a session row emits
    once its window can no longer grow (watermark passes end+gap)."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        src.withWatermark("ts", late_threshold)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
