"""Checkpointed restart: a file-source stream stopped and restarted from
the same checkpoint must process each input exactly once — the property
that lets a 100 TB ingest survive executor/driver loss without double
counting. Uses a parquet sink (memory sinks don't survive restarts)."""

from pyspark.sql import functions as F


def _write_batch(path, name, rows):
    with open(f"{path}/{name}", "w") as f:
        f.write("event_id,ts,value\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]},{r[2]}\n")


def _start(spark, src_dir, out_dir, ckpt_dir):
    stream = (
        spark.readStream.schema("event_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(src_dir)
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ckpt_src"))
    out = str(tmp_path_factory.mktemp("ckpt_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_state"))

    _write_batch(src, "b1.csv", [(i, "2016-04-01 10:00:00", 1.0) for i in range(10)])
    q = _start(spark, src, out, ckpt)
    q.awaitTermination()

    # restart with NO new input: the checkpoint must prevent reprocessing
    q = _start(spark, src, out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 10

    # new file after restart: only the delta is processed
    _write_batch(src, "b2.csv", [(100 + i, "2016-04-01 10:05:00", 2.0) for i in range(5)])
    q = _start(spark, src, out, ckpt)
    q.awaitTermination()
    result = spark.read.parquet(out)
    assert result.count() == 15
    # each event_id exactly once — no replays across the three runs
    assert result.groupBy("event_id").count().where(F.col("count") > 1).count() == 0
