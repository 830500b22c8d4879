"""applyInPandasWithState sessionizer: state accumulates across
micro-batches; a processing-time gap timeout closes sessions and emits
summary rows.

Note: ProcessingTimeTimeout keeps scheduling no-data batches while any
timeout is registered, so the query is stopped explicitly once
emissions appear instead of waiting for availableNow termination."""

import time

from pyspark.sql import functions as F

from gamma_spark.streaming.stateful import sessionize_stream


def test_stateful_sessionizer(tmp_path, spark, events):
    ev = (
        events.select(
            "user_id", (F.col("ts") / 1_000_000).cast("long").alias("ts_ms")
        )
        .filter(F.col("user_id") < 8)
    )
    total_events = ev.count()
    src = str(tmp_path / "src")
    # several files + maxFilesPerTrigger=1 -> several micro-batches, so
    # the 1 ms processing-time timeout fires between batches and closes
    # batch-N-1 sessions during batch N
    ev.repartition(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_ms=1)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        emitted = {}
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT user_id, sum(session_events) AS n FROM sessions GROUP BY user_id"
            ).collect()
            emitted = {r.user_id: r.n for r in rows}
            if len(emitted) >= 8:
                break
            time.sleep(2)
        assert q.exception() is None
    finally:
        q.stop()

    # sessions closed by the timeout carry real accumulated state
    assert emitted, "timeout never closed any session"
    assert sum(emitted.values()) <= total_events
    per_user = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for uid, n in emitted.items():
        assert 0 < n <= per_user[uid]
