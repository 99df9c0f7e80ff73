"""Watermarked windowed streaming aggregation (streaming/windows.py):
append-mode emission matches the batch GROUP BY once windows close, and
an open window (inside the watermark horizon) is NOT emitted."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING, "
              "value DOUBLE")


def test_windowed_counts_close_with_watermark(spark, tmp_path):
    from light_splade_spark.streaming.windows import stream_windowed_counts

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h, n in ((0, 3), (1, 2), (2, 4)):
        for i in range(n):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=7 * i + 1),
                         "click" if i % 2 == 0 else "view", 1.5 + i))
            eid += 1
    src = tmp_path / "in"
    src.mkdir()
    _events(spark, rows).coalesce(1).write.mode("overwrite") \
        .parquet(str(src / "f1.parquet"))
    # sentinel 3 h later in a SEPARATE file/batch: advances the watermark
    # past every real window so append mode finalizes them all
    _events(spark, [(999, t0 + dt.timedelta(hours=5), "sentinel", 0.0)]) \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "f2.parquet"))
    # FileStreamSource orders batches by file mtime; pin the order so the
    # sentinel can never land first (which would watermark-drop everything)
    import __spark_entry__ as entry
    entry._pin_stream_order(str(src / "f1.parquet"), str(src / "f2.parquet"))

    stream = (spark.readStream
              .schema("event_id BIGINT, ts TIMESTAMP, event_type STRING, "
                      "value DOUBLE")
              .option("maxFilesPerTrigger", "1").parquet(str(src) + "/*"))
    q = stream_windowed_counts(stream, str(tmp_path / "out"),
                               str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = {(r.w_start.hour, r.event_type): (r.n_events, r.sum_value)
           for r in spark.read.parquet(str(tmp_path / "out"))
           .where(F.col("event_type") != "sentinel").collect()}
    # batch mirror
    want = {(r.h, r.event_type): (r.n, r.s) for r in
            _events(spark, rows).groupBy(
                F.hour("ts").alias("h"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("s")).collect()}
    assert got == want and len(got) >= 5
    # the sentinel's own window is still open (nothing after it advanced
    # the watermark past hour 5) -> not emitted
    sent = spark.read.parquet(str(tmp_path / "out")) \
        .where(F.col("event_type") == "sentinel").count()
    assert sent == 0
