"""Watermarked windowed aggregation over a mined occurrence stream.

North-star stream handling: late/replayed pages are tolerated via watermarks
+ event-time windows on the streaming side (in addition to the idempotent
MERGE sink in streaming/mine.py). Uses availableNow file-source micro-batches.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nativeextractor_spark.miners import EmailMiner
from nativeextractor_spark.streaming import mine_stream


def test_watermarked_window_counts(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("wm_src"))
    out = str(tmp_path_factory.mktemp("wm_out")) + "/agg"
    ck = str(tmp_path_factory.mktemp("wm_ck"))

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (f"u{i}", base + dt.timedelta(minutes=i * 7), f"mail a{i}@b{i}.example here")
        for i in range(6)
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).parquet(src)
    # mine, rejoin event time by url (streaming-safe broadcast-less join on
    # the same micro-batch source), then watermark + 15-minute windows
    occ = mine_stream(stream, [EmailMiner()])
    ts = stream.select("url", "warc_ts")
    counts = (
        occ.join(ts, "url")
        .withWatermark("warc_ts", "1 minute")
        .groupBy(F.window("warc_ts", "15 minutes").alias("w"), "label")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "label", "n")
    )
    q = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    # events at minutes 0,7,14,21,28,35; final watermark = 12:34 → append
    # mode emits only the closed windows 12:00 (3 events) and 12:15 (2);
    # the 12:30 window is correctly HELD for potential late data
    rows = {(r.window_start.minute, r.n) for r in got.collect()}
    assert rows == {(0, 3), (15, 2)}
    assert all(r.label == "EMAIL" for r in got.collect())
