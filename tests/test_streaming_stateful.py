"""Custom stateful operator (applyInPandasWithState): running tallies that
accumulate across micro-batches."""

import time

import pytest

from nativeextractor_spark.miners import EmailMiner, GlobMiner
from nativeextractor_spark.streaming import mine_stream
from nativeextractor_spark.streaming.stateful import running_mention_counts


def test_state_accumulates_across_microbatches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("st_src"))
    out = str(tmp_path_factory.mktemp("st_out")) + "/counts"
    ck = str(tmp_path_factory.mktemp("st_ck"))

    def write_batch(rows, mode):
        spark.createDataFrame(rows, "url string, text string").coalesce(1).write.mode(
            mode
        ).parquet(src)

    write_batch([("u1", "ping a@b.example now"), ("u2", "abc abc")], "overwrite")

    def run_once():
        stream = spark.readStream.schema("url string, text string").parquet(src)
        occ = mine_stream(stream, [EmailMiner(), GlobMiner("abc")])

        def sink(batch_df, batch_id):  # parquet can't take update mode directly
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(out)

        q = (
            running_mention_counts(occ)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = {
        (r.label, r.surface): r.total_mentions
        for r in spark.read.parquet(out).collect()
    }
    assert first[("Glob", "abc")] == 2
    assert first[("EMAIL", "a@b.example")] == 1

    # second micro-batch: same surfaces again → state must ACCUMULATE
    write_batch([("u3", "abc once more abc abc")], "append")
    run_once()
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        key = (r.label, r.surface)
        latest[key] = max(latest.get(key, 0), r.total_mentions)
    assert latest[("Glob", "abc")] == 5  # 2 + 3, carried by state
    assert latest[("EMAIL", "a@b.example")] == 1


def test_rejects_batch_df(spark):
    df = spark.createDataFrame([("EMAIL", "x")], "label string, str string")
    with pytest.raises(ValueError):
        running_mention_counts(df)
