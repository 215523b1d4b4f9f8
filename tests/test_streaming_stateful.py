"""Stateful streaming sessionizer (applyInPandasWithState) ≡ batch twin."""

import shutil

from pyspark.sql import functions as F

from geobuf_spark.streaming import windows as W


def test_stateful_sessionize_matches_batch(spark, sf_small, tmp_path):
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", stream_dir / "events.parquet")

    stream_df = W.sessionize_streaming(spark, str(stream_dir), gap_minutes=30)
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory").queryName("sess_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_id, r.n_events, r.t_start, r.t_end)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }

    batch = W.sessionize(
        spark.read.parquet(f"{sf_small}/events.parquet"), gap_minutes=30
    )
    want = {
        (r.user_id, r.session_id, r.n_events, r.t_start, r.t_end)
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 10
