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


def test_sliding_counts_batch_equals_streaming(spark, sf_small, tmp_path):
    import shutil

    from geobuf_spark.streaming import windows as W

    # readStream's file source wants a DIRECTORY of parquet files
    d = tmp_path / "ev_stream"; d.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", d / "events.parquet")
    batch = {(r.wstart, r.event_type, r.n_events)
             for r in W.sliding_counts(spark.read.parquet(str(d))).collect()}
    stream = {(r.wstart, r.event_type, r.n_events)
              for r in W.run_stream_to_memory(
                  W.sliding_counts_streaming(spark, str(d)), "slide_out").collect()}
    assert batch == stream and len(batch) > 0


def test_watermark_drops_late_event(spark, tmp_path):
    """Append-mode + watermark must finalize a window once the watermark
    passes it, dropping a later-arriving event for that window — the one
    event-time semantic a batch plan can't show."""
    import time as _t

    from pyspark.sql import functions as F
    from geobuf_spark.streaming import windows as W

    d = str(tmp_path / "late_events")
    # batch 1: events at T and T+30min (advances watermark past T's window)
    spark.createDataFrame(
        [(1, "click", "2026-01-01 00:01:00", 0.9),
         (2, "click", "2026-01-01 00:31:00", 0.9)],
        "event_id bigint, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode("overwrite").parquet(d)

    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (stream.withWatermark("ts", "5 minutes")
           .groupBy(F.window("ts", "5 minutes"), "event_type")
           .agg(F.count("*").alias("n"))
           .select(F.unix_timestamp("window.start").cast("bigint").alias("wstart"), "n"))
    q = agg.writeStream.outputMode("append").format("memory").queryName("late_out").start()
    q.processAllAvailable()
    # batch 2: a LATE event for T's window (watermark is now ~T+25min)
    spark.createDataFrame(
        [(3, "click", "2026-01-01 00:02:00", 0.9)],
        "event_id bigint, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode("append").parquet(d)
    q.processAllAvailable()
    q.stop()
    rows = {r.wstart: r.n for r in spark.sql("SELECT * FROM late_out").collect()}
    t0 = 1767225600 + 60  # 2026-01-01 00:01 UTC epoch
    w0 = t0 // 300 * 300
    # the first window was finalized with exactly ONE event; the late
    # arrival (event 3) was dropped, not re-emitted
    assert rows.get(w0) == 1, rows


def test_stream_static_enrichment(spark, sf_small, tmp_path):
    """stream-static join: identical results batch vs micro-batched stream;
    the plan must broadcast the dimension (never shuffle the stream)."""
    import shutil

    from geobuf_spark.streaming import windows as W

    d = tmp_path / "ev_enrich"; d.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", d / "events.parquet")
    dim = spark.read.parquet(f"{sf_small}/customer.parquet")

    batch = {(r.segment, r.event_type, r.n_events)
             for r in W.enrich_events(spark.read.parquet(str(d)), dim).collect()}
    stream = {(r.segment, r.event_type, r.n_events)
              for r in W.run_stream_to_memory(
                  W.enrich_events_streaming(spark, str(d), dim), "enrich_out").collect()}
    assert batch == stream and len(batch) > 0

    plan = W.enrich_events(spark.read.parquet(str(d)), dim) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stateful_sessionize_multi_batch(spark, sf_small, tmp_path):
    """cross-micro-batch sessions: ids stay globally monotone, closed rows
    are final, the open session re-emits snapshots under a stable id —
    keep-last per (user, session_id) equals the batch result."""
    import os
    import time as _t

    ev = spark.read.parquet(f"{sf_small}/events.parquet") \
        .withColumn("ep", F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast("bigint"))
    cutoff = ev.approxQuantile("ep", [0.5], 0.0)[0]
    import glob
    import shutil as _sh

    d = tmp_path / "ev_mb"; d.mkdir()
    tmp_a, tmp_b = tmp_path / "half_a", tmp_path / "half_b"
    ev.filter(F.col("ep") <= cutoff).drop("ep").coalesce(1).write.parquet(str(tmp_a))
    ev.filter(F.col("ep") > cutoff).drop("ep").coalesce(1).write.parquet(str(tmp_b))
    # the stream dir must contain FILES (not nested datasets)
    _sh.copy(glob.glob(str(tmp_a / "part-*.parquet"))[0], d / "a.parquet")
    _sh.copy(glob.glob(str(tmp_b / "part-*.parquet"))[0], d / "b.parquet")
    # file source orders by modification time: make 'b' strictly newer
    now = _t.time()
    os.utime(d / "a.parquet", (now - 60, now - 60))
    os.utime(d / "b.parquet", (now, now))

    stream_df = W.sessionize_streaming(spark, str(d), gap_minutes=30,
                                       max_files_per_trigger=1)
    q = (stream_df.writeStream.outputMode("append").format("memory")
         .queryName("sess_mb").option("checkpointLocation", str(tmp_path / "ck2")).start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sess_mb").collect()
    # keep-last snapshot per (user, session_id)
    latest = {}
    for i, r in enumerate(rows):
        latest[(r.user_id, r.session_id)] = (i, r)
    got = {(k[0], k[1], v[1].n_events, v[1].t_start, v[1].t_end)
           for k, v in latest.items()}
    # closed rows are FINAL: once a (user, session_id) is emitted closed,
    # no later row may carry that key (the old form of this check was a
    # tautology — r4 review)
    closed = set()
    for r in rows:
        k = (r.user_id, r.session_id)
        assert k not in closed, f"closed session re-emitted: {k}"
        if not r.is_open:
            closed.add(k)
    want = {(r.user_id, r.session_id, r.n_events, r.t_start, r.t_end)
            for r in W.sessionize(
                spark.read.parquet(f"{sf_small}/events.parquet"), gap_minutes=30).collect()}
    assert got == want


def test_window_floor_semantics_pre_epoch(spark):
    """pre-1970 events land in the window starting BEFORE them (floor, not
    truncation toward zero) — batch matches F.window's assignment."""
    ev = spark.createDataFrame(
        [(1, "click", "1969-12-31 23:59:50", 0.9)],
        "event_id bigint, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = W.tumbling_counts(ev, minutes=5).collect()
    assert got[0].wstart == -300, got
    win = ev.groupBy(F.window("ts", "5 minutes")).count().collect()[0]
    assert int(win.window.start.timestamp()) == got[0].wstart
