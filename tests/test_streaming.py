"""Streaming variant: same stages under readStream; counts match batch;
watermarked accounting materializes; no loss/dup across the fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources import derive_transcripts
from opentelemetry_collector_spark.sqltext import SINK_NAMES
from opentelemetry_collector_spark.streaming import stream as ss


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    batch = derive_transcripts(spark, sf_dir)
    batch.repartition(4).write.parquet(src)
    n_input = batch.count()

    qname = ss.run_available_now(spark, src, wh, ckpt)

    # fan-out exactly-once across sink tables
    total = 0
    for s in SINK_NAMES:
        try:
            t = spark.read.parquet(f"{wh}/{s}")
        except Exception:
            continue
        total += t.count()
    assert total == n_input

    # windowed accounting emits exactly the windows past the final
    # watermark (max event time - 2h); later windows are withheld as
    # potentially-late state — the streaming contract, not loss.
    acc = spark.sql(f"SELECT * FROM {qname}")
    assert {"window_start", "window_end", "route", "conv_id"} <= set(acc.columns)
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    expected = (
        batch.filter(
            F.window("ts", "1 hour")["end"]
            <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        ).count()
    )
    assert acc.agg(F.sum("turn_count")).collect()[0][0] == expected
    assert expected >= n_input * 0.9  # sanity: the horizon is small


def test_streaming_is_incremental(spark, sf_dir, tmp_path):
    """Second AvailableNow run with the same checkpoint reprocesses
    nothing (the persistent-queue resume semantics via offset log)."""
    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    batch = derive_transcripts(spark, sf_dir).limit(200)
    batch.write.parquet(src)
    ss.run_available_now(spark, src, wh, ckpt, accounting=False)
    ss.run_available_now(spark, src, wh, ckpt, accounting=False)  # no-op
    total = 0
    for s in SINK_NAMES:
        try:
            total += spark.read.parquet(f"{wh}/{s}").count()
        except Exception:
            pass
    assert total == 200  # not 400 — nothing was re-read


def test_stateful_conversation_tracker(spark, sf_dir, tmp_path):
    """applyInPandasWithState: state accumulates ACROSS micro-batches —
    the final snapshot per conversation equals the batch ground truth."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    batch = derive_transcripts(spark, sf_dir)
    # several files + maxFilesPerTrigger=1 → guaranteed multiple
    # micro-batches touching the same conversations
    batch.repartition(4).write.parquet(src)

    stream = ss.stream_transcripts(spark, src, max_files=1)
    tracked = ss.conversation_state_tracker(stream)
    q = (
        tracked.writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    snap = spark.sql(
        "SELECT conv_id, max(turns_so_far) AS turns, max(bytes_so_far) AS nbytes "
        "FROM conv_state GROUP BY conv_id"
    )
    truth = batch.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum(F.length("text")).alias("nbytes"),
    )
    diff = snap.exceptAll(truth).count() + truth.exceptAll(snap).count()
    assert diff == 0
    # multiple micro-batches really happened (state crossed batches)
    n_updates = spark.sql("SELECT count(*) FROM conv_state").collect()[0][0]
    assert n_updates > truth.count()


def test_streaming_edge_metrics_in_lineage_table(spark, sf_dir, tmp_path):
    """Per-(epoch, sink) item/byte counters ride the appends via
    Observation and land in the SAME queryable ``lineage`` warehouse
    table the batch pipeline writes (stage = stream.<sink>, part_id =
    epoch) — one A6 store for both execution modes. The table must
    reconcile with what actually reached the sink tables."""
    import os

    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.sources import derive_transcripts
    from opentelemetry_collector_spark.streaming import stream as ss

    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    derive_transcripts(spark, sf_dir).write.mode("overwrite").parquet(src)
    routed = ss.transform(ss.stream_transcripts(spark, src, max_files=4), spark)
    writer = ss.route_sink_writer(wh)
    q = (
        routed.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_lineage, _ = writer.flush_lineage(spark)
    assert n_lineage > 0

    lin = spark.read.parquet(os.path.join(wh, "lineage")).filter(
        F.col("stage").startswith("stream.")
    )
    rows = lin.collect()
    assert len({r["part_id"] for r in rows}) >= 1  # part_id carries epoch
    assert all(r["bytes"] >= 0 for r in rows)
    per_sink = {}
    for r in rows:
        sink = r["stage"].removeprefix("stream.")
        per_sink[sink] = per_sink.get(sink, 0) + r["rows"]
    for sink, n in per_sink.items():
        if n:
            got = spark.read.parquet(os.path.join(wh, sink)).count()
            assert got == n, (sink, got, n)
    assert sum(per_sink.values()) == derive_transcripts(spark, sf_dir).count()


def test_streaming_quarantine_route(spark, sf_dir, tmp_path):
    """F7 in streaming mode: unparseable records route to the
    quarantine sink instead of being dropped — no record lost."""
    import os

    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.sources import derive_transcripts
    from opentelemetry_collector_spark.streaming import stream as ss

    src = str(tmp_path / "srcq")
    wh = str(tmp_path / "whq")
    base = derive_transcripts(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("turn_idx") % 13 == 0,
            F.regexp_replace("text", r"^\[seq=[0-9]+\] ", ""),
        ).otherwise(F.col("text")),
    )
    base.write.mode("overwrite").parquet(src)
    n_total = base.count()

    routed = ss.transform(
        ss.stream_transcripts(spark, src, max_files=8), spark, quarantine=True
    )
    from opentelemetry_collector_spark.sqltext import SINK_NAMES

    writer = ss.route_sink_writer(wh, sinks=SINK_NAMES + ["quarantine"])
    q = (
        routed.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckptq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    quarantined = spark.read.parquet(os.path.join(wh, "quarantine")).count()
    assert quarantined == base.filter(F.col("turn_idx") % 13 == 0).count()
    total_out = sum(
        spark.read.parquet(os.path.join(wh, s)).count()
        for s in SINK_NAMES + ["quarantine"]
    )
    assert total_out == n_total  # nothing dropped


def test_epoch_replay_does_not_duplicate(spark, sf_dir, tmp_path):
    """foreachBatch may replay an epoch after a failure (its
    at-least-once contract): calling the writer twice with the same
    epoch id must leave each sink with exactly one copy of that epoch's
    rows (deterministic epoch-partitioned overwrite), and the lineage
    acks must not double-count."""
    import os

    from opentelemetry_collector_spark.operators import parse as parse_ops
    from opentelemetry_collector_spark.operators import route as route_ops
    from opentelemetry_collector_spark.sources import derive_transcripts
    from opentelemetry_collector_spark.streaming import stream as ss

    wh = str(tmp_path / "whr")
    batch = route_ops.route_stage(
        parse_ops.parse_stage(derive_transcripts(spark, sf_dir))
        .filter(F.col("parse_ok"))
    ).limit(500)
    writer = ss.route_sink_writer(wh)
    writer(batch, 7)
    writer(batch, 7)  # replayed epoch — must converge, not append
    n_lineage, _ = writer.flush_lineage(spark)

    total = sum(
        spark.read.parquet(os.path.join(wh, s)).count()
        for s in SINK_NAMES
        if os.path.isdir(os.path.join(wh, s))
    )
    assert total == batch.count()
    lin = spark.read.parquet(os.path.join(wh, "lineage"))
    assert lin.agg(F.sum("rows")).collect()[0][0] == batch.count()


def test_streaming_refuses_flat_batch_sink_dirs(spark, sf_dir, tmp_path):
    """Epoch-partitioned streaming writes into a table that already
    holds flat batch parquet would silently HIDE the batch rows on read
    (partition discovery sees only epoch dirs) — the writer must refuse
    instead."""
    import pytest

    from opentelemetry_collector_spark.operators import parse as parse_ops
    from opentelemetry_collector_spark.operators import route as route_ops
    from opentelemetry_collector_spark.plans.pipeline import run_pipeline
    from opentelemetry_collector_spark.sources import derive_transcripts
    from opentelemetry_collector_spark.streaming import stream as ss

    wh = str(tmp_path / "whmix")
    run_pipeline(spark, sf_dir, wh)  # flat batch sink tables
    batch = route_ops.route_stage(
        parse_ops.parse_stage(derive_transcripts(spark, sf_dir))
        .filter(F.col("parse_ok"))
    ).limit(50)
    writer = ss.route_sink_writer(wh)
    with pytest.raises(ValueError, match="flat"):
        writer(batch, 0)
