"""Per-partition lineage + bytes accounting and partition-granular
resume (SURVEY §2.4 A6, the north rule's checkpoint-table contract;
bytes axis mirrors sizer/logs_sizer.go:29-49, resume granularity
mirrors persistent_queue.go:321-428 per-item acks).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans import lineage as lineage_ops
from opentelemetry_collector_spark.plans.pipeline import run_pipeline
from opentelemetry_collector_spark.sinks.tables import TableCatalog
from opentelemetry_collector_spark.sources import derive_transcripts
from opentelemetry_collector_spark.sqltext import SINK_NAMES


def test_lineage_table_reconciles_with_sinks(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    res = run_pipeline(spark, sf_dir, wh)
    catalog = TableCatalog(spark, wh)

    lin = catalog.read("lineage")
    # per-partition rows of each write stage sum to that sink's count
    per_stage = {
        r["stage"]: r["n"]
        for r in lin.groupBy("stage").agg(F.sum("rows").alias("n")).collect()
    }
    for s, n in res.sink_counts.items():
        assert per_stage.get(f"write_{s}", 0) == n
    # bytes are real payload bytes, non-zero wherever rows are
    assert lin.filter((F.col("rows") > 0) & (F.col("bytes") <= 0)).count() == 0
    # the partition axis is populated (the whole point vs per-stage-only)
    assert lin.select("part_id").distinct().count() > 1

    # physical file stats reconcile too: footer rows per stage == sink rows
    fs = catalog.read("file_stats")
    file_per_stage = {
        r["stage"]: r["n"]
        for r in fs.groupBy("stage").agg(F.sum("rows").alias("n")).collect()
    }
    for s, n in res.sink_counts.items():
        assert file_per_stage.get(f"write_{s}", 0) == n
    assert fs.filter(F.col("bytes") <= 0).count() == 0


def test_logical_lineage_matches_file_truth_when_partition_aligned(spark, tmp_path):
    """When the write is laid out by the same deterministic partitioner,
    logical lineage (groupBy) and physical lineage (parquet footers)
    agree row-for-row — the two views of A6 are the same truth."""
    df = spark.range(500).select(
        F.concat(F.lit("c"), (F.col("id") % 61).cast("string")).alias("conv_id"),
        F.col("id").cast("string").alias("text"),
    )
    n = 8
    out = str(tmp_path / "aligned")
    (
        df.withColumn("part_id", lineage_ops.det_partition_id(F.col("conv_id"), n))
        .write.partitionBy("part_id").parquet(out)
    )
    logical = {
        r["part_id"]: r["rows"]
        for r in lineage_ops.logical_lineage(df, keys=[], n=n).collect()
    }
    physical: dict[int, int] = {}
    for fr in lineage_ops.file_lineage(out):
        pid = int(fr["file"].split("part_id=")[1].split("/")[0])
        physical[pid] = physical.get(pid, 0) + fr["rows"]
    assert logical == physical


def test_chunked_write_partition_granular_resume(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh3")
    with pytest.raises(RuntimeError, match="chunk"):
        run_pipeline(
            spark, sf_dir, wh, run_id="runC", sink_chunks=3,
            fail_after_stage="write_sink_search.chunk001",
        )

    res = run_pipeline(spark, sf_dir, wh, run_id="runC", sink_chunks=3)
    # partition-granular skip: the two acked chunks of the interrupted
    # stage are NOT rewritten; only chunk002 (and later stages) run
    assert "write_sink_search.chunk000" in res.stages_skipped
    assert "write_sink_search.chunk001" in res.stages_skipped
    assert "write_sink_search.chunk002" not in res.stages_skipped

    # no loss, no duplication across the chunked layout
    catalog = TableCatalog(spark, wh)
    n_input = derive_transcripts(spark, sf_dir).count()
    union = None
    for s in SINK_NAMES:
        t = catalog.read(s).drop("part")
        union = t if union is None else union.unionByName(t)
    assert union.count() == n_input
    assert union.select("conv_id", "turn_idx").distinct().count() == n_input


def test_chunked_write_clears_stale_parts(spark, sf_dir, tmp_path):
    """Re-running the same warehouse with fewer sink_chunks — or after a
    non-chunked run that wrote flat files — must not leave stale part
    dirs that read back as duplicate rows."""
    import os

    wh = str(tmp_path / "wh5")
    catalog = TableCatalog(spark, wh)
    n_input = derive_transcripts(spark, sf_dir).count()

    run_pipeline(spark, sf_dir, wh, run_id="runA")  # flat files
    run_pipeline(spark, sf_dir, wh, run_id="runB", sink_chunks=3)
    run_pipeline(spark, sf_dir, wh, run_id="runD", sink_chunks=2)

    for s in SINK_NAMES:
        parts = sorted(
            d for d in os.listdir(catalog.path(s)) if d.startswith("part=")
        )
        assert parts == ["part=0", "part=1"], s
        assert not any(
            f.endswith(".parquet") for f in os.listdir(catalog.path(s))
        ), f"{s}: stale flat files at table root"
    union = None
    for s in SINK_NAMES:
        t = catalog.read(s).drop("part")
        union = t if union is None else union.unionByName(t)
    assert union.count() == n_input


def test_send_batch_max_size_bounds_files(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh4")
    run_pipeline(spark, sf_dir, wh, send_batch_max_size=100)
    catalog = TableCatalog(spark, wh)
    for s in SINK_NAMES:
        stats = lineage_ops.file_lineage(catalog.path(s))
        assert stats, s
        assert max(fr["rows"] for fr in stats) <= 100, s


def test_chunked_resume_with_different_sink_chunks_refused(spark, sf_dir, tmp_path):
    """Resuming a run whose chunks were acked under a different
    sink_chunks must be refused: the acked data was hashed with the old
    modulus, so mixing moduli silently duplicates and drops rows."""
    wh = str(tmp_path / "wh6")
    with pytest.raises(RuntimeError, match="chunk"):
        run_pipeline(
            spark, sf_dir, wh, run_id="runE", sink_chunks=4,
            fail_after_stage="write_sink_search.chunk001",
        )
    with pytest.raises(ValueError, match="acked chunks under"):
        run_pipeline(spark, sf_dir, wh, run_id="runE", sink_chunks=2)
    # same value resumes fine
    res = run_pipeline(spark, sf_dir, wh, run_id="runE", sink_chunks=4)
    assert "write_sink_search.chunk001" in res.stages_skipped


def test_batch_and_stream_lineage_share_one_table(spark, sf_dir, tmp_path):
    """A streaming run flushing lineage into a warehouse where a batch
    run already committed must MERGE (run_id-keyed replace), not clobber
    — one A6 store for both modes, each run owning its rows."""
    import os

    from opentelemetry_collector_spark.streaming import stream as ss

    wh = str(tmp_path / "wh7")
    res = run_pipeline(spark, sf_dir, wh, run_id="batchrun")
    src = str(tmp_path / "src7")
    derive_transcripts(spark, sf_dir).write.mode("overwrite").parquet(src)
    routed = ss.transform(ss.stream_transcripts(spark, src, max_files=8), spark)
    # shared warehouse = shared lineage store; sink DATA goes to its own
    # dir (epoch-partitioned streaming tables must not nest inside the
    # batch-written flat tables — the writer refuses that)
    writer = ss.route_sink_writer(
        wh, run_id="streamrun", data_dir=str(tmp_path / "stream_sinks")
    )
    q = (
        routed.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt7"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    writer.flush_lineage(spark)

    lin = spark.read.parquet(os.path.join(wh, "lineage"))
    runs = {r["run_id"] for r in lin.select("run_id").distinct().collect()}
    assert {"batchrun", "streamrun"} <= runs  # both survive
    batch_rows = lin.filter(
        (F.col("run_id") == "batchrun") & F.col("stage").startswith("write_")
    ).agg(F.sum("rows")).collect()[0][0]
    assert batch_rows == sum(res.sink_counts.values())
    # re-flushing the stream run is idempotent (replaces its own rows)
    writer.flush_lineage(spark)
    lin2 = spark.read.parquet(os.path.join(wh, "lineage"))
    assert lin2.count() == lin.count()
