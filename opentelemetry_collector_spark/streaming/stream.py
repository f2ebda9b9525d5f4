"""Structured Streaming variant of the pipeline.

The reference IS a streaming system: push-based consumers with
batch-timeout flushes (batch_processor.go:189-239) and at-least-once
queues. The batch pipeline in plans/pipeline.py is our primary mapping;
this module shows the same stage functions — they are pure
DataFrame→DataFrame transforms — running unchanged under ``readStream``
with:

* event-time tumbling windows + watermark for the batchprocessor-style
  accounting (the timeout flush becomes the watermark-driven state
  eviction);
* ``foreachBatch`` fan-out to per-sink tables (each micro-batch does
  exactly what plans/pipeline.run_pipeline does once — checkpointed by
  Spark's streaming offset log instead of our checkpoint table);
* ``Trigger.AvailableNow`` for incremental catch-up runs (the scraper
  controller's pull-loop analog, scraper/scraperhelper/controller.go:68-160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from opentelemetry_collector_spark.operators import enrich as enrich_ops
from opentelemetry_collector_spark.operators import parse as parse_ops
from opentelemetry_collector_spark.operators import route as route_ops
from opentelemetry_collector_spark.sources import role_lookup_df, tool_lookup_df

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), False),
        StructField("ts", TimestampType(), False),
    ]
)


def stream_transcripts(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    """File-stream source over a transcripts directory (the OTLP receiver
    analog in micro-batch form; on a real deployment this is a Kafka or
    Iceberg-incremental source with the same downstream plan)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def transform(
    stream: DataFrame, spark: SparkSession, quarantine: bool = False
) -> DataFrame:
    """parse → enrich → route, identical code to the batch plan.

    ``quarantine=True`` gives the streaming path the batch pipeline's F7
    semantics: unparseable records are NOT dropped — they route to the
    ``quarantine`` sink (permanent-error rows stay addressable,
    consumererror/permanent.go:16-32), while parseable records route
    normally. The writer just needs ``quarantine`` in its sink list."""
    parsed = parse_ops.parse_stage(stream)
    if not quarantine:
        parsed = parsed.filter(F.col("parse_ok"))
    enriched = enrich_ops.enrich_stage(
        parsed, tool_lookup_df(spark), role_lookup_df(spark)
    )
    routed = route_ops.route_stage(enriched)
    if quarantine:
        routed = routed.withColumn(
            "route",
            F.when(F.col("parse_ok"), F.col("route")).otherwise(
                F.lit("quarantine")
            ),
        )
    return routed


def windowed_accounting(routed: DataFrame, watermark: str = "2 hours",
                        window: str = "1 hour") -> DataFrame:
    """Streaming batchprocessor accounting: watermarked tumbling-window
    counts per (route, conv_id, tool). Late rows beyond the watermark
    are dropped from state — the bounded-memory analog of the batch
    processor's timeout flush."""
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            "route", "conv_id", "tool",
        )
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum(F.length("text")).alias("bytes_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "route", "conv_id", "tool", "turn_count", "bytes_sum",
        )
    )


def route_sink_writer(warehouse: str, sinks: list[str] | None = None,
                      edge_metrics: bool = True, run_id: str | None = None,
                      data_dir: str | None = None):
    """foreachBatch fan-out: per-micro-batch routed write to per-sink
    tables, landing each epoch as ``sink/epoch=N/`` with OVERWRITE
    semantics. foreachBatch may REPLAY an epoch after a failure (its
    documented at-least-once contract); a plain append would duplicate
    that epoch's rows, while the deterministic epoch-partitioned
    overwrite converges — offset log + idempotent epoch commit =
    effectively-once, the same two-phase shape as the batch
    checkpoint acks (persistent_queue.go:321-428). Readers see a plain
    partitioned table (the epoch partition column prunes like any
    other).

    The route domain is static (``sqltext.SINK_NAMES`` — the configured
    exporter set, exactly like the reference's fanout consumer is built
    from the config graph, not discovered from data), so the writer
    iterates that list: zero driver round-trips per micro-batch. The
    previous ``select("route").distinct().collect()`` added a full
    extra aggregation + driver sync to every micro-batch in the hot
    path for information the config already holds.

    ``edge_metrics``: per-(epoch, sink) item/byte counters ride each
    append via an Observation (the streaming face of the A6 obsconsumer
    edge telemetry) and are acked into the SAME CheckpointStore the
    batch pipeline uses — one driver-side JSON ack per (epoch, sink),
    no extra Spark action. ``flush_lineage(spark)`` (an attribute on
    the returned function) flattens the acks into the shared queryable
    ``lineage`` warehouse table (part_id = epoch), so streaming and
    batch A6 telemetry share one store and one query surface.

    ``data_dir`` (default: the warehouse) is where the sink tables
    land. A streaming sink MUST NOT share a table directory with flat
    batch-written parquet: Spark's partition discovery would then see
    only the ``epoch=N`` dirs and silently hide every batch row, so the
    writer REFUSES a sink root that already holds flat files — point
    ``data_dir`` somewhere else (the lineage store still shares the
    warehouse) or clear the table."""
    import os
    import time

    from pyspark.sql import Observation

    from opentelemetry_collector_spark.plans.checkpoint import (
        CheckpointStore,
        StageMetric,
    )
    from opentelemetry_collector_spark.sqltext import SINK_NAMES

    sink_list = sinks or SINK_NAMES
    ckpt = CheckpointStore(warehouse, run_id) if edge_metrics else None
    tables = data_dir or warehouse
    checked: set = set()

    def _guard_layout(sink: str) -> None:
        if sink in checked:
            return
        root = os.path.join(tables, sink)
        if os.path.isdir(root):
            foreign = [
                f for f in os.listdir(root)
                if not f.startswith("epoch=")
                and f not in ("_SUCCESS", "_temporary")
            ]
            if foreign:
                # flat batch files hide behind partition discovery;
                # other partition schemes (the batch path's part=N
                # chunk layout) collide on the partition column name
                raise ValueError(
                    f"streaming sink {root!r} already contains non-epoch "
                    f"content ({foreign[:3]}...); mixing layouts in one "
                    "table dir silently hides or breaks reads — use a "
                    "separate data_dir or clear the table first"
                )
        checked.add(sink)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            for sink in sink_list:
                _guard_layout(sink)
                branch = batch_df.filter(F.col("route") == sink)
                if edge_metrics:
                    obs = Observation(f"edge_{epoch_id}_{sink}")
                    branch = branch.observe(
                        obs,
                        F.count(F.lit(1)).alias("rows"),
                        F.coalesce(
                            F.sum(F.octet_length("text")), F.lit(0)
                        ).alias("bytes"),
                    )
                t0 = time.monotonic()
                branch.write.mode("overwrite").parquet(
                    f"{tables}/{sink}/epoch={epoch_id}"
                )
                if edge_metrics:
                    got = obs.get
                    ckpt.commit(
                        f"stream.{sink}.epoch{epoch_id:08d}",
                        StageMetric(
                            run_id=ckpt.run_id,
                            stage=f"stream.{sink}",
                            rows_in=got["rows"],
                            rows_out=got["rows"],
                            wall_ms=int((time.monotonic() - t0) * 1000),
                            extra={
                                "epoch": epoch_id,
                                "sink": sink,
                                "partitions": [{
                                    "part_id": epoch_id,
                                    "rows": got["rows"],
                                    "bytes": got["bytes"],
                                }],
                            },
                        ),
                    )
        finally:
            batch_df.unpersist()

    def flush_lineage(spark: SparkSession) -> tuple[int, int]:
        from opentelemetry_collector_spark.sinks.tables import TableCatalog

        if ckpt is None:
            return (0, 0)
        return ckpt.write_lineage_table(spark, TableCatalog(spark, warehouse))

    write_batch.ckpt = ckpt
    write_batch.flush_lineage = flush_lineage
    return write_batch


CONV_STATE_OUTPUT = (
    "conv_id string, turns_so_far bigint, bytes_so_far bigint, "
    "first_ts timestamp, last_ts timestamp"
)
CONV_STATE_SCHEMA = (
    "turns bigint, nbytes bigint, first_ts timestamp, last_ts timestamp"
)


def conversation_state_tracker(stream_df: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-conversation accumulator (turn count, byte count, first/last
    event time) that survives across micro-batches — the arbitrary-state
    analog of the batch processor's per-shard accumulation
    (processor/batchprocessor/batch_processor.go:299-366), with state
    keyed by conv_id exactly like the metadata partitioner
    (exporter/exporterhelper/internal/queuebatch/metadata_partitioner.go:14-33).

    Emits one updated snapshot row per conversation per micro-batch that
    touched it. Arrow-batched: one Python call per (key-group, batch) —
    no per-row Python.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        turns, nbytes, first_ts, last_ts = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            turns += len(pdf)
            nbytes += int(pdf["text"].str.len().sum())
            batch_min = pdf["ts"].min()
            batch_max = pdf["ts"].max()
            first_ts = batch_min if first_ts is None else min(first_ts, batch_min)
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((turns, nbytes, first_ts, last_ts))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "turns_so_far": [turns],
                "bytes_so_far": [nbytes],
                "first_ts": [first_ts],
                "last_ts": [last_ts],
            }
        )

    return (
        stream_df.groupBy("conv_id")
        .applyInPandasWithState(
            track,
            outputStructType=CONV_STATE_OUTPUT,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    spark: SparkSession,
    src_path: str,
    warehouse: str,
    checkpoint: str,
    accounting: bool = True,
):
    """One catch-up pass over everything currently in ``src_path``:
    routed sink writes + (optionally) windowed accounting to memory.
    Returns the accounting query name for inspection."""
    routed = transform(stream_transcripts(spark, src_path), spark)
    # STABLE run_id derived from the checkpoint location: a restarted
    # stream (foreachBatch's at-least-once replay) re-acks its epochs
    # under the SAME run_id, so the run_id-keyed lineage merge replaces
    # rather than double-counts (a fresh random id per restart would
    # leave the dead run's rows in the shared lineage table).
    import hashlib

    writer = route_sink_writer(
        warehouse,
        run_id="stream" + hashlib.md5(checkpoint.encode()).hexdigest()[:10],
    )
    q1 = (
        routed.writeStream.foreachBatch(writer)
        .option("checkpointLocation", f"{checkpoint}/route")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    # flatten the per-(epoch, sink) acks into the shared lineage table
    writer.flush_lineage(spark)
    if accounting:
        acc = windowed_accounting(routed)
        q2 = (
            acc.writeStream.format("memory")
            .queryName("stream_accounting")
            .outputMode("append")
            .option("checkpointLocation", f"{checkpoint}/acc")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        return "stream_accounting"
    return None
