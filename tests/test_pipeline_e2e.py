"""End-to-end pipeline: fan-out exactly-once, quarantine, checkpoint
resume with no loss / no duplication (the contract-checker scenario,
receiver/receivertest/contract_checker.go:75-120)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.pipeline import run_pipeline
from opentelemetry_collector_spark.sinks.tables import TableCatalog
from opentelemetry_collector_spark.sources import derive_transcripts
from opentelemetry_collector_spark.sqltext import SINK_NAMES


def test_fanout_exactly_once(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    res = run_pipeline(spark, sf_dir, wh)
    catalog = TableCatalog(spark, wh)

    n_input = derive_transcripts(spark, sf_dir).count()
    n_sinks = sum(res.sink_counts.values())
    # every parseable row reaches exactly one sink; quarantine keeps the rest
    assert n_sinks + res.quarantined == n_input
    assert res.quarantined == 0  # all synthetic rows parse

    # routed-row-set equality: union of sinks == routed parse output, both directions
    union = None
    for s in SINK_NAMES:
        t = catalog.read(s)
        union = t if union is None else union.unionByName(t)
    assert union.count() == n_sinks
    # (conv_id, turn_idx) unique across all sinks — no duplication
    assert union.select("conv_id", "turn_idx").distinct().count() == n_sinks

    # aggregates exist and counts reconcile per sink
    for s, n in res.sink_counts.items():
        agg = catalog.read(f"agg_{s}")
        assert agg.agg(F.sum("turn_count")).collect()[0][0] == (n or None) or n == 0


def test_resume_skips_completed_and_is_idempotent(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh2")
    # first attempt crashes after the search-sink write is acked
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, sf_dir, wh, run_id="runA", fail_after_stage="write_sink_search")

    # resume with the same run_id: completed stages skipped, rest executed
    res = run_pipeline(spark, sf_dir, wh, run_id="runA")
    assert "quarantine" in res.stages_skipped
    assert "write_sink_search" in res.stages_skipped

    # no loss, no duplication after resume
    catalog = TableCatalog(spark, wh)
    n_input = derive_transcripts(spark, sf_dir).count()
    union = None
    for s in SINK_NAMES:
        t = catalog.read(s)
        union = t if union is None else union.unionByName(t)
    assert union.count() == n_input
    assert union.select("conv_id", "turn_idx").distinct().count() == n_input


def test_turn_order_stability(spark, sf_dir):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the north rule's per-row invariant. Deterministic across runs and
    partitionings."""
    from pyspark.sql import Window

    df = derive_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ordered = df.withColumn("rn", F.row_number().over(w))
    # turn_idx is dense 0..n-1 per conversation → rn == turn_idx + 1
    assert ordered.filter(F.col("rn") != F.col("turn_idx") + 1).count() == 0

    a = df.orderBy("conv_id", "turn_idx").select("text").collect()
    b = (
        df.repartition(13, "conv_id")
        .orderBy("conv_id", "turn_idx")
        .select("text")
        .collect()
    )
    assert a == b
