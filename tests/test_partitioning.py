"""Plan hygiene + skew: broadcast enrich, no row-wise Python, filter
pushdown, salted aggregation equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import enrich as enrich_ops
from opentelemetry_collector_spark.operators import parse as parse_ops
from opentelemetry_collector_spark.plans import partitioning as part
from opentelemetry_collector_spark.sources import (
    derive_transcripts,
    role_lookup_df,
    synth_transcripts,
    tool_lookup_df,
)


def test_enrich_is_broadcast_and_python_free(spark, sf_dir):
    df = enrich_ops.enrich_stage(
        parse_ops.parse_stage(derive_transcripts(spark, sf_dir)),
        tool_lookup_df(spark),
        role_lookup_df(spark),
    )
    part.assert_broadcast_join(df, expected=2)
    part.assert_no_rowwise_python(df)


def test_filter_pushdown_to_parquet(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = ev.filter(F.col("event_type") == "error").select("event_id", "event_type")
    part.assert_filter_pushed(df, "event_type")
    # column pruning: scan schema must not include unused columns
    plan = part.formatted_plan(df)
    assert "props" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_salted_count_equals_plain_count(spark):
    df = synth_transcripts(
        spark, n_conversations=50, mean_turns=6, hot_conversations=2, hot_turns=500
    )
    plain = {r["conv_id"]: r["c"] for r in df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    salted = {r["conv_id"]: r["turn_count"] for r in part.salted_group_count(df).collect()}
    assert plain == salted
    # the hot conversations really are hot (skew fixture sanity)
    assert max(plain.values()) >= 500
