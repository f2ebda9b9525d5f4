"""The Arrow-vectorized grok engine must be column-identical to the
native regex projection, and its plan must use Arrow batches (MapInPandas
/ ArrowEvalPython), never row-at-a-time Python."""

from __future__ import annotations

from opentelemetry_collector_spark.operators import parse as parse_ops
from opentelemetry_collector_spark.plans import partitioning as part
from opentelemetry_collector_spark.sources import derive_transcripts


def test_arrow_parse_equals_native(spark, sf_dir):
    t = derive_transcripts(spark, sf_dir)
    native = parse_ops.parse_stage(t, with_attrs=False)
    arrow = parse_ops.parse_stage_arrow(t)
    assert native.columns == arrow.columns
    assert native.schema == arrow.schema
    a = native.exceptAll(arrow).count()
    b = arrow.exceptAll(native).count()
    assert a == 0 and b == 0


def test_arrow_parse_plan_is_arrow_batched(spark, sf_dir):
    arrow = parse_ops.parse_stage_arrow(derive_transcripts(spark, sf_dir))
    plan = part.physical_plan(arrow)
    assert "MapInPandas" in plan
    part.assert_no_rowwise_python(arrow)
