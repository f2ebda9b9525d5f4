"""Pipeline spec validation — the graph-build rules
(service/pipelines/config.go:25-64, graph.go:213-248)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans.pipeline import Pipeline


def _src(spark):
    return spark.range(1)


def test_requires_source_and_sinks():
    with pytest.raises(ValueError, match="missing sinks"):
        Pipeline(name="p", source=_src, sinks=[]).validate()
    with pytest.raises(ValueError, match="missing source"):
        Pipeline(name="p", source=None, sinks=["s"]).validate()


def test_duplicate_stage_names_rejected():
    p = Pipeline(
        name="p", source=_src,
        stages=[("a", lambda d: d), ("a", lambda d: d)],
        sinks=["s"],
    )
    with pytest.raises(ValueError, match="duplicate stage names"):
        p.validate()


def test_duplicate_sinks_rejected():
    # R5: one physical table per sink id — routes targeting the same
    # table must union, not double-write
    p = Pipeline(name="p", source=_src, sinks=["s", "s"])
    with pytest.raises(ValueError, match="duplicate sinks"):
        p.validate()


def test_plan_composes_stages(spark):
    p = Pipeline(
        name="p",
        source=lambda s: s.range(10),
        stages=[("double", lambda d: d.selectExpr("id * 2 AS id")),
                ("filter", lambda d: d.filter("id >= 10"))],
        sinks=["s"],
    )
    assert p.plan(spark).count() == 5
