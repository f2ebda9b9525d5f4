"""Enrichment stage — resource/attributes processor analog (SURVEY §2.2 P2/P3).

The reference attaches resource-style attributes to records
(docs/rfcs/processing.md:84-90,204-209). Spark-first expression: a
**broadcast hash join** against tiny dimension tables — no shuffle, the
dimension ships once per executor, and the probe stays inside
whole-stage codegen. At 1000 executors over 100 TB this is the only
join strategy that doesn't move the fact table.

Also provides the OTTL-style attribute mutation ops from the core RFC
(docs/rfcs/processing.md:147-216): set / delete / keep_keys /
replace_match / replace_all_matches over the ``attrs`` map column.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stage(df: DataFrame, tool_lookup: DataFrame, role_lookup: DataFrame) -> DataFrame:
    """Left-join both lookups (broadcast), add ``enrich_miss`` flag.

    Left join: a missing key yields NULL enrichment columns and
    enrich_miss=true; rows are never dropped (the processor contract —
    enrichment must not lose data).

    The broadcast hint is governed by the engine.broadcastEnrich
    feature gate (beta, default on). Disabling it drops the explicit
    hint and lets AQE/size thresholds pick the join strategy — the
    escape hatch for a lookup that outgrew executor memory.
    """
    from opentelemetry_collector_spark.plans.featuregate import (
        global_registry,
    )

    if global_registry().is_enabled("engine.broadcastEnrich"):
        tool_lookup = F.broadcast(tool_lookup)
        role_lookup = F.broadcast(role_lookup)
    out = (
        df.join(tool_lookup, "tool", "left")
        .join(role_lookup, "role", "left")
        .withColumn(
            "enrich_miss",
            F.col("tool_category").isNull() | F.col("role_kind").isNull(),
        )
    )
    return out


# --- OTTL-style attribute ops (docs/rfcs/processing.md:147-216) -------------
# Canonical implementations live in operators/attributes.py; kept here as
# aliases because enrichment configs compose them with the join.

from opentelemetry_collector_spark.operators.attributes import (  # noqa: E402
    delete_attr as attrs_delete,
    keep_keys as attrs_keep_keys,
    replace_all_matches as attrs_replace_all_matches,
    replace_match as attrs_replace_match,
    set_attr as attrs_set,
)


def attrs_from_resource(df: DataFrame, resource: Mapping[str, str], attrs_col: str = "attrs") -> DataFrame:
    """Copy fixed resource attrs onto every record (resourceprocessor
    "attach information from resource into telemetry")."""
    if not resource:
        return df
    lit_map = F.create_map(
        *[x for kv in resource.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    return df.withColumn(attrs_col, F.map_concat(F.col(attrs_col), lit_map))
