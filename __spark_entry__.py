"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The pipeline input — the ``transcripts`` table of BASELINE.json's
input_hint — is derived deterministically from the driver's ``events``
table by a dialect-neutral SQL fragment shared verbatim between the
Spark job and the DuckDB oracle (opentelemetry_collector_spark/sqltext.py),
so every stage of parse → enrich → filter → route → aggregate gets a true
value-level oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark import sqltext
from opentelemetry_collector_spark.operators import aggregate as agg_ops
from opentelemetry_collector_spark.operators import enrich as enrich_ops
from opentelemetry_collector_spark.operators import filters as filter_ops
from opentelemetry_collector_spark.operators import parse as parse_ops
from opentelemetry_collector_spark.operators import route as route_ops
from opentelemetry_collector_spark.sources import (
    derive_transcripts,
    role_lookup_df,
    tool_lookup_df,
)

SF_SMOKE = "/root/testdata/sf0.001"

_PARSED_COLS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts", "seq", "event_kind",
    "status_code", "latency_ms", "bytes", "msg", "tool_parsed",
    "severity_num", "parse_ok",
]


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_transcripts(spark, sf_dir)


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_ops.parse_stage(_transcripts(spark, sf_dir), with_attrs=False)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse→enrich→route plan + per-sink hourly accounting."""
    parsed = parse_ops.parse_stage(derive_transcripts(spark, SF_SMOKE))
    good = parsed.filter(F.col("parse_ok"))
    enriched = enrich_ops.enrich_stage(good, tool_lookup_df(spark), role_lookup_df(spark))
    routed = route_ops.route_stage(enriched)
    return agg_ops.hourly_sink_accounting(routed).select(
        "route", "window_start", "conv_id", "tool",
        "turn_count", F.col("distinct_roles").cast("int").alias("distinct_roles"),
        "bytes_sum",
    )


# ---------------------------------------------------------------------------
# queries: Spark-side implementations (DataFrame API)
# ---------------------------------------------------------------------------

def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transcripts(spark, sf_dir)


def q_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _parsed(spark, sf_dir).select(*_PARSED_COLS)


def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = enrich_ops.enrich_stage(
        _parsed(spark, sf_dir), tool_lookup_df(spark), role_lookup_df(spark)
    )
    return df.select(
        "conv_id", "turn_idx", "tool", "role", "tool_category", "tool_owner",
        "is_privileged", "role_kind", "billing_class", "enrich_miss",
    )


def q_filter_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = filter_ops.MatchSpec(column="tool", strict=["python", "editor"])
    df = filter_ops.filter_stage(_parsed(spark, sf_dir), [spec], mode="include")
    return df.filter(F.col("parse_ok")).select(
        "conv_id", "turn_idx", "tool", "status_code", "text"
    )


def q_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = filter_ops.MatchSpec(
        column="text", regexp=["status=50[0-9] ", "latency_ms=4[0-9][0-9][0-9] "]
    )
    df = filter_ops.filter_stage(_parsed(spark, sf_dir), [spec], mode="include")
    return df.select("conv_id", "turn_idx", "text", "status_code", "latency_ms")


def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = filter_ops.sample_conversations(_transcripts(spark, sf_dir))
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def q_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = route_ops.route_stage(_parsed(spark, sf_dir))
    return df.select("conv_id", "turn_idx", "tool", "role", "route")


def q_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = route_ops.route_stage(_parsed(spark, sf_dir).filter(F.col("parse_ok")))
    return routed.groupBy("route").agg(F.count(F.lit(1)).alias("row_count"))


def q_agg_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = route_ops.route_stage(_parsed(spark, sf_dir).filter(F.col("parse_ok")))
    out = agg_ops.hourly_sink_accounting(routed)
    return out.select(
        "route", "window_start", "conv_id", "tool", "turn_count",
        F.col("distinct_roles").cast("int").alias("distinct_roles"),
        "bytes_sum",
    )


def q_severity_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_ops.severity_histogram(_parsed(spark, sf_dir))


def q_metadata_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-shard batch accounting over (role, tool) metadata keys (A2)
    return agg_ops.grouped_item_counts(_transcripts(spark, sf_dir), ["role", "tool"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": q_transcripts,
        "parse": q_parse,
        "enrich": q_enrich,
        "filter_strict": q_filter_strict,
        "filter_regex": q_filter_regex,
        "sample": q_sample,
        "route": q_route,
        "sink_counts": q_sink_counts,
        "agg_hourly": q_agg_hourly,
        "severity_hist": q_severity_hist,
        "metadata_shards": q_metadata_shards,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible; shares fragments with the Spark job)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    t = sqltext.transcripts_cte("events")
    p = sqltext.parsed_cte("events")
    parsed_cols = ", ".join(_PARSED_COLS)
    return {
        "transcripts": f"{t} SELECT * FROM transcripts",
        "parse": f"{p} SELECT {parsed_cols} FROM parsed",
        "enrich": f"""
            {p},
            tool_lookup AS ({sqltext.TOOL_LOOKUP_SQL}),
            role_lookup AS ({sqltext.ROLE_LOOKUP_SQL})
            SELECT p.conv_id, p.turn_idx, p.tool, p.role,
                   t.tool_category, t.tool_owner, t.is_privileged,
                   r.role_kind, r.billing_class,
                   (t.tool_category IS NULL OR r.role_kind IS NULL) AS enrich_miss
            FROM parsed p
            LEFT JOIN tool_lookup t ON p.tool = t.tool
            LEFT JOIN role_lookup r ON p.role = r.role
        """,
        "filter_strict": f"""
            {p} SELECT conv_id, turn_idx, tool, status_code, text
            FROM parsed WHERE tool IN ('python', 'editor') AND parse_ok
        """,
        "filter_regex": f"""
            {p} SELECT conv_id, turn_idx, text, status_code, latency_ms
            FROM parsed
            WHERE regexp_matches(text, 'status=50[0-9] ')
               OR regexp_matches(text, 'latency_ms=4[0-9][0-9][0-9] ')
        """,
        "sample": f"""
            {t} SELECT conv_id, turn_idx, role, text, tool, ts
            FROM transcripts WHERE substring(md5(conv_id), 1, 2) < '29'
        """,
        "route": f"""
            {p} SELECT conv_id, turn_idx, tool, role,
                   {sqltext.ROUTE_CASE_SQL} AS route
            FROM parsed
        """,
        "sink_counts": f"""
            {p} SELECT {sqltext.ROUTE_CASE_SQL} AS route,
                   count(*) AS row_count
            FROM parsed WHERE parse_ok GROUP BY 1
        """,
        "agg_hourly": f"""
            {p}
            SELECT {sqltext.ROUTE_CASE_SQL} AS route,
                   date_trunc('hour', ts) AS window_start,
                   conv_id, tool,
                   count(*) AS turn_count,
                   CAST(count(DISTINCT role) AS INT) AS distinct_roles,
                   CAST(sum(length(text)) AS BIGINT) AS bytes_sum
            FROM parsed WHERE parse_ok GROUP BY 1, 2, 3, 4
        """,
        "severity_hist": f"""
            {p} SELECT severity_num, count(*) AS n FROM parsed GROUP BY 1
        """,
        "metadata_shards": f"""
            {t} SELECT lower(role) AS role, lower(tool) AS tool,
                   count(*) AS item_count
            FROM transcripts GROUP BY 1, 2
        """,
    }
