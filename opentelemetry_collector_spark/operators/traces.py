"""Traces signal — spans derived from conversation turns (SURVEY §2
signal breadth; pdata/ptrace models the type, opentelemetry-proto
trace/v1 defines Span).

The transcripts payload has no native spans, but a conversation IS a
trace: each turn is a span of work (latency_ms long), the conversation
is the trace, and turn order is the parent chain — the correlation
model the reference's trace signal carries. Deriving spans this way
gives the engine a real ptrace-shaped surface (trace_id/span_id/
parent_span_id/kind/status/start/end) that downstream trace tooling
can consume, with IDs deterministic from (conv_id, turn_idx) so both
engines derive identical bytes.

Shape: pure column math — md5-based IDs, epoch arithmetic, CASE maps.
No shuffle, no Python; scan speed at 100 TB.

Span field semantics (trace/v1/trace.proto):
  trace_id        16 bytes — md5(conv_id)
  span_id          8 bytes — first half of md5(conv_id ':' turn_idx)
  parent_span_id   8 bytes — previous turn's span_id; absent for turn 0
                   (the root span, like a server entry point)
  kind             SERVER(2) for the root turn, INTERNAL(1) otherwise
  start/end        ts and ts + latency_ms (0 when latency is absent:
                   an instantaneous event-like span)
  status.code      ERROR(2) for severity >= 17, UNSET(0) otherwise
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPAN_KIND_INTERNAL = 1
SPAN_KIND_SERVER = 2
STATUS_UNSET = 0
STATUS_ERROR = 2


def span_id_expr(conv_id: Column, turn_idx: Column) -> Column:
    """8-byte span id as 16 hex chars, deterministic from the turn
    coordinate (shared with the DuckDB oracle text)."""
    return F.substring(
        F.md5(F.concat_ws(":", conv_id, turn_idx.cast("string"))), 1, 16
    )


def derive_spans(parsed: DataFrame) -> DataFrame:
    """Parsed turns → one span per turn (columns above, IDs hex)."""
    start_ns = F.unix_timestamp("ts").cast("bigint") * F.lit(1_000_000_000)
    # floor+cast in BOTH engines: a bare double->int cast truncates in
    # Spark but rounds in DuckDB
    dur_ns = F.floor(
        F.coalesce(F.col("latency_ms"), F.lit(0.0)) * F.lit(1_000_000.0)
    ).cast("bigint")
    return parsed.select(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.md5(F.col("conv_id")).alias("trace_id"),
        span_id_expr(F.col("conv_id"), F.col("turn_idx")).alias("span_id"),
        F.when(
            F.col("turn_idx") > 0,
            span_id_expr(F.col("conv_id"), F.col("turn_idx") - 1),
        ).alias("parent_span_id"),
        F.coalesce(F.col("tool_parsed"), F.lit("none")).alias("name"),
        F.when(F.col("turn_idx") == 0, F.lit(SPAN_KIND_SERVER))
        .otherwise(F.lit(SPAN_KIND_INTERNAL))
        .alias("kind"),
        start_ns.alias("start_unix_nano"),
        (start_ns + dur_ns).alias("end_unix_nano"),
        F.when(F.col("severity_num") >= 17, F.lit(STATUS_ERROR))
        .otherwise(F.lit(STATUS_UNSET))
        .alias("status_code"),
    )


def spans_oracle_sql(parsed_cte: str) -> str:
    """DuckDB twin over a WITH chain ending in ``parsed`` (same
    derivation, same hex IDs, shared by the `spans` driver query)."""
    sid = "substring(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 1, 16)"
    psid = (
        "substring(md5(conv_id || ':' || CAST(turn_idx - 1 AS VARCHAR)), 1, 16)"
    )
    return f"""
        {parsed_cte}
        SELECT conv_id, turn_idx,
               md5(conv_id) AS trace_id,
               {sid} AS span_id,
               CASE WHEN turn_idx > 0 THEN {psid} END AS parent_span_id,
               COALESCE(tool_parsed, 'none') AS name,
               CASE WHEN turn_idx = 0 THEN {SPAN_KIND_SERVER}
                    ELSE {SPAN_KIND_INTERNAL} END AS kind,
               CAST(floor(epoch(ts)) AS BIGINT) * 1000000000 AS start_unix_nano,
               CAST(floor(epoch(ts)) AS BIGINT) * 1000000000
                 + CAST(floor(COALESCE(latency_ms, 0) * 1000000.0) AS BIGINT)
                 AS end_unix_nano,
               CASE WHEN severity_num >= 17 THEN {STATUS_ERROR}
                    ELSE {STATUS_UNSET} END AS status_code
        FROM parsed
    """
