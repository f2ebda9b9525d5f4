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


def derive_span_events(parsed: DataFrame) -> DataFrame:
    """Span events — the time-stamped annotations a reference Span
    carries (pdata/ptrace/generated_spanevent.go:14-35; Span.Events at
    generated_span.go:161-168). The transcript turns yield three
    deterministic event kinds per span:

    * ``tool.call`` at span start for call turns (the tool dispatch),
      value attribute = the tool name;
    * ``tool.result`` at span end for result turns (the payload
      arrival), value attribute = the byte count;
    * ``exception`` at span end for error turns (severity >= 17) —
      the OTel exception-event convention, value = status code.

    One row per event (a span can carry several), flat scalar columns
    so the row set is oracle-hashable. Pure column math + one explode:
    scan speed, no shuffle."""
    start_ns = F.unix_timestamp("ts").cast("bigint") * F.lit(1_000_000_000)
    dur_ns = F.floor(
        F.coalesce(F.col("latency_ms"), F.lit(0.0)) * F.lit(1_000_000.0)
    ).cast("bigint")
    end_ns = start_ns + dur_ns
    ev = F.array_compact(
        F.array(
            F.when(
                F.col("tool_parsed").isNotNull(),
                F.struct(
                    F.lit("tool.call").alias("event_name"),
                    start_ns.alias("time_unix_nano"),
                    F.col("tool_parsed").alias("value"),
                ),
            ),
            F.when(
                F.col("bytes").isNotNull(),
                F.struct(
                    F.lit("tool.result").alias("event_name"),
                    end_ns.alias("time_unix_nano"),
                    F.col("bytes").cast("string").alias("value"),
                ),
            ),
            F.when(
                F.col("severity_num") >= 17,
                F.struct(
                    F.lit("exception").alias("event_name"),
                    end_ns.alias("time_unix_nano"),
                    F.coalesce(
                        F.col("status_code").cast("string"), F.lit("")
                    ).alias("value"),
                ),
            ),
        )
    )
    return (
        parsed.select(
            "conv_id",
            "turn_idx",
            span_id_expr(F.col("conv_id"), F.col("turn_idx")).alias("span_id"),
            F.explode(ev).alias("e"),
        )
        .select(
            "conv_id", "turn_idx", "span_id",
            F.col("e.event_name").alias("event_name"),
            F.col("e.time_unix_nano").alias("time_unix_nano"),
            F.col("e.value").alias("value"),
        )
    )


def derive_span_links(parsed: DataFrame) -> DataFrame:
    """Span links — cross-span references (generated_spanlink.go:54-86;
    Span.Links at generated_span.go:178). Each RESULT turn links back
    to the most recent CALL turn in the conversation (the request it
    answers) — the call/response correlation the reference models as a
    link rather than a parent edge (the parent chain is strict turn
    order). The linked span id resolves with one ignore-nulls running
    ``last`` window per conversation — per-stream state stays in its
    conversation partition at any scale."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_call = F.last(
        F.when(F.col("event_kind") == "call", F.col("turn_idx")),
        ignorenulls=True,
    ).over(w)
    return (
        parsed.withColumn("_link_turn", last_call)
        .filter(
            (F.col("event_kind") == "result") & F.col("_link_turn").isNotNull()
        )
        .select(
            "conv_id",
            "turn_idx",
            span_id_expr(F.col("conv_id"), F.col("turn_idx")).alias("span_id"),
            F.md5(F.col("conv_id")).alias("link_trace_id"),
            span_id_expr(F.col("conv_id"), F.col("_link_turn"))
            .alias("link_span_id"),
            F.col("_link_turn").alias("link_turn_idx"),
            F.lit("tool.request").alias("link_type"),
        )
    )


def span_events_oracle_sql(parsed_cte: str) -> str:
    """DuckDB twin of :func:`derive_span_events` (same three event
    derivations, same hex span ids, UNION ALL instead of explode)."""
    sid = "substring(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 1, 16)"
    start = "CAST(floor(epoch(ts)) AS BIGINT) * 1000000000"
    end = (
        f"{start} + CAST(floor(COALESCE(latency_ms, 0) * 1000000.0) AS BIGINT)"
    )
    return f"""
        {parsed_cte}
        SELECT conv_id, turn_idx, {sid} AS span_id,
               'tool.call' AS event_name,
               {start} AS time_unix_nano,
               tool_parsed AS value
        FROM parsed WHERE tool_parsed IS NOT NULL
        UNION ALL
        SELECT conv_id, turn_idx, {sid} AS span_id,
               'tool.result' AS event_name,
               {end} AS time_unix_nano,
               CAST(bytes AS VARCHAR) AS value
        FROM parsed WHERE bytes IS NOT NULL
        UNION ALL
        SELECT conv_id, turn_idx, {sid} AS span_id,
               'exception' AS event_name,
               {end} AS time_unix_nano,
               COALESCE(CAST(status_code AS VARCHAR), '') AS value
        FROM parsed WHERE severity_num >= 17
    """


def span_links_oracle_sql(parsed_cte: str) -> str:
    """DuckDB twin of :func:`derive_span_links` (ignore-nulls running
    last over the conversation stream)."""
    sid = "substring(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 1, 16)"
    lsid = (
        "substring(md5(conv_id || ':' || CAST(_link_turn AS VARCHAR)), 1, 16)"
    )
    return f"""
        {parsed_cte},
        lk AS (
          SELECT conv_id, turn_idx, event_kind,
                 last_value(CASE WHEN event_kind = 'call' THEN turn_idx END
                            IGNORE NULLS) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS _link_turn
          FROM parsed
        )
        SELECT conv_id, turn_idx, {sid} AS span_id,
               md5(conv_id) AS link_trace_id,
               {lsid} AS link_span_id,
               _link_turn AS link_turn_idx,
               'tool.request' AS link_type
        FROM lk
        WHERE event_kind = 'result' AND _link_turn IS NOT NULL
    """


def spans_events_links_oracle_sql(parsed_cte: str) -> str:
    """DuckDB twin for the envelope round trip WITH embedded
    events/links: the flat span derivation plus per-span event/link
    COUNTS computed directly (events: one per present tool/bytes/error
    signal; links: one when a result turn has a prior call), and
    roundtrip_ok=TRUE — what decode(encode(spans+events+links)) must
    reproduce."""
    sid = "substring(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 1, 16)"
    psid = (
        "substring(md5(conv_id || ':' || CAST(turn_idx - 1 AS VARCHAR)), 1, 16)"
    )
    return f"""
        {parsed_cte},
        withlink AS (
          SELECT *,
                 last_value(CASE WHEN event_kind = 'call' THEN turn_idx END
                            IGNORE NULLS) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS _link_turn
          FROM parsed
        )
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
                    ELSE {STATUS_UNSET} END AS status_code,
               CAST(tool_parsed IS NOT NULL AS INT)
                 + CAST(bytes IS NOT NULL AS INT)
                 + CAST(severity_num >= 17 AS INT) AS n_events,
               CAST(event_kind = 'result' AND _link_turn IS NOT NULL AS INT)
                 AS n_links,
               TRUE AS roundtrip_ok
        FROM withlink
    """
