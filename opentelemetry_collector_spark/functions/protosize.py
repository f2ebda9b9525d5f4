"""OTLP protobuf wire-size computation as pure column math (SURVEY §1.4
proto encoding; the byte axis of A6 accounting).

The reference sizes every LogRecord before marshal
(pdata/internal/generated_proto_logrecord.go:252-293 SizeProto;
exporterhelper's logs_sizer builds on it). The wire-format size law is
deterministic integer arithmetic — varint length + length-delimited
framing — so in Spark it is a codegen'd column expression computed at
scan speed, and the DuckDB oracle reproduces it exactly (same CASE
math). No serialization happens: this is the *sizer*, which is what the
batching/queue layers actually consume (splitting by byte budget,
queue byte accounting) — the marshal itself stays with the wire client.

Field layout mirrored (logs.proto LogRecord):
  time_unix_nano  fixed64 #1  → +9 when non-zero (tag + 8)
  severity_number varint  #2  → +1+sov(n) when non-zero
  severity_text   string  #3  → +1+sov(l)+l when non-empty
  body AnyValue{string}   #5  → nested: inner=1+sov(l)+l, +1+sov(inner)+inner
  attributes KeyValue[]   #6  → per kv: key #1 + AnyValue #2, framed
  trace_id/span_id        #9/#10 → empty ids still frame: +2 each
  event_name      string  #12 → like severity_text
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sov(n: Column) -> Column:
    """Protobuf varint byte length of a non-negative integer
    (proto.Sov). Values here are ≤ 2^35 (string lengths, enum values),
    so five tiers suffice."""
    return (
        F.when(n < (1 << 7), 1)
        .when(n < (1 << 14), 2)
        .when(n < (1 << 21), 3)
        .when(n < (1 << 28), 4)
        .otherwise(5)
    ).cast("bigint")


def _framed(l: Column) -> Column:
    """Length-delimited field with a 1-byte tag: 1 + sov(l) + l."""
    return F.lit(1).cast("bigint") + sov(l) + l


def anyvalue_string_size(l: Column) -> Column:
    """AnyValue{string_value} message size (field 1, string)."""
    return _framed(l)


def keyvalue_string_size(key_len: Column, val_len: Column) -> Column:
    """KeyValue{key, AnyValue{string}} message size."""
    inner = anyvalue_string_size(val_len)
    return _framed(key_len) + _framed(inner)


def log_record_proto_size(
    ts: Column,
    severity_num: Column,
    severity_text: Column,
    body: Column,
    event_name: Column,
    attrs: list[tuple[str, Column]] | None = None,
) -> Column:
    """Serialized LogRecord byte size (SizeProto law above). ``attrs``
    is (key, string-value column) pairs; NULL values mean attribute
    absent (contributes 0). Empty trace/span ids frame as +2 each."""
    blen = F.octet_length(body)
    n = (
        # time_unix_nano: our ts is always set → +9
        F.when(ts.isNotNull(), F.lit(9)).otherwise(F.lit(0)).cast("bigint")
        + F.when(severity_num != 0, F.lit(1).cast("bigint") + sov(severity_num))
        .otherwise(F.lit(0))
        + F.when(
            F.octet_length(severity_text) > 0, _framed(F.octet_length(severity_text))
        ).otherwise(F.lit(0))
        + _framed(anyvalue_string_size(blen))
        + F.lit(4).cast("bigint")  # empty trace_id + span_id frames
        + F.when(
            F.octet_length(event_name) > 0, _framed(F.octet_length(event_name))
        ).otherwise(F.lit(0))
    )
    for key, val in attrs or []:
        kv = keyvalue_string_size(
            F.lit(len(key.encode())).cast("bigint"), F.octet_length(val)
        )
        n = n + F.when(val.isNotNull(), _framed(kv)).otherwise(F.lit(0))
    return n


# ---------------------------------------------------------------------------
# DuckDB oracle twins (same CASE math, SQL text)
# ---------------------------------------------------------------------------

def sov_sql(n: str) -> str:
    return (
        f"(CASE WHEN {n} < 128 THEN 1 WHEN {n} < 16384 THEN 2 "
        f"WHEN {n} < 2097152 THEN 3 WHEN {n} < 268435456 THEN 4 ELSE 5 END)"
    )


def framed_sql(l: str) -> str:
    return f"(1 + {sov_sql(l)} + {l})"


def attr_framed_sql(key_len: int, val_sql: str) -> str:
    """SQL for one optional string attribute's framed KeyValue size."""
    inner = framed_sql(f"strlen({val_sql})")
    kv = f"({framed_sql(str(key_len))} + {framed_sql(inner)})"
    return f"(CASE WHEN {val_sql} IS NOT NULL THEN {framed_sql(kv)} ELSE 0 END)"


def log_record_proto_size_sql(
    sev_text_sql: str, attrs: list[tuple[int, str]]
) -> str:
    """DuckDB twin of log_record_proto_size over the ``parsed`` CTE
    columns (ts, severity_num, text, event_kind). ``attrs`` is
    (key_byte_len, value_sql) pairs."""
    parts = [
        "9",  # ts always set
        f"(CASE WHEN severity_num != 0 THEN 1 + {sov_sql('severity_num')} ELSE 0 END)",
        f"(CASE WHEN strlen({sev_text_sql}) > 0 "
        f"THEN {framed_sql(f'strlen({sev_text_sql})')} ELSE 0 END)",
        framed_sql(framed_sql("strlen(text)")),
        "4",  # empty trace_id + span_id frames
        f"(CASE WHEN strlen(event_kind) > 0 "
        f"THEN {framed_sql('strlen(event_kind)')} ELSE 0 END)",
    ]
    parts += [attr_framed_sql(kl, vs) for kl, vs in attrs]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
