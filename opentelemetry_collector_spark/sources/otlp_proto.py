"""OTLP protobuf wire codec — the reference's PRIMARY wire format
(SURVEY §2.1 S1/S2; pdata/plog/pb.go:8-25 ProtoMarshaler.MarshalLogs /
UnmarshalLogs), re-expressed for Spark.

The message layout is the public opentelemetry-proto logs schema
(opentelemetry/proto/logs/v1/logs.proto):

    LogsData              { repeated ResourceLogs resource_logs = 1 }
    ResourceLogs          { Resource resource = 1;
                            repeated ScopeLogs scope_logs = 2 }
    Resource              { repeated KeyValue attributes = 1 }
    ScopeLogs             { InstrumentationScope scope = 1;
                            repeated LogRecord log_records = 2 }
    InstrumentationScope  { string name = 1 }
    LogRecord             { fixed64 time_unix_nano = 1;
                            SeverityNumber severity_number = 2;   // varint
                            string severity_text = 3;
                            AnyValue body = 5;
                            repeated KeyValue attributes = 6;
                            string event_name = 12 }
    KeyValue              { string key = 1; AnyValue value = 2 }
    AnyValue              { oneof { string string_value = 1;
                                    bool bool_value = 2;
                                    int64 int_value = 3;
                                    double double_value = 4;
                                    bytes bytes_value = 7 } }

Encoding follows the canonical proto3 wire rules (varint keys
``(field_number << 3) | wire_type``, little-endian fixed64,
length-delimited nested messages) with ascending field order and
proto3 default-value omission (empty strings / zero scalars are not
written) — the same bytes Go's marshaler emits for these messages.
Byte-faithfulness is pinned by golden-vector tests (hand-derived from
the wire spec) in tests/test_otlp_proto.py; semantic faithfulness by
the ``proto_roundtrip`` driver query, which decodes what it encodes and
value-oracles the flattened records against DuckDB's independent
computation from the raw transcripts.

Spark shape: a wire codec is inherently per-record byte work no
builtin expression covers, so this is the sanctioned slow path — Arrow
``pandas_udf`` over PRE-GROUPED envelope structs (the grouping /
ordering is declarative ``groupBy`` + ``array_sort``, identical to the
JSON envelope encoder in sources/otlp_json.py, so Catalyst plans the
shuffles and the Python boundary sees one already-shaped struct per
envelope). Throughput scales with partitions like any map-side UDF; no
shuffle is introduced by the codec itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# proto3 wire primitives (pure python, no deps)
# ---------------------------------------------------------------------------

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2


def _varint(n: int) -> bytes:
    """Unsigned LEB128 varint."""
    if n < 0:
        # int64 negatives are 10-byte two's-complement varints
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _str_field(field: int, s: str | None) -> bytes:
    """Length-delimited string; proto3 omits empty/None."""
    if not s:
        return b""
    raw = s.encode("utf-8")
    return _key(field, _WT_LEN) + _varint(len(raw)) + raw


def _msg_field(field: int, body: bytes) -> bytes:
    """Length-delimited nested message (written even when empty IF the
    caller passes it — presence of a message field is meaningful)."""
    return _key(field, _WT_LEN) + _varint(len(body)) + body


def _varint_field(field: int, n: int) -> bytes:
    if not n:
        return b""
    return _key(field, _WT_VARINT) + _varint(n)


def _fixed64_field(field: int, n: int) -> bytes:
    if not n:
        return b""
    return _key(field, _WT_FIXED64) + int(n).to_bytes(8, "little")


def _any_string(s: str | None) -> bytes:
    """AnyValue{string_value=1}. Encodes the FIELD even for the empty
    string (an AnyValue message that is present but empty decodes as
    the empty string — matches pdata's Str("") round trip)."""
    return _str_field(1, s)


def _any_int(n: int) -> bytes:
    """AnyValue{int_value=3}."""
    return _varint_field(3, n)


def _keyvalue(key: str, any_bytes: bytes) -> bytes:
    return _str_field(1, key) + _msg_field(2, any_bytes)


def encode_log_record(
    time_unix_nano: int,
    severity_number: int,
    severity_text: str,
    body: str,
    turn_idx: int,
    event_name: str,
) -> bytes:
    """One LogRecord message, fields in ascending field order (the
    canonical serialization): time=1, sev_num=2, sev_text=3, body=5,
    attributes=6 (single turn.idx int attribute), event_name=12."""
    return (
        _fixed64_field(1, time_unix_nano)
        + _varint_field(2, severity_number)
        + _str_field(3, severity_text)
        + _msg_field(5, _any_string(body))
        + _msg_field(6, _keyvalue("turn.idx", _any_int(turn_idx)))
        + _str_field(12, event_name)
    )


def encode_resource_logs(
    conv_id: str,
    scopes: list[tuple[str, list[bytes]]],
) -> bytes:
    """LogsData{ResourceLogs} for one (conversation, export batch):
    resource carries the conv.id attribute; each (scope_name, records)
    becomes one ScopeLogs."""
    resource = _keyvalue("conv.id", _any_string(conv_id))
    body = _msg_field(1, _msg_field(1, resource))
    for scope_name, recs in scopes:
        scope = _str_field(1, scope_name)
        sl = _msg_field(1, scope) + b"".join(
            _msg_field(2, r) for r in recs
        )
        body += _msg_field(2, sl)
    return _msg_field(1, body)  # LogsData.resource_logs = 1


# ---------------------------------------------------------------------------
# decoder (generic wire walk by field number)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields.
    value is int for varint/fixed, bytes for length-delimited."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            v, i = _read_varint(buf, i)
        elif wt == _WT_FIXED64:
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == _WT_LEN:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _any_to_str(buf: bytes) -> str:
    for f, _, v in _fields(buf):
        if f == 1:
            return v.decode("utf-8")
    return ""


def _any_to_int(buf: bytes) -> int:
    for f, _, v in _fields(buf):
        if f == 3:
            return v if v < (1 << 63) else v - (1 << 64)
    return 0


def decode_logs(buf: bytes) -> list[dict]:
    """LogsData bytes → one dict per LogRecord (the flattened receiver
    row shape). The inverse of encode_resource_logs for the fields this
    pipeline carries; unknown fields are skipped (forward-compatible,
    like any proto reader)."""
    out: list[dict] = []
    for f_rl, _, rl in _fields(buf):
        if f_rl != 1:
            continue
        conv_id = ""
        scope_lists = []
        for f, _, v in _fields(rl):
            if f == 1:  # Resource
                for f2, _, attrs in _fields(v):
                    if f2 != 1:
                        continue
                    key = val = ""
                    for f3, _, v3 in _fields(attrs):
                        if f3 == 1:
                            key = v3.decode("utf-8")
                        elif f3 == 2:
                            val = _any_to_str(v3)
                    if key == "conv.id":
                        conv_id = val
            elif f == 2:  # ScopeLogs
                scope_lists.append(v)
        for sl in scope_lists:
            scope_name = ""
            for f, _, v in _fields(sl):
                if f == 1:
                    for f2, _, v2 in _fields(v):
                        if f2 == 1:
                            scope_name = v2.decode("utf-8")
            for f, _, v in _fields(sl):
                if f != 2:
                    continue
                rec = {
                    "res_conv": conv_id,
                    "scope_name": scope_name,
                    "ts_unix_nano": 0,
                    "severity_number": 0,
                    "severity_text": "",
                    "body_text": "",
                    "event_name": "",
                    "turn_idx": 0,
                }
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        rec["ts_unix_nano"] = v2
                    elif f2 == 2:
                        rec["severity_number"] = v2
                    elif f2 == 3:
                        rec["severity_text"] = v2.decode("utf-8")
                    elif f2 == 5:
                        rec["body_text"] = _any_to_str(v2)
                    elif f2 == 6:
                        for f3, _, v3 in _fields(v2):
                            if f3 == 2:
                                rec["turn_idx"] = _any_to_int(v3)
                    elif f2 == 12:
                        rec["event_name"] = v2.decode("utf-8")
                out.append(rec)
    return out


# ---------------------------------------------------------------------------
# spark surface
# ---------------------------------------------------------------------------

_SEV_TEXT = {17: "ERROR", 13: "WARN", 9: "INFO"}

_DECODED_SCHEMA = (
    "res_conv string, scope_name string, turn_idx int, "
    "ts_unix_nano bigint, severity_number int, severity_text string, "
    "body_text string, event_name string"
)


def encode_logs_proto(parsed: DataFrame, batch_size: int = 512) -> DataFrame:
    """Parsed turns → (conv_id, _batch, wire: binary), one LogsData
    proto per (conversation, ≤batch_size-turn export batch) — the same
    envelope grouping as the JSON encoder (resource = conversation,
    scope = tool, records in turn order). All grouping/sorting is
    declarative; only the final struct→bytes step crosses into an
    Arrow-batched UDF."""
    df = parsed.withColumn(
        "_batch", (F.col("turn_idx") / F.lit(batch_size)).cast("int")
    )
    rec = F.struct(
        F.col("turn_idx").cast("bigint").alias("ti"),
        (F.unix_timestamp("ts").cast("bigint") * F.lit(1_000_000_000))
        .alias("ts"),
        F.col("severity_num").cast("int").alias("sev"),
        F.col("text").alias("body"),
        F.col("event_kind").alias("event"),
    )
    scopes = (
        df.select(
            "conv_id", "_batch",
            F.coalesce(F.col("tool_parsed"), F.lit("none")).alias("scope_name"),
            rec.alias("trec"),
        )
        .groupBy("conv_id", "_batch", "scope_name")
        .agg(F.array_sort(F.collect_list("trec")).alias("recs"))
        .groupBy("conv_id", "_batch")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("scope_name", "recs"))
            ).alias("scopes")
        )
    )

    @pandas_udf("binary")
    def _enc(conv: pd.Series, scopes_s: pd.Series) -> pd.Series:
        out = []
        for cid, sc in zip(conv, scopes_s):
            pairs = []
            for s in sc:
                recs = [
                    encode_log_record(
                        int(r["ts"]),
                        int(r["sev"]),
                        _SEV_TEXT.get(int(r["sev"]), ""),
                        r["body"],
                        int(r["ti"]),
                        r["event"] or "",
                    )
                    for r in s["recs"]
                ]
                pairs.append((s["scope_name"], recs))
            out.append(encode_resource_logs(cid, pairs))
        return pd.Series(out)

    return scopes.select(
        "conv_id", "_batch", _enc("conv_id", "scopes").alias("wire")
    )


def decode_logs_proto(
    df: DataFrame, wire_col: str = "wire", carry: list[str] | None = None
) -> DataFrame:
    """(…, wire: binary) → one row per LogRecord, the flat receiver
    shape shared with the JSON path. Arrow-batched decode + explode."""
    carry = carry or []

    @pandas_udf(f"array<struct<{_DECODED_SCHEMA}>>")
    def _dec(wire: pd.Series) -> pd.Series:
        return pd.Series([decode_logs(bytes(b)) for b in wire])

    return (
        df.select(*carry, F.explode(_dec(F.col(wire_col))).alias("r"))
        .select(*carry, "r.*")
    )


def read_otlp_proto(spark, path: str) -> DataFrame:
    """Protobuf file receiver: one LogsData proto per file under
    ``path`` (the export framing `write_proto_files` produces — one
    envelope per (conversation, batch) file, the standard object-store
    layout for OTLP blobs) → one row per LogRecord. `binaryFile` scans
    split across executors like any other file source; the decode is
    the same Arrow-batched walker the round-trip query uses."""
    raw = spark.read.format("binaryFile").load(path).select(
        F.col("content").alias("wire")
    )
    return decode_logs_proto(raw)


def write_proto_files(df: DataFrame, path: str, wire_col: str = "wire") -> int:
    """Exporter-side file sink for encoded envelopes: one ``.pb`` file
    per envelope row (foreachPartition, executor-side writes — no
    driver collect). Returns the row count via the write's accumulator
    semantics (a count on the SAME cached plan the writer consumed)."""
    import os

    os.makedirs(path, exist_ok=True)
    enc = df.select(
        F.md5(F.concat_ws("|", "conv_id", "_batch")).alias("name"), wire_col
    )

    def _write(rows):
        for r in rows:
            with open(os.path.join(path, f"{r['name']}.pb"), "wb") as f:
                f.write(bytes(r[wire_col]))

    enc = enc.persist()
    try:
        n = enc.count()
        enc.foreachPartition(_write)
    finally:
        enc.unpersist()
    return n
