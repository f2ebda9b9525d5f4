"""The proto sizer must equal the length of a real wire encoding.

A minimal protobuf encoder (pure Python, wire-format rules only) builds
actual LogRecord bytes for sample rows; the Spark column expression
must produce exactly len(bytes). Mirrors the generated SizeProto law
(pdata/internal/generated_proto_logrecord.go:252-293)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import protosize


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return bytes([(field << 3) | 2]) + _varint(len(payload)) + payload


def _anyvalue_str(s: str) -> bytes:
    return _ld(1, s.encode())


def _keyvalue(key: str, val: str) -> bytes:
    return _ld(1, key.encode()) + _ld(2, _anyvalue_str(val))


def _encode_logrecord(ts_set, sev, sev_text, body, event, attrs) -> bytes:
    out = b""
    if ts_set:
        out += bytes([0x09]) + (1234).to_bytes(8, "little")  # fixed64 #1
    if sev:
        out += bytes([0x10]) + _varint(sev)  # varint #2
    if sev_text:
        out += _ld(3, sev_text.encode())
    out += _ld(5, _anyvalue_str(body))
    for k, v in attrs:
        if v is not None:
            out += _ld(6, _keyvalue(k, v))
    out += _ld(9, b"")  # empty trace_id
    out += _ld(10, b"")  # empty span_id
    if event:
        out += _ld(12, event.encode())
    return out


CASES = [
    (17, "ERROR", "a" * 5, "call", [("msg", "hey"), ("status", "500"), ("tool", None)]),
    (0, "", "", "", [("msg", None), ("status", None), ("tool", None)]),
    (9, "INFO", "x" * 200, "result", [("msg", "m" * 130), ("status", "200"), ("tool", "search")]),
    (13, "WARN", "body text here", "call", [("msg", None), ("status", "404"), ("tool", "browser")]),
]


def test_sizer_matches_real_encoding(spark):
    rows = [
        (i, sev, st, body, ev, dict(attrs).get("msg"),
         dict(attrs).get("status"), dict(attrs).get("tool"))
        for i, (sev, st, body, ev, attrs) in enumerate(CASES)
    ]
    df = spark.createDataFrame(
        rows,
        "i int, sev int, sev_text string, body string, event string, "
        "msg string, status string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2025-01-01 00:00:00")))
    size = protosize.log_record_proto_size(
        F.col("ts"), F.col("sev"), F.col("sev_text"), F.col("body"),
        F.col("event"),
        attrs=[("msg", F.col("msg")), ("status", F.col("status")),
               ("tool", F.col("tool"))],
    )
    got = {r["i"]: r["n"] for r in df.select("i", size.alias("n")).collect()}
    for i, (sev, st, body, ev, attrs) in enumerate(CASES):
        expect = len(_encode_logrecord(True, sev, st, body, ev, attrs))
        assert got[i] == expect, (i, got[i], expect)
