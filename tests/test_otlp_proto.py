"""OTLP protobuf wire codec: golden byte vectors (hand-derived from the
proto3 wire spec — byte-faithfulness, pdata/plog/pb.go parity) plus the
Spark encode→decode round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources import otlp_proto as op


def test_varint_golden():
    assert op._varint(0) == b"\x00"
    assert op._varint(1) == b"\x01"
    assert op._varint(127) == b"\x7f"
    assert op._varint(128) == b"\x80\x01"
    assert op._varint(300) == b"\xac\x02"
    # int64 negatives are 10-byte two's-complement varints
    assert op._varint(-1) == b"\xff" * 9 + b"\x01"


def test_log_record_golden_bytes():
    """Every byte hand-derived from the wire spec: field keys are
    (field<<3)|wire_type varints, fixed64 little-endian, nested
    messages length-delimited, ascending field order, proto3 empty
    omission (event_name='' writes nothing)."""
    rec = op.encode_log_record(
        time_unix_nano=1,
        severity_number=9,
        severity_text="INFO",
        body="hi",
        turn_idx=0,
        event_name="",
    )
    expect = bytes.fromhex(
        "09" + "0100000000000000"  # 1: fixed64 time = 1
        + "10" + "09"              # 2: varint severity = 9
        + "1a" + "04" + "494e464f"  # 3: "INFO"
        + "2a" + "04" + "0a02" + "6869"  # 5: AnyValue{1:"hi"}
        # 6: KeyValue{1:"turn.idx", 2: AnyValue{3: int 0}} — a set
        # oneof member is always written, even at its zero value
        # (Go emits Int(0) as 0x18 0x00); omission is only for plain
        # fields
        + "32" + "0e" + "0a08" + "7475726e2e696478" + "1202" + "1800"
        # 12: event_name "" omitted entirely
    )
    assert rec == expect


def test_resource_logs_golden_and_decode():
    rec = op.encode_log_record(2, 17, "ERROR", "x", 3, "tool_use")
    buf = op.encode_resource_logs("c-1", [("bash", [rec])])
    # LogsData{1: ResourceLogs{1: Resource{1: KeyValue{conv.id=c-1}},
    #                          2: ScopeLogs{1: Scope{1:"bash"}, 2: rec}}}
    kv = bytes.fromhex("0a07" + "636f6e762e6964" + "1205" + "0a03" + "632d31")
    resource_msg = bytes.fromhex("0a" + format(len(kv), "02x")) + kv
    scope = bytes.fromhex("0a06" + "0a04" + "62617368")
    sl = scope + bytes.fromhex("12" + format(len(rec), "02x")) + rec
    rl = (
        bytes.fromhex("0a" + format(len(resource_msg), "02x"))
        + resource_msg
        + bytes.fromhex("12" + format(len(sl), "02x"))
        + sl
    )
    expect = bytes.fromhex("0a" + format(len(rl), "02x")) + rl
    assert buf == expect

    rows = op.decode_logs(buf)
    assert rows == [
        {
            "res_conv": "c-1",
            "scope_name": "bash",
            "ts_unix_nano": 2,
            "severity_number": 17,
            "severity_text": "ERROR",
            "body_text": "x",
            "event_name": "tool_use",
            "turn_idx": 3,
        }
    ]


def test_decode_inverts_encode_unicode_and_empty():
    rec = op.encode_log_record(
        1_700_000_000_000_000_000, 13, "WARN", "héllo ∆ wörld", 42, ""
    )
    buf = op.encode_resource_logs("конв", [("none", [rec])])
    (row,) = op.decode_logs(buf)
    assert row["res_conv"] == "конв"
    assert row["body_text"] == "héllo ∆ wörld"
    assert row["turn_idx"] == 42
    assert row["event_name"] == ""
    assert row["ts_unix_nano"] == 1_700_000_000_000_000_000


def test_span_golden_bytes_and_decode():
    """Span wire bytes hand-derived from trace/v1/trace.proto: ids as
    raw bytes, name=5, kind=6 varint, start/end fixed64, status=15
    {code=3}; parent and status omitted at their defaults."""
    tid = "0f" * 16
    sid = "ab" * 8
    span = op.encode_span(tid, sid, None, "x", 2, 1, 3, 0)
    expect = (
        bytes.fromhex("0a10" + tid)       # 1: trace_id (16 bytes)
        + bytes.fromhex("1208" + sid)     # 2: span_id (8 bytes)
        + bytes.fromhex("2a01" + "78")    # 5: name "x"
        + bytes.fromhex("3002")           # 6: kind SERVER
        + bytes.fromhex("39" + "0100000000000000")  # 7: start
        + bytes.fromhex("41" + "0300000000000000")  # 8: end
    )
    assert span == expect
    # with parent + error status
    span2 = op.encode_span(tid, sid, "cd" * 8, "y", 1, 5, 6, 2)
    assert bytes.fromhex("2208" + "cd" * 8) in span2      # 4: parent
    assert span2.endswith(bytes.fromhex("7a02" + "1802"))  # 15: {3: 2}

    buf = op.encode_resource_spans("c", [span, span2])
    rows = op.decode_spans(buf)
    assert [r["span_id"] for r in rows] == [sid, sid]
    assert rows[0]["parent_span_id"] is None
    assert rows[1]["parent_span_id"] == "cd" * 8
    assert rows[0]["status_code"] == 0 and rows[1]["status_code"] == 2
    assert all(r["res_conv"] == "c" for r in rows)


def test_spark_spans_roundtrip(spark, sf_dir):
    """derive_spans → encode_spans_proto → decode_spans_proto
    reproduces every span (the traces-signal wire story)."""
    from opentelemetry_collector_spark.operators import parse as parse_ops
    from opentelemetry_collector_spark.operators import traces
    from opentelemetry_collector_spark.sources.transcripts import (
        derive_transcripts,
    )

    parsed = parse_ops.parse_stage(
        derive_transcripts(spark, sf_dir), with_attrs=False
    ).limit(300)
    spans = traces.derive_spans(parsed)
    back = op.decode_spans_proto(op.encode_spans_proto(spans))
    cols = ["trace_id", "span_id", "parent_span_id", "name", "kind",
            "start_unix_nano", "end_unix_nano", "status_code"]
    got = sorted(tuple(r[c] for c in cols) for r in back.collect())
    want = sorted(tuple(r[c] for c in cols) for r in spans.collect())
    assert got == want and got
    # root spans have no parent; non-roots chain to the previous turn
    roots = [r for r in back.collect() if r["parent_span_id"] is None]
    assert roots and all(r["kind"] == 2 for r in roots)


def test_proto_file_export_ingest(spark, sf_dir, tmp_path):
    """Exporter → .pb files → file receiver reproduces every record
    (the S1 ingest path for stored OTLP blobs)."""
    from opentelemetry_collector_spark.operators import parse as parse_ops
    from opentelemetry_collector_spark.sources.transcripts import (
        derive_transcripts,
    )

    parsed = parse_ops.parse_stage(
        derive_transcripts(spark, sf_dir), with_attrs=False
    ).limit(200)
    env = op.encode_logs_proto(parsed)
    out = str(tmp_path / "pb")
    n_files = op.write_proto_files(env, out)
    assert n_files == env.count()
    back = op.read_otlp_proto(spark, out)
    got = sorted(
        (r["res_conv"], r["turn_idx"], r["body_text"])
        for r in back.collect()
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in parsed.select("conv_id", "turn_idx", "text").collect()
    )
    assert got == want


def test_spark_proto_roundtrip(spark, sf_dir):
    """encode_logs_proto → decode_logs_proto over real parsed turns
    reproduces every record (same invariant the driver query oracles
    at sf0.01)."""
    from opentelemetry_collector_spark.operators import parse as parse_ops
    from opentelemetry_collector_spark.sources.transcripts import (
        derive_transcripts,
    )

    parsed = parse_ops.parse_stage(
        derive_transcripts(spark, sf_dir), with_attrs=False
    ).limit(500)
    env = op.encode_logs_proto(parsed)
    flat = op.decode_logs_proto(env, carry=["conv_id"])
    got = flat.select(
        "conv_id",
        (F.col("res_conv") == F.col("conv_id")).alias("ok"),
        "turn_idx", "severity_number", "body_text",
    )
    rows = got.collect()
    assert rows and all(r["ok"] for r in rows)
    # record-level equality against the input
    expect = {
        (r["conv_id"], r["turn_idx"]): (r["severity_num"], r["text"])
        for r in parsed.select(
            "conv_id", "turn_idx", "severity_num", "text"
        ).collect()
    }
    for r in rows:
        sev, text = expect[(r["conv_id"], r["turn_idx"])]
        assert r["severity_number"] == sev and r["body_text"] == text
    assert len(rows) == len(expect)


# --- metrics wire codec (metrics/v1/metrics.proto) --------------------------


def test_metrics_exp_histogram_golden_bytes():
    """Hand-derived MetricsData for one exp-histogram point: scale 2
    (zigzag 4), positive offset 3 (zigzag 6) with packed counts [1,2],
    count 3 fixed64, positive/negative bucket messages always present
    (the reference marshals them unconditionally)."""
    from opentelemetry_collector_spark.sources import otlp_proto as m

    metric = m.encode_exp_histogram_metric(
        "lat", "ms",
        [{"attrs": [("tool", "s")], "count": 3, "zero_count": 0,
          "scale": 2, "pos_offset": 3, "pos_counts": [1, 2],
          "neg_offset": 0, "neg_counts": []}],
    )
    expect = bytes.fromhex(
        "0a" + "03" + "6c6174"          # 1: name "lat"
        + "1a" + "02" + "6d73"           # 3: unit "ms"
        + "52" + "26"                    # 10: exponential_histogram, len 38
        + "0a" + "22"                    # 1: data_point, len 34
        + "0a" + "0b"                    # 1: attributes KeyValue, len 11
        + "0a04" + "746f6f6c"            # 1: key "tool"
        + "1203" + "0a01" + "73"         # 2: AnyValue{1:"s"}
        + "21" + "0300000000000000"      # 4: count fixed64 = 3
        + "30" + "04"                    # 6: scale sint32 zigzag(2)=4
        + "42" + "06"                    # 8: positive Buckets, len 6
        + "08" + "06"                    # 1: offset zigzag(3)=6
        + "12" + "02" + "0102"           # 2: packed counts [1,2]
        + "4a" + "00"                    # 9: negative Buckets, empty
        + "10" + "02"                    # 2: temporality CUMULATIVE
    )
    assert metric == expect, (metric.hex(), expect.hex())


def test_metrics_number_point_roundtrip():
    """Gauge and Sum number points survive encode→decode, including
    the always-written oneof value (as_int 0), negative ints, doubles,
    monotonic + temporality flags, and attributes (field 7)."""
    from opentelemetry_collector_spark.sources import otlp_proto as m

    gauge = m.encode_number_metric(
        "g", "1",
        [{"attrs": [("tool", "py")], "time": 123, "as_double": -2.5},
         {"attrs": [], "time": 124, "as_int": 0}],
        kind="gauge",
    )
    s = m.encode_number_metric(
        "s", "By",
        [{"attrs": [("tool", "ed")], "time": 125, "as_int": -7}],
        kind="sum", temporality=m.AGG_TEMPORALITY_DELTA, monotonic=True,
    )
    env = m.encode_resource_metrics([("conv.id", "c1")], "scope", [gauge, s])
    pts = m.decode_metrics(env)
    assert [p["type"] for p in pts] == ["gauge", "gauge", "sum"]
    g0, g1, s0 = pts
    assert g0["as_double"] == -2.5 and g0["attrs"] == {"tool": "py"}
    assert g1["as_int"] == 0 and g1["time"] == 124
    assert s0["as_int"] == -7 and s0["monotonic"] is True
    assert s0["temporality"] == m.AGG_TEMPORALITY_DELTA
    assert all(p["res_attrs"] == {"conv.id": "c1"} for p in pts)
    assert all(p["scope_name"] == "scope" for p in pts)


def test_metrics_proto_spark_roundtrip(spark):
    """decode(encode(hist)) == hist through the Spark wrappers,
    including a NULL group (absent attribute on the wire) and negative
    bucket indexes (values < 1)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators import exphist
    from opentelemetry_collector_spark.sources import otlp_proto as m

    df = spark.createDataFrame(
        [("a", 0.3), ("a", 5.0), ("a", 5.0), ("a", 0.0), (None, 2.0)],
        "tool string, v double",
    )
    hist = exphist.exponential_histogram(df, "v", scale=2)
    back = m.decode_metrics_proto(
        m.encode_metrics_proto(hist, "v", "1", scale=2), group_col="tool"
    )
    def rows(df):
        return sorted(
            ((r["tool"], r["sign"], r["idx"], r["n"])
             for r in df.select("tool", "sign", "idx", "n").collect()),
            key=lambda t: tuple("" if x is None else str(x) for x in t),
        )

    a, b = rows(hist), rows(back)
    assert a == b and len(a) == 4


def test_metrics_summary_and_histogram_roundtrip():
    """Summary (attributes field 7, quantile_values {q=1,v=2} doubles)
    and explicit-bounds Histogram (attributes field 9, packed fixed64
    bucket counts, packed double bounds) survive encode→decode — all
    five metric data-point types now round-trip on the proto wire."""
    from opentelemetry_collector_spark.sources import otlp_proto as m

    summ = m.encode_summary_metric(
        "lat_summary", "ms",
        [{"attrs": [("tool", "s")], "time": 9, "count": 100,
          "sum": 5050.0, "quantiles": [(0.5, 50.5), (0.99, 99.01)]}],
    )
    hist = m.encode_histogram_metric(
        "lat_hist", "ms",
        [{"attrs": [("tool", "s")], "time": 9, "count": 6, "sum": 12.5,
          "bucket_counts": [1, 2, 3], "bounds": [10.0, 100.0]}],
        temporality=m.AGG_TEMPORALITY_DELTA,
    )
    env = m.encode_resource_metrics([("corpus", "t")], "scope", [summ, hist])
    pts = m.decode_metrics(env)
    assert [p["type"] for p in pts] == ["summary", "histogram"]
    s, h = pts
    assert s["count"] == 100 and s["sum"] == 5050.0
    assert s["quantiles"] == [(0.5, 50.5), (0.99, 99.01)]
    assert s["attrs"] == {"tool": "s"} and s["time"] == 9
    assert h["bucket_counts"] == [1, 2, 3] and h["bounds"] == [10.0, 100.0]
    assert h["count"] == 6 and h["sum"] == 12.5
    assert h["temporality"] == m.AGG_TEMPORALITY_DELTA
