"""Span events/links derivations and the traces JSON envelope
(operators/traces.py, sources/otlp_trace_json.py; reference model at
pdata/ptrace/generated_spanevent.go, generated_spanlink.go,
ptrace/json.go:17-53)."""

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import traces
from opentelemetry_collector_spark.sources import otlp_trace_json as otj


def _mini_parsed(spark):
    """Four-turn conversation: root call, result, error call, result."""
    rows = [
        # conv, idx, ts(s), kind, tool, latency, bytes, status, sev
        ("c1", 0, 1000, "call", "search", 50.0, None, 200, 9),
        ("c1", 1, 1010, "result", None, 20.0, 512, 200, 9),
        ("c1", 2, 1020, "call", "python", None, None, 500, 17),
        ("c1", 3, 1030, "result", None, 5.0, 64, 500, 17),
        ("c2", 0, 2000, "note", None, None, None, None, 9),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ts_s long, event_kind string, "
        "tool_parsed string, latency_ms double, bytes long, "
        "status_code int, severity_num int",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s")))


def test_span_events_three_kinds(spark):
    ev = traces.derive_span_events(_mini_parsed(spark)).collect()
    by_turn = {}
    for r in ev:
        by_turn.setdefault(r["turn_idx"], []).append(
            (r["event_name"], r["value"])
        )
    # call turn: tool.call with the tool name
    assert ("tool.call", "search") in by_turn[0]
    # result turn: tool.result with the byte count
    assert ("tool.result", "512") in by_turn[1]
    # error turns carry the exception event with the status code
    assert ("exception", "500") in by_turn[2]
    assert ("exception", "500") in by_turn[3]
    # the note turn (no tool, no bytes, sev 9) yields no events
    assert 4 not in by_turn and len(ev) == 6


def test_span_links_result_to_latest_call(spark):
    links = {
        r["turn_idx"]: r["link_turn_idx"]
        for r in traces.derive_span_links(_mini_parsed(spark)).collect()
    }
    # each result turn links to the most recent call turn
    assert links == {1: 0, 3: 2}


def test_trace_envelope_round_trip(spark):
    """decode(encode(spans)) == spans, including omitted defaults
    (root parentSpanId NULL, UNSET status -> code 0)."""
    spans = traces.derive_spans(_mini_parsed(spark))
    flat = otj.decode_trace_envelope(
        otj.encode_trace_envelope(spans), carry=["conv_id"]
    )
    cols = ["conv_id", "turn_idx", "trace_id", "span_id", "parent_span_id",
            "name", "kind", "start_unix_nano", "end_unix_nano", "status_code"]
    a = sorted(tuple(r[c] for c in cols) for r in spans.collect())
    b = sorted(tuple(r[c] for c in cols) for r in flat.collect())
    assert a == b
    assert flat.filter(F.col("res_conv") != F.col("conv_id")).count() == 0
    # root span: parent omitted on the wire, decodes back to NULL
    root = flat.filter((F.col("conv_id") == "c1") & (F.col("turn_idx") == 0))
    assert root.collect()[0]["parent_span_id"] is None


def test_trace_envelope_wire_shape(spark):
    """The wire is valid OTLP/JSON: ids hex, uint64 nanos as strings,
    UNSET status as the empty object."""
    import json

    wire = (
        otj.encode_trace_envelope(traces.derive_spans(_mini_parsed(spark)))
        .filter(F.col("conv_id") == "c1")
        .collect()[0]["wire"]
    )
    doc = json.loads(wire)
    spans = doc["resourceSpans"][0]["scopeSpans"][0]["spans"]
    assert len(spans) == 4
    s0 = spans[0]
    assert len(s0["traceId"]) == 32 and len(s0["spanId"]) == 16
    assert "parentSpanId" not in s0 and "parentSpanId" in spans[1]
    assert isinstance(s0["startTimeUnixNano"], str)
    assert s0["status"] == {} and spans[2]["status"] == {"code": 2}


def test_trace_envelope_round_trip_with_events_links(spark):
    """Events/links ride inside their span and decode back with full
    content; spans without any stay array-free on the wire and decode
    to empty arrays."""
    import json

    p = _mini_parsed(spark)
    spans = traces.derive_spans(p)
    env = otj.encode_trace_envelope(
        spans,
        events=traces.derive_span_events(p),
        links=traces.derive_span_links(p),
    )
    wire = env.filter(F.col("conv_id") == "c1").collect()[0]["wire"]
    doc = json.loads(wire)
    sp = doc["resourceSpans"][0]["scopeSpans"][0]["spans"]
    # turn 0: tool.call event, no link
    assert [e["name"] for e in sp[0]["events"]] == ["tool.call"]
    assert sp[0]["events"][0]["attributes"][0]["value"]["stringValue"] == "search"
    assert "links" not in sp[0]
    # turn 1 (result): tool.result event + a link back to turn 0
    assert [e["name"] for e in sp[1]["events"]] == ["tool.result"]
    assert len(sp[1]["links"]) == 1
    assert sp[1]["links"][0]["spanId"] == sp[0]["spanId"]
    assert sp[1]["links"][0]["traceId"] == sp[0]["traceId"]

    flat = otj.decode_trace_envelope(env, carry=["conv_id"])
    got = {
        (r["conv_id"], r["turn_idx"]): (
            [e["name"] for e in r["events"]],
            [(l["traceId"], l["spanId"]) for l in r["links"]],
        )
        for r in flat.collect()
    }
    assert got[("c1", 0)][0] == ["tool.call"] and got[("c1", 0)][1] == []
    assert got[("c1", 1)][1] != [] and got[("c1", 1)][0] == ["tool.result"]
    # c2 turn 0: 'note' turn — no events, no links, arrays decode empty
    assert got[("c2", 0)] == ([], [])
