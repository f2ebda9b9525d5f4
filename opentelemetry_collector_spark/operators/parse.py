"""Parse stage — the receiver-decode analog (SURVEY §2.2 P4).

The reference's only "parse" is OTLP decode (receiver/otlpreceiver/
encoder.go:45-63); the body is an opaque pcommon.Value. Our payload is
transcript text, so the stage is a grok/regex projection of ``text``
into typed attribute columns plus a raw ``attrs`` bag mirroring
LogRecord.Attributes() (pdata/plog/generated_logrecord.go:101).

Everything here is native column expressions (``regexp_extract`` runs
inside whole-stage codegen, vectorized on the JVM) — zero Python in the
row path, honoring the input_hint's "no per-row Python" constraint. At
100 TB this matters more than anything else in the pipeline: the parse
stage touches every byte once, so it must stay in Tungsten.

Rows matching no rule are *quarantined* via ``parse_ok = false``, never
dropped — the analog of the permanent-error taxonomy keeping rejected
items addressable (consumer/consumererror/permanent.go:16-32).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark import sqltext


def _x(pattern: str, cast: str | None = None) -> Column:
    """Extract group 1; empty match → NULL (Spark returns '' on miss)."""
    c = F.nullif(F.regexp_extract(F.col("text"), pattern, 1), F.lit(""))
    return c.cast(cast) if cast else c


def severity_from_status(status: Column) -> Column:
    """HTTP-ish status → SeverityNumber domain 0–24
    (pdata/plog/severity_number.go:14-38: 9=INFO, 13=WARN, 17=ERROR)."""
    return (
        F.when(status >= 500, F.lit(17))
        .when(status >= 400, F.lit(13))
        .when(status >= 200, F.lit(9))
        .otherwise(F.lit(0))
    )


def parse_stage(df: DataFrame, with_attrs: bool = True) -> DataFrame:
    """transcripts → transcripts_parsed (FIXTURES.md §2).

    Keep in lockstep with the oracle twin sqltext.PARSED_SQL.
    """
    out = df.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        _x(sqltext.RE_SEQ, "bigint").alias("seq"),
        F.regexp_extract(F.col("text"), sqltext.RE_KIND, 1).alias("event_kind"),
        _x(sqltext.RE_STATUS, "int").alias("status_code"),
        _x(sqltext.RE_LATENCY, "double").alias("latency_ms"),
        _x(sqltext.RE_BYTES, "bigint").alias("bytes"),
        _x(sqltext.RE_MSG).alias("msg"),
        _x(sqltext.RE_TOOL).alias("tool_parsed"),
    )
    out = out.withColumns(
        {
            "severity_num": severity_from_status(F.col("status_code")),
            "parse_ok": F.col("seq").isNotNull() & F.col("status_code").isNotNull(),
        }
    )
    if with_attrs:
        # Raw string-typed capture bag, the LogRecord.Attributes() analog.
        # map_filter drops missing captures (miss ≠ empty-string value —
        # the reference's "empty ≠ unset" rule, batchprocessor/config.go:31-40).
        out = out.withColumn(
            "attrs",
            F.map_filter(
                F.map_from_arrays(
                    F.array(
                        F.lit("seq"), F.lit("event_kind"), F.lit("status"),
                        F.lit("latency_ms"), F.lit("bytes"), F.lit("msg"),
                        F.lit("tool"),
                    ),
                    F.array(
                        F.col("seq").cast("string"),
                        F.nullif(F.col("event_kind"), F.lit("")),
                        F.col("status_code").cast("string"),
                        F.col("latency_ms").cast("string"),
                        F.col("bytes").cast("string"),
                        F.col("msg"),
                        F.col("tool_parsed"),
                    ),
                ),
                lambda _, v: v.isNotNull(),
            ),
        )
    return out


def quarantine_split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — quarantined rows go to a failure table, the
    row-level analog of NewPermanent error handling (SURVEY §2.5 F7)."""
    return parsed.filter(F.col("parse_ok")), parsed.filter(~F.col("parse_ok"))


def parse_stage_arrow(df: DataFrame, batch_size_hint: int = 0) -> DataFrame:
    """Arrow-vectorized grok engine: the same parse via ``mapInPandas``
    (whole Arrow batches into one Python worker call — never per-row
    Python, honoring the input_hint).

    The native regex projection (:func:`parse_stage`) is the default hot
    path — it stays on the JVM. This variant exists for rule sets that
    need Python ``re`` features Java regex lacks (named groups with
    duplicate names, conditional patterns, grok library reuse) and to
    keep the Arrow plumbing tested. Output is column-identical to
    parse_stage(with_attrs=False); tests assert equality.
    """
    import re

    import pandas as pd
    from pyspark.sql.types import (
        BooleanType, DoubleType, IntegerType, LongType, StringType,
        StructField, StructType,
    )

    res = {
        "seq": re.compile(r"\[seq=([0-9]+)\]"),
        "kind": re.compile(r"^\[seq=[0-9]+\] ([a-z]+) "),
        "status": re.compile(r" status=([0-9]+) "),
        "latency": re.compile(r" latency_ms=([0-9]+) "),
        "bytes": re.compile(r" bytes=([0-9]+) "),
        "msg": re.compile(r" msg=(.*)$"),
        "tool": re.compile(r" tool=([a-z]+) "),
    }
    in_schema = df.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).schema
    out_schema = StructType(
        list(in_schema)
        + [
            StructField("seq", LongType()),
            StructField("event_kind", StringType(), False),
            StructField("status_code", IntegerType()),
            StructField("latency_ms", DoubleType()),
            StructField("bytes", LongType()),
            StructField("msg", StringType()),
            StructField("tool_parsed", StringType()),
            StructField("severity_num", IntegerType(), False),
            StructField("parse_ok", BooleanType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            text = pdf["text"]

            def ext(key):
                return text.str.extract(res[key], expand=False)

            out = pdf.copy()
            out["seq"] = pd.to_numeric(ext("seq"), errors="coerce").astype("Int64")
            out["event_kind"] = ext("kind").fillna("")
            out["status_code"] = pd.to_numeric(ext("status"), errors="coerce").astype("Int32")
            out["latency_ms"] = pd.to_numeric(ext("latency"), errors="coerce")
            out["bytes"] = pd.to_numeric(ext("bytes"), errors="coerce").astype("Int64")
            out["msg"] = ext("msg")
            out["tool_parsed"] = ext("tool")
            status = out["status_code"]
            out["severity_num"] = (
                pd.Series(0, index=out.index)
                .mask(status >= 200, 9).mask(status >= 400, 13).mask(status >= 500, 17)
                .astype("int32")
            )
            out["parse_ok"] = out["seq"].notna() & status.notna()
            yield out

    return df.select(*[f.name for f in in_schema]).mapInPandas(kernel, out_schema)
