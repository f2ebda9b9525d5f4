"""Canonical value rendering — pcommon.Value.AsString analog (SURVEY §2.2 P5).

The reference renders any attribute value to string with ES6-style
number formatting: integral floats print without a decimal point,
non-integral floats print shortest-round-trip, NaN/±Infinity print as
literals (pdata/pcommon/value.go:388-471; float encoding in
internal/json uses ES6 rules). Java's Double.toString differs ("1.0",
"1.0E21"), so golden-equality with reference output needs these
normalizers. All are column expressions — usable in golden tests and
debug-exporter rendering without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def render_double(c: Column) -> Column:
    """ES6 Number→String for doubles (value.go:419-434):
    NaN → 'NaN', ±Inf → '±Infinity', integral → no trailing '.0',
    else Java shortest repr (matches ES6 for the common range)."""
    d = c.cast("double")
    s = d.cast("string")
    return (
        F.when(F.isnan(d), F.lit("NaN"))
        .when(d == F.lit(float("inf")), F.lit("Infinity"))
        .when(d == F.lit(float("-inf")), F.lit("-Infinity"))
        # integral and within int64-exact range → integer rendering
        .when(
            (d == F.floor(d).cast("double"))
            & (F.abs(d) < F.lit(9.007199254740992e15)),
            F.floor(d).cast("long").cast("string"),
        )
        .otherwise(s)
    )


def render_bool(c: Column) -> Column:
    """strconv.FormatBool (value.go:415-417): 'true' / 'false'."""
    return F.when(c, F.lit("true")).otherwise(F.lit("false"))


def render_bytes(c: Column) -> Column:
    """Bytes render as base64 (value.go:435-437)."""
    return F.base64(c)


def render_map_json(c: Column) -> Column:
    """Map/Slice values render as their JSON encoding (value.go:405-412).
    Spark's to_json over a map<string,string> matches the shape; key
    order follows map order (our attrs maps use fixed insertion order).
    """
    return F.to_json(c)


def as_string(c: Column, value_type: str) -> Column:
    """Dispatch table mirroring Value.AsString's type switch."""
    if value_type == "double":
        return render_double(c)
    if value_type == "bool":
        return render_bool(c)
    if value_type == "bytes":
        return render_bytes(c)
    if value_type in ("map", "slice"):
        return render_map_json(c)
    return c.cast("string")
