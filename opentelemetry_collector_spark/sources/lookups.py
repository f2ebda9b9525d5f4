"""Enrichment lookup tables (broadcast-join right sides).

The reference's resource/attributes enrichment attaches environment
attributes onto each record (docs/rfcs/processing.md:84-90,204-209). Our
lookups are tiny dimension tables, always broadcast — never shuffled.
Row content is shared with the DuckDB oracle via sqltext.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from opentelemetry_collector_spark.sqltext import ROLE_LOOKUP_ROWS, TOOL_LOOKUP_ROWS

_TOOL_SCHEMA = StructType(
    [
        StructField("tool", StringType(), False),
        StructField("tool_category", StringType(), False),
        StructField("tool_owner", StringType(), False),
        StructField("is_privileged", BooleanType(), False),
    ]
)

_ROLE_SCHEMA = StructType(
    [
        StructField("role", StringType(), False),
        StructField("role_kind", StringType(), False),
        StructField("billing_class", StringType(), False),
    ]
)


def tool_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_LOOKUP_ROWS, _TOOL_SCHEMA)


def role_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_LOOKUP_ROWS, _ROLE_SCHEMA)
