"""Arrow-vectorized signature paths must be bit-identical to the native
(Catalyst HOF) paths — the flag in dedup.SIGNATURE_PATHS is a
performance choice only. Checked on the real documents corpus plus
adversarial edge texts (empty, multi-space, short, unicode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import dedup

EDGE_TEXTS = [
    "",
    " ",
    "one",
    "two words",
    "exactly three words",
    "now four whole words",
    "  leading and   multi  space  ",
    "UPPER Case MiXeD",
    "unicode héllo wörld ünïcode",
    "repeat repeat repeat repeat repeat",
]


def _corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    edges = spark.createDataFrame(
        [(f"edge{i}", t) for i, t in enumerate(EDGE_TEXTS)], "doc_id string, text string"
    )
    return docs.unionByName(edges)


def test_minhash_arrow_equals_native(spark, sf_dir):
    df = _corpus(spark, sf_dir)
    both = df.select(
        "doc_id",
        dedup.minhash_signature(F.col("text")).alias("native"),
        dedup.minhash_signature_arrow()(F.col("text")).alias("arrow"),
    )
    assert both.filter(F.col("native") != F.col("arrow")).count() == 0
    assert both.count() > len(EDGE_TEXTS)


def test_simhash_arrow_equals_native(spark, sf_dir):
    df = _corpus(spark, sf_dir)
    both = df.select(
        "doc_id",
        dedup.simhash_col(F.col("text")).alias("native"),
        dedup.simhash_signature_arrow()(F.col("text")).alias("arrow"),
    )
    assert both.filter(F.col("native") != F.col("arrow")).count() == 0


def test_pair_functions_same_result_under_both_paths(spark, sf_dir):
    df = _corpus(spark, sf_dir)
    for fn in (dedup.minhash_lsh_pairs, dedup.simhash_pairs):
        a = set(map(tuple, fn(df, signature="arrow").collect()))
        n = set(map(tuple, fn(df, signature="native").collect()))
        assert a == n, fn.__name__
    dedup.release_cached()
