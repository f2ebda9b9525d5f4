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


def test_kmeans_assignment_arrow_equals_native(spark, sf_dir):
    """Arrow argmin kernel must assign every vector to the same cell as
    the Catalyst fold (IEEE operation order replicated dim-by-dim)."""
    from opentelemetry_collector_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out_a, cents_a = similarity.kmeans_cells(emb, k=8, iters=1, assign_path="arrow")
    out_n, cents_n = similarity.kmeans_cells(emb, k=8, iters=1, assign_path="native")
    assert cents_a == cents_n  # identical centroid evolution
    a = {r["vec_id"]: r["cell"] for r in out_a.collect()}
    n = {r["vec_id"]: r["cell"] for r in out_n.collect()}
    assert a == n


def test_round_half_away_matches_spark_and_duckdb(spark):
    """The Arrow kernels' rounding must match F.round (HALF_UP) and
    DuckDB round at exact dyadic halves — np.round (half-to-even) does
    not: np.round(0.03125, 4) = 0.0312 vs 0.0313 in both engines."""
    import duckdb
    import numpy as np

    from opentelemetry_collector_spark.operators.similarity import _round_half_away

    vals = [0.03125, -0.03125, 0.0625, 1.5 / 16, 0.12345, -0.65625, 0.28125]
    ours = _round_half_away(np.array(vals), 4).tolist()
    spark_r = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in vals], "v double")
        .select(F.round("v", 4).alias("r"))
        .collect()
    ]
    duck_r = [
        duckdb.sql(f"SELECT round(CAST({v!r} AS DOUBLE), 4)").fetchone()[0]
        for v in vals
    ]
    assert ours == spark_r == duck_r
    # the banker's-rounding result would differ at the dyadic halves:
    assert ours[0] == 0.0313 and ours[1] == -0.0313


def test_embedding_pairs_same_under_both_score_paths(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(F.col("vec_id").alias("id"), "label", dbl.alias("v"))
    copies = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 500000).alias("id"), "label", dbl.alias("v")
    )
    df = base.unionByName(copies)
    a = set(map(tuple, dedup.embedding_neardup_pairs(
        df, id_col="id", vec_col="v", score_path="arrow").collect()))
    n = set(map(tuple, dedup.embedding_neardup_pairs(
        df, id_col="id", vec_col="v", score_path="native").collect()))
    assert a == n and len(a) > 0
    dedup.release_cached()
