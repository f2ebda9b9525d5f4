"""Similarity search over embedding columns (array<float>).

* :func:`brute_force_topk` — exact cosine top-k, the correctness
  baseline. Cross join of queries × corpus; fine when the query set is
  small and broadcastable (the common "find neighbors for this batch"
  shape), unacceptable for all-pairs at scale.
* :func:`ivf_topk` — the scale path: an IVF-style coarse quantizer
  restricts the search to the query's cell. Here the cell assignment
  is the pre-existing ``label`` column; on a real corpus it is a
  k-means centroid id assigned by a broadcast argmin — either way the
  join is cell-co-partitioned instead of all-pairs, which is what
  makes 100 TB feasible. LSH bucketing (random hyperplanes) is the
  other standard cell function; see dedup.simhash for the banding
  machinery it would reuse.

Dot products are Spark array folds (``aggregate``/``zip_with``) in
double precision — JVM-vectorized, no Python, and the sequential fold
order matches DuckDB's ``list_dot_product`` for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; ties broken by neighbor id for full
    determinism. Queries are broadcast (small side by construction)."""
    c = corpus.select(
        F.col(id_col).alias("nbr_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("nbr_id")).select(
        "query_id",
        "nbr_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cos")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell. Recall < 1.0
    by design; the probe count (here 1 cell) is the recall/cost knob."""
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(cell_col).alias("cell"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("qcell"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("cell") == F.col("qcell")) & (F.col("query_id") != F.col("nbr_id")),
    ).select(
        "query_id",
        "nbr_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cos")
    )
