"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the whole point of each variant):

* exact          — one shuffle on a 16-byte hash; trivially scales.
* n-gram Jaccard — exact pairwise similarity but ONLY on candidate
  pairs that share a shingle (inverted-index join), never all-pairs.
  At 100 TB the shingle join is the bottleneck → cap per-shingle
  posting lists (hot shingles are stopword-ish and useless anyway).
* MinHash+LSH    — the scale path: H hash functions → B bands of R
  rows; candidates = same band key. Cost is linear in corpus size +
  bucket joins; banding thresholds tuned via (1/B)^(1/R).
* SimHash        — constant-size signature computed with array folds
  (no explode, no shuffle until the band join).
* embedding      — cosine near-dup within a coarse cell (here: label;
  at scale: k-means centroid assignment broadcast) — never all-pairs.

All hashing is md5-based so the DuckDB oracle reproduces results
bit-for-bit; no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.textstats import norm_text, words_col

# MinHash/LSH defaults: 12 signatures = 4 bands × 3 rows → s-curve
# threshold ≈ (1/4)^(1/3) ≈ 0.63 Jaccard.
MINHASH_N = 12
LSH_BANDS = 4
LSH_ROWS = 3
SIMHASH_BITS = 32


def shingles_col(c: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array column (no explode)."""
    w = words_col(c)
    # F.get is 0-based and null-safe (ANSI-proof for docs shorter than k);
    # concat_ws skips NULLs.
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(w) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", *[F.get(w, i + j) for j in range(k)]),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text
    with the kept (minimum) id and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(norm_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signature(c: Column, n_hashes: int = MINHASH_N) -> Column:
    """Array of n minhashes: min over shingles of md5(i || '|' || s).
    Pure array fold — signature computed at scan speed, no shuffle."""
    sh = shingles_col(c)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s)))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash: docs agreeing on all
    ``rows`` minhashes of any band share a bucket. Returns distinct
    (id_a < id_b) pairs with the number of matching bands."""
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), bands * rows).alias("mh"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|", F.slice(F.col("mh"), b * rows + 1, rows)
                        )
                    ).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("matching_bands"))
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_posting: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing ≥1 shingle
    (inverted-index join). ``max_posting`` drops degenerate hot
    shingles — at web scale a shingle shared by millions of docs
    carries no signal and would quadratically blow up the join."""
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles_col(F.col(text_col)).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    posting = sh.select("id", "n_sh", F.explode("sh").alias("s"))
    # drop hot shingles (posting-list cap)
    hot = (
        posting.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_posting)
        .select("s")
    )
    posting = posting.join(F.broadcast(hot), "s", "left_anti")
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_col(c: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash as a bit-string: bit j = majority vote over words of the
    parity of hex digit j of md5(word). Array-fold only — constant-size
    signature with zero shuffle (explode-free)."""
    w = words_col(c)
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda j: F.when(
                2
                * F.aggregate(
                    w,
                    F.lit(0),
                    lambda acc, x: acc
                    + F.ascii(F.md5(x).substr(j + 1, F.lit(1))) % 2,
                )
                - F.size(w)
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    band_count: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of ``band_count``
    signature bands (pigeonhole: hamming ≤ bands-1 guarantees a shared
    band), verified by exact Hamming distance."""
    bits = SIMHASH_BITS
    bw = bits // band_count
    sig = df.select(F.col(id_col).alias("id"), simhash_col(F.col(text_col)).alias("sh"))
    banded = sig.select(
        "id", "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(band_count - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.col("sh").substr(b * bw + 1, F.lit(bw)).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda i: F.col("a.sh").substr(i, F.lit(1))
            != F.col("b.sh").substr(i, F.lit(1)),
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding-cosine near-dup within a coarse cell (label here; a
    broadcast k-means assignment at scale) — the join is cell-local,
    never all-pairs."""
    from opentelemetry_collector_spark.operators.similarity import cosine_expr

    v = df.select(
        F.col(id_col).alias("id"),
        F.col(cell_col).alias("cell"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a, b = v.alias("a"), v.alias("b")
    cos = cosine_expr(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
