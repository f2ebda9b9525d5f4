"""End-to-end corpus curation: the nightly job a pretraining corpus
runs, composed entirely from the already-oracled operators —

  held-out eval split → near-dup dedup (MinHash/LSH + keep-one) →
  benchmark decontamination → repetition gate → quality gate →
  PII redaction → curated table,

with per-stage removal accounting. Cost model: ONE aggregate action
over the flagged frame (conditional sums attribute every removal to
the first stage that claimed it) plus the observed sink write; the
flagged frame is persisted so the two actions share the join work.
At 100 TB each stage is the same bucketed/broadcast plan its
standalone oracle query runs — composition adds joins on the doc id,
nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    catalog,
    quality_min: float = 0.5,
    heldout_mod: int = 13,
    heldout_rem: int = 3,
    table: str = "curated_documents",
) -> dict:
    """Run the full curation pipeline over ``docs`` (doc_id, text,
    ...), write survivors to ``table`` via ``catalog`` and return the
    per-stage accounting dict. Stages cascade: a document removed by
    decontamination is not re-counted by the repetition or quality
    gates."""
    from opentelemetry_collector_spark.operators import dedup, textstats

    heldout = (F.col("doc_id") % heldout_mod) == heldout_rem
    bench = docs.filter(heldout).select("text")
    train = docs.filter(~heldout)

    pairs = dedup.minhash_lsh_pairs(train)
    kept = dedup.dedup_survivors(train, pairs)

    scored = textstats.lang_id(
        textstats.quality_score(textstats.token_count(kept))
    )
    rep = textstats.repetition_stats(kept, id_col="doc_id").select(
        "doc_id", "flag_repetitive"
    )
    cont = (
        dedup.contamination_overlap(kept, bench)
        .filter(F.col("flag_contaminated") == 1)
        .select("doc_id")
        .withColumn("_cont", F.lit(1))
    )
    red = textstats.redact_pii(kept, id_col="doc_id").select(
        "doc_id", "redacted", "n_emails", "n_ips", "n_phones"
    )
    combined = dedup._persist(
        scored.join(rep, "doc_id")
        .join(red, "doc_id")
        .join(cont, "doc_id", "left")
        .withColumn("_cont", F.coalesce("_cont", F.lit(0)))
    )

    lowq = F.col("quality") < quality_min
    not_cont = F.col("_cont") == 0
    not_rep = F.col("flag_repetitive") == 0
    keep = not_cont & not_rep & ~lowq
    npii = F.col("n_emails") + F.col("n_ips") + F.col("n_phones")

    row0 = docs.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.coalesce(F.sum(heldout.cast("int")), F.lit(0)).alias("n_heldout"),
    ).first()
    row1 = combined.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.coalesce(F.sum("_cont"), F.lit(0)).alias("n_cont"),
        F.coalesce(
            F.sum((not_cont & ~not_rep).cast("int")), F.lit(0)
        ).alias("n_rep"),
        F.coalesce(
            F.sum((not_cont & not_rep & lowq).cast("int")), F.lit(0)
        ).alias("n_lowq"),
        F.coalesce(
            F.sum(F.when(keep, npii).otherwise(F.lit(0))), F.lit(0)
        ).alias("n_pii"),
    ).first()

    obs = Observation("curated")
    out = combined.filter(keep).select(
        "doc_id",
        F.col("redacted").alias("text"),
        "n_tokens",
        "quality",
        "lang_guess",
    )
    catalog.overwrite(table, out.observe(obs, F.count(F.lit(1)).alias("n")))
    n_out = obs.get["n"]
    dedup.release_cached()

    n_in, n_heldout = int(row0["n_in"]), int(row0["n_heldout"])
    n_kept = int(row1["n_kept"])
    return {
        "docs_in": n_in,
        "heldout_removed": n_heldout,
        "dup_removed": n_in - n_heldout - n_kept,
        "contaminated_removed": int(row1["n_cont"]),
        "repetitive_removed": int(row1["n_rep"]),
        "low_quality_removed": int(row1["n_lowq"]),
        "pii_redactions": int(row1["n_pii"]),
        "docs_out": int(n_out),
        "quality_min": quality_min,
        "table": table,
    }
