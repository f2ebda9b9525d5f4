"""End-to-end curation pipeline (plans/curation.py): every stage must
catch exactly its planted target, the accounting must add up, and the
written table must be the redacted survivor set."""

from __future__ import annotations

from opentelemetry_collector_spark.plans.curation import curate_corpus
from opentelemetry_collector_spark.sinks.tables import TableCatalog


def _filler(i: int, n: int = 40) -> str:
    return " ".join(f"w{i}x{j}" for j in range(n))


def test_curate_corpus_stages_and_accounting(spark, tmp_path):
    rows = [(i, _filler(i)) for i in range(26)]        # heldout ids 3, 16
    rows += [(30, _filler(900)), (31, _filler(900))]   # exact near-dup pair
    rows += [(40, _filler(3))]                         # copies heldout doc 3
    rows += [(41, "spam " * 60)]                       # repetitive
    rows += [
        (
            44,
            _filler(800)
            + " contact bob.smith@example.com via 10.1.2.3 tel +14155550123",
        )
    ]                                                  # PII, survives
    # low quality: 10 unique words → quality ≈ 0.156 but neither
    # repetition signal fires (top word 1/10, no dup 2-grams)
    rows += [(45, _filler(700, n=10))]
    # degenerate text: NULL and empty both coalesce to '' — identical,
    # so MinHash dedup claims one as a duplicate and the repetition
    # gate (top-word share 100%) claims the survivor; neither is ever
    # silently NULL-filtered out of the accounting
    rows += [(46, None), (47, "")]
    # same-id rows collapse before dedup and count as dup_removed
    rows += [(48, _filler(901)), (48, _filler(901))]
    # negative id: pmod(-10, 13) == 3 → held out
    rows += [(-10, _filler(600))]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    stats = curate_corpus(
        spark, docs, TableCatalog(spark, str(tmp_path / "wh"))
    )

    assert stats["docs_in"] == 37
    assert stats["heldout_removed"] == 3
    assert stats["dup_removed"] == 3   # 30/31, the id-dup 48 pair, 46/47
    assert stats["contaminated_removed"] == 1
    assert stats["repetitive_removed"] == 2  # spam doc + the '' survivor
    assert stats["low_quality_removed"] == 1
    assert stats["pii_redactions"] == 3
    assert stats["cc_converged"] is True and stats["cc_rounds"] >= 1
    assert stats["docs_out"] == (
        stats["docs_in"]
        - stats["heldout_removed"]
        - stats["dup_removed"]
        - stats["contaminated_removed"]
        - stats["repetitive_removed"]
        - stats["low_quality_removed"]
    )

    out = TableCatalog(spark, str(tmp_path / "wh")).read("curated_documents")
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert len(got) == stats["docs_out"]
    assert 3 not in got and 16 not in got and -10 not in got  # heldout gone
    assert 40 not in got and 41 not in got and 45 not in got
    assert 46 not in got and 47 not in got           # degenerate text gone
    assert len({30, 31} & set(got)) == 1             # one dup survivor
    assert 48 in got                                 # id-dup collapsed, kept once
    assert "<email>" in got[44] and "<ip>" in got[44] and "<phone>" in got[44]
    assert "@" not in got[44]


def test_curate_corpus_on_sf_documents(spark, sf_dir, tmp_path):
    """Smoke over the real documents table: accounting closes and the
    table lands with the survivor count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = curate_corpus(
        spark, docs, TableCatalog(spark, str(tmp_path / "wh2"))
    )
    assert stats["docs_in"] == docs.count()
    assert stats["docs_out"] > 0
    assert stats["docs_in"] == (
        stats["heldout_removed"]
        + stats["dup_removed"]
        + stats["contaminated_removed"]
        + stats["repetitive_removed"]
        + stats["low_quality_removed"]
        + stats["docs_out"]
    )
    out = TableCatalog(spark, str(tmp_path / "wh2")).read("curated_documents")
    assert out.count() == stats["docs_out"]
