"""Exponential histogram: bucket-mapping unit vectors + DuckDB parity
on the shared-SQL twin."""

from __future__ import annotations

import duckdb

from opentelemetry_collector_spark.operators import exphist


def test_bucket_mapping_scale0(spark):
    """scale 0 = plain powers of two, boundaries (2^i, 2^(i+1)]:
    exact powers land in the LOWER bucket (v <= base^(i+1))."""
    rows = [("t", v) for v in [0.0, 0.25, 0.5, 1.0, 1.5, 2.0, 2.5, 4.0,
                               1000.0, -3.0, None]]
    df = spark.createDataFrame(rows, "tool string, v double")
    out = {
        (r["sign"], r["idx"]): r["n"]
        for r in exphist.exponential_histogram(df, "v", scale=0).collect()
    }
    assert out[(0, None)] == 1          # 0.0
    assert out[(1, -3)] == 1            # 0.25 -> (2^-3, 2^-2]
    assert out[(1, -2)] == 1            # 0.5
    assert out[(1, -1)] == 1            # 1.0 (exact power -> lower)
    assert out[(1, 0)] == 2             # 1.5, 2.0
    assert out[(1, 1)] == 2             # 2.5, 4.0
    assert out[(1, 9)] == 1             # 1000 -> (512, 1024]
    assert out[(-1, 1)] == 1            # -3 mirrors |v| into sign -1
    assert sum(out.values()) == 10      # NULL ignored


def test_bucket_bounds_scale2(spark):
    df = spark.createDataFrame([("t", 3.0)], "tool string, v double")
    (r,) = exphist.exponential_histogram(df, "v", scale=2).collect()
    # base = 2^(1/4); idx = ceil(log2(3)*4)-1 = ceil(6.339)-1 = 6
    assert r["idx"] == 6
    assert abs(r["lo"] - 2.0 ** (6 / 4)) < 1e-6
    assert abs(r["hi"] - 2.0 ** (7 / 4)) < 1e-6


def test_downscale_nesting_property(spark):
    """Scale-s boundaries nest in scale-(s+k) boundaries, so a
    downscaled histogram must equal one computed directly at the
    coarser scale — including negative indexes (arithmetic shift) and
    the zero bucket."""
    vals = [0.0, 0.0625, 0.3, 1.0, 1.5, 2.0, 3.9, 4.0, 123.456, -7.5,
            1e6, 1e-6]
    df = spark.createDataFrame(
        [("t", v) for v in vals], "tool string, v double"
    )
    h3 = exphist.exponential_histogram(df, "v", scale=3)
    down = {
        (r["sign"], r["idx"]): (r["n"], r["lo"], r["hi"])
        for r in exphist.downscale(h3, 3, 1).collect()
    }
    direct = {
        (r["sign"], r["idx"]): (r["n"], r["lo"], r["hi"])
        for r in exphist.exponential_histogram(df, "v", scale=1).collect()
    }
    assert down == direct

    import pytest

    with pytest.raises(ValueError, match="must be >="):
        exphist.downscale(h3, 1, 3)


def test_merge_histograms(spark):
    """Merging a scale-3 and a scale-1 histogram downscales the finer
    operand and sums bucket counts — equal to histogramming the unioned
    values directly at the coarser scale."""
    va = [1.0, 2.5, 0.0, 9.0]
    vb = [2.5, 64.0, 0.1]
    da = spark.createDataFrame([("t", v) for v in va], "tool string, v double")
    db = spark.createDataFrame([("t", v) for v in vb], "tool string, v double")
    ha = exphist.exponential_histogram(da, "v", scale=3)
    hb = exphist.exponential_histogram(db, "v", scale=1)
    merged, scale = exphist.merge_histograms(ha, hb, 3, 1)
    assert scale == 1
    got = {(r["sign"], r["idx"]): r["n"] for r in merged.collect()}
    both = spark.createDataFrame(
        [("t", v) for v in va + vb], "tool string, v double"
    )
    want = {
        (r["sign"], r["idx"]): r["n"]
        for r in exphist.exponential_histogram(both, "v", scale=1).collect()
    }
    assert got == want


def test_duckdb_twin_parity(spark):
    """The shared SQL twin must bucket identically to the Spark
    operator over values engineered to sit on and around boundaries."""
    vals = [0.0, 1.0, 2.0, 4.0, 1.0001, 3.9999, 123.456, 0.0625,
            -8.0, 7.5, 1e9, 1e-9]
    rows = [("a" if i % 2 else "b", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "tool string, v double")
    got = {
        (r["tool"], r["sign"], r["idx"]): (r["n"], r["lo"], r["hi"])
        for r in exphist.exponential_histogram(df, "v", scale=2).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}', {v!r})" for t, v in rows)
        + ") AS t(tool, v)"
    )
    sql = exphist.exponential_histogram_sql("pts", "v", scale=2)
    want = {
        (t, s, i): (n, lo, hi)
        for t, s, i, n, lo, hi in con.execute(sql).fetchall()
    }
    assert set(got) == set(want)
    for k, (n, lo, hi) in want.items():
        gn, glo, ghi = got[k]
        assert gn == n
        if lo is None:
            assert glo is None and ghi is None
        else:
            assert abs(glo - lo) < 1e-9 and abs(ghi - hi) < 1e-9
