"""Profiles signal — dictionary+sample model (operators/profiles.py;
reference model at pdata/pprofile/generated_profilesdictionary.go,
generated_sample.go, dictionary_helpers.go)."""

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import profiles


def _mini_parsed(spark):
    rows = [
        ("c1", 0, 100, "search", 50.0),
        ("c1", 1, 110, None, 20.0),       # 'none' frame
        ("c1", 2, 120, "python", None),   # value 0 sample
        ("c2", 0, 200, "search", 10.0),   # shares the depth-1 stack key
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ts_s long, tool_parsed string, "
        "latency_ms double",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s")))


def test_dense_index_is_dense_lexicographic(spark):
    df = spark.createDataFrame(
        [(s,) for s in ["m", "a", "z", "k"]], "s string"
    )
    out = {
        r["s"]: r["i"]
        for r in profiles.dense_index(df, "s", "i").collect()
    }
    assert out == {"a": 0, "k": 1, "m": 2, "z": 3}


def test_dictionary_tables_shapes(spark):
    t = profiles.dictionary_tables(_mini_parsed(spark))
    strings = {r["s"]: r["strindex"] for r in t["strings"].collect()}
    # lexicographic dense indices over the distinct frame names
    assert strings == {"none": 0, "python": 1, "search": 2}
    # c1 turn0 and c2 turn0 share the stack 'search' -> 3 distinct
    # stacks for 4 samples
    assert t["stacks"].count() == 3
    assert t["samples"].count() == 4
    # stack location indices resolve leaf-first
    stacks = {
        tuple(r["location_idxs"]): r["stack_idx"]
        for r in t["stacks"].collect()
    }
    assert (2,) in stacks                    # 'search'
    assert (0, 2) in stacks                  # 'none;search'
    assert (1, 0, 2) in stacks               # 'python;none;search'


def test_resolve_samples_round_trip(spark):
    """Resolution through stack → location → function → string
    reproduces the direct leaf-first tool path for every sample
    (the dictionary_helpers.go resolution pass)."""
    out = {
        (r["conv_id"], r["turn_idx"]): (
            r["path"], r["leaf_fn"], r["stack_depth"], r["value_us"]
        )
        for r in profiles.resolve_samples(
            profiles.dictionary_tables(_mini_parsed(spark))
        ).collect()
    }
    assert out == {
        ("c1", 0): ("search", "search", 1, 50000),
        ("c1", 1): ("none;search", "none", 2, 20000),
        ("c1", 2): ("python;none;search", "python", 3, 0),
        ("c2", 0): ("search", "search", 1, 10000),
    }
