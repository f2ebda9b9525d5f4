"""Scaling-efficiency evidence harness (BASELINE.json north rule).

The rule asks for throughput at two cluster sizes (N and 4N executors)
with scaling efficiency >= 0.8. No real cluster exists in this sandbox,
so per the driver contract we evidence it by running the SAME job on the
SAME input at two parallelism levels — local[8] and local[32] — each in
a fresh JVM (subprocess) so no executor state leaks between measurements.

The measured job is the compute-only flagship pipeline
(parse -> enrich -> route -> hourly accounting) over a deterministic
synthetic transcripts table generated JVM-side with a FIXED partition
count, so both runs execute byte-identical work; only core count varies.

Usage:
    python bench_scaling.py                 # full comparison -> JSON line
    python bench_scaling.py --update-md     # also refresh BASELINE.md section
    python bench_scaling.py --worker 8      # internal: one measurement

Efficiency definition (standard strong scaling):
    eff = (tps_high / tps_low) / (cores_high / cores_low)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

LOW_CPUS = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "8"))
HIGH_CPUS = int(os.environ.get("SPARK_GRAFT_SCALE_HIGH", "32"))
# Fixed so both parallelism levels run identical partitions of identical
# data; 128 input splits keep 32 cores busy (4 waves) and 8 cores busy
# (16 waves) with no tail-skew artifacts.
INPUT_PARTITIONS = 128
SHUFFLE_PARTITIONS = 128
N_CONVERSATIONS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "200000"))
MEAN_TURNS = 16
HOT_CONVERSATIONS = 3
HOT_TURNS = 20_000
N_TURNS = N_CONVERSATIONS * MEAN_TURNS + HOT_CONVERSATIONS * HOT_TURNS
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))


def _run_once(spark) -> float:
    """One timed end-to-end pass; returns wall seconds."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators import aggregate as agg_ops
    from opentelemetry_collector_spark.operators import enrich as enrich_ops
    from opentelemetry_collector_spark.operators import parse as parse_ops
    from opentelemetry_collector_spark.operators import route as route_ops
    from opentelemetry_collector_spark.sources import (
        role_lookup_df,
        synth_transcripts,
        tool_lookup_df,
    )

    t = synth_transcripts(
        spark,
        n_conversations=N_CONVERSATIONS,
        mean_turns=MEAN_TURNS,
        hot_conversations=HOT_CONVERSATIONS,
        hot_turns=HOT_TURNS,
        partitions=INPUT_PARTITIONS,
    )
    parsed = parse_ops.parse_stage(t).filter(F.col("parse_ok"))
    enriched = enrich_ops.enrich_stage(parsed, tool_lookup_df(spark), role_lookup_df(spark))
    routed = route_ops.route_stage(enriched)
    agg = agg_ops.hourly_sink_accounting(routed)
    t0 = time.monotonic()
    agg.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def worker(cpus: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from opentelemetry_collector_spark.session import get_spark

    spark = get_spark(
        app_name=f"otelcol-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
    )
    # warmup pass compiles/loads codegen + parquet-free plan once
    _run_once(spark)
    secs = [_run_once(spark) for _ in range(REPEATS)]
    best = min(secs)
    print(json.dumps({
        "cpus": cpus,
        "sec": round(best, 3),
        "all_secs": [round(s, 3) for s in secs],
        "turns": N_TURNS,
        "turns_per_sec": round(N_TURNS / best, 1),
    }))
    spark.stop()


def measure(cpus: int) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
        capture_output=True, text=True, env=env, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


MD_MARKER = "## Scaling evidence (measured in-sandbox)"


def update_baseline_md(result: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    with open(path) as f:
        text = f.read()
    lo, hi = result["low"], result["high"]
    section = f"""{MD_MARKER}

Per the driver contract, the north rule's two-cluster-size criterion is
evidenced by running the identical job (compute-only parse → enrich →
route → hourly accounting over {N_TURNS:,} deterministic synthetic turns,
{INPUT_PARTITIONS} fixed input partitions, {SHUFFLE_PARTITIONS} shuffle
partitions, skewed hot conversations included) at two parallelism levels
in fresh JVMs (`python bench_scaling.py`):

| parallelism | wall sec (best of {REPEATS}) | turns/sec |
|---|---|---|
| local[{lo["cpus"]}] | {lo["sec"]} | {lo["turns_per_sec"]:,} |
| local[{hi["cpus"]}] | {hi["sec"]} | {hi["turns_per_sec"]:,} |

Scaling efficiency {lo["cpus"]}→{hi["cpus"]} cores =
(tps_{hi["cpus"]}/tps_{lo["cpus"]}) / ({hi["cpus"]}/{lo["cpus"]}) =
**{result["scaling_efficiency"]}** (target ≥ 0.8).
"""
    if MD_MARKER in text:
        head = text.split(MD_MARKER)[0].rstrip() + "\n\n"
    else:
        head = text.rstrip() + "\n\n"
    with open(path, "w") as f:
        f.write(head + section)


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    low = measure(LOW_CPUS)
    high = measure(HIGH_CPUS)
    speedup = high["turns_per_sec"] / low["turns_per_sec"]
    eff = speedup / (HIGH_CPUS / LOW_CPUS)
    result = {
        "metric": "scaling efficiency local[%d] -> local[%d]" % (LOW_CPUS, HIGH_CPUS),
        "low": low,
        "high": high,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "turns": N_TURNS,
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    if "--update-md" in sys.argv:
        update_baseline_md(result)


if __name__ == "__main__":
    main()
