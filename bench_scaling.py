#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per BASELINE.md we run the SAME
job at two parallelism levels — local[8] (N) and local[32] (4N) — on the
same sf0.1 input, in separate JVMs, and report turns/sec at both plus
efficiency = (thr_4N / thr_N) / 4.  Appends the measured table to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))
# Replicate events into MULTIPLIER× distinct conversations so the job is
# compute-bound rather than stage-latency-bound (100k rows finish in ~4s and
# measure scheduler overhead, not scaling).  Replication adds conversations,
# not conversation length — the realistic axis at 10^12-turn scale.
MULTIPLIER = int(os.environ.get("SCALING_MULTIPLIER", "50"))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from py_evalfilter_spark.session import get_spark
from py_evalfilter_spark.plans import driver_queries as dq
from py_evalfilter_spark.plans.pipeline import feature_pipeline_from_df
spark = get_spark(app_name="bench_scaling")
spark.range(1000).selectExpr("sum(id)").collect()
ev = spark.read.parquet({sf_dir!r} + "/events.parquet")
k = {mult}
if k > 1:
    # split the single input file across tasks BEFORE exploding so the
    # k-fold replication itself parallelizes (else it is one serial task)
    ev = ev.repartition(128)
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("rep")
    ev = (ev.select("*", reps)
            .withColumn("user_id", F.col("user_id") + F.col("rep").cast("long") * 10_000_000)
            .withColumn("event_id", F.col("event_id") + F.col("rep").cast("long") * 1_000_000_000)
            .drop("rep"))
t = dq.transcripts_from_events(ev)
p = dq.profile_from_events(ev)
best = None
for _ in range({repeats}):
    t0 = time.perf_counter()
    n = feature_pipeline_from_df(t, p).count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"rows": n, "sec": round(best, 3)}}))
"""


def run_level(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    code = RUNNER.format(repo=REPO, sf_dir=SF_DIR, mult=MULTIPLIER, repeats=REPEATS)
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"runner failed at local[{cpus}]")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def hardware_ceiling() -> float:
    """Measured pure-CPU scaling ceiling of this VM (8→32 python processes).

    The sandbox VM does not deliver a full 4x from 4x processes even for
    embarrassingly-parallel pure-Python compute; report that ceiling next to
    the engine's efficiency so the engine isn't blamed for the box.
    """
    import multiprocessing as mp

    walls = {}
    for procs in (8, 32):
        with mp.Pool(procs) as pool:
            t0 = time.perf_counter()
            pool.map(_burn, [3_000_000] * 128)
            walls[procs] = time.perf_counter() - t0
    return round((walls[8] / walls[32]) / 4.0, 3)


JVMS_PER_LEVEL = int(os.environ.get("SCALING_JVMS", "2"))


def main() -> None:
    levels: dict[int, dict] = {}
    # interleave levels across fresh JVMs; keep the best JVM per level
    # (occasional JVMs land in a degraded state on this VM — 3-7x slower —
    # so a single sample per level is meaningless)
    for _ in range(JVMS_PER_LEVEL):
        for cpus in (8, 32):
            r = run_level(cpus)
            cur = levels.get(cpus)
            if cur is None or r["sec"] < cur["sec"]:
                levels[cpus] = r
            print(f"local[{cpus}]: {r['rows']} turns in {r['sec']}s")
    for cpus, r in levels.items():
        r["turns_per_sec"] = round(r["rows"] / r["sec"], 1)
    eff = round((levels[32]["turns_per_sec"] / levels[8]["turns_per_sec"]) / 4.0, 3)
    ceiling = hardware_ceiling()
    result = {
        "sf_dir": SF_DIR,
        "multiplier": MULTIPLIER,
        "N_cores": 8,
        "4N_cores": 32,
        "thr_N": levels[8]["turns_per_sec"],
        "thr_4N": levels[32]["turns_per_sec"],
        "scaling_efficiency": eff,
        "hardware_ceiling_efficiency": ceiling,
        "normalized_efficiency": round(eff / ceiling, 3) if ceiling else None,
    }
    print(json.dumps(result))

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    path = f"{REPO}/BENCH/BASELINE.md"
    header_needed = not os.path.exists(path)
    with open(path, "a") as fp:
        if header_needed:
            fp.write(
                "# BENCH/BASELINE — measured numbers\n\n"
                "End-to-end feature-pipeline throughput (events-derived transcripts →\n"
                "Arrow feature map → windowed features → as-of merge → count), same\n"
                "input at two parallelism levels (local[8] = N, local[32] = 4N standing\n"
                "in for N vs 4N executors per BASELINE.md), best of repeats, JVM\n"
                "startup excluded.\n\n"
                "| input | rows | thr @ local[8] (turns/s) | thr @ local[32] (turns/s) | efficiency (thr4N/thrN)/4 | HW ceiling (pure-CPU 8->32) | normalized |\n"
                "|---|---|---|---|---|---|---|\n"
            )
        fp.write(
            f"| {SF_DIR} x{MULTIPLIER} | {levels[32]['rows']} | {levels[8]['turns_per_sec']} | "
            f"{levels[32]['turns_per_sec']} | {eff} | {ceiling} | {result['normalized_efficiency']} |\n"
        )


if __name__ == "__main__":
    main()
