"""Two-parallelism-level scaling evidence for the CURATION pipeline
(BASELINE.json north_rule applied to this round's headline operator):
run the identical curate_corpus job over the same ~1M-doc input at N and
4N REAL executor JVMs (local-cluster 1x2 -> 4x2 — the unsaturated pair,
below the single socket's memory-bus saturation, per BENCH/BASELINE.md
round-2/3 methodology) and report throughput at both plus
efficiency = (thr_4N / thr_N) / 4.

Protocol: the input corpus is synthesized once (scripts/
bench_curation_scale.py synthesis, mult=200) to a shared dir; each level
then runs in a FRESH subprocess JVM, interleaved across
SCALING_JVMS (>=2) rounds keeping the best per level (degraded-JVM
mitigation, BENCH/BASELINE.md).  Serialized throughout.

    python scripts/bench_curation_scaling.py [--mult 200]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SYNTH = r"""
import sys, json
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
from bench_curation_scale import synthesize_replicated_corpus  # SHARED synthesis
from py_evalfilter_spark.session import get_spark
spark = get_spark(master="local[32]", shuffle_partitions=64)
synthesize_replicated_corpus(spark, {sf_dir!r}, {work!r}, {mult}, 128)
print(json.dumps({{"n_docs": spark.read.parquet({work!r} + "/documents.parquet").count()}}))
"""

RUNNER = r"""
import sys, json, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
from bench_curation_scale import CONSUME_PACKED  # un-prunable aggregation
from py_evalfilter_spark.pinning import PinScope
from py_evalfilter_spark.plans import curation
from py_evalfilter_spark.session import get_spark
spark = get_spark(shuffle_partitions={parts})
spark.range(1000).selectExpr("sum(id)").collect()  # warm the cluster
n_docs = spark.read.parquet({work!r} + "/documents.parquet").count()
t0 = time.perf_counter()
with PinScope() as pins:
    out = curation.curate_corpus(spark, {work!r}, budget=256, pins=pins)
    n = int(out.selectExpr(*CONSUME_PACKED).collect()[0]["n"])
wall = time.perf_counter() - t0
print(json.dumps({{"n_docs": n_docs, "rows_packed": n, "wall_sec": round(wall, 2),
                   "docs_per_sec": round(n_docs / wall, 1)}}))
"""


def run_level(master: str, cores: int, work: str, local_dirs: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=master,
        SPARK_GRAFT_EXECUTOR_MEMORY="20g",
        SPARK_LOCAL_DIRS=local_dirs,
        SPARK_DRIVER_MEMORY="8g",
    )
    code = RUNNER.format(repo=REPO, work=work, parts=4 * cores)
    out = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"runner failed at {master}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=200)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/cur_scaling_input")
    ap.add_argument("--jvms", type=int, default=int(os.environ.get("SCALING_JVMS", "2")))
    args = ap.parse_args()

    os.makedirs(args.work_dir, exist_ok=True)
    synth = subprocess.run(
        [sys.executable, "-c", SYNTH.format(repo=REPO, sf_dir=args.sf_dir, mult=args.mult, work=args.work_dir)],
        capture_output=True, text=True,
    )
    if synth.returncode != 0:
        sys.stderr.write(synth.stderr[-4000:])
        raise SystemExit("synthesis failed")
    n_docs = json.loads(synth.stdout.strip().splitlines()[-1])["n_docs"]
    print(f"input ready: {n_docs} docs", flush=True)

    # tmpfs shuffle dirs are fast but /dev/shm claims HOST ram — at >=1M
    # docs that was a measured kernel OOM (CLAUDE.md big-run discipline;
    # ADVICE r4).  Gate on the ACTUAL synthesized doc count.
    local_dirs = (
        "/dev/shm/spark-local" if n_docs < 1_000_000 else "/tmp/spark-local-scaling"
    )
    os.makedirs(local_dirs, exist_ok=True)

    specs = {
        "N": ("local-cluster[1,2,22528]", 2),
        "4N": ("local-cluster[4,2,22528]", 8),
    }
    best: dict[str, dict] = {}
    for r in range(args.jvms):
        for name, (master, cores) in specs.items():
            res = run_level(master, cores, args.work_dir, local_dirs)
            print(f"round {r} {name} ({master}): {res}", flush=True)
            if name not in best or res["wall_sec"] < best[name]["wall_sec"]:
                best[name] = res
            time.sleep(3)

    eff = (best["4N"]["docs_per_sec"] / best["N"]["docs_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "curation_scaling_1x2_to_4x2",
                "n_docs": n_docs,
                "thr_N_docs_per_sec": best["N"]["docs_per_sec"],
                "thr_4N_docs_per_sec": best["4N"]["docs_per_sec"],
                "wall_N_sec": best["N"]["wall_sec"],
                "wall_4N_sec": best["4N"]["wall_sec"],
                "efficiency": round(eff, 3),
                "jvms_per_level": args.jvms,
            }
        )
    )


if __name__ == "__main__":
    main()
