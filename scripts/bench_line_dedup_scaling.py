"""Two-parallelism-level scaling evidence for LINE DEDUP (BASELINE.json
north_rule applied to this round's new operator): run the identical
dedup_lines job over the same 1M-page boilerplate-skewed corpus at N and
4N REAL executor JVMs (local-cluster 1x2 -> 4x2, the unsaturated pair
below the single socket's memory-bus saturation — BENCH/BASELINE.md
round-2/3 methodology) and report throughput at both plus
efficiency = (thr_4N / thr_N) / 4.

Protocol: corpus synthesized once (scripts/bench_line_dedup_scale.py
synthesis — SHARED, so the scaling pair and the robustness run can never
drift onto different corpora); each level runs in a FRESH subprocess JVM,
interleaved across SCALING_JVMS (>=2) rounds keeping the best per level
(degraded-JVM mitigation).  Serialized throughout.

    python scripts/bench_line_dedup_scaling.py [--pages 1000000]
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
from bench_line_dedup_scale import synthesize_pages  # SHARED synthesis
from py_evalfilter_spark.session import get_spark
spark = get_spark(master="local[32]", shuffle_partitions=64)
n_pages, n_base = synthesize_pages(spark, {sf_dir!r}, {work!r}, {pages}, {templates}, 128)
print(json.dumps({{"n_pages": n_pages, "n_base": n_base}}))
"""

RUNNER = r"""
import sys, json, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from py_evalfilter_spark.operators import corpus
from py_evalfilter_spark.session import get_spark
spark = get_spark(shuffle_partitions={parts})
spark.range(1000).selectExpr("sum(id)").collect()  # warm the cluster
pages = spark.read.parquet({work!r})
n_pages = pages.count()
# CPU-kernel term: the same explode + normalize + md5 over every line,
# reduced map-side to one scalar (no wide shuffle) — what a cluster's
# per-node compute contributes; the full operator adds the hash-keyed
# Exchanges, which on ONE socket share a single memory bus.  Run twice,
# report the second: the first pass pays codegen JIT + cold parquet
# footers, fixed costs that would bias the FAST level's ratio.
lines = pages.select(F.posexplode(F.split("text", "\n")).alias("idx", "line"))
k = F.md5(F.regexp_replace(F.lower("line"), r"[^\p{{L}}]+", ""))
lines.agg(F.sum(F.conv(F.substring(k, 1, 6), 16, 10))).collect()
t0 = time.perf_counter()
lines.agg(F.sum(F.conv(F.substring(k, 1, 6), 16, 10))).collect()
kernel = time.perf_counter() - t0
t0 = time.perf_counter()
out = corpus.dedup_lines(pages)
agg = out.agg(F.count(F.lit(1)).alias("n"), F.sum("n_lines_kept").alias("k"),
              F.sum("n_lines_dropped").alias("d")).collect()[0]
wall = time.perf_counter() - t0
print(json.dumps({{"n_pages": n_pages, "lines_kept": int(agg["k"]),
                   "lines_dropped": int(agg["d"]), "wall_sec": round(wall, 2),
                   "kernel_sec": round(kernel, 2),
                   "pages_per_sec": round(n_pages / wall, 1)}}))
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
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"runner failed at {master}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--templates", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/line_dedup_scaling_input")
    ap.add_argument("--jvms", type=int,
                    default=int(os.environ.get("SCALING_JVMS", "2")))
    args = ap.parse_args()

    synth = subprocess.run(
        [sys.executable, "-c",
         SYNTH.format(repo=REPO, sf_dir=args.sf_dir, pages=args.pages,
                      templates=args.templates, work=args.work_dir)],
        capture_output=True, text=True,
    )
    if synth.returncode != 0:
        sys.stderr.write(synth.stderr[-4000:])
        raise SystemExit("synthesis failed")
    n_pages = json.loads(synth.stdout.strip().splitlines()[-1])["n_pages"]
    print(f"input ready: {n_pages} pages", flush=True)

    # text payloads at 1M pages are a few hundred MB — tmpfs shuffle is
    # safe here (the >=1M-doc OOM discipline concerns multi-GB state)
    local_dirs = "/dev/shm/spark-local-linededup"
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

    eff = (best["4N"]["pages_per_sec"] / best["N"]["pages_per_sec"]) / 4.0
    keff = (best["N"]["kernel_sec"] / best["4N"]["kernel_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "line_dedup_scaling_1x2_to_4x2",
                "n_pages": n_pages,
                "thr_N_pages_per_sec": best["N"]["pages_per_sec"],
                "thr_4N_pages_per_sec": best["4N"]["pages_per_sec"],
                "wall_N_sec": best["N"]["wall_sec"],
                "wall_4N_sec": best["4N"]["wall_sec"],
                "kernel_N_sec": best["N"]["kernel_sec"],
                "kernel_4N_sec": best["4N"]["kernel_sec"],
                "efficiency": round(eff, 3),
                "kernel_efficiency": round(keff, 3),
                "jvms_per_level": args.jvms,
            }
        )
    )


if __name__ == "__main__":
    main()
