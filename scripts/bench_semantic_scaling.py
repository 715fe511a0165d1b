"""Two-parallelism-level scaling evidence for the SEMANTIC family
(BASELINE.json north_rule applied to this round's headline operators):
run the identical kmeans_fit(k) + semdedup_pairs job over the same
1M-vector corpus at N and 4N REAL executor JVMs (local-cluster
1x2 -> 4x2 — the unsaturated pair, below the single socket's memory-bus
saturation, per BENCH/BASELINE.md round-2/3 methodology) and report
throughput at both plus efficiency = (thr_4N / thr_N) / 4.

Protocol mirrors scripts/bench_curation_scaling.py: corpus synthesized
once to a shared dir (bench_semantic_scale.synthesize — same md5-uniform
clustered corpus the per-k sweep used); each level runs in a FRESH
subprocess JVM, interleaved across >=2 rounds keeping the best per level
(degraded-JVM mitigation).  Serialized throughout.

    python scripts/bench_semantic_scaling.py [--k 256]
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
import sys, json, os
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
from bench_semantic_scale import synthesize  # SHARED synthesis
from py_evalfilter_spark.session import get_spark
spark = get_spark(master="local[32]", shuffle_partitions=64)
if not os.path.exists({src!r}):
    synthesize(spark, {n}, 64, 128, 500, 64).write.mode("overwrite").parquet({src!r})
print(json.dumps({{"n_vecs": spark.read.parquet({src!r}).count()}}))
"""

RUNNER = r"""
import sys, json, time
sys.path.insert(0, {repo!r})
from py_evalfilter_spark.operators import clustering
from py_evalfilter_spark.pinning import PinScope
from py_evalfilter_spark.session import get_spark
spark = get_spark(shuffle_partitions={parts})
spark.range(1000).selectExpr("sum(id)").collect()  # warm the cluster
emb = spark.read.parquet({src!r})
n_vecs = emb.count()
t0 = time.perf_counter()
# pin_input=False: the input is a bare parquet scan (the SemDeDup setting -
# precomputed embeddings on storage), and a columnar re-scan of the vector
# column beats materializing + deserializing an id+vec cache 3x (measured:
# 1x1 fit 29.4 -> 26.2 s, 4x1 11.4-18.5 -> 9.0-10.4 s, identical centroids)
cents = clustering.kmeans_fit(emb, k={k}, iters=2, seed=42, pin_input=False)
t1 = time.perf_counter()
with PinScope() as pins:
    pairs = clustering.semdedup_pairs(
        emb, cents, threshold=0.999, pins=pins, max_candidate_mass=2 * 10**10
    )
    # count() is honest here: the cosine filter consumes the pair values
    n_pairs = pairs.count()
t2 = time.perf_counter()
wall = t2 - t0
print(json.dumps({{"n_vecs": n_vecs, "n_pairs": n_pairs,
                   "fit_sec": round(t1 - t0, 2),
                   "pairs_sec": round(t2 - t1, 2),
                   "wall_sec": round(wall, 2),
                   "vecs_per_sec": round(n_vecs / wall, 1)}}))
"""


def run_level(master: str, cores: int, src: str, local_dirs: str, k: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=master,
        SPARK_GRAFT_EXECUTOR_MEMORY="20g",
        SPARK_LOCAL_DIRS=local_dirs,
        SPARK_DRIVER_MEMORY="8g",
        # pin driver-side numpy too (executors are pinned by get_spark's
        # executorEnv): un-pinned BLAS threads let the 2-core level use ~4
        # cores in the matmul stages and corrupt the efficiency ratio
        OPENBLAS_NUM_THREADS="1",
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    code = RUNNER.format(repo=REPO, src=src, parts=4 * cores, k=k)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"runner failed at {master}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--work-dir", default="/tmp/semantic_scale")
    ap.add_argument(
        "--jvms", type=int, default=int(os.environ.get("SCALING_JVMS", "2"))
    )
    ap.add_argument(
        "--cores-per-executor",
        type=int,
        default=2,
        help="cores per executor JVM at both levels.  1 gives the "
        "lowest-contention pair (1x1 -> 4x1): the BLAS+scan kernel is "
        "bandwidth/turbo-derated ~18-25%% per core at 8-way occupancy on "
        "this VM (measured Spark-free — see BENCH/BASELINE.md round 5), "
        "so wider executors measure the host ceiling, not the engine.",
    )
    args = ap.parse_args()

    src = f"{args.work_dir}/emb_{args.n}"
    synth = subprocess.run(
        [sys.executable, "-c", SYNTH.format(repo=REPO, src=src, n=args.n)],
        capture_output=True,
        text=True,
    )
    if synth.returncode != 0:
        sys.stderr.write(synth.stderr[-4000:])
        raise SystemExit("synthesis failed")
    n_vecs = json.loads(synth.stdout.strip().splitlines()[-1])["n_vecs"]
    print(f"input ready: {n_vecs} vectors", flush=True)

    # tmpfs shuffle dir, deliberately: both cluster sizes on this ONE box
    # share a single physical disk, so a disk-routed shuffle is a fixed
    # cost that CANNOT scale with executors — an artifact of the sandbox,
    # not the engine (on a real 4N cluster each node brings its own disks
    # and shuffle bandwidth scales with N; same reasoning as the
    # memory-bus-saturation exclusion in BENCH/BASELINE.md round 2).  The
    # payload here is ~0.5-1 GB of 64-dim vectors — far under the ≥1M-DOC
    # text-corpus threshold where tmpfs claimed enough host RAM to OOM the
    # kernel (CLAUDE.md big-run discipline).
    local_dirs = "/dev/shm/spark-local-scaling"
    os.makedirs(local_dirs, exist_ok=True)

    c = args.cores_per_executor
    specs = {
        "N": (f"local-cluster[1,{c},22528]", c),
        "4N": (f"local-cluster[4,{c},22528]", 4 * c),
    }
    best: dict[str, dict] = {}
    for r in range(args.jvms):
        for name, (master, cores) in specs.items():
            res = run_level(master, cores, src, local_dirs, args.k)
            print(f"round {r} {name} ({master}): {res}", flush=True)
            if name not in best or res["wall_sec"] < best[name]["wall_sec"]:
                best[name] = res
            time.sleep(3)

    if best["N"]["n_pairs"] != best["4N"]["n_pairs"]:
        raise SystemExit(
            f"determinism violation across parallelism: {best}"
        )
    eff = (best["4N"]["vecs_per_sec"] / best["N"]["vecs_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": f"semantic_scaling_1x{c}_to_4x{c}",
                "n_vecs": n_vecs,
                "k": args.k,
                "n_pairs": best["N"]["n_pairs"],
                "thr_N_vecs_per_sec": best["N"]["vecs_per_sec"],
                "thr_4N_vecs_per_sec": best["4N"]["vecs_per_sec"],
                "wall_N_sec": best["N"]["wall_sec"],
                "wall_4N_sec": best["4N"]["wall_sec"],
                "efficiency": round(eff, 3),
                "jvms_per_level": args.jvms,
            }
        )
    )


if __name__ == "__main__":
    main()
