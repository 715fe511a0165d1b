#!/usr/bin/env python
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default all cores).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

The flagship `pipeline` query is the end-to-end feature pipeline whose
turns/sec is the BASELINE.json headline metric; the rest cover each operator
family.  Timing excludes JVM/session startup (a fixed cost the cluster
amortizes) and includes full query execution to a count/collect action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_evalfilter_spark.plans import driver_queries as dq  # noqa: E402
from py_evalfilter_spark.plans.pipeline import feature_pipeline  # noqa: E402
from py_evalfilter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "groupby_stats",
    "broadcast_join_agg",
    "topk_vocab",
    "lag_lead",
    "sessionize",
    "session_agg",
    "asof_join",
    "dedup_fuzzy_window",
    "quality_score",
    "knn_cosine",
    "rant_stats_features",
]


def main() -> None:
    spark = get_spark(app_name="bench")
    # warm the JVM + Python workers so fixed startup doesn't pollute timings
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    out = feature_pipeline(spark, SF_DIR)
    # aggregate a feature column: a bare count() lets Catalyst prune the
    # (scalar, side-effect-free) feature UDF entirely — which is correct
    # engine behavior, but would benchmark nothing
    row = out.selectExpr("count(*) AS n", "sum(tokens) AS s").collect()[0]
    n_turns = row["n"]
    pipeline_sec = time.perf_counter() - t0
    timings["pipeline"] = round(pipeline_sec, 3)

    for name in BENCH_QUERIES:
        q = dq.QUERIES[name]
        t0 = time.perf_counter()
        q(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": n_turns,
        "turns_per_sec": round(n_turns / pipeline_sec, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
