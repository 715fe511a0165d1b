"""dedup_lines (CCNet line-level dedup) at scale with real boilerplate
skew: 1M four-line pages where the header and footer lines are drawn from
20 templates each (≈50k occurrences per template — the hot-key case the
operator's no-window skew contract exists for) and the two middle lines
are page-unique.  Expected structure is exactly checkable: every
boilerplate occurrence past the first is dropped, every unique line kept,
so sum(n_lines_dropped) = 2·pages − kept_boilerplate_firsts.

    python scripts/bench_line_dedup_scale.py [--pages 1000000]

One JSON line.  Never run concurrently with another Spark workload.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_pages(
    spark, sf_dir: str, out_path: str, pages: int, templates: int,
    partitions: int,
) -> tuple[int, int]:
    """Write the boilerplate-skewed page corpus; returns (n_pages, n_base).
    Shared by the 1M robustness run and the scaling pair (same corpus
    discipline as bench_curation_scale.synthesize_replicated_corpus)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    mult = max(1, pages // n_base)
    t = templates
    # header/footer cycle over t templates; middle lines carry the page id
    out = (
        base.repartition(partitions)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat_ws(
                "\n",
                F.concat(F.lit("subscribe to newsletter variant "),
                         (F.col("doc_id") % t).cast("string")),
                F.concat(F.col("text"), F.lit(" uniq "),
                         (F.col("doc_id") + F.col("rep") * 10_000_000).cast("string")),
                F.concat(F.lit("page body two "),
                         (F.col("doc_id") + F.col("rep") * 10_000_000).cast("string"),
                         F.lit(" "), F.col("text")),
                F.concat(F.lit("copyright footer variant "),
                         (F.col("doc_id") % t).cast("string")),
            ).alias("text"),
        )
    )
    out.write.mode("overwrite").parquet(out_path)
    return mult * n_base, n_base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--templates", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from py_evalfilter_spark.operators import corpus
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=2 * args.cpus)
    t = args.templates
    _, n_base = synthesize_pages(
        spark, args.sf_dir, "/tmp/line_dedup_pages.parquet",
        args.pages, t, 4 * args.cpus,
    )
    pages = spark.read.parquet("/tmp/line_dedup_pages.parquet")
    n_pages = pages.count()

    t0 = time.perf_counter()
    out = corpus.dedup_lines(pages)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_lines_kept").alias("kept"),
        F.sum("n_lines_dropped").alias("dropped"),
    ).collect()[0]
    wall = time.perf_counter() - t0

    # structure check — the normalization strips digits, so the key space
    # collapses hard: ALL header variants share one normalized key (1M
    # occurrences — the hottest possible skew), footers likewise, and the
    # mult replicas of each base doc share their middle lines' keys.
    # Expected drops: (n_pages−1) for header + (n_pages−1) for footer +
    # 2·(n_pages−n_base) for the two middle-line classes; base-text
    # normalization collisions can only add (bounded by 2·n_base).
    expected_min = 2 * (n_pages - 1) + 2 * (n_pages - n_base)
    import shutil

    shutil.rmtree("/tmp/line_dedup_pages.parquet", ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "line_dedup_scale",
                "n_pages": n_pages,
                "n_lines": 4 * n_pages,
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(n_pages / wall, 1),
                "lines_per_sec": round(4 * n_pages / wall, 1),
                "rows_out": agg["rows"],
                "lines_kept": int(agg["kept"]),
                "lines_dropped": int(agg["dropped"]),
                "expected_dropped_min": expected_min,
                "structure_ok": expected_min
                <= int(agg["dropped"])
                <= expected_min + 2 * n_base,
                "max_line_occurrences": n_pages,
                "cpus": args.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
