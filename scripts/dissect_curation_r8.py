#!/usr/bin/env python
"""Round-8 session-2 dissection: where does curation_pipeline's wall go at
sf0.1?  Times each stage boundary through a noop sink (guide §1.4), then the
benched aggregate, in one JVM."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from py_evalfilter_spark.functions import pii, textanalysis  # noqa: E402
from py_evalfilter_spark.operators import corpus as corpus_ops  # noqa: E402
from py_evalfilter_spark.operators import dedup, graph  # noqa: E402
from py_evalfilter_spark.plans import curation  # noqa: E402
from py_evalfilter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", file=sys.stderr)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="dissect_curation")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("source") != "src0").repartition(
        curation.input_partitions(spark)
    )

    # cumulative-prefix walls (each through a noop sink, fresh lineage)
    quality = curation._quality_filter(corpus, 0.5)
    t("prefix: quality", lambda: noop(quality))
    repeated = corpus_ops.filter_repetitive(quality)
    t("prefix: +repetition", lambda: noop(repeated))
    scrubbed = pii.scrub_pii(repeated)
    t("prefix: +pii", lambda: noop(scrubbed))

    # pinned copy for the dedup chain (mirrors curate_corpus's persist)
    scrubbed_p = scrubbed.persist()
    t("materialize scrubbed pin", lambda: noop(scrubbed_p))

    survivors = dedup.exact_dedup(scrubbed_p, ["text"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    exact = scrubbed_p.join(survivors, "doc_id", "left_semi").persist()
    t("exact dedup (join back, pinned)", lambda: noop(exact))

    sigs_probe = dedup.minhash_signatures(
        exact.select("doc_id", "text"), "doc_id", "text", n=3, num_perm=64,
        unit="word",
    )
    t("minhash signatures (word)", lambda: noop(sigs_probe))

    pairs = dedup.minhash_lsh_pairs(
        df=exact, id_col="doc_id", text_col="text", threshold=0.8, unit="word"
    )
    t("minhash pairs (banded join + verify)", lambda: noop(pairs))

    t0 = time.perf_counter()
    neardup = graph.dedup_keep_canonical(exact, pairs, src="doc_id", dst="dup_id")
    print(f"keep_canonical CONSTRUCTION (component loop): "
          f"{time.perf_counter() - t0:.2f}s", file=sys.stderr)
    neardup_p = neardup.persist()
    t("neardup materialize", lambda: noop(neardup_p))

    benchmark = docs.filter(F.col("source") == "src0")
    clean = corpus_ops.decontaminate(neardup_p, benchmark, n=6)
    t("decontaminate", lambda: noop(clean))
    packed = corpus_ops.pack_sequences(clean, budget=256)
    t("+pack_sequences", lambda: noop(packed))

    agg = packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("pack_id").alias("n_packs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    t("final agg collect", lambda: agg.collect())

    # end-to-end, exactly as benched (fresh cache)
    import bench
    for rep in range(3):
        spark.catalog.clearCache()
        t(f"FULL benched curation rep{rep}",
          lambda: bench.benched_df(spark, "curation_pipeline", SF_DIR).collect())


if __name__ == "__main__":
    main()
