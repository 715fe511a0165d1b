"""End-to-end curation plan (plans/curation.py): stage invariants on the
sf0.01 corpus — counts shrink monotonically, no benchmark leakage, no
surviving exact dups, packs respect the budget, deterministic."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_evalfilter_spark.operators import corpus as corpus_ops
from py_evalfilter_spark.plans import curation

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def curated(spark):
    obs: dict = {}
    out = curation.curate_corpus(
        spark,
        SF,
        rates={f"src{i}": 0.9 for i in range(1, 20)},
        budget=256,
        observations=obs,
    )
    rows = out.collect()
    return rows, {k: o.get["rows"] for k, o in obs.items()}


class TestCuration:
    def test_stage_counts_shrink_monotonically(self, curated):
        rows, counts = curated
        order = ["input", "quality", "repetition", "exact_dedup",
                 "near_dedup", "decontaminate", "mix"]
        vals = [counts[s] for s in order]
        assert vals == sorted(vals, reverse=True), counts
        assert counts["input"] == 475  # 500 minus the src0 benchmark slice
        assert len(rows) == counts["mix"]
        assert len(rows) > 100  # the pipeline must not collapse the corpus

    def test_no_benchmark_source_and_budget_respected(self, curated):
        rows, _ = curated
        assert all(r["source"] != "src0" for r in rows)
        assert all(0 <= r["pack_offset"] < 256 for r in rows)
        assert all(r["n_email"] is not None for r in rows)  # PII counts kept

    def test_no_exact_dups_survive(self, curated):
        rows, _ = curated
        texts = [r["text"] for r in rows]
        assert len(texts) == len(set(texts))

    def test_no_contamination_survives(self, spark, curated):
        rows, _ = curated
        out = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        )
        bench = spark.read.parquet(f"{SF}/documents.parquet").filter(
            F.col("source") == "src0"
        )
        # redaction never touches these texts (no PII in the corpus), so
        # the n-gram check is apples-to-apples with the original benchmark
        assert corpus_ops.contamination_report(out, bench, n=6).count() == 0

    def test_deterministic(self, spark, curated):
        rows, _ = curated
        again = curation.curate_corpus(
            spark, SF, rates={f"src{i}": 0.9 for i in range(1, 20)}, budget=256
        ).collect()
        assert sorted(r["doc_id"] for r in rows) == sorted(
            r["doc_id"] for r in again
        )


class TestSemanticStage:
    def test_semantic_dedup_removes_all_embedding_pairs(self, spark):
        """With the optional semantic stage on, no cosine-near pair may
        survive: blocking is seed-deterministic, so pairs found on the
        survivor subset are a subset of pairs found during curation — and
        every pair has at least one non-canonical endpoint that was
        dropped."""
        from py_evalfilter_spark.operators import dedup as dedup_ops

        obs: dict = {}
        out = curation.curate_corpus(
            spark, SF, semantic_threshold=0.95, budget=256, observations=obs
        )
        rows = out.collect()
        counts = {k: o.get["rows"] for k, o in obs.items()}
        assert counts["semantic_dedup"] <= counts["near_dedup"]
        assert len(rows) == counts["decontaminate"]

        survivors = spark.createDataFrame(
            [(r["doc_id"],) for r in rows], "doc_id long"
        )
        vecs = (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select(F.col("vec_id").alias("doc_id"), "embedding")
            .join(survivors, "doc_id", "left_semi")
        )
        leftover = dedup_ops.embedding_neardup_pairs(
            vecs, "doc_id", "embedding", threshold=0.95
        )
        assert leftover.count() == 0
