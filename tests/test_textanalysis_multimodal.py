"""Text-analysis functions + multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_evalfilter_spark.functions import multimodal, textanalysis

SF = "/root/testdata/sf0.01"


class TestLangid:
    def test_accuracy_on_fixtures(self, spark):
        # NOTE: the driver documents.lang column is a synthetic label — its
        # texts are English word-soup for every lang value, so real language
        # content is fixture-generated here.
        samples = [
            ("en", "the cat is on the mat and it is happy with the sun"),
            ("en", "we walked to the store for milk and bread in the morning"),
            ("de", "der hund und die katze sind nicht im haus für heute"),
            ("de", "das wetter ist schön und wir gehen mit dem fahrrad"),
            ("fr", "le chat est dans la maison et il est très content"),
            ("fr", "nous allons au marché pour des légumes et du pain"),
            ("es", "el perro está en la casa y es muy feliz con el sol"),
            ("es", "vamos a la tienda por leche y pan por la mañana"),
            ("zh", "今天天气很好我们一起去公园散步吧"),
            ("zh", "这是一个用于测试语言识别的中文句子"),
        ]
        df = spark.createDataFrame(samples, ["lang", "text"])
        out = textanalysis.with_langid(df).collect()
        correct = sum(1 for r in out if r["lang"] == r["lang_pred"])
        assert correct >= 9, f"langid accuracy {correct}/10"

    def test_documents_runs_and_detects_english_soup(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = textanalysis.with_langid(docs).groupBy("lang_pred").count().collect()
        counts = {r["lang_pred"]: r["count"] for r in out}
        # the driver's texts are English-ish word soup; 'en' must dominate,
        # with 'und' allowed for marker-free docs — never another language
        assert counts.get("en", 0) > sum(counts.values()) * 0.7
        assert set(counts) <= {"en", "und"}

    def test_edge_cases(self, spark):
        df = spark.createDataFrame(
            [("",), ("这是一个中文句子，用于测试。",), ("der hund und die katze ist süß",)],
            ["text"],
        )
        got = [r["lang_pred"] for r in textanalysis.with_langid(df).collect()]
        assert got == ["und", "zh", "de"]


class TestQualityTokens:
    def test_quality_columns(self, spark):
        df = spark.createDataFrame(
            [("the quick brown fox jumps over the lazy dog today morning",), ("!!! ???",), ("",)],
            ["text"],
        )
        out = textanalysis.with_quality(df).collect()
        good, junk, empty = out
        assert good["n_tokens"] == 11 and good["quality_score"] > junk["quality_score"]
        assert junk["punct_ratio"] > 0.5
        assert empty["n_tokens"] == 0 and empty["quality_score"] <= 0.5

    def test_token_count(self, spark):
        df = spark.createDataFrame([("hello, world! two",), ("",)], ["text"])
        out = textanalysis.with_token_count(df).collect()
        # words: hello,|world!|two = 3; punct runs: ", " and "! " → 2
        assert out[0]["n_tokens"] == 5
        assert out[1]["n_tokens"] == 0


class TestFingerprint:
    def test_deterministic_and_discriminative(self, spark):
        df = spark.createDataFrame(
            [(1, "some document text here"), (2, "some document text here"), (3, "completely different")],
            ["id", "text"],
        )
        out = {r["id"]: r["fingerprint"] for r in textanalysis.with_fingerprint(df).collect()}
        assert out[1] == out[2]
        assert out[1] != out[3]
        out2 = {r["id"]: r["fingerprint"] for r in textanalysis.with_fingerprint(df).collect()}
        assert out == out2

    def test_jvm_matches_python_reference(self, spark):
        # the JVM expression pipeline (md5 k-grams -> window minima ->
        # distinct-xor) must equal the readable pure-Python twin, including
        # the short-text (< k, < window) and empty edges
        texts = [
            "", "a", "abcdef", "abcdefg", "abcdefgh",
            "the quick brown fox jumps over the lazy dog",
            "aaaaaaaaaaaaaaaaaaaaaa",  # degenerate: all k-grams equal
            "punctuation?! and   spaces",
            "ünïcödé tëxt with àccents",
            None,  # NULL hashes like "" (never a NULL fingerprint)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        got = {
            r["id"]: r["fingerprint"]
            for r in textanalysis.with_fingerprint(df).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == textanalysis._fingerprint(t), (i, t)


class TestMultimodal:
    def test_schema_and_features(self, spark):
        media = multimodal.make_fake_media(spark, n=12)
        assert media.schema == multimodal.MEDIA_SCHEMA
        feats = multimodal.image_features(media.filter("kind = 'image'")).collect()
        assert all(len(r["features"]) == multimodal.IMAGE_FEAT_DIM for r in feats)
        # deterministic
        again = multimodal.image_features(media.filter("kind = 'image'")).collect()
        assert {r["media_id"]: tuple(r["features"]) for r in feats} == {
            r["media_id"]: tuple(r["features"]) for r in again
        }

    def test_real_decode_is_gated(self, spark):
        media = multimodal.make_fake_media(spark, n=3)
        with pytest.raises(Exception, match="NotImplementedError|real image decode"):
            multimodal.image_features(media, real_decode=True).collect()

    def test_frame_sample_plan(self, spark):
        media = multimodal.make_fake_media(spark, n=12)
        plan = multimodal.frame_sample_plan(media, every_ms=1000).toPandas()
        assert (plan["sample_at_ms"] == plan["frame_idx"] * 1000).all()
        assert plan.groupby("media_id").size().min() >= 1

    def test_metadata_only_scan_prunes_blob(self, spark, tmp_path):
        media = multimodal.make_fake_media(spark, n=12)
        p = str(tmp_path / "media")
        media.write.parquet(p)
        scan = spark.read.parquet(p).select("media_id", "meta.n_bytes")
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "content" not in plan  # binary column pruned from the scan


def _dup_media(spark, n=12):
    """Fake media plus exact byte-copies of every 3rd item at +100 ids."""
    from pyspark.sql import functions as F

    media = multimodal.make_fake_media(spark, n=n)
    copies = media.filter("media_id % 3 = 0").withColumn(
        "media_id", F.col("media_id") + 100
    )
    return media.unionByName(copies)


class TestMediaDedup:
    def test_digest_dedup_groups_and_survivors(self, spark):
        out = {
            r["digest"]: (r["keep_id"], r["n_copies"])
            for r in multimodal.media_digest_dedup(_dup_media(spark)).collect()
        }
        assert len(out) == 12  # one group per distinct content
        # copied items (0,3,6,9) group with their +100 twin and the
        # ORIGINAL (min id) survives; everything else is a singleton
        assert sorted(v for v in out.values() if v[1] == 2) == [
            (0, 2), (3, 2), (6, 2), (9, 2)
        ]
        assert all(n == 1 for k, n in out.values() if k not in (0, 3, 6, 9))
        assert all(k < 100 for k, _ in out.values())

    def test_digest_dedup_shuffles_digests_not_blobs(self, spark, tmp_path):
        """The groupBy key is md5(content) computed scan-side: the exchange
        carries 32-char digests, never the binary column — and the parquet
        scan reads only (media_id, content)."""
        media = multimodal.make_fake_media(spark, n=12)
        p = str(tmp_path / "media_dedup")
        media.write.parquet(p)
        df = multimodal.media_digest_dedup(spark.read.parquet(p))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "md5" in plan
        read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "content" in read_schema
        assert "meta" not in read_schema and "kind" not in read_schema

    def test_curate_media_digest_stage(self, spark):
        got = multimodal.curate_media(_dup_media(spark))
        ids = sorted(r["media_id"] for r in got.collect())
        assert ids == list(range(12))  # every +100 copy dropped, originals kept

    def test_curate_media_feature_stage(self, spark):
        """With a precomputed feature table (the at-scale mode: extraction
        is its own job), near-dup pairs above threshold drop the HIGHER id;
        rows without features pass untouched."""
        from pyspark.sql import functions as F  # noqa: F401

        media = multimodal.make_fake_media(spark, n=6)
        feats = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0, 0.0]),
                (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0 → dropped
                (2, [0.0, 1.0, 0.0, 0.0]),
                (3, [0.0, 0.0, 1.0, 0.0]),
            ],
            "media_id long, features array<double>",
        )
        got = multimodal.curate_media(media, feature_threshold=0.95, features=feats)
        assert sorted(r["media_id"] for r in got.collect()) == [0, 2, 3, 4, 5]

    def test_curate_media_extractor_path(self, spark):
        """features=None extracts via image_features() over the image-kind
        survivors (fake decoder): distinct contents → (avalanche) distinct
        features, so nothing near-dups and the digest survivors all pass."""
        got = multimodal.curate_media(_dup_media(spark), feature_threshold=0.95)
        assert sorted(r["media_id"] for r in got.collect()) == list(range(12))
