#!/usr/bin/env python
"""A/B: JVM md5-per-token vs memoizing Arrow kernel for hashing_vectorize.
Checks exact result parity, then matched timings in one session."""

from __future__ import annotations

import hashlib
import os
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from py_evalfilter_spark.operators import vectorize  # noqa: E402
from py_evalfilter_spark.plans import driver_queries as dq  # noqa: E402
from py_evalfilter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfgen/sf1.0")
N_FEATURES = 4096


def arrow_hashed(terms):
    """(id_cols..., index, sign) via a memoizing Arrow kernel."""
    @F.pandas_udf("index int, sign long")
    def h(term: pd.Series) -> pd.DataFrame:
        cache: dict = {}

        def one(t):
            v = cache.get(t)
            if v is None:
                if len(cache) > 1 << 20:
                    cache.clear()
                d = hashlib.md5(t.encode("utf-8")).hexdigest()
                v = cache[t] = (
                    int(d[:8], 16) % N_FEATURES,
                    1 - (int(d[8], 16) % 2) * 2,
                )
            return v
        ix, sg = zip(*[one(t) for t in term])
        return pd.DataFrame({"index": ix, "sign": sg})

    return terms.select("doc_id", h("term").alias("_h")).select(
        "doc_id", F.col("_h.index").alias("index"), F.col("_h.sign").alias("sign")
    )


def main():
    spark = get_spark(app_name="ab_hashing")
    spark.range(1000).selectExpr("sum(id)").collect()

    toks = dq._tokens_df(spark, SF_DIR)

    jvm = vectorize.transform_hashing(
        None, n_features=N_FEATURES, id_cols=["doc_id"], terms=toks
    )
    arrow = (
        arrow_hashed(toks)
        .groupBy("doc_id", "index")
        .agg(F.sum("sign").alias("value"))
    )

    # exact parity: full frame symmetric difference must be empty
    d1 = jvm.exceptAll(arrow).count()
    d2 = arrow.exceptAll(jvm).count()
    print(f"parity: jvm\\arrow={d1} arrow\\jvm={d2}", file=sys.stderr)
    assert d1 == 0 and d2 == 0

    # unicode fuzz parity on the expressions themselves
    import random
    rnd = random.Random(42)
    words = [
        "".join(chr(rnd.randint(0x20, 0x2FA0)) for _ in range(rnd.randint(1, 12)))
        for _ in range(3000)
    ] + ["", "a", "élève", "\U0001F600x"]
    fuzz = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words) if w], ["doc_id", "term"]
    )
    jf = fuzz.select(
        "doc_id",
        vectorize.hashing_bucket_expr(F.col("term"), N_FEATURES).alias("index"),
        vectorize.hashing_sign_expr("term").alias("sign"),
    )
    af = arrow_hashed(fuzz)
    fd = jf.exceptAll(af).count() + af.exceptAll(jf).count()
    print(f"fuzz parity diff rows: {fd}", file=sys.stderr)
    assert fd == 0

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    agg = ["count(*) AS n", "sum(index) AS a", "sum(value) AS b"]
    for tag, df in (("jvm", jvm), ("arrow", arrow)):
        for rep in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df.selectExpr(*agg).collect()
            print(f"{tag} rep{rep}: {time.perf_counter()-t0:.2f}s",
                  file=sys.stderr)
    # interleave the other order to control drift
    for tag, df in (("arrow", arrow), ("jvm", jvm)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.selectExpr(*agg).collect()
        print(f"{tag} repX: {time.perf_counter()-t0:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
