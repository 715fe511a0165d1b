"""BM25 ranked retrieval over a document corpus — the classic inverted-
index scoring function (Robertson-Sparck Jones idf, Okapi tf saturation),
expressed as DataFrame relational algebra so Catalyst keeps every stage
shuffle-planned and codegen'd.

The reference engine's text surface stops at per-document feature maps and
vectorizer fitting (src/evalfilter/*, surveyed in SURVEY.md §2.3-2.5);
ranked retrieval is an engine extension (brief: training-data pipelines
need "which documents match this probe query" for corpus QA and
contamination triage — e.g. searching a crawl for benchmark strings).

Shape (all built-ins, no UDFs):
  postings  (term, doc_id, tf)   one shuffle: groupBy(doc_id, term)
  doc_len   (doc_id, dl)         map-side combine off the same tokens
  dfreq     (term, df)           aggregates postings — skew-safe (a
                                 stop-word's posting list is large, but
                                 df-agg is a partial-agg count, not a join)
  scoring                        query terms filter postings FIRST
                                 (isin-pushdown → parquet row-group skip
                                 on a term-sorted store), then join —
                                 per-term idf is a handful of rows,
                                 broadcast by AQE.

Top-k uses orderBy(...).limit(k) → TakeOrderedAndProject: per-partition
heaps + driver merge of k×partitions rows, never a global sort.

At 100 TB the postings table is the big artifact (≈ tokens count rows);
it partial-aggregates map-side before its one shuffle, and a persisted
postings store bucketed+sorted by term turns every later query into a
bucket-pruned scan with no shuffle at all (sources/tables.write_bucketed).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import WORD_RE


def tokenize_query(query: str) -> list[str]:
    """The same word tokenization the corpus side uses (corpus.WORD_RE),
    applied driver-side to the probe string; distinct terms, order-free
    (BM25 is a bag-of-terms score)."""
    return sorted({t for t in re.split(WORD_RE, query.lower()) if t})


def bm25_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings(term, doc_id, tf), doc_len(doc_id, dl)) — the index
    tables.  Persist both (postings bucketed by term) to amortize over
    many queries; build is one tokenize pass + one shuffle each."""
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), WORD_RE)).alias("term"),
    ).filter(F.col("term") != "")
    postings = tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # doc length = Σ tf — identical counts to aggregating the raw tokens,
    # but derived FROM postings so a caller that persists the postings
    # frame (bm25_scores/bm25_batch_scores do) tokenizes the corpus once
    # for index + lengths + stats instead of once per consumer
    doc_len = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return postings, doc_len


def write_bm25_index(
    postings: DataFrame,
    doc_len: DataFrame,
    table_prefix: str,
    n_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist the index as catalog tables:

      {prefix}_postings  bucketed + sorted by term
      {prefix}_doclen    bucketed + sorted by doc_id

    Term-bucketing is the query-latency lever: `isin(query_terms)` is a
    literal IN on the bucket column, which FileSourceScan prunes to the
    probed terms' buckets (`SelectedBucketsCount: q out of N` in the
    plan, pinned by tests) — a 4-term query against a 64-bucket postings
    table scans ≤ 4/64 of the corpus postings regardless of corpus size.
    Size n_buckets so one bucket ≈ one task's worth of postings at target
    scale; more buckets = sharper pruning (a probe term costs ~1/N of
    the table).

    doc_id-bucketing doc_len is the HEAVY-term lever: scoring joins the
    term-filtered hits to doc_len on doc_id.  For rare terms AQE
    broadcasts the hits side and the join is cheap either way; for
    stop-word-ish terms hits ≈ corpus and an unbucketed doc_len makes
    BOTH corpus-sized sides shuffle — the query's dominant cost at 10^10
    docs.  Bucketed, the doc_len side satisfies the join distribution
    straight off its scan (ZERO store-side Exchange, pinned by
    tests/test_plans.py::TestBm25DoclenPlan) and only the hits side
    moves."""
    from ..sources.tables import write_bucketed

    write_bucketed(
        postings,
        f"{table_prefix}_postings",
        ["term"],
        n_buckets,
        sort_cols=["term"],
        path=(f"{path}/postings" if path else None),
        mode=mode,
    )
    write_bucketed(
        doc_len,
        f"{table_prefix}_doclen",
        ["doc_id"],
        n_buckets,
        sort_cols=["doc_id"],
        path=(f"{path}/doclen" if path else None),
        mode=mode,
    )


def read_bm25_index(spark, table_prefix: str) -> tuple[DataFrame, DataFrame]:
    """(postings, doc_len) with bucket metadata intact (spark.table — a
    plain parquet read would forget the bucketing and lose the pruning)."""
    return (
        spark.table(f"{table_prefix}_postings"),
        spark.table(f"{table_prefix}_doclen"),
    )


def bm25_stats(doc_len: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl) — the two corpus scalars every query folds in as
    literals.  Compute once at index time and pass to bm25_scores/
    bm25_topk so queries skip the doc_len aggregate."""
    row = doc_len.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return row["n"], row["avgdl"]


def _bm25_score_hits(
    hits: DataFrame,
    doc_len: DataFrame,
    stats: tuple[int, float] | None,
    k1: float,
    b: float,
) -> DataFrame:
    """Per-(term, doc) partial BM25 scores over the term-filtered postings.

    With ``stats`` the corpus scalars fold in as literals (the persisted-
    index mode: compute once at index time, zero per-query passes).
    Without, they ride the plan as a broadcast one-row cross join — the
    stats aggregate, the doc-length join side and the hits filter all hang
    off the SAME postings exchange (doc_len derives from postings since
    bm25_postings computes dl = Σ tf), so exchange reuse makes the whole
    query ONE tokenize pass with no driver collect and no cache, replacing
    the previous three passes (stats action, hits path, doc_len side).
    The scalar VALUES are identical either way (count cast to double ≡
    float(n_docs)), so both modes score identically."""
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if stats is not None:
        n_docs, avgdl = stats
        n_col, avgdl_col = F.lit(float(n_docs)), F.lit(float(avgdl))
        scored = hits.join(dfreq, "term").join(doc_len, "doc_id")
    else:
        stats_df = doc_len.agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.avg("dl").alias("__avgdl"),
        )
        n_col, avgdl_col = F.col("__n"), F.col("__avgdl")
        scored = (
            hits.join(dfreq, "term")
            .join(doc_len, "doc_id")
            .crossJoin(F.broadcast(stats_df))
        )
    idf = F.log(
        F.lit(1.0) + (n_col - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    return scored.withColumn(
        "part",
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl_col)
        ),
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
    doc_len: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥1 query term.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))   [Robertson; always > 0]
    tf-part = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    N and avgdl are corpus scalars — computed with one tiny aggregate and
    folded in as literals (two doubles to the driver, not a collect of
    data).  Pass a persisted (postings, doc_len) pair to skip re-indexing,
    and `stats=(n_docs, avgdl)` (from `bm25_stats`, computed once at index
    time) to skip the per-query doc_len aggregate too."""
    terms = tokenize_query(query)
    if postings is None or doc_len is None:
        postings, doc_len = bm25_postings(docs, id_col, text_col)
    return _bm25_score_hits(
        postings.filter(F.col("term").isin(terms)), doc_len, stats, k1, b
    ).groupBy("doc_id").agg(F.sum("part").alias("bm25"))


def bm25_batch_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[str, str],
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
    doc_len: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """(query_id, doc_id, bm25) for a BATCH of queries in ONE pass.

    The shape that matters when triaging a corpus against many probes
    (every benchmark's question strings, a blocklist of phrases): instead
    of one Spark job per query, the postings table is filtered once to
    the UNION of all query terms and joined against a broadcast
    (query_id, term) dim — per-doc-per-query scores come out of a single
    groupBy.  Scoring math is identical to bm25_scores per query
    (parity-tested); queries sharing a term share its postings scan."""
    qdf_rows = [
        (qid, t) for qid, q in queries.items() for t in tokenize_query(q)
    ]
    if not qdf_rows:
        raise ValueError("queries must contain at least one tokenizable term")
    terms_all = sorted({t for _, t in qdf_rows})
    if postings is None or doc_len is None:
        postings, doc_len = bm25_postings(docs, id_col, text_col)
    spark = docs.sparkSession
    qdf = spark.createDataFrame(qdf_rows, "query_id string, term string")
    scored = _bm25_score_hits(
        postings.filter(F.col("term").isin(terms_all)), doc_len, stats, k1, b
    )
    return (
        scored.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part").alias("bm25"))
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
    doc_len: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Top-k by (bm25 desc, doc_id asc — deterministic tie order), via
    TakeOrderedAndProject (bounded per-partition heaps, no global sort)."""
    return (
        bm25_scores(
            docs, id_col, text_col, query, k1, b, postings, doc_len, stats
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )
