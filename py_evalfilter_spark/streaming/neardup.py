"""Streaming NEAR-duplicate detection (SURVEY.md §2.9 extension): MinHash
LSH over a document stream with per-bucket state carried across
micro-batches via applyInPandasWithState.

Pipeline shape (the batch operator's stages, re-cut for a stream):

  stateless   minhash signature per doc (the same Arrow pass as batch —
              operators/dedup.minhash_signatures, streaming-safe)
  stateless   band explode → (band, bucket) keys (dedup.band_buckets)
  STATEFUL    groupBy(band, bucket): state = every (doc_id, signature)
              ever seen in this bucket; each arriving doc emits candidate
              pairs against the state whose signature-agreement Jaccard
              estimate clears threshold − margin, then joins the state

Emitted pairs carry the ESTIMATE, not an exact verify: the stream has no
access to earlier documents' text (state holds signatures only — O(96B·
num_perm) per doc, not the corpus), so exact confirmation is a cheap
batch join over the tiny candidate set downstream — the same
est-prefilter-then-verify split the batch operator uses.  A pair sharing
k bands is emitted k times (each bucket's state is independent);
downstream dedups by (doc_id, dup_id).

Scale: state per bucket grows with true bucket occupancy, which the
banding keeps small on non-pathological corpora; pass `timeout` to evict
buckets idle longer than the dedup horizon (a web crawl dedups against a
sliding window of recent content, not all of history)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import dedup

NEARDUP_OUT = "doc_id long, dup_id long, est double"
NEARDUP_STATE = "ids array<long>, sigs array<array<long>>"


def streaming_minhash_candidates(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    unit: str = "word",
    est_margin: float = 0.15,
    timeout: str | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (doc_id < dup_id, est = signature-agreement
    Jaccard estimate ≥ threshold − est_margin) from a document stream.
    Same (n, num_perm, bands, seed, unit) semantics as
    dedup.minhash_lsh_pairs, so a batch re-verify of the emitted
    candidates reproduces the batch operator's pairs."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    assert num_perm % bands == 0
    r = num_perm // bands
    cut = threshold - est_margin

    sigs = dedup.minhash_signatures(
        stream.select(id_col, text_col), id_col, text_col, n, num_perm, seed, unit=unit
    )
    banded = dedup.band_buckets(sigs, bands, r, keep_signature=True)

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ids, sigs_ = state.get if state.exists else ([], [])
        ids, sigs_ = list(ids), [list(s) for s in sigs_]
        out_a: list[int] = []
        out_b: list[int] = []
        out_e: list[float] = []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["doc_id"], pdf["signature"]):
                doc_id, sig = int(doc_id), [int(x) for x in sig]
                for oid, osig in zip(ids, sigs_):
                    if oid == doc_id:
                        continue
                    est = sum(a == b for a, b in zip(sig, osig)) / num_perm
                    if est >= cut:
                        a, b = (oid, doc_id) if oid < doc_id else (doc_id, oid)
                        out_a.append(a)
                        out_b.append(b)
                        out_e.append(round(est, 4))
                ids.append(doc_id)
                sigs_.append(sig)
        state.update((ids, sigs_))
        if timeout:
            state.setTimeoutDuration(timeout)
        if out_a:
            yield pd.DataFrame({"doc_id": out_a, "dup_id": out_b, "est": out_e})

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType=NEARDUP_OUT,
        stateStructType=NEARDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if timeout
        else GroupStateTimeout.NoTimeout,
    )
