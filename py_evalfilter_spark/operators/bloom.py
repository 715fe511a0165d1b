"""Bloom-filter membership prefilter for exact dedup against a standing
corpus — the bounded-memory pattern large crawled-corpus pipelines use for
"have we already got this document?" (popularized by Dolma's Bloom-filter
dedup; the reference repo's scope ends at windowed fuzzy dedup,
deduplicate_rants.py:12-21, so this is an engine extension per the brief).

Why not just an anti-join: `new LEFT ANTI JOIN standing ON key` shuffles
BOTH sides by key — at 100 TB standing that is the whole corpus through
the network, every day, for a shard that overlaps it by a few percent.
The Bloom path reads the standing corpus ONCE map-side (no shuffle, key
column only), reduces it to an m-bit array, and probes the shard map-side:

  * rows that probe NEGATIVE are DEFINITELY new (Bloom has no false
    negatives) — they never enter any join;
  * rows that probe positive are duplicates OR false positives (rate ε,
    sized by `bloom_params`) — only this sliver needs exact confirmation.

With `confirm=True` the sliver is anti-joined against the standing keys,
so the output is EXACTLY `new LEFT ANTI JOIN standing` — the filter is a
pure join-input reducer.  With `confirm=False` the sliver is dropped
outright (Dolma's accepted trade: ~ε of genuinely-new rows lost, zero
joins) — approximate, never emits a true duplicate.

Scale notes:
  * the filter is built with per-partition numpy bitmaps OR-merged by an
    executor-side treeReduce (the driver receives ONE m/8-byte bitmap);
    size m for single-process memory: 1e9 keys at ε=1e-3 → m≈1.44e10
    bits ≈ 1.8 GB.  Beyond a few billion standing keys, shard the filter
    by key range (build one per pmod(xxhash64(key), S) slice and probe
    each shard's rows against its slice) — same code, driven S times.
  * two xxhash64 hashes per key stay JVM-side; the k probe positions
    derive in numpy via Kirsch-Mitzenmacher double hashing, so Arrow
    moves 16 bytes/row regardless of k; Python touches only the bitmap —
    vectorized fancy-index lookups per batch (scalar pandas_udf, per
    CLAUDE.md's Arrow discipline).
  * the confirm join's standing side still shuffles by key unless the
    standing keys live in a key-bucketed table (sources/tables.
    write_bucketed) — then only the candidate sliver moves.  Pair them
    for the daily-shard loop.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fp_rate: float) -> tuple[int, int]:
    """Classic sizing: m = -n·ln(ε)/ln(2)², k = (m/n)·ln(2) — returns
    (n_bits, n_hashes), both ≥ 1, n_bits rounded up to a byte multiple."""
    if n_keys <= 0:
        return 8, 1
    m = math.ceil(-n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def theoretical_fp_rate(n_bits: int, n_hashes: int, n_keys: int) -> float:
    """(1 - e^(-kn/m))^k — the standard approximation."""
    return (1.0 - math.exp(-n_hashes * n_keys / n_bits)) ** n_hashes


def _hash_cols(key_col: str, seed: int):
    """Two independent 64-bit hashes per key, JVM-side (xxhash64 salted by
    a leading literal — its own seed is fixed in the SQL function).  The k
    probe positions derive from these via Kirsch-Mitzenmacher double
    hashing in numpy (`_positions`), so the Arrow transfer is 16 bytes/row
    regardless of k instead of 8k."""
    return [
        F.xxhash64(F.lit(seed), F.col(key_col)).alias("h1"),
        F.xxhash64(F.lit(seed + 1), F.col(key_col)).alias("h2"),
    ]


def _positions(h1: np.ndarray, h2: np.ndarray, n_bits: int, n_hashes: int):
    """g_i = h1 + i·(h2|1) mod m, i in [0, k) — the double-hashing scheme
    (Kirsch & Mitzenmacher 2006: preserves the Bloom FP bound).  h2 forced
    odd so a zero/even stride can't degenerate all probes onto one bit;
    int64 wraparound is numpy-defined and deterministic; numpy's % takes
    the divisor's sign, so positions are already non-negative.  Yields
    one position array per probe."""
    stride = h2 | np.int64(1)
    for i in range(n_hashes):
        yield (h1 + np.int64(i) * stride) % n_bits


def build_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    seed: int = 42,
) -> bytes:
    """One map-side pass over `df`'s key column → packed little-endian
    bitmap (n_bits/8 bytes).  Each partition folds its rows into a local
    numpy bitmap (mapInArrow — genuinely per-partition imperative state);
    the per-partition bitmaps (one binary row each) OR-merge with an
    executor-side treeReduce, so the driver receives ONE bitmap — a
    collect of all partition bitmaps would hold partitions×m/8 bytes on
    the driver and become the binding ceiling long before the filter
    itself does.  Deterministic: xxhash64 is seed-fixed and salt-varied;
    OR is associative+commutative, so merge order is irrelevant."""
    n_bytes = (n_bits + 7) // 8
    spark = df.sparkSession
    hashes = df.select(*_hash_cols(key_col, seed)).coalesce(
        spark.sparkContext.defaultParallelism
    )

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bits = np.zeros(n_bytes, np.uint8)
        seen = False
        for batch in batches:
            seen = True
            h1 = batch.column(0).to_numpy(zero_copy_only=False)
            h2 = batch.column(1).to_numpy(zero_copy_only=False)
            for p in _positions(h1, h2, n_bits, n_hashes):
                np.bitwise_or.at(
                    bits, p >> 3, (1 << (p & 7)).astype(np.uint8)
                )
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([bits.tobytes()], pa.binary())], ["bitmap"]
            )

    def _or(a: bytes, b) -> bytes:
        if isinstance(b, (bytes, bytearray)):
            other = b
        else:  # seqOp side: a Row carrying one partition bitmap
            other = b["bitmap"]
        return (
            np.frombuffer(a, np.uint8) | np.frombuffer(other, np.uint8)
        ).tobytes()

    # ONE action: treeAggregate's zero value covers the empty-RDD case, so
    # there is no separate isEmpty() pass re-running partition 0's fold
    return hashes.mapInArrow(fold, "bitmap binary").rdd.treeAggregate(
        bytes(n_bytes), _or, _or, depth=2
    )


def with_bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: bytes,
    n_hashes: int,
    seed: int = 42,
    out_col: str = "maybe_member",
) -> DataFrame:
    """df + boolean `out_col`: True iff all k probe bits are set (member
    OR false positive; False ⇒ definitely not a member).  The bitmap
    ships to executors via a Spark broadcast; the probe is a scalar
    pandas_udf over the two JVM-computed hash columns (positions derived
    in numpy, `_positions`)."""
    n_bits = len(bloom) * 8
    bc = df.sparkSession.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, np.uint8)
        h1 = h1s.to_numpy(dtype=np.int64)
        h2 = h2s.to_numpy(dtype=np.int64)
        ok = np.ones(len(h1), bool)
        for p in _positions(h1, h2, n_bits, n_hashes):
            ok &= ((bits[p >> 3] >> (p & 7)) & 1).astype(bool)
        return pd.Series(ok)

    return df.withColumn(out_col, probe(*_hash_cols(key_col, seed)))


def bloom_dedup_against(
    new: DataFrame,
    standing: DataFrame,
    key_col: str,
    fp_rate: float = 1e-3,
    n_standing: int | None = None,
    confirm: bool = True,
    seed: int = 42,
    prebuilt: tuple[bytes, int] | None = None,
    pins=None,
) -> DataFrame:
    """Rows of `new` whose `key_col` does not occur in `standing`.

    Regime note: if the standing KEY SET is broadcastable (a few hundred
    MB), a plain broadcast anti-join is simpler and at least as fast —
    this operator exists for the standing corpus that is NOT: billions of
    keys, where the anti-join's shuffle of both sides is the cost the
    filter removes.

    `pins` (a PinScope, optional): persists the probed frame so the
    definite-new branch and the confirm branch share ONE probe pass over
    `new` — without it the union's two branches each scan+probe `new`
    (fine for a thin shard, wasteful when `new` is a full crawl).

    confirm=True (default): EXACT — ≡ `new.join(standing, key, "left_anti")`
    with only the Bloom-positive sliver entering the join.  confirm=False:
    approximate (Dolma mode) — Bloom-positive rows are dropped without
    confirmation, losing ~fp_rate of genuinely-new rows; no true duplicate
    survives either way.

    `n_standing` sizes the filter; pass the known corpus row count to skip
    the counting pass (an approximate count is fine — ε degrades
    gracefully if undersized).

    `prebuilt` = (bitmap, n_hashes) from an earlier `build_bloom` over the
    SAME standing keys and seed — the daily-shard amortization: build the
    filter once at backfill (and OR-merge each shard's own bitmap into it
    after ingest — Bloom filters union by bitwise OR), then every shard
    pays only the map-side probe + the sliver confirm, never the standing
    build scan."""
    if prebuilt is not None:
        bloom, n_hashes = prebuilt
    else:
        n = n_standing if n_standing is not None else standing.count()
        n_bits, n_hashes = bloom_params(n, fp_rate)
        bloom = build_bloom(standing, key_col, n_bits, n_hashes, seed)
    flagged = with_bloom_probe(
        new, key_col, bloom, n_hashes, seed, out_col="__maybe"
    )
    if pins is not None:
        flagged = pins.pin(flagged)
    definite = flagged.filter(~F.col("__maybe")).drop("__maybe")
    if not confirm:
        return definite
    candidates = flagged.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = candidates.join(
        standing.select(F.col(key_col)), key_col, "left_anti"
    )
    return definite.unionByName(confirmed_new)
