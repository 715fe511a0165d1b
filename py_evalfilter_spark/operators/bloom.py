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
  * the filter is built with per-partition numpy bitmaps OR-merged on the
    driver — m/8 bytes each, so size m for driver memory: 1e9 keys at
    ε=1e-3 → m≈1.44e10 bits ≈ 1.8 GB.  Beyond a few billion standing
    keys, shard the filter by key range (build one per pmod(xxhash64(key),
    S) slice and probe each shard's rows against its slice) — same code,
    driven S times.
  * hashing stays JVM-side (xxhash64 with a per-probe salt column, pmod
    into [0, m)); Python touches only the bitmap — a vectorized
    fancy-index lookup per batch (scalar pandas_udf, Arrow transfer of k
    long columns, per CLAUDE.md's Arrow discipline).
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


def _position_cols(key_col: str, n_bits: int, n_hashes: int, seed: int):
    """k bit positions per row, all JVM-side: xxhash64 salted by the probe
    index (xxhash64's own seed is fixed in the SQL function, so the salt
    rides as a leading literal column), pmod'd into [0, n_bits)."""
    return [
        F.pmod(
            F.xxhash64(F.lit(seed + i), F.col(key_col)), F.lit(n_bits)
        ).cast("long")
        for i in range(n_hashes)
    ]


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
    the per-partition bitmaps (one binary row each) OR-merge on the
    driver.  Deterministic: xxhash64 is seed-fixed and salt-varied."""
    n_bytes = (n_bits + 7) // 8
    pos = df.select(
        F.array(*_position_cols(key_col, n_bits, n_hashes, seed)).alias("pos")
    )

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bits = np.zeros(n_bytes, np.uint8)
        seen = False
        for batch in batches:
            seen = True
            flat = batch.column(0).flatten().to_numpy(zero_copy_only=False)
            np.bitwise_or.at(
                bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8)
            )
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([bits.tobytes()], pa.binary())], ["bitmap"]
            )

    parts = pos.mapInArrow(fold, "bitmap binary").collect()
    merged = np.zeros(n_bytes, np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bitmap"], np.uint8)
    return merged.tobytes()


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
    pandas_udf over the k JVM-computed position columns."""
    n_bits = len(bloom) * 8
    bc = df.sparkSession.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def probe(*pos_cols: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, np.uint8)
        ok = np.ones(len(pos_cols[0]), bool)
        for p in pos_cols:
            v = p.to_numpy(dtype=np.int64)
            ok &= ((bits[v >> 3] >> (v & 7)) & 1).astype(bool)
        return pd.Series(ok)

    return df.withColumn(
        out_col, probe(*_position_cols(key_col, n_bits, n_hashes, seed))
    )


def bloom_dedup_against(
    new: DataFrame,
    standing: DataFrame,
    key_col: str,
    fp_rate: float = 1e-3,
    n_standing: int | None = None,
    confirm: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Rows of `new` whose `key_col` does not occur in `standing`.

    confirm=True (default): EXACT — ≡ `new.join(standing, key, "left_anti")`
    with only the Bloom-positive sliver entering the join.  confirm=False:
    approximate (Dolma mode) — Bloom-positive rows are dropped without
    confirmation, losing ~fp_rate of genuinely-new rows; no true duplicate
    survives either way.

    `n_standing` sizes the filter; pass the known corpus row count to skip
    the counting pass (an approximate count is fine — ε degrades
    gracefully if undersized)."""
    n = n_standing if n_standing is not None else standing.count()
    n_bits, n_hashes = bloom_params(n, fp_rate)
    bloom = build_bloom(standing, key_col, n_bits, n_hashes, seed)
    flagged = with_bloom_probe(
        new, key_col, bloom, n_hashes, seed, out_col="__maybe"
    )
    definite = flagged.filter(~F.col("__maybe")).drop("__maybe")
    if not confirm:
        return definite
    candidates = flagged.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = candidates.join(
        standing.select(F.col(key_col)), key_col, "left_anti"
    )
    return definite.unionByName(confirmed_new)
