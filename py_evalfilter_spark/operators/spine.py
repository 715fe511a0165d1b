"""Multi-table point-in-time spine join — the feature-store primitive
("get_historical_features" in Feast/Tecton terms) the north_star's
point-in-time feature store is FOR: given a training spine of labeled
(entity, ts) rows, attach from EACH of k feature tables the latest row
with ``feature.ts <= spine.ts`` for that entity, each table under its own
staleness tolerance, with zero temporal leakage across all of them.

Generalizes operators/asof.asof_join_union_window (SURVEY.md §2.6 J3 —
the reference's merge-by-key join, evalfilter/pandas_util.py semantics)
from one right table to k.

Physical strategy — the reason this is an operator and not a loop:
  * Chaining k as-of joins costs k shuffles and k sorts of the GROWING
    spine (every union invalidates the previous pass's distribution).
  * Here ALL k tables and the spine union into ONE tagged frame, and ONE
    window pass ``partitionBy(entity).orderBy(ts, side)`` forward-fills k
    independent structs (one ``last(ignorenulls)`` per table).  Catalyst
    evaluates same-spec window functions in a single WindowExec: ONE
    Exchange + ONE Sort TOTAL, independent of k (plan-pinned by
    tests/test_plans.py::TestSpinePlan).  At 10^12 turns the delta is
    (k-1) corpus-sized shuffles.
  * Each table's columns travel inside its own struct, so every output
    column of a table comes from the SAME matched feature row (including
    that row's NULLs), and a stale match nulls the whole struct — the
    leakage/tolerance contract asof.py established for k=1.
  * Feature rows sort BEFORE spine rows at equal ts (side 0 < 1), so an
    exact ts match is visible — merge_asof allow_exact_matches=True /
    DuckDB ``ASOF JOIN ON spine.ts >= feat.ts`` semantics, which is what
    the driver oracle states.

Skew: one hash partition per entity bucket, same profile as the engine's
other conv_id windows — a mega-entity lands in one task; AQE handles
residual imbalance.  Tables keyed on a DIFFERENT entity column are
renamed onto the spine's key before the union (``FeatureTable.by``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class FeatureTable:
    """One feature source for the spine join.

    ``df`` holds (``by``, ``on``, value columns...).  Output columns are
    ``{prefix}_{on}`` (the matched row's own timestamp — audit/leakage
    column) and ``{prefix}_{col}`` for each value column.  ``tolerance_s``
    nulls the whole match when ``spine.ts - matched.ts > tolerance_s``.
    Rows must be unique per (by, on) for deterministic output (pre-agg
    duplicates: ties at equal ts resolve to an arbitrary same-ts row,
    like merge_asof on an unstably-sorted input)."""

    df: DataFrame
    prefix: str
    on: str = "ts"
    by: str = "conv_id"
    tolerance_s: int | None = None


def spine_point_in_time(
    spine: DataFrame,
    tables: list[FeatureTable],
    on: str = "ts",
    by: str = "conv_id",
) -> DataFrame:
    """Attach k feature tables to a training spine, point-in-time correct.

    Returns one row per spine row: all spine columns, then per table t
    ``{t.prefix}_{t.on}`` + ``{t.prefix}_{value col}...``.  No feature
    value with ``feature.ts > spine.ts`` can ever appear (leakage-free by
    construction: the forward-fill only looks backward in the ts order).
    """
    if not tables:
        raise ValueError("pass at least one FeatureTable")
    prefixes = [t.prefix for t in tables]
    if len(set(prefixes)) != len(prefixes):
        raise ValueError(f"duplicate prefixes: {prefixes}")

    spine_val_fields = [
        f for f in spine.schema.fields if f.name not in (by, on)
    ]
    out_names = set(spine.columns)
    specs: list[tuple[list[str], T.StructType]] = []
    for t in tables:
        rv = [c for c in t.df.columns if c not in (t.by, t.on)]
        for c in [t.on, *rv]:
            name = f"{t.prefix}_{c}"
            if name in out_names:
                raise ValueError(f"output column collision: {name}")
            out_names.add(name)
        st = T.StructType(
            [T.StructField("__rts", t.df.schema[t.on].dataType, True)]
            + [T.StructField(c, t.df.schema[c].dataType, True) for c in rv]
        )
        specs.append((rv, st))

    # spine branch: side=1, every table struct NULL
    lt = spine.select(
        "*",
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(st).alias(f"__rs{i}")
            for i, (_, st) in enumerate(specs)
        ],
    )
    branches = [lt]
    for i, t in enumerate(tables):
        rv, _ = specs[i]
        cols = [
            F.col(t.by).alias(by),
            F.col(t.on).alias(on),
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in spine_val_fields
            ],
            F.lit(0).alias("__side"),
        ]
        for j, (_, st_j) in enumerate(specs):
            if j == i:
                cols.append(
                    F.struct(
                        F.col(t.on).alias("__rts"), *[F.col(c) for c in rv]
                    ).alias(f"__rs{j}")
                )
            else:
                cols.append(F.lit(None).cast(st_j).alias(f"__rs{j}"))
        branches.append(t.df.select(*cols).select(*lt.columns))

    u = reduce(lambda a, b: a.unionByName(b), branches)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # k same-spec fills -> ONE WindowExec (one Exchange, one Sort)
    filled = u.select(
        "*",
        *[
            F.last(f"__rs{i}", ignorenulls=True)
            .over(w)
            .alias(f"__rsf{i}")
            for i in range(len(tables))
        ],
    )
    out = filled.filter(F.col("__side") == 1)
    for i, t in enumerate(tables):
        if t.tolerance_s is not None:
            stale = (
                F.col(on).cast("timestamp").cast("long")
                - F.col(f"__rsf{i}.__rts").cast("timestamp").cast("long")
            )
            out = out.withColumn(
                f"__rsf{i}",
                F.when(stale <= t.tolerance_s, F.col(f"__rsf{i}")).otherwise(
                    F.lit(None).cast(specs[i][1])
                ),
            )
    return out.select(
        *spine.columns,
        *[
            c
            for i, t in enumerate(tables)
            for c in (
                F.col(f"__rsf{i}.__rts").alias(f"{t.prefix}_{t.on}"),
                *[
                    F.col(f"__rsf{i}.{v}").alias(f"{t.prefix}_{v}")
                    for v in specs[i][0]
                ],
            )
        ],
    )
