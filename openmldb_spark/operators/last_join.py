"""LAST JOIN — OpenMLDB's as-of / point-in-time join, Spark-first.

Reference semantics (docs/en/reference/sql/dql/JOIN_CLAUSE.md:3-17,147-245):
for each LEFT row, join the single RIGHT row that is *last* under
``ORDER BY right.order_col`` among rows satisfying the join condition;
NULL-pad when no match. Point-in-time usage adds ``right.ts <= left.ts``
so a feature at (entity, ts) can only see history — zero temporal leakage.

The reference's batch implementation (java/openmldb-batch/.../nodes/
JoinPlan.scala:149-196) adds a row-id to the left, left-joins, then
reduces by row-id keeping the max order key. That explodes every left row
by its full match count before reducing — at 10^12 turns with long
histories the blow-up dominates. We provide three strategies:

- ``sort_merge`` (default for point-in-time equi-joins): union probe and
  build rows, hash-repartition by key, sort within partitions by
  (key, ts, side), and forward-fill the most recent build payload onto
  each probe row with ``last(..., ignorenulls=True)`` over an
  unbounded-preceding row frame. One shuffle, no row explosion,
  O(n log n) — this is the sort-merge-over-(key, ts)-sorted-partitions
  design the scale target mandates. Ties at equal ts resolve to the build
  row (build sorts before probe), matching the closed bound
  ``right.ts <= left.ts``.
- ``join_rank``: the general form (arbitrary extra condition / order
  column): left-join + row_number over the left row-id, keep rank 1.
  Correct for any condition; costs the explosion. AQE skew-join splits
  apply here.
- ``broadcast``: join_rank with the right side broadcast — the right call
  when the build side is a small dimension table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROW_ID = "__omls_row_id"
_SIDE = "__omls_side"  # 0 = build (right), 1 = probe (left)
_PAYLOAD = "__omls_payload"
_ORD = "__omls_ord"


def _as_list(x) -> list[str]:
    if x is None:
        return []
    if isinstance(x, str):
        return [x]
    return list(x)


def last_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    order_by: str,
    *,
    left_ts: str | None = None,
    right_ts: str | None = None,
    extra_cond: Column | None = None,
    strategy: str = "auto",
    descending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: left + the last matching right row.

    Args:
        on: equi-join key column name(s), present in both sides.
        order_by: right-side ordering column; "last" = max (or min when
            ``descending``) — reference JoinPlan.scala:168-171 maps
            ASC→max, DESC→min.
        left_ts/right_ts: when both set, adds the point-in-time predicate
            ``right[right_ts] <= left[left_ts]`` (closed bound, matching
            the reference's `t2.ts <= t1.ts` idiom).
        extra_cond: residual θ-condition (forces join_rank strategy);
            evaluated against ``left`` / ``right`` columns.
        strategy: auto | sort_merge | join_rank | broadcast.
        tiebreak: optional right column breaking equal order_by keys
            deterministically (max wins). The reference leaves ties
            arbitrary in batch mode; we pin them for reproducibility
            (SURVEY.md §7.4).

    Right-side non-key columns are returned NULL-padded when no match;
    any right column whose name clashes with a left column is suffixed
    ``_r`` in the output (both sides of a LAST JOIN may carry ``ts``).
    """
    keys = _as_list(on)
    # LAST JOIN order keys must be int/int64/timestamp — float, double,
    # date, string, bool order is rejected by the reference's planner
    # (test_lastjoin_simple.yaml#7-#10/#29 error cases)
    _rt = {f.name: f.dataType.simpleString().split("(")[0]
           for f in right.schema.fields}.get(order_by)
    if _rt and _rt not in ("timestamp", "timestamp_ntz", "bigint",
                           "int", "smallint"):
        raise ValueError(f"LAST JOIN ORDER BY {order_by!r} has type "
                         f"{_rt}; int/int64/timestamp required")
    pit = left_ts is not None and right_ts is not None
    out_name = {c: (c + "_r" if c in left.columns and c not in keys else c)
                for c in right.columns}
    if strategy == "auto":
        if extra_cond is None and pit and order_by == right_ts and not descending:
            strategy = "sort_merge"
        else:
            strategy = "join_rank"

    if strategy == "sort_merge":
        # the explicit strategy enforces the same preconditions the
        # auto route checks — sort_merge orders by right_ts ascending
        # and would silently ignore a different order_by / descending
        if not pit:
            raise ValueError("strategy='sort_merge' requires left_ts "
                             "and right_ts")
        if extra_cond is not None or order_by != right_ts or descending:
            raise ValueError("strategy='sort_merge' supports only "
                             "ascending order_by == right_ts with no "
                             "residual condition; use join_rank")
        return _sort_merge_asof(left, right, keys, left_ts, right_ts,
                                tiebreak, out_name)
    return _join_rank(left, right, keys, order_by, pit, left_ts, right_ts,
                      extra_cond, descending, tiebreak,
                      broadcast=(strategy == "broadcast"), out_name=out_name)


def _sort_merge_asof(left: DataFrame, right: DataFrame, keys: list[str],
                     left_ts: str, right_ts: str,
                     tiebreak: str | None, out_name: dict) -> DataFrame:
    """Union + single sort + forward-fill. The scalable path.

    Build rows carry their payload packed in one struct so a single
    ``last(ignorenulls=True)`` forward-fills every right column at once.
    """
    payload_cols = [c for c in right.columns if c not in keys]
    # NULL order keys lose everywhere in the engine: a NULL-ts build
    # row must not sort first and forward-fill onto probes that have no
    # real match (join_rank excludes it via right_ts <= left_ts being
    # NULL; the strategies must agree)
    right = right.filter(F.col(right_ts).isNotNull())
    build = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_ORD),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    # deterministic tie-break among build rows at equal ts: order ascending
    # by (ts, tiebreak) so `last` keeps the max-tiebreak row.
    tb = (F.col(f"{_PAYLOAD}.{tiebreak}") if tiebreak and tiebreak in payload_cols
          else F.lit(0))
    probe = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_ORD),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(build.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    merged = build.unionByName(probe)
    # One shuffle: hash by key; sort puts build rows before probe rows at
    # equal ts (closed bound: build @ts visible to probe @ts).
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(_ORD).asc_nulls_first(), F.col(_SIDE).asc(), tb.asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = merged.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = filled.filter(F.col(_SIDE) == 1)
    left_cols = [F.col(c) for c in left.columns]
    right_cols = [F.col(f"{_PAYLOAD}.{c}").alias(out_name[c])
                  for c in payload_cols]
    return out.select(*left_cols, *right_cols)


def _join_rank(left: DataFrame, right: DataFrame, keys: list[str],
               order_by: str, pit: bool, left_ts: str | None,
               right_ts: str | None, extra_cond: Column | None,
               descending: bool, tiebreak: str | None,
               broadcast: bool, out_name: dict) -> DataFrame:
    """Left-join + rank-1 filter (reference JoinPlan.scala:149-189 shape,
    with Window instead of reduceByKey)."""
    # alias-qualified refs (F.col("l.x") / F.col("r.x")) instead of
    # dataset refs (l[x] / r[x]): dataset refs fail Spark's ambiguous-
    # self-join check whenever `right` derives from `left` (e.g. an
    # as-of join of events against its own filtered purchases view)
    l = left.withColumn(_ROW_ID, F.monotonically_increasing_id()) \
            .alias("l")
    r = right.alias("r")
    if broadcast:
        r = F.broadcast(r)

    def lc(c):
        return F.col(f"l.`{c}`")

    def rc(c):
        return F.col(f"r.`{c}`")
    cond = None
    for k in keys:
        # NULL keys match NULL keys in the reference's LAST JOIN (the
        # storage index encodes NULL as a regular key byte): goldens
        # fz_ddl/test_luoji.yaml (reqId NULL row joins action's NULL
        # row) and test_lastjoin_complex.yaml#10 (NULL c3 chain key).
        # The sort_merge strategy gets this for free from
        # Window.partitionBy; eqNullSafe keeps join_rank consistent —
        # Spark still plans it as an equi-join key (SortMergeJoin on
        # EqualNullSafe), not a cartesian.
        c = lc(k).eqNullSafe(rc(k))
        cond = c if cond is None else (cond & c)
    if pit:
        c = rc(right_ts) <= lc(left_ts)
        cond = c if cond is None else (cond & c)
    if extra_cond is not None:
        cond = extra_cond if cond is None else (cond & extra_cond)
    joined = l.join(r, cond, "left")
    # NULL order values LOSE in both directions (a matched right row
    # with a NULL order key must never outrank a real match)
    ord_col = rc(order_by).asc_nulls_last() if descending \
        else rc(order_by).desc_nulls_last()
    tie = (rc(tiebreak).desc_nulls_last() if tiebreak else F.lit(0).asc())
    w = Window.partitionBy(_ROW_ID).orderBy(ord_col, tie)
    ranked = joined.withColumn("__omls_rn", F.row_number().over(w))
    out = ranked.filter(F.col("__omls_rn") == 1).drop("__omls_rn", _ROW_ID)
    # resolve ambiguous key columns: keep left's
    sel = [lc(c).alias(c) for c in left.columns] + \
          [rc(c).alias(out_name[c]) for c in right.columns if c not in keys]
    return out.select(*sel)
