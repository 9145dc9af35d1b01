"""Custom stateful streaming operator — per-event rolling features from
per-key state, the Structured Streaming analog of the reference's ONLINE
request mode (SURVEY §1.1: a request row is answered from the tablet's
in-memory per-key window buffer; here the buffer lives in Spark
streaming state and every arriving event is "a request").

`streaming_rolling_features` maintains, per partition key, a ring buffer
of (ts, value) bounded by the frame width (and optional MAXSIZE — the
same TTL shape as the reference's absolute+latest index,
src/storage/table.h). For each input event, in (ts, id) order, it
evicts expired entries, appends the event, and emits the aggregates
over the buffer — count / sum / avg / min / max over
``[t - window_ms, t]``, exactly the batch kernel's stream-peer RANGE
frame, which is what makes the online==offline consistency test
possible (tests/test_streaming.py pins streaming output == batch
``window_agg`` on the same data — the reference's own
online/offline-consistency contract).

Scale notes: state is per-key and frame-bounded (window width x event
rate, capped by maxsize), Arrow-batched via applyInPandasWithState.
The in-order hot path is fully vectorized (VERDICT r3 wrong #3): window
bounds come from one ``searchsorted`` + a maxsize clamp, count/sum/avg
from cumulative sums, and min/max from pandas' Cython monotonic-deque
variable-window rolling — per-event cost is O(1) amortized, independent
of buffer length. The out-of-order fallback (a late event left a
non-ascending buffer) is vectorized too (``rolling_over_buffered``:
prefix-max searchsorted front pointers + the same cumsum/deque
aggregation); only the rare maxsize-cap-binding corner walks an
integer pointer scan, still O(1)/event amortized with no per-row value
processing. Watermark policy belongs to the caller (this operator
is deterministic given arrival order; late data outside the frame
simply sees an emptier buffer, it never corrupts state).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _window_starts(ts: np.ndarray, window_ms: int,
                   maxsize: int | None) -> np.ndarray:
    """Per-position frame start over an ascending ts sequence: first
    index with ts >= t_i - window_ms, clamped so no frame holds more
    than ``maxsize`` rows (newest win — the reference's absolute+latest
    TTL order). Front-only evictions of the sequential loop are exactly
    these bounds because both terms are monotone when ts ascends."""
    starts = np.searchsorted(ts, ts - window_ms, side="left")
    if maxsize is not None:
        ends = np.arange(1, len(ts) + 1)
        starts = np.maximum(starts, ends - maxsize)
    return starts


def rolling_over_ascending(ts: np.ndarray, v: np.ndarray, nb: int,
                           window_ms: int, maxsize: int | None):
    """Vectorized rolling aggregates over an ascending (ts, v) sequence
    whose first ``nb`` rows are carried buffer (no output emitted for
    them). Returns (cnt, sum, min, max) arrays for rows nb.. and the
    index the live buffer starts at after the last event. Exposed at
    module level so the consistency property and the O(1)-per-event
    micro-bench can drive it without the streaming harness."""
    starts = _window_starts(ts, window_ms, maxsize)
    ends = np.arange(1, len(ts) + 1)
    valid = ~np.isnan(v)
    c_cnt = np.concatenate(([0], np.cumsum(valid)))
    c_sum = np.concatenate(([0.0], np.cumsum(np.where(valid, v, 0.0))))
    cnt = (c_cnt[ends] - c_cnt[starts])[nb:]
    sm = (c_sum[ends] - c_sum[starts])[nb:]
    sv = pd.Series(v)
    roll = sv.rolling(_BoundsIndexer(starts, ends), min_periods=0)
    mn = roll.min().to_numpy()[nb:]
    mx = roll.max().to_numpy()[nb:]
    return cnt, sm, mn, mx, int(starts[-1])


def _scan_front(s_ts: np.ndarray, lo: np.ndarray, nb: int,
                maxsize: int) -> np.ndarray:
    """Exact sequential front-pointer advance for the maxsize-capped
    out-of-order corner: per event, evict the front prefix older than
    the horizon (stopping at the FIRST survivor — the buffer is NOT
    sorted), then drop one more entry if over the cap.  A cap drop can
    expose an expired entry hiding behind the dropped survivor, which
    is why the closed-form prefix-max searchsorted is not exact here.
    Integer comparisons only; each position is passed at most once, so
    a whole batch costs O(n + buffer) — per-event cost stays O(1)
    amortized and flat in buffer length."""
    n = len(lo)
    r = np.empty(n, dtype=np.int64)
    j = 0
    for i in range(n):
        hi = nb + i
        while j < hi and s_ts[j] < lo[i]:
            j += 1
        if hi + 1 - j > maxsize:
            j += 1
        r[i] = j
    return r


def rolling_over_buffered(b_ts: np.ndarray, b_v: np.ndarray,
                          e_ts: np.ndarray, e_v: np.ndarray,
                          window_ms: int, maxsize: int | None):
    """Vectorized out-of-order fallback: sequential buffered-rows
    semantics (front-prefix time eviction stopping at the first
    non-expired entry in INSERTION order, append, maxsize cap) over a
    possibly non-ascending carried buffer.

    The per-event front pointer is closed-form: the scan-from-front
    stop point is the first position whose running maximum reaches the
    horizon, i.e. ``searchsorted(prefix_max(seq), t - window_ms)``
    (resuming the scan event-to-event equals scanning from 0 because
    horizons are nondecreasing and every evicted entry was below an
    earlier horizon).  Exact whenever the maxsize cap never fires; the
    rare cap-binding corner falls back to ``_scan_front`` (pointer
    arithmetic only).  Aggregates are cumulative sums + pandas'
    monotonic-deque variable-window rolling over the [r_i, i] slices —
    O(1) amortized per event, independent of buffer length, no per-row
    Python over values.

    Returns (cnt, sum, min, max) arrays for the events and the index
    the live buffer starts at after the last event."""
    nb, n = len(b_ts), len(e_ts)
    s_ts = np.concatenate([np.asarray(b_ts, dtype=np.int64),
                           np.asarray(e_ts, dtype=np.int64)])
    s_v = np.concatenate([np.asarray(b_v, dtype=np.float64),
                          np.asarray(e_v, dtype=np.float64)])
    lo = s_ts[nb:] - window_ms
    idx = np.arange(n, dtype=np.int64)
    run_max = np.maximum.accumulate(s_ts)
    r = np.minimum(np.searchsorted(run_max, lo, side="left"), nb + idx)
    if maxsize is not None and ((nb + 1 + idx - r) > maxsize).any():
        r = _scan_front(s_ts, lo, nb, maxsize)
    ends = nb + 1 + idx
    valid = ~np.isnan(s_v)
    c_cnt = np.concatenate(([0], np.cumsum(valid)))
    c_sum = np.concatenate(([0.0], np.cumsum(np.where(valid, s_v, 0.0))))
    cnt = c_cnt[ends] - c_cnt[r]
    sm = c_sum[ends] - c_sum[r]
    starts_full = np.zeros(nb + n, dtype=np.int64)
    ends_full = np.zeros(nb + n, dtype=np.int64)
    starts_full[nb:] = r
    ends_full[nb:] = ends
    roll = pd.Series(s_v).rolling(_BoundsIndexer(starts_full, ends_full),
                                  min_periods=0)
    mn = roll.min().to_numpy()[nb:]
    mx = roll.max().to_numpy()[nb:]
    return cnt, sm, mn, mx, int(r[-1]) if n else 0


class _BoundsIndexer:
    """pandas BaseIndexer over precomputed bounds (built lazily because
    pandas.api.indexers import cost belongs at call time)."""

    def __new__(cls, starts: np.ndarray, ends: np.ndarray):
        from pandas.api.indexers import BaseIndexer

        class _Ix(BaseIndexer):
            def get_window_bounds(self, num_values=0, min_periods=None,
                                  center=None, closed=None, step=None):
                return starts.astype(np.int64), ends.astype(np.int64)

        return _Ix()


def streaming_rolling_features(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    window_ms: int,
    id_col: str,
    maxsize: int | None = None,
) -> DataFrame:
    """Per-event rolling aggregates over ``[t - window_ms, t]`` per key,
    computed from streaming state. ``ts_col`` must be int64 epoch-ms
    (use functions.timeutil.to_ms upstream). Emits one row per input
    event: keys + id + ts + cnt/sum/avg/min/max.

    Events are processed in (ts, id) order within each micro-batch;
    state carries the buffer across batches, so with in-order arrival
    the output equals the batch ``window_agg`` stream-peer RANGE frame
    row for row.
    """
    keys = list(keys)
    # key field types come from the input schema — a bigint user id
    # must not be declared string at the applyInPandasWithState
    # boundary (ADVICE r3 low #1)
    ktypes = {f.name: f.dataType.simpleString()
              for f in stream_df.schema.fields}
    # the id column keeps its input type too — a string/uuid id must
    # not be force-cast to long at the state boundary
    out_schema = (
        ", ".join(f"{k} {ktypes[k]}" for k in keys)
        + f", {id_col} {ktypes[id_col]}, {ts_col} long, cnt long,"
          f" sum double, avg double, min double, max double"
    )
    state_schema = "ts array<long>, v array<double>"
    agg_cols = ["cnt", "sum", "avg", "min", "max"]
    out_cols = keys + [id_col, ts_col] + agg_cols

    def emit(key: tuple, ids: np.ndarray, ts: np.ndarray,
             cnt: np.ndarray, s: np.ndarray, mn: np.ndarray,
             mx: np.ndarray) -> pd.DataFrame:
        df = pd.DataFrame({id_col: ids,
                           ts_col: ts.astype(np.int64)})
        for k, v in zip(keys, key):
            df[k] = v
        df["cnt"] = cnt.astype(np.int64)
        empty = cnt == 0
        for name, arr in (("sum", s), ("avg", np.divide(
                s, cnt, out=np.full_like(s, np.nan), where=cnt > 0)),
                ("min", mn), ("max", mx)):
            col = arr.astype(object)
            col[empty | pd.isna(arr.astype("float64"))] = None
            df[name] = col
        return df[out_cols]

    def fast_path(key: tuple, b_ts: np.ndarray, b_v: np.ndarray,
                  e_ts: np.ndarray, e_id: np.ndarray, e_v: np.ndarray):
        """Vectorized in-order path: buffer + batch is one ascending
        sequence; every frame is a [start_i, i] slice of it."""
        ts = np.concatenate([b_ts, e_ts])
        v = np.concatenate([b_v, e_v])
        nb = len(b_ts)
        cnt, sm, mn, mx, new_start = rolling_over_ascending(
            ts, v, nb, window_ms, maxsize)
        return (emit(key, e_id, e_ts, cnt, sm, mn, mx),
                ts[new_start:], v[new_start:])

    def slow_path(key: tuple, b_ts: np.ndarray, b_v: np.ndarray,
                  e_ts: np.ndarray, e_id: np.ndarray, e_v: np.ndarray):
        """Out-of-order fallback (non-ascending carried buffer):
        sequential buffered-rows semantics, vectorized — see
        rolling_over_buffered."""
        cnt, sm, mn, mx, new_start = rolling_over_buffered(
            b_ts, b_v, e_ts, e_v, window_ms, maxsize)
        s_ts = np.concatenate([b_ts, e_ts])
        s_v = np.concatenate([b_v, e_v])
        return (emit(key, e_id, e_ts, cnt, sm, mn, mx),
                s_ts[new_start:], s_v[new_start:])

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState):
        if state.exists:
            ts_buf, v_buf = state.get
            b_ts = np.asarray(ts_buf, dtype=np.int64)
            b_v = np.asarray(v_buf, dtype=np.float64)
        else:
            b_ts = np.empty(0, dtype=np.int64)
            b_v = np.empty(0, dtype=np.float64)
        # one sort over the WHOLE group, not per Arrow chunk: a group
        # larger than maxRecordsPerBatch arrives as several pdfs, and
        # per-chunk sorting would process chunk 2's earlier events
        # after chunk 1's later ones
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            pdf = pdf.sort_values([ts_col, id_col])
            e_ts = pdf[ts_col].to_numpy(np.int64)
            e_id = pdf[id_col].to_numpy()
            e_v = pdf[value_col].to_numpy(np.float64)
            # the fast path needs buffer+batch to be ONE ascending
            # sequence; a prior out-of-order batch can leave a
            # non-ascending buffer (slow_path keeps insertion order —
            # the OpenMLDB buffered-rows semantics), so ascending-ness
            # is checked, not assumed
            b_asc = len(b_ts) < 2 or bool((np.diff(b_ts) >= 0).all())
            if b_asc and (len(b_ts) == 0 or b_ts[-1] <= e_ts[0]):
                out, b_ts, b_v = fast_path(key, b_ts, b_v,
                                           e_ts, e_id, e_v)
            else:
                out, b_ts, b_v = slow_path(key, b_ts, b_v,
                                           e_ts, e_id, e_v)
            yield out
        state.update((b_ts.tolist(), b_v.tolist()))

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
