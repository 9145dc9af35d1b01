"""Property-based differential test: the window kernel (a pure
pandas->pandas function) vs the brute-force oracle, over randomized
frames, data shapes, and OpenMLDB extensions. Runs entirely in-process —
no Spark jobs — so hypothesis can explore hundreds of cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from openmldb_spark.operators.window_agg import (
    _EMIT, _ORD, _SIDE, Agg, WindowSpecFE, _make_kernel)
from tests.oracle import oracle_window

AGGS = [
    Agg("a_cnt", "count", "v"),
    Agg("a_sum", "sum", "v"),
    Agg("a_min", "min", "v"),
    Agg("a_max", "max", "v"),
    Agg("a_avg", "avg", "v"),
    Agg("a_dc", "distinct_count", "v"),
    Agg("a_cw", "count_where", "v", cond="flag"),
    Agg("a_fv", "first_value", "v"),
    Agg("a_t1r", "top1_ratio", "v"),
    Agg("a_tnf", "topn_frequency", "v", n=2),
    Agg("a_cc", "count_cate", "v", cate="cat"),
    Agg("a_sc", "sum_cate", "v", cate="cat"),
    Agg("a_lag", "lag", "v", n=2),
]
ORACLE_AGGS = [
    ("a_cnt", "count", "v"),
    ("a_sum", "sum", "v"),
    ("a_min", "min", "v"),
    ("a_max", "max", "v"),
    ("a_avg", "avg", "v"),
    ("a_dc", "distinct_count", "v"),
    ("a_cw", "count_where", "v", lambda r: bool(r["flag"])),
    ("a_fv", "first_value", "v"),
    ("a_t1r", "top1_ratio", "v"),
    ("a_tnf", "topn_frequency", "v", 2),
    ("a_cc", "count_cate", "v", "cat"),
    ("a_sc", "sum_cate", "v", "cat"),
    ("a_lag", "lag", "v", 2),
]
STR_AGGS = {"a_tnf", "a_cc", "a_sc"}
# declared source types, as window_agg's production path supplies them:
# value column v is double, category column cat is string — this drives
# null-collapse in distinct_count and %f value rendering in sum_cate
SRC_TYPES = {**{a.name: "double" for a in AGGS if a.col == "v"},
             **{f"{a.name}/cate": "string" for a in AGGS if a.cate}}
DTYPES = {"a_cnt": "bigint", "a_sum": "double", "a_min": "double",
          "a_max": "double", "a_avg": "double", "a_dc": "bigint",
          "a_cw": "bigint", "a_fv": "double", "a_t1r": "double",
          "a_tnf": "string", "a_cc": "string", "a_sc": "string", "a_lag": "double"}


@st.composite
def case(draw):
    n = draw(st.integers(2, 24))
    ts = sorted(draw(st.lists(st.integers(0, 30), min_size=n, max_size=n)))
    vals = draw(st.lists(
        st.one_of(st.none(), st.integers(-5, 5).map(float)),
        min_size=n, max_size=n))
    flags = draw(st.lists(st.booleans(), min_size=n, max_size=n))
    sides = draw(st.lists(st.sampled_from([0, 1]), min_size=n, max_size=n))
    if 1 not in sides:
        sides[0] = 1
    frame = draw(st.sampled_from(["rows", "range"]))
    start = draw(st.integers(0, 8))
    end = draw(st.integers(0, start))
    # OPEN bounds exist only for ROWS_RANGE time offsets in the dialect
    # (WINDOW_CLAUSE.md) and need a non-degenerate width
    open_start = draw(st.booleans()) and frame == "range" and start >= 1
    spec = WindowSpecFE(
        ["k"], "ts", frame=frame, start=start, end=end,
        open_start=open_start,
        maxsize=draw(st.one_of(st.none(), st.integers(1, 4))),
        exclude_current_time=draw(st.booleans()),
        exclude_current_row=draw(st.booleans()),
        instance_not_in_window=draw(st.booleans()),
        tiebreak=("tb",),
        peer="stream",  # excludes/inst_not are stream-only semantics
    )
    if not (spec.exclude_current_time or spec.exclude_current_row
            or spec.instance_not_in_window):
        spec = WindowSpecFE(**{**spec.__dict__,
                               "peer": draw(st.sampled_from(
                                   ["stream", "sql"]))})
    has_union = 0 in sides
    if spec.instance_not_in_window and not has_union:
        spec = WindowSpecFE(**{**spec.__dict__,
                               "instance_not_in_window": False})
    return ts, vals, flags, sides, spec, has_union


@settings(max_examples=500, deadline=None)
@given(case())
def test_kernel_matches_oracle(c):
    ts, vals, flags, sides, spec, has_union = c
    n = len(ts)
    pdf = pd.DataFrame({
        "k": ["g"] * n,
        "ts": ts,
        "tb": range(n),
        "v": vals,
        "cat": [f"c{i % 3}" for i in range(n)],
        "flag": flags,
        _ORD: ts,
        _SIDE: sides,
        "__omls_cond0": flags,
    })
    pdf[_EMIT] = pdf[_SIDE]

    # kernel needs union handling only when union rows exist
    spec_k = spec
    if not has_union:
        pdf[_SIDE] = 1
        pdf[_EMIT] = 1
        spec_k = WindowSpecFE(**{**spec.__dict__,
                                 "instance_not_in_window": False})

    kernel = _make_kernel(
        spec_k, AGGS, [a.name for a in AGGS],
        ["k", "ts", "tb", "v", "cat", "flag"], DTYPES,
        {"flag": "__omls_cond0"}, SRC_TYPES)
    got = kernel(pdf.copy()).sort_values("tb").reset_index(drop=True)

    prim = pdf[pdf[_SIDE] == 1][["k", "ts", "tb", "v", "cat", "flag"]]
    uni = pdf[pdf[_SIDE] == 0][["k", "ts", "tb", "v", "cat", "flag"]]
    exp = oracle_window(
        prim, ["k"], "ts",
        frame=spec_k.frame, start=spec_k.start, end=spec_k.end,
        open_start=spec_k.open_start, maxsize=spec_k.maxsize,
        exclude_current_time=spec_k.exclude_current_time,
        exclude_current_row=spec_k.exclude_current_row,
        union_pdf=uni if len(uni) else None,
        instance_not_in_window=spec_k.instance_not_in_window,
        tiebreak=["tb"], peer=spec_k.peer,
        aggs=ORACLE_AGGS,
    ).sort_values("tb").reset_index(drop=True)

    assert len(got) == len(exp)
    for name in DTYPES:
        if name in STR_AGGS:
            gs = ["" if v in (None, "") or (isinstance(v, float)
                  and np.isnan(v)) else str(v) for v in got[name]]
            es = ["" if v in (None, "") or (isinstance(v, float)
                  and np.isnan(v)) else str(v) for v in exp[name]]
            assert gs == es, (name, spec_k, pdf.to_dict("list"), gs, es)
            continue
        g = pd.to_numeric(got[name], errors="coerce").to_numpy(float)
        e = pd.to_numeric(exp[name], errors="coerce").to_numpy(float)
        ok = (np.isnan(g) & np.isnan(e)) | np.isclose(g, e, rtol=1e-9,
                                                      equal_nan=False)
        assert ok.all(), (
            name, spec_k,
            pdf.to_dict("list"),
            got[name].tolist(), exp[name].tolist())
