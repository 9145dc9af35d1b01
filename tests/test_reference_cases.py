"""Run the reference's OWN golden window cases against this engine.

The YAML corpus is the reference's cross-engine consistency mechanism
(SURVEY.md §5.1: one case file drives its C++ engine tests, offline Spark
integration, and end-to-end suites). Here the same files — read directly
from /root/reference/cases (never copied) — drive ``window_agg`` through
the restricted SQL front-end (openmldb_spark/sql.py), and outputs are
compared to the cases' expected golden rows.

Cases whose SQL is outside the front-end's subset (expressions,
subqueries, error-cases, non-batch modes) are counted as skips; the test
asserts a minimum number of PASSING cases per file and zero FAILING
ones.
"""

from __future__ import annotations

import datetime
import math
import os

import numpy as np
import pytest
import yaml

from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmldb_spark.sql import UnsupportedSQL, run_windowed_sql, _RID

CASE_DIR = "/root/reference/cases/function"

FILES = {
    # file -> minimum number of cases that must pass
    "window/test_window_row_range.yaml": 25,
    "window/test_window_row.yaml": 20,
    "window/test_maxsize.yaml": 8,
    # 13 of 19 cases are offline-unsupport in the reference itself
    "window/test_window_exclude_current_time.yaml": 5,
    "window/test_window_union.yaml": 5,
    "window/test_current_row.yaml": 10,
    "window/window_attributes.yaml": 5,
    "window/test_window.yaml": 5,
    "join/test_lastjoin_simple.yaml": 10,
    "cluster/test_window_row.yaml": 3,
    "cluster/test_window_row_range.yaml": 2,
    "join/test_lastjoin_complex.yaml": 4,  # rest are subquery/GROUP BY shapes outside the front-end subset
    "cluster/window_and_lastjoin.yaml": 2,
}

_TYPES = {
    "string": T.StringType(), "int": T.IntegerType(),
    "int32": T.IntegerType(), "bigint": T.LongType(),
    "int64": T.LongType(), "smallint": T.ShortType(),
    "int16": T.ShortType(), "float": T.FloatType(),
    "double": T.DoubleType(), "timestamp": T.TimestampType(),
    "date": T.DateType(), "bool": T.BooleanType(),
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CASE_DIR), reason="reference corpus not available")


def _schema(col_defs):
    fields = []
    for cd in col_defs:
        name, typ = cd.rsplit(" ", 1)
        fields.append(T.StructField(name.strip(), _TYPES[typ.strip()]))
    return T.StructType(fields)


def _conv(value, dtype):
    if value is None or (isinstance(value, str) and value.lower() == "null"):
        return None
    if isinstance(dtype, T.TimestampType):
        return datetime.datetime.utcfromtimestamp(int(value) / 1000.0)
    if isinstance(dtype, T.DateType):
        if isinstance(value, datetime.date):
            return value
        return datetime.date.fromisoformat(str(value))
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
        return int(value)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(value)
    if isinstance(dtype, T.BooleanType):
        if isinstance(value, bool):
            return value
        return str(value).lower() == "true"
    return str(value)


def _rows_of(inp):
    if "rows" in inp:
        return inp["rows"]
    if "data" in inp:
        return [[c.strip() or None for c in ln.split(",")]
                for ln in str(inp["data"]).strip().splitlines()]
    raise KeyError("rows")


def _build_df(spark, inp, with_rid):
    schema = _schema(inp["columns"])
    rows = [tuple(_conv(v, f.dataType) for v, f in zip(r, schema.fields))
            for r in _rows_of(inp)]
    df = spark.createDataFrame(rows, schema)
    if with_rid:
        import pandas as pd
        pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
        pdf[_RID] = range(len(pdf))
        df = spark.createDataFrame(
            pdf, T.StructType(list(schema.fields)
                              + [T.StructField(_RID, T.LongType())]))
    return df


def _values_match(got, exp, dtype_str) -> bool:
    if exp is None or (isinstance(exp, str) and exp.lower() == "null"):
        return got is None or (isinstance(got, float) and math.isnan(got))
    if got is None:
        return False
    t = dtype_str.strip().split()[-1]
    if t in ("float", "double"):
        return math.isclose(float(got), float(exp), rel_tol=1e-5,
                            abs_tol=1e-6)
    if t == "timestamp":
        if isinstance(got, datetime.datetime):
            got = int(got.replace(tzinfo=datetime.timezone.utc)
                      .timestamp() * 1000)
        return int(got) == int(exp)
    if t == "date":
        return str(got) == str(exp)
    if t in ("int", "bigint", "smallint", "int32", "int64", "int16"):
        return int(got) == int(exp)
    if t == "bool":
        return bool(got) == (str(exp).lower() == "true"
                             if not isinstance(exp, bool) else exp)
    return str(got) == str(exp)


def _run_case(spark, case) -> str:
    """Returns 'pass' | 'skip: reason' | raises AssertionError."""
    if case.get("mode") and any(
            m in str(case["mode"])
            for m in ("offline-unsupport", "batch-unsupport")):
        return "skip: mode"
    if any("TODO" in str(t) for t in (case.get("tags") or [])):
        return "skip: TODO-tagged (golden output marked broken upstream)"
    if not case.get("sql") or case.get("sqls"):
        return "skip: no single sql"
    expect = case.get("expect") or {}
    if expect.get("success") is False:
        return "skip: error-case"
    if "columns" not in expect or "rows" not in expect:
        return "skip: no golden rows"
    try:
        tables = [_build_df(spark, inp, with_rid=True)
                  for inp in case["inputs"]]
    except Exception as e:                      # unsupported input shape
        return f"skip: inputs ({e})"

    # dataProvider: d[0] placeholder iterates variants; expectProvider
    # overrides the expected rows per variant index
    dp = case.get("dataProvider")
    if dp:
        if len(dp) != 1 or "d[1]" in case["sql"]:
            return "skip: multi-dim dataProvider"
        ep = case.get("expectProvider") or {}
        for vi, variant in enumerate(dp[0]):
            sql_v = case["sql"].replace("d[0]", str(variant))
            exp_v = dict(expect)
            over = ep.get(vi, ep.get(str(vi)))
            if over:
                exp_v.update(over)
            if "rows" not in exp_v or "columns" not in exp_v:
                return "skip: provider without golden rows"
            res = _exec_sql_case(spark, sql_v, tables, exp_v)
            if res != "pass":
                return res
        return "pass"
    return _exec_sql_case(spark, case["sql"], tables, expect)


def _exec_sql_case(spark, sql, tables, expect) -> str:
    try:
        low = " ".join(sql.lower().split())
        if "last join" in low and " window " in low:
            from openmldb_spark.sql import run_join_window_sql
            out = run_join_window_sql(sql, tables)
        elif "last join" in low:
            from openmldb_spark.sql import run_lastjoin_sql
            out = run_lastjoin_sql(sql, tables)
        else:
            out = run_windowed_sql(sql, tables)
    except UnsupportedSQL as e:
        return f"skip: sql ({e})"
    got = out.toPandas().sort_values(_RID).reset_index(drop=True)

    exp_cols = expect["columns"]
    exp_rows = expect["rows"]
    order_col = expect.get("order")
    # canonical order: expected rows sorted by their order column must
    # correspond to got sorted by the same column; we sort both by the
    # order column value
    names = [c.rsplit(" ", 1)[0].strip() for c in exp_cols]
    got_cols = [c for c in got.columns if c != _RID]
    assert len(got_cols) == len(names), \
        f"column count {got_cols} vs {names}"
    # positional mapping: unaliased items get literal SQL-text names in
    # the expected schema, so match select-list position, not name
    if order_col and order_col in names:
        oi = names.index(order_col)
        exp_rows = sorted(exp_rows,
                          key=lambda r: (r[oi] is None, str(r[oi])))
        got = got.sort_values(got_cols[oi],
                              key=lambda s: s.astype(str)) \
            .reset_index(drop=True)
    assert len(got) == len(exp_rows), \
        f"row count {len(got)} vs {len(exp_rows)}"
    for ri, erow in enumerate(exp_rows):
        for gname, cdef, ev in zip(got_cols, exp_cols, erow):
            name = gname
            gv = got.loc[ri, gname]
            import pandas as pd
            if not isinstance(gv, (list, np.ndarray)) and pd.isna(gv):
                gv = None
            assert _values_match(gv, ev, cdef), (
                f"row {ri} col {name}: got {gv!r} expected {ev!r}")
    return "pass"


@pytest.mark.parametrize("fname,min_pass", sorted(FILES.items()))
def test_reference_golden_cases(spark, fname, min_pass):
    with open(os.path.join(CASE_DIR, fname)) as f:
        doc = yaml.safe_load(f)
    n_pass, fails, skips = 0, [], []
    for case in doc["cases"]:
        cid = f"{fname}#{case.get('id')}"
        try:
            res = _run_case(spark, case)
        except AssertionError as e:
            fails.append(f"{cid}: {e}")
            continue
        except Exception as e:                  # engine error = failure
            fails.append(f"{cid}: ERROR {type(e).__name__} {e}")
            continue
        if res == "pass":
            n_pass += 1
        else:
            skips.append(f"{cid}: {res}")
    assert not fails, "\n".join(fails[:10]) + f"\n({len(fails)} failures)"
    assert n_pass >= min_pass, (
        f"only {n_pass} cases passed (need {min_pass}); skips:\n"
        + "\n".join(skips[:40]))
