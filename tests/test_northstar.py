"""North-star end-to-end: the full transcript feature vector over the
BASELINE.json-mandated table shape (conv_id, turn_idx, role, text, tool,
ts), verified for:

- np.allclose match vs the independent pandas oracle at every
  (conv_id, turn_idx) key,
- zero temporal leakage (as-of payloads satisfy meta_ts <= ts),
- per-turn text equality under stable turn ordering,
- parallelism invariance (repartitioned input -> identical output) and
  skew-salting invariance (salted == unsalted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from openmldb_spark import (
    Agg, SkewConfig, WindowSpecFE, last_join, sessionize, window_agg)
from openmldb_spark.fixtures import (
    conv_meta_df, gen_conv_meta, gen_transcripts, transcripts_df)
from tests.oracle import oracle_last_join, oracle_window


N_CONVS = 60


@pytest.fixture(scope="module")
def tdata(spark):
    sdf = transcripts_df(spark, n_convs=N_CONVS, max_turns=300)
    pdf = gen_transcripts(n_convs=N_CONVS, max_turns=300)
    return sdf, pdf


@pytest.fixture(scope="module")
def meta(spark):
    return conv_meta_df(spark, n_convs=N_CONVS), \
        gen_conv_meta(n_convs=N_CONVS)


SPEC_KW = dict(frame="range", start=600_000, end=0, maxsize=50)
AGGS = [
    Agg("n_turns_10m", "count", "turn_idx"),
    Agg("n_user_10m", "count_where", "turn_idx", cond="role = 'user'"),
    Agg("top_tool", "topn_frequency", "tool", n=2),
    Agg("top_role_ratio", "top1_ratio", "role"),
    Agg("prev_tool", "lag", "tool", n=1),
]
ORACLE_AGGS = [
    ("n_turns_10m", "count", "turn_idx"),
    ("n_user_10m", "count_where", "turn_idx",
     lambda r: r["role"] == "user"),
    ("top_tool", "topn_frequency", "tool", 2),
    ("top_role_ratio", "top1_ratio", "role"),
    ("prev_tool", "lag", "tool", 1),
]


def _features(sdf, meta_sdf, skew=None):
    spec = WindowSpecFE(["conv_id"], "ts", tiebreak=("turn_idx",),
                        **SPEC_KW)
    out = window_agg(sdf, spec, AGGS, skew=skew)
    out = last_join(out, meta_sdf, on="conv_id", order_by="ts",
                    left_ts="ts", right_ts="ts", tiebreak="score")
    return sessionize(out, "conv_id", "ts", gap_ms=1_800_000,
                      tiebreak=("turn_idx",))


def _canon(pdf):
    return pdf.sort_values(["conv_id", "turn_idx"],
                           kind="mergesort").reset_index(drop=True)


def test_feature_vector_allclose_and_text_equality(tdata, meta):
    sdf, pdf = tdata
    meta_sdf, meta_pdf = meta
    got = _canon(_features(sdf, meta_sdf).toPandas())

    exp_w = oracle_window(
        pdf, ["conv_id"], "ts", tiebreak=["turn_idx"],
        aggs=ORACLE_AGGS, **SPEC_KW)
    exp_j = oracle_last_join(exp_w, meta_pdf, ["conv_id"], "ts",
                             left_ts="ts", right_ts="ts", tiebreak="score")
    exp = _canon(exp_j)

    assert len(got) == len(exp)
    key_g = list(zip(got.conv_id, got.turn_idx))
    key_e = list(zip(exp.conv_id, exp.turn_idx))
    assert key_g == key_e, "row keys diverge under stable turn ordering"

    # per-turn text equality (the input_hint invariant)
    tg = got.text.where(pd.notna(got.text), None)
    te = exp.text.where(pd.notna(exp.text), None)
    assert list(tg) == list(te)

    # numeric features: allclose at every (conv_id, turn_idx)
    for col in ["n_turns_10m", "n_user_10m", "top_role_ratio", "score"]:
        g = pd.to_numeric(got[col], errors="coerce").to_numpy(float)
        e = pd.to_numeric(exp[col], errors="coerce").to_numpy(float)
        assert ((np.isnan(g) & np.isnan(e)) |
                np.isclose(g, e, rtol=1e-6, equal_nan=False)).all(), col
    # categorical features: exact
    for col in ["top_tool", "prev_tool", "segment"]:
        g = got[col].where(pd.notna(got[col]), None)
        e = exp[col].where(pd.notna(exp[col]), None)
        assert list(g) == list(e), col


def test_zero_temporal_leakage(tdata, meta):
    sdf, _ = tdata
    meta_sdf, _ = meta
    out = _features(sdf, meta_sdf)
    assert out.filter(F.col("ts_r") > F.col("ts")).count() == 0


def test_parallelism_and_salting_invariance(tdata, meta):
    sdf, _ = tdata
    meta_sdf, _ = meta
    base = _canon(_features(sdf, meta_sdf).toPandas())
    repart = _canon(_features(sdf.repartition(13), meta_sdf).toPandas())
    salted = _canon(_features(sdf, meta_sdf,
                              skew=SkewConfig(parts=3, min_rows=50))
                    .toPandas())
    for other, label in [(repart, "repartition"), (salted, "salted")]:
        for col in base.columns:
            g = base[col].where(pd.notna(base[col]), None)
            o = other[col].where(pd.notna(other[col]), None)
            if pd.api.types.is_float_dtype(base[col]):
                gn = pd.to_numeric(g, errors="coerce").to_numpy(float)
                on = pd.to_numeric(o, errors="coerce").to_numpy(float)
                ok = (np.isnan(gn) & np.isnan(on)) | \
                    np.isclose(gn, on, rtol=1e-9, equal_nan=False)
                assert ok.all(), (label, col)
            else:
                assert list(g.astype(str)) == list(o.astype(str)), \
                    (label, col)
