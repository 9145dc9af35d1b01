"""LAST JOIN (as-of) — golden cases + differential oracle + strategy parity.

Golden semantics mirror the worked example in the reference doc
docs/en/reference/sql/dql/JOIN_CLAUSE.md:147-245 (sorted LAST JOIN:
left row keeps the right match that is last under ORDER BY; NULL-padded
when no match; point-in-time via right.ts <= left.ts).
"""

import numpy as np
import pandas as pd
import pytest

from openmldb_spark.operators.last_join import last_join
from tests.conftest import assert_pdf_allclose
from tests.oracle import oracle_last_join

BASE = 1700000000000


def _ts(ms):
    return pd.to_datetime(BASE + ms, unit="ms")


def left_pdf():
    return pd.DataFrame({
        "conv_id": ["a", "a", "b", "c"],
        "turn_idx": [0, 1, 0, 0],
        "ts": [_ts(1000), _ts(5000), _ts(2000), _ts(100)],
    })


def right_pdf():
    return pd.DataFrame({
        "conv_id": ["a", "a", "a", "b", "d"],
        "ts": [_ts(0), _ts(3000), _ts(9000), _ts(2000), _ts(0)],
        "segment": ["free", "pro", "team", "ent", "x"],
        "score": [1.0, 2.0, np.nan, 4.0, 5.0],
    })


@pytest.mark.parametrize("strategy", ["sort_merge", "join_rank", "broadcast"])
def test_point_in_time_golden(spark, strategy):
    got = last_join(
        spark.createDataFrame(left_pdf()), spark.createDataFrame(right_pdf()),
        on="conv_id", order_by="ts", left_ts="ts", right_ts="ts",
        strategy=strategy,
    ).toPandas()
    by = {(r["conv_id"], r["turn_idx"]): r["segment"]
          for _, r in got.iterrows()}
    assert by[("a", 0)] == "free"   # only ts=0 version at-or-before 1000
    assert by[("a", 1)] == "pro"    # ts=3000 <= 5000; ts=9000 excluded (future)
    assert by[("b", 0)] == "ent"    # equal ts: closed bound includes it
    assert by[("c", 0)] is None     # no right rows → NULL-padded
    assert len(got) == 4            # exactly one output row per left row


@pytest.mark.parametrize("strategy", ["sort_merge", "join_rank"])
def test_differential_vs_oracle(spark, strategy):
    rng = np.random.default_rng(3)
    nl, nr = 500, 300
    left = pd.DataFrame({
        "conv_id": rng.choice([f"c{i}" for i in range(20)], nl),
        "turn_idx": np.arange(nl),
        "ts": pd.to_datetime(
            BASE + rng.integers(0, 100_000, nl).astype(np.int64), unit="ms"),
    })
    right = pd.DataFrame({
        "conv_id": rng.choice([f"c{i}" for i in range(25)], nr),
        "ts": pd.to_datetime(
            BASE + rng.integers(0, 100_000, nr).astype(np.int64), unit="ms"),
        "rid": np.arange(nr),
        "score": rng.random(nr).round(6),
    })
    got = last_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="conv_id", order_by="ts", left_ts="ts", right_ts="ts",
        strategy=strategy, tiebreak="rid",
    ).toPandas()
    exp = oracle_last_join(left, right, ["conv_id"], "ts",
                           left_ts="ts", right_ts="ts", tiebreak="rid")
    assert_pdf_allclose(got, exp, sort_by=["conv_id", "turn_idx"],
                        float_cols=["score"])


def test_strategies_agree(spark):
    """sort_merge == join_rank on identical input (consistency test,
    mirroring the reference's batch-vs-request parity)."""
    rng = np.random.default_rng(9)
    nl, nr = 800, 500
    left = pd.DataFrame({
        "k": rng.choice(list("abcdefgh"), nl), "i": np.arange(nl),
        "ts": pd.to_datetime(BASE + rng.integers(0, 50_000, nl).astype(np.int64),
                             unit="ms"),
    })
    right = pd.DataFrame({
        "k": rng.choice(list("abcdefghij"), nr),
        "ts": pd.to_datetime(BASE + rng.integers(0, 50_000, nr).astype(np.int64),
                             unit="ms"),
        "rid": np.arange(nr), "v": rng.random(nr).round(6),
    })
    a = last_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="k", order_by="ts", left_ts="ts", right_ts="ts",
                  strategy="sort_merge", tiebreak="rid").toPandas()
    b = last_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="k", order_by="ts", left_ts="ts", right_ts="ts",
                  strategy="join_rank", tiebreak="rid").toPandas()
    assert_pdf_allclose(a, b, sort_by=["k", "i"], float_cols=["v"])


def test_last_join_no_order_requires_explicit(spark):
    """Unsorted LAST JOIN: we always require an explicit order column —
    deterministic by construction (reference batch picks an arbitrary
    match, JoinPlan.scala:190-196; divergence documented)."""
    got = last_join(
        spark.createDataFrame(left_pdf()), spark.createDataFrame(right_pdf()),
        on="conv_id", order_by="ts", strategy="join_rank",
    ).toPandas()
    # without point-in-time the max-ts row wins
    by = {(r["conv_id"], r["turn_idx"]): r["segment"]
          for _, r in got.iterrows()}
    assert by[("a", 0)] == "team"
    assert by[("a", 1)] == "team"


def test_zero_temporal_leakage(spark):
    """No output row may carry right-side data with right.ts > left.ts."""
    got = last_join(
        spark.createDataFrame(left_pdf()),
        spark.createDataFrame(right_pdf().rename(columns={"ts": "mts"})),
        on="conv_id", order_by="mts", left_ts="ts", right_ts="mts",
    ).toPandas()
    joined = got[got["mts"].notna()]
    assert (joined["mts"] <= joined["ts"]).all()
