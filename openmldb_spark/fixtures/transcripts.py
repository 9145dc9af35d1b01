"""Deterministic synthetic transcript corpus (FIXTURES.md F1-F3).

Shape mandated by BASELINE.json input_hint:
  (conv_id string, turn_idx int32, role string, text string,
   tool string, ts timestamp)

Zipf-skewed conversation lengths (a few very long convs exercise the skew
paths), duplicate-ts pairs (same-ts tie cases mirroring the reference's
TestWindowUnionWithSameTimestamp.scala), NULL ts/text/tool rows, irregular
gaps > session threshold. Everything is seeded — two calls with the same
args produce byte-identical tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "code", "browser", "files", None], dtype=object)
_WORDS = np.array(
    "the a and to of in is it you that was for on are with as at be this "
    "have from or had by word what some we can out other were all there "
    "when up use your how said an each she which do their time if will "
    "way about many then them write would like so these her long make "
    "thing see him two has look more day could go come did number sound "
    "no most people my over know water than call first who may down side "
    "been now find any new work part take get place made live where after "
    "back little only round man year came show every good me give our "
    "under name very through just form sentence great think say help low "
    "line differ turn cause much mean before move right boy old too same "
    "tell does set three want air well also play small end put home read "
    "hand port large spell add even land here must big high such follow "
    "act why ask men change went light kind off need house picture try us "
    "again animal point mother world near build self earth father".split()
)

BASE_TS_MS = 1704067200000  # 2024-01-01T00:00:00Z


def _conv_sizes(n_convs: int, rng: np.random.Generator, zipf_a: float,
                max_turns: int) -> np.ndarray:
    sizes = rng.zipf(zipf_a, size=n_convs)
    return np.clip(sizes, 1, max_turns).astype(np.int64)


def gen_transcripts(n_convs: int = 200, seed: int = 42, zipf_a: float = 1.5,
                    max_turns: int = 4000, gap_s: int = 1800,
                    null_frac: float = 0.03) -> pd.DataFrame:
    """Primary `transcripts` table (FIXTURES.md F1)."""
    rng = np.random.default_rng(seed)
    sizes = _conv_sizes(n_convs, rng, zipf_a, max_turns)
    n = int(sizes.sum())
    conv_ord = np.repeat(np.arange(n_convs), sizes)
    conv_id = np.char.add("conv_", np.char.zfill(conv_ord.astype(str), 6))
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype(np.int32)

    # ts: per conv start + cumulative deltas; ~5% zero-delta (duplicate ts),
    # ~2% session-gap-sized jumps.
    start = rng.integers(0, 30 * 86_400_000, size=n_convs)
    deltas = rng.integers(500, 120_000, size=n)
    dup = rng.random(n) < 0.05
    deltas[dup] = 0
    jump = rng.random(n) < 0.02
    deltas[jump] = gap_s * 1000 + rng.integers(1000, 600_000, size=int(jump.sum()))
    first = turn_idx == 0
    deltas[first] = 0
    # cumulative sum within conv: global cumsum minus the cumsum at conv start
    g = np.cumsum(deltas)
    conv_base = g - np.repeat(g[first], sizes)
    ts_ms = BASE_TS_MS + np.repeat(start, sizes) + conv_base

    role = ROLES[rng.integers(0, len(ROLES), size=n)]
    tool = TOOLS[rng.integers(0, len(TOOLS), size=n)]
    nwords = rng.integers(0, 12, size=n)
    flat = _WORDS[rng.integers(0, len(_WORDS), size=int(nwords.sum()))]
    bounds = np.cumsum(nwords)[:-1]
    text = np.array([" ".join(w) for w in np.split(flat, bounds)], dtype=object)

    pdf = pd.DataFrame({
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": pd.to_datetime(ts_ms, unit="ms"),
    })
    # NULL edge cases: ts (dropped by window ops), text
    null_ts = rng.random(n) < null_frac
    pdf.loc[null_ts, "ts"] = pd.NaT
    null_text = rng.random(n) < null_frac
    pdf.loc[null_text, "text"] = None
    # one conversation with all-equal ts
    eq = pdf["conv_id"] == "conv_000003"
    if eq.any():
        pdf.loc[eq, "ts"] = pd.Timestamp(BASE_TS_MS, unit="ms")
    return pdf


def gen_tool_events(n_convs: int = 200, seed: int = 43,
                    events_per_conv: int = 3) -> pd.DataFrame:
    """Secondary table for WINDOW UNION (FIXTURES.md F2): same 6 columns,
    disjoint turn_idx space (negative), ts interleaved with F1 including
    exact-ts collisions."""
    rng = np.random.default_rng(seed)
    n = n_convs * events_per_conv
    conv_ord = np.repeat(np.arange(n_convs), events_per_conv)
    pdf = pd.DataFrame({
        "conv_id": np.char.add("conv_", np.char.zfill(conv_ord.astype(str), 6)),
        "turn_idx": (-1 - np.tile(np.arange(events_per_conv), n_convs)).astype(np.int32),
        "role": np.array(["tool"] * n),
        "text": np.array([None] * n, dtype=object),
        "tool": TOOLS[rng.integers(0, 3, size=n)],
        "ts": pd.to_datetime(
            BASE_TS_MS + rng.integers(0, 31 * 86_400_000, size=n), unit="ms"),
    })
    # exact-ts collision rows with F1 (primary must sort after these)
    pdf.loc[: n_convs // 4, "ts"] = pd.Timestamp(BASE_TS_MS, unit="ms")
    return pdf


def gen_conv_meta(n_convs: int = 200, seed: int = 44,
                  versions: int = 4) -> pd.DataFrame:
    """Right table for LAST JOIN (FIXTURES.md F3): multiple versions per
    conv_id incl. duplicate-ts versions, future versions, and conv_ids
    absent from F1."""
    rng = np.random.default_rng(seed)
    # extra conv ids beyond F1's range -> unmatched-right; F1 convs missing
    # here -> NULL-padded left rows
    ids = np.arange(-5, n_convs - 3)
    n = len(ids) * versions
    conv_ord = np.repeat(ids, versions)
    ts_ms = BASE_TS_MS - 86_400_000 + rng.integers(0, 40 * 86_400_000, size=n)
    dup = rng.random(n) < 0.1
    ts_ms[dup] = BASE_TS_MS + 3_600_000  # duplicate version ts ties
    pdf = pd.DataFrame({
        "conv_id": np.char.add(
            "conv_", np.char.zfill(np.abs(conv_ord).astype(str), 6)),
        "ts": pd.to_datetime(ts_ms, unit="ms"),
        "segment": np.array(["free", "pro", "team", "enterprise"])[
            rng.integers(0, 4, size=n)],
        "score": np.round(rng.random(n) * 100, 3),
    })
    pdf.loc[rng.random(n) < 0.05, "score"] = np.nan
    return pdf


def transcripts_df(spark, **kw):
    pdf = gen_transcripts(**kw)
    return spark.createDataFrame(pdf)


def tool_events_df(spark, **kw):
    return spark.createDataFrame(gen_tool_events(**kw))


def conv_meta_df(spark, **kw):
    return spark.createDataFrame(gen_conv_meta(**kw))
