"""Checkpointed, resumable job layer.

Modeled on the reference's intermediate-materialization debug path
(``slowRunWithHDFSCache``, java/openmldb-batch/.../SparkPlanner.scala:291-327:
materialize every plan node to ``<dir>/<node>/data`` and skip recompute when
``data/_SUCCESS`` exists) promoted to a first-class contract:

- a job is a DAG of named stages, each a function (spark, *dep_dfs) -> DataFrame;
- each stage's output is written once to ``<root>/<job>/<stage>/data`` (parquet,
  ``_SUCCESS``-gated by Spark's committer — a partially-written stage is never
  trusted);
- a ``manifest.json`` per stage records lineage (dep stage names + their
  fingerprints), schema, row counts, per-output-partition metrics (rows/bytes
  per file from parquet footers — metadata-only, no rescan), and wall time;
- ``run(resume=True)`` skips any stage whose ``_SUCCESS`` exists AND whose
  recorded fingerprint (stage name + stage-function code identity +
  declared external-input size/mtime + dep fingerprints) is unchanged, so
  editing a stage function, refreshing source data, or changing anything
  upstream invalidates it and its downstream;
- downstream stages read the materialized parquet, not the in-memory lineage —
  a resumed run is bit-identical to a fresh one (asserted in tests).

At cluster scale this is the failure-domain boundary: a 10-stage feature
backfill over 10^12 turns resumes from the last durable stage instead of
recomputing the world, and the per-partition metrics expose skew (a partition
with 100x the median rows = a salting bug).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[..., DataFrame]
    deps: Sequence[str] = field(default_factory=tuple)
    inputs: Sequence[str] = field(default_factory=tuple)  # external paths


def _hash_value(h, v, seen: set) -> None:
    """Stable hash of one const / closure / default value. Code objects
    and functions recurse structurally (bytecode + consts + names) —
    their repr() embeds a memory address, which would make the
    fingerprint differ across processes (resume never skips) yet
    collide across edits when addresses happen to match (ADVICE r2 #3).
    Containers recurse element-wise so nested lambdas inside tuples are
    still reached."""
    import types
    if isinstance(v, types.CodeType):
        if id(v) in seen:
            return
        seen.add(id(v))
        h.update(b"<code>")
        h.update(v.co_code)
        h.update(repr(v.co_names).encode())
        h.update(repr(v.co_varnames).encode())
        for c in v.co_consts:
            _hash_value(h, c, seen)
    elif isinstance(v, types.FunctionType):
        if id(v) in seen:
            return
        seen.add(id(v))
        h.update(b"<fn>")
        _hash_value(h, v.__code__, seen)
        for cell in (v.__closure__ or ()):
            try:
                _hash_value(h, cell.cell_contents, seen)
            except ValueError:              # pragma: no cover
                h.update(b"<empty-cell>")
        for d in (v.__defaults__ or ()):
            _hash_value(h, d, seen)
        # referenced globals BY VALUE, not just name: a stage reading a
        # module-level constant (THRESHOLD = 5) must invalidate when
        # the constant is edited — globals are looked up at call time,
        # so co_names alone can't see the change. Same-module helper
        # functions recurse structurally (their edits invalidate too);
        # foreign functions/classes/modules hash by qualname so the
        # fingerprint stays stable across processes and library
        # versions don't churn every checkpoint.
        g = v.__globals__
        for name in sorted(_code_names(v.__code__)):
            if name not in g:
                continue
            gv = g[name]
            h.update(f"<g:{name}>".encode())
            if isinstance(gv, types.ModuleType):
                h.update(gv.__name__.encode())
            elif isinstance(gv, type):
                h.update(f"{gv.__module__}.{gv.__qualname__}".encode())
            elif isinstance(gv, types.FunctionType):
                if gv.__module__ == v.__module__:
                    _hash_value(h, gv, seen)
                else:
                    h.update(
                        f"{gv.__module__}.{gv.__qualname__}".encode())
            elif isinstance(gv, (int, float, str, bytes, bool,
                                 type(None), tuple, frozenset)):
                # IMMUTABLE values hash by content (the THRESHOLD=5
                # edit case); mutable containers hash by type only —
                # a stage mutating a module-level counter/cache at run
                # time must not churn its own fingerprint and defeat
                # resume
                _hash_value(h, gv, seen)
            else:
                h.update(type(gv).__name__.encode())
    elif isinstance(v, (tuple, list, frozenset)):
        h.update(b"<seq>")
        items = sorted(map(repr, v)) if isinstance(v, frozenset) else v
        for x in items:
            _hash_value(h, x, seen)
    elif isinstance(v, dict):
        h.update(b"<map>")
        for k in sorted(v, key=repr):
            _hash_value(h, k, seen)
            _hash_value(h, v[k], seen)
    else:
        # strip memory addresses from reprs of arbitrary objects —
        # identity still participates (type + visible fields) but the
        # fingerprint no longer churns per process
        import re as _re
        h.update(_re.sub(r" at 0x[0-9a-fA-F]+", "", repr(v)).encode())


def _code_names(code) -> set:
    """Every global name referenced by a code object or any code object
    nested inside it (inner defs, lambdas, comprehensions)."""
    import types
    names = set(code.co_names)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            names |= _code_names(c)
    return names


def _code_fp(fn: Callable) -> str:
    """Content fingerprint of a stage function: bytecode + consts +
    referenced names + closure values + defaults + referenced global
    VALUES — so editing the stage body, a captured parameter, or a
    module-level constant the stage reads invalidates its checkpoint.
    Nested code objects (inner defs, lambdas) and function-valued
    closures/globals are hashed structurally, never by repr, so the
    fingerprint is stable across processes and sensitive to edits."""
    import functools
    h = hashlib.sha256()
    if isinstance(fn, functools.partial):
        # structural: partial(<fn at 0x...>) repr embeds a per-process
        # address — hashing it would recompute every stage on every
        # resume
        h.update(b"<partial>")
        _hash_value(h, fn.func, set())
        _hash_value(h, fn.args, set())
        _hash_value(h, fn.keywords, set())
        return h.hexdigest()[:16]
    try:
        fn.__code__
        _hash_value(h, fn, set())
    except AttributeError:                  # non-plain callables
        try:
            import inspect
            h.update(inspect.getsource(fn).encode())
        except Exception:                   # pragma: no cover
            import re as _re
            h.update(_re.sub(r" at 0x[0-9a-fA-F]+", "",
                             repr(fn)).encode())
    return h.hexdigest()[:16]


def _input_fp(paths: Sequence[str]) -> str:
    """Identity of declared external inputs: per path, (name, size,
    mtime_ns) of the path itself and of its direct children (covers
    parquet directories) — metadata-only, no data scan."""
    h = hashlib.sha256()
    for p in paths:
        h.update(p.encode())
        try:
            st = os.stat(p)
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
            if os.path.isdir(p):
                for child in sorted(os.listdir(p)):
                    cp = os.path.join(p, child)
                    cs = os.stat(cp)
                    h.update(f"{child}:{cs.st_size}:"
                             f"{cs.st_mtime_ns}".encode())
        except OSError:
            h.update(b"<missing>")
    return h.hexdigest()[:16]


def _file_metrics(data_dir: str) -> list[dict]:
    """Per-output-partition metrics from parquet footers (metadata only)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:           # pragma: no cover
        return []
    out = []
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(data_dir, f)
        try:
            md = pq.ParquetFile(p).metadata
            out.append({"file": f, "rows": md.num_rows,
                        "bytes": os.path.getsize(p),
                        "row_groups": md.num_row_groups})
        except Exception:         # pragma: no cover
            out.append({"file": f, "bytes": os.path.getsize(p)})
    return out


class CheckpointedJob:
    """DAG of checkpointed stages. See module docstring.

    Usage::

        job = CheckpointedJob(spark, "/ckpt", "daily_features")
        job.stage("events", lambda s: s.read.parquet(path))
        job.stage("feats", build_features, deps=["events"])
        out = job.run()            # dict stage -> DataFrame (materialized)
    """

    def __init__(self, spark: SparkSession, root: str, name: str,
                 partitions: int | None = None):
        self.spark = spark
        self.root = os.path.join(root, name)
        self.name = name
        self.partitions = partitions
        self._stages: dict[str, Stage] = {}
        self._order: list[str] = []

    def stage(self, name: str, fn: Callable[..., DataFrame],
              deps: Sequence[str] = (),
              inputs: Sequence[str] = ()) -> "CheckpointedJob":
        """``inputs``: external paths this stage reads (leaf data);
        their size/mtime identity joins the fingerprint so refreshed
        source data invalidates the checkpoint."""
        if name in self._stages:
            raise ValueError(f"duplicate stage {name!r}")
        for d in deps:
            if d not in self._stages:
                raise ValueError(f"stage {name!r} depends on unknown {d!r}")
        self._stages[name] = Stage(name, fn, tuple(deps), tuple(inputs))
        self._order.append(name)
        return self

    # -- paths ---------------------------------------------------------------

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _data(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "data")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    # -- fingerprints: stage identity = name + CODE + external-input
    # identity + dep fingerprints, so editing a stage function or
    # refreshing its source data invalidates it and its downstream
    # (round-1 advisory: topology-only fingerprints served stale results
    # after code edits under resume=True) ---------------------------------

    def _fingerprint(self, st: Stage, dep_fps: list[str]) -> str:
        h = hashlib.sha256()
        h.update(st.name.encode())
        h.update(_code_fp(st.fn).encode())
        if st.inputs:
            h.update(_input_fp(st.inputs).encode())
        for fp in dep_fps:
            h.update(fp.encode())
        return h.hexdigest()[:16]

    def _is_done(self, stage: str, fp: str) -> bool:
        if not os.path.exists(os.path.join(self._data(stage), "_SUCCESS")):
            return False
        try:
            with open(self._manifest_path(stage)) as f:
                return json.load(f).get("fingerprint") == fp
        except (OSError, json.JSONDecodeError):
            return False

    # -- run ------------------------------------------------------------------

    def run(self, resume: bool = True) -> dict[str, DataFrame]:
        results: dict[str, DataFrame] = {}
        fps: dict[str, str] = {}
        for name in self._order:
            st = self._stages[name]
            fp = self._fingerprint(st, [fps[d] for d in st.deps])
            fps[name] = fp
            data = self._data(name)
            if resume and self._is_done(name, fp):
                results[name] = self.spark.read.parquet(data)
                continue
            t0 = time.time()
            df = st.fn(self.spark, *[results[d] for d in st.deps])
            if self.partitions:
                df = df.coalesce(self.partitions)
            df.write.mode("overwrite").parquet(data)
            wall = time.time() - t0
            files = _file_metrics(data)
            manifest = {
                "job": self.name,
                "stage": name,
                "fingerprint": fp,
                "deps": {d: fps[d] for d in st.deps},
                "schema": df.schema.jsonValue(),
                "n_rows": int(sum(f.get("rows", 0) for f in files)),
                "n_files": len(files),
                "partitions": files,
                "wall_s": round(wall, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime()),
            }
            with open(self._manifest_path(name), "w") as f:
                json.dump(manifest, f, indent=1)
            results[name] = self.spark.read.parquet(data)
        return results

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def lineage(self) -> dict[str, list[str]]:
        return {n: list(s.deps) for n, s in self._stages.items()}
