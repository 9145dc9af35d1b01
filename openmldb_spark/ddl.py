"""CREATE TABLE DDL front-end: parse + validate into a TableDef.

Reproduces the reference's create-table contract (SURVEY §2.1
CreateTable) as a standalone parser/validator so a Spark warehouse can
accept the same DDL the reference accepts and reject what it rejects:

- column list with NOT NULL / DEFAULT, type whitelist
  (hybridse/src/planv2/ast_node_converter.cc column defs);
- ``index(key=(...), ts=..., ttl=..., ttl_type=...)`` entries — key
  columns must exist and not be float/double, ts must be a timestamp
  or bigint column (src/sdk/node_adapter.cc TransformToColumnKey,
  src/schema/index_util.cc);
- TTL literal forms: an interval literal ``123[smhd]`` binds the
  ABSOLUTE slot, a bare integer binds the LATEST slot, and a tuple
  ``(interval, int)`` binds both — each ttl_type requires exactly its
  slots set (node_adapter.cc:308-340: absolute with a latest slot set
  is an error and vice versa; absorlat/absandlat need the tuple);
- TTL bounds: abs minutes <= 60*24*365*30, latest count <= 1000
  (src/flags.cc:147-148, enforced at create in index_util.cc:80);
- OPTIONS: partitionnum (default 8; 0 only with distribution),
  replicanum (default 3 = cluster tablet count; must be 1..tablets),
  distribution = [(leader, [follower, ...]), ...] — entries sized
  consistently (= replica num), endpoints unique per partition and
  members of the cluster, length must match an explicit partitionnum
  (node_adapter.cc:207-263). The function/ddl golden generation
  encodes an older (0.5-era) OPTIONS resolution — selected with
  ``legacy_options=True`` — that additionally rejects identical
  duplicate partition tuples and resolves partial distributions
  differently (function vs integration_test ddl/test_options.yaml).

The TTL of a parsed index maps onto the engine's read-time expiry
operators via :func:`ttl_filter` (operators/ttl.py — time_live /
count_live / time_and_count_live), which is how storage-level GC is
expressed over an append-only parquet/Iceberg warehouse.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["DDLError", "ColumnDef", "IndexDef", "TableDef",
           "ClusterSpec", "parse_create_table", "ttl_filter"]


class DDLError(ValueError):
    """CREATE TABLE statement rejected (parse or validation)."""


_TYPES = {"string", "varchar", "int", "int32", "smallint", "int16",
          "bigint", "int64", "float", "double", "timestamp", "date",
          "bool"}
_TS_TYPES = {"timestamp", "bigint", "int64"}
_NO_KEY_TYPES = {"float", "double"}

# ZetaSQL reserved keywords (public list) + the reference CLI's USE —
# ddl/test_create.yaml pins `order`/`use` rejected, `table` accepted
_RESERVED = {
    "all", "and", "any", "array", "as", "asc", "assert_rows_modified",
    "at", "between", "by", "case", "cast", "collate", "contains",
    "create", "cross", "cube", "current", "default", "define", "desc",
    "distinct", "else", "end", "enum", "escape", "except", "exclude",
    "exists", "extract", "false", "fetch", "following", "for", "from",
    "full", "group", "grouping", "groups", "hash", "having", "if",
    "ignore", "in", "inner", "intersect", "interval", "into", "is",
    "join", "lateral", "left", "like", "limit", "lookup", "merge",
    "natural", "new", "no", "not", "null", "nulls", "of", "on", "or",
    "order", "outer", "over", "partition", "preceding", "proto",
    "range", "recursive", "respect", "right", "rollup", "rows",
    "select", "set", "some", "struct", "tablesample", "then", "to",
    "treat", "true", "unbounded", "union", "unnest", "using", "when",
    "where", "window", "with", "within", "use",
}

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_UNIT_MS = {"s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}

MAX_ABS_TTL_MIN = 60 * 24 * 365 * 30     # flags.cc:148
MAX_LAT_TTL = 1000                       # flags.cc:147


@dataclass
class ClusterSpec:
    """What the DDL validates against: the serving cluster's tablet
    endpoints and defaults (a Spark deployment maps these to
    warehouse write parallelism / replication of the table format)."""
    tablets: tuple = ("ep0", "ep1", "ep2")
    default_partitions: int = 8
    default_replicas: int = 3


@dataclass
class ColumnDef:
    name: str
    type: str
    not_null: bool = False
    default: str | None = None


@dataclass
class IndexDef:
    keys: list
    ts: str | None = None
    ttl_type: str = "absolute"
    abs_ttl_ms: int | None = None        # None = slot unset
    lat_ttl: int | None = None


@dataclass
class TableDef:
    name: str
    columns: list = field(default_factory=list)
    indexes: list = field(default_factory=list)
    partition_num: int = 8
    replica_num: int = 3
    options: dict = field(default_factory=dict)
    if_not_exists: bool = False

    def column(self, name: str) -> ColumnDef:
        for c in self.columns:
            if c.name == name:
                return c
        raise DDLError(f"column {name} does not exist")


def _ident(tok: str, what: str) -> str:
    tok = tok.strip()
    t = tok.strip("`")
    quoted = tok.startswith("`") and tok.endswith("`")
    if not _IDENT.match(t):
        raise DDLError(f"invalid {what} name {tok!r}")
    if not quoted and t.lower() in _RESERVED:
        raise DDLError(f"{what} name {t!r} is a reserved keyword")
    return t


def _split_top(s: str) -> list:
    """Split on top-level commas (parens/brackets/quotes nested)."""
    out, depth, cur, i, n = [], 0, [], 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"":
            j = i + 1
            while j < n and s[j] != c:
                j += 1
            cur.append(s[i:j + 1])
            i = j + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _parse_ttl_value(txt: str):
    """-> (abs_ttl_ms | None, lat_ttl | None). An interval literal
    fills the ABSOLUTE slot, a bare integer the LATEST slot; a tuple
    fills (abs, lat) in that order (node_adapter.cc GetAbsTTL/GetLatTTL
    slot semantics)."""
    txt = txt.strip()
    if txt.startswith("(") and txt.endswith(")"):
        parts = _split_top(txt[1:-1])
    else:
        parts = [txt]
    abs_ms = lat = None
    if len(parts) == 1:
        p = parts[0].strip()
        m = re.fullmatch(r"(\d+)([smhd])", p)
        if m:
            abs_ms = int(m.group(1)) * _UNIT_MS[m.group(2)]
        elif re.fullmatch(r"\d+", p):
            lat = int(p)
        else:
            raise DDLError(f"bad ttl literal {p!r}")
    elif len(parts) == 2:
        m = re.fullmatch(r"(\d+)([smhd])", parts[0].strip())
        if not m:
            raise DDLError(f"combined ttl needs (interval, count), got "
                           f"{parts[0]!r} first")
        abs_ms = int(m.group(1)) * _UNIT_MS[m.group(2)]
        if not re.fullmatch(r"\d+", parts[1].strip()):
            raise DDLError(f"combined ttl needs (interval, count), got "
                           f"{parts[1]!r} second")
        lat = int(parts[1])
    else:
        raise DDLError(f"bad ttl tuple {txt!r}")
    return abs_ms, lat


def _parse_index(body: str, tdef: TableDef) -> IndexDef:
    idx = IndexDef(keys=[])
    abs_ms = lat = None
    ttl_given = ttl_type_given = False
    for item in _split_top(body):
        m = re.match(r"(?is)^(\w+)\s*=\s*(.+)$", item.strip())
        if not m:
            raise DDLError(f"bad index item {item!r}")
        k, v = m.group(1).lower(), m.group(2).strip()
        if k == "key":
            cols = _split_top(v[1:-1]) if v.startswith("(") else [v]
            idx.keys = [c.strip().strip("`") for c in cols]
        elif k == "ts":
            idx.ts = v.strip("`")
        elif k == "ttl":
            abs_ms, lat = _parse_ttl_value(v)
            ttl_given = True
        elif k == "ttl_type":
            idx.ttl_type = v.lower()
            ttl_type_given = True
        else:
            raise DDLError(f"unknown index option {k}")
    if not idx.keys:
        # keyless index: the planner auto-picks the first indexable
        # column that is not the ts column (node_adapter.cc:216-231);
        # with no ts either, "INDEX KEY empty" is an error
        if idx.ts is None:
            raise DDLError("INDEX KEY empty")
        for col in tdef.columns:
            if col.name != idx.ts and col.type not in _NO_KEY_TYPES:
                idx.keys = [col.name]
                break
        if not idx.keys:
            raise DDLError("can not found index col")
    # key columns exist and are indexable (not float/double)
    for c in idx.keys:
        col = tdef.column(c)
        if col.type in _NO_KEY_TYPES:
            raise DDLError(f"key column {c} has type {col.type}")
    if idx.ts is not None:
        col = tdef.column(idx.ts)
        if col.type not in _TS_TYPES:
            raise DDLError(f"ts column {idx.ts} has type {col.type} "
                           f"(timestamp/bigint required)")
    if ttl_type_given and idx.ttl_type not in (
            "absolute", "latest", "absorlat", "absandlat"):
        raise DDLError(f"ttl_type {idx.ttl_type} not supported")
    if ttl_given:
        # each ttl_type requires exactly its slots set
        # (node_adapter.cc:308-340)
        if idx.ttl_type == "absolute":
            if abs_ms is None or lat is not None:
                raise DDLError("absolute ttl needs an interval literal")
        elif idx.ttl_type == "latest":
            if lat is None or abs_ms is not None:
                raise DDLError("latest ttl needs a bare count")
        else:
            if abs_ms is None or lat is None:
                raise DDLError(f"{idx.ttl_type} ttl needs "
                               f"(interval, count)")
        if abs_ms is not None and abs_ms // 60_000 > MAX_ABS_TTL_MIN:
            raise DDLError(f"abs ttl over max {MAX_ABS_TTL_MIN} min")
        if lat is not None and lat > MAX_LAT_TTL:
            raise DDLError(f"latest ttl over max {MAX_LAT_TTL}")
        idx.abs_ttl_ms, idx.lat_ttl = abs_ms, lat
    return idx


def _parse_options(body: str, tdef: TableDef, cluster: ClusterSpec,
                   legacy: bool = False):
    opts = {}
    for item in _split_top(body):
        m = re.match(r"(?is)^(\w+)\s*=\s*(.+)$", item.strip())
        if not m:
            raise DDLError(f"bad option {item!r}")
        opts[m.group(1).lower()] = m.group(2).strip()
    tdef.options = dict(opts)
    set_pnum = "partitionnum" in opts
    set_rnum = "replicanum" in opts
    pnum, rnum = cluster.default_partitions, cluster.default_replicas
    if set_pnum:
        if not re.fullmatch(r"\d+", opts["partitionnum"]):
            raise DDLError("partitionnum must be an integer")
        pnum = int(opts["partitionnum"])
    if set_rnum:
        if not re.fullmatch(r"\d+", opts["replicanum"]):
            raise DDLError("replicanum must be an integer")
        rnum = int(opts["replicanum"])
        if rnum < 1 or rnum > len(cluster.tablets):
            raise DDLError(f"replicanum {rnum} outside 1.."
                           f"{len(cluster.tablets)}")
    dist = None
    if "distribution" in opts:
        v = opts["distribution"]
        if not (v.startswith("[") and v.endswith("]")):
            raise DDLError("distribution must be a list")
        entries = _split_top(v[1:-1])
        if not entries:
            raise DDLError("distribution list is empty")
        dist, sizes, seen_tuples = [], set(), set()
        for e in entries:
            e = e.strip()
            if not (e.startswith("(") and e.endswith(")")):
                raise DDLError(f"bad distribution entry {e!r}")
            parts = _split_top(e[1:-1])
            if len(parts) != 2:
                raise DDLError("distribution entry needs "
                               "(leader, [followers])")
            leader = parts[0].strip().strip("'\"")
            fl = parts[1].strip()
            if not (fl.startswith("[") and fl.endswith("]")):
                raise DDLError("followers must be a list")
            followers = [x.strip().strip("'\"")
                         for x in _split_top(fl[1:-1])]
            eps = [leader] + followers
            if len(set(eps)) != len(eps):
                raise DDLError("partition meta endpoint duplicate")
            for ep in eps:
                if ep not in cluster.tablets:
                    raise DDLError(f"endpoint {ep} does not exist")
            key = (leader, tuple(followers))
            if legacy and key in seen_tuples:
                # the 0.5-era router rejected two identical partition
                # tuples (function/ddl/test_options.yaml#5 golden);
                # current node_adapter.cc accepts them
                # (integration_test sibling #5 succeeds)
                raise DDLError("duplicate distribution entry")
            seen_tuples.add(key)
            sizes.add(len(eps))
            dist.append(key)
        if len(sizes) != 1:
            raise DDLError("replica num is inconsistency")
        dist_replicas = sizes.pop()
        if legacy:
            # 0.5-era resolution (function/ddl/test_options goldens):
            # the distribution's implied replica count must match the
            # replicanum in effect INCLUDING the default (#19 vs #24);
            # a PARTIAL distribution under a larger explicit
            # partitionnum is accepted (#21 keeps partitionnum=4 with
            # one entry; #13 rejects two entries under partitionnum=1)
            if rnum != dist_replicas:
                raise DDLError("replica in distribution_list and "
                               "replica_num is not match")
            if set_pnum and pnum != 0 and len(dist) > pnum:
                raise DDLError("distribution_list size and "
                               "partition_num is not match")
            if pnum == 0 or (not set_pnum and not set_rnum):
                # partitionnum=0 defers to the distribution (#6); with
                # NEITHER count option the distribution defines the
                # partition count (#24), while any explicit count
                # keeps the other's default (#2)
                pnum = len(dist)
        else:
            # current semantics (src/sdk/node_adapter.cc:253-263): an
            # explicit replicanum must equal the entry size, an
            # explicit partitionnum must equal the entry count, and
            # the distribution then DEFINES both
            if set_rnum and rnum != dist_replicas:
                raise DDLError("replica in distribution_list and "
                               "replica_num is not match")
            if set_pnum and pnum != len(dist):
                raise DDLError("distribution_list size and "
                               "partition_num is not match")
            rnum, pnum = dist_replicas, len(dist)
    if pnum == 0:
        if not legacy:
            raise DDLError("partitionnum must be positive")
        raise DDLError("partitionnum 0 requires a distribution")
    known = {"partitionnum", "replicanum", "distribution",
             "storage_mode"}
    for k in opts:
        if k not in known:
            raise DDLError(f"unknown option {k}")
    if "storage_mode" in opts:
        sm = opts["storage_mode"].strip().strip("'\"").lower()
        if sm not in ("memory", "ssd", "hdd"):
            # disk_table.yaml#14: storage_mode outside the whitelist
            raise DDLError(f"storage_mode {sm!r} not supported")
        tdef.options["storage_mode"] = sm
    tdef.partition_num, tdef.replica_num = pnum, rnum


def parse_create_table(sql: str, existing=(),
                       cluster: ClusterSpec | None = None,
                       legacy_options: bool = False) -> TableDef:
    """Parse + validate one CREATE TABLE statement. Raises DDLError.

    ``legacy_options`` selects the 0.5-era OPTIONS resolution the
    function/ddl golden generation encodes; the default follows the
    current src/sdk/node_adapter.cc semantics (the integration_test
    generation)."""
    cluster = cluster or ClusterSpec()
    s = " ".join(str(sql).split()).rstrip(";").strip()
    m = re.match(r"(?is)^create\s+table\s+(if\s+not\s+exists\s+)?"
                 r"(\S+?)\s*\(", s)
    if not m:
        raise DDLError(f"unparseable CREATE TABLE {s[:80]!r}")
    if_not_exists = bool(m.group(1))
    # balanced column-list span (an OPTIONS clause may follow)
    i = m.end() - 1
    depth, j = 0, i
    while j < len(s):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:
        raise DDLError("unbalanced parentheses in CREATE TABLE")
    body, rest = s[i + 1:j], s[j + 1:].strip()
    om = None
    if rest:
        om = re.fullmatch(r"(?is)options\s*\((.*)\)", rest)
        if not om:
            raise DDLError(f"trailing tokens after column list: "
                           f"{rest[:40]!r}")
    name = _ident(m.group(2), "table")
    if name in set(existing) and not if_not_exists:
        # IF NOT EXISTS on an existing table is the SQL-standard silent
        # no-op, not an error; callers check td.if_not_exists to skip
        raise DDLError(f"table {name} already exists")
    tdef = TableDef(name=name,
                    partition_num=cluster.default_partitions,
                    replica_num=cluster.default_replicas,
                    if_not_exists=if_not_exists)
    index_bodies = []
    for item in _split_top(body):
        im = re.match(r"(?is)^index\s*\((.*)\)$", item.strip())
        if im:
            index_bodies.append(im.group(1))
            continue
        cm = re.match(r"(?is)^(\S+)\s+(\w+)"
                      r"(\s+not\s+null)?(\s+default\s+(.+))?$",
                      item.strip())
        if not cm:
            raise DDLError(f"bad column def {item!r}")
        cname = _ident(cm.group(1), "column")
        ctype = cm.group(2).lower()
        if ctype not in _TYPES:
            raise DDLError(f"unknown column type {ctype}")
        tdef.columns.append(ColumnDef(
            cname, ctype, not_null=bool(cm.group(3)),
            default=cm.group(5)))
    if not tdef.columns:
        raise DDLError("no columns")
    if len({c.name for c in tdef.columns}) != len(tdef.columns):
        raise DDLError("duplicate column name")
    for ib in index_bodies:
        tdef.indexes.append(_parse_index(ib, tdef))
    if om is not None:
        _parse_options(om.group(1), tdef, cluster,
                       legacy=legacy_options)
    return tdef


def parse_create_index(sql: str, tdef: TableDef) -> IndexDef:
    """CREATE INDEX name ON tbl (cols) OPTIONS (ts=..., ttl=...,
    ttl_type=...) — validate against the table like an inline index
    (ddl/test_create_index.yaml): key columns exist and are indexable,
    ts optional ('-' in DESC when absent), TTL slot rules identical to
    CREATE TABLE, and an index with the same key set + ts as an
    existing one is rejected (#33). Appends to ``tdef.indexes`` and
    returns the new IndexDef."""
    s = " ".join(str(sql).split()).rstrip(";").strip()
    m = re.match(r"(?is)^create\s+index\s+(\S+)\s+on\s+(\S+)\s*"
                 r"\(([^)]*)\)\s*(?:options\s*\((.*)\)\s*)?$", s)
    if not m:
        raise DDLError(f"unparseable CREATE INDEX {s[:80]!r}")
    _ident(m.group(1), "index")
    keys = [c.strip().strip("`") for c in m.group(3).split(",")
            if c.strip()]
    if not keys:
        raise DDLError("INDEX KEY empty")
    body = ", ".join([f"key=({','.join(keys)})"]
                     + ([m.group(4)] if m.group(4) else []))
    idx = _parse_index(body, tdef)
    for old in tdef.indexes:
        if set(old.keys) == set(idx.keys) and old.ts == idx.ts:
            raise DDLError("index with the same keys and ts exists")
    tdef.indexes.append(idx)
    return idx


def _abs_minutes(abs_ms: int) -> int:
    """ms -> minutes, rounding up with a 1-minute floor for nonzero
    values (base::AbsTTLConvert; ddl/test_create_index#9: 1s -> 1min)."""
    if abs_ms <= 0:
        return 0
    return max(1, -(-abs_ms // 60_000))


def render_desc_idxs(tdef: TableDef) -> list:
    """The DESC command's index table (ddl/test_create_no_index /
    test_create_index goldens): one dict per index with keys, ts ('-'
    when none), ttl ('Nmin' absolute, bare count latest,
    'Nmin&&K' / 'Nmin||K' combined), ttlType (kAbsoluteTime /
    kLatestTime / kAbsAndLat / kAbsOrLat)."""
    out = []
    for idx in tdef.indexes:
        if idx.ttl_type == "latest":
            ttl = idx.lat_ttl or 0
            tname = "kLatestTime"
        elif idx.ttl_type == "absandlat":
            ttl = f"{_abs_minutes(idx.abs_ttl_ms or 0)}min" \
                  f"&&{idx.lat_ttl or 0}"
            tname = "kAbsAndLat"
        elif idx.ttl_type == "absorlat":
            ttl = f"{_abs_minutes(idx.abs_ttl_ms or 0)}min" \
                  f"||{idx.lat_ttl or 0}"
            tname = "kAbsOrLat"
        else:
            ttl = f"{_abs_minutes(idx.abs_ttl_ms or 0)}min"
            tname = "kAbsoluteTime"
        out.append({"keys": list(idx.keys), "ts": idx.ts or "-",
                    "ttl": ttl, "ttlType": tname})
    return out


def default_index(tdef: TableDef) -> IndexDef:
    """The index the system creates for a table declared with none:
    first indexable column, no ts, absolute 0
    (ddl/test_create_no_index.yaml#0; node_adapter.cc auto index)."""
    for col in tdef.columns:
        if col.type not in _NO_KEY_TYPES:
            return IndexDef(keys=[col.name])
    raise DDLError("can not found index col")


def ttl_filter(df, index: IndexDef, now_ms: int | None = None,
               tiebreak=()):
    """Apply one parsed index's TTL as the engine's read-time expiry
    (operators/ttl.py): absolute -> time_live, latest -> count_live,
    absorlat -> expire when old OR beyond count (keep rows passing
    both filters), absandlat -> expire only when old AND beyond count
    (keep rows passing either). ``tiebreak``: extra descending order
    columns breaking same-ts ties for the count-based kinds."""
    from openmldb_spark.operators.ttl import (
        count_live, time_and_count_live, time_live)

    abs_ms, lat = index.abs_ttl_ms, index.lat_ttl
    if index.ttl_type == "absolute":
        if not abs_ms:
            return df            # 0 / unset = no expiry
        if index.ts is None:
            raise DDLError("time-based TTL requires a ts column on the "
                           f"index over {index.keys}")
        return time_live(df, index.ts, abs_ms, now_ms=now_ms)
    if index.ttl_type == "latest":
        if not lat:
            return df
        # ts=None: latest-k by storage order (count_live handles it)
        return count_live(df, index.keys, index.ts, lat,
                          tiebreak=tiebreak)
    combine = "and" if index.ttl_type == "absorlat" else "or"
    if not abs_ms and not lat:
        return df
    if index.ts is None:
        raise DDLError("time-based TTL requires a ts column on the "
                       f"index over {index.keys}")
    # a ZERO slot means UNLIMITED for that dimension (storage/table.h:
    # ttl 0 = no expiry), not an active 0-length filter:
    # - absorlat (expire when old OR beyond count): the zero dimension
    #   can never expire a row, so only the other filter applies
    # - absandlat (expire when old AND beyond count): the zero
    #   dimension makes the conjunction always false — nothing expires
    if not abs_ms or not lat:
        if index.ttl_type == "absandlat":
            return df
        if not abs_ms:
            return count_live(df, index.keys, index.ts, lat,
                              tiebreak=tiebreak)
        return time_live(df, index.ts, abs_ms, now_ms=now_ms)
    return time_and_count_live(df, index.keys, index.ts, abs_ms,
                               lat, now_ms=now_ms,
                               tiebreak=tiebreak, combine=combine)
