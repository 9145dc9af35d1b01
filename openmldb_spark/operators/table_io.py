"""Table load / export — the reference's LOAD DATA INFILE and
SELECT INTO OUTFILE, Spark-first.

Reference semantics:
- ``LOAD DATA INFILE`` (nodes/LoadDataPlan.scala:30-134): read csv/parquet
  (format whitelist utils/HybridseUtil.scala:300-325) with options
  (header, delimiter, null_value, quote), then either deep-copy into the
  offline store (parquet under a managed prefix) or soft-link the path.
- ``SELECT INTO OUTFILE`` (nodes/SelectIntoPlan.scala:26-56): write a
  result df to csv/parquet with mode overwrite|append|error_if_exists.

Our build: a managed warehouse directory of parquet tables (the sandbox
stand-in for Iceberg — the API shape is ``db.table``-addressed and the
write layout records partition columns so a future Iceberg catalog swap
is a one-liner). Deep copy uses parquet + optional partition/sort layout
so downstream window/as-of reads hit pre-partitioned data.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


_FORMATS = ("csv", "parquet", "json")

# DDL dialect type -> Spark SQL type (openmldb_spark/ddl.py columns)
_SPARK_TYPES = {
    "string": "string", "varchar": "string", "int": "int",
    "int32": "int", "smallint": "smallint", "int16": "smallint",
    "bigint": "bigint", "int64": "bigint", "float": "float",
    "double": "double", "timestamp": "timestamp", "date": "date",
    "bool": "boolean",
}

# SELECT INTO OUTFILE / LOAD DATA INFILE option surface (reference
# HybridseUtil.scala:300-325 option parsing + validation: unknown keys
# and wrongly-typed values are REJECTED, v040/test_out_in_offline.yaml
# cases 12-14). Value spec: "bool" = unquoted true/false literal,
# "str" = quoted string.
_OUTFILE_OPTS = {"format": "str", "delimiter": "str", "null_value": "str",
                 "header": "bool", "quote": "str", "mode": "str",
                 "coalesce": "int"}
_INFILE_OPTS = {**_OUTFILE_OPTS, "deep_copy": "bool", "load_mode": "str",
                "thread": "int"}


def parse_csv_options(raw: dict[str, tuple[str, bool]],
                      surface: str = "outfile") -> dict:
    """Validate option tokens parsed from ``OPTIONS(k=v, ...)``.

    ``raw`` maps key -> (token, was_quoted). Mirrors the reference's
    strict option validation: unknown keys error (``head=true``), bool
    options must be unquoted true/false (``header='true'`` errors),
    format must be csv or parquet."""
    spec = _INFILE_OPTS if surface == "infile" else _OUTFILE_OPTS
    out: dict = {}
    for k, (tok, quoted) in raw.items():
        kl = k.lower()
        if kl not in spec:
            raise ValueError(f"unknown {surface} option {k!r}")
        kind = spec[kl]
        if kind == "bool":
            if quoted or tok.lower() not in ("true", "false"):
                raise ValueError(f"option {k} must be a bool literal")
            out[kl] = tok.lower() == "true"
        elif kind == "int":
            if quoted or not tok.lstrip("-").isdigit():
                raise ValueError(f"option {k} must be an int literal")
            out[kl] = int(tok)
        else:
            if not quoted:
                raise ValueError(f"option {k} must be a quoted string")
            out[kl] = tok
    if out.get("format", "csv") not in ("csv", "parquet"):
        raise ValueError(f"bad format {out.get('format')!r}")
    if out.get("mode", "error_if_exists") not in (
            "error_if_exists", "errorifexists", "overwrite", "append"):
        raise ValueError(f"bad mode {out.get('mode')!r}")
    return out


def _fmt_for_csv(df: DataFrame) -> DataFrame:
    """Render columns the way the reference's row codec prints them
    (v040/test_out_in_offline.yaml `cat` goldens): float/double with 6
    fixed decimals, timestamps as epoch millis, bools as true/false,
    dates ISO. Catalyst-only — formatting stays JVM-side."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            c = F.when(F.col(f.name).isNotNull(),
                       F.format_string("%.6f", F.col(f.name).cast("double")))
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            c = F.unix_millis(F.col(f.name).cast("timestamp")).cast("string")
        elif isinstance(f.dataType, T.BooleanType):
            c = F.when(F.col(f.name).isNotNull(),
                       F.when(F.col(f.name), "true").otherwise("false"))
        cols.append(c.alias(f.name))
    return df.select(*cols)


def write_csv_outfile(df: DataFrame, path: str,
                      options: dict | None = None) -> int:
    """SELECT INTO OUTFILE with the reference's FILE-at-path contract:
    one csv file at ``path``, modes error_if_exists | overwrite |
    append (append concatenates rows onto the existing file, honoring
    the per-call header option — test_out_in_offline.yaml#9-11).

    The rows are written distributed (Spark CSV over the formatted
    frame) into a scratch dir, then the part files are streamed
    byte-wise into the single target — a single-file export is
    inherently a funnel, so the merge is file IO only, never a
    row-level driver collect. Returns the row count written."""
    opts = dict(options or {})
    mode = opts.get("mode", "error_if_exists")
    if mode in ("error_if_exists", "errorifexists") and os.path.exists(path):
        raise FileExistsError(path)
    if mode == "append" and not os.path.exists(path):
        mode = "overwrite"
    header = opts.get("header", True)
    null_value = opts.get("null_value", "null")
    delim = opts.get("delimiter", ",")
    d = _fmt_for_csv(df)
    tmp = tempfile.mkdtemp(prefix="omls_outfile_")
    try:
        (d.coalesce(1).write.mode("overwrite")
         .option("header", str(header).lower())
         .option("sep", delim)
         .option("nullValue", null_value)
         .option("emptyValue", "")
         # the reference codec never quotes (a value containing the
         # delimiter produces an unreadable file — and its LOAD then
         # errors, test_out_in_offline.yaml#34)
         .option("quote", "\u0000")
         .csv(tmp))
        parts = sorted(p for p in os.listdir(tmp)
                       if p.startswith("part-") and p.endswith(".csv"))
        write_mode = "ab" if mode == "append" else "wb"
        # the parent directory must exist (reference errors on a
        # missing export folder, test_out_in_offline.yaml#21)
        # row count is taken DURING the byte merge (newlines minus the
        # per-part header line) — a separate d.count() would execute
        # the full upstream plan a second time
        n = 0
        with open(path, write_mode) as dst:
            for p in parts:
                nl = 0
                with open(os.path.join(tmp, p), "rb") as src:
                    while True:
                        chunk = src.read(1 << 20)
                        if not chunk:
                            break
                        nl += chunk.count(b"\n")
                        dst.write(chunk)
                n += max(nl - 1, 0) if header and nl else nl
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return n


def csv_cast(c, dtype, string_ts_tz: str | None = None):
    """Cast a string csv cell to ``dtype`` the way the reference's
    loaders do: timestamps accept BOTH epoch-ms ints (the codec's own
    output) and yyyy-MM-dd HH:mm:ss[.S] datetime strings
    (integration_test/out_in/csv fixtures); bools only true/false;
    anything unparseable yields NULL (callers decide whether NULL means
    error — the strict offline codec — or silent coercion, the Spark
    batch loader). ``string_ts_tz`` names the wall-clock zone datetime
    STRINGS are recorded in (the reference fixtures and their ms
    goldens are pinned to its CI's Asia/Shanghai clock); epoch-ms cells
    are zone-free either way."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    # try_cast throughout: the documented contract is unparseable ->
    # NULL, which a plain cast() breaks under Spark 4's default ANSI-on
    # session ([CAST_INVALID_INPUT] crash on any bad cell)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        ts = F.try_to_timestamp(c)
        if string_ts_tz:
            ts = F.to_utc_timestamp(ts, string_ts_tz)
        return F.coalesce(F.timestamp_millis(c.try_cast("long")), ts)
    if isinstance(dtype, T.BooleanType):
        return F.when(F.lower(c).isin("true", "false"),
                      F.lower(c) == "true")
    return c.try_cast(dtype)


def _is_header_row(fields):
    """True only when EVERY field equals its column name — a repeated
    header line from an append-mode export. Matching on the first field
    alone would drop a legitimate data row whose first value happens to
    equal the first column's name."""
    from pyspark.sql import functions as F
    cond = None
    for f in fields:
        c = F.col(f.name) == F.lit(f.name)
        cond = c if cond is None else (cond & c)
    return F.coalesce(cond, F.lit(False))


def read_csv_infile(spark: SparkSession, path: str, schema,
                    options: dict | None = None,
                    strict: bool = True,
                    header_check: bool = True,
                    string_ts_tz: str | None = None) -> DataFrame:
    """LOAD DATA INFILE for files written by ``write_csv_outfile``:
    string-typed scan + explicit casts per the target schema (the
    reference's codec prints timestamps as epoch ms, which Spark's
    native timestamp parser rejects).

    Reference contracts (v040/test_out_in_offline.yaml): with a header,
    file columns map to the table BY NAME — extra file columns are
    ignored, a missing table column errors (#37 reloads a 10-column
    export into a 3-column table). Malformed rows (wrong token count —
    an unquoted delimiter inside a value, #34) error via FAILFAST.
    ``strict`` rejects values that fail their target cast (#22/#25:
    loading a string column into an int table is an error, not a
    silent NULL column) — one extra validation pass over the scan.
    ``header_check=False`` skips the first line of every file WITHOUT
    validating its content and maps columns positionally — the online
    tablet loader's behavior (integration_test #24: header=true over a
    headerless file silently consumes the first data row), as opposed
    to the offline job's by-name mapping."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    if isinstance(schema, str):               # accept DDL strings
        schema = T._parse_datatype_string(schema)
    opts = dict(options or {})
    header = opts.get("header", True)
    rd = (spark.read
          .option("sep", opts.get("delimiter", ","))
          .option("nullValue", opts.get("null_value", "null"))
          .option("emptyValue", "")
          .option("quote", "\u0000")
          .option("mode", "FAILFAST"))
    if header and not header_check:
        # blind per-file header skip, positional mapping (enforceSchema
        # keeps the provided names and ignores the header content)
        str_schema = T.StructType([T.StructField(f.name, T.StringType())
                                   for f in schema.fields])
        raw = rd.option("header", "true").schema(str_schema).csv(path)
        raw = raw.filter(~_is_header_row(schema.fields))
    elif header:
        raw = rd.option("header", "true").csv(path)
        missing = [f.name for f in schema.fields
                   if f.name not in raw.columns]
        if missing:
            raise ValueError(f"csv header lacks table columns {missing}")
        # interior header lines from append-mode files
        # (test_out_in_offline.yaml#9): drop rows that repeat the header
        raw = raw.filter(~_is_header_row(schema.fields))
    else:
        str_schema = T.StructType([T.StructField(f.name, T.StringType())
                                   for f in schema.fields])
        raw = rd.option("header", "false").schema(str_schema).csv(path)
    cols, checks = [], []
    for f in schema.fields:
        c = F.col(f.name).cast("string")
        cast = csv_cast(c, f.dataType, string_ts_tz)
        cols.append(cast.alias(f.name))
        checks.append(F.sum((c.isNotNull()
                             & cast.isNull()).cast("int")))
    out = raw.select(*cols)
    if strict:
        # token-count validation: the codec never quotes, so a value
        # containing the delimiter produced a wider row — an import
        # error in the reference (#34), which Spark's lenient csv
        # parser would otherwise silently truncate
        import re as _re
        width = len(raw.columns) if header else len(schema.fields)
        txt = spark.read.text(path)
        nbad = (txt.filter(F.col("value") != "")
                .filter(F.size(F.split(
                    "value", _re.escape(opts.get("delimiter", ",")), -1))
                    != width).count())
        if nbad:
            raise ValueError(f"{nbad} malformed csv line(s): token "
                             f"count != {width}")
        bad = raw.select(*checks).collect()[0]
        for f, b in zip(schema.fields, bad):
            if b:
                raise ValueError(
                    f"{b} value(s) in column {f.name} do not parse as "
                    f"{f.dataType.simpleString()}")
    return out


def load_data(spark: SparkSession, path: str, fmt: str = "parquet",
              options: dict | None = None,
              schema: str | None = None) -> DataFrame:
    """LOAD DATA INFILE: read an external file into a DataFrame.

    Defaults mirror the reference's csv defaults (header=true,
    delimiter=',', null_value='null' — LoadDataPlan.scala option parsing).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    opts = {"header": "true", "delimiter": ",", "nullValue": "null",
            "inferSchema": "true"} if fmt == "csv" else {}
    opts.update(options or {})
    reader = spark.read.format(fmt).options(**opts)
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)


class Warehouse:
    """Managed table store: ``db.table`` → parquet dir with layout metadata.

    ``write`` persists with an optional partition spec (the scale contract:
    a table written partitioned+sorted by (key, ts) is read back
    co-located, so window/as-of operators over it shuffle once, not
    twice). The deep-copy mode of the reference's LOAD DATA maps to
    ``warehouse.write(load_data(...), "db.tbl")``.
    """

    def __init__(self, spark: SparkSession, root: str,
                 catalog: str | None = None):
        """``catalog``: name of a configured Iceberg catalog
        (``spark.sql.catalog.<name>`` set and the Iceberg runtime jar on
        the classpath). When given and available, tables live as
        ``<catalog>.<db>.<tbl>`` Iceberg tables via the DataFrameWriterV2
        path (writeTo + partitionedBy); otherwise the parquet-path layout
        below is used. This is the north-rule Iceberg swap point — the
        sandbox has no Iceberg jars, so tests exercise the parquet mode
        and skip the catalog mode unless one is configured."""
        self.spark = spark
        self.root = root
        self.catalog = catalog if catalog and self._catalog_ok(spark,
                                                               catalog) \
            else None

    @staticmethod
    def _catalog_ok(spark: SparkSession, catalog: str) -> bool:
        try:
            spark.conf.get(f"spark.sql.catalog.{catalog}")
            # probe the CATALOG, not the session: SELECT 1 succeeds
            # with the Iceberg jar absent, and the fallback promise
            # ("otherwise the parquet layout is used") would be
            # broken at first writeTo instead
            spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
            return True
        except Exception:
            return False

    def _path(self, table: str) -> str:
        if "." in table:
            db, tbl = table.split(".", 1)
        else:
            db, tbl = "default", table
        return os.path.join(self.root, db, tbl)

    def _ident(self, table: str) -> str:
        if "." in table:
            db, tbl = table.split(".", 1)
        else:
            db, tbl = "default", table
        return f"{self.catalog}.{db}.{tbl}"

    def write(self, df: DataFrame, table: str, mode: str = "error",
              partition_by: Sequence[str] = (),
              buckets: int | None = None,
              sort_by: Sequence[str] = ()) -> None:
        if self.catalog:
            # Iceberg v2 writer: partition spec + sort order are table
            # metadata, so downstream readers get partition pruning and
            # a pre-sorted layout from the catalog
            from pyspark.sql import functions as F
            ident = self._ident(table)
            d = df
            if sort_by:
                d = d.sortWithinPartitions(*sort_by)
            w = d.writeTo(ident)
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "append":
                w.append()
            elif mode == "overwrite":
                w.createOrReplace()
            else:
                w.create()
            return
        p = self._path(table)
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if buckets and sort_by:
            # repartition+sort emulates a bucketed sorted layout for path
            # tables (saveAsTable-style bucketing needs a metastore)
            df2 = df.repartition(buckets, *sort_by[:1]) \
                    .sortWithinPartitions(*sort_by)
            w = df2.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
        w.parquet(p)

    def create_table(self, ddl_sql: str, db: str = "default"):
        """CREATE TABLE from the reference's DDL dialect: parse +
        validate through the DDL front-end (openmldb_spark/ddl.py —
        identifier/type/index/TTL/options rules), then materialize an
        empty table in the warehouse laid out for its MAIN index:
        partitioned into ``partition_num`` buckets by the index keys
        and sorted by (keys, ts), so appended data lands co-located
        for the window/as-of operators (one shuffle, not two).
        Returns the parsed TableDef."""
        from openmldb_spark.ddl import parse_create_table

        existing = []
        dbdir = os.path.join(self.root, db)
        if not self.catalog and os.path.isdir(dbdir):
            existing = os.listdir(dbdir)
        tdef = parse_create_table(ddl_sql, existing=existing)
        if tdef.if_not_exists and tdef.name in existing:
            return tdef            # IF NOT EXISTS: silent no-op
        fields = []
        for c in tdef.columns:
            fields.append(f"`{c.name}` {_SPARK_TYPES[c.type]}"
                          + (" NOT NULL" if c.not_null else ""))
        schema = ", ".join(fields)
        empty = self.spark.createDataFrame([], schema)
        idx = tdef.indexes[0] if tdef.indexes else None
        self.write(empty, f"{db}.{tdef.name}",
                   buckets=tdef.partition_num if idx else None,
                   sort_by=(tuple(idx.keys) + ((idx.ts,) if idx.ts
                                               else ())) if idx else ())
        return tdef

    def read(self, table: str) -> DataFrame:
        if self.catalog:
            return self.spark.table(self._ident(table))
        return self.spark.read.parquet(self._path(table))

    def read_live(self, table: str, tdef,
                  now_ms: int | None = None) -> DataFrame:
        """Read a table with its MAIN index's TTL applied as the
        read-time expiry filter (the storage GC of the reference's
        tablet, expressed over an append-only warehouse —
        openmldb_spark/ddl.ttl_filter)."""
        from openmldb_spark.ddl import ttl_filter

        df = self.read(table)
        if tdef.indexes:
            df = ttl_filter(df, tdef.indexes[0], now_ms=now_ms)
        return df

    def exists(self, table: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(self._ident(table))
        return os.path.exists(self._path(table))


def select_into(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "error_if_exists",
                options: dict | None = None,
                single_file: bool = False) -> None:
    """SELECT INTO OUTFILE: write a result to an external path.

    ``mode`` ∈ overwrite | append | error_if_exists (reference
    SelectIntoPlan.scala modes). ``single_file`` coalesces to one output
    part (the reference writes one file per default for csv exports).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    mode_map = {"overwrite": "overwrite", "append": "append",
                "error_if_exists": "error", "errorifexists": "error"}
    if mode not in mode_map:
        raise ValueError(f"mode must be one of {sorted(mode_map)}")
    if single_file:
        df = df.coalesce(1)
    opts = {"header": "true"} if fmt == "csv" else {}
    opts.update(options or {})
    df.write.format(fmt).options(**opts).mode(mode_map[mode]).save(path)
