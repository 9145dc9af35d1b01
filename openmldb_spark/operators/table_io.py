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
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


_FORMATS = ("csv", "parquet", "json")


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
            spark.sql(f"SELECT 1").collect()
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

    def read(self, table: str) -> DataFrame:
        if self.catalog:
            return self.spark.table(self._ident(table))
        return self.spark.read.parquet(self._path(table))

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
