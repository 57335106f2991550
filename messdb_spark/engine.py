"""Engine facade — the ``Repo`` analog
(``/root/reference/messdb-repo/src/MessDB/Repo.hs``).

Ties together: SparkSession, object store (CAS parquet), memo manifest,
catalog (name → table hash + schema + key cols), and the materializer.
``runRepoQuery``/``runRepoStatement`` (``Repo.hs:80-82,120-130``) map to
``Engine.sql`` (read path: temp views over catalog tables, full Spark
SQL — a capability superset of the reference's CREATE-TABLE-only SQL)
and ``Engine.ddl``/``save_table`` (write path: new root state).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .hashing import table_content_hash
from .operators.core import KeyedTable
from .plans.views import Materializer
from .sql_ddl import parse_create_table
from .store import Catalog, CatalogEntry, MemoStore, ObjectStore


class Engine:
    def __init__(self, spark: SparkSession, warehouse: str,
                 manifest_backend: str = "json") -> None:
        """``manifest_backend``: "json" (atomic-rename files, default)
        or "sqlite" (one transactional manifest file for memo+catalog —
        the reference's own backend choice, S3 SqliteStore)."""
        self.spark = spark
        self.warehouse = warehouse
        self.objects = ObjectStore(warehouse)
        if manifest_backend == "sqlite":
            from .sqlite_store import SqliteCatalog, SqliteMemoStore
            self.memo = SqliteMemoStore(warehouse)
            self.catalog = SqliteCatalog(warehouse)
        elif manifest_backend == "json":
            self.memo = MemoStore(warehouse)
            self.catalog = Catalog(warehouse)
        else:
            raise ValueError(f"unknown manifest backend: {manifest_backend}")
        self.materializer = Materializer(spark, self.objects, self.memo,
                                         table_content_hash)

    # -- catalog write path (R2 saveRepoTable, Repo.hs:115-118) --------
    def save_table(self, name: str, table: KeyedTable) -> str:
        h = table_content_hash(table.df)
        self.objects.save(h, table.df)
        self.catalog.put(name, CatalogEntry(
            table_hash=h,
            schema_json=table.df.schema.json(),
            key_cols=list(table.key_cols)))
        return h

    # -- catalog read path (R1 getRepoTable, Repo.hs:100-111) ----------
    def load_table(self, name: str, version: int | None = None) -> KeyedTable:
        """Load a table; ``version`` reads from an archived catalog
        root (time travel — immutable objects make old snapshots free)."""
        e = self.catalog.get(name, version=version)
        if e is None:
            raise KeyError(f"no such table: {name}"
                           + (f" at version {version}" if version is not None else ""))
        df = self.objects.load(self.spark, e.table_hash)
        return KeyedTable(df, tuple(e.key_cols))

    def table_hash(self, name: str) -> str:
        e = self.catalog.get(name)
        if e is None:
            raise KeyError(name)
        return e.table_hash

    def scan_ir(self, name: str) -> dict:
        e = self.catalog.get(name)
        return {"op": "scan", "table_hash": e.table_hash, "key_cols": e.key_cols}

    # -- SQL surface (§2.5) --------------------------------------------
    def ddl(self, statement: str) -> None:
        """CREATE TABLE — the only DDL the reference accepts
        (``messdb-sql/src/MessDB/SQL.hs:21-35``). Creates an empty table
        with the derived schema + key columns in the catalog."""
        ct = parse_create_table(statement)
        empty = self.spark.createDataFrame([], schema=ct.schema)
        self.save_table(ct.name, KeyedTable(empty, tuple(ct.key_cols)))

    def sql(self, query: str) -> DataFrame:
        """Read-only query over catalog tables (capability superset:
        full Spark SQL vs the reference's unsupported-statement error,
        ``SQL.hs:41-44``)."""
        for name in self.catalog.names():
            self.load_table(name).df.createOrReplaceTempView(name)
        return self.spark.sql(query)
