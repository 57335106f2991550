"""Sources & sinks — the reference's IO surface (SURVEY.md §2.2).

F1 CSV import (``/root/reference/messdb-tool/src/MessDB/Tool/Csv.hs:22-64``):
header-order remapping + typed parse + fold-merge upsert into the target
table. F2 CSV export (``Csv.hs:66-101``), F3 JSON-lines export
(``Tool/Json.hs:16-32``). Plus native Parquet (our default object
format — not in the reference, which stores opaque trie blobs).

Scale: all paths are ``spark.read``/``df.write`` — distributed,
splittable, schema-enforced (no inferSchema in the import path; the
catalog schema is authoritative, mirroring the reference's typed
csvParseRecordWithHeader)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.core import KeyedTable, canonicalize_input, merge_tables
from ..registry import FOLD_TO_LAST


def import_csv(spark: SparkSession, path: str, target: KeyedTable) -> KeyedTable:
    """F1: read CSV with header, remap columns to the target schema
    order (the header-remap of ``Row.hs:117-124``), cast to the target
    types, fold-merge into the existing table (upsert, last file wins —
    ``Csv.hs:41``)."""
    schema = target.df.schema
    raw = spark.read.option("header", True).csv(path)
    missing = [f.name for f in schema.fields if f.name not in raw.columns]
    if missing:
        raise ValueError(f"CSV lacks required columns: {missing}")
    typed = raw.select(*[F.col(f.name).cast(f.dataType).alias(f.name)
                         for f in schema.fields])
    # fold within-file duplicate keys (last row in file order wins,
    # Table.hs:125-140) before the anti-join merge, which requires
    # one-row-per-key inputs
    incoming = canonicalize_input(typed, target.key_cols)
    return merge_tables([target, incoming], FOLD_TO_LAST)


def import_json(spark: SparkSession, path: str, target: KeyedTable) -> KeyedTable:
    """JSON-lines import (inverse of F3 — the reference only exports
    JSON; import is a capability superset in the same shape as F1):
    schema-enforced read (catalog schema authoritative, field order
    irrelevant in JSON objects), fold-merge upsert into the target."""
    schema = target.df.schema
    raw = spark.read.schema(schema).json(path)
    incoming = canonicalize_input(raw.select(*[f.name for f in schema.fields]),
                                  target.key_cols)
    return merge_tables([target, incoming], FOLD_TO_LAST)


def export_csv(table: KeyedTable, path: str) -> None:
    """F2: key-ordered CSV export, key columns first (``Csv.hs:82-85``:
    header = key names ++ value names). Range-partitioned sort keeps
    files globally ordered; binary columns hex-encode (CSV has no
    binary)."""
    df = table.sorted_df()
    cols = list(table.key_cols) + [c for c in df.columns if c not in table.key_cols]
    out = df.select(*[
        F.hex(F.col(c)).alias(c) if isinstance(df.schema[c].dataType, T.BinaryType)
        else F.col(c)
        for c in cols])
    out.write.mode("overwrite").option("header", True).csv(path)


def export_json(table: KeyedTable, path: str) -> None:
    """F3: JSON-lines export, one object per row, key+value fields
    merged (``Json.hs:16-32``), key-ordered."""
    table.sorted_df().write.mode("overwrite").json(path)


def import_parquet(spark: SparkSession, path: str, key_cols: tuple[str, ...],
                   assume_unique: bool = True) -> KeyedTable:
    """Native columnar source (capability superset; the driver testdata
    path). Pushdown + pruning free via Catalyst. Pass
    ``assume_unique=False`` for parquet of unknown provenance to fold
    within-file duplicate keys (engine-written parquet is canonical by
    construction, so the default skips the fold shuffle)."""
    df = spark.read.parquet(path)
    if assume_unique:
        return KeyedTable(df, key_cols)
    return canonicalize_input(df, key_cols)


def export_parquet(table: KeyedTable, path: str, partition_by: list[str] | None = None) -> None:
    """Native columnar sink; optional hive partitioning for
    partition-pruned reads at scale."""
    w = table.df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def import_orc(spark: SparkSession, path: str, key_cols: tuple[str, ...],
               assume_unique: bool = False) -> KeyedTable:
    """ORC columnar source — same contract as ``import_parquet`` (both
    are Catalyst native formats: predicate pushdown, column pruning,
    splittable stripes). ORC parquet-parity matters for warehouses
    whose lake is Hive/ORC. Defaults to folding within-file duplicate
    keys because foreign ORC has no canonical-shape guarantee."""
    df = spark.read.orc(path)
    if assume_unique:
        return KeyedTable(df, key_cols)
    return canonicalize_input(df, key_cols)


def export_orc(table: KeyedTable, path: str,
               partition_by: list[str] | None = None) -> None:
    """ORC columnar sink (zlib-compressed stripes by default —
    the S5 compression-wrapper role comes free from the format)."""
    w = table.df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def import_binary_dir(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Multimodal blob ingestion: Spark's ``binaryFile`` source reads a
    directory of opaque media files as (path, modificationTime, length,
    content) — the schema every multimodal pipeline starts from. The
    decode stage (``queries/multimodal.py:decode_media_header``) then
    runs over ``content`` via Arrow-batched mapInPandas.

    Scale: binaryFile is a real distributed FileFormat — file listing
    parallelizes, each file is one row in one task, and column pruning
    applies (a query over just ``length`` never reads blob bytes).
    Files are NOT split, so shard huge media into object-store-sized
    blobs upstream; ``spark.sql.files.maxPartitionBytes`` packs many
    small blobs per task."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
