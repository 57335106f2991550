"""messdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of quyse/messdb (reference read-only at
/root/reference), re-expressed Spark-first per SURVEY.md.

Core surface:
- ``operators.core``: merge/sort/range/insert/rows (the reference's O1-O7)
- ``plans.views``: plan-digest memoized materialized views (O8)
- ``store`` / ``engine``: content-addressed object store, catalog, SQL
- ``sources``: CSV/JSON/Parquet import-export (F1-F4)
- ``functions``: analytics + LLM-pipeline operators (dedup, similarity,
  text analysis, multimodal)
"""

from .engine import Engine
from .operators.core import (KeyBound, KeyedTable, merge_tables, range_filter,
                             sort_table, table_from_rows, table_insert,
                             table_to_rows)
from .registry import FOLD_SUM, FOLD_TO_FIRST, FOLD_TO_LAST, REGISTRY
from .session import get_spark, load_tables

__all__ = [
    "Engine", "KeyBound", "KeyedTable", "merge_tables", "range_filter",
    "sort_table", "table_from_rows", "table_insert", "table_to_rows",
    "FOLD_SUM", "FOLD_TO_FIRST", "FOLD_TO_LAST", "REGISTRY",
    "get_spark", "load_tables",
]
