"""Python UDTF surface (SURVEY.md §2.8 — the reference's transform is
strictly 1→1, ``Trie.hs:513-521``; no UDTF exists there). Spark's
1→N generators come in two tiers:

- built-in ``explode``/``posexplode``/``stack`` column generators
  (JVM-side, codegen — used across queries/),
- arbitrary-Python ``@udtf`` table functions with LATERAL correlation
  (this module) — the slow-but-general path, Arrow-batched in Spark 4.

The demo op splits documents into sentences with a per-doc index —
deterministic string logic so a DuckDB zip-unnest oracle can hash-check
it. Sampled to every 10th doc: the point is the operator shape, not a
full-corpus pass through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import query

_STRIP = " \t\n\r"


@query(
    "udtf_split_sentences",
    oracle=f"""
    WITH parts AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, '.'),
                                        s -> trim(s, '{_STRIP}')),
                         s -> s != '') AS ps
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id,
           CAST(unnest(range(len(ps))) AS INT) AS sent_idx,
           unnest(ps) AS sentence
    FROM parts
    """)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF + LATERAL join: each document row expands to one row
    per (trimmed, non-empty) sentence with its in-doc ordinal. At scale
    the UDTF runs Arrow-batched per partition; correlation via LATERAL
    keeps it a narrow map-side generate — no shuffle."""
    from pyspark.sql.functions import udtf

    from . import load

    @udtf(returnType="sent_idx int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            i = 0
            for raw in (text or "").split("."):
                s = raw.strip(_STRIP)
                if s:
                    yield i, s
                    i += 1

    load(spark, sf_dir, "documents")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql("""
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM documents d, LATERAL split_sentences(d.text) s
        WHERE d.doc_id % 10 = 0""")
