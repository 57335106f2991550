"""MERGE INTO (§2.5 SQL surface, lakehouse upsert statement) lowered
onto the engine's anti-join merge — parser + engine semantics."""

from __future__ import annotations

import pytest

from messdb_spark.engine import Engine
from messdb_spark.operators.core import KeyedTable
from messdb_spark.sql_ddl import MergeStmt, SqlError, parse_dml


def _setup(spark, warehouse):
    eng = Engine(spark, warehouse)
    df = spark.createDataFrame([(1, "a", 10), (2, "b", 20), (3, "c", 30)],
                               "k long, name string, v long")
    eng.save_table("t", KeyedTable(df, ("k",)))
    src = spark.createDataFrame([(2, "B2", 200), (4, "d", 40)],
                                "k long, name string, v long")
    eng.save_table("s", KeyedTable(src, ("k",)))
    return eng


def test_parse_merge_forms():
    m = parse_dml("MERGE INTO t USING s ON t.k = s.k "
                  "WHEN MATCHED THEN UPDATE SET v = s.v "
                  "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
    assert isinstance(m, MergeStmt)
    assert m.target == "t" and m.source_alias == "s"
    assert m.update_assignments == [("v", "s.v")]
    assert m.insert_cols == ["k", "v"]

    m = parse_dml("MERGE INTO t AS a USING (SELECT 1 AS k) b ON a.k = b.k "
                  "WHEN MATCHED THEN DELETE")
    assert m.matched_delete and m.target_alias == "a"
    assert m.source_sql == "SELECT 1 AS k"

    m = parse_dml("MERGE INTO t USING s ON t.k = s.k "
                  "WHEN NOT MATCHED THEN INSERT *")
    assert m.insert_star and m.update_assignments is None

    with pytest.raises(SqlError, match="one WHEN MATCHED action"):
        parse_dml("MERGE INTO t USING s ON t.k = s.k "
                  "WHEN MATCHED THEN DELETE "
                  "WHEN MATCHED THEN UPDATE SET v = 1")
    assert parse_dml("SELECT 1") is None


def test_merge_update_and_insert(spark, warehouse):
    eng = _setup(spark, warehouse)
    res = eng.dml(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v + 1 "
        "WHEN NOT MATCHED THEN INSERT (k, name, v) "
        "VALUES (s.k, s.name, s.v)")
    assert res == {"op": "merge", "table": "t", "rows_updated": 1,
                   "rows_deleted": 0, "rows_inserted": 1}
    got = sorted((r.k, r.name, r.v)
                 for r in eng.load_table("t").df.collect())
    assert got == [(1, "a", 10), (2, "B2", 201), (3, "c", 30),
                   (4, "d", 40)]


def test_merge_delete_and_insert_star(spark, warehouse):
    eng = _setup(spark, warehouse)
    res = eng.dml("MERGE INTO t USING (SELECT 1 AS k) d ON t.k = d.k "
                  "WHEN MATCHED THEN DELETE")
    assert res["rows_deleted"] == 1
    assert sorted(r.k for r in eng.load_table("t").df.collect()) == [2, 3]

    res = eng.dml("MERGE INTO t USING s ON t.k = s.k "
                  "WHEN NOT MATCHED THEN INSERT *")
    # only k=4 is unmatched; matched k=2 passes through UNCHANGED
    assert res == {"op": "merge", "table": "t", "rows_updated": 0,
                   "rows_deleted": 0, "rows_inserted": 1}
    got = sorted((r.k, r.name, r.v)
                 for r in eng.load_table("t").df.collect())
    assert got == [(2, "b", 20), (3, "c", 30), (4, "d", 40)]


def test_merge_guards(spark, warehouse):
    eng = _setup(spark, warehouse)
    with pytest.raises(SqlError, match="key column"):
        eng.dml("MERGE INTO t USING s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET k = s.k + 1")
    with pytest.raises(SqlError, match="key column"):
        eng.dml("MERGE INTO t USING s ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT (name) VALUES (s.name)")
    with pytest.raises(SqlError, match="aliases must differ"):
        eng.dml("MERGE INTO t AS x USING s x ON x.k = x.k "
                "WHEN MATCHED THEN DELETE")


def test_merge_via_cli(tmp_path, capsys):
    from messdb_spark.cli import main

    wh = str(tmp_path / "wh")
    assert main(["-w", wh, "sql", "-c",
                 "CREATE TABLE mt (k bigint PRIMARY KEY, v bigint); "
                 "INSERT INTO mt VALUES (1, 10), (2, 20); "
                 "MERGE INTO mt USING (SELECT 2 AS k, 99 AS v) s "
                 "ON mt.k = s.k "
                 "WHEN MATCHED THEN UPDATE SET v = s.v "
                 "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v); "
                 "SELECT k, v FROM mt ORDER BY k"]) == 0
    out = capsys.readouterr().out
    assert '"rows_updated": 1' in out
    assert '{"k":1,"v":10}' in out.replace(" ", "")
    assert '{"k":2,"v":99}' in out.replace(" ", "")


def test_ctas_creates_keyed_table_from_select(spark, tmp_path):
    """CREATE TABLE ... AS SELECT: result saved as a keyed table with
    last-wins canonicalization; PRIMARY KEY clause picks the key,
    default is the first output column; IF NOT EXISTS no-ops; existing
    name without it raises."""
    import pytest as _pytest

    from messdb_spark.engine import Engine, SqlError
    from messdb_spark.operators.core import KeyedTable

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "id long, grp string, v long")
    eng.save_table("src", KeyedTable(df, ("id",)))

    eng.ddl("CREATE TABLE agg PRIMARY KEY (grp) AS "
            "SELECT grp, sum(v) AS total FROM src GROUP BY grp")
    t = eng.load_table("agg")
    assert t.key_cols == ("grp",)
    assert {(r["grp"], r["total"]) for r in t.df.collect()} == {
        ("a", 30), ("b", 30)}

    # default key = first output column
    eng.ddl("CREATE TABLE copy AS SELECT id, v FROM src")
    assert eng.load_table("copy").key_cols == ("id",)

    with _pytest.raises(SqlError, match="already exists"):
        eng.ddl("CREATE TABLE agg AS SELECT 1 AS one")
    eng.ddl("CREATE TABLE IF NOT EXISTS agg AS SELECT 1 AS one")  # no-op
    assert eng.load_table("agg").df.count() == 2

    with _pytest.raises(SqlError, match="not in SELECT output"):
        eng.ddl("CREATE TABLE bad PRIMARY KEY (nope) AS "
                "SELECT id FROM src")


def test_insert_overwrite_replaces_content_atomically(spark, tmp_path):
    """INSERT OVERWRITE [TABLE]: data becomes exactly the canonicalized
    source, schema/keys unchanged, one root swap (old content remains
    at the previous version)."""
    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    eng.save_table("t", KeyedTable(df, ("id",)))
    v0 = eng.catalog.current_version()

    res = eng.dml("INSERT OVERWRITE t VALUES (7, 'x'), (8, 'y'), (7, 'z')")
    assert res == {"op": "insert_overwrite", "table": "t", "rows": 2}
    got = {r["id"]: r["v"] for r in eng.load_table("t").df.collect()}
    assert got == {7: "z", 8: "y"}          # within-source last wins
    assert eng.load_table("t").key_cols == ("id",)
    assert eng.catalog.current_version() == v0 + 1
    # time travel: the pre-overwrite content is still readable
    old = {r["id"]: r["v"]
           for r in eng.load_table("t", version=v0).df.collect()}
    assert old == {1: "a", 2: "b"}

    # SELECT source + TABLE keyword + column subset with typed nulls
    eng.ddl("CREATE TABLE u (id BIGINT PRIMARY KEY, v VARCHAR, "
            "w BIGINT)")
    eng.dml("INSERT INTO u VALUES (1, 'keep', 10)")
    eng.dml("INSERT OVERWRITE TABLE u (id, v) "
            "SELECT id, v FROM t WHERE id = 7")
    rows = eng.load_table("u").df.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 7 and rows[0]["v"] == "z"
    assert rows[0]["w"] is None             # unlisted column: typed null


def test_alter_column_type_widening_only(spark, tmp_path):
    """ALTER COLUMN TYPE: lossless widenings commit as one cast
    rewrite; narrowing refuses; key columns widen with data intact."""
    from pyspark.sql import types as T

    from messdb_spark.engine import Engine, SqlError
    from messdb_spark.operators.core import KeyedTable

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    eng.save_table("t", KeyedTable(df, ("id",)))

    res = eng.alter_column_type("ALTER TABLE t ALTER COLUMN v TYPE bigint")
    assert res["changed"] and res["from"] == "int" and res["to"] == "bigint"
    t = eng.load_table("t")
    assert dict(t.df.dtypes)["v"] == "bigint"
    assert {(r["id"], r["v"]) for r in t.df.collect()} == {(1, 10), (2, 20)}

    # idempotent no-op on same type
    assert eng.alter_column_type(
        "ALTER TABLE t ALTER v SET DATA TYPE bigint")["changed"] is False

    # narrowing refused
    import pytest as _pytest
    with _pytest.raises(SqlError, match="non-widening"):
        eng.alter_column_type("ALTER TABLE t ALTER COLUMN v TYPE int")
    # cross-family refused
    with _pytest.raises(SqlError, match="non-widening"):
        eng.alter_column_type("ALTER TABLE t ALTER COLUMN v TYPE varchar")

    # key column widens, range filter still works on reload
    eng.alter_column_type("ALTER TABLE t ALTER COLUMN id TYPE bigint")
    t2 = eng.load_table("t")
    assert dict(t2.df.dtypes)["id"] == "bigint"
    assert t2.df.filter("id >= 2").count() == 1
