"""dedup-near CLI verb: MinHash-LSH + transitive clustering over any
catalog (key, text) table, survivors = min key per cluster.

Determinism note: the tests cluster EXACT copies — identical text ⇒
identical signatures ⇒ identical band buckets, so the candidate step
is deterministic (near-but-not-identical recall is the probabilistic
part of the detector contract and is covered statistically by
``minhash_estimate_error``)."""

from __future__ import annotations

import json

from messdb_spark.engine import Engine
from messdb_spark.operators.core import KeyedTable


_A = ("the quick brown fox jumps over the lazy dog while the band "
      "plays on and the caravan rolls through the desert at dusk")
_B = ("completely different prose about parquet files and shuffle "
      "partitions that shares no eight-character shingle with A at all")


def test_cli_dedup_near_lifecycle(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    rows = [(1, _A, "s1"), (2, _A, "s2"), (3, _B, "s3"),
            (4, _A, "s4"), (5, "tiny but unique text here", "s5")]
    eng.save_table("docs", KeyedTable(
        spark.createDataFrame(rows, "doc_id bigint, body string, src string"),
        ("doc_id",)))
    v0 = eng.catalog.current_version()

    from messdb_spark.cli import main
    args = ["-w", wh, "dedup-near", "-t", "docs", "--text-col", "body",
            "--out", "docs_dedup", "--clusters-table", "docs_clusters"]
    assert main(args) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["ok"] and st["detector"] == "minhash-lsh"
    assert st["rows_in"] == 5 and st["rows_out"] == 3
    assert st["dups_removed"] == 2 and st["clusters"] == 1

    eng2 = Engine(spark, wh)
    # output + clusters land in ONE root swap
    assert eng2.catalog.current_version() == v0 + 1

    out = {r["doc_id"]: r for r in
           eng2.load_table("docs_dedup").df.collect()}
    assert set(out) == {1, 3, 5}             # min-key survivor of {1,2,4}
    assert out[1]["body"] == _A and out[1]["src"] == "s1"

    cl = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in
          eng2.load_table("docs_clusters").df.collect()}
    assert cl == {1: (1, 3), 2: (1, 3), 4: (1, 3)}


def test_dedup_near_string_keys_use_changed_rows_witness(spark, tmp_path):
    """String keys: min-label propagation works on lexicographic order
    and convergence uses the changed-rows fallback (no label sum)."""
    from messdb_spark.queries.graph import dedup_near

    eng = Engine(spark, str(tmp_path / "wh"))
    rows = [("w-bravo", _A), ("w-alpha", _A), ("w-delta", _B),
            ("w-echo", _A)]
    eng.save_table("d", KeyedTable(
        spark.createDataFrame(rows, "k string, text string"), ("k",)))
    st = dedup_near(eng, "d", "d_dedup", clusters_table="d_cl")
    assert st["rows_out"] == 2 and st["clusters"] == 1
    got = sorted(r["k"] for r in eng.load_table("d_dedup").df.collect())
    assert got == ["w-alpha", "w-delta"]     # lexicographic min survives
    cl = {r["k"]: r["cluster_id"]
          for r in eng.load_table("d_cl").df.collect()}
    assert cl == {"w-alpha": "w-alpha", "w-bravo": "w-alpha",
                  "w-echo": "w-alpha"}


def test_dedup_near_rejects_bad_inputs(spark, tmp_path):
    from messdb_spark.queries.graph import dedup_near

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.save_table("two_key", KeyedTable(
        spark.createDataFrame([(1, 2, "x" * 20)],
                              "a bigint, b bigint, text string"),
        ("a", "b")))
    try:
        dedup_near(eng, "two_key", "out")
        raise AssertionError("expected ValueError for composite key")
    except ValueError:
        pass
    eng.save_table("no_text", KeyedTable(
        spark.createDataFrame([(1, "y")], "a bigint, body string"),
        ("a",)))
    try:
        dedup_near(eng, "no_text", "out")
        raise AssertionError("expected ValueError for missing text col")
    except ValueError:
        pass


def test_cli_dedup_near_subprocess(warehouse, tmp_path):
    """dedup-near through a REAL subprocess invocation (fresh
    interpreter, fresh Spark session — catches import/sys.path issues
    the in-process test cannot)."""
    import json as _json
    import subprocess
    import sys

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "messdb_spark.cli", "-w", warehouse,
             *args],
            capture_output=True, text=True, cwd="/root/repo")
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout

    run("sql", "-c", "CREATE TABLE d (k BIGINT PRIMARY KEY, txt VARCHAR)")
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(
        _json.dumps(r) for r in [
            {"k": 1, "txt": _A}, {"k": 2, "txt": _A},
            {"k": 3, "txt": _B}, {"k": 4, "txt": _A},
        ]) + "\n")
    run("import-json", "-t", "d", str(p))
    stats = _json.loads(run(
        "dedup-near", "-t", "d", "--text-col", "txt",
        "--out", "d_dedup", "--clusters-table", "d_cl")
        .splitlines()[-1])
    assert stats["ok"] and stats["rows_out"] == 2
    assert stats["dups_removed"] == 2 and stats["clusters"] == 1
    rows = [_json.loads(ln) for ln in run(
        "sql", "-c", "SELECT k FROM d_dedup").splitlines()]
    assert sorted(r["k"] for r in rows) == [1, 3]


def test_dedup_near_no_duplicates_is_identity(spark, tmp_path):
    """All-unique corpus: empty candidate graph, empty label frame
    through the closure loop, output == source, zero clusters."""
    from messdb_spark.queries.graph import dedup_near

    eng = Engine(spark, str(tmp_path / "wh"))
    rows = [(1, _A), (2, _B),
            (3, "third completely unrelated body of text right here")]
    eng.save_table("d", KeyedTable(
        spark.createDataFrame(rows, "doc_id bigint, text string"),
        ("doc_id",)))
    st = dedup_near(eng, "d", "d_dedup", clusters_table="d_cl")
    assert st["rows_in"] == 3 and st["rows_out"] == 3
    assert st["dups_removed"] == 0 and st["clusters"] == 0
    assert eng.load_table("d_cl").df.count() == 0
