"""Multi-table atomic commit (Engine.transaction): the reference's
single-root-swap semantics (``Repo.hs:115-118``) generalized across
the namespace — all tables in a batch become visible in ONE catalog
version, aborts leave the pre-transaction root untouched, reads inside
the transaction see its own writes, and a concurrent gc is lease-
blocked for the whole window."""

from __future__ import annotations

import pytest

from messdb_spark.engine import Engine
from messdb_spark.operators.core import KeyedTable
from messdb_spark.store import GcBusyError


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _kv(spark, rows):
    return KeyedTable(
        spark.createDataFrame(rows, "k long, v string"), ("k",))


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_transaction_commits_all_tables_in_one_version(spark, warehouse,
                                                       backend):
    eng = Engine(spark, warehouse + backend, manifest_backend=backend)
    eng.save_table("pre", _kv(spark, [(1, "a")]))
    v0 = eng.catalog.current_version()
    with eng.transaction():
        eng.save_table("fact", _kv(spark, [(1, "f")]))
        eng.save_table("dim", _kv(spark, [(1, "d")]))
        eng.save_table("rollup", _kv(spark, [(1, "r")]))
        # not visible outside yet: the root hasn't swapped
        assert eng.catalog.get("fact") is None
    v1 = eng.catalog.current_version()
    assert v1 == v0 + 1                       # ONE root swap for all 3
    assert eng.load_table("fact").df.count() == 1
    assert eng.load_table("dim").df.count() == 1
    assert eng.load_table("rollup").df.count() == 1
    # time travel: at v0 none of the three existed
    assert eng.catalog.get("fact", version=v0) is None


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_transaction_abort_leaves_root_untouched(spark, warehouse, backend):
    eng = Engine(spark, warehouse + backend, manifest_backend=backend)
    eng.save_table("t", _kv(spark, [(1, "old")]))
    v0 = eng.catalog.current_version()
    with pytest.raises(RuntimeError, match="boom"):
        with eng.transaction():
            eng.save_table("t", _kv(spark, [(1, "new")]))
            eng.save_table("other", _kv(spark, [(2, "x")]))
            raise RuntimeError("boom")
    assert eng.catalog.current_version() == v0
    assert eng.load_table("t").df.collect()[0]["v"] == "old"
    assert eng.catalog.get("other") is None
    # buffer cleared: later writes work normally
    eng.save_table("after", _kv(spark, [(3, "y")]))
    assert eng.load_table("after").df.count() == 1


def test_transaction_read_your_writes_and_merge(spark, warehouse):
    from messdb_spark.operators.core import merge_tables

    eng = Engine(spark, warehouse)
    with eng.transaction():
        eng.save_table("t", _kv(spark, [(1, "a"), (2, "b")]))
        cur = eng.load_table("t")             # sees the buffered write
        merged = merge_tables([cur, _kv(spark, [(2, "B"), (3, "c")])])
        eng.save_table("t", merged)
    got = {r["k"]: r["v"] for r in eng.load_table("t").df.collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_transaction_blocks_gc_and_survives_it(spark, warehouse):
    eng = Engine(spark, warehouse)
    eng.save_table("t", _kv(spark, [(1, "a")]))
    eng.save_table("t", _kv(spark, [(1, "b")]))   # v1 superseded
    with eng.transaction():
        eng.save_table("u", _kv(spark, [(9, "z")]))
        with pytest.raises(GcBusyError):
            eng.gc(keep_versions=1)
    # after commit the staged object is rooted; gc keeps it
    stats = eng.gc(keep_versions=1)
    assert eng.load_table("u").df.count() == 1
    assert eng.table_hash("u") not in set(stats["swept"])


def test_transaction_nested_joins_outer(spark, warehouse):
    eng = Engine(spark, warehouse)
    v0 = eng.catalog.current_version()
    with eng.transaction():
        eng.save_table("a", _kv(spark, [(1, "a")]))
        with eng.transaction():               # joins, no extra swap
            eng.save_table("b", _kv(spark, [(2, "b")]))
        assert eng.catalog.get("b") is None   # still buffered
    assert eng.catalog.current_version() == v0 + 1
    assert eng.load_table("a").df.count() == 1
    assert eng.load_table("b").df.count() == 1


def test_transaction_on_branch_advances_that_branch(spark, warehouse):
    """A multi-table transaction committed on a checked-out branch
    advances THAT branch's head by one version; the other branch's
    view of the namespace is untouched."""
    eng = Engine(spark, warehouse)
    eng.save_table("t", _kv(spark, [(1, "main")]))
    eng.create_branch("feature")
    eng.checkout("feature")
    with eng.transaction():
        eng.save_table("t", _kv(spark, [(1, "feat")]))
        eng.save_table("extra", _kv(spark, [(2, "x")]))
    assert eng.load_table("t").df.collect()[0]["v"] == "feat"
    assert eng.load_table("extra").df.count() == 1
    eng.checkout("main")
    assert eng.load_table("t").df.collect()[0]["v"] == "main"
    assert eng.catalog.get("extra") is None
    # merge brings both tables over as pointer copies
    eng.merge_branch("feature")
    assert eng.load_table("t").df.collect()[0]["v"] == "feat"
    assert eng.load_table("extra").df.count() == 1


# -- model-based property: a random program of transactions ------------

from hypothesis import HealthCheck, given, settings, strategies as st

_tbl = st.sampled_from(["ta", "tb", "tc"])
_rows = st.lists(st.tuples(st.integers(0, 5), st.text("ab", max_size=2)),
                 min_size=1, max_size=4)
# a program: each transaction is (commit?, [(table, rows), ...])
_program = st.lists(
    st.tuples(st.booleans(),
              st.lists(st.tuples(_tbl, _rows), min_size=1, max_size=3)),
    min_size=1, max_size=4)


@given(program=_program)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_transaction_program_matches_model(spark, tmp_path_factory,
                                           program):
    """Random programs of multi-table transactions (some aborted)
    against a dict-of-dicts model: committed transactions apply all
    their saves (last write inside a txn wins per table, canonicalized
    last-wins per key), aborted ones apply nothing, and the catalog
    version advances exactly once per non-empty committed
    transaction."""
    eng = Engine(spark, str(tmp_path_factory.mktemp("txnp") / "wh"))
    model: dict[str, dict[int, str]] = {}
    expected_version = eng.catalog.current_version()
    for commit, saves in program:
        staged: dict[str, dict[int, str]] = {}
        try:
            with eng.transaction():
                for tbl, rows in saves:
                    eng.save_table(tbl, _kv(spark, rows))
                    staged[tbl] = dict(rows)     # last (k, v) wins
                if not commit:
                    raise RuntimeError("abort")
        except RuntimeError:
            continue
        model.update(staged)
        expected_version += 1
        assert eng.catalog.current_version() == expected_version
    assert eng.catalog.current_version() == expected_version
    for tbl, want in model.items():
        got = {r["k"]: r["v"] for r in eng.load_table(tbl).df.collect()}
        assert got == want, tbl
    for tbl in {"ta", "tb", "tc"} - set(model):
        assert eng.catalog.get(tbl) is None
