"""Store / MemoStore / catalog / materializer contracts, mirroring the
reference's reusable backend specs
(``/root/reference/messdb-base-testlib/src/MessDB/Test/Store.hs:14-35``,
``.../MemoStore.hs:13-35``) and the determinism property of the
canonical trie shape (``messdb-base/src/MessDB/Trie.hs:124-129``)."""

from __future__ import annotations

from messdb_spark.engine import Engine
from messdb_spark.hashing import table_content_hash
from messdb_spark.operators.core import KeyedTable
from messdb_spark.plans import views as V
from messdb_spark.registry import REGISTRY
from pyspark.sql import functions as F


def test_content_hash_order_insensitive(spark):
    rows = [(i, f"v{i}", float(i) * 1.5) for i in range(500)]
    df1 = spark.createDataFrame(rows, "k long, s string, x double").repartition(7)
    df2 = spark.createDataFrame(list(reversed(rows)), "k long, s string, x double").repartition(3)
    assert table_content_hash(df1) == table_content_hash(df2)


def test_content_hash_detects_change(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    df1 = spark.createDataFrame(rows, "k long, s string")
    df2 = spark.createDataFrame(rows[:-1] + [(99, "CHANGED")], "k long, s string")
    df3 = spark.createDataFrame(rows + [(100, "extra")], "k long, s string")
    h1 = table_content_hash(df1)
    assert h1 != table_content_hash(df2)
    assert h1 != table_content_hash(df3)


def test_content_hash_null_vs_empty(spark):
    df1 = spark.createDataFrame([(1, None)], "k long, s string")
    df2 = spark.createDataFrame([(1, "")], "k long, s string")
    assert table_content_hash(df1) != table_content_hash(df2)


def test_object_store_write_once(spark, warehouse):
    from messdb_spark.store import ObjectStore
    st = ObjectStore(warehouse)
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    h = table_content_hash(df)
    st.save(h, df)
    assert st.saves == 1
    st.save(h, df)   # duplicate save must not rewrite (write-once)
    assert st.saves == 1 and st.save_skips == 1
    got = st.load(spark, h).collect()
    assert [tuple(r) for r in got] == [(1, "a")]


def test_memo_hit_skips_computation(spark, warehouse):
    eng = Engine(spark, warehouse)
    df = spark.createDataFrame([(i, i % 10, float(i)) for i in range(200)],
                               "k long, g long, x double")
    eng.save_table("base", KeyedTable(df, ("k",)))

    REGISTRY.transforms.pop("memo_test_by_g", None)

    @REGISTRY.transform("memo_test_by_g", new_key_cols=("g",))
    def _by_g(d):
        return d.select("g", "x", "__messdb_ord")

    ir = V.sort(eng.scan_ir("base"), "memo_test_by_g", "fold_sum")
    h1 = eng.materializer.materialize(ir)
    n_computed = eng.materializer.computed_ops
    h2 = eng.materializer.materialize(ir)   # must be a manifest hit
    assert h1 == h2
    assert eng.materializer.computed_ops == n_computed
    assert eng.memo.hits >= 1


def test_cross_view_shared_subplan_reuse(spark, warehouse):
    """The Materializer's recursion memoizes PER IR NODE
    (``Trie.hs:280-295`` shape): a second view whose subplan equals an
    already-materialized view's must HIT that node's cache and compute
    only its own new node — zero data jobs, zero CAS writes for the
    shared prefix (VERDICT r8 proof gap #2)."""
    eng = Engine(spark, warehouse)
    df = spark.createDataFrame([(i, i % 10, float(i)) for i in range(200)],
                               "k long, g long, x double")
    eng.save_table("base", KeyedTable(df, ("k",)))

    REGISTRY.transforms.pop("memo_shared_by_g", None)

    @REGISTRY.transform("memo_shared_by_g", new_key_cols=("g",))
    def _by_g(d):
        return d.select("g", "x", "__messdb_ord")

    m = eng.materializer
    prefix = V.sort(eng.scan_ir("base"), "memo_shared_by_g", "fold_sum")
    view_a = V.range_(prefix, lo=[0], hi=[4])
    h_a = m.materialize(view_a)
    assert m.computed_ops == 2          # prefix node + A's range node
    saves_after_a = eng.objects.saves
    hits_after_a = eng.memo.hits

    # view B shares the ENTIRE prefix; only its own range node may run
    view_b = V.range_(prefix, lo=[5], hi=[9])
    h_b = m.materialize(view_b)
    assert m.computed_ops == 3, "B recomputed the shared prefix"
    assert eng.memo.hits == hits_after_a + 1   # exactly the prefix hit
    assert eng.objects.saves == saves_after_a + 1  # only B's output stored
    assert h_b != h_a

    # and a third view of a different op flavor over the same prefix
    view_c = V.sql_view(
        "SELECT g, x FROM shared_pref WHERE g IN (0, 9)",
        {"shared_pref": prefix})
    m.materialize(view_c)
    assert m.computed_ops == 4          # only the sql node ran
    # rows through B match a direct computation (content, not just counts)
    got = {(r.g, r.x) for r in
           eng.objects.load(spark, h_b).collect()}
    want = {(g, float(sum(i for i in range(200) if i % 10 == g)))
            for g in range(5, 10)}
    assert got == want


def test_memo_invalidates_on_input_change(spark, warehouse):
    eng = Engine(spark, warehouse)
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "k long, x double")
    eng.save_table("t", KeyedTable(df, ("k",)))
    ir1 = V.range_(eng.scan_ir("t"), lo=[10], hi=[20])
    h1 = eng.materializer.materialize(ir1)
    # change the base table → new scan hash → new digest → recompute
    df2 = df.withColumn("x", F.col("x") * 2)
    eng.save_table("t", KeyedTable(df2, ("k",)))
    ir2 = V.range_(eng.scan_ir("t"), lo=[10], hi=[20])
    assert V.plan_digest(ir1) != V.plan_digest(ir2)
    h2 = eng.materializer.materialize(ir2)
    assert h1 != h2


def test_engine_sql_and_ddl(spark, warehouse):
    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE pts (id bigint PRIMARY KEY, name text NOT NULL, score double)")
    t = eng.load_table("pts")
    assert t.key_cols == ("id",)
    assert [f.name for f in t.df.schema.fields] == ["id", "name", "score"]
    assert t.df.count() == 0
    # full SELECT support = capability superset of the reference
    from messdb_spark.operators.core import table_insert
    t2 = table_insert(t, {"id": 1, "name": "a", "score": 2.5})
    eng.save_table("pts", t2)
    got = eng.sql("SELECT id, score FROM pts WHERE score > 1").collect()
    assert [tuple(r) for r in got] == [(1, 2.5)]


def test_memory_store_contract(spark):
    from messdb_spark.store import MemoryObjectStore
    st = MemoryObjectStore()
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    h = table_content_hash(df)
    st.save(h, df)
    st.save(h, df)
    assert st.saves == 1 and st.save_skips == 1    # write-once (Store.hs:28-35)
    assert [tuple(r) for r in st.load(spark, h).collect()] == [(1, "a")]


def test_memory_catalog_contract():
    """S8 MemoryRepo analog (``Repo/Memory.hs:11-18``): the in-memory
    catalog honors the same observable contract the JSON/sqlite
    backends are contract-tested for — missing root = empty catalog,
    1-based consecutive versions, atomic multi-table swaps, time
    travel, restore-as-new-version, root pruning — plus no lost
    updates under a threaded writer race (the process-local analog of
    test_root_swap_race; the reference's MemoryRepo is an IORef, so
    process-local is the contract)."""
    import threading

    from messdb_spark.store import CatalogEntry, MemoryCatalog

    cat = MemoryCatalog()
    assert cat.current_version() == 0 and cat.names() == []
    assert cat.get("absent") is None

    assert cat.put("t1", CatalogEntry("h1", "{}", ["k"])) == 1
    assert cat.put("t2", CatalogEntry("h2", "{}", ["k"])) == 2
    assert cat.get("t1").table_hash == "h1"
    assert cat.get("t1").key_cols == ["k"]
    assert cat.names() == ["t1", "t2"]

    # multi-table atomic swap: ONE version for the whole batch
    v = cat.put_many({f"b{j}": CatalogEntry(f"hb{j}", "{}", ["k"])
                      for j in range(3)})
    assert v == 3 and len(cat.names()) == 5

    # time travel + restore-as-new-version + drop
    assert cat.names(version=1) == ["t1"]
    assert cat.names(version=2) == ["t1", "t2"]
    assert cat.drop("t2") == 4 and "t2" not in cat.names()
    assert cat.restore_version(2) == 5
    assert cat.names() == ["t1", "t2"]

    # prune bounds the time-travel horizon, current stays readable
    assert cat.prune_roots(4) == 3
    assert cat.names(version=2) == []            # pruned root reads empty
    assert cat.names() == ["t1", "t2"]

    # threaded writer race: every commit lands, versions consecutive
    cat2 = MemoryCatalog()
    n, prefixes = 20, ("alpha", "beta", "gamma")

    def writer(prefix):
        for i in range(n):
            cat2.put(f"{prefix}_{i}", CatalogEntry(f"h_{prefix}_{i}",
                                                   "{}", ["k"]))

    threads = [threading.Thread(target=writer, args=(p,))
               for p in prefixes]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert cat2.current_version() == len(prefixes) * n
    assert set(cat2.names()) == {f"{p}_{i}" for p in prefixes
                                 for i in range(n)}
    # every version's root holds exactly v names (each put adds one)
    for v in (1, n, len(prefixes) * n):
        assert len(cat2.names(version=v)) == v


def test_debug_store_logs(spark, warehouse):
    from messdb_spark.store import DebugStore, ObjectStore
    lines = []
    st = DebugStore(ObjectStore(warehouse), log=lines.append)
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    h = table_content_hash(df)
    st.save(h, df)
    st.load(spark, h)
    assert len(lines) == 2 and "save" in lines[0] and "load" in lines[1]


def test_sql_view_materialization_memoizes(spark, warehouse):
    eng = Engine(spark, warehouse)
    df = spark.createDataFrame([(i, i % 5, float(i)) for i in range(100)],
                               "k long, g long, x double")
    eng.save_table("base_sql", KeyedTable(df, ("k",)))
    ir = V.sql_view(
        "SELECT g, count(*) AS n, round(sum(x), 2) AS total FROM base_sql GROUP BY g",
        {"base_sql": eng.scan_ir("base_sql")})
    h1 = eng.materializer.materialize(ir)
    computed = eng.materializer.computed_ops
    h2 = eng.materializer.materialize(ir)      # memo hit, no recompute
    assert h1 == h2 and eng.materializer.computed_ops == computed
    out = {r["g"]: (r["n"], r["total"])
           for r in eng.materializer.dataframe(ir).collect()}
    assert out[0] == (20, 950.0)


def test_sqlite_manifest_backend(spark, warehouse):
    """S3 SqliteStore parity: memo + catalog served from one sqlite
    file (WAL, sync off — the reference's pragmas), same contracts as
    the JSON backend, state surviving a reopen (cross-process analog)."""
    from messdb_spark.sqlite_store import SqliteCatalog, SqliteMemoStore

    eng = Engine(spark, warehouse, manifest_backend="sqlite")
    df = spark.createDataFrame([(i, i % 10, float(i)) for i in range(100)],
                               "k long, g long, x double")
    eng.save_table("sq_base", KeyedTable(df, ("k",)))

    REGISTRY.transforms.pop("sq_by_g", None)

    @REGISTRY.transform("sq_by_g", new_key_cols=("g",))
    def _by_g(d):
        return d.select("g", "x", "__messdb_ord")

    ir = V.sort(eng.scan_ir("sq_base"), "sq_by_g", "fold_sum")
    h1 = eng.materializer.materialize(ir)
    computed = eng.materializer.computed_ops
    assert eng.materializer.materialize(ir) == h1
    assert eng.materializer.computed_ops == computed   # memo hit

    # memo is advisory and replace-on-put (matches the JSON backend):
    # the materializer only re-puts after finding the recorded target
    # object missing, so the replaced value is already dead — OR IGNORE
    # would pin the dead hash and recompute forever
    eng.memo.put("probe", "v1")
    eng.memo.put("probe", "v2")
    assert eng.memo.get("probe") == "v2"

    # reopen (fresh connections = another process): everything persists
    eng2 = Engine(spark, warehouse, manifest_backend="sqlite")
    assert isinstance(eng2.memo, SqliteMemoStore)
    assert isinstance(eng2.catalog, SqliteCatalog)
    assert eng2.memo.get("probe") == "v2"
    assert eng2.materializer.materialize(ir) == h1     # cross-process hit
    assert eng2.materializer.computed_ops == 0
    assert eng2.load_table("sq_base").df.count() == 100
    # versioned roots → time travel works on sqlite too
    assert eng2.catalog.current_version() == 1
    eng2.save_table("sq_base2", eng2.load_table("sq_base"))
    assert eng2.catalog.current_version() == 2
    assert eng2.catalog.get("sq_base2", version=1) is None


def test_catalog_time_travel(spark, warehouse):
    from messdb_spark.operators.core import table_insert
    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE tt (k bigint PRIMARY KEY, v text)")   # v1
    t = eng.load_table("tt")
    eng.save_table("tt", table_insert(t, {"k": 1, "v": "a"}))    # v2
    eng.save_table("tt", table_insert(eng.load_table("tt"), {"k": 1, "v": "b"}))  # v3
    assert eng.catalog.current_version() == 3
    assert eng.load_table("tt", version=2).df.collect()[0]["v"] == "a"
    assert eng.load_table("tt").df.collect()[0]["v"] == "b"
    assert eng.load_table("tt", version=1).df.count() == 0
    import pytest as _pytest
    with _pytest.raises(KeyError):
        eng.load_table("nope", version=2)


def test_compact_table_preserves_content_hash(spark, warehouse):
    """Compaction rewrites layout only: fewer files, same content hash,
    same rows; a no-op when already compact."""
    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable

    eng = Engine(spark, warehouse)
    df = (spark.range(0, 5000)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 7).cast("string").alias("v")))
    # force many small files: since r15 key-sorted saves size their
    # fan-out from the optimizer estimate (~128 MB/file — one file for
    # a KB-scale table), so pin a tiny per-file target for this test
    spark.conf.set("spark.messdb_spark.save.targetFileBytes", "4096")
    try:
        eng.save_table("t", KeyedTable(df, ("k",)))
    finally:
        spark.conf.unset("spark.messdb_spark.save.targetFileBytes")
    h = eng.table_hash("t")
    stats = eng.compact_table("t", target_bytes=64 * 1024 * 1024)
    assert stats["files_after"] < stats["files_before"]
    assert eng.table_hash("t") == h            # catalog entry untouched
    reloaded = eng.load_table("t")
    assert reloaded.df.count() == 5000
    from messdb_spark.hashing import table_content_hash
    assert table_content_hash(reloaded.df) == h
    again = eng.compact_table("t", target_bytes=64 * 1024 * 1024)
    assert again["skipped"] is True


def test_sync_table_cross_store_incremental(spark, tmp_path):
    """O9 syncTrie analog: push a table's object closure into another
    warehouse; content addresses make the second sync incremental
    (shared bucket objects ship once — Trie.hs:256-260 semantics at
    bucket granularity)."""
    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable
    from messdb_spark.plans.incremental import incremental_upsert, load_manifest

    a = Engine(spark, str(tmp_path / "A"))
    b = Engine(spark, str(tmp_path / "B"))

    # plain table: sync, verify, re-sync skips
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, v string")
    a.save_table("t", KeyedTable(df, ("k",)))
    s1 = a.sync_table("t", b)
    assert s1 == {"copied": 1, "skipped": 0}
    assert b.table_hash("t") == a.table_hash("t")
    assert {r["k"]: r["v"] for r in b.load_table("t").df.collect()} \
        == {1: "x", 2: "y"}
    assert a.sync_table("t", b) == {"copied": 0, "skipped": 1}

    # bucketed table: small upsert => only changed buckets re-ship
    big = spark.createDataFrame([(i, f"v{i}") for i in range(200)],
                                "k bigint, v string")
    from messdb_spark.plans.incremental import write_bucketed
    ref = write_bucketed(a.objects, KeyedTable(big, ("k",)), n_buckets=16)
    a.save_bucketed_table("bt", ref)
    s2 = a.sync_table("bt", b)
    n_nonempty = sum(1 for h in ref.bucket_hashes if h != "empty")
    assert s2["copied"] == 1 + n_nonempty   # manifest + buckets
    delta = spark.createDataFrame([(3, "changed")], "k bigint, v string")
    ref2 = incremental_upsert(spark, a.objects, ref, delta)
    a.save_bucketed_table("bt", ref2)
    s3 = a.sync_table("bt", b)
    n_changed = sum(1 for x, y in zip(ref.bucket_hashes, ref2.bucket_hashes)
                    if x != y)
    assert s3["copied"] == 1 + n_changed    # new manifest + changed buckets
    assert s3["skipped"] == n_nonempty - n_changed
    assert {r["k"]: r["v"] for r in b.load_table("bt").df.collect()}[3] \
        == "changed"


def test_verify_table_detects_corruption(spark, tmp_path):
    """Scrub check: a clean table verifies; byte-corrupting its stored
    object makes verification fail (and bucketed tables verify per
    bucket against the manifest)."""
    import glob
    import os

    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable
    from messdb_spark.plans.incremental import write_bucketed

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(50)],
                               "k bigint, v string")
    eng.save_table("t", KeyedTable(df, ("k",)))
    assert eng.verify_table("t") is True

    ref = write_bucketed(eng.objects, KeyedTable(df, ("k",)), n_buckets=4)
    eng.save_bucketed_table("bt", ref)
    assert eng.verify_table("bt") is True

    # corrupt one parquet file of the plain table (swap in a different
    # but valid parquet: one row, same schema)
    path = eng.objects.path(eng.table_hash("t"))
    victim = sorted(glob.glob(os.path.join(path, "part-*")))[0]
    evil = spark.createDataFrame([(999, "evil")], "k bigint, v string")
    tmp_out = str(tmp_path / "evil")
    evil.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    src = sorted(glob.glob(os.path.join(tmp_out, "part-*")))[0]
    os.remove(victim)
    import shutil
    shutil.copy(src, victim)
    assert eng.verify_table("t") is False


def test_cas_objects_are_key_sorted_and_file_prunable(spark, warehouse):
    """The reference's always-sorted invariant (Trie.hs:124-134) made
    physical: ObjectStore.put lays keyed objects out with
    repartitionByRange + sortWithinPartitions, so the stored parquet
    files carry DISJOINT key ranges and a reloaded range query can
    skip whole files on footer min/max alone. Content address must be
    unaffected (order-insensitive digest)."""
    import os

    import pyarrow.parquet as pq

    from messdb_spark.operators.core import KeyBound, range_filter

    eng = Engine(spark, warehouse)
    n = 10_000
    # adversarial producer layout: hash-partitioned on a NON-key column
    df = (spark.range(n)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 97).alias("noise"),
                  F.concat(F.lit("v"), F.col("id")).alias("v"))
          .repartition(8, "noise"))
    # r15: estimate-sized saves put a KB-scale table in ONE file; this
    # test proves PER-FILE range disjointness, so force a multi-file
    # layout with a tiny per-file target (the invariant itself —
    # disjoint sorted ranges — is unchanged at any fan-out)
    spark.conf.set("spark.messdb_spark.save.targetFileBytes", "16384")
    try:
        h = eng.save_table("t", KeyedTable(df, ("k",)))
    finally:
        spark.conf.unset("spark.messdb_spark.save.targetFileBytes")

    path = eng.objects.path(h)
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    assert len(files) > 1, "need multiple files to prove pruning"
    ranges = []
    for f in files:
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        kmins, kmaxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "k":
                    kmins.append(col.statistics.min)
                    kmaxs.append(col.statistics.max)
        ranges.append((min(kmins), max(kmaxs)))
    ranges.sort()
    # disjoint, totally ordered file ranges = the sorted invariant
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2
    # a narrow range intersects exactly one file's span
    probe_lo, probe_hi = ranges[0][1] + 1, ranges[1][1]
    touched = [r for r in ranges if not (r[1] < probe_lo or r[0] > probe_hi)]
    assert len(touched) < len(files)

    # reload + range_filter: correct content, and the address survived
    # the layout change (order-insensitive digest)
    t = eng.load_table("t")
    assert table_content_hash(t.df) == h
    got = range_filter(t, KeyBound((100,), True), KeyBound((110,), False))
    assert sorted(r["k"] for r in got.df.collect()) == list(range(100, 110))
    assert eng.verify_table("t")


def test_load_many_one_scan_and_object_tags(spark, warehouse):
    """load_many (r9): N objects -> ONE multi-path parquet scan node
    (not a union of per-object scans), rows tagged with their owning
    object hash, duplicate requests collapsed, IO counted per distinct
    object."""
    import contextlib
    import io

    from messdb_spark.store import ObjectStore

    store = ObjectStore(warehouse)
    hs = []
    for i in range(3):
        df = spark.createDataFrame([(i, j) for j in range(5)],
                                   "tag long, v long")
        hs.append(store.put(df, table_content_hash))
    assert len(set(hs)) == 3
    loads0 = store.loads
    out = store.load_many(spark, hs + [hs[0]])      # dup collapses
    assert store.loads - loads0 == 3
    rows = out.collect()
    assert len(rows) == 15
    by_obj = {}
    for r in rows:
        by_obj.setdefault(r["__messdb_object"], set()).add(r["tag"])
    # each object's rows tag back to exactly its content
    assert by_obj == {hs[i]: {i} for i in range(3)}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    # formatted explain prints each node once in the tree and once in
    # the detail section: one scan node == one "(n) Scan parquet" entry
    assert buf.getvalue().count(") Scan parquet") == 1
