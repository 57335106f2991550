"""Sqlite-backed manifest backends — S3 SqliteStore parity
(``/root/reference/messdb-store-sqlite/src/MessDB/Store/Sqlite.hs:41-103``,
``.../src/c-bits/sqlite_store.cpp:46-98``): one sqlite file serving as
MemoStore + RepoStore, exactly the role the reference's tool wires up
(``messdb-tool/src/messdb-tool.hs:154-161``).

Parquet objects stay in the filesystem CAS (ObjectStore) — at 100 TB
bulk data lives on object storage regardless of which transactional KV
holds the (tiny) manifests; sqlite replaces the JSON files when many
processes share a warehouse and atomic-rename isn't enough.

Pragma parity with the reference (``sqlite_store.cpp:46-50``): WAL
journal, ``synchronous=OFF`` — durability deliberately traded for
speed, matching the reference byte-for-byte in spirit.

Schema parity: the reference creates ``store``, ``memo_store`` and
``repo_root`` tables keyed by blob key (``sqlite_store.cpp:84-98``);
here ``memo_store(key → value)`` and ``repo_root(version → root_json)``
(versioned for the catalog's time travel; the reference keeps only the
latest root — history is our extension, free because objects are
immutable).
"""

from __future__ import annotations

import json
import os
import sqlite3

from .store import CatalogEntry


def _connect(path: str) -> sqlite3.Connection:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    con = sqlite3.connect(path)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA synchronous=OFF")
    con.execute("""CREATE TABLE IF NOT EXISTS memo_store (
        key TEXT PRIMARY KEY, value TEXT NOT NULL)""")
    con.execute("""CREATE TABLE IF NOT EXISTS repo_root (
        version INTEGER PRIMARY KEY, root TEXT NOT NULL)""")
    con.commit()
    return con


class SqliteMemoStore:
    """MemoStore over sqlite: op-digest → table-hash.

    ``put`` is INSERT OR REPLACE, matching the JSON ``MemoStore``: the
    memo is advisory (the materializer only re-puts after discovering
    the recorded target object is missing — ``plans/views.py`` —  so
    the value being replaced is already known-dead; OR IGNORE would
    keep the dead hash forever and force a recompute on every call)."""

    def __init__(self, warehouse: str, filename: str = "manifest.sqlite") -> None:
        self.db_path = os.path.join(warehouse, filename)
        self._con = _connect(self.db_path)
        self.hits = 0
        self.misses = 0

    def get(self, op_digest: str) -> str | None:
        row = self._con.execute(
            "SELECT value FROM memo_store WHERE key = ?", (op_digest,)).fetchone()
        if row is None:
            self.misses += 1
            return None
        self.hits += 1
        return row[0]

    def put(self, op_digest: str, table_hash: str) -> None:
        self._con.execute(
            "INSERT OR REPLACE INTO memo_store(key, value) VALUES (?, ?)",
            (op_digest, table_hash))
        self._con.commit()

    def prune(self, is_live) -> int:
        """Drop entries whose target hash fails ``is_live`` (GC support;
        same contract as ``store.MemoStore.prune``)."""
        rows = self._con.execute("SELECT key, value FROM memo_store").fetchall()
        dead = [k for k, v in rows if not is_live(v)]
        self._con.executemany("DELETE FROM memo_store WHERE key = ?",
                              [(k,) for k in dead])
        self._con.commit()
        return len(dead)


class SqliteCatalog:
    """Catalog (RepoRoot + RepoStore analog) over sqlite, same interface
    as ``store.Catalog``: name → entry, versioned roots (time travel),
    atomic swap via sqlite's transactional INSERT."""

    def __init__(self, warehouse: str, filename: str = "manifest.sqlite") -> None:
        self.db_path = os.path.join(warehouse, filename)
        self._con = _connect(self.db_path)

    def _load_root(self, version: int | None = None) -> dict:
        if version is None:
            row = self._con.execute(
                "SELECT root FROM repo_root ORDER BY version DESC LIMIT 1").fetchone()
        else:
            row = self._con.execute(
                "SELECT root FROM repo_root WHERE version = ?", (version,)).fetchone()
        return json.loads(row[0]) if row else {}

    def current_version(self) -> int:
        row = self._con.execute("SELECT max(version) FROM repo_root").fetchone()
        return row[0] or 0

    def _swap_root(self, root: dict) -> int:
        v = self.current_version() + 1
        self._con.execute("INSERT INTO repo_root(version, root) VALUES (?, ?)",
                          (v, json.dumps(root, sort_keys=True)))
        self._con.commit()
        return v

    def names(self, version: int | None = None) -> list[str]:
        return sorted(self._load_root(version).keys())

    def get(self, name: str, version: int | None = None) -> CatalogEntry | None:
        e = self._load_root(version).get(name)
        if e is None:
            return None
        return CatalogEntry(e["table_hash"], e["schema_json"], e["key_cols"])

    def put(self, name: str, entry: CatalogEntry) -> int:
        root = self._load_root()
        root[name] = {"table_hash": entry.table_hash,
                      "schema_json": entry.schema_json,
                      "key_cols": entry.key_cols}
        return self._swap_root(root)

    def drop(self, name: str) -> int:
        root = self._load_root()
        root.pop(name, None)
        return self._swap_root(root)

    def restore_version(self, version: int) -> int:
        """Archived root → current again, as a NEW version (append-only
        history; see ``store.Catalog.restore_version``)."""
        return self._swap_root(self._load_root(version))

    def prune_roots(self, min_version: int) -> int:
        cur = self._con.execute(
            "SELECT count(*) FROM repo_root WHERE version < ?",
            (min_version,)).fetchone()[0]
        self._con.execute("DELETE FROM repo_root WHERE version < ?",
                          (min_version,))
        self._con.commit()
        return cur
