"""Catalog branching — git-like named lines of table history.

The reference's stated heritage is Noms ("borrowing ideas from Noms
and Nix", ``/root/reference/README.md:1-4``), and Noms IS the
git-for-data database: versioned, content-addressed, branch-and-merge.
The reference itself stops at one mutable root cell
(``messdb-repo/src/MessDB/Repo.hs:75-77``); this module completes the
Noms move on top of the engine's existing machinery — no new storage
concepts:

- a BRANCH is a name → (head, base) pair of catalog ROOT VERSIONS
  (the append-only ``roots/root-v{N}`` archive every swap already
  writes);
- CHECKOUT restores the branch head's root as a new version
  (``Catalog.restore_version`` — history stays linear/append-only,
  like a git checkout recorded as a commit);
- a POINTER MERGE (table changed on one side only) copies the catalog
  entry — zero data movement, because tables are immutable
  content-addressed objects shared by every root that references them;
- a 3-WAY MERGE (same table changed on both sides) resolves at KEY
  granularity: a key changed on one side takes that side's row; a key
  changed on both sides to the same value is no conflict; a key
  changed on both sides differently is a conflict — fail (default),
  or take ``theirs``/``ours``.

Scale: branch/checkout/pointer-merge are O(catalog) metadata ops that
never touch table bytes. The 3-way merge is one 3-frame key-hash
full-outer join (8-byte key + 8-byte xxhash row digests — row WIDTH
never shuffles) followed by two semi-joins against the winning sides;
unchanged tables cost nothing. That is the same untouched-work-is-free
dividend as the memo layer (``Trie.hs:346-348``), applied to history.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.core import KeyedTable
from .store import _atomic_write_json, _read_json


class MergeConflict(Exception):
    """Raised when a merge cannot resolve under the given policy."""


@dataclass(frozen=True)
class BranchInfo:
    head: int   # catalog root version this branch points at
    base: int   # fork point (root version when branched / last merged)


class BranchManager:
    """Branch name → (head, base) bookkeeping, stored next to the
    catalog root (``branches.json``). The active branch's head follows
    every catalog write (Engine hooks ``advance_active``).

    Crash safety (two files, atomic-rename each): Engine advances the
    head to the NEXT version BEFORE the root swap, so a durably
    committed root is never left behind a stale head. The inverse
    window — head written, root swap never happened — is healed on
    read: ``current_version`` (when wired) clamps a head pointing past
    the newest real root back down, so the phantom version is simply
    invisible."""

    def __init__(self, warehouse: str, current_version=None) -> None:
        self.path = os.path.join(warehouse, "branches.json")
        self._current_version = current_version

    def _load(self) -> dict:
        return _read_json(self.path, {"active": None, "branches": {}})

    def _save(self, state: dict) -> None:
        _atomic_write_json(self.path, state)

    def _mutate(self, fn):
        """Load-modify-save under an exclusive flock: branches.json is
        a flat state file (unlike the versioned catalog root, which
        serializes via the os.link version-claim CAS), so two
        processes creating/advancing DIFFERENT branches would
        otherwise lose one update (the same shape as the sqlite
        double-read window fixed in r8). Reads stay lock-free —
        atomic-rename writes mean every read is a consistent
        snapshot. The sqlite branch backend gets this from its own
        transaction instead."""
        import fcntl

        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path + ".lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            state = self._load()
            result = fn(state)
            self._save(state)
            return result

    def _clamp(self, v: int) -> int:
        if self._current_version is None:
            return v
        return min(v, self._current_version())

    def list(self) -> dict[str, BranchInfo]:
        s = self._load()
        return {n: BranchInfo(self._clamp(b["head"]), self._clamp(b["base"]))
                for n, b in s["branches"].items()}

    def get(self, name: str) -> BranchInfo:
        b = self._load()["branches"].get(name)
        if b is None:
            raise KeyError(f"no such branch: {name}")
        return BranchInfo(self._clamp(b["head"]), self._clamp(b["base"]))

    def active(self) -> str | None:
        return self._load()["active"]

    def create(self, name: str, version: int) -> None:
        def _do(s):
            if name in s["branches"]:
                raise ValueError(f"branch exists: {name}")
            s["branches"][name] = {"head": version, "base": version}
        self._mutate(_do)

    def set_active(self, name: str | None) -> None:
        def _do(s):
            s["active"] = name
        self._mutate(_do)

    def set_head(self, name: str, version: int) -> None:
        def _do(s):
            s["branches"][name]["head"] = version
        self._mutate(_do)

    def set_base(self, name: str, version: int) -> None:
        def _do(s):
            s["branches"][name]["base"] = version
        self._mutate(_do)

    def activate(self, name: str, version: int) -> None:
        """Set head AND active in ONE atomic write (checkout path —
        splitting them would open a window where the new branch is
        active with its pre-restore head)."""
        def _do(s):
            if name not in s["branches"]:
                raise KeyError(f"no such branch: {name}")
            s["branches"][name]["head"] = version
            s["active"] = name
        self._mutate(_do)

    def advance_active(self, version: int) -> None:
        def _do(s):
            a = s["active"]
            if a is not None and a in s["branches"]:
                s["branches"][a]["head"] = version
        self._mutate(_do)


def three_way_merge(base: KeyedTable | None, ours: KeyedTable,
                    theirs: KeyedTable, policy: str = "fail",
                    table_name: str = "?"
                    ) -> tuple[DataFrame, int, DataFrame]:
    """Key-granular 3-way merge; returns (merged rows, n_conflicts,
    pinned winner-key frame — the caller unpersists it after the
    merged rows are materialized).

    Classification per key (row digest = xxhash64 over the sorted
    column list, each column paired with its isNull flag — Spark's
    xxhash64 SKIPS null inputs, so without the flags ('x', NULL) and
    (NULL, 'x') would collide and a real edit could silently vanish):
      theirs-changed  = digest(theirs) ≠ digest(base)   [incl. add/del]
      ours-changed    = digest(ours)   ≠ digest(base)
      conflict        = both changed AND digest(theirs) ≠ digest(ours)
    Winner: theirs when theirs-changed and (ours unchanged, or both
    landed on the same row, or policy == "theirs"); ours otherwise.
    The winning side missing the key ⇒ the key is deleted.
    """
    if policy not in ("fail", "ours", "theirs"):
        raise ValueError(f"unknown merge policy: {policy}")
    keys = list(ours.key_cols)
    vcols = sorted(ours.df.columns)
    if sorted(theirs.df.columns) != vcols or \
            tuple(theirs.key_cols) != tuple(ours.key_cols):
        raise MergeConflict(
            f"{table_name}: schema/key mismatch between branches")
    if dict(ours.df.dtypes) != dict(theirs.df.dtypes):
        raise MergeConflict(
            f"{table_name}: column types diverged between branches")
    if base is not None and sorted(base.df.columns) != vcols:
        raise MergeConflict(
            f"{table_name}: schema evolved since the fork point; "
            f"re-create the branch from the current root")

    def kh(t: KeyedTable | None, alias: str) -> DataFrame | None:
        if t is None:
            return None
        hashed = [x for c in vcols
                  for x in (F.col(c), F.col(c).isNull())]
        return t.df.select(*keys, F.xxhash64(*hashed).alias(alias))

    j = kh(ours, "h_o")
    b = kh(base, "h_b")
    t = kh(theirs, "h_t")
    j = j.join(t, on=keys, how="full_outer")
    if b is not None:
        j = j.join(b, on=keys, how="full_outer")
    else:
        j = j.withColumn("h_b", F.lit(None).cast("long"))

    tc = ~F.col("h_t").eqNullSafe(F.col("h_b"))
    oc = ~F.col("h_o").eqNullSafe(F.col("h_b"))
    same = F.col("h_t").eqNullSafe(F.col("h_o"))
    conflict = tc & oc & ~same
    take_theirs = tc & (~oc | same | F.lit(policy == "theirs"))

    # one evaluation of the 3-frame join: winner flag + conflict flag
    # ride the same cached key frame (conflict count, conflict sample,
    # and both semi-join sides all read from it)
    wk = j.select(*keys, take_theirs.alias("w"),
                  conflict.alias("conf")).cache()
    n_conflicts = wk.filter(F.col("conf")).count()
    if n_conflicts and policy == "fail":
        sample = [tuple(r[k] for k in keys)
                  for r in wk.filter(F.col("conf")).select(*keys).head(5)]
        wk.unpersist()
        raise MergeConflict(
            f"{table_name}: {n_conflicts} key(s) changed differently on "
            f"both branches, e.g. {sample}; re-merge with "
            f"policy='theirs' or policy='ours'")

    t_keys = wk.filter(F.col("w")).select(*keys)
    o_keys = wk.filter(~F.col("w")).select(*keys)
    merged = (theirs.df.join(t_keys, on=keys, how="left_semi")
              .unionByName(ours.df.join(o_keys, on=keys, how="left_semi")))
    return merged, n_conflicts, wk
