"""Parity ledger — makes unverified query registration unrepresentable.

The local oracle-parity sweep (tests/test_oracle_parity.py) is the
safety net that catches a Spark body drifting from its DuckDB oracle
before the driver ever sees the query.  Round 6 shipped a query
(bootstrap_ci_segment_spend) whose body disagreed with its own oracle
because nothing *enforced* that the sweep had been run on the final
source.  This module closes that hole:

- every PASSING parity test records ``sha256(source ‖ oracle)`` for its
  query into ``tests/parity_ledger.json`` (buffered, flushed once at
  pytest session end);
- ``tests/test_parity_ledger.py`` fails for any registered query whose
  CURRENT content hash has no recorded pass — i.e. a brand-new query,
  or an edited query whose parity was not re-run.

So the red path is: edit/add a query → guard test red until
``pytest tests/test_oracle_parity.py -k <name>`` passes (which is
exactly the verification being enforced).  A mis-oracled query can
never turn the guard green because only *passes* record.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import threading

LEDGER_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "parity_ledger.json")

_pending: dict[str, str] = {}
_lock = threading.Lock()


def query_content_hash(name: str) -> str:
    """Content hash of a registered query: its decorated function
    source (inspect.getsource — includes the @query decorator text)
    plus the RESOLVED oracle string (f-string constants like resample
    counts or literal key tables are baked in, so editing them changes
    the hash even when the template text does not)."""
    from .queries import QUERIES

    q = QUERIES[name]
    src = inspect.getsource(q.fn)
    oracle = q.oracle if q.oracle is not None else "<rows-only>"
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\x00")
    h.update(oracle.encode())
    return h.hexdigest()


def load_ledger() -> dict[str, str]:
    try:
        with open(LEDGER_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def record_pass(name: str) -> None:
    """Buffer a parity pass for ``name`` at its current content hash."""
    with _lock:
        _pending[name] = query_content_hash(name)


def flush_ledger() -> None:
    """Merge buffered passes into the on-disk ledger (called once from
    conftest's pytest_sessionfinish)."""
    with _lock:
        if not _pending:
            return
        ledger = load_ledger()
        ledger.update(_pending)
        _pending.clear()
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")
