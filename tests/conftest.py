from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from messdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # small local profile for fast test startup
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("messdb_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")


def pytest_sessionfinish(session, exitstatus):
    """Flush parity passes recorded by test_oracle_parity into
    tests/parity_ledger.json (see messdb_spark/parity.py)."""
    from messdb_spark.parity import flush_ledger

    flush_ledger()
