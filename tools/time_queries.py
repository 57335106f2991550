#!/usr/bin/env python
"""Time selected queries with bench.py's exact methodology (global
warmup + per-query sf0.001 warmup + min-of-2 at the target SF) without
running the full inventory — the round-15 measure/re-measure loop.

Usage: python tools/time_queries.py <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from messdb_spark.queries import QUERIES  # noqa: E402
from messdb_spark.session import get_spark  # noqa: E402

WARMUP = "/root/testdata/sf0.001"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    try:
        QUERIES["q6_forecast_revenue"].fn(spark, sf_dir).count()
        n_par = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark.range(0, 1000, 1, n_par).mapInPandas(
            lambda it: it, "id long").count()
    except Exception as e:  # noqa: BLE001
        print(f"# global warmup failed: {e}", file=sys.stderr)
    out = {}
    for name in names:
        try:
            QUERIES[name].fn(spark, WARMUP).count()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = QUERIES[name].fn(spark, sf_dir).count()
            best = min(best, round(time.perf_counter() - t0, 3))
        out[name] = best
        print(f"{name}: {best:.3f}s ({n} rows)")
    print({k: v for k, v in out.items()})


if __name__ == "__main__":
    main()
