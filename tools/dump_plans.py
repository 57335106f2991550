#!/usr/bin/env python
"""Dump ``explain("formatted")`` for declared queries to
``plans/r15/<query>_<tag>.txt`` (the round-15 before/after plan
evidence). For engine-workflow queries whose returned frame is a
checkpoint scan (the real work happened in intermediate jobs), the
file still records the returned plan; the per-job decomposition for
those lives in OPTIMIZATION_r15.md via tools/profile_query.py.

Usage: python tools/dump_plans.py <tag> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from messdb_spark.queries import QUERIES
    from messdb_spark.session import get_spark

    spark = get_spark("plan_dump")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        # prefer the pre-pin plan when the query pinned its result —
        # pin_result/persist hides the real detection plan otherwise
        pre = getattr(df, "__pre_pin__", None)
        target = pre if pre is not None else df
        txt = target._sc._jvm.PythonSQLUtils.explainString(
            target._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({tag})\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
