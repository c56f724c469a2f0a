#!/usr/bin/env python
"""Optimization probe: bench-methodology timings + plan capture.

Usage:
    python scripts/opt_probe.py --suffix before [--reps 3] \
        [--plans-round r18] [query ...]

For each named query (default: bench.py's HEADLINE list) this runs the
EXACT bench.py methodology — one untimed warm-up rep, then ``reps`` timed
reps of construct+execute against the noop sink — and writes
``plans/<round>/<query>_<suffix>.txt`` with the ``explain("formatted")``
output, so before/after plan diffs are committed evidence (guide §1).
The plans subdirectory defaults to the current optimization round (r18);
pass ``--plans-round`` to write elsewhere.

Timings print as one JSON line per query plus a trailing total line; the
session is bench.py's (local[$SPARK_GRAFT_CPUS], shuffle partitions
max(cpus, 8), AQE on), so the numbers are comparable to BENCH_r*.json
rows measured on the same box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdataanalytics_textsummarization_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    suffix = "before"
    reps = 3
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    plans_round = "r18"
    if "--plans-round" in args:
        i = args.index("--plans-round")
        plans_round = args[i + 1]
        del args[i : i + 2]
    no_plans = "--no-plans" in args
    if no_plans:
        args.remove("--no-plans")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        app="opt-probe",
        cpus=cpus,
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names = args if args else list(__import__("bench").HEADLINE)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        plans_round,
    )
    os.makedirs(plans_dir, exist_ok=True)

    # bench.py's engine warmup
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()
    import pandas as _pd  # noqa: F401

    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.mode(
        "overwrite"
    ).format("noop").save()

    totals = 0.0
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(json.dumps({"query": name, "error": "not registered"}))
            continue
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        cold = time.perf_counter() - t0
        if not no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        runs, builds = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            runs.append(t2 - t0)
        order = sorted(range(len(runs)), key=lambda i: runs[i])
        mid = order[len(runs) // 2]
        rec = {
            "query": name,
            "warm": round(runs[mid], 3),
            "construct": round(builds[mid], 3),
            "cold": round(cold, 3),
            "spread": [round(min(runs), 3), round(max(runs), 3)],
        }
        totals += runs[mid]
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"total_warm": round(totals, 3), "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
