#!/usr/bin/env python
"""Ad-hoc construct/exec profiler for the text-diamond queries (r8 task 5).

Same timer shape as bench.py (construct = build the DataFrame, exec =
noop-sink write), warm median of N reps, release_pins() between queries
so pin accumulation does not contaminate later entries (the r7 scale-probe
lesson)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdataanalytics_textsummarization_spark.functions import release_pins  # noqa: E402
from bigdataanalytics_textsummarization_spark.session import get_session  # noqa: E402

NAMES = sys.argv[1:] or [
    "textrank_top5",
    "textrank_ranks",
    "similarity_edges",
    "top_keywords",
    "term_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_session(
        app="profile_construct",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()

    out = {}
    for name in NAMES:
        fn = queries[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        release_pins()
        runs, builds = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            runs.append(t2 - t0)
            release_pins()
        mid = sorted(range(reps), key=lambda i: runs[i])[reps // 2]
        out[name] = {
            "total": round(runs[mid], 3),
            "construct": round(builds[mid], 3),
            "exec": round(runs[mid] - builds[mid], 3),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
