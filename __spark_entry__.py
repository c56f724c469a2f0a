"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``bigdataanalytics_textsummarization_spark/``;
this module only aggregates their QUERIES/ORACLES registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataanalytics_textsummarization_spark import (  # noqa: E402
    graph,
    lsa,
    mllib_variants,
    pagerank,
    relational,
    relational_ext,
    tpch,
    rouge,
    text,
)
from bigdataanalytics_textsummarization_spark.extensions import (  # noqa: E402
    curation,
    dedup,
    multimodal,
    similarity,
    snapshot,
    text_analysis,
)
from bigdataanalytics_textsummarization_spark.streaming import (  # noqa: E402
    events as streaming_events,
)

# Ordered so a budget-capped driver reaches everything that still needs a
# fresh row: rounds 1+2 certified dedup/similarity/curation/text_analysis/
# rouge/streaming/text/graph/pagerank/relational, so those rotate to the
# back (their green rows stand, as r1's TPC-H rows stood through r2).
_MODULES = [
    tpch,  # q12 + q21 fixed since their r1 rows; rest refreshes r1 greens
    relational_ext,  # distinct_sketch gained a real oracle after its r1 row
    mllib_variants,  # never inside any round's budget window
    lsa,  # golden-parquet oracles new this round
    similarity,  # ann_ivf_recall new this round
    curation,  # curation_pipeline red in r2 (oracle HUGEINT, fixed)
    text_analysis,  # pack_sequences red in r2 (oracle HUGEINT, fixed)
    snapshot,  # new this round
    multimodal,
    rouge,
    streaming_events,
    dedup,
    text,
    graph,
    pagerank,
    relational,
]

# Individual queries that MUST land inside the driver's 50-query budget
# window this round, ahead of their module's position: never-certified
# (rounds 1-3 certified 133 other queries; their green rows stand),
# fixed-since-last-row, or new this round.
_PRIORITY = [
    # 18 queries staged at position 51+ last round (verified green by
    # scripts/driver_sim.py at sf0.01 in r3, per VERDICT.md) — first in
    # line for their first driver rows
    "stupid_backoff",
    "dq_checks",
    "vocab_kl_drift",
    "tfidf_doc_topk",
    "knn_accuracy",
    "incremental_agg",
    "zorder_stats",
    "dedup_containment",
    "graph_khop",
    "weighted_sample",
    "rfm_segments",
    "basket_lift",
    "ann_pq_recall",
    "contrastive_pairs",
    "centroid_eval",
    "key_skew_profile",
    "pmi_edges",
    "event_transitions",
    # new in round 4 (added below as they land)
    "ann_ivfpq_recall",
    "salted_join",
    "salted_heavy_agg",
    "multimodal_decode",
    # round-3 greens whose implementation changed this round (integer-div
    # parity fix per ADVICE.md) — re-certify
    "doc_chunks",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-document top-3 TF-IDF keywords at sf0.001.

    Exercises the full relational core: parquet scan -> explode -> filters ->
    group-agg -> broadcast joins -> window top-k (SURVEY.md §7.1 step 1).
    """
    return text.top_keywords(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {name: merged[name] for name in _PRIORITY if name in merged}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
