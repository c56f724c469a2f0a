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
# fresh row.  Round-5 rotation: every query has had a green row in some
# round (r4 VERDICT), so the window now REFRESHES the oldest standing
# rows (r1/r2: text, graph, pagerank, relational, rouge, dedup) while
# recently-certified modules rotate to the back.
_MODULES = [
    text,  # r2 rows, never refreshed
    graph,  # r1 rows ("graph family" refresh per r4 VERDICT task 8)
    pagerank,  # r1 rows (textrank_*)
    relational,  # r1/r2 rows
    rouge,  # r2 rows
    dedup,  # r2 rows
    streaming_events,
    multimodal,
    curation,
    snapshot,
    mllib_variants,
    similarity,
    lsa,
    text_analysis,
    relational_ext,
    tpch,  # refreshed in r4 (was first in line)
]

# Individual queries that MUST land inside the driver's 50-query budget
# window this round, ahead of their module's position: new this round or
# changed-since-last-green (as now mechanically enforced by
# scripts/check_recert.py — it diffs each query's cross-module AST
# closure against the tree its last green artifact was committed on).
_PRIORITY = [
    # new this round: genuine PPM payload + real format-parsing decode
    "multimodal_decode",
    # new this round: train/eval n-gram decontamination gate + per-domain
    # admission caps (Common-Crawl per-host cap shape)
    "benchmark_decontam",
    "domain_caps",
    # new this round: covariance (SQL-gated) + PCA projection
    # (golden-gated) for the embedding store
    "embedding_cov",
    "embedding_pca",
    # new this round: IVF recall-vs-nprobe tuning curve (determinate facts:
    # monotone by theorem, exhaustive row identically brute force)
    "ann_recall_sweep",
    # new this round: per-language subwords-per-word under the learned BPE
    "tokenizer_fertility",
    # new this round: NN-Descent kNN graph (golden) + its recall gate
    "knn_graph_descent",
    "knn_graph_recall",
    # new this round: label-propagation communities (unrolled-CTE oracle)
    "graph_lpa",
    # new this round: row-level MERGE INTO (merge == target is the gate)
    "merge_upsert",
    # changed this round: size-dispatched LSA (applyInPandas vs MLlib SVD
    # routed per-source by matrix cells) — golden oracles unchanged
    "lsa_concepts",
    "lsa_summary",
    "lsa_concepts_distributed",
    # changed this round: quintile numerator now casts to long BEFORE the
    # multiply (ADVICE.md 32-bit wrap past ~429M customers)
    "rfm_segments",
    # changed in r4 AFTER their last green rows (recall-verdict coalesce
    # fix) — the drift the judge caught by hand and check_recert.py now
    # catches mechanically
    "ann_ivf_recall",
    "minhash_lsh_mllib_recall",
    # flagged by check_recert.py: closure drifted since their r1/r2 rows
    # (shared-helper changes in later rounds); re-certify
    "dedup_ngram_jaccard",
    "train_test_split",
    "similarity_edges",
    "textrank_ranks",
    "textrank_top5",
    "top_keywords",
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
