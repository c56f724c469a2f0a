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
    text_analysis,
)
from bigdataanalytics_textsummarization_spark.streaming import (  # noqa: E402
    events as streaming_events,
)

# Ordered so a budget-capped driver certifies the LLM-data-pipeline
# extensions (dedup/ANN/curation/text-analysis) and the summarization core
# before the TPC-H analogs that were already green in round 1.
_MODULES = [
    dedup,
    similarity,
    curation,
    text_analysis,
    rouge,
    lsa,
    multimodal,
    streaming_events,
    text,
    graph,
    pagerank,
    relational,
    relational_ext,
    tpch,
    mllib_variants,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-document top-3 TF-IDF keywords at sf0.001.

    Exercises the full relational core: parquet scan -> explode -> filters ->
    group-agg -> broadcast joins -> window top-k (SURVEY.md §7.1 step 1).
    """
    return text.top_keywords(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
