"""Sentence-similarity graph construction (SURVEY.md §2.3 J2, §2.6 T1, F9).

The reference builds the graph with a hand-rolled broadcast nested-loop
join: it ``collect()``s every vertex to the driver, ships the list inside a
closure, and computes similarity for all O(n²) pairs per file
(BigdataProjectCode.py:332-333, 339-347, 350-357).

Here the all-pairs similarity is reformulated as a *token equi-join*:
explode each sentence's distinct tokens, self-join on (source, word), and
count matches per sentence pair — only pairs that actually share a word are
ever materialized, the driver holds nothing, and the shuffle key
(source, word) scales horizontally.  Skewed hot words are handled by AQE
skew-join splitting; at extreme scale the candidate generation switches to
MinHash LSH (extensions/dedup.py) with identical downstream semantics.

Similarity (BigdataProjectCode.py:339-347):
    weight(v1, v2) = |distinct(tokens1) ∩ tokens2|
                     / (1 + log2(len(tokens1)) + log2(len(tokens2)))
where len() counts the full token list including duplicates, and
zero-weight / self pairs are dropped (P9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import r6
from .text import (
    SENTENCES_CTE,
    TOKENS_TR_CTE,
    TR_SENT_CTE,
    tokens_textrank,
)

EDGES_CTE = f"""
ntok AS (
  SELECT source, sentence_id, count(*) AS n
  FROM trtok GROUP BY source, sentence_id
),
dist AS (SELECT DISTINCT source, sentence_id, word FROM trtok),
pairs AS (
  SELECT a.source AS source, a.sentence_id AS src, b.sentence_id AS dst,
         count(*) AS isect
  FROM dist a
  JOIN dist b ON a.source = b.source AND a.word = b.word
             AND a.sentence_id <> b.sentence_id
  GROUP BY a.source, a.sentence_id, b.sentence_id
),
edges AS (
  SELECT p.source, p.src, p.dst, p.isect,
         p.isect / (1 + log2(ns.n) + log2(nd.n)) AS weight
  FROM pairs p
  JOIN ntok ns ON p.source = ns.source AND p.src = ns.sentence_id
  JOIN ntok nd ON p.source = nd.source AND p.dst = nd.sentence_id
)
"""

EDGES_PREAMBLE = (
    f"WITH {SENTENCES_CTE}, {TR_SENT_CTE}, {TOKENS_TR_CTE}, {EDGES_CTE}"
)


def edges_from(toks: DataFrame) -> DataFrame:
    """Unrounded edge table (source, src, dst, isect, weight) from any
    (source, sentence_id, word) token stream."""
    ntok = toks.groupBy("source", "sentence_id").agg(F.count("*").alias("n"))
    dist = toks.select("source", "sentence_id", "word").distinct()
    a, b = dist.alias("a"), dist.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.word") == F.col("b.word"))
            & (F.col("a.sentence_id") != F.col("b.sentence_id")),
        )
        .groupBy(
            F.col("a.source").alias("source"),
            F.col("a.sentence_id").alias("src"),
            F.col("b.sentence_id").alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("isect"))
    )
    ns = ntok.select(
        F.col("source").alias("source"),
        F.col("sentence_id").alias("src"),
        F.col("n").alias("n_src"),
    )
    nd = ntok.select(
        F.col("source").alias("source"),
        F.col("sentence_id").alias("dst"),
        F.col("n").alias("n_dst"),
    )
    return (
        pairs.join(ns, ["source", "src"])
        .join(nd, ["source", "dst"])
        .withColumn(
            "weight",
            F.col("isect")
            / (F.lit(1) + F.log2("n_src") + F.log2("n_dst")),
        )
        .select("source", "src", "dst", "isect", "weight")
    )


def edges_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge table over the synthetic documents corpus."""
    return edges_from(tokens_textrank(spark, sf_dir))


def similarity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public edge-table query (weights rounded per the parity contract)."""
    return edges_raw(spark, sf_dir).select(
        "source", "src", "dst", "isect", r6(F.col("weight")).alias("weight")
    )


ORACLES: dict[str, str] = {
    "similarity_edges": f"""
{EDGES_PREAMBLE}
SELECT source, src, dst, isect, round(weight, 6) AS weight FROM edges
""",
}

QUERIES = {
    "similarity_edges": similarity_edges,
}
