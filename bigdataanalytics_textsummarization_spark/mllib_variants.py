"""MLlib feature-pipeline variants of the engine's native operators.

The engine's primary paths use explicit column formulas so a DuckDB oracle
can value-check every number (log10 IDF parity with the reference,
cross-engine md5 MinHash).  MLlib ships the same shapes as fitted
Transformers — worth having because (a) they interop with the wider ML
Pipeline ecosystem (model persistence, CrossValidator), and (b) they are
the drop-in scale path when exact reference parity is NOT the requirement.
Semantics differ deliberately and are documented here:

- ``IDF``: MLlib computes ``ln((N+1)/(df+1))`` (smoothed, natural log) vs
  the reference's unsmoothed ``log10(N/df)`` (BigdataProjectCode.py:87) —
  same ORDERING of terms within a document (both are monotone decreasing
  in df), different values.  So top-k keyword SETS largely agree while
  scores don't; the test asserts rank-set overlap, not values.
- ``MinHashLSH``: Spark's hash family and banding are internal (seeded,
  JVM-specific) — candidate sets are a superset-approximation with
  per-pair Jaccard DISTANCE exposed; the test asserts recall against the
  exact shingle-Jaccard ground truth (``dedup_ngram_jaccard``).

Both are registered as rows-only queries (their values are not
SQL-replicable by design; the invariant tests in tests/test_mllib.py are
their correctness story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import STOPWORDS
from .io import load_table

TOP_K = 3
LSH_TABLES = 8
LSH_SEED = 20240101
MAX_JACCARD_DISTANCE = 0.8  # jaccard similarity >= 0.2, the dedup threshold


def tfidf_topk_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keywords via the MLlib feature pipeline.

    RegexTokenizer -> StopWordsRemover (NLTK list, for parity with the
    native tokenizer) -> CountVectorizer -> IDF, then the SparseVector is
    re-relationalized (vector_to_array + posexplode) so top-k selection is
    the same window query the native path uses.  Fitted stages (the
    CountVectorizer vocabulary, the IDF weights) are broadcast to
    executors by MLlib — at 100 TB the fit is two distributed passes.
    """
    from pyspark.ml.feature import (
        CountVectorizer,
        IDF,
        RegexTokenizer,
        StopWordsRemover,
    )
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    tok = RegexTokenizer(
        inputCol="text", outputCol="raw_tokens", pattern="[a-z]+", gaps=False
    )
    stop = StopWordsRemover(
        inputCol="raw_tokens", outputCol="tokens", stopWords=list(STOPWORDS)
    )
    toks = stop.transform(tok.transform(docs)).select("doc_id", "tokens")
    cv = CountVectorizer(inputCol="tokens", outputCol="tf").fit(toks)
    tf = cv.transform(toks)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    scored = idf.transform(tf)
    vocab = spark.createDataFrame(
        [(i, w) for i, w in enumerate(cv.vocabulary)], ["term_ix", "word"]
    )
    long = (
        scored.select(
            "doc_id", F.posexplode(vector_to_array("tfidf")).alias("term_ix", "score")
        )
        .filter(F.col("score") > 0)
        .join(F.broadcast(vocab), "term_ix")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        long.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("doc_id", "rk", "word", F.round("score", 6).alias("score"))
    )


def minhash_lsh_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MLlib's MinHashLSH approxSimilarityJoin.

    Shingle sets -> binary CountVectorizer -> MinHashLSH(numHashTables=8,
    fixed seed) -> self-join under Jaccard distance 0.8.  The native
    banded-md5 path (extensions.dedup) remains the oracle-checkable
    production route; this variant is the MLlib-ecosystem formulation and
    its recall is pinned against exact shingle Jaccard in tests.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ", -1)
    sh = (
        docs.filter(F.size(arr) >= 3)
        .select("doc_id", arr.alias("w"))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - F.lit(2)),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("w", i),
                        F.element_at("w", i + 1),
                        F.element_at("w", i + 2),
                    ),
                )
            ).alias("grams"),
        )
    )
    cv = CountVectorizer(inputCol="grams", outputCol="features", binary=True).fit(sh)
    feat = cv.transform(sh).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=LSH_TABLES,
        seed=LSH_SEED,
    ).fit(feat)
    pairs = lsh.approxSimilarityJoin(
        feat, feat, MAX_JACCARD_DISTANCE, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


ORACLES: dict[str, str] = {}  # rows-only by design (see module docstring)

QUERIES = {
    "tfidf_topk_mllib": tfidf_topk_mllib,
    "minhash_lsh_mllib": minhash_lsh_mllib,
}
