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

``tfidf_topk_mllib`` IS value-gated: the CountVectorizer vocabulary only
assigns indices, which cancel out when scores join back to words, and the
IDF weights are the closed formula above — so the whole pipeline compiles
to SQL (regexp tokenize -> stopword filter -> tf -> df -> ln-smoothed
score -> top-k window).  ``minhash_lsh_mllib`` stays rows-only: its hash
family is seeded over vocabulary INDICES, whose frequency-tie order is
partition-dependent — the candidate set is not replicable by design; the
invariant tests in tests/test_mllib.py are its correctness story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import STOPWORDS, STOPWORDS_SQL, r6, session_memo
from .io import load_table

TOP_K = 3
LSH_TABLES = 8
LSH_SEED = 20240101
MAX_JACCARD_DISTANCE = 0.8  # jaccard similarity >= 0.2, the dedup threshold


@session_memo
def tfidf_topk_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keywords via the MLlib feature pipeline.

    RegexTokenizer -> StopWordsRemover (NLTK list, for parity with the
    native tokenizer) -> CountVectorizer -> IDF, then the SparseVector is
    re-relationalized (vector_to_array + posexplode) so top-k selection is
    the same window query the native path uses.  Fitted stages (the
    CountVectorizer vocabulary, the IDF weights) are broadcast to
    executors by MLlib — at 100 TB the fit is two distributed passes.

    Session-memoized (r18, VERDICT r17 task 7): the two ``.fit()`` calls
    and the vocabulary ``createDataFrame`` (a driver round-trip over the
    fitted vocab) ran eagerly on EVERY build; the output is
    index-permutation-invariant (vocab indices cancel when scores join
    back to words — the value-gate argument above), so one build per
    session is value-identical.  Cleared by release_pins() with the
    other build memos; the cold first build is unchanged.
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
        .select("doc_id", "rk", "word", r6(F.col("score")).alias("score"))
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
            r6(1.0 - F.col("jaccard_dist")).alias("jaccard"),
        )
    )


LSH_RECALL_FLOOR = 0.8  # measured 1.0 at sf0.001/sf0.01 (truth pairs all J>=0.87)


def _trigram_shingles(docs: DataFrame) -> DataFrame:
    """The exact shingle derivation minhash_lsh_mllib feeds its LSH."""
    arr = F.split("text", " ", -1)
    return (
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


def minhash_lsh_mllib_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MLlib LSH candidate pairs against exact shingle
    Jaccard truth, as a driver-gateable determinate fact.

    ``minhash_lsh_mllib`` itself is rows-only (its hash family runs over
    CountVectorizer indices whose frequency-tie order is partition-
    dependent), so this companion closes the loop the same way
    ``ann_ivf_recall`` does for the IVF index: ONE row with the exact
    truth-pair count (fully SQL-derivable) and a recall >= floor boolean.
    The boolean is determinate despite the index nondeterminism because
    every truth pair in the fixture has J >= 0.87, where the per-pair
    miss probability of an 8-table OR-amplified MinHash is
    (1-J)^8 <= 1e-8.  Truth pairs must share a shingle, so the blocked
    equi-join is complete — same validator-scope trade as
    dedup_ngram_jaccard.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = _trigram_shingles(docs).select("doc_id", F.explode("grams").alias("g"))
    n = g.groupBy("doc_id").agg(F.count("*").alias("n"))
    cand = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("isect"))
    )
    truth = (
        cand.join(n.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(n.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(
            F.col("isect") / (F.col("na") + F.col("nb") - F.col("isect"))
            >= 1.0 - MAX_JACCARD_DISTANCE
        )
        .select("doc_a", "doc_b")
    )
    found = minhash_lsh_mllib(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    # coalesce: zero hits must read as recall 0.0 (concrete false), not a
    # NULL verdict from summing an all-NULL column
    return truth.join(found, ["doc_a", "doc_b"], "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth_pairs"),
        (
            F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1))
            >= LSH_RECALL_FLOOR
        ).alias("recall_ok"),
    )


# minhash_lsh_mllib is rows-only by design (see module docstring); the
# tfidf pipeline's values are the closed MLlib formulas, compiled to SQL.
# Score parity holds because ln() differences between engines are sub-ulp
# against round(..., 6), and rank ties only occur at exactly-equal
# (tf, df), where both sides break by word ASC.
ORACLES: dict[str, str] = {
    "tfidf_topk_mllib": f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                     t -> t NOT IN {STOPWORDS_SQL}) AS tokens
  FROM documents
),
n AS (SELECT cast(count(*) AS double) AS m FROM documents),
tf AS (
  SELECT doc_id, t AS word, cast(count(*) AS bigint) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS t FROM toks)
  GROUP BY doc_id, t
),
df AS (SELECT word, cast(count(*) AS bigint) AS df FROM tf GROUP BY word)
SELECT doc_id, rk, word, (round(score, 6) + 0.0) AS score
FROM (
  SELECT doc_id, word,
         tf * ln((m + 1.0) / (df + 1.0)) AS score,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY tf * ln((m + 1.0) / (df + 1.0)) DESC, word ASC
         ) AS rk
  FROM tf JOIN df USING (word) CROSS JOIN n
  WHERE tf * ln((m + 1.0) / (df + 1.0)) > 0
)
WHERE rk <= {TOP_K}
""",
    "minhash_lsh_mllib_recall": f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
tri AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM w)
),
n AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
  FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN n na ON na.doc_id = cand.doc_a
  JOIN n nb ON nb.doc_id = cand.doc_b
  WHERE isect * 1.0 / (na.n + nb.n - isect) >= {1.0 - MAX_JACCARD_DISTANCE}
)
SELECT cast(count(*) AS bigint) AS n_truth_pairs, true AS recall_ok FROM truth
""",
}

QUERIES = {
    "tfidf_topk_mllib": tfidf_topk_mllib,
    # minhash_lsh_mllib stays exported (tests + the recall companion call
    # it) but is NOT registered: a no-oracle registry entry burns one of
    # the driver's 50 budget slots to record err:"no_oracle" every round.
    # Its value gate IS minhash_lsh_mllib_recall.
    "minhash_lsh_mllib_recall": minhash_lsh_mllib_recall,
}
