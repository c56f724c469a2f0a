"""MLlib feature-pipeline variants vs the engine's native (oracle-checked)
paths: values differ by documented design (smoothed ln IDF, internal hash
family), so correctness is pinned by rank overlap and recall invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataanalytics_textsummarization_spark import mllib_variants as mv
from bigdataanalytics_textsummarization_spark.extensions.dedup import (
    dedup_ngram_jaccard,
)
from tests.conftest import SF_DIR


def test_mllib_tfidf_topk_shape_and_overlap(spark):
    got = mv.tfidf_topk_mllib(spark, SF_DIR).toPandas()
    # shape contract: rk = 1..3 per doc, scores non-increasing
    for _, grp in got.groupby("doc_id"):
        grp = grp.sort_values("rk")
        assert list(grp["rk"]) == list(range(1, len(grp) + 1))
        assert (grp["score"].diff().dropna() <= 1e-12).all()
    # both IDFs are monotone-decreasing in df, so per-doc top-3 SETS should
    # broadly agree with the native log10 path even though scores differ.
    # (The native path also tokenizes per sentence with a min-length filter,
    # so this is a sanity bound, not equality.)
    from bigdataanalytics_textsummarization_spark.text import top_keywords

    native = top_keywords(spark, SF_DIR).toPandas()
    g = got.groupby("doc_id")["word"].apply(set)
    n = native.groupby("doc_id")["word"].apply(set)
    common_docs = g.index.intersection(n.index)
    assert len(common_docs) > 0
    overlap = sum(len(g[d] & n[d]) > 0 for d in common_docs) / len(common_docs)
    assert overlap >= 0.5, f"top-3 keyword overlap only {overlap:.2f}"


def test_mllib_minhash_recall_against_exact_jaccard(spark):
    got = mv.minhash_lsh_mllib(spark, SF_DIR).toPandas()
    exact = dedup_ngram_jaccard(spark, SF_DIR).toPandas()
    # every clearly-near-dup pair (exact jaccard >= 0.5) must be recalled by
    # the 8-table LSH at distance threshold 0.8 (probability of missing a
    # 0.5-jaccard pair with 8 independent single-hash tables is (1-0.5)^8)
    strong = exact[exact["jaccard"] >= 0.5]
    found = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])}
    if len(strong):
        recalled = sum(
            (a, b) in found for a, b in zip(strong["doc_a"], strong["doc_b"])
        )
        assert recalled / len(strong) >= 0.8
    # and reported similarities must be exact Jaccard (MLlib computes the
    # true distance on the candidate pairs, not the estimate)
    merged = got.merge(exact, on=["doc_a", "doc_b"], suffixes=("_lsh", "_ex"))
    if len(merged):
        assert (merged["jaccard_lsh"] - merged["jaccard_ex"]).abs().max() < 1e-6
