"""Property-based tests (hypothesis) for the pure-Python kernels that back
pandas UDFs — LCS, Porter, and the lemmatizer's Spark/SQL agreement."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataanalytics_textsummarization_spark.functions import lemma_sql
from bigdataanalytics_textsummarization_spark.porter import stem
from bigdataanalytics_textsummarization_spark.rouge import _lcs_len

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=12)
token_lists = st.lists(
    st.sampled_from(["a", "b", "c", "dog", "cat", "runs"]), max_size=12
)


def _lcs_naive(a: list[str], b: list[str]) -> int:
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def go(i: int, j: int) -> int:
        if i == len(a) or j == len(b):
            return 0
        if a[i] == b[j]:
            return 1 + go(i + 1, j + 1)
        return max(go(i + 1, j), go(i, j + 1))

    return go(0, 0)


@settings(max_examples=200, deadline=None)
@given(token_lists, token_lists)
def test_lcs_matches_naive(a, b):
    assert _lcs_len(a, b) == _lcs_naive(a, b)


@settings(max_examples=200, deadline=None)
@given(token_lists, token_lists)
def test_lcs_bounds_and_symmetry(a, b):
    l = _lcs_len(a, b)
    assert 0 <= l <= min(len(a), len(b))
    assert l == _lcs_len(b, a)
    # common prefix is a lower bound
    p = 0
    for x, y in zip(a, b):
        if x != y:
            break
        p += 1
    assert l >= p


@settings(max_examples=500, deadline=None)
@given(words)
def test_porter_total_and_shrinking(w):
    s = stem(w)
    assert isinstance(s, str)
    assert len(s) <= max(len(w), 1)
    # stemming never introduces characters outside the input alphabet + 'i'
    # (step 1c rewrites y -> i)
    assert set(s) <= set(w) | {"i", "e"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=100, deadline=None)
@given(st.lists(words, min_size=1, max_size=20, unique=True))
def test_lemma_sql_replicates_python_semantics(ws):
    """The DuckDB CASE emitted by lemma_sql must equal a direct Python
    transliteration of lemma_light's rules (the cross-engine contract the
    oracle parity tests rely on)."""
    import re

    def lemma_py(w: str) -> str:
        if re.search(r"ies$", w) and len(w) > 4:
            return re.sub(r"ies$", "y", w)
        if re.search(r"sses$", w):
            return re.sub(r"sses$", "ss", w)
        if re.search(r"[^su]s$", w) and len(w) > 3:
            return re.sub(r"s$", "", w)
        return w

    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in ws)
    got = con.execute(
        f"SELECT {lemma_sql('w')} FROM (VALUES {vals}) t(w)"
    ).fetchall()
    con.close()
    assert [g[0] for g in got] == [lemma_py(w) for w in ws]


def test_dedup_clusters_are_closed_over_edges(spark):
    """Label propagation must converge: both endpoints of every qualifying
    near-dup pair share a cluster, and the cluster id is the component's
    minimum doc_id (so it is a member, and canonicals are stable)."""
    from pyspark.sql import functions as F

    from bigdataanalytics_textsummarization_spark.extensions.dedup import (
        CLUSTER_MIN_JACCARD,
        dedup_clusters,
        dedup_minhash_lsh,
    )
    from tests.conftest import SF_DIR

    clusters = dedup_clusters(spark, SF_DIR)
    pairs = dedup_minhash_lsh(spark, SF_DIR).filter(
        F.col("jaccard") >= CLUSTER_MIN_JACCARD
    )
    ca = clusters.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("cl_a")
    )
    cb = clusters.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cl_b")
    )
    violating = (
        pairs.join(ca, "doc_a").join(cb, "doc_b")
        .filter(F.col("cl_a") != F.col("cl_b"))
        .count()
    )
    assert violating == 0
    # cluster id is a member of its own cluster and its minimum
    mins = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("mn"))
    assert mins.filter(F.col("cluster_id") != F.col("mn")).count() == 0
