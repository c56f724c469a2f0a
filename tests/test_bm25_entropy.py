"""Semantic pins for BM25 retrieval and character entropy: closed-form
expectations on hand-built fixtures, computed independently in Python."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    bm25_search,
    char_entropy,
)


def _write_docs(tmp_path_factory, name: str, texts: list[str]) -> str:
    d = tmp_path_factory.mktemp(name)
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s1"] * len(texts),
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    return str(d)


@pytest.fixture(scope="module")
def bm25_dir(tmp_path_factory):
    return _write_docs(
        tmp_path_factory,
        "bm25",
        [
            "hash join hash join order",  # strong match for query 0
            "stream window agg window",  # strong match for query 1
            "the quick brown fox",  # matches nothing
            "join order order order",  # partial match for query 0
        ],
    )


def _ref_bm25(texts: list[str], query: str):
    """Independent BM25 implementation (same Lucene idf variant)."""
    toks = [t.split(" ") for t in texts]
    n = len(texts)
    avgdl = sum(len(t) for t in toks) / n
    scores = {}
    for term in query.split(" "):
        df = sum(1 for t in toks if term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for doc_id, t in enumerate(toks):
            tf = t.count(term)
            if tf == 0:
                continue
            dl = len(t)
            c = idf * (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + c
    return scores


def test_bm25_matches_closed_form(spark, bm25_dir):
    texts = pd.read_parquet(f"{bm25_dir}/documents.parquet").text.tolist()
    out = bm25_search(spark, bm25_dir).toPandas()
    q0 = out[out.query_id == 0].set_index("doc_id")
    expected = _ref_bm25(texts, dict(BM25_QUERIES)[0])
    assert set(q0.index) == set(expected)
    for doc_id, score in expected.items():
        assert q0.loc[doc_id, "score"] == pytest.approx(score, abs=2e-6)
    # ranking: doc 0 (2x hash, 2x join, 1x order) beats doc 3 (1 join, 3 order)
    assert q0.loc[0, "rk"] < q0.loc[3, "rk"]
    # query 2 ("fast vector scan") hits nothing in this fixture
    assert (out.query_id == 2).sum() == 0


def test_bm25_rank_is_dense_per_query(spark, bm25_dir):
    out = bm25_search(spark, bm25_dir).toPandas()
    for _, grp in out.groupby("query_id"):
        assert sorted(grp.rk) == list(range(1, len(grp) + 1))
        assert list(grp.sort_values("rk").score.values) == sorted(
            grp.score.values, reverse=True
        )


@pytest.fixture(scope="module")
def entropy_dir(tmp_path_factory):
    return _write_docs(
        tmp_path_factory,
        "entropy",
        ["aaaa", "abab", "abcd", ""],
    )


def test_char_entropy_closed_form(spark, entropy_dir):
    out = (
        char_entropy(spark, entropy_dir).toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "entropy_bits"] == 0.0  # single symbol
    assert out.loc[1, "entropy_bits"] == pytest.approx(1.0)  # two, uniform
    assert out.loc[2, "entropy_bits"] == pytest.approx(2.0)  # four, uniform
    assert out.loc[3, "entropy_bits"] == 0.0  # empty doc: defined as 0
    assert out.loc[3, "distinct_chars"] == 0 and out.loc[3, "n_chars"] == 0
    assert list(out.distinct_chars[:3]) == [1, 2, 4]


def test_typo_pairs_complete_vs_bruteforce(spark, tmp_path_factory):
    """Deletion-neighborhood blocking must find EXACTLY the brute-force
    all-pairs Levenshtein <= 2 set (the SymSpell completeness invariant),
    covering insert ('scan'/'scans'), substitute ('merge'/'marge'), and
    transposition-as-two-edits ('spark'/'sprak')."""
    import itertools

    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        TYPO_MAX_DIST,
        typo_pairs,
    )

    texts = [
        "spark sprak scan scans merge marge",
        "window join filter totally unrelated words",
        "windows joins",
    ]
    d = _write_docs(tmp_path_factory, "typos", texts)

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    words = sorted({w for t in texts for w in t.split()})
    want = {
        (a, b)
        for a, b in itertools.combinations(words, 2)
        if lev(a, b) <= TYPO_MAX_DIST
    }
    out = typo_pairs(spark, d).toPandas()
    got = {(r.word_a, r.word_b) for _, r in out.iterrows()}
    assert got == want
    for _, r in out.iterrows():
        assert r.dist == lev(r.word_a, r.word_b) and 1 <= r.dist <= 2
