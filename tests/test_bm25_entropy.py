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
from tests.conftest import SF_DIR, write_docs


@pytest.fixture(scope="module")
def bm25_dir(tmp_path_factory):
    return write_docs(
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
    return write_docs(
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
    d = write_docs(tmp_path_factory, "typos", texts)

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


def test_stupid_backoff_closed_form(spark, tmp_path_factory):
    """All three backoff levels checked against a from-scratch Python
    reference, including a train-OOV word (unigram floor)."""
    import hashlib
    import math

    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        SB_ALPHA,
        SB_OOV,
        stupid_backoff,
    )

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 100

    train_ids = [i for i in range(200) if bucket(i) < 80]
    held_ids = [i for i in range(200) if bucket(i) >= 80]
    # train corpus: repeated 'a b c' plus 'b d' so trigram/bigram/unigram
    # tables are all non-trivial; held doc exercises every level:
    #   (a b c)   -> trigram hit
    #   (b c d)   -> unseen trigram, seen bigram (c d? no) ...
    held_text = "a b c d zzz a b"
    texts_by_id = {train_ids[0]: "a b c a b c a b c", train_ids[1]: "c d c d"}
    texts_by_id[held_ids[0]] = held_text
    ids = sorted(texts_by_id)
    d = tmp_path_factory.mktemp("sbo")
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(ids, dtype="int64"),
            "text": [texts_by_id[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["s1"] * len(ids),
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(d / "documents.parquet"),
    )

    # python reference over the train side
    train_toks = [
        texts_by_id[i].split(" ") for i in ids if bucket(i) < 80
    ]
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    tri: dict[tuple, int] = {}
    for t in train_toks:
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(t, t[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
        for x, y, z in zip(t, t[1:], t[2:]):
            tri[(x, y, z)] = tri.get((x, y, z), 0) + 1
    n_train = sum(uni.values())

    def score(w1, w2, w3):
        if (w1, w2, w3) in tri:
            return tri[(w1, w2, w3)] / bi[(w1, w2)], 0
        if (w2, w3) in bi:
            return SB_ALPHA * bi[(w2, w3)] / uni[w2], 1
        return SB_ALPHA * SB_ALPHA * uni.get(w3, SB_OOV) / n_train, 2

    ht = held_text.split(" ")
    contribs = [score(x, y, z) for x, y, z in zip(ht, ht[1:], ht[2:])]
    levels = [lvl for _, lvl in contribs]
    assert set(levels) == {0, 1, 2}  # all three paths exercised ('zzz' OOV)
    acc = 0.0
    for s, _ in contribs:
        acc += math.log10(s)
    want = round(acc / len(contribs), 6)

    out = stupid_backoff(spark, str(d)).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row.doc_id == held_ids[0]
    assert row.n_trigrams == len(contribs)
    assert row.n_tri_hits == levels.count(0)
    assert row.n_bi_backoffs == levels.count(1)
    assert row.n_uni_backoffs == levels.count(2)
    assert row.avg_log10_score == pytest.approx(want, abs=1e-9)


def test_dq_checks_all_pass_on_clean_data(spark):
    from bigdataanalytics_textsummarization_spark.relational_ext import dq_checks

    out = dq_checks(spark, SF_DIR).toPandas()
    assert len(out) == 8
    assert out.ok.all() and (out.violations == 0).all()


def test_dq_checks_counts_planted_violations(spark, tmp_path_factory):
    import os

    from bigdataanalytics_textsummarization_spark.relational_ext import dq_checks

    d = tmp_path_factory.mktemp("dq")
    # documents with a duplicate doc_id and a wrong n_chars
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([1, 1, 2], dtype="int64"),
            "text": ["aa", "bb", "cc"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": pd.array([2, 2, 99], dtype="int64"),  # 99 is wrong
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(d / "documents.parquet"),
    )
    for t in ("orders", "lineitem", "events", "customer"):
        os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    out = (
        dq_checks(spark, str(d)).toPandas().set_index("check_name")
    )
    assert out.loc["documents.doc_id is unique", "violations"] == 1
    assert not out.loc["documents.doc_id is unique", "ok"]
    assert (
        out.loc["documents.n_chars equals length(text)", "violations"] == 1
    )
    # untouched tables still pass
    assert out.loc["orders.o_custkey references customer", "ok"]


def test_vocab_kl_drift_zero_for_identical_distributions(spark, tmp_path_factory):
    import hashlib

    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        vocab_kl_drift,
    )

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 100

    # same text everywhere -> train and held word distributions identical
    ids = list(range(60))
    assert any(bucket(i) < 80 for i in ids) and any(bucket(i) >= 80 for i in ids)
    d = write_docs(tmp_path_factory, "kl0", ["alpha beta beta gamma"] * len(ids))
    out = vocab_kl_drift(spark, d).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row.v == 3
    # smoothing keeps p != q only via the totals; with identical
    # proportions and equal-shape smoothing the divergence stays tiny
    assert abs(row.kl_bits) < 1e-4 and 0 <= row.js_bits < 1e-4


def test_vocab_kl_drift_bounds_on_real_data(spark):
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        vocab_kl_drift,
    )

    row = vocab_kl_drift(spark, SF_DIR).toPandas().iloc[0]
    assert row.kl_bits >= 0
    assert 0 <= row.js_bits <= 1  # JS with log2 is bounded by 1 bit


def test_tfidf_doc_topk_closed_form(spark, tmp_path_factory):
    """Sparse TF-IDF cosine against a from-scratch Python reference on a
    corpus where the nearest neighbor is decided by a shared RARE term
    (common terms carry idf -> 0 and must not dominate)."""
    import math

    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        tfidf_doc_topk,
    )

    texts = [
        "common common zebra quartz",  # 0: shares rare zebra+quartz with 1
        "common zebra quartz",         # 1
        "common common common apple",  # 2: shares only 'common' (idf>0 here)
        "apple banana cherry",         # 3
    ]
    d = write_docs(tmp_path_factory, "tfidf_sim", texts)
    out = tfidf_doc_topk(spark, d).toPandas()

    # python reference
    toks = [t.split() for t in texts]
    n = len(texts)
    df = {}
    for t in toks:
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    def vec(t):
        return {
            w: t.count(w) * math.log10(n / df[w])
            for w in set(t)
            if t.count(w) * math.log10(n / df[w]) > 0
        }
    vecs = [vec(t) for t in toks]
    def cos(a, b):
        shared = sorted(set(a) & set(b))
        if not shared:
            return None
        dot = 0.0
        for w in shared:
            dot += a[w] * b[w]
        na = math.sqrt(sum(v * v for v in sorted_vals(a)))
        nb = math.sqrt(sum(v * v for v in sorted_vals(b)))
        return dot / (na * nb)
    def sorted_vals(a):
        return [a[w] for w in sorted(a)]

    for qid in range(4):
        expect = sorted(
            (
                (cid, cos(vecs[qid], vecs[cid]))
                for cid in range(4)
                if cid != qid and cos(vecs[qid], vecs[cid]) is not None
            ),
            key=lambda x: (-x[1], x[0]),
        )
        got = out[out.query_doc == qid].sort_values("rk")
        assert list(got.similar_doc) == [c for c, _ in expect[:3]]
        for (_, want_sim), (_, row) in zip(expect, got.iterrows()):
            assert row.cosine == pytest.approx(round(want_sim, 6), abs=2e-6)
    # the rare-term pair ranks first for both of its members
    assert out[out.query_doc == 0].iloc[0].similar_doc == 1
    assert out[out.query_doc == 1].iloc[0].similar_doc == 0


def test_dq_checks_zero_not_null_on_empty_table(spark, tmp_path_factory):
    """A conditional SUM over an empty table is NULL in Spark; the gate
    must still report 0 violations / ok=true (empty landing zone)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdataanalytics_textsummarization_spark.relational_ext import dq_checks

    d = tmp_path_factory.mktemp("dq_empty")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(schema.empty_table(), str(d / "events.parquet"))
    for t in ("documents", "orders", "lineitem", "customer"):
        os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    out = dq_checks(spark, str(d)).toPandas().set_index("check_name")
    for name in ("events.ts is not null", "events.value is non-negative"):
        assert out.loc[name, "violations"] == 0
        assert out.loc[name, "ok"] == True  # noqa: E712 — NULL would fail


def test_bpe_encode_emits_zero_row_for_wordless_doc(spark, tmp_path_factory):
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        bpe_encode,
    )

    d = write_docs(tmp_path_factory, "bpe_zero", ["hello world", "123 456 !!"])
    out = bpe_encode(spark, d).toPandas().set_index("doc_id").sort_index()
    assert len(out) == 2  # the wordless doc does NOT vanish
    assert out.loc[1, "words"] == 0
    assert out.loc[1, "bpe_tokens"] == 0
    assert out.loc[1, "alpha_chars"] == 0
    assert out.loc[0, "words"] == 2
