"""Semantic pins for the chunking / BPE / Bloom / quantization operators,
independent of the DuckDB oracles (tests/test_oracle_parity.py exercises
those): hand-built fixtures where the expected values are derivable by eye,
plus a from-scratch Python BPE reference for the merge sequence."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdataanalytics_textsummarization_spark.extensions.similarity import (
    SQ_LEVELS,
    ann_cosine_topk,
    ann_sq_topk,
    embedding_quantize,
)
from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
    BPE_MERGES,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    bpe_encode,
    bpe_vocab,
    doc_chunks,
)
from bigdataanalytics_textsummarization_spark.relational_ext import (
    bloom_semijoin,
)
from tests.conftest import SF_DIR, write_docs


# ---------------------------------------------------------------------------
# doc_chunks
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    long_doc = " ".join(f"t{i}" for i in range(150))  # 150 tokens -> 3 chunks
    short_doc = "a b c"  # 3 tokens -> 1 chunk
    exact_doc = " ".join(f"x{i}" for i in range(CHUNK_TOKENS))  # boundary
    return write_docs(tmp_path_factory, "chunks", [long_doc, short_doc, exact_doc])


def test_doc_chunks_starts_and_tail(spark, chunk_dir):
    out = (
        doc_chunks(spark, chunk_dir)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    # ceil((150-64)/48)+1 = 3 chunks at starts 0, 48, 96
    assert list(d0.start_tok) == [0, 48, 96]
    assert list(d0.chunk_tokens) == [64, 64, 54]
    # short doc and exactly-CHUNK_TOKENS doc each produce one whole chunk
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.iloc[0].chunk_text == "a b c"
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and int(d2.iloc[0].chunk_tokens) == CHUNK_TOKENS


def test_doc_chunks_reconstruct_document(spark, chunk_dir):
    """Taking the first CHUNK_STRIDE tokens of every chunk (all of the
    last) rebuilds the document exactly — no token lost or duplicated."""
    out = (
        doc_chunks(spark, chunk_dir)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    for doc_id, grp in out.groupby("doc_id"):
        rebuilt: list[str] = []
        chunks = list(grp.itertuples())
        for i, row in enumerate(chunks):
            toks = row.chunk_text.split(" ")
            rebuilt.extend(toks if i == len(chunks) - 1 else toks[:CHUNK_STRIDE])
        n = 150 if doc_id == 0 else (3 if doc_id == 1 else CHUNK_TOKENS)
        assert len(rebuilt) == n
        # interior chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens
        for prev, cur in zip(chunks, chunks[1:]):
            p, c = prev.chunk_text.split(" "), cur.chunk_text.split(" ")
            assert p[CHUNK_STRIDE:] == c[: CHUNK_TOKENS - CHUNK_STRIDE]


# ---------------------------------------------------------------------------
# bpe_vocab
# ---------------------------------------------------------------------------


def _reference_bpe(word_counts: dict[str, int], k: int):
    """Plain-Python Sennrich-style BPE: count adjacent symbol pairs over
    the (word, count) table, merge the argmax (count desc, then pair
    lexicographic), repeat."""
    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


# the classic BPE toy corpus (low/lower/newest/widest), as documents
_BPE_TEXTS = [
    "low low low low low lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


@pytest.fixture(scope="module")
def bpe_corpus_dir(tmp_path_factory):
    return write_docs(tmp_path_factory, "bpe", _BPE_TEXTS)


def test_bpe_vocab_matches_python_reference(spark, bpe_corpus_dir):
    counts: dict[str, int] = {}
    for t in _BPE_TEXTS:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    expected = _reference_bpe(counts, BPE_MERGES)
    got = (
        bpe_vocab(spark, bpe_corpus_dir)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert [
        (r["left"], r["right"], int(r.pair_count)) for _, r in got.iterrows()
    ] == expected
    assert list(got["rank"]) == list(range(1, len(expected) + 1))


def test_bpe_encode_consistent_with_learned_merges(spark, bpe_corpus_dir):
    """Applying the learned merges in plain Python to every word must give
    exactly the per-document subword totals bpe_encode reports."""
    counts: dict[str, int] = {}
    for t in _BPE_TEXTS:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    merges = [(a, b) for a, b, _ in _reference_bpe(counts, BPE_MERGES)]

    def encode_len(word: str) -> int:
        syms = list(word) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = bpe_encode(spark, bpe_corpus_dir).toPandas().set_index("doc_id")
    for doc_id, text in enumerate(_BPE_TEXTS):
        words = text.split()
        assert got.loc[doc_id, "words"] == len(words)
        assert got.loc[doc_id, "bpe_tokens"] == sum(
            encode_len(w) for w in words
        )
        assert got.loc[doc_id, "alpha_chars"] == sum(len(w) for w in words)
    # the merged vocabulary must compress vs character-level tokens
    char_level = sum(len(w) + 1 for t in _BPE_TEXTS for w in t.split())
    assert got.bpe_tokens.sum() < char_level


def test_bpe_encode_vocab_broadcast_size_dispatch(spark, bpe_corpus_dir):
    """r18 (VERDICT r17 task 4): the distinct-word vocab map broadcasts
    only under the input-size gate — Heaps'-law vocabulary is unbounded
    at 100 TB, so past the gate the join must fall back to a plain
    shuffle join.  Pins BOTH dispatch branches (the broadcast hint is
    present iff the gate passes; the optimizer may still auto-broadcast
    the tiny fixture, so the hint in the analyzed plan is the dispatch
    evidence) and that the branch choice never changes values."""
    key = "spark.graft.bpe.broadcastVocabMaxInputBytes"

    def analyzed(df):
        return df._jdf.queryExecution().analyzed().toString()

    # default gate (1 GiB): the tiny fixture is under it -> hinted
    df_b = bpe_encode(spark, bpe_corpus_dir)
    assert "ResolvedHint" in analyzed(df_b)
    got_b = df_b.toPandas().sort_values("doc_id").reset_index(drop=True)

    # gate forced to 0 bytes: nothing fits -> no hint, shuffle join
    spark.conf.set(key, "0")
    try:
        df_s = bpe_encode(spark, bpe_corpus_dir)
        assert "ResolvedHint" not in analyzed(df_s)
        got_s = df_s.toPandas().sort_values("doc_id").reset_index(drop=True)
    finally:
        spark.conf.unset(key)

    pd.testing.assert_frame_equal(got_b, got_s)


# ---------------------------------------------------------------------------
# bloom_semijoin
# ---------------------------------------------------------------------------


def test_bloom_semijoin_no_false_negatives(spark):
    out = bloom_semijoin(spark, SF_DIR).toPandas()
    # Bloom filters never miss a true member: actual => bloom_pass, always.
    assert not ((out.actual) & (~out.bloom_pass)).any()
    # false_pos is exactly the bloom-positive non-members
    assert (out.false_pos == (out.bloom_pass & ~out.actual)).all()
    # the filter actually prunes: non-members overwhelmingly rejected
    nonmember = out[~out.actual]
    if len(nonmember):
        assert nonmember.bloom_pass.mean() < 0.5


# ---------------------------------------------------------------------------
# embedding_quantize
# ---------------------------------------------------------------------------


def test_sq_search_mostly_agrees_with_exact(spark):
    """ADC over uint8 codes must track exact search closely: for each
    query, the top-k sets overlap strongly and cosines differ by at most
    the quantization error scale."""
    exact = ann_cosine_topk(spark, SF_DIR).toPandas()
    sq = ann_sq_topk(spark, SF_DIR).toPandas()
    overlaps = []
    for qid, e_grp in exact.groupby("query_id"):
        s_grp = sq[sq.query_id == qid]
        overlaps.append(
            len(set(e_grp.neighbor_id) & set(s_grp.neighbor_id))
            / len(e_grp)
        )
    assert sum(overlaps) / len(overlaps) >= 0.8
    # scores of the agreed neighbors shift by less than ~1% cosine
    merged = exact.merge(
        sq, on=["query_id", "neighbor_id"], suffixes=("_ex", "_sq")
    )
    assert (merged.cosine_ex - merged.cosine_sq).abs().max() < 0.01


def test_embedding_quantize_codes_and_error_bound(spark):
    out = embedding_quantize(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    dims = len(emb.embedding.iloc[0])
    mat = pd.DataFrame(emb.embedding.tolist(), dtype="float64")
    half_cell = ((mat.max() - mat.min()) / (SQ_LEVELS + 1) / 2).max()
    assert len(out) == len(emb)
    codes = out.code_sig.str.split(",")
    assert (codes.str.len() == dims).all()
    flat = pd.to_numeric(codes.explode())
    assert flat.between(0, SQ_LEVELS).all()
    # midpoint decode bounds the reconstruction error by half a cell
    assert (out.max_abs_err <= half_cell + 1e-9).all()


def test_knn_accuracy_perfect_on_separable_clusters(spark, tmp_path_factory):
    """Three well-separated label clusters -> the kNN vote must recover
    every query's label with all neighbors in-cluster."""
    import numpy as np

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        N_QUERIES,
        TOP_K,
        knn_accuracy,
    )

    rng = np.random.RandomState(7)
    centers = np.eye(3)  # orthogonal cluster axes
    rows = []
    for vec_id in range(60):
        label = vec_id % 3
        v = centers[label] + rng.normal(0, 0.01, 3)
        rows.append((vec_id, [float(x) for x in v], label))
    d = tmp_path_factory.mktemp("knn")
    emb = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    emb["vec_id"] = emb["vec_id"].astype("int64")
    emb["label"] = emb["label"].astype("int32")
    pq.write_table(
        pa.Table.from_pandas(emb, preserve_index=False),
        str(d / "embeddings.parquet"),
    )
    out = knn_accuracy(spark, str(d)).toPandas()
    assert len(out) == N_QUERIES
    assert (out.n_neighbors == TOP_K).all()
    assert (out.n_same_label == TOP_K).all()
    assert out.correct.all()
    assert (out.pred_label == out.true_label).all()


def test_tokenizer_fertility_consistency(spark):
    """Fertility aggregates reconcile with the per-doc encode accounting,
    and every language's fertility is >= 1.0 (a word is at least one
    subword)."""
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        bpe_encode,
        tokenizer_fertility,
    )
    from bigdataanalytics_textsummarization_spark.io import load_table
    from tests.conftest import SF_DIR

    fert = tokenizer_fertility(spark, SF_DIR).toPandas()
    assert (fert["fertility_milli"] >= 1000).all()
    enc = bpe_encode(spark, SF_DIR).toPandas()
    langs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang")
        .toPandas()
    )
    merged = enc.merge(langs, on="doc_id")
    for r in fert.itertuples():
        grp = merged[merged["lang"] == r.lang]
        assert r.n_docs == len(grp)
        assert r.total_words == grp["words"].sum()
        assert r.total_subwords == grp["bpe_tokens"].sum()
        assert r.fertility_milli == (1000 * r.total_subwords) // r.total_words


def test_bpe_pieces_roundtrip_and_count_agree(spark):
    """_bpe_apply_pieces partitions the word exactly and _bpe_apply is
    its length; the driver facts query certifies the corpus-wide form."""
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        _bpe_apply,
        _bpe_apply_pieces,
        bpe_roundtrip,
    )

    merges = [("t", "h"), ("th", "e"), ("i", "n</w>")]
    for w in ["the", "thin", "in", "a", "theater"]:
        pieces = _bpe_apply_pieces(w, merges)
        assert "".join(pieces) == w + "</w>"
        assert _bpe_apply(w, merges) == len(pieces)
    row = bpe_roundtrip(spark, SF_DIR).collect()[0]
    assert row["all_roundtrip"] is True and row["n_vocab_words"] > 0
