"""Semantic pins for the round-3 training-data operators, independent of
the DuckDB oracles (which tests/test_oracle_parity.py already exercises):
hand-built fixtures where the expected values are derivable by eye."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdataanalytics_textsummarization_spark.extensions.curation import (
    MIX_BUDGET,
    source_mixture,
)
from bigdataanalytics_textsummarization_spark.extensions.similarity import (
    embedding_near_dups,
    semantic_dedup_gate,
)
from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
    PPL_SMOOTH_K,
    SPAN_N,
    doc_perplexity,
    ppl_ingest,
    substring_dedup,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("llm_ops")
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2], dtype="int64"),
            "text": [
                shared + " india juliet",
                "kilo lima " + shared,
                "mike november oscar papa quebec romeo sierra tango uniform victor",
            ],
            "lang": ["en", "en", "en"],
            "source": ["s1", "s1", "s2"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), d / "documents.parquet"
    )
    return str(d)


def test_substring_dedup_span_coverage(spark, docs_dir):
    """Docs 0 and 1 share one exact 8-token span; doc 2 is unique."""
    rows = {
        r["doc_id"]: r.asDict()
        for r in substring_dedup(spark, docs_dir).collect()
    }
    # the shared 8-gram covers exactly its 8 positions in each carrier
    assert rows[0]["covered"] == SPAN_N and rows[0]["n_tokens"] == 10
    assert rows[1]["covered"] == SPAN_N and rows[1]["n_tokens"] == 10
    assert rows[2]["covered"] == 0 and rows[2]["dup_frac"] == 0.0
    assert rows[0]["dup_frac"] == round(SPAN_N / 10, 6)


def test_doc_perplexity_formula(spark, docs_dir):
    """Every bigram in the fixture corpus is unique, so for each doc bigram
    c12 = 1, c1 = 1 except the shared-span words (c1 = 2 for bigram starts
    appearing twice).  Cross-check doc 2 (fully unique, all c12=c1=1)
    against the closed form: p = (1+k)/(1+kV), h = -log2 p."""
    rows = {
        r["doc_id"]: r.asDict()
        for r in doc_perplexity(spark, docs_dir).collect()
    }
    # total distinct contexts V: count distinct w1 across the corpus
    all_texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
        "kilo lima alpha bravo charlie delta echo foxtrot golf hotel",
        "mike november oscar papa quebec romeo sierra tango uniform victor",
    ]
    w1s = set()
    for t in all_texts:
        w = t.split()
        w1s.update(w[:-1])
    v = float(len(w1s))
    k = PPL_SMOOTH_K
    p = (1 + k) / (1 + k * v)
    h = -math.log2(p)
    assert rows[2]["n_bigrams"] == 9
    assert rows[2]["h"] == pytest.approx(h, abs=1e-6)
    assert rows[2]["ppl"] == pytest.approx(2.0**h, abs=1e-4)
    # doc 1's span bigrams repeat corpus-wide (c12=2, c1=2) -> higher p,
    # lower surprise than doc 2's all-singleton bigrams
    assert rows[1]["h"] < rows[2]["h"]


def test_ppl_ingest_train_serve_split(spark, docs_dir):
    """Doc 0 'arrives'; the LM trains on docs 1 and 2.  Doc 0's seven
    in-span bigrams exist in doc 1; the two tail bigrams (hotel->india,
    india->juliet) are unseen -> oov_frac = 2/9, and smoothing keeps the
    score finite."""
    rows = {r["doc_id"]: r.asDict() for r in ppl_ingest(spark, docs_dir).collect()}
    assert list(rows) == [0]
    r = rows[0]
    assert r["n_bigrams"] == 9
    assert r["oov_frac"] == round(2 / 9, 6)
    assert math.isfinite(r["h"]) and math.isfinite(r["ppl"]) and r["ppl"] > 1


def test_source_mixture_flattens(spark, docs_dir):
    rows = {r["source"]: r.asDict() for r in source_mixture(spark, docs_dir).collect()}
    # temperature < 1 up-weights the minority source
    assert rows["s2"]["p_mix"] > rows["s2"]["p_raw"]
    assert rows["s1"]["p_mix"] < rows["s1"]["p_raw"]
    assert abs(sum(r["p_mix"] for r in rows.values()) - 1.0) < 1e-5
    assert sum(r["quota"] for r in rows.values()) == pytest.approx(
        MIX_BUDGET, abs=1
    )


def test_semantic_dedup_consistent_with_near_dups(spark):
    """kept == vector never appears as the higher id of a near-dup pair."""
    dropped = {
        r["vec_b"] for r in embedding_near_dups(spark, SF_DIR).collect()
    }
    # narrow gate width: embedding_near_dups (the comparison set) is the
    # narrow detector; the public API defaults to production width
    verdicts = semantic_dedup_gate(spark, SF_DIR).collect()
    assert len(verdicts) > 0
    for r in verdicts:
        assert r["kept"] == (r["vec_id"] not in dropped)


@pytest.fixture(scope="module")
def short_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("short_docs")
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1], dtype="int64"),
            "text": ["solo", "just seven tokens here not eight yet"],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), d / "documents.parquet"
    )
    return str(d)


def test_substring_dedup_all_docs_below_span(spark, short_docs_dir):
    """No doc reaches SPAN_N tokens: every row survives with covered=0."""
    rows = {r["doc_id"]: r.asDict() for r in substring_dedup(spark, short_docs_dir).collect()}
    assert set(rows) == {0, 1}
    assert all(r["covered"] == 0 and r["dup_frac"] == 0.0 for r in rows.values())


def test_doc_perplexity_drops_single_token_docs(spark, short_docs_dir):
    """A 1-token doc has no bigrams -> no row; the 7-token doc scores."""
    rows = {r["doc_id"]: r.asDict() for r in doc_perplexity(spark, short_docs_dir).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_bigrams"] == 6


@pytest.fixture(scope="module")
def tiny_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_emb")
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0], [0.6, 0.8, 0.0, 0.0]],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 1, 2], type=pa.int32()),
        }
    )
    pq.write_table(emb, d / "embeddings.parquet")
    return str(d)


def test_ivf_survives_tiny_corpus_with_zero_vector(spark, tiny_emb_dir):
    """3 vectors (one all-zero): k clamps to >= 1 <= n, unit-normalization
    maps the zero vector to the zero vector (no null/NaN features), and
    the search runs end-to-end."""
    import math as m

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        ann_ivf_topk,
    )

    rows = ann_ivf_topk(spark, tiny_emb_dir).collect()
    for r in rows:
        assert r["cosine"] is None or m.isfinite(r["cosine"])


def test_embedding_rp_preserves_geometry(spark):
    """Sign-projection invariants on the deterministic corpus: per-vector
    norms are preserved (JL: E[||Pa||^2] = ||a||^2, concentration at
    R=16), dot products correlate positively, and the matrix is
    reproducible (re-run equals itself)."""
    import numpy as np

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        RP_DIMS,
        _embeddings,
        embedding_rp,
    )

    orig = {r["vec_id"]: np.array(r["e"]) for r in _embeddings(spark, SF_DIR).collect()}
    proj = {}
    for r in embedding_rp(spark, SF_DIR).collect():
        proj.setdefault(r["vec_id"], [0.0] * RP_DIMS)[r["rp_dim"]] = r["value"]
    ratios = np.array(
        [np.linalg.norm(proj[i]) / np.linalg.norm(orig[i]) for i in sorted(orig)]
    )
    assert 0.9 < ratios.mean() < 1.1
    assert ratios.min() > 0.4 and ratios.max() < 1.8
    ids = sorted(orig)[:60]
    rng = np.random.default_rng(0)
    do, dp = [], []
    for _ in range(500):
        a, b = rng.choice(ids, 2, replace=False)
        do.append(float(orig[a] @ orig[b]))
        dp.append(float(np.array(proj[a]) @ np.array(proj[b])))
    assert np.corrcoef(do, dp)[0, 1] > 0.4


def test_gopher_rules_verdicts(spark, docs_dir):
    """The 10-token fixture docs all fail the 50-word minimum but pass the
    shape rules: per-rule accounting shows WHY they drop."""
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        gopher_rules,
    )

    rows = {r["doc_id"]: r.asDict() for r in gopher_rules(spark, docs_dir).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r["r_word_count"] is False  # 10 tokens < 50
        assert r["r_word_len"] is True and r["r_alpha"] is True
        assert r["r_repetition"] is True  # no repeated bigrams
        assert r["keep"] is False


def test_contamination_check_consistency(spark):
    """Audits exactly the non-train docs; fractions bounded; a doc with
    contam_grams == n_grams reports frac 1.0 (the planted cross-split
    duplicates)."""
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        contamination_check,
        train_test_split,
    )

    splits = {r["doc_id"]: r["split"] for r in train_test_split(spark, SF_DIR).collect()}
    rows = contamination_check(spark, SF_DIR).collect()
    expected = {d for d, s in splits.items() if s != "train"}
    assert {r["doc_id"] for r in rows} == expected
    for r in rows:
        assert r["split"] == splits[r["doc_id"]]
        assert 0 <= r["contam_grams"] <= r["n_grams"]
        assert 0.0 <= r["contam_frac"] <= 1.0
        if r["n_grams"] and r["contam_grams"] == r["n_grams"]:
            assert r["contam_frac"] == 1.0


def test_incremental_band_index_closes_ingest_loop(spark, tmp_path):
    """Build index from the corpus; batch 1 admits a new doc and appends
    its keys; batch 2 carrying a duplicate OF THAT DOC is then caught by
    the index without any rebuild."""
    from pyspark.sql import functions as F

    from bigdataanalytics_textsummarization_spark.extensions import dedup as dd
    from bigdataanalytics_textsummarization_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % dd.INGEST_MOD != 0)
    idx = str(tmp_path / "band_index")
    dd.build_band_index(corpus, idx)

    # batch 1: one genuinely new doc (unique text, >= 3 tokens)
    b1 = spark.createDataFrame(
        [(900001, "utterly novel ingest text nothing resembles this payload")],
        ["doc_id", "text"],
    )
    hits1 = dd.near_dup_ingest_join(
        b1, dd.read_band_index(spark, idx)
    ).filter(F.col("est_jaccard") >= 0.9)
    assert hits1.count() == 0  # admitted
    dd.append_band_index(b1, idx)

    # batch 2: an exact duplicate of the batch-1 doc
    b2 = spark.createDataFrame(
        [(900002, "utterly novel ingest text nothing resembles this payload")],
        ["doc_id", "text"],
    )
    hits2 = (
        dd.near_dup_ingest_join(b2, dd.read_band_index(spark, idx))
        .filter(F.col("est_jaccard") >= 0.9)
        .select("corpus_doc_id")
        .distinct()
        .collect()
    )
    assert [r["corpus_doc_id"] for r in hits2] == [900001]


def test_line_dedup_keep_first_semantics(spark):
    """Per-key accounting must balance: across the corpus, kept
    occurrences of a duplicated sentence = 1 (the first), and a doc's
    kept + dropped = its sentence count."""
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        line_dedup,
    )
    from tests.conftest import SF_DIR

    rows = line_dedup(spark, SF_DIR).collect()
    assert rows
    total_sents = sum(r.n_sents for r in rows)
    total_kept = sum(r.n_kept for r in rows)
    assert 0 < total_kept <= total_sents
    for r in rows:
        assert 0 <= r.n_dup <= r.n_sents
        assert 0 <= r.n_kept <= r.n_sents
        # a doc's non-duplicated sentences are always kept
        assert r.n_kept >= r.n_sents - r.n_dup
        assert r.keep_frac == r.n_kept / r.n_sents


def test_benchmark_decontam_planted_overlap(spark, tmp_path_factory):
    """A training doc embedding a benchmark doc's text must be flagged and
    attributed to THAT benchmark doc; clean docs must not appear."""
    from bigdataanalytics_textsummarization_spark.extensions.dedup import (
        DECON_MIN_SHARED,
        DECON_MOD,
        benchmark_decontam,
    )
    from tests.conftest import write_docs

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = []
    for i in range(2 * DECON_MOD):
        if i == 0:
            texts.append(bench_text)  # doc 0: benchmark member (0 % 17 == 0)
        elif i == 1:
            # contaminated train doc: carries the benchmark text verbatim
            texts.append("intro words here " + bench_text + " outro words")
        else:
            texts.append(f"clean document number {i} with its own unique words w{i} x{i} y{i} z{i} q{i} r{i}")
    d = write_docs(tmp_path_factory, "decontam", texts)
    out = benchmark_decontam(spark, d).toPandas()
    assert set(out["doc_id"]) == {1}
    row = out.iloc[0]
    assert row["bench_id"] == 0
    # benchmark doc has 10 words -> 8 shingles, all shared
    assert row["n_shared"] == 8 >= DECON_MIN_SHARED
    assert row["n_shingles"] > row["n_shared"]  # train doc is longer


def test_domain_caps_ceiling_and_determinism(spark):
    from bigdataanalytics_textsummarization_spark.extensions.curation import (
        DOMAIN_CAP,
        domain_caps,
    )
    from bigdataanalytics_textsummarization_spark.io import load_table
    from tests.conftest import SF_DIR

    out = domain_caps(spark, SF_DIR).toPandas()
    per = out.groupby(["source", "lang"]).size()
    assert (per <= DOMAIN_CAP).all()
    # domains under the cap are admitted whole; domains over it hit it
    totals = (
        load_table(spark, SF_DIR, "documents")
        .groupBy("source", "lang")
        .count()
        .toPandas()
        .set_index(["source", "lang"])["count"]
    )
    for dom, n_kept in per.items():
        assert n_kept == min(int(totals.loc[dom]), DOMAIN_CAP)
    # the lottery is deterministic across runs
    again = domain_caps(spark, SF_DIR).toPandas()
    key = ["source", "lang", "rk"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_dedup_keep_best_semantics(spark):
    """Quality-canonical dedup: exactly one keep per cluster, and the kept
    member maximizes (quality, -doc_id) within its cluster."""
    from bigdataanalytics_textsummarization_spark.extensions.dedup import (
        dedup_keep_best,
    )
    from tests.conftest import SF_DIR

    out = dedup_keep_best(spark, SF_DIR).toPandas()
    if out.empty:
        return  # no near-dup clusters at this scale: vacuously fine
    per = out.groupby("cluster_id")
    assert (per["keep"].sum() == 1).all()
    for _, grp in per:
        best = grp.sort_values(
            ["quality", "doc_id"], ascending=[False, True]
        ).iloc[0]
        assert bool(best["keep"])


@pytest.fixture(scope="module")
def long_doc_dir(tmp_path_factory):
    """A 2000-token cyclic document (40 repeats of a 50-word block) plus a
    2-token doc: distinct-n counts are derivable by eye, and the long doc
    exercises the per-n explode's O(tokens) bound (ADVICE r10 — the old
    flatten-of-three-arrays form held 3x the grams per row)."""
    d = tmp_path_factory.mktemp("long_doc")
    block = [f"w{i}" for i in range(50)]
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1], dtype="int64"),
            "text": [" ".join(block * 40), "a b"],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    return str(d)


def test_corpus_diversity_long_doc(spark, long_doc_dir):
    """Cyclic 50-word block repeated 40x: exactly 50 distinct n-grams for
    every n (wrap-around included), plus the 2-token doc's contribution."""
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        corpus_diversity,
    )

    rows = {
        r["n"]: r.asDict()
        for r in corpus_diversity(spark, long_doc_dir).collect()
    }
    # n=1: 2000 + 2 tokens; 50 block words + {a, b}
    assert rows[1]["total_ngrams"] == 2002
    assert rows[1]["distinct_ngrams"] == 52
    assert rows[1]["distinct_milli"] == (1000 * 52) // 2002
    # n=2: 1999 cyclic bigrams (50 distinct) + "a b"
    assert rows[2]["total_ngrams"] == 2000
    assert rows[2]["distinct_ngrams"] == 51
    # n=3: long doc only (the 2-token doc has no trigram)
    assert rows[3]["total_ngrams"] == 1998
    assert rows[3]["distinct_ngrams"] == 50


def test_corpus_diversity_sketch_matches_exact(spark, long_doc_dir):
    """The HLL twin carries the same exact counts, and the raw estimate
    (re-derived here numerically) is inside the certified 6% tolerance on
    both the fixture and the gate corpus."""
    import pyspark.sql.functions as F

    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        _diversity_grams,
        corpus_diversity,
        corpus_diversity_sketch,
    )
    from bigdataanalytics_textsummarization_spark.io import load_table

    for d in (long_doc_dir, SF_DIR):
        exact = {
            r["n"]: r.asDict() for r in corpus_diversity(spark, d).collect()
        }
        tw = {
            r["n"]: r.asDict()
            for r in corpus_diversity_sketch(spark, d).collect()
        }
        assert set(exact) == set(tw)
        for n in exact:
            assert tw[n]["total_ngrams"] == exact[n]["total_ngrams"]
            assert tw[n]["distinct_ngrams"] == exact[n]["distinct_ngrams"]
            assert tw[n]["sketch_within_tol"] is True
        # raw HLL estimates, asserted numerically (docstring contract)
        raw = {
            r["n"]: r["approx"]
            for r in _diversity_grams(load_table(spark, d, "documents"))
            .groupBy("n")
            .agg(F.approx_count_distinct("g", rsd=0.02).alias("approx"))
            .collect()
        }
        for n in exact:
            assert (
                abs(raw[n] - exact[n]["distinct_ngrams"])
                <= exact[n]["distinct_ngrams"] * 0.06
            )


def test_hybrid_dedup_audit_three_state_contract(spark):
    """The audit's per-method verdicts are three-state (ADVICE r10): every
    emitted row has at least one 'flagged'; 'flagged'/'below_threshold'
    imply the method's score is present and sits on the right side of its
    threshold; 'not_a_candidate' implies the -1.0 sentinel; and the
    flagged sets reproduce the certified detectors exactly."""
    from bigdataanalytics_textsummarization_spark.extensions.curation import (
        hybrid_dedup_audit_gate,
    )
    from bigdataanalytics_textsummarization_spark.extensions.dedup import (
        CLUSTER_MIN_JACCARD,
        dedup_minhash_lsh,
    )
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        NEAR_DUP_THRESHOLD,
        embedding_near_dups,
    )

    # narrow gate width (the flagged-set comparisons below are against
    # the narrow detectors' own outputs)
    out = hybrid_dedup_audit_gate(spark, SF_DIR).toPandas()
    states = {"flagged", "below_threshold", "not_a_candidate"}
    assert set(out["lexical"]) <= states and set(out["semantic"]) <= states
    assert (
        (out["lexical"] == "flagged") | (out["semantic"] == "flagged")
    ).all()
    lex_f = out["lexical"] == "flagged"
    assert (out.loc[lex_f, "jaccard"] >= CLUSTER_MIN_JACCARD).all()
    lex_b = out["lexical"] == "below_threshold"
    assert (
        (out.loc[lex_b, "jaccard"] >= 0)
        & (out.loc[lex_b, "jaccard"] < CLUSTER_MIN_JACCARD)
    ).all()
    assert (out.loc[out["lexical"] == "not_a_candidate", "jaccard"] == -1.0).all()
    sem_f = out["semantic"] == "flagged"
    assert (out.loc[sem_f, "cosine"] >= round(NEAR_DUP_THRESHOLD, 6)).all()
    assert (out.loc[out["semantic"] == "not_a_candidate", "cosine"] == -1.0).all()
    # flagged sets == the certified detectors' own outputs
    lex_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, SF_DIR)
        .filter(f"jaccard >= {CLUSTER_MIN_JACCARD}")
        .collect()
    }
    assert set(map(tuple, out.loc[lex_f, ["doc_a", "doc_b"]].values)) == lex_pairs
    sem_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dups(spark, SF_DIR).collect()
    }
    assert set(map(tuple, out.loc[sem_f, ["doc_a", "doc_b"]].values)) == sem_pairs


def test_dsir_weights_steer_toward_target(spark):
    """DSIR semantics (Xie et al. 2023): documents of the target slice
    must average a HIGHER importance log-ratio than the rest (their
    hashed unigrams are what the target LM up-weights), smoothing keeps
    every weight finite, and the resampled epoch is exactly the DSIR_K
    largest A-Res keys, deterministically."""
    from bigdataanalytics_textsummarization_spark.extensions.curation import (
        DSIR_K,
        DSIR_TARGET_LANG,
        dsir_sample,
        dsir_weights,
    )

    wts = dsir_weights(spark, SF_DIR).toPandas()
    assert wts["logw"].notna().all() and wts["logw_per_token"].notna().all()
    tgt = wts[wts["lang"] == DSIR_TARGET_LANG]["logw_per_token"]
    rest = wts[wts["lang"] != DSIR_TARGET_LANG]["logw_per_token"]
    assert len(tgt) and len(rest)
    assert tgt.mean() > rest.mean()
    out = dsir_sample(spark, SF_DIR).toPandas()
    assert len(out) == min(DSIR_K, len(wts))
    assert sorted(out["rk"]) == list(range(1, len(out) + 1))
    # determinism: the identical epoch on a second run
    again = dsir_sample(spark, SF_DIR).toPandas()
    key = ["rk"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_decontam_audit_oracle_parity_and_states(spark, oracle):
    from tests.conftest import SF_DIR, assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        curation as cu,
    )

    assert_parity(
        spark, oracle, cu.decontam_audit, cu.ORACLES["decontam_audit"]
    )
    rows = cu.decontam_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert "flagged" in (r["lexical"], r["semantic"])
        assert (r["lexical"] == "clean") == (r["n_shared"] == -1)
        assert (r["lexical"] == "clean") == (r["lex_bench_id"] == -1)
        assert (r["semantic"] == "clean") == (r["cosine"] == -1.0)
        assert (r["semantic"] == "clean") == (r["sem_bench_id"] == -1)


def test_hard_negative_mining_brute_force(spark, oracle):
    import numpy as np

    from tests.conftest import SF_DIR, assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as sim,
    )

    assert_parity(
        spark,
        oracle,
        sim.hard_negative_mining,
        sim.ORACLES["hard_negative_mining"],
    )
    out = sim.hard_negative_mining(spark, SF_DIR).toPandas()
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .toPandas()
        .set_index("vec_id")
    )
    assert (out["query_label"] != out["negative_label"]).all()
    vecs = {i: np.asarray(e, dtype=np.float64) for i, e in emb["embedding"].items()}
    for qid, grp in out.groupby("query_id"):
        assert sorted(grp["rk"]) == list(range(1, sim.HARD_NEG_K + 1))
        qv = vecs[qid]
        qn = np.sqrt(qv @ qv)
        cands = [
            (-(qv @ vecs[i]) / (qn * np.sqrt(vecs[i] @ vecs[i])), i)
            for i in emb.index
            if emb.loc[i, "label"] != emb.loc[qid, "label"]
        ]
        want = [i for _, i in sorted(cands)[: sim.HARD_NEG_K]]
        got = list(grp.sort_values("rk")["negative_id"])
        assert got == want, f"anchor {qid}: {got} != brute {want}"


def test_minhash_band_tuning_curve(spark, oracle):
    from tests.conftest import SF_DIR, assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        dedup as dd,
    )

    assert_parity(
        spark,
        oracle,
        dd.minhash_band_tuning,
        dd.ORACLES["minhash_band_tuning"],
    )
    out = (
        dd.minhash_band_tuning(spark, SF_DIR)
        .toPandas()
        .sort_values("bands")
        .reset_index(drop=True)
    )
    assert list(out["bands"]) == sorted(dd.TUNING_BAND_CONFIGS)
    assert (out["bands"] * out["rows_per_band"] == dd.N_HASHES).all()
    assert out["n_truth"].nunique() == 1 and out["n_truth"].iloc[0] > 0
    assert (out["n_hits"] <= out[["n_truth", "n_candidates"]].min(axis=1)).all()
    # more bands = looser sieve: candidate sets grow, recall never drops
    assert out["n_candidates"].is_monotonic_increasing
    assert out["recall"].is_monotonic_increasing
    assert out["precision"].is_monotonic_decreasing
    # the production 4x4 layout's candidate count equals the shipped LSH
    # pass's pair table (same banding, same signature)
    lsh_pairs = dd.dedup_minhash_lsh(spark, SF_DIR).count()
    assert int(out.loc[out["bands"] == dd.N_BANDS, "n_candidates"].iloc[0]) == lsh_pairs
    # exact ground truth cross-check against the blocked-exact query:
    # truth at TUNING_J is the jaccard >= TUNING_J slice of the 0.2-floor
    # exact pair table
    exact = dd.dedup_ngram_jaccard(spark, SF_DIR).toPandas()
    n_want = int((exact["jaccard"] >= dd.TUNING_J).sum())
    assert int(out["n_truth"].iloc[0]) == n_want


def test_ccnet_buckets_facts(spark, oracle):
    from tests.conftest import SF_DIR, assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    assert_parity(
        spark, oracle, ta.ccnet_buckets, ta.ORACLES["ccnet_buckets"]
    )
    out = ta.ccnet_buckets(spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    eligible = docs[docs["text"].str.split(" ").str.len() >= 2]
    want = eligible.groupby("lang").size()
    assert len(out) == len(want)
    for _, r in out.iterrows():
        assert r["n_docs"] == want[r["lang"]]
        assert r["partition_ok"] and r["monotone_ok"]
        assert r["cuts_nondecreasing_ok"] and r["p33_ok"] and r["p67_ok"]


def test_boilerplate_strip_consistency(spark, oracle):
    from tests.conftest import SF_DIR, assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    assert_parity(
        spark, oracle, ta.boilerplate_strip, ta.ORACLES["boilerplate_strip"]
    )
    out = ta.boilerplate_strip(spark, SF_DIR).toPandas().set_index("doc_id")
    acct = ta.line_dedup(spark, SF_DIR).toPandas().set_index("doc_id")
    # same doc set and the transform agrees with the accounting query
    assert set(out.index) == set(acct.index)
    joined = out.join(acct, lsuffix="_s")
    assert (joined["n_sents_s"] == joined["n_sents"]).all()
    assert (joined["n_removed"] == joined["n_sents"] - joined["n_kept"]).all()
    # clean_text holds exactly n_kept sentences, in document order
    for doc_id, r in out.iterrows():
        sents = [s for s in r["clean_text"].split(".") if s != ""]
        n_kept = int(acct.loc[doc_id, "n_kept"])
        assert len(sents) == n_kept, doc_id
    # every removed sentence survives somewhere (keep-FIRST, not drop-all)
    corpus = " . ".join(out["clean_text"])
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    import itertools

    # strip SPACES only, mirroring Spark/DuckDB trim (str.strip() would
    # also eat tabs/newlines and could diverge on a whitespace-edged
    # sentence)
    all_sents = set(
        itertools.chain.from_iterable(
            (t.strip(" ") for t in txt.split(".") if t.strip(" "))
            for txt in docs["text"]
        )
    )
    kept_sents = set(
        itertools.chain.from_iterable(
            (t for t in ct.split(".") if t) for ct in out["clean_text"]
        )
    )
    assert kept_sents == all_sents, "keep-first must retain every distinct sentence"
    assert corpus  # non-degenerate


def test_doc_repetition_strip_semantics(spark, oracle, tmp_path):
    """Within-doc keep-first on a hand fixture: later repeats of a
    sentence drop INSIDE a document, but cross-document repeats are
    untouched (that is boilerplate_strip's corpus-level job); sentence
    order is preserved; a doc with no non-empty sentence emits (0,0,'');
    plus oracle parity on the real corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    assert_parity(
        spark,
        oracle,
        ta.doc_repetition_strip,
        ta.ORACLES["doc_repetition_strip"],
    )
    docs = pa.Table.from_pylist(
        [
            # loop: 'spam ham' repeats 3x around a unique middle
            {"doc_id": 0, "text": "spam ham. unique middle. spam ham.spam ham", "lang": "en", "source": "s", "n_chars": 43},
            # cross-doc repeat of doc 0's sentence: kept here (within-doc rule)
            {"doc_id": 1, "text": "spam ham. other text", "lang": "en", "source": "s", "n_chars": 20},
            # degenerate: only dots and blanks
            {"doc_id": 2, "text": ". .. .", "lang": "en", "source": "s", "n_chars": 6},
        ]
    )
    d = tmp_path / "sf_reps"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = (
        ta.doc_repetition_strip(spark, str(d))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_sents"] == 4 and out.loc[0, "n_removed"] == 2
    assert out.loc[0, "clean_text"] == "spam ham.unique middle"
    assert out.loc[1, "n_sents"] == 2 and out.loc[1, "n_removed"] == 0
    assert out.loc[1, "clean_text"] == "spam ham.other text"
    assert out.loc[2, "n_sents"] == 0 and out.loc[2, "n_removed"] == 0
    assert out.loc[2, "clean_text"] == ""


def test_ccnet_buckets_small_language_booleans_hold(spark, tmp_path):
    # regression (late-r14 review): for a language with fewer than
    # CCNET_MIN_BRACKET_DOCS docs the q +- TOL exact-percentile bracket
    # is not a sketch guarantee (a 3-doc language's cutpoint is an exact
    # order statistic that can sit OUTSIDE the interpolated band, e.g.
    # ppl {1,2,3}: sketch p33 = 1.0 vs band [1.567, 1.767]); the
    # certified booleans must dispatch to min/max containment there and
    # stay true, or the driver gate would mismatch its constant-true
    # oracle on any fixture with a rare language
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    docs = pa.Table.from_pylist(
        [
            # 3-doc rare language: distinct perplexities by construction
            {"doc_id": 1, "text": "aa bb", "lang": "xx", "source": "s", "n_chars": 5},
            {"doc_id": 2, "text": "aa bb aa bb", "lang": "xx", "source": "s", "n_chars": 11},
            {"doc_id": 3, "text": "cc dd ee ff", "lang": "xx", "source": "s", "n_chars": 11},
            # one bigger language so the query still exercises both arms
            *[
                {
                    "doc_id": 100 + i,
                    "text": f"w{i} w{i + 1} w{i + 2} common tail",
                    "lang": "yy",
                    "source": "s",
                    "n_chars": 20,
                }
                for i in range(60)
            ],
        ]
    )
    d = tmp_path / "sf_tiny"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = ta.ccnet_buckets(spark, str(d)).toPandas().set_index("lang")
    assert set(out.index) == {"xx", "yy"}
    assert out.loc["xx", "n_docs"] == 3
    assert out.loc["yy", "n_docs"] == 60
    for lang in ("xx", "yy"):
        r = out.loc[lang]
        assert r["partition_ok"] and r["monotone_ok"], lang
        assert r["cuts_nondecreasing_ok"], lang
        assert r["p33_ok"] and r["p67_ok"], lang


# -- bitext mining (r15): margin-criterion invariants on the real fixture ----


def test_bitext_mining_contract(spark):
    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as sim,
    )

    out = sim.bitext_mining_gate(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # mining direction: targets are never the source language, and at
    # most one row (the argmax) per source document
    assert (out["tgt_lang"] != sim.BITEXT_SRC_LANG).all()
    assert out["src_id"].is_unique
    # every accepted pair clears the margin threshold (rounded value may
    # sit a hair under the raw-value cut, hence the 1e-6 slack)
    assert (out["margin"] >= sim.BITEXT_MARGIN_T - 1e-6).all()
    # the margin criterion is a RE-RANKING, not a cosine cut: it must be
    # able to reject some hub pairs a raw-cosine argmax would keep
    # (src docs with candidates but no accepted row exist on this
    # fixture — the criterion is doing work)
    docs = sim.load_table(spark, SF_DIR, "documents")
    n_src = docs.filter(f"lang = '{sim.BITEXT_SRC_LANG}'").count()
    assert len(out) < n_src


def test_bitext_mining_wide_blocks_narrower(spark):
    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as sim,
    )

    narrow = sim.bitext_mining_gate(spark, SF_DIR).toPandas()
    wide = sim.bitext_mining_wide(spark, SF_DIR).toPandas()
    assert len(wide) > 0
    # the wide key is a refinement of the narrow key (first 4 sign bits
    # are a prefix of the first 8), so every wide candidate pool is a
    # subset of a narrow pool — accepted wide pairs whose (src, tgt)
    # the narrow run also accepted must agree on the cosine
    m = narrow.merge(wide, on=["src_id", "tgt_id"], suffixes=("_n", "_w"))
    # the refinement property guarantees overlap on this fixture; an
    # empty merge would make the agreement check vacuous (ADVICE r15)
    assert len(m) > 0
    assert (m["cosine_n"] == m["cosine_w"]).all()


def test_public_width_default_is_production(spark):
    """VERDICT r15 task 3: every un-suffixed public sign-bucket builder
    defaults to the PRODUCTION blocking width — the signature default is
    SIGN_DIMS_WIDE for all five, and the default-width frame is
    identical to the _wide twin's (spot-checked on the cheapest pair)."""
    import inspect

    from bigdataanalytics_textsummarization_spark.extensions import (
        curation as cur,
    )
    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as sim,
    )

    for fn in (
        sim.semantic_dedup,
        sim.ann_bucketed_topk,
        sim.semantic_decontam,
        sim.bitext_mining,
        cur.hybrid_dedup_audit,
    ):
        assert (
            inspect.signature(fn).parameters["dims"].default
            == sim.SIGN_DIMS_WIDE
        ), fn.__name__
    default = (
        sim.semantic_decontam(spark, SF_DIR)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    wide = (
        sim.semantic_decontam_wide(spark, SF_DIR)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(default, wide)
