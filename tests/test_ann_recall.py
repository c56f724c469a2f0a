"""ANN quality: the bucketed (sign-LSH) path trades recall for pruning —
measure it against the brute-force ground truth instead of assuming."""

from __future__ import annotations

from bigdataanalytics_textsummarization_spark.extensions.similarity import (
    ann_bucketed_topk_gate,
    ann_cosine_topk,
)
from tests.conftest import SF_DIR


def test_bucketed_ann_recall_vs_brute_force(spark):
    brute = ann_cosine_topk(spark, SF_DIR).toPandas()
    # the narrow gate width: the 0.4 recall floor below is calibrated
    # for d=4 multi-probe (the public API defaults to production width
    # since r16 — its recall profile is gated separately)
    bucketed = ann_bucketed_topk_gate(spark, SF_DIR).toPandas()

    truth = brute.groupby("query_id")["neighbor_id"].apply(set)
    got = bucketed.groupby("query_id")["neighbor_id"].apply(set)

    recalls = []
    for qid, t in truth.items():
        g = got.get(qid, set())
        # bucketed top-3 vs brute top-k: recall over the brute set
        recalls.append(len(t & g) / len(t))
    avg_recall = sum(recalls) / len(recalls)
    # multi-probe (own bucket + Hamming-1) at cosine ~0.5 should recall
    # roughly p^d + d*p^(d-1)*(1-p) ≈ 0.6; below this the probing broke
    assert avg_recall >= 0.4, f"avg recall {avg_recall:.2f}"
    # and every returned neighbor must share the query's bucket by
    # construction — cosine values must match brute force where they overlap
    merged = bucketed.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_b", "_t")
    )
    assert (merged["cosine_b"] - merged["cosine_t"]).abs().max() < 1e-9


def test_ivf_ann_recall_beats_scan_fraction(spark):
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        IVF_CLUSTERS,
        IVF_NPROBE,
        TOP_K,
        ann_ivf_topk,
    )

    brute = ann_cosine_topk(spark, SF_DIR).toPandas()
    ivf = ann_ivf_topk(spark, SF_DIR).toPandas()

    truth = brute.groupby("query_id")["neighbor_id"].apply(set)
    got = ivf.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(t & got.get(qid, set())) / len(t) for qid, t in truth.items()
    ]
    avg_recall = sum(recalls) / len(recalls)
    # scanning nprobe/K of the corpus blindly would recall ~nprobe/K of the
    # true top-k; learned cells must do meaningfully better than random
    assert avg_recall >= 2 * IVF_NPROBE / IVF_CLUSTERS, (
        f"avg recall {avg_recall:.2f}"
    )
    # exactness where the candidate was found: cosine equals brute force
    merged = ivf.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_i", "_t")
    )
    if len(merged):
        assert (merged["cosine_i"] - merged["cosine_t"]).abs().max() < 1e-9
    # shape: at most TOP_K per query, ranks contiguous from 1
    for _, grp in ivf.groupby("query_id"):
        assert sorted(grp["rk"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= TOP_K


def test_ivf_ann_recall_at_gate_scale(spark):
    """Recall evidence at 10x the unit-test scale (sf0.1): the learned
    coarse quantizer at nprobe=4/16 must recall >= 0.6 of the brute-force
    top-k — the FAISS-shape trade the production path promises (VERDICT
    round 1, next-round #8)."""
    import os

    import pytest

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        ann_ivf_topk,
    )

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 testdata not present")

    brute = ann_cosine_topk(spark, sf_dir).toPandas()
    ivf = ann_ivf_topk(spark, sf_dir).toPandas()

    truth = brute.groupby("query_id")["neighbor_id"].apply(set)
    got = ivf.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(t & got.get(qid, set())) / len(t) for qid, t in truth.items()
    ]
    avg_recall = sum(recalls) / len(recalls)
    assert avg_recall >= 0.6, f"avg recall {avg_recall:.2f} at sf0.1"


def test_ivf_on_disk_index_prunes_partitions(spark, tmp_path):
    """The inverted file written partitionBy(cell) + a broadcast probe
    join must plan dynamic partition pruning (unprobed cell directories
    never read) and return the same neighbors as the in-memory path."""
    from pyspark.sql import functions as F

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        N_QUERIES,
        _embeddings,
        _norm,
        ann_ivf_search_indexed,
        ann_ivf_topk,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    nprobe_eff = build_ivf_index(spark, SF_DIR, idx)
    queries = (
        _embeddings(spark, SF_DIR)
        .withColumn("nrm", _norm(F.col("e")))
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "e", "nrm")
    )
    res = ann_ivf_search_indexed(spark, idx, queries, nprobe_eff)

    plan = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower(), "no DPP on the cell scan"

    got = res.toPandas().sort_values(["query_id", "rk"]).reset_index(drop=True)
    want = (
        ann_ivf_topk(spark, SF_DIR)
        .toPandas()
        .sort_values(["query_id", "rk"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "rk", "neighbor_id"]].equals(
        want[["query_id", "rk", "neighbor_id"]]
    )


def test_pq_ann_recall_and_refined_exactness(spark):
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        PQ_M,
        PQ_RECALL_FLOOR,
        TOP_K,
        ann_pq_recall,
        ann_pq_topk,
    )

    brute = ann_cosine_topk(spark, SF_DIR).toPandas()
    pq = ann_pq_topk(spark, SF_DIR).toPandas()

    truth = brute.groupby("query_id")["neighbor_id"].apply(set)
    got = pq.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(t & got.get(qid, set())) / len(t) for qid, t in truth.items()
    ]
    avg_recall = sum(recalls) / len(recalls)
    # the gate's floor must hold wherever the gate runs (measured 1.0 at
    # sf0.001/0.01, 0.86 at sf0.1)
    assert avg_recall >= PQ_RECALL_FLOOR, f"avg recall {avg_recall:.2f}"

    # the refine stage rescores against ORIGINAL floats, so every
    # returned cosine must equal brute force exactly where they overlap
    merged = pq.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_p", "_t")
    )
    assert len(merged) > 0
    assert (merged["cosine_p"] - merged["cosine_t"]).abs().max() < 1e-9

    # full result shape: TOP_K ranked rows per query, no self-matches
    assert (pq.groupby("query_id")["rk"].count() == TOP_K).all()
    assert (pq["query_id"] != pq["neighbor_id"]).all()

    # and the driver-gateable fact row agrees
    row = ann_pq_recall(spark, SF_DIR).toPandas().iloc[0]
    assert int(row["n_queries"]) == len(truth)
    assert bool(row["recall_ok"])
    assert PQ_M > 0  # constants imported, codebook geometry exercised


def test_pq_deterministic_under_repartition(spark):
    """Codebook training sorts each subspace group by vec_id before
    seeding, so the whole PQ path must be byte-identical run-to-run and
    across input layouts (the grouped-kernel row order is the only
    partition-dependent input)."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        _PQ_CB_CACHE,
        ann_pq_topk,
    )

    _PQ_CB_CACHE.clear()  # force a real training run
    a = (
        ann_pq_topk(spark, SF_DIR)
        .toPandas()
        .sort_values(["query_id", "rk"])
        .reset_index(drop=True)
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        _PQ_CB_CACHE.clear()  # retrain under the serialized layout too
        b = (
            ann_pq_topk(spark, SF_DIR)
            .toPandas()
            .sort_values(["query_id", "rk"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a.equals(b)


def test_ivfpq_recall_and_refined_exactness(spark):
    """The composed index must clear its gate floor, return exact cosines
    (refine rescores original floats), and honor the TOP_K shape."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        IVFPQ_RECALL_FLOOR,
        TOP_K,
        ann_ivfpq_recall,
        ann_ivfpq_topk,
    )

    brute = ann_cosine_topk(spark, SF_DIR).toPandas()
    got = ann_ivfpq_topk(spark, SF_DIR).toPandas()

    truth = brute.groupby("query_id")["neighbor_id"].apply(set)
    g = got.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(t & g.get(qid, set())) / len(t) for qid, t in truth.items()
    ]
    avg_recall = sum(recalls) / len(recalls)
    # measured 0.68 at sf0.01, 0.70 at sf0.1 (seeded quantizers at both
    # levels make this deterministic per fixture)
    assert avg_recall >= IVFPQ_RECALL_FLOOR, f"avg recall {avg_recall:.2f}"

    merged = got.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_p", "_t")
    )
    assert len(merged) > 0
    assert (merged["cosine_p"] - merged["cosine_t"]).abs().max() < 1e-9

    for _, grp in got.groupby("query_id"):
        assert sorted(grp["rk"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= TOP_K
    assert (got["query_id"] != got["neighbor_id"]).all()

    row = ann_ivfpq_recall(spark, SF_DIR).toPandas().iloc[0]
    assert int(row["n_queries"]) == len(truth)
    assert bool(row["recall_ok"])


def test_ivfpq_on_disk_codes_prune_partitions(spark, tmp_path):
    """The inverted file of PQ codes written partitionBy(cell) + the
    broadcast probe join must plan dynamic partition pruning — unprobed
    cell directories are never read, and what IS read is codes, not
    floats — and return the same neighbors as the in-memory path."""
    from pyspark.sql import functions as F

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        N_QUERIES,
        _embeddings,
        _norm,
        ann_ivfpq_search_indexed,
        ann_ivfpq_topk,
        build_ivfpq_index,
    )

    idx = str(tmp_path / "ivfpq")
    nprobe_eff = build_ivfpq_index(spark, SF_DIR, idx)
    queries = (
        _embeddings(spark, SF_DIR)
        .withColumn("nrm", _norm(F.col("e")))
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "e", "nrm")
    )
    res = ann_ivfpq_search_indexed(spark, idx, queries, nprobe_eff)

    plan = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower(), "no DPP on the code scan"
    # the probed scan reads the code table, whose schema is codes — the
    # float store appears only behind the refine join
    codes_scans = [
        seg for seg in plan.split("Scan parquet")[1:] if "/codes" in seg[:400]
    ]
    assert codes_scans, "code-table scan missing from the plan"

    got = res.toPandas().sort_values(["query_id", "rk"]).reset_index(drop=True)
    want = (
        ann_ivfpq_topk(spark, SF_DIR)
        .toPandas()
        .sort_values(["query_id", "rk"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "rk", "neighbor_id"]].equals(
        want[["query_id", "rk", "neighbor_id"]]
    )


def test_ivfpq_recall_at_gate_scale(spark):
    """Composed-index recall at 10x the unit-test scale (sf0.1)."""
    import os

    import pytest

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        IVFPQ_RECALL_FLOOR,
        ann_ivfpq_topk,
    )

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 testdata not present")

    brute = ann_cosine_topk(spark, sf_dir).toPandas()
    got = ann_ivfpq_topk(spark, sf_dir).toPandas()
    truth = brute.groupby("query_id")["neighbor_id"].apply(set)
    g = got.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(t & g.get(qid, set())) / len(t) for qid, t in truth.items()
    ]
    avg_recall = sum(recalls) / len(recalls)
    assert avg_recall >= IVFPQ_RECALL_FLOOR, (
        f"avg recall {avg_recall:.2f} at sf0.1"
    )


def test_centroid_eval_semantics(spark):
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        _embeddings,
        centroid_eval,
    )

    out = centroid_eval(spark, SF_DIR).toPandas()
    emb = _embeddings(spark, SF_DIR).toPandas()

    # one row per label, member counts reconcile with the table
    want = emb.groupby("label")["vec_id"].count()
    assert len(out) == len(want)
    got = out.set_index("label")["n_members"]
    assert all(int(got[lbl]) == int(n) for lbl, n in want.items())

    # accuracy and cohesion live in their domains
    assert (out["n_correct"] <= out["n_members"]).all()
    assert (out["n_correct"] >= 0).all()
    assert out["mean_intra_cos"].between(-1.0, 1.0).all()

    # numpy cross-check: per-label centroid accuracy must agree
    import numpy as np

    X = np.stack(emb["e"].to_numpy())
    labels = emb["label"].to_numpy()
    cents = {
        lbl: X[labels == lbl].mean(axis=0) for lbl in sorted(set(labels))
    }
    C = np.stack([cents[lbl] for lbl in sorted(cents)])
    keys = np.array(sorted(cents))
    sims = (X @ C.T) / np.maximum(
        np.outer(
            np.linalg.norm(X, axis=1), np.linalg.norm(C, axis=1)
        ),
        1e-300,
    )
    pred = keys[sims.argmax(axis=1)]
    for lbl in keys:
        n_correct = int(((labels == lbl) & (pred == labels)).sum())
        assert int(got.index.isin([lbl]).any())
        assert (
            int(out.set_index("label").loc[lbl, "n_correct"]) == n_correct
        ), f"label {lbl}"


def test_embedding_cov_is_valid_covariance(spark, oracle):
    """Diagonal entries are variances (non-negative); the upper triangle
    is complete for the embedding dimensionality."""
    import numpy as np

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        embedding_cov,
    )
    from tests.conftest import SF_DIR

    cov = embedding_cov(spark, SF_DIR).toPandas()
    dims = int(cov["j"].max()) + 1
    assert len(cov) == dims * (dims + 1) // 2
    diag = cov[cov["i"] == cov["j"]]["cov"].to_numpy()
    assert (diag >= -1e-9).all()
    # Cauchy-Schwarz: |cov_ij| <= sqrt(var_i var_j) (+ rounding slack)
    var = {
        int(r["i"]): float(r["cov"])
        for _, r in cov[cov["i"] == cov["j"]].iterrows()
    }
    for _, r in cov.iterrows():
        bound = (max(var[int(r["i"])], 0.0) * max(var[int(r["j"])], 0.0)) ** 0.5
        assert abs(float(r["cov"])) <= bound + 1e-5


def test_embedding_pca_matches_numpy_and_orders_variance(spark):
    """The distributed-stats + driver-eigh split must reproduce a plain
    numpy PCA (same sign/ordering conventions); projected variance is
    non-increasing in pc and each pc is mean-centered."""
    import numpy as np

    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        PCA_K,
        _embeddings,
        embedding_pca,
    )
    from tests.conftest import SF_DIR

    got = embedding_pca(spark, SF_DIR).toPandas()
    rows = _embeddings(spark, SF_DIR).select("vec_id", "e").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([r["e"] for r in rows])
    mu = X.mean(axis=0)
    C = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh((C + C.T) / 2.0)
    order = sorted(range(X.shape[1]), key=lambda c: (-float(evals[c]), c))[
        :PCA_K
    ]
    want = {}
    for pc, c in enumerate(order):
        v = evecs[:, c].copy()
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        for vid, x in zip(ids, X):
            want[(vid, pc)] = round(float((x - mu) @ v), 6)
    assert len(got) == len(ids) * PCA_K
    for r in got.itertuples():
        assert abs(r.coord - want[(r.vec_id, r.pc)]) <= 2e-5, (r.vec_id, r.pc)
    # variance ordering
    var_by_pc = got.groupby("pc")["coord"].var().to_numpy()
    assert (np.diff(var_by_pc) <= 1e-6).all()
    means = got.groupby("pc")["coord"].mean().to_numpy()
    assert (np.abs(means) < 1e-3).all()


def test_embedding_cov_gram_matches_exact(spark):
    """The Gramian-partial scale path must agree with the order-fixed
    value-gated covariance to float tolerance, under any partitioning."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        embedding_cov,
        embedding_cov_gram,
    )
    from tests.conftest import SF_DIR

    key = ["i", "j"]
    exact = embedding_cov(spark, SF_DIR).toPandas().sort_values(key)
    gram = embedding_cov_gram(spark, SF_DIR).toPandas().sort_values(key)
    assert exact[key].reset_index(drop=True).equals(
        gram[key].reset_index(drop=True)
    )
    import numpy as np

    np.testing.assert_allclose(
        exact["cov"].to_numpy(), gram["cov"].to_numpy(), atol=2e-6
    )


def test_recall_sweep_facts_and_real_curve(spark):
    """The registered sweep's determinate facts hold, and the underlying
    recall curve is genuinely increasing on this corpus (not just
    vacuously monotone)."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        N_QUERIES,
        _ivf_fit,
        _ivf_search,
        ann_recall_sweep,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    out = ann_recall_sweep(spark, SF_DIR).toPandas()
    assert out["monotone_ok"].all()
    assert out["exhaustive_exact"].all()
    assert 0 in set(out["nprobe"])  # the exhaustive anchor row

    # exhaustive probe IS brute force: identical neighbor sets
    corpus, centers, _ = _ivf_fit(spark, SF_DIR)
    q = corpus.filter(F.col("vec_id") < N_QUERIES)
    full = _ivf_search(corpus, centers, q, centers.count()).toPandas()
    brute = ann_cosine_topk(spark, SF_DIR).toPandas()
    key = ["query_id", "rk"]
    assert (
        full.sort_values(key)["neighbor_id"].tolist()
        == brute.sort_values(key)["neighbor_id"].tolist()
    )


def test_knn_graph_descent_recall_and_determinism(spark):
    """NN-Descent kNN graph: recall >= 0.8 at unit-test scale (measured
    0.86; random-embedding worst case documented in the docstring),
    byte-identical across runs, correct shape."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        KNN_GRAPH_K,
        _brute_knn_graph,
        knn_graph_descent,
    )
    from tests.conftest import SF_DIR

    ap = knn_graph_descent(spark, SF_DIR).toPandas()
    # shape: k ranked rows per vector, no self-edges
    assert (ap.groupby("vec_id")["rk"].count() == KNN_GRAPH_K).all()
    assert (ap["vec_id"] != ap["neighbor_id"]).all()

    tr = _brute_knn_graph(spark, SF_DIR, KNN_GRAPH_K).toPandas()
    t = tr.groupby("src")["dst"].apply(set)
    g = ap.groupby("vec_id")["neighbor_id"].apply(set)
    rec = sum(len(t[s] & g.get(s, set())) / len(t[s]) for s in t.index) / len(t)
    assert rec >= 0.8, f"recall {rec:.3f}"

    # r9: the builder is session-memoized, so the determinism check must
    # clear the memo to force a genuine from-scratch rebuild
    from bigdataanalytics_textsummarization_spark.functions import (
        release_pins,
    )

    release_pins()
    again = knn_graph_descent(spark, SF_DIR).toPandas()
    key = ["vec_id", "rk"]
    assert ap.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_ann_graph_search_beam_semantics(spark):
    """Graph ANN query path: per query exactly TOP_K ranked neighbors,
    never the query itself, ranks contiguous, cosines non-increasing,
    every neighbor reachable in the kNN graph union the entry point —
    and the whole search is deterministic across runs."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        TOP_K,
        ann_graph_search,
        knn_graph_descent,
    )
    from tests.conftest import SF_DIR

    out = ann_graph_search(spark, SF_DIR).toPandas()
    g = knn_graph_descent(spark, SF_DIR).toPandas()
    vertices = set(g.vec_id) | set(g.neighbor_id)
    for qid, grp in out.groupby("query_id"):
        grp = grp.sort_values("rk")
        assert list(grp.rk) == list(range(1, TOP_K + 1))
        assert (grp.neighbor_id != qid).all()
        assert (grp.cosine.diff().dropna() <= 1e-12).all()
        assert set(grp.neighbor_id) <= vertices
    again = ann_graph_search(spark, SF_DIR).toPandas()
    key = ["query_id", "rk"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_ann_graph_tuning_curve_consistency(spark):
    """The tuning sweep's facts must be internally consistent: totals are
    n_queries * TOP_K, recall_milli is the exact integer quantization of
    hits/total, one row per configured width — and the BEAM_W row must
    reproduce ann_graph_search's own recall at gate scale (same rounds
    at sf0.01, same graph, same ties)."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        BEAM_W,
        TOP_K,
        TUNE_BEAM_WS,
        ann_cosine_topk,
        ann_graph_search,
        ann_graph_tuning,
    )
    from tests.conftest import SF_DIR

    out = (
        ann_graph_tuning(spark, SF_DIR)
        .orderBy("beam_w")
        .toPandas()
        .set_index("beam_w")
    )
    assert list(out.index) == sorted(TUNE_BEAM_WS)
    assert (out.total == out.n_queries * TOP_K).all()
    assert (out.recall_milli == (1000 * out.hits) // out.total).all()
    assert (out.hits <= out.total).all()

    search = ann_graph_search(spark, SF_DIR).toPandas()
    brute = ann_cosine_topk(spark, SF_DIR).toPandas()
    truth = set(zip(brute.query_id, brute.neighbor_id))
    hits = sum(
        (q, n) in truth for q, n in zip(search.query_id, search.neighbor_id)
    )
    assert hits == out.loc[BEAM_W, "hits"]


def test_beam_rounds_gate_invariant():
    """The sf0.01-pinned graph-ANN oracles unroll exactly BEAM_ROUNDS CTE
    rounds at width BEAM_W from N_ENTRY_SEEDS entries, which is only
    sound while all three dynamic budget rules resolve to their gate
    constants at the driver's 500-vector gate corpus — pin that
    arithmetic so a constant edit cannot silently desync the Spark path
    from its oracle (ADVICE r9; width/entry scaling r11)."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        BEAM_ROUNDS,
        BEAM_W,
        N_ENTRY_SEEDS,
        TUNE_BEAM_WS,
        _ROUNDS_BASE,
        _beam_rounds,
        _beam_width,
        _entry_seeds,
    )

    assert _ROUNDS_BASE**BEAM_ROUNDS >= 500  # gate corpus fits the budget
    assert _beam_rounds(500) == BEAM_ROUNDS
    assert _beam_rounds(1) == BEAM_ROUNDS  # degenerate stores: the floor
    assert _beam_rounds(10_000) > BEAM_ROUNDS  # grows with the store
    # monotone: a bigger store never gets a smaller budget
    budgets = [_beam_rounds(n) for n in (10, 500, 2_000, 10**6, 10**9)]
    assert budgets == sorted(budgets)
    # the width and entry budgets share the rule family: exactly the gate
    # constants wherever the hop budget is at its floor, growing with it
    for n in (1, 500, 512):
        assert _beam_width(n) == BEAM_W
        assert _entry_seeds(n) == N_ENTRY_SEEDS
    assert _beam_width(2_000) > BEAM_W
    assert _entry_seeds(2_000) > N_ENTRY_SEEDS
    for rule in (_beam_width, _entry_seeds):
        vals = [rule(n) for n in (10, 500, 2_000, 10**6, 10**9)]
        assert vals == sorted(vals)
    # the tuning sweep's relative widths (w/8..w) reproduce TUNE_BEAM_WS
    # at the gate — the widths the pinned tuning oracle unrolls
    assert tuple(
        max(1, _beam_width(500) // d) for d in (8, 4, 2, 1)
    ) == tuple(sorted(TUNE_BEAM_WS))


def test_beam_entry_selection_is_top_k_not_global_sort(spark):
    """The md5-spread entry set must plan as TakeOrderedAndProject (a
    distributed top-K), never a single-partition global Sort — the
    100 TB posture of the seed pass."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        ann_graph_search,
    )
    from tests.conftest import SF_DIR

    df = ann_graph_search(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "TakeOrderedAndProject" in plan


def test_knn_graph_descent_convergence_early_exit(spark):
    """NN-Descent's natural termination (Dong et al. §2.3 at the strict
    delta=0 point, r11): a generous round budget exits at the first
    fixed point; the budget past convergence cannot change the relation
    (each round is a deterministic function of the edge set); and the
    default gate-scale budget sits BELOW the convergence point, so the
    golden-gated default path still runs its full log-rule rounds."""
    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as S,
    )
    from tests.conftest import SF_DIR

    out10 = S.knn_graph_descent(spark, SF_DIR, iters=10).toPandas()
    rounds = S._LAST_DESCENT_ROUNDS
    assert rounds < 10  # pre-converged store: the budget was not spent
    # fixed-point invariance, observed not just proven: truncating the
    # budget to exactly the executed rounds reproduces the relation
    out_exact = S.knn_graph_descent(spark, SF_DIR, iters=rounds).toPandas()
    key = ["vec_id", "rk"]
    assert out10.sort_values(key).reset_index(drop=True).equals(
        out_exact.sort_values(key).reset_index(drop=True)
    )
    # the default budget at the gate store (4 rounds for 500 vectors)
    # does not reach the fixed point: no early exit on the golden path
    S.knn_graph_descent(spark, SF_DIR, iters=4).count()
    assert S._LAST_DESCENT_ROUNDS == 4


def test_graph_index_on_disk_reproduces_in_session_search(spark, tmp_path):
    """build_graph_index + ann_graph_search_indexed is the deployment
    split (index built once, searched by later sessions, the
    build_ivf_index analog): the stored-edge search must reproduce the
    in-session ann_graph_search bit-for-bit — same budgets, tie-breaks
    and dot() contract, only the edge relation's storage differs."""
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        ann_graph_search,
        ann_graph_search_indexed,
        build_graph_index,
    )
    from tests.conftest import SF_DIR

    idx = str(tmp_path / "graph_index")
    build_graph_index(spark, SF_DIR, idx)
    key = ["query_id", "rk"]
    got = (
        ann_graph_search_indexed(spark, SF_DIR, idx)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = (
        ann_graph_search(spark, SF_DIR)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # and the stored index is self-contained: a fresh read plans no
    # dependence on the descent build's checkpoint (the edges come from
    # parquet — two FileScans: embeddings + index; no ExistingRDD leaf)
    df = ann_graph_search_indexed(spark, SF_DIR, idx)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "graph_index/edges" in plan
    assert "ExistingRDD" not in plan


def test_semantic_decontam_oracle_parity_and_invariants(spark, oracle):
    from tests.conftest import SF_DIR, assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as sim,
    )

    assert_parity(
        spark,
        oracle,
        sim.semantic_decontam_gate,
        sim.ORACLES["semantic_decontam"],
    )
    rows = sim.semantic_decontam_gate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # a contaminated doc is never itself benchmark; its match is
        assert r["vec_id"] % sim.DECON_SEM_MOD != 0
        assert r["benchmark_id"] % sim.DECON_SEM_MOD == 0
        assert r["cosine"] >= sim.SEM_DECON_THRESHOLD - 1e-6


def test_ann_ndcg_properties(spark, oracle):
    """nDCG@3 invariants: oracle parity; every score in [0,1]; DCG never
    exceeds the ideal DCG (the ANN candidate set is a subset of the
    corpus, so the brute-force ranking is the optimum); n_ann <= 3; and
    a query whose ANN list equals the ideal top-3 scores exactly 1.0."""
    from tests.conftest import SF_DIR, assert_parity

    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as sim,
    )

    assert_parity(spark, oracle, sim.ann_ndcg, sim.ORACLES["ann_ndcg"])
    out = sim.ann_ndcg(spark, SF_DIR).toPandas().set_index("query_id")
    assert len(out) == sim.N_QUERIES
    assert ((out["ndcg"] >= 0) & (out["ndcg"] <= 1)).all()
    assert (out["dcg"] <= out["idcg"] + 1e-9).all()
    assert (out["n_ann"] <= 3).all()
    ann = (
        sim.ann_bucketed_topk_gate(spark, SF_DIR)
        .toPandas()
        .sort_values(["query_id", "rk"])
    )
    ideal = (
        sim.ann_cosine_topk(spark, SF_DIR)
        .toPandas()
        .query("rk <= 3")
        .sort_values(["query_id", "rk"])
    )
    for qid in out.index:
        a = ann[ann["query_id"] == qid]["neighbor_id"].tolist()
        b = ideal[ideal["query_id"] == qid]["neighbor_id"].tolist()
        if a == b:
            assert out.loc[qid, "ndcg"] == 1.0, qid
