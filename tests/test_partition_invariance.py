"""Results must not depend on parallelism.

A 100 TB run executes the same logical plan over thousands of partitions;
any operator whose output depends on partition count or layout (RNG keyed
to partitions, order-sensitive float reductions surviving the rounding
contract, first()/collect_list without an order) would pass a fixed-
parallelism oracle gate and still drift on a real cluster.  This suite
re-runs a representative query slice under three shuffle-partition
settings (including 1, which serializes every reduction order) and
asserts byte-identical normalized output.

Float caveat: the engine's rounding contract (r6/r2) makes reduction-
order ulp differences collapse at 1e-6 except exactly at a rounding
boundary; the queries chosen here either reduce in integer space or have
their order-robustness guaranteed by construction (documented per query).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, normalize

# Queries spanning every shuffle-bearing shape: agg diamonds (term_stats),
# window top-k (top_keywords), banded self-join (dedup_minhash_lsh),
# iterative checkpointing (textrank_top5), hash-bucketed assignment
# (shard_shuffle, train_test_split), integer-exact scoring
# (classifier_score), full-outer diff (snapshot_diff), spine generation
# (timeseries_fill), and sessionization (user_sessions).
INVARIANCE_SLICE = [
    "term_stats",
    "top_keywords",
    "dedup_minhash_lsh",
    "textrank_top5",
    "shard_shuffle",
    "train_test_split",
    "classifier_score",
    "snapshot_diff",
    "timeseries_fill",
    "user_sessions",
    "cohort_retention",
    # sketch gates: the sketch values are partition-dependent, but the
    # emitted rows (counts + tolerance booleans) must not be
    "quantile_sketch",
    "distinct_sketch",
    # order-fixed float folds (scores summed over key-sorted arrays) and
    # quantized ranking must survive a serialized reduction order
    "bm25_search",
    "char_entropy",
    "ann_sq_topk",
    "embedding_quantize",
    # map-only chunking + the broadcast-bounded Bloom verdict
    "doc_chunks",
    "bloom_semijoin",
    # r9 additions: df-capped+degree-capped edge graph (windows ordered by
    # the deterministic weight tree), quality-canonical dedup (argmax over
    # rounded quality), and beam search over the kNN graph (id tie-breaks,
    # shared dot() contract) — each must survive a serialized reduction
    "graph_lpa_capped",
    "dedup_keep_best",
    "ann_graph_search",
    # r13 additions: banded media pair generation + iterative min-label
    # components (integer space end-to-end), the tri-modal full-outer
    # agreement matrix, and the decontam argmax (raw-double ordering on
    # the order-fixed dot fold with id tie-break) — each must survive a
    # serialized reduction order
    "video_near_dups",
    "image_dedup_clusters",
    "trimodal_dedup_audit",
    "semantic_decontam",
    # r14 addition (ADVICE r13): the mixture normalizers are now integer
    # sums end-to-end (p_mix derives from pa_micro) — pin that the whole
    # mixture frame survives a serialized reduction order
    "source_mixture",
    # late-r14 additions: the layout sweep reduces in integer space and
    # its two ratios divide exact integers (never-round-a-rational);
    # the hard-negative ranks order by the rounded cosine's RAW value
    # with id tie-break over the order-fixed dot fold; the CCNet row is
    # counts + tolerance booleans around a partition-dependent sketch
    # (the quantile_sketch discipline)
    "minhash_band_tuning",
    "hard_negative_mining",
    "ccnet_buckets",
    # r15 additions (ADVICE r14 / VERDICT r14 task 7): the wide-family
    # production forms — same integer band/bucket spaces at 64-bit/
    # 8-hyperplane width, the wide-detector audit composition, and the
    # wide multi-probe top-k (raw-double ordering over the order-fixed
    # dot fold with id tie-break) — each must survive a serialized
    # reduction order
    "video_near_dups_wide",
    "audio_near_dups_wide",
    "image_near_dups_wide",
    "embedding_near_dups_wide",
    "embedding_ingest_wide",
    "ann_bucketed_topk_wide",
    "semantic_dedup_wide",
    "trimodal_dedup_audit_wide",
    # late-r15 lifecycle symmetry: wide components (integer min-label
    # loop) and the wide stream-static gate
    "audio_dedup_clusters_wide",
    "phash_ingest_wide",
    # late-r15 bitext mining: margins divide order-fixed cosine folds by
    # id-sorted denominator sums — the whole chain must survive a
    # serialized reduction order
    "bitext_mining",
    # r16 additions: the within-doc trim is row-local (trivially
    # invariant — this pins it stays that way); corpus BLEU's integer
    # component sums and its log/exp chain over them must survive a
    # serialized reduction order
    "doc_repetition_strip",
    "bleu_corpus",
]

PARTITION_SETTINGS = ["1", "7", "32"]


@pytest.mark.parametrize("name", INVARIANCE_SLICE)
def test_partition_count_does_not_change_results(spark, name):
    fn = entry_mod.queries()[name]
    baseline = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in PARTITION_SETTINGS:
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(normalize(fn(spark, SF_DIR).toPandas()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline)
    for other, n in zip(results[1:], PARTITION_SETTINGS[1:]):
        assert results[0].equals(other), (
            f"{name}: output differs between shuffle.partitions="
            f"{PARTITION_SETTINGS[0]} and {n}"
        )
