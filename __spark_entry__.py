"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``bigdataanalytics_textsummarization_spark/``;
this module only aggregates their QUERIES/ORACLES registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataanalytics_textsummarization_spark import (  # noqa: E402
    graph,
    lsa,
    mllib_variants,
    pagerank,
    relational,
    relational_ext,
    tpch,
    rouge,
    text,
)
from bigdataanalytics_textsummarization_spark.extensions import (  # noqa: E402
    curation,
    dedup,
    multimodal,
    similarity,
    snapshot,
    text_analysis,
)
from bigdataanalytics_textsummarization_spark.streaming import (  # noqa: E402
    events as streaming_events,
)

# Ordered so a budget-capped driver reaches everything that still needs a
# fresh row.  Round-5 rotation: every query has had a green row in some
# round (r4 VERDICT), so the window now REFRESHES the oldest standing
# rows (r1/r2: text, graph, pagerank, relational, rouge, dedup) while
# recently-certified modules rotate to the back.
_MODULES = [
    text,  # r2 rows, never refreshed
    graph,  # r1 rows ("graph family" refresh per r4 VERDICT task 8)
    pagerank,  # r1 rows (textrank_*)
    relational,  # r1/r2 rows
    rouge,  # r2 rows
    dedup,  # r2 rows
    streaming_events,
    multimodal,
    curation,
    snapshot,
    mllib_variants,
    similarity,
    lsa,
    text_analysis,
    relational_ext,
    tpch,  # refreshed in r4 (was first in line)
]

# Individual queries that MUST land inside the driver's 50-query budget
# window this round, ahead of their module's position: new this round or
# changed-since-last-green (as now mechanically enforced by
# scripts/check_recert.py — it diffs each query's cross-module AST
# closure against the tree its last green artifact was committed on).
#
# Round-7 rotation (VERDICT r6 task 3): r6 burned all 50 slots
# re-certifying r5's exact window, so this round the window is rebuilt
# as (a) the queries whose BEHAVIOR changed this round — the -0.0
# convention fix (embedding_cov, red in r5+r6), the pagerank lazy
# checkpoint (textrank_*), the LSA dispatch-memo fix (lsa_summary), the
# recall-gate loud-fail/coalesce fixes (ann_recall_sweep,
# knn_graph_recall) — then (b) every query whose last green row is
# OLDEST: the single r1 row (sales_pivot), all 27 r2-era rows, and the
# alphabetically-first r3-era rows up to the 50 budget.  44 of 50 names
# are disjoint from r6's window.  (The +0.0 oracle sweep technically
# touched all 165 closures; value-wise it is the identity everywhere
# except -0.0, verified by scripts/driver_sim.py's bit-exact 165/165
# sweep at sf0.01 — so re-certification is prioritized by staleness,
# not by that mechanical diff.)
# Round-8 window (VERDICT r7 task 1): 50 slots = (a) the four queries NEW
# this round, (b) every query whose closure changed this round (the
# leaf()/session_memo construct-time work in text/graph/pagerank — values
# verified bit-exact vs the pre-leaf plans by driver_sim at sf0.01 AND
# sf0.1 — plus rfm_segments' r2 routing), then (c) the staged
# _PRIORITY_R7_OVERFLOW queue OLDEST-FIRST (r3-era names first, exactly
# the order the r7 verdict prescribed) up to the budget.  48/50 names are
# disjoint from the r7 window (only textrank_ranks/textrank_top5 repeat —
# their closures changed again).  Stragglers remain staged for r9 via the
# overflow list below.
_PRIORITY_R8 = [
    # (a) new this round
    "embedding_cov_gram_check",  # 100 TB Gramian covariance, driver-gated
    "ppm_files_decode",  # file-system ingest edges (real files on disk)
    "wav_files_decode",
    "tar_shards_roundtrip",
    # (b) closure changed this round (scripts/check_recert.py list)
    "sentences",
    "tokens_lsa",
    "tokens_textrank",
    "tokens_wordnet",
    "tf_map",
    "vocabulary",
    "term_stats",
    "top_keywords",
    "similarity_edges",
    "graph_triangles",
    "graph_khop",
    "graph_lpa",
    "textrank_ranks",
    "textrank_top5",
    "rfm_segments",
    # (c) staged overflow, oldest-first (r3-era)
    "embedding_quantize",
    "gopher_rules",
    "mixture_sample",
    "ppl_ingest",
    "source_mixture",
    "substring_dedup",
    "tfidf_topk_mllib",
    "ann_ivfpq_recall",
    "ann_pq_recall",
    "asof_click_attribution",
    "basket_lift",
    "centroid_eval",
    "contrastive_pairs",
    "dedup_containment",
    "event_transitions",
    "events_in_sessions",
    "knn_accuracy",
    "lineitem_stats",
    "pmi_edges",
    "price_percentiles",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
]

_PRIORITY_R7 = [
    # (a) new this round: real RIFF/PCM WAV decode (stdlib wave parser),
    # the audio twin of multimodal_decode's PPM path
    "wav_decode",
    # behavior changed this round
    "embedding_cov",
    "textrank_ranks",
    "textrank_top5",
    "lsa_summary",
    "ann_recall_sweep",
    "knn_graph_recall",
    # (b) oldest standing rows: r1
    "sales_pivot",
    # r2-era rows (last green: CORRECTNESS_r02)
    "ann_bucketed_topk",
    "ann_cosine_topk",
    "ann_cosine_topk_arrow",
    "bigram_lm",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "doc_fingerprint",
    "doc_repetition",
    "embedding_near_dups",
    "events_by_segment",
    "events_dedup",
    "events_sliding",
    "frame_sample",
    "image_resize",
    "lang_id",
    "minhash_signatures",
    "multimodal_features",
    "near_dup_ingest",
    "pii_scrub",
    "quality_score",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "stratified_sample",
    "token_count",
    "topk_ngrams",
    "user_sessions",
    "view_click_pairs",
    # r3-era rows (alphabetical; the rest of r3 rotates to round 8)
    "ann_sq_topk",
    "audio_resample",
    "bloom_semijoin",
    "bm25_search",
    "bpe_encode",
    "bpe_vocab",
    "char_entropy",
    "classifier_score",
    "clf_ingest",
    "cohort_retention",
    "compression_ratio",
    "contamination_check",
    "curation_pipeline",
    "doc_perplexity",
    "embedding_rp",
]

_PRIORITY_R6 = [
    # new this round: genuine PPM payload + real format-parsing decode
    "multimodal_decode",
    # new this round: train/eval n-gram decontamination gate + per-domain
    # admission caps (Common-Crawl per-host cap shape)
    "benchmark_decontam",
    "domain_caps",
    # new this round: covariance (SQL-gated) + PCA projection
    # (golden-gated) for the embedding store
    "embedding_cov",
    "embedding_pca",
    # new this round: IVF recall-vs-nprobe tuning curve (determinate facts:
    # monotone by theorem, exhaustive row identically brute force)
    "ann_recall_sweep",
    # new this round: per-language subwords-per-word under the learned BPE
    "tokenizer_fertility",
    # new this round: NN-Descent kNN graph (golden) + its recall gate
    "knn_graph_descent",
    "knn_graph_recall",
    # new this round: label-propagation communities (unrolled-CTE oracle)
    "graph_lpa",
    # new this round: row-level MERGE INTO (merge == target is the gate)
    "merge_upsert",
    # changed this round: size-dispatched LSA (applyInPandas vs MLlib SVD
    # routed per-source by matrix cells) — golden oracles unchanged
    "lsa_concepts",
    "lsa_summary",
    "lsa_concepts_distributed",
    # changed this round: quintile numerator now casts to long BEFORE the
    # multiply (ADVICE.md 32-bit wrap past ~429M customers)
    "rfm_segments",
    # changed in r4 AFTER their last green rows (recall-verdict coalesce
    # fix) — the drift the judge caught by hand and check_recert.py now
    # catches mechanically
    "ann_ivf_recall",
    "minhash_lsh_mllib_recall",
    # flagged by check_recert.py: closure drifted since their r1/r2 rows
    # (shared-helper changes in later rounds); re-certify
    "dedup_ngram_jaccard",
    "train_test_split",
    "similarity_edges",
    "textrank_ranks",
    "textrank_top5",
    "top_keywords",
]

# Staged overflow (r7): the +0.0 -0.0-guard sweep mechanically changed
# these queries' closures too, but the 50-slot driver budget is already
# spent on the rotation window above.  They are STAGED here — behind the
# window, age-ordered — so check_recert sees them queued and rounds 8+
# rotate them in.  Interim evidence they did not regress: the bit-exact
# 165/165 driver_sim sweep at sf0.01 after the sweep (the +0.0 guard is
# the identity on every value except -0.0 by IEEE-754).
_PRIORITY_R7_OVERFLOW = [
    "embedding_quantize",  # displaced from the window by wav_decode
    "gopher_rules",
    "mixture_sample",
    "ppl_ingest",
    "source_mixture",
    "substring_dedup",
    "tfidf_topk_mllib",
    "ann_ivfpq_recall",
    "ann_pq_recall",
    "asof_click_attribution",
    "basket_lift",
    "centroid_eval",
    "contrastive_pairs",
    "dedup_containment",
    "event_transitions",
    "events_in_sessions",
    "knn_accuracy",
    "lineitem_stats",
    "pmi_edges",
    "price_percentiles",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "rich_customers_sql",
    "sales_cube",
    "sales_grouping_sets",
    "stupid_backoff",
    "tfidf_doc_topk",
    "user_value_moving_avg",
    "vocab_kl_drift",
    "weighted_sample",
    "ann_ivf_recall",
    "dedup_ngram_jaccard",
    "embedding_pca",
    "events_hourly",
    "events_json_stats",
    "knn_graph_descent",
    "lsa_concepts",
    "lsa_concepts_distributed",
    "minhash_lsh_mllib_recall",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "rouge_l",
    "rouge_n",
    "rouge_n_relational",
    "rouge_n_stemmed",
    "rouge_sweep",
    "rouge_sweep_stemmed",
    "sales_rollup",
    "similarity_edges",
    "term_stats",
    "top_customers_per_nation",
    "top_keywords",
]

# Round-9 window (VERDICT r8 tasks 1+6): 50 slots = (a) the four
# never-driver-certified rows (the three r8-staged round-trips plus
# graph_lpa_capped, new this round), (b) the rest of _PRIORITY_R8_STAGED,
# (c) every query whose closure changed under this round's code — the
# multimodal real-decode graduation, embedding_pca's Gramian routing, the
# leaf() session-keying + mid-loop checkpoint retirement (graph/pagerank/
# text/lsa families — values verified bit-exact by driver_sim at sf0.01
# before staging), then (d) the changed-since-green overflow OLDEST-first
# (r4-era greens before r6-era).  Four twins/recall-companions spill past
# the budget to _PRIORITY_R9_SPILL (still staged, r10 certifies them).
_PRIORITY_R9 = [
    # (a) never certified
    "bpe_roundtrip",
    "jsonl_roundtrip",
    "orc_roundtrip",
    "graph_lpa_capped",
    # (b) r8-staged remainder
    "tokenizer_fertility",
    "tfidf_doc_topk",
    "dedup_clusters",
    "bpe_vocab",
    "knn_graph_descent",
    "curation_pipeline",
    "bpe_encode",
    # (c) closure changed by r9 code (grouped by family for leaf/memo
    # reuse in the driver's single-session sweep)
    "image_resize",
    "frame_sample",
    "audio_resample",
    "embedding_pca",
    "embedding_cov_gram_check",
    "similarity_edges",
    "graph_triangles",
    "graph_khop",
    "graph_lpa",
    "knn_graph_recall",
    "textrank_ranks",
    "textrank_top5",
    "term_stats",
    "top_keywords",
    "lsa_summary",
    "lsa_concepts",
    "dedup_ngram_jaccard",
    # (d) changed-since-green overflow, oldest green first (r4-era)
    "q8_market_share",
    "q9_product_profit",
    "rich_customers_sql",
    "sales_cube",
    "sales_grouping_sets",
    "stupid_backoff",
    "user_value_moving_avg",
    "vocab_kl_drift",
    "weighted_sample",
    # (d) r6-era greens
    "events_hourly",
    "events_json_stats",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "rouge_l",
    "rouge_n",
    "rouge_n_relational",
    "rouge_n_stemmed",
    "rouge_sweep",
    "rouge_sweep_stemmed",
    "sales_rollup",
    "top_customers_per_nation",
]

# Round-10 window (VERDICT r9 tasks 1+4): 50 slots, composed straight
# from the check_recert enumeration at r10 HEAD — (a) the four
# never-driver-certified rows (the r9 spill), (b) the four r9-spill
# changed-since-green rows, (c) every query whose closure changed under
# r10 code (the graph-ANN multi-entry/symmetrized rewrite, the
# multimodal_features real-parse graduation, embedding_pca's empty
# guard, the leaf()-session-identity + ranks_from retire edits reaching
# the graph/textrank/term_stats families — all verified bit-exact at
# sf0.01 by driver_sim before staging), then (d) the 17 r3-era and (e)
# the 14 r4-era oldest standing greens.  4+4+11+17+14 = exactly the
# 50-slot budget; after r10 no registered query's newest driver row
# predates r6.
# Round-11 window (VERDICT r10 task 1): lead with the four r10-spill
# never-certified rows, then the new r11 query, then everything whose
# closure changed under the r11 code (graph-ANN budget scaling + descent
# early-exit + the near-dup candidate-set refactor), then the oldest
# standing greens — all 10 r6-era rows and the oldest 29 of the r7-era
# rows (the remaining 7 r7 rows queue in _PRIORITY_R11_SPILL for r12).
_PRIORITY_R11 = [
    # (a) never certified (r10 spill, __spark_entry__.py r10 note)
    "corpus_diversity",
    "vocab_growth",
    "token_budget_mixture",
    "hybrid_dedup_audit",
    # (b) new in r11 (VERDICT r10 tasks 3 and 6)
    "corpus_diversity_sketch",
    "token_budget_mixture_salted",
    # (c) closure changed by r11 code: the beam family (width/entry
    # scaling), the descent family (convergence early-exit), the
    # bucket-pair refactor behind the hybrid audit, and the mixture pair
    # (quota hardened to the order-fixed integer chain — quota gates
    # mixture_sample's membership, the token_budget_mixture flake class)
    "source_mixture",
    "mixture_sample",
    "knn_graph_descent",
    "knn_graph_recall",
    "ann_graph_search",
    "ann_graph_search_recall",
    "ann_graph_tuning",
    "embedding_near_dups",
    # (c cont.) the dedup family over the now leaf-shared LSH pair table
    "dedup_clusters",
    "dedup_keep_best",
    "contrastive_pairs",
    "curation_pipeline",
    # (d) r6-era greens — the oldest standing rows in the registry
    "benchmark_decontam",
    "customers_with_open_orders",
    "customers_without_orders",
    "dedup_exact",
    "domain_caps",
    "merge_upsert",
    "multimodal_decode",
    "order_priority_check",
    "segment_custkey_setops",
    "train_test_split",
    # (e) r7-era greens, family-grouped for leaf/memo reuse in the
    # driver's single-session sweep: embedding/ANN family first (shares
    # the _embeddings leaf with (c)), then dedup, text, events
    "ann_bucketed_topk",
    "ann_cosine_topk",
    "ann_cosine_topk_arrow",
    "ann_recall_sweep",
    "ann_sq_topk",
    "embedding_cov",
    "embedding_rp",
    "minhash_signatures",
    "dedup_minhash_lsh",
    "near_dup_ingest",
    "simhash_fingerprints",
    "contamination_check",
    "doc_fingerprint",
    "bigram_lm",
    "bloom_semijoin",
    "bm25_search",
    "char_entropy",
    "classifier_score",
    "clf_ingest",
    "compression_ratio",
    "doc_repetition",
    "lang_id",
]

# Round-12 window (VERDICT r11 tasks 1-3+5): 50 slots = (a) the six
# never-certified rows — the DSIR trio (led the r11 spill; the LM
# scalar-total windows were replaced by a 1-row agg broadcast this round
# and the trio re-verified ALL MATCH by driver_sim at sf0.01 before
# staging), the on-disk graph-ANN search (build -> persist -> search,
# same beam-CTE oracle as the in-session path), and the new image
# perceptual-hash near-dup pair — then (b) ALL 14 r7-era greens (the 8
# the r11 verdict named plus the 6 other _PRIORITY_R11_SPILL leftovers),
# then (c) the alphabetically-first 30 of the 38 r8-era greens (the r7
# precedent's tie-break within an era).  6 + 14 + 30 = exactly the
# 50-slot budget; the 8 r8-era leftovers queue in _PRIORITY_R12_SPILL
# for r13, after which the oldest standing green is r8-era.
_PRIORITY_R12 = [
    # (a) never certified
    "dsir_weights",
    "dsir_sample",
    "dsir_ingest",
    "ann_graph_search_indexed",
    "image_phash",
    "image_near_dups",
    "phash_ingest",  # late-r12: the streaming image-ingest gate's batch
    # twin (stream==batch proof in tests/test_streaming.py)
    "image_dedup_clusters",  # late-r12: components over the phash pairs
    "audio_fingerprint",  # late-r12: the acoustic dedup twin (sign-of-
    "audio_near_dups",    # derivative fp over real wave-parsed PCM)
    # (each late-r12 query takes the slot of an alphabetically-last
    # r8-era name, which moves to the spill so the rotation loses
    # nothing)
    # (b) r7-era greens — the oldest standing rows in the registry
    "pii_scrub",
    "quality_score",
    "sales_pivot",
    "cohort_retention",
    "events_by_segment",
    "events_dedup",
    "events_sliding",
    "simhash_near_pairs",
    "stratified_sample",
    "token_count",
    "topk_ngrams",
    "user_sessions",
    "view_click_pairs",
    "wav_decode",
    # (c) r8-era greens, alphabetical up to the budget
    "ann_ivfpq_recall",
    "ann_pq_recall",
    "asof_click_attribution",
    "basket_lift",
    "centroid_eval",
    "dedup_containment",
    "embedding_quantize",
    "event_transitions",
    "events_in_sessions",
    "gopher_rules",
    "knn_accuracy",
    "lineitem_stats",
    "pmi_edges",
    "ppl_ingest",
    "ppm_files_decode",
    "price_percentiles",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
]

# Round-14 window (VERDICT r13 task 2): 50 slots — (a) ALL 22
# _PRIORITY_R13_SPILL names (the whole r9-era freshness debt; the rouge
# family stays adjacent for leaf reuse), (b) the 6 changed-since-green
# rows (the narrow video family through the variable-length change:
# n_frames in the band key, length-scaled threshold; the mixture pair
# through the p_mix-from-pa_micro fold-order fix — every one re-verified
# MATCH at sf0.01 by driver_sim before staging), (c) the 12 new r14
# queries (the production-width media fingerprints/pairs of VERDICT r13
# task 3, each full-SQL-gated with HUGEINT-interim oracles; the
# rfm_segments_approx sketch-cutpoint twin of task 6; and the seven
# late-r14 additions: minhash_band_tuning, hard_negative_mining,
# ccnet_buckets, boilerplate_strip, embedding_ingest + its wide twin,
# embedding_near_dups_wide), and (d) the alphabetically-first 10 of the
# 46 r10-era greens.  22+6+12+10 = exactly the 50-slot budget; the 36
# r10-era leftovers stay queued via
# Round-15 window (VERDICT r14 tasks 1-2+4-5): 50 slots — (a) the
# never-certified r15 queries (the wide production forms of the four
# narrow sign-bucket consumers, the wide-detector audit twins and the
# wide image family, each verified ALL MATCH at sf0.001 + sf0.01 by
# driver_sim before staging), (b) every closure check_recert flags as
# changed this round (the _bucket_of(dims)/_line_occ shared-helper
# refactors plus the ccnet NULL-lang sentinel and the band-tuning
# nullif guard — values verified bit-exact by driver_sim at both gate
# scales before staging), then (c) the queued r10-era greens from
# _PRIORITY_R10, oldest-first alphabetical up to the budget (the
# remainder stays queued via _PRIORITY_R10 — the rotation loses
# nothing).
_PRIORITY_R15 = [
    # (a) never certified (8) — wide production forms beside their
    # families: the four sign-bucket consumers' wide twins, the wide
    # image detector pair, and the wide-detector audit twins
    "ann_bucketed_topk_wide",
    "semantic_dedup_wide",
    "semantic_decontam_wide",
    "hybrid_dedup_audit_wide",
    "image_phash_wide",
    "image_near_dups_wide",
    "multimodal_dedup_audit_wide",
    "trimodal_dedup_audit_wide",
    # (b) changed-since-green (19, the full check_recert enumeration):
    # the sign-bucket family over the shared _bucket_of /
    # _bucket_cosine_pairs builders (family-grouped for leaf/memo
    # reuse), the _banded_pairs image/audio candidate families and the
    # audits composed over them, the _line_occ pair, then the two
    # advice fixes
    "ann_bucketed_topk",
    "embedding_near_dups",
    "embedding_near_dups_wide",
    "embedding_ingest",
    "semantic_dedup",
    "semantic_decontam",
    "hybrid_dedup_audit",
    "decontam_audit",
    "image_near_dups",
    "image_dedup_clusters",
    "audio_near_dups",
    "audio_near_dups_wide",
    "audio_dedup_clusters",
    "multimodal_dedup_audit",
    "trimodal_dedup_audit",
    "line_dedup",
    "boilerplate_strip",
    "ccnet_buckets",
    "minhash_band_tuning",
    # (b cont., late r15) production-width lifecycle symmetry: the six
    # wide cluster/ingest queries (never certified) ride beside their
    # families, and the three narrow gates whose shared
    # _ingest_gate_join closure changed re-certify with them — each
    # verified ALL MATCH at sf0.001 + sf0.01 by driver_sim before
    # staging; each takes the slot of an alphabetically-last r10-era
    # name that stays queued via _PRIORITY_R10 (the r12-r14 late-round
    # precedent, the rotation loses nothing)
    "image_dedup_clusters_wide",
    "audio_dedup_clusters_wide",
    "video_dedup_clusters_wide",
    "phash_ingest_wide",
    "audio_fp_ingest_wide",
    "video_fp_ingest_wide",
    "phash_ingest",
    "audio_fp_ingest",
    "video_fp_ingest",
    # (b cont., late r15) margin-criterion bitext mining, both widths
    # (never certified; ALL MATCH at sf0.001 + sf0.01 before staging;
    # same displacement rule as above)
    "bitext_mining",
    "bitext_mining_wide",
    # (c) r10-era greens from the _PRIORITY_R10 queue, alphabetical up
    # to the 50-slot budget (8 + 19 + 11 + 12; the tail past the cut —
    # partition_rewrite_plan..zorder_stats and the textrank/term_stats
    # group — stays queued via _PRIORITY_R10)
    "graph_lpa",
    "graph_lpa_capped",
    "graph_triangles",
    "heavy_hitters_sketch",
    "incremental_agg",
    "key_skew_profile",
    "length_outliers",
    "lsa_concepts_distributed",
    "minhash_lsh_mllib_recall",
    "multimodal_features",
    "ngram_novelty",
    "pack_sequences",
]

# _PRIORITY_R10 below.  After r14 certifies, the oldest standing green
# is r10-era.
_PRIORITY_R14 = [
    # (a) the full r13 spill — oldest standing greens (r9-era)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q9_product_profit",
    "rich_customers_sql",
    "rouge_l",
    "rouge_n",
    "rouge_n_relational",
    "rouge_n_stemmed",
    "rouge_sweep",
    "rouge_sweep_stemmed",
    "sales_cube",
    "sales_grouping_sets",
    "sales_rollup",
    "stupid_backoff",
    "tfidf_doc_topk",
    "tokenizer_fertility",
    "top_customers_per_nation",
    "user_value_moving_avg",
    "vocab_kl_drift",
    "weighted_sample",
    # (b) changed-since-green: the variable-length video family (shared
    # fingerprint leaf), then the mixture pair (shared quota chain)
    "video_fingerprint",
    "video_near_dups",
    "video_fp_ingest",
    "video_dedup_clusters",
    "source_mixture",
    "mixture_sample",
    # (c) new in r14: production-width media (fingerprint leaf shared
    # within each modality), the sketch-cutpoint RFM twin, then the
    # seven late-r14 additions (LSH band-layout sweep beside its
    # signature family, embedding hard negatives, CCNet terciles riding
    # doc_perplexity, the C4 boilerplate transform, and the
    # embedding-ingest trio — each verified ALL MATCH at sf0.01 by
    # driver_sim before staging;
    # each takes the slot of an alphabetically-last r10-era name that
    # stays queued via _PRIORITY_R10, the r12/r13 late-round precedent)
    "video_fingerprint_wide",
    "video_near_dups_wide",
    "audio_fingerprint_wide",
    "audio_near_dups_wide",
    "rfm_segments_approx",
    "minhash_band_tuning",
    "hard_negative_mining",
    "ccnet_buckets",
    "boilerplate_strip",
    "embedding_ingest",
    "embedding_ingest_wide",
    "embedding_near_dups_wide",
    # (d) r10-era greens, alphabetical up to the budget
    "ann_ivf_recall",
    "distinct_sketch",
    "doc_chunks",
    "doc_perplexity",
    "dq_checks",
    "embedding_pca",
    "event_anomalies",
    "event_funnel",
    "events_typed_props",
    "graph_khop",
]

# Round-13 window (VERDICT r12 tasks 1-4+7): 50 slots composed from the
# check_recert enumeration at r13 HEAD — (a) 10 never-certified r13
# queries (the video family, acoustic gate, audits incl. the late-r13
# family-symmetry additions), (b) 15 changed-since-green rows, (c) 12
# r8-era spill greens, (d) 13 r9-era greens up to the 50-slot budget
# (10+15+12+13; the late-r13 additions displaced the alphabetical tail
# of (d) into _PRIORITY_R13_SPILL — ADVICE r13: this header previously
# described the pre-displacement 4+15+12+19 arithmetic).
_PRIORITY_R13 = [
    # (a) never certified — the video family first (shared fingerprint
    # leaf), then the acoustic gate beside its family, then the audit
    # beside the dedup rows below.  Late-r13 family-symmetry queries
    # (video gate + audio/video clusters, each verified ALL MATCH by
    # driver_sim before staging) ride beside their families, each taking
    # the slot of an alphabetically-last r9-era name that moves to the
    # spill head — the r12 late-round precedent, the rotation loses
    # nothing
    "video_fingerprint",
    "video_near_dups",
    "video_fp_ingest",  # late r13
    "video_dedup_clusters",  # late r13
    "audio_fp_ingest",
    "audio_dedup_clusters",  # late r13
    "multimodal_dedup_audit",
    "trimodal_dedup_audit",  # late r13: the full agreement matrix
    "semantic_decontam",  # late r13: embedding-side benchmark decontam
    "decontam_audit",  # late r13: lexical vs semantic decontam agreement
    # (b) changed-since-green, family-grouped: image hash family (shared
    # phash leaf), audio family, the frame walker's keyframe pass
    "image_phash",
    "image_near_dups",
    "phash_ingest",
    "image_dedup_clusters",
    "audio_fingerprint",
    "audio_near_dups",
    "frame_sample",
    # (b cont.) dedup-cluster family over the shared LSH pair leaf
    "dedup_clusters",
    "dedup_keep_best",
    "curation_pipeline",
    # (b cont.) the mixture quartet (scalar totals now 1-row agg
    # broadcasts over a leafed per-source frame) + the hardened index
    "source_mixture",
    "mixture_sample",
    "token_budget_mixture",
    "token_budget_mixture_salted",
    "ann_graph_search_indexed",
    # (c) the 12 r8-era spill greens — the oldest standing rows
    "q7_volume_shipping",
    "rfm_segments",
    "sentences",
    "substring_dedup",
    "tar_shards_roundtrip",
    "tf_map",
    "tfidf_topk_mllib",
    "tokens_lsa",
    "tokens_textrank",
    "tokens_wordnet",
    "vocabulary",
    "wav_files_decode",
    # (d) r9-era greens, alphabetical up to the budget
    "audio_resample",
    "bpe_encode",
    "bpe_roundtrip",
    "bpe_vocab",
    "dedup_ngram_jaccard",
    "embedding_cov_gram_check",
    "events_hourly",
    "events_json_stats",
    "image_resize",
    "jsonl_roundtrip",
    "lsa_concepts",
    "lsa_summary",
    "orc_roundtrip",
]

# Over-budget r13 queue, r14 leads with it: the r9-era greens past the
# alphabetical cut (the rouge family groups back together here, so the
# r14 window keeps the leaf/memo reuse when they rotate in).
_PRIORITY_R13_SPILL = [
    # displaced by the late-r13 additions (see _PRIORITY_R13)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q9_product_profit",
    "rich_customers_sql",
    "rouge_l",
    "rouge_n",
    "rouge_n_relational",
    "rouge_n_stemmed",
    "rouge_sweep",
    "rouge_sweep_stemmed",
    "sales_cube",
    "sales_grouping_sets",
    "sales_rollup",
    "stupid_backoff",
    "tfidf_doc_topk",
    "tokenizer_fertility",
    "top_customers_per_nation",
    "user_value_moving_avg",
    "vocab_kl_drift",
    "weighted_sample",
]

# Over-budget r12 queue, r13 leads with it: the r8-era greens past the
# alphabetical cut (text-family names group back together here, so the
# r13 window keeps the leaf/memo reuse when they rotate in).
_PRIORITY_R12_SPILL = [
    "q7_volume_shipping",
    "rfm_segments",
    "sentences",
    "substring_dedup",
    "tar_shards_roundtrip",
    "tf_map",
    "tfidf_topk_mllib",
    "tokens_lsa",
    "tokens_textrank",
    "tokens_wordnet",
    "vocabulary",
    "wav_files_decode",
]

# Over-budget r11 queue, r12 leads with it: first the new-in-r11
# never-certified pair (DSIR importance weights + resampled epoch, both
# full-SQL-gated and verified bit-exact at sf0.001/0.01/0.1 by
# driver_sim before staging), then the r7-era greens the 50-slot budget
# displaced — oldest-first rotation continues from here.
_PRIORITY_R11_SPILL = [
    "dsir_weights",
    "dsir_sample",
    "dsir_ingest",
    "pii_scrub",
    "quality_score",
    "sales_pivot",
    "cohort_retention",
    "events_by_segment",
    "events_dedup",
    "events_sliding",
    "simhash_near_pairs",
    "stratified_sample",
    "token_count",
    "topk_ngrams",
    "user_sessions",
    "view_click_pairs",
    "wav_decode",
]

_PRIORITY_R10 = [
    # (a) never certified
    "dedup_keep_best",
    "ann_graph_search",
    "ann_graph_search_recall",
    "ann_graph_tuning",
    # (b) r9-spill changed-since-green
    "doc_perplexity",
    "ann_ivf_recall",
    "minhash_lsh_mllib_recall",
    "lsa_concepts_distributed",
    # (c) closure changed by r10 code (family-grouped for leaf/memo
    # reuse in the driver's single-session sweep)
    "multimodal_features",
    "embedding_pca",
    "similarity_edges",
    "graph_triangles",
    "graph_khop",
    "graph_lpa",
    "graph_lpa_capped",
    "textrank_ranks",
    "textrank_top5",
    "term_stats",
    "top_keywords",
    # (d) r3-era greens, oldest standing rows in the registry
    "event_anomalies",
    "event_funnel",
    "heavy_hitters_sketch",
    "length_outliers",
    "line_dedup",
    "ngram_novelty",
    "pack_sequences",
    "partition_rewrite_plan",
    "quantile_sketch",
    "semantic_dedup",
    "shard_shuffle",
    "snapshot_diff",
    "snapshot_drift",
    "table_profile",
    "text_normalize",
    "timeseries_fill",
    "typo_pairs",
    # (e) r4-era greens
    "distinct_sketch",
    "doc_chunks",
    "dq_checks",
    "events_typed_props",
    "incremental_agg",
    "key_skew_profile",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q16_parts_supplier_count",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "salted_heavy_agg",
    "salted_join",
    "zorder_stats",
]

# New-in-r10 queries that did not displace the verdict-prescribed window
# composition (the 50 slots above are exactly the never-certified +
# changed-since-green + oldest-green rotation): staged here so
# check_recert sees them queued; round 11 leads with them.  Both are
# full-SQL-gated and verified bit-exact at sf0.001 + sf0.01 by
# driver_sim before staging.
_PRIORITY_R10_SPILL = [
    "corpus_diversity",  # distinct-1/2/3 (Li et al.) in exact milli-units
    "vocab_growth",  # Heaps'-law curve over nested md5-bucket prefixes
    "token_budget_mixture",  # token-quota epoch cut (mixtures are tokens)
    "hybrid_dedup_audit",  # lexical-vs-semantic near-dup agreement pairs
]

# Changed-since-green names that did not fit the 50-slot budget: twins and
# recall companions whose drift is the mechanical shared-helper kind (their
# primaries ARE in the window).  Staged here so check_recert sees them
# queued; round 10 leads with them.
_PRIORITY_R9_SPILL = [
    "dedup_keep_best",  # NEW late-r9 (quality-canonical fuzzy dedup):
    # bit-exact locally at sf0.01 + sf0.1, staged for its first driver row
    "ann_graph_search",  # NEW late-r9 (HNSW-style beam search over the
    "ann_graph_search_recall",  # kNN graph): gate-verified locally
    "ann_graph_tuning",  # NEW late-r9: recall-vs-beam-width curve
    "doc_perplexity",
    "ann_ivf_recall",
    "minhash_lsh_mllib_recall",
    "lsa_concepts_distributed",
]

# Staged for the r9 window (behind the r8 budget): new-this-round queries
# that did not displace the verdict-prescribed oldest-first rotation.
_PRIORITY_R8_STAGED = [
    "jsonl_roundtrip",  # JSONL ingest edge, pytest + full oracle ready
    # closure changed late in r8 (checkpoint-ownership pass + the
    # tfidf_doc_topk pin): values verified bit-exact at sf0.01 + sf0.1
    "tokenizer_fertility",
    "tfidf_doc_topk",
    "dedup_clusters",
    "bpe_vocab",
    "knn_graph_descent",
    "curation_pipeline",
    # BPE decode certificate (new late r8): pieces must concatenate back
    # to each vocab word — the lossless-segmentation gate bpe_encode's
    # count gate cannot see
    "bpe_roundtrip",
    "bpe_encode",  # closure changed by the _bpe_apply_pieces refactor
    "orc_roundtrip",  # ORC twin of jsonl_roundtrip
]

# r11 window first (the driver's 50-slot budget reads front-to-back, dict
# insertion dedupes repeats), then the over-budget spill, then the older
# lists so every still-staged name stays queued.
_PRIORITY = (
    _PRIORITY_R15
    + _PRIORITY_R14
    + _PRIORITY_R13
    + _PRIORITY_R13_SPILL
    + _PRIORITY_R12
    + _PRIORITY_R12_SPILL
    + _PRIORITY_R11
    + _PRIORITY_R11_SPILL
    + _PRIORITY_R10
    + _PRIORITY_R10_SPILL
    + _PRIORITY_R9
    + _PRIORITY_R9_SPILL
    + _PRIORITY_R8
    + _PRIORITY_R8_STAGED
    + _PRIORITY_R7
    + _PRIORITY_R7_OVERFLOW
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-document top-3 TF-IDF keywords at sf0.001.

    Exercises the full relational core: parquet scan -> explode -> filters ->
    group-agg -> broadcast joins -> window top-k (SURVEY.md §7.1 step 1).
    """
    return text.top_keywords(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {name: merged[name] for name in _PRIORITY if name in merged}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
