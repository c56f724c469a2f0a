"""Scale-stress probe: replicate the sf0.1 corpus 10x and measure how the
heavy operators' wall time grows.

The correctness gate proves operators right at small SF; this probe gives
measured (not argued) evidence for the scaling claim: each probed query
runs on sf0.1 and on a 10x replicated corpus (~50k docs / ~6M tokens),
and the report prints the wall-time ratio.  A linear-shaped operator
lands near 10x (or below, while fixed costs still dominate); anything
super-linear (a hidden pairwise stage, a driver materialization) shows up
immediately as a blow-up ratio.

Replication keeps doc_ids unique by offsetting each replica by a stride.
Replica texts are identical, so the corpus is ADVERSARIAL for dedup:
every document gains 9 exact twins, every LSH band bucket holds >= 10
docs, and pair counts grow ~45x per duplicate group — the workload dedup
exists for, and a direct probe of the "hot band" risk documented in
PLANS.md.

Usage: python scripts/scale_probe.py [replicas]   (default 10)
Writes the replicated corpus under /tmp/spark_graft_scale_probe/.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from bigdataanalytics_textsummarization_spark.functions import release_pins  # noqa: E402
from bigdataanalytics_textsummarization_spark.session import get_session  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
WORK_DIR = "/tmp/spark_graft_scale_probe"
ID_STRIDE = 10_000_000

# The shuffle-heavy slice worth stressing: text diamonds, window top-k,
# exact + LSH dedup, hashed scoring, sessionization.
PROBE = [
    "term_stats",
    "top_keywords",
    "dedup_exact",
    "dedup_minhash_lsh",
    "classifier_score",
    "quality_score",
    "user_sessions",
    # round-3c additions over the replicated document corpus
    "doc_chunks",
    "bm25_search",
    "char_entropy",
    "bpe_encode",
    # round-3d: LSH-derived pair export (adversarial: every doc has 9
    # twins, so the positive set explodes exactly like dedup's candidate
    # pairs) and the blocked-vocabulary PMI join
    "contrastive_pairs",
    "pmi_edges",
    # round-5: decontam is adversarial under replication (every benchmark
    # doc's 9 twins land in train sharing ALL shingles), domain_caps pits
    # the rank window against 10x-hot domains, salted ops stress the
    # replicated events table, the PPM decode should be flat-linear
    "benchmark_decontam",
    "domain_caps",
    "salted_join",
    "salted_heavy_agg",
    "multimodal_decode",
    # round-5b: LPA is O(edges)/round over the 10x sentence graph;
    # merge_upsert is O(delta) and the delta grows with the corpus
    "graph_lpa",
    "merge_upsert",
    # round-9: the degree-capped edge builder must flatten graph_lpa's
    # edge-explosion ratio (uncapped measured 35x at x10 — the replicated
    # corpus makes every sentence a 10-clique member; capped is
    # O(vertices * cap) per round and should track the corpus, not the
    # clique squares); embedding_pca's moments now ride the Gramian
    # kernel, so its x10 ratio should be flat-linear like embedding_cov's
    "graph_lpa_capped",
    "embedding_pca",
    # late-r9: quality-canonical dedup rides the LSH candidate plan, so
    # its ratio should track dedup_minhash_lsh's O(candidates) shape
    "dedup_keep_best",
    # round-10 (VERDICT r9 task 5): the graph-ANN family over the now-
    # replicated embeddings — descent build is O(n·k²)/round (expect
    # ~linear), beam search is O(rounds·beam·degree) per query plus the
    # O(n·k) index-edge materialization (expect well below linear)
    "knn_graph_descent",
    "ann_graph_search",
    # round-11: the corpus-curve pair (exact distinct-gram shuffle vs the
    # mergeable HLL twin — the measured gap IS the sketch's reason to
    # exist at scale), the two-phase prefix mixture cut, and the DSIR
    # scoring pass (one leafed scan + O(B) broadcast; expect ~linear)
    "corpus_diversity",
    "corpus_diversity_sketch",
    "token_budget_mixture_salted",
    "dsir_weights",
    # round-12: the multimodal dedup pair — phash is a pure Arrow map
    # stage (expect flat-linear); the banded near-dup join is clone-
    # adversarial exactly like dedup_minhash_lsh (every image gains 9
    # bit-identical twins, so same-pattern groups grow 10x and pair work
    # grows ~100x per group — O(candidates) is the claim under test)
    "image_phash",
    "image_near_dups",
    # round-13 (VERDICT r12 task 6): the rest of the banded media
    # families — the image/audio ingest gates (stream-static band join
    # vs a 10x corpus index) and the audio/video pair queries; all run
    # with pattern-count scaled (PROBE_PATTERN_SCALE) so planted
    # candidates stay O(n)
    "phash_ingest",
    "audio_near_dups",
    "video_near_dups",
    # late-r13: the embedding-side decontaminator (clone-adversarial
    # like benchmark_decontam: every benchmark vector gains 9 cosine-1.0
    # twins, so bucket candidates explode by design) and the agreement
    # audits (each rides candidate-bounded inputs — their ratios should
    # track their heaviest upstream detector, adding no pairwise stage
    # of their own)
    "semantic_decontam",
    "trimodal_dedup_audit",
    "decontam_audit",
    # r14 (VERDICT r13 tasks 3+4): the production-width pair queries —
    # same banded O(candidates) shape as their narrow twins, but the
    # 16-bit band space keeps RANDOM bucket occupancy ~1 where the toy
    # 10-bit/8-bit spaces were already saturating at x10; and the
    # narrow video pair re-probed under variable clip lengths (n_frames
    # in the band key partitions the band space further)
    "audio_near_dups_wide",
    "video_near_dups_wide",
    # late-r14: the LSH layout sweep is clone-adversarial twice over —
    # BOTH its truth set (exact-Jaccard pairs) and its loosest layout's
    # candidates (16 bands of 1 hash) grow with the twin groups, so this
    # is the sweep's worst case and O(candidates) is the claim; the hard
    # negatives are one broadcast corpus scan (expect flat-linear); the
    # CCNet terciles ride doc_perplexity's O(tokens) stages plus an
    # O(langs) sketch aggregate (expect doc_perplexity-shaped)
    "minhash_band_tuning",
    "hard_negative_mining",
    "ccnet_buckets",
    # late-r14 (2): boilerplate_strip is clone-adversarial (every
    # sentence gains 9 verbatim copies, so ~90% of occurrences lose the
    # keep-first race — the C4 workload at its heaviest) but adds only a
    # concat to line_dedup's two shuffles; embedding_ingest's candidate
    # mass is new-side x bucket occupancy (16 sign buckets at this
    # fixture — the docstring's bucket-partitioned IVF store is the
    # 100 TB layout, this probes the dense small-index shape)
    "boilerplate_strip",
    "embedding_ingest",
    "embedding_ingest_wide",
    # the batch self-join pair under both keys: candidate mass per
    # bucket is occupancy², so the narrow 16-bucket key walls a factor
    # sooner than the ingest gate; the wide key is the contrast
    "embedding_near_dups",
    "embedding_near_dups_wide",
    # r15 (VERDICT r14 tasks 2+4): the remaining narrow sign-bucket
    # consumers and their production-width twins — the narrow rows
    # measure the 16-bucket wall ON the consumer itself (not inferred
    # from the embedding twins), the wide rows measure it removed; plus
    # the wide image family and the audits recomposed over the wide
    # detectors (each audit's ratio should track its heaviest upstream
    # detector, adding no pairwise stage of its own)
    "semantic_dedup",
    "semantic_dedup_wide",
    "semantic_decontam_wide",
    "ann_bucketed_topk",
    "ann_bucketed_topk_wide",
    "hybrid_dedup_audit",
    "hybrid_dedup_audit_wide",
    "image_phash_wide",
    "image_near_dups_wide",
    "multimodal_dedup_audit_wide",
    "trimodal_dedup_audit_wide",
    # late-r15 lifecycle symmetry: wide components ride their pair
    # queries' candidate shape plus O(diameter) min-label rounds; wide
    # gates are the stream-static band join (expect flat-linear)
    "image_dedup_clusters_wide",
    "audio_dedup_clusters_wide",
    "phash_ingest_wide",
    "audio_fp_ingest_wide",
    "video_fp_ingest_wide",
    # late-r15: margin-criterion bitext mining — the candidate pool is
    # the bucket equi-join and the margins are bucket-local, so both
    # widths should track bucket occupancy (narrow: occupancy grows
    # linearly at 16 buckets; wide: the contrast)
    "bitext_mining",
    "bitext_mining_wide",
    # r16: the within-doc repeated-span trim is a pure zero-shuffle
    # row-local projection (expect flat-linear; replication clones are
    # IRRELEVANT to it — the rule never looks across documents)
    "doc_repetition_strip",
    # late-r16: per-pair BLEU and chrF are the same zero-shuffle Arrow
    # map shape as rouge_n (the corpus roll-ups add one global sum);
    # nDCG composes two bounded top-k plans + one N_QUERIES-row join,
    # so its ratio should track ann_bucketed_topk's
    "bleu_pairs",
    "chrf_pairs",
    "ann_ndcg",
    # late-r16: WER is the rouge_l shape (O(m*n) Arrow DP per pair,
    # zero shuffle beyond the pair join) — expect ~linear
    "wer_pairs",
    # r17: the corpus WER roll-up adds one 3-long global sum to the
    # wer_pairs shape; summary_eval composes the lsa + textrank plans
    # (both bounded per source) and three zero-shuffle Arrow map stages
    # over ONE row per source — its ratio should track the heavier
    # upstream (the LSA/TextRank text diamond), not the metric stages
    "wer_corpus",
    "summary_eval",
    # late-r17: CER is WER one unit down — the same zero-shuffle Arrow
    # DP per pair, ~6x the sequence lengths (chars vs words), so the
    # per-pair constant is larger but the shape identical
    "cer_pairs",
    "cer_corpus",
    # late-r17: GLEU rides the BLEU component kernel (pooled sums are
    # pure expressions), SU4 is a 5-wide band of the rouge_n bag work
    # (O(5·tokens) per pair), and eval_report composes SIX corpus
    # aggregates over zero-shuffle map stages — all should track
    # bleu_pairs' flat-to-linear shape
    "gleu_pairs",
    "gleu_corpus",
    "rouge_su4",
    "eval_report",
    "eval_sweep",
    # late-r17: self-BLEU is three ring equi-joins + one multi-ref
    # Arrow map stage — O(n·K) by construction; under doc replication
    # the ring pairs clones with clones, so the x10 corpus gets more
    # identical-neighbor hits (a duplicated corpus IS less diverse —
    # the statistic reading the probe artifact correctly)
    "self_bleu_docs",
    "self_bleu_corpus",
    # late-r17: the WER admission gate is the wer_pairs map shape plus
    # one stream-static equi-join and an integer keep projection
    "wer_ingest",
]

# r10: probe modes for the session-memoized graph-ANN pair.  The default
# warm/base/big shape mis-measures them: knn_graph_descent's base rep
# would read the memo populated by the warm rep (~0s), and
# ann_graph_search's big rep would pay the big descent BUILD inside the
# timed search.  "rebuild" releases pins before every timed rep so each
# rep pays the full index build at its own scale; "prewarm" runs an
# untimed rep at each scale first so the timed rep measures the QUERY
# path against a session-memoized index — the deployment split (index
# built once, searched many times).
PROBE_MODES = {
    "knn_graph_descent": "rebuild",
    "ann_graph_search": "prewarm",
}

# r13 (VERDICT r12 task 6): the banded media families probe with the
# PLANTED-PATTERN COUNT SCALED with the corpus (constant per-pattern
# group size), so planted candidate pairs grow O(n) — the engine shape
# under test — instead of O(n²) within 125 ever-fatter groups (which is
# the workload growing itself, the thing the x10 dedup rows already
# measure).  Maps query -> the multimodal pattern constants to scale by
# the replica factor for the big rep (base rep keeps base constants, so
# both reps see the same per-group density).
PROBE_PATTERN_SCALE = {
    "image_near_dups": ("N_IMG_PATTERNS",),
    "phash_ingest": ("N_IMG_PATTERNS",),
    "audio_near_dups": ("AUDIO_PATTERNS",),
    "video_near_dups": ("N_VIDEO_PATTERNS",),
    # the tri-modal audit rides the image AND audio candidate tables
    "trimodal_dedup_audit": ("N_IMG_PATTERNS", "AUDIO_PATTERNS"),
    # r14: the production-width pairs share the narrow pattern constants
    "audio_near_dups_wide": ("AUDIO_PATTERNS",),
    "video_near_dups_wide": ("N_VIDEO_PATTERNS",),
    # r15: the wide image family and the wide-detector audits
    "image_near_dups_wide": ("N_IMG_PATTERNS",),
    "multimodal_dedup_audit_wide": ("N_IMG_PATTERNS",),
    "trimodal_dedup_audit_wide": ("N_IMG_PATTERNS", "AUDIO_PATTERNS"),
    # late-r15 lifecycle symmetry
    "image_dedup_clusters_wide": ("N_IMG_PATTERNS",),
    "audio_dedup_clusters_wide": ("AUDIO_PATTERNS",),
    "phash_ingest_wide": ("N_IMG_PATTERNS",),
    "audio_fp_ingest_wide": ("AUDIO_PATTERNS",),
    "video_fp_ingest_wide": ("N_VIDEO_PATTERNS",),
}


# r16 (VERDICT r15 task 1): CONSTANT-DENSITY replication for the lexical
# LSH leaf — the document-side analogue of PROBE_PATTERN_SCALE.  Verbatim
# replication makes every document a `replicas`-clique member, so the
# LSH truth set manufactures C(100,2)/C(10,2) = 110x the x10 pair mass
# at x100 — a workload artifact a real corpus does not have, and the
# reason the wide audits' x100 reps blew the probe budget on their
# lexical leaf (PLANS.md r15).  The fix is an injective PER-REPLICA
# TOKEN RENAMING (suffix every space-token with the replica index): a
# corpus isomorphism, so within-replica word-3-gram shingle sets map
# bijectively (per-group duplicate density EXACTLY constant, Jaccard
# values preserved) while cross-replica shingle sets become disjoint
# (zero manufactured clone pairs) — the lexical truth set grows O(n),
# which is the engine shape under test.  Queries listed here run their
# big rep against the salted-documents corpus; embeddings/events still
# replicate verbatim (the semantic side's clone shape is measured
# feasible separately: embedding_near_dups_wide 50.4x).
PROBE_CONST_DENSITY = {
    "hybrid_dedup_audit_wide",
    "multimodal_dedup_audit_wide",
    "trimodal_dedup_audit_wide",
}


class _scaled_patterns:
    """Temporarily multiply the named multimodal pattern constants."""

    def __init__(self, names: tuple[str, ...], factor: int) -> None:
        from bigdataanalytics_textsummarization_spark.extensions import multimodal

        self.mod = multimodal
        self.names = names
        self.factor = factor
        self.saved: dict[str, int] = {}

    def __enter__(self):
        for n in self.names:
            self.saved[n] = getattr(self.mod, n)
            setattr(self.mod, n, self.saved[n] * self.factor)
        return self

    def __exit__(self, *exc):
        for n, v in self.saved.items():
            setattr(self.mod, n, v)
        return False

# The x100 tier (VERDICT r8 task 8): one decade further for the queries
# whose x10 ratios were flat-linear (1.1-1.3x-per-x10 shapes) — confirms
# the linearity holds another order of magnitude instead of hiding a
# knee.  Only the flat-linear family: the adversarial dedup/graph
# workloads grow their OWN workload super-linearly under replication
# (candidate pairs, clique edges), which the x10 tier already measures.
PROBE_X100 = [
    "dedup_exact",
    "classifier_score",
    "quality_score",
    "multimodal_decode",
    "domain_caps",
    # r10 widening: the rest of the (sub-)linear family from the x10
    # table, one decade further — doc_chunks (map-only), merge_upsert
    # (O(delta)), the salted pair (hot keys now 100x hotter), bm25
    # (O(docs x query_terms) downstream of the semi-join), and
    # embedding_pca over the now genuinely replicated 100x vector store
    # (Gramian kernel: per-batch partials, dims²-bounded collect)
    "doc_chunks",
    "merge_upsert",
    "salted_join",
    "salted_heavy_agg",
    "bm25_search",
    "embedding_pca",
    # r12 (VERDICT r11 task 6): the r11 ops one decade further — the
    # corpus-curve pair (exact distinct-gram shuffle vs the mergeable
    # HLL twin), the two-phase prefix mixture cut, the DSIR scoring
    # pass, and the new Arrow map-stage image hash; all were 1.6-2.9x
    # at x10, linear-shaped
    "corpus_diversity",
    "corpus_diversity_sketch",
    "token_budget_mixture_salted",
    "dsir_weights",
    "image_phash",
    # r13 (VERDICT r12 task 6): the banded image pair + ingest gate one
    # decade further, pattern-scaled so planted candidates stay O(n).
    # The residual x100 growth is the toy 40-bit hash's 10-bit band
    # space saturating (~500 images per band value at 500k images) —
    # random-collision candidates, not planted ones; the production
    # 64-bit hash with 16-bit bands moves that wall two decades out
    # (constants, not shape).  audio_near_dups stays x10-only: its
    # 31-bit fingerprint's 8-bit bands saturate ~4x harder (see
    # PLANS.md).
    "image_near_dups",
    "phash_ingest",
    # r14 (VERDICT r13 task 7): the newest audit/media families one
    # decade further — the production-width pairs (whose 16-bit bands
    # are the fix for the narrow walls the r13 x100 tier measured), the
    # tri-modal agreement audit (rides the candidate-bounded narrow
    # detectors — its x100 ratio tracks the heaviest upstream), and the
    # lexical-vs-semantic decontam audit (both inputs candidate-bounded)
    "audio_near_dups_wide",
    "video_near_dups_wide",
    "trimodal_dedup_audit",
    "decontam_audit",
    # late-r14: the flat members of the new family one decade further —
    # the broadcast hard-negative scan, the CCNet tercile pass (rides
    # doc_perplexity), the C4 transform (two md5-keyed shuffles under
    # 100x verbatim duplication), and the sign-bucket ingest gate (the
    # dense small-index shape; candidate mass = new x occupancy)
    "hard_negative_mining",
    "ccnet_buckets",
    "boilerplate_strip",
    "embedding_ingest",
    # the production-width gate (8 hyperplanes / 256 buckets at this
    # fixture; the rule is dims ~ log2(corpus)) — the occupancy-bounded
    # contrast to the 16-bucket row above
    "embedding_ingest_wide",
    # the batch self-join under both keys (occupancy² per bucket)
    "embedding_near_dups",
    "embedding_near_dups_wide",
    # r15 (VERDICT r14 tasks 2+4): the production-width forms one decade
    # further — the wide sign-bucket consumers (256 buckets; the narrow
    # 16-bucket walls were measured at 104-350x on this blocking), the
    # wide image pair (16-bit bands, pattern-scaled), and the audits
    # recomposed over the wide detectors (feasible at x100 exactly
    # because every upstream candidate set now is)
    "semantic_dedup_wide",
    "semantic_decontam_wide",
    "ann_bucketed_topk_wide",
    "hybrid_dedup_audit_wide",
    "image_phash_wide",
    "image_near_dups_wide",
    "multimodal_dedup_audit_wide",
    "trimodal_dedup_audit_wide",
    # late-r15: the wide bitext pool one decade further (the narrow
    # pool's occupancy² candidate mass is the measured 16-bucket class)
    "bitext_mining_wide",
    # r17: the eval-metric family one decade further — all zero-shuffle
    # Arrow map shapes over the pair frame (plus a single global sum
    # for the corpus forms) whose x10 rows were flat-to-linear
    # (bleu 1.1x, chrf 1.8x, wer 1.9x, cer 7.1x compute-bound, strip
    # 0.8x); at x100 the map stage dominates and the ratio should track
    # pair count, never pair-pairs
    "doc_repetition_strip",
    "bleu_pairs",
    "chrf_pairs",
    "wer_pairs",
    "wer_corpus",
    "cer_pairs",
    # late-r17: GLEU adds pure expressions to the BLEU kernel; SU4 is
    # the 5-wide bag of the rouge shape; eval_report composes every
    # family kernel once — its x100 wall should be ~the sum of the
    # member map stages (the cer/chrf arms dominate)
    "gleu_pairs",
    "rouge_su4",
    "eval_report",
]


def build_replicated(spark, replicas: int, salt_docs: bool = False) -> str:
    out = os.path.join(WORK_DIR, f"x{replicas}_cd" if salt_docs else f"x{replicas}")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    rep = docs.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    ).withColumn("doc_id", F.col("doc_id") + F.col("r") * F.lit(ID_STRIDE))
    if salt_docs:
        # constant-density mode (PROBE_CONST_DENSITY): suffix every
        # space-token with the replica index — an injective per-replica
        # token renaming, so within-replica shingle/duplicate structure
        # is exactly preserved and cross-replica lexical mass is zero.
        # n_chars is left as-is (no probed query reads it here).
        rep = rep.withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " ", -1),
                    lambda t: F.concat(
                        t, F.lit("~"), F.col("r").cast("string")
                    ),
                ),
            ),
        )
    rep = rep.drop("r")
    # r18: write the replicated corpus across many files.  The base
    # sf0.1 corpus is ONE small parquet file, so the replicated write
    # (one scan task) also produced one file and every probe's scan ran
    # as a SINGLE split — a serial Amdahl term that masked core-scaling
    # at x10/x100 (measured: local[8] matched local[32] on row-local
    # projections because the scan+widening exchange was the wall).  A
    # real corpus at this volume has many files; 64 here keeps scan
    # parallelism realistic at both probed core counts.
    rep.repartition(64).write.parquet(f"{out}/documents.parquet")
    ev = spark.read.parquet(f"{BASE_SF}/events.parquet")
    rep_ev = (
        ev.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
        .withColumn("event_id", F.col("event_id") + F.col("r") * F.lit(ID_STRIDE))
        .withColumn("user_id", F.col("user_id") + F.col("r") * F.lit(ID_STRIDE))
        .drop("r")
    )
    rep_ev.write.parquet(f"{out}/events.parquet")
    # r10: embeddings replicate too (vec_id stride like doc_id), so the
    # vector-family probes (descent, graph search, PCA) measure a corpus
    # that actually grew — the old symlink handed them the same 2000
    # vectors at "x10".  Replicated vectors are exact clones: adversarial
    # for the kNN graph (every vector gains 9 cosine-1.0 twins, clone
    # cliques), like the document replication is for dedup.
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    rep_emb = emb.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    ).withColumn("vec_id", F.col("vec_id") + F.col("r") * F.lit(ID_STRIDE))
    if salt_docs:
        # constant-density mode, EMBEDDING side (r17, VERDICT r16 task
        # 4): verbatim vector replication hands every vector
        # `replicas`-1 cosine-1.0 twins — C(reps,2)x manufactured
        # semantic clone mass, the same artifact token renaming removes
        # on the lexical side.  The analog here is a PER-REPLICA
        # ISOMETRY: a signed coordinate permutation (roll the 64 dims by
        # 7*r positions, then flip each coordinate's sign by a
        # crc32(r, i) bit).  Isometries preserve norms and pairwise dot
        # products EXACTLY, so within-replica cosine structure — the
        # semantic truth set — maps bijectively onto each replica, while
        # a cross-replica pair (x, P_s y) measures <P_r^T P_s y, x>,
        # a sign-scrambled rotation of y against x: decorrelated to
        # ~N(0, 1/64) cosine mass (sigma ~ 0.125; measured on the built
        # x100_cd corpus: within-replica deltas <= 3e-17, cross-replica
        # twin |cos| max 0.29 over sampled pairs).  At a production
        # threshold (0.95) the cross tail is zero; at this fixture's
        # deliberately-low 0.35 gate a ~0.5% cross tail survives —
        # against the verbatim replicator's 100% cosine-1.0 twins, the
        # manufactured semantic clone mass is gone to first order.
        # Replica 0 is left byte-identical (the base corpus embeds
        # unchanged).
        dims = 64  # embeddings.parquet fixture width
        idx = F.sequence(F.lit(0), F.lit(dims - 1))
        rolled = F.transform(
            idx,
            lambda i: (
                F.element_at(
                    F.col("embedding"),
                    ((i + F.col("r") * F.lit(7)) % F.lit(dims)) + F.lit(1),
                )
                * F.when(
                    F.crc32(
                        F.concat_ws(
                            "_",
                            F.col("r").cast("string"),
                            i.cast("string"),
                        )
                    )
                    % 2
                    == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).cast("float"),
        )
        rep_emb = rep_emb.withColumn(
            "embedding",
            F.when(F.col("r") == 0, F.col("embedding")).otherwise(rolled),
        )
    rep_emb = rep_emb.drop("r")
    rep_emb.write.parquet(f"{out}/embeddings.parquet")
    for t in (
        "region nation customer supplier part orders lineitem"
    ).split():
        os.symlink(f"{BASE_SF}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def time_query(spark, fn, sf_dir: str) -> float:
    # timer starts BEFORE construction: localCheckpoint-eager queries
    # (graph_lpa, graph_khop, knn_graph_descent) do their real work in
    # fn() itself — timing only the final write under-reported graph_lpa
    # by ~50x
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_session(
        app="scale-probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    probe = PROBE_X100 if replicas >= 100 else PROBE
    if len(sys.argv) > 2:  # optional name filter: probe only these rows
        only = set(sys.argv[2:])
        probe = [n for n in probe if n in only]
    big_dir = (
        build_replicated(spark, replicas)
        if any(n not in PROBE_CONST_DENSITY for n in probe)
        else None
    )
    cd_dir = (
        build_replicated(spark, replicas, salt_docs=True)
        if any(n in PROBE_CONST_DENSITY for n in probe)
        else None
    )
    print(f"{'query':24} {'sf0.1':>8} {'x' + str(replicas):>8} {'ratio':>7}")
    for name in probe:
        fn = queries[name]
        mode = PROBE_MODES.get(name)
        rep_dir = cd_dir if name in PROBE_CONST_DENSITY else big_dir
        if mode == "rebuild":
            time_query(spark, fn, BASE_SF)  # JVM/codegen warm
            release_pins()
            base = time_query(spark, fn, BASE_SF)
            release_pins()
            big = time_query(spark, fn, rep_dir)
        elif mode == "prewarm":
            time_query(spark, fn, BASE_SF)  # builds the base index memo
            base = time_query(spark, fn, BASE_SF)
            time_query(spark, fn, rep_dir)  # builds the big index memo
            big = time_query(spark, fn, rep_dir)
        elif name in PROBE_PATTERN_SCALE:
            time_query(spark, fn, BASE_SF)  # warm
            base = time_query(spark, fn, BASE_SF)
            release_pins()  # the phash/fp leaf is pattern-dependent
            with _scaled_patterns(PROBE_PATTERN_SCALE[name], replicas):
                big = time_query(spark, fn, rep_dir)
        else:
            time_query(spark, fn, BASE_SF)  # warm
            base = time_query(spark, fn, BASE_SF)
            big = time_query(spark, fn, rep_dir)
        print(f"{name:24} {base:8.2f} {big:8.2f} {big / base:7.1f}x")
        # pins are per-query: without the release, ~20 probed queries x
        # (sf0.1 + 10x) cached aggregates accumulate in one executor JVM
        # and memory pressure bleeds into the LATE queries' walls
        release_pins()
    spark.stop()


if __name__ == "__main__":
    main()
