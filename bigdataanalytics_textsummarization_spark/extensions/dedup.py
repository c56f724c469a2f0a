"""Document deduplication: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Scale design notes (the point of these operators at 100 TB):
- every hash primitive is md5 (hex string) — deterministic, identical in
  Spark and DuckDB, so the correctness oracle replicates signatures exactly;
- exact dedup is a single hash-groupBy (one shuffle on a 32-byte key);
- MinHash/LSH: shingle -> 16 minhashes -> 4 bands; only documents sharing a
  band hash are ever paired, so candidate generation is an equi-join on
  (band, band_sig) — linear shuffle, no all-pairs blowup.  Estimated and
  exact Jaccard are then computed only for candidates.  Signatures stay
  entirely inside whole-stage codegen: shingles are generated with
  posexplode + element_at (NOT higher-order array functions, which Spark
  evaluates interpreted — and which project-collapse re-evaluates per
  reference), hashed once with md5, and reduced by ONE groupBy(doc_id)
  carrying 16 min() columns (map-side partial agg), one affine hash
  (a_i*h + b_i) mod p per column.  min() is duplicate-invariant, so the
  shingle stream skips the per-doc distinct entirely;
- the direct n-gram Jaccard join (dedup_ngram_jaccard) blocks on shared
  shingles; it is the exact baseline to validate LSH recall at test scale.
  At 100 TB the LSH path is the production route — hot shingles make the
  direct join quadratic in the worst case (AQE skew-split mitigates, LSH
  avoids);
- SimHash packs each document into one 16-bit integer; near-dup candidates
  become a bit_count(xor) band join, the cheapest possible pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import (
    _owned_ckpt,
    _retire_ckpt,
    leaf,
    pin,
    r6,
    session_memo,
)
from ..io import load_table

N_HASHES = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_K = 3

# MinHash family: minhash_i(doc) = min over shingles g of
# (A[i] * h48(g) + B[i]) mod MH_P, where h48 = first 48 bits of md5.
# A[i] < 2^14 and h48 < 2^48 keep a*h+b < 2^63 (no int64 overflow in
# either engine); MH_P = 2^61 - 1 (Mersenne).  One md5 per shingle total —
# the 16 per-seed hashes are integer multiply-adds, not re-hashes.
MH_P = (1 << 61) - 1
MH_A = (
    9973, 12007, 3251, 14341, 7919, 10663, 2503, 15773,
    6367, 11069, 4217, 13187, 8291, 9689, 5279, 16249,
)
MH_B = (
    541238947, 912743181, 77003219, 388572301, 660912833, 129385577,
    843209251, 271828183, 314159257, 577215663, 466920039, 730904883,
    198764321, 935711081, 613570867, 102334155,
)
MH_A_SQL = "[" + ", ".join(str(a) for a in MH_A) + "]"
MH_B_SQL = "[" + ", ".join(str(b) for b in MH_B) + "]"


def _shingles_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional word-3-gram shingles per document, duplicates KEPT.

    Pure whole-stage-codegen shape: split once in a child projection,
    posexplode a start-position sequence, concat three element_at lookups.
    Consumers that are duplicate-invariant (minhash = min over shingles)
    use this stream and skip the per-doc distinct.
    """
    return _shingles_dup_of(load_table(spark, sf_dir, "documents"))


def _shingles_dup_of(docs: DataFrame) -> DataFrame:
    # r17 (guide §2.3 "project before you explode"): the gram ARRAY is
    # built row-locally and only the gram string is exploded.  The old
    # shape posexploded a position sequence and kept the full word
    # array as a required child output, so every generated row carried
    # a copy of the whole document's word array through the generate —
    # O(words) bytes per shingle row instead of O(gram).  Gram values,
    # order, and multiplicity are identical (same element_at indices;
    # verified multiset-equal at sf0.1 and oracle-gated downstream).
    arr = F.split("text", " ", -1)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__w") - F.lit(SHINGLE_K - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at("__w", i),
            F.element_at("__w", i + F.lit(1)),
            F.element_at("__w", i + F.lit(2)),
        ),
    )
    return (
        docs.filter(F.size(arr) >= SHINGLE_K)
        .select("doc_id", arr.alias("__w"))
        .select("doc_id", F.explode(grams).alias("g"))
    )


def _wide_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sigs array<long>[16]) MinHash signatures.

    ``sigs[i] = min over shingles of (A[i]*h48(md5(g)) + B[i]) mod MH_P``
    — one md5 per shingle, then 16 min() aggregates over a single
    groupBy(doc_id): codegen hash aggregate with map-side partials, one
    shuffle of 16 longs per document.  Documents with no shingle
    (< 3 words) simply have no rows.
    """
    return _wide_sigs_from_docs(load_table(spark, sf_dir, "documents"))


def _wide_sigs_from_docs(docs: DataFrame) -> DataFrame:
    """Codegen MinHash signatures of an arbitrary documents frame."""
    hv = _shingles_dup_of(docs).select(
        "doc_id",
        F.conv(F.substring(F.md5("g"), 1, 12), 16, 10).cast("long").alias("h"),
    )
    wide = hv.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a).cast("long") * F.col("h") + F.lit(b)) % F.lit(MH_P)
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(zip(MH_A, MH_B))
        ]
    )
    return wide.select(
        "doc_id", F.array(*[f"m{i}" for i in range(N_HASHES)]).alias("sigs")
    )


SHINGLES_CTE = """
words AS (
  SELECT doc_id, source,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
grams_all AS (
  SELECT doc_id, source,
         w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM words
  QUALIFY lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
),
grams AS (SELECT DISTINCT doc_id, source, g FROM grams_all)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 hash-groupBy; canonical id = min doc_id per hash."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", F.md5(F.col("text")).alias("text_hash")
    )
    w = Window.partitionBy("text_hash")
    return (
        hashed.withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "text_hash", "canonical_id", "is_duplicate")
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form MinHash signatures: (doc_id, seed, minhash) — one
    posexplode of the 16-element signature array."""
    prof = _wide_sigs(spark, sf_dir)
    return prof.select(
        "doc_id", F.posexplode("sigs").alias("seed", "minhash")
    ).select("doc_id", F.col("seed").cast("long").alias("seed"), "minhash")


MINHASH_CTE = f"""
hv AS (
  SELECT doc_id, g,
         cast(cast(concat('0x', substr(md5(g), 1, 12)) AS ubigint) AS bigint) AS h
  FROM grams
),
mh AS (
  SELECT doc_id, seed,
         min(({MH_A_SQL}[seed + 1] * h + {MH_B_SQL}[seed + 1]) % {MH_P}) AS minhash
  FROM (SELECT doc_id, h, unnest(range({N_HASHES})) AS seed FROM hv)
  GROUP BY doc_id, seed
)
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs with estimated and exact Jaccard.

    Pipeline: codegen signature arrays (one groupBy) -> 4 slim band keys
    per doc (doc_id, band, band_sig only — no arrays carried through the
    wide join) -> equi-join on (band, band_sig) -> pair groupBy ->
    estimated Jaccard by joining the 16-long signature arrays back onto
    the pair table (row-local ``zip_with``), exact Jaccard by restricting
    the distinct-shingle stream to candidate docs (broadcast-sized pair
    table -> two equi-joins -> pair count).  Every shuffle in the plan is
    either 16 longs per doc or proportional to candidate pairs — never to
    |docs| x |shingles| x seeds.
    """
    sig = _wide_sigs(spark, sf_dir)
    band_w = N_HASHES // N_BANDS
    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
        "sigs",
    ).select(
        "doc_id",
        F.col("band").cast("long").alias("band"),
        F.concat_ws(
            "|",
            *[
                F.element_at("sigs", F.col("band").cast("int") * band_w + j)
                .cast("string")
                for j in range(1, band_w + 1)
            ],
        ).alias("band_sig"),
        "sigs",
    )
    # The signature array rides through the band self-join (16 longs/doc —
    # negligible next to the band_sig string), so est_jaccard needs no join
    # back onto sig: the two identical band-join sides share one shuffle
    # (ReusedExchange), and sig is evaluated exactly once in the plan.
    a, b = bands.alias("a"), bands.alias("b")
    eq_seeds = F.size(
        F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v)
    )
    est = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count("*").cast("long").alias("n_shared_bands"),
            F.first(F.col("a.sigs")).alias("sa"),
            F.first(F.col("b.sigs")).alias("sb"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared_bands",
            r6(eq_seeds / F.lit(float(N_HASHES))).alias("est_jaccard"),
        )
    )
    cand = est.select("doc_a", "doc_b")
    # r17 note (guide §3.2, attempted and REVERTED by measurement): a
    # broadcast semi-join restricting this shingle stream to candidate
    # docs before the distinct would shrink the full-corpus shingle
    # shuffle to O(candidates) — but deriving the candidate-doc set
    # from ``est`` replicates the whole sig→bands→band-join subtree two
    # more times in the plan (52 -> 148 Exchange nodes before runtime
    # reuse), and the measured warm median ROSE 2.1-3.1s -> 3.3s at
    # sf0.1.  A deployment that needs the candidate restriction at
    # extreme scale should materialize the pair table first
    # (``_lsh_pairs`` is exactly that leaf) and verify from it, rather
    # than growing this single-plan diamond.
    sh = _shingles_dup(spark, sf_dir).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    ga = sh.select(F.col("doc_id").alias("doc_a"), "g")
    gb = sh.select(F.col("doc_id").alias("doc_b"), "g")
    isect = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("isect"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        est.join(isect, ["doc_a", "doc_b"])
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_bands",
            "est_jaccard",
            r6(
                F.col("isect")
                / (F.col("n_a") + F.col("n_b") - F.col("isect"))
            ).alias("jaccard"),
        )
    )


CLUSTER_MIN_JACCARD = 0.2
CLUSTER_MAX_ITERS = 20


@session_memo
def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH candidate pair table, materialized ONCE per
    session and shared by every consumer (r11, the ``_beam_seed``
    precedent): ``dedup_clusters`` (and through it ``dedup_keep_best``
    and ``curation_pipeline``), ``contrastive_pairs`` and the hybrid
    audit each composed the full LSH diamond independently —
    ``dedup_keep_best``'s 3.1 s construct share was mostly this re-
    derivation.  The pair table is O(candidates) (tiny next to the
    shingle stream it summarizes), so the leaf is cheap to hold;
    ``dedup_minhash_lsh`` itself stays un-leafed — its own driver row
    and the shuffle-reuse plan test certify the raw diamond."""
    return leaf(dedup_minhash_lsh(spark, sf_dir))


@session_memo
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the LSH pair
    graph (exact Jaccard >= 0.2), canonical = min doc_id per component.

    Session-memoized (r17, the ``_lsh_pairs``/``_ranks_raw`` precedent):
    the min-label loop runs driver-blocking jobs (one eager checkpoint
    + one convergence count per iteration) at BUILD time, and its
    output is already a materialized checkpoint — consumers
    (``dedup_keep_best``, ``curation_pipeline``) and repeated builds in
    one session reuse that result instead of re-running the loop.

    Production dedup's last step — pairs alone over-remove (A~B, B~C must
    collapse to ONE canonical, not two).  Components are computed by
    iterative min-label propagation: label(v) <- min(label(v), labels of
    neighbors), looped to fixpoint with ``localCheckpoint`` per iteration
    (the PageRank pattern, SURVEY §2.10).  Near-dup components are tiny in
    practice, so convergence takes O(component diameter) iterations; each
    iteration is one join + one aggregate on the edge key — no state ever
    leaves the cluster.  The DuckDB oracle computes the same components
    with a recursive transitive-closure CTE.

    The propagation loop itself lives in :func:`min_label_components`
    (ONE copy, shared with the image/video near-dup families — ADVICE
    r12: the extracted loop and this function had silently kept twin
    copies); this function owns only the jaccard-thresholded pair frame.
    """
    pairs = _lsh_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= CLUSTER_MIN_JACCARD
    )
    return min_label_components(pairs.select("doc_a", "doc_b"))


def min_label_components(pairs: DataFrame) -> DataFrame:
    """Connected components over an arbitrary (doc_a, doc_b) pair frame —
    iterative min-label propagation shared by every near-dup family
    (text via :func:`dedup_clusters`, image, video): label(v) <-
    min(label(v), labels of neighbors) to fixpoint, one join + one
    aggregate per iteration, per-iteration ``localCheckpoint`` with
    eager retirement (peak footprint does not grow with iterations).
    Returns (doc_id, cluster_id, is_duplicate) for every vertex that
    appears in at least one pair; canonical = min doc_id per component.

    A component whose diameter exceeds ``CLUSTER_MAX_ITERS`` would exit
    the loop BEFORE the fixpoint — the result would disagree with any
    exact transitive-closure oracle with nothing pointing at the cap —
    so a non-converged exit raises loudly (ADVICE r12) instead of
    returning silently-wrong labels.  Near-dup components are tiny in
    practice; a graph that trips this is a signal the pair generator is
    over-connecting, not a reason to raise the cap blindly."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .transform(_owned_ckpt)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .transform(_owned_ckpt)
    )
    prev_ckpt = labels
    changed = -1
    for _ in range(CLUSTER_MAX_ITERS):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the old label through the update so convergence is read off
        # the checkpointed result with a cheap filter-count — no second join
        stepped = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .transform(_owned_ckpt)
        )
        # stepped's eager checkpoint has materialized: iteration i-1's
        # blocks are dead — reclaim them now instead of at release_pins()
        # (ADVICE r8: peak footprint must not grow with iteration count)
        _retire_ckpt(prev_ckpt)
        prev_ckpt = stepped
        changed = stepped.filter(F.col("label") != F.col("old_label")).count()
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"min_label_components exited after {CLUSTER_MAX_ITERS} "
            f"iterations with {changed} labels still changing — a component "
            "diameter exceeds the cap and the labels are not a fixpoint"
        )
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") != F.col("label")).alias("is_duplicate"),
    )


def _shared_shingle_pairs(
    spark: SparkSession,
    sf_dir: str,
    a_name: str,
    b_name: str,
    *,
    symmetric: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared-shingle candidate blocking used by every exact near-dup
    variant: distinct per-doc shingles, equi-join on the shingle key
    (never all-pairs), one intersection count per candidate pair.

    Returns ``(pairs, sizes)``: ``pairs`` has ``(a_name, b_name,
    isect)`` — undirected ``a < b`` pairs when ``symmetric``, both
    directions otherwise — and ``sizes`` has ``(doc_id, n)`` distinct
    shingle counts for the acceptance-rule normalizer.  Consumers
    differ ONLY in that rule (Jaccard vs containment), so blocking
    changes (SHINGLE_K, pruning, skew handling) land in one place.
    """
    sh = _shingles_dup(spark, sf_dir).select("doc_id", "g").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias(a_name), "g")
    b = sh.select(F.col("doc_id").alias(b_name), "g")
    cond = (
        F.col(a_name) < F.col(b_name)
        if symmetric
        else F.col(a_name) != F.col(b_name)
    )
    pairs = (
        a.join(b, "g")
        .filter(cond)
        .groupBy(a_name, b_name)
        .agg(F.count("*").alias("isect"))
    )
    return pairs, sizes


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs (threshold 0.2), blocked on
    shared shingles.  Baseline validator for the LSH path."""
    pairs, sizes = _shared_shingle_pairs(
        spark, sf_dir, "doc_a", "doc_b", symmetric=True
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard_raw",
            F.col("isect") / (F.col("n_a") + F.col("n_b") - F.col("isect")),
        )
        .filter(F.col("jaccard_raw") >= 0.2)
        .select(
            "doc_a",
            "doc_b",
            F.col("isect").cast("long").alias("isect"),
            r6(F.col("jaccard_raw")).alias("jaccard"),
        )
    )


SIMHASH_BITS = 48  # 12 hex chars of md5; stays comfortably inside int64
SIMHASH_BANDS = 4  # hamming <= SIMHASH_BANDS-1 guarantees one exact band
SIMHASH_MAX_HAMMING = 3


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document from distinct whitespace tokens.

    bit_j(doc) = 1 iff sum over tokens of sign(bit_j(h(token))) > 0, where
    h(token) = first 48 bits of md5.  One integer per doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("w")
    ).distinct()
    tok_h = toks.withColumn(
        "hv", F.conv(F.substring(F.md5("w"), 1, SIMHASH_BITS // 4), 16, 10).cast("long")
    )
    # One sum() aggregate per bit over a single groupBy(doc_id): map-side
    # partial agg, no 48x row explosion.  The final pack into one int64 is a
    # pure projection.
    wide = tok_h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(hv >> {b}) & 1") == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    packed = None
    for b in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return wide.select("doc_id", packed.cast("long").alias("simhash"))


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates by SimHash hamming distance <= 3, band-blocked.

    Pigeonhole blocking: with 4 bands of 12 bits, any pair at hamming <= 3
    must agree exactly on at least one band, so candidate generation is an
    equi-join on (band_idx, band_bits) — never an all-pairs cross product.
    This is the 100 TB-safe shape; the hamming filter then confirms.
    """
    fp = simhash_fingerprints(spark, sf_dir)
    band_w = SIMHASH_BITS // SIMHASH_BANDS
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(f"sequence(0, {SIMHASH_BANDS - 1})")).alias("band"),
    ).withColumn(
        "band_bits",
        F.expr(f"(simhash >> (band * {band_w})) & {(1 << band_w) - 1}"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        "band",
        "band_bits",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        "band",
        "band_bits",
    )
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")).cast("long"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "sh_a", "sh_b", "hamming")
    )


def _rowlocal_sigs(docs: DataFrame) -> DataFrame:
    """(doc_id, sigs array<long>[16]) MinHash signatures computed row-locally.

    The stream-safe formulation: no explode, no groupBy — shingling,
    hashing, and the 16 min-reductions are higher-order array expressions
    evaluated per row, so the computation is legal (and stateless) inside a
    streaming query.  HOFs evaluate interpreted, which is the wrong trade
    for a 100 TB corpus scan (use ``_wide_sigs``' codegen explode+groupBy
    there) and the right one for an ingest stream's small micro-batches.
    Identical values to ``_wide_sigs`` by construction: min over the same
    shingle multiset, duplicates irrelevant.
    """
    arr = F.split("text", " ", -1)
    with_sh = (
        docs.filter(F.size(arr) >= SHINGLE_K)
        .select("doc_id", arr.alias("__w"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - F.lit(SHINGLE_K - 1)),
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                " ",
                                F.element_at("__w", i),
                                F.element_at("__w", i + 1),
                                F.element_at("__w", i + 2),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
            ).alias("__h"),
        )
    )
    return with_sh.select(
        "doc_id",
        F.array(
            *[
                F.array_min(
                    F.transform(
                        "__h",
                        lambda h: (F.lit(a).cast("long") * h + F.lit(b))
                        % F.lit(MH_P),
                    )
                )
                for a, b in zip(MH_A, MH_B)
            ]
        ).alias("sigs"),
    )


def _band_keys(sig: DataFrame) -> DataFrame:
    """Explode a (doc_id, sigs) frame into its 4 LSH band keys."""
    band_w = N_HASHES // N_BANDS
    return sig.select(
        "doc_id",
        "sigs",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "sigs",
        F.col("band").cast("long").alias("band"),
        F.concat_ws(
            "|",
            *[
                F.element_at("sigs", F.col("band").cast("int") * band_w + j)
                .cast("string")
                for j in range(1, band_w + 1)
            ],
        ).alias("band_sig"),
    )


def build_band_index(docs: DataFrame, index_path: str) -> None:
    """Materialize the LSH band index on disk, partitioned BY BAND: the
    persistent half of the ingest near-dup gate.  A probe touches only its
    4 band directories; everything else is pruned before IO."""
    _band_keys(_wide_sigs_from_docs(docs)).write.mode("overwrite").partitionBy(
        "band"
    ).parquet(index_path)


def append_band_index(new_docs: DataFrame, index_path: str) -> None:
    """Incremental index maintenance: append the band keys of newly
    admitted documents (dynamic partition overwrite is unnecessary —
    appends land inside the existing band directories).  This closes the
    ingest loop: gate the batch with ``near_dup_ingest_join`` against the
    index, admit survivors, append their keys so the NEXT batch dedups
    against them — no index rebuild, no full-corpus rescan."""
    _band_keys(_rowlocal_sigs(new_docs)).write.mode("append").partitionBy(
        "band"
    ).parquet(index_path)


def read_band_index(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(index_path).select(
        "doc_id", "sigs", F.col("band").cast("long").alias("band"), "band_sig"
    )


INGEST_MOD = 10  # doc_id % 10 == 0 plays the arriving stream


def near_dup_ingest_join(new_docs: DataFrame, corpus_bands: DataFrame) -> DataFrame:
    """Ingest-time near-dup check: new documents vs a static corpus index.

    ``new_docs`` may be a STREAM — signatures are computed row-locally
    (``_rowlocal_sigs``) and the band equi-join against the precomputed
    ``corpus_bands`` index is a stateless stream-static join, so the whole
    check runs in append mode with zero streaming state.  One output row
    per matching (new, corpus, band); est_jaccard is row-local from the
    two signature arrays riding the join — deliberately no pair-level
    aggregation, which would need watermark state the ingest gate doesn't
    have an event time for.
    """
    new_bands = _band_keys(_rowlocal_sigs(new_docs)).select(
        F.col("doc_id").alias("new_doc_id"),
        F.col("sigs").alias("new_sigs"),
        "band",
        "band_sig",
    )
    idx = corpus_bands.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("sigs").alias("corpus_sigs"),
        "band",
        "band_sig",
    )
    eq_seeds = F.size(
        F.filter(
            F.zip_with("new_sigs", "corpus_sigs", lambda x, y: x == y),
            lambda v: v,
        )
    )
    return new_bands.join(idx, ["band", "band_sig"]).select(
        "new_doc_id",
        "corpus_doc_id",
        "band",
        r6(eq_seeds / F.lit(float(N_HASHES))).alias("est_jaccard"),
    )


def near_dup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming ingest check: docs with doc_id % 10 == 0
    arrive 'new'; the rest are the indexed corpus (codegen signature path)."""
    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % INGEST_MOD == 0)
    corpus = _wide_sigs_from_docs(
        docs.filter(F.col("doc_id") % INGEST_MOD != 0)
    )
    return near_dup_ingest_join(new_docs, _band_keys(corpus))


ORACLES: dict[str, str] = {
    "dedup_exact": """
SELECT doc_id, md5(text) AS text_hash,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents
""",
    "minhash_signatures": f"""
WITH {SHINGLES_CTE}, {MINHASH_CTE}
SELECT doc_id, seed, minhash FROM mh
""",
    "dedup_minhash_lsh": f"""
WITH {SHINGLES_CTE}, {MINHASH_CTE},
bands AS (
  SELECT doc_id, cast(floor(seed / {N_HASHES // N_BANDS}) AS bigint) AS band,
         string_agg(cast(minhash AS varchar), '|' ORDER BY seed) AS band_sig
  FROM mh GROUP BY doc_id, 2
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
est AS (
  SELECT c.doc_a, c.doc_b, c.n_shared_bands,
         (round(sum(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
               / {float(N_HASHES)}, 6) + 0.0) AS est_jaccard
  FROM cand c
  JOIN mh ma ON ma.doc_id = c.doc_a
  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
  GROUP BY c.doc_a, c.doc_b, c.n_shared_bands
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
isect AS (
  SELECT e.doc_a, e.doc_b, count(*) AS isect
  FROM est e
  JOIN grams ga ON ga.doc_id = e.doc_a
  JOIN grams gb ON gb.doc_id = e.doc_b AND gb.g = ga.g
  GROUP BY e.doc_a, e.doc_b
)
SELECT e.doc_a, e.doc_b, e.n_shared_bands, e.est_jaccard,
       (round(i.isect * 1.0 / (na.n + nb.n - i.isect), 6) + 0.0) AS jaccard
FROM est e
JOIN isect i ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
JOIN sizes na ON na.doc_id = e.doc_a
JOIN sizes nb ON nb.doc_id = e.doc_b
""",
    "dedup_clusters": f"""
WITH RECURSIVE {SHINGLES_CTE}, {MINHASH_CTE},
bands AS (
  SELECT doc_id, cast(floor(seed / {N_HASHES // N_BANDS}) AS bigint) AS band,
         string_agg(cast(minhash AS varchar), '|' ORDER BY seed) AS band_sig
  FROM mh GROUP BY doc_id, 2
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
isect AS (
  SELECT c.doc_a, c.doc_b, count(*) AS isect
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
  GROUP BY c.doc_a, c.doc_b
),
lshp AS (
  SELECT i.doc_a, i.doc_b
  FROM isect i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE (round(i.isect * 1.0 / (na.n + nb.n - i.isect), 6) + 0.0)
        >= {CLUSTER_MIN_JACCARD}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM lshp
  UNION
  SELECT doc_b, doc_a FROM lshp
),
reach(s, d) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS doc_id, min(d) AS cluster_id, s <> min(d) AS is_duplicate
FROM reach GROUP BY s
""",
    "dedup_ngram_jaccard": f"""
WITH {SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, isect,
       (round(isect * 1.0 / (na.n + nb.n - isect), 6) + 0.0) AS jaccard
FROM pairs
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE isect * 1.0 / (na.n + nb.n - isect) >= 0.2
""",
    "simhash_fingerprints": f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
th AS (
  SELECT doc_id,
         cast(cast(concat('0x', substr(md5(w), 1, {SIMHASH_BITS // 4})) AS ubigint) AS bigint) AS hv
  FROM toks
),
bits AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (hv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM (SELECT doc_id, hv, unnest(range({SIMHASH_BITS})) AS bit FROM th)
  GROUP BY doc_id, bit
)
SELECT doc_id,
       cast(sum(CASE WHEN s > 0 THEN cast(1 AS bigint) << bit ELSE 0 END) AS bigint) AS simhash
FROM bits GROUP BY doc_id
""",
    "simhash_near_pairs": f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
th AS (
  SELECT doc_id,
         cast(cast(concat('0x', substr(md5(w), 1, {SIMHASH_BITS // 4})) AS ubigint) AS bigint) AS hv
  FROM toks
),
bits AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (hv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM (SELECT doc_id, hv, unnest(range({SIMHASH_BITS})) AS bit FROM th)
  GROUP BY doc_id, bit
),
fp AS (
  SELECT doc_id,
         cast(sum(CASE WHEN s > 0 THEN cast(1 AS bigint) << bit ELSE 0 END) AS bigint) AS simhash
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {SIMHASH_BITS // SIMHASH_BANDS}))
           & {(1 << (SIMHASH_BITS // SIMHASH_BANDS)) - 1} AS band_bits
  FROM (SELECT doc_id, simhash, unnest(range({SIMHASH_BANDS})) AS band FROM fp)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_bits = b.band_bits
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, sh_a, sh_b,
       cast(bit_count(xor(sh_a, sh_b)) AS bigint) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAX_HAMMING}
""",
}

ORACLES["near_dup_ingest"] = f"""
WITH {SHINGLES_CTE}, {MINHASH_CTE},
bands AS (
  SELECT doc_id, cast(floor(seed / {N_HASHES // N_BANDS}) AS bigint) AS band,
         string_agg(cast(minhash AS varchar), '|' ORDER BY seed) AS band_sig
  FROM mh GROUP BY doc_id, 2
),
pairs AS (
  SELECT n.doc_id AS new_doc_id, o.doc_id AS corpus_doc_id, n.band
  FROM bands n
  JOIN bands o ON n.band = o.band AND n.band_sig = o.band_sig
  WHERE n.doc_id % {INGEST_MOD} = 0 AND o.doc_id % {INGEST_MOD} <> 0
),
cand AS (SELECT DISTINCT new_doc_id, corpus_doc_id FROM pairs),
agree AS (
  SELECT c.new_doc_id, c.corpus_doc_id,
         (round(sum(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
               / {float(N_HASHES)}, 6) + 0.0) AS est_jaccard
  FROM cand c
  JOIN mh ma ON ma.doc_id = c.new_doc_id
  JOIN mh mb ON mb.doc_id = c.corpus_doc_id AND mb.seed = ma.seed
  GROUP BY 1, 2
)
SELECT p.new_doc_id, p.corpus_doc_id, p.band, a.est_jaccard
FROM pairs p
JOIN agree a ON p.new_doc_id = a.new_doc_id
            AND p.corpus_doc_id = a.corpus_doc_id
"""

QUERIES = {
    "dedup_exact": dedup_exact,
    "near_dup_ingest": near_dup_ingest,
    "minhash_signatures": minhash_signatures,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_clusters": dedup_clusters,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "simhash_fingerprints": simhash_fingerprints,
    "simhash_near_pairs": simhash_near_pairs,
}


# ---------------------------------------------------------------------------
# Asymmetric containment dedup
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8  # fraction of the contained doc's shingles


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED near-dup detection by shingle containment
    C(A -> B) = |A∩B| / |A|: a short document living entirely inside a
    longer one scores containment ~1 while its Jaccard can be tiny
    (|A∪B| is dominated by B) — the quote/excerpt/boilerplate-wrapper
    case every symmetric dedup pass misses.  Output rows are directed:
    ``contained_doc``'s shingles are ``containment``-covered by
    ``container_doc``.

    Scale shape is ``dedup_ngram_jaccard``'s: candidates from the
    shared-shingle equi-join (never all-pairs), one intersection count
    per candidate pair, sizes joined back.  Same blocking, different
    normalizer — which is the point: the candidate machinery is shared
    and only the acceptance rule changes.
    """
    pairs, sizes = _shared_shingle_pairs(
        spark, sf_dir, "contained_doc", "container_doc", symmetric=False
    )
    na = sizes.select(
        F.col("doc_id").alias("contained_doc"), F.col("n").alias("n_a")
    )
    return (
        pairs.join(na, "contained_doc")
        .withColumn("c_raw", F.col("isect") / F.col("n_a"))
        .filter(F.col("c_raw") >= CONTAINMENT_THRESHOLD)
        .select(
            "contained_doc",
            "container_doc",
            F.col("isect").cast("long").alias("isect"),
            F.col("n_a").cast("long").alias("n_contained"),
            r6(F.col("c_raw")).alias("containment"),
        )
    )


ORACLES["dedup_containment"] = f"""
WITH {SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS contained_doc, b.doc_id AS container_doc,
         count(*) AS isect
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT contained_doc, container_doc, isect,
       cast(na.n AS bigint) AS n_contained,
       (round(isect * 1.0 / na.n, 6) + 0.0) AS containment
FROM pairs
JOIN sizes na ON na.doc_id = contained_doc
WHERE isect * 1.0 / na.n >= {CONTAINMENT_THRESHOLD}
"""
QUERIES["dedup_containment"] = dedup_containment


# ---------------------------------------------------------------------------
# Contrastive training-pair export
# ---------------------------------------------------------------------------

CONTRASTIVE_POS_J = 0.5  # exact Jaccard floor for a positive pair
CONTRASTIVE_BUCKETS = 64  # hash buckets for the negative pairing


def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training pairs for a similarity/embedding model, mined from the
    dedup machinery itself: POSITIVES are LSH near-dup pairs with exact
    Jaccard >= {CONTRASTIVE_POS_J}; NEGATIVES pair hash-adjacent
    documents that share NO LSH band (blocked-candidate anti-join), so
    they are near-dup-free by the same evidence the dedup pass trusts.

    Negative pairing is scale-safe: documents are hashed into
    {CONTRASTIVE_BUCKETS} buckets and consecutive docs in each bucket's
    md5 order are paired — the rank window is per-bucket, never a global
    sequence, and yields ~one negative per document in one shuffle.
    Pairs are emitted unbalanced with a ``kind`` tag; downstream
    samplers (mixture_sample / weighted_sample) own the class ratio.
    """
    lsh = _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    pos = lsh.filter(F.col("jaccard") >= CONTRASTIVE_POS_J).select(
        "doc_a",
        "doc_b",
        F.lit(1).cast("long").alias("label"),
        F.lit("near_dup").alias("kind"),
    )
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cp")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long"),
        F.lit(CONTRASTIVE_BUCKETS),
    )
    perm = load_table(spark, sf_dir, "documents").select(
        "doc_id", h.alias("h"), bucket.alias("b")
    )
    w = Window.partitionBy("b").orderBy("h", "doc_id")
    ranked = perm.withColumn("rn", F.row_number().over(w))
    nxt = ranked.select(
        "b", (F.col("rn") - 1).alias("rn"), F.col("doc_id").alias("nid")
    )
    negcand = ranked.join(nxt, ["b", "rn"]).select(
        F.least("doc_id", "nid").alias("doc_a"),
        F.greatest("doc_id", "nid").alias("doc_b"),
    )
    neg = negcand.join(
        lsh.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
    ).select(
        "doc_a",
        "doc_b",
        F.lit(0).cast("long").alias("label"),
        F.lit("random").alias("kind"),
    )
    return pos.unionByName(neg)


ORACLES["contrastive_pairs"] = f"""
WITH {SHINGLES_CTE}, {MINHASH_CTE},
bands AS (
  SELECT doc_id, cast(floor(seed / {N_HASHES // N_BANDS}) AS bigint) AS band,
         string_agg(cast(minhash AS varchar), '|' ORDER BY seed) AS band_sig
  FROM mh GROUP BY doc_id, 2
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
pos AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN (
    SELECT c2.doc_a, c2.doc_b, count(*) AS isect
    FROM cand c2
    JOIN grams ga ON ga.doc_id = c2.doc_a
    JOIN grams gb ON gb.doc_id = c2.doc_b AND gb.g = ga.g
    GROUP BY 1, 2
  ) i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes na ON na.doc_id = c.doc_a
  JOIN sizes nb ON nb.doc_id = c.doc_b
  WHERE (round(i.isect * 1.0 / (na.n + nb.n - i.isect), 6) + 0.0)
        >= {CONTRASTIVE_POS_J}
),
perm AS (
  SELECT doc_id, md5(cast(doc_id AS varchar) || ':cp') AS h,
         cast(cast(concat('0x',
              substr(md5(cast(doc_id AS varchar) || ':cp'), 1, 4))
              AS ubigint) AS bigint) % {CONTRASTIVE_BUCKETS} AS b
  FROM documents
),
ranked AS (
  SELECT doc_id, b,
         row_number() OVER (PARTITION BY b ORDER BY h, doc_id) AS rn
  FROM perm
),
negcand AS (
  SELECT least(a.doc_id, c.doc_id) AS doc_a,
         greatest(a.doc_id, c.doc_id) AS doc_b
  FROM ranked a JOIN ranked c ON c.b = a.b AND c.rn = a.rn + 1
),
neg AS (
  SELECT n.doc_a, n.doc_b FROM negcand n
  WHERE NOT EXISTS (SELECT 1 FROM cand c
                    WHERE c.doc_a = n.doc_a AND c.doc_b = n.doc_b)
)
SELECT doc_a, doc_b, cast(1 AS bigint) AS label, 'near_dup' AS kind FROM pos
UNION ALL
SELECT doc_a, doc_b, cast(0 AS bigint) AS label, 'random' AS kind FROM neg
"""
QUERIES["contrastive_pairs"] = contrastive_pairs


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap gate)
# ---------------------------------------------------------------------------

DECON_MOD = 17  # pseudo-benchmark membership: doc_id % DECON_MOD == 0
DECON_MIN_SHARED = 5  # shared distinct shingles at/above this => flagged


def benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination gate: flag training documents sharing
    >= DECON_MIN_SHARED distinct word-3-gram shingles with any benchmark
    document — the n-gram-overlap decontamination pass an LLM data
    pipeline runs before training so eval suites stay held out.  The
    "benchmark" here is a deterministic slice (doc_id % DECON_MOD == 0)
    standing in for the real eval corpora; swap the membership predicate
    and nothing else changes.

    Complements (does not duplicate) ``text_analysis.contamination_check``:
    that one scores each EVAL document by the fraction of its grams found
    anywhere in train ("how burned is this eval doc"); this one walks the
    other direction and ATTRIBUTES — for each offending TRAINING doc,
    which single benchmark doc it overlaps worst ("what do I delete, and
    which benchmark did it compromise").

    Output: one row per contaminated training doc with its WORST overlap
    (max shared shingles; ties to the smallest bench_id) plus the doc's
    own shingle count — all integers, fully value-gated.

    Scale shape: the same shared-shingle equi-join discipline as the
    dedup family — candidates come from the shingle key join against the
    (much smaller) benchmark shingle set, never doc x doc; the benchmark
    side of a real deployment broadcasts.
    """
    sh = _shingles_dup(spark, sf_dir).select("doc_id", "g").distinct()
    bench = sh.filter(F.col("doc_id") % DECON_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    train = sh.filter(F.col("doc_id") % DECON_MOD != 0)
    sizes = train.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    shared = (
        train.join(bench, "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= DECON_MIN_SHARED)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_shared"), F.asc("bench_id")
    )
    return (
        shared.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sizes, "doc_id")
        .select("doc_id", "bench_id", "n_shared", "n_shingles")
    )


ORACLES["benchmark_decontam"] = f"""
WITH {SHINGLES_CTE},
bench AS (
  SELECT doc_id AS bench_id, g FROM grams WHERE doc_id % {DECON_MOD} = 0
),
train AS (
  SELECT doc_id, g FROM grams WHERE doc_id % {DECON_MOD} <> 0
),
sizes AS (
  SELECT doc_id, cast(count(*) AS bigint) AS n_shingles
  FROM train GROUP BY doc_id
),
shared AS (
  SELECT t.doc_id, b.bench_id, cast(count(*) AS bigint) AS n_shared
  FROM train t JOIN bench b USING (g)
  GROUP BY t.doc_id, b.bench_id
  HAVING count(*) >= {DECON_MIN_SHARED}
),
best AS (
  SELECT doc_id, bench_id, n_shared,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY n_shared DESC, bench_id) AS rn
  FROM shared
)
SELECT b.doc_id, b.bench_id, b.n_shared, s.n_shingles
FROM best b JOIN sizes s USING (doc_id)
WHERE rn = 1
"""
QUERIES["benchmark_decontam"] = benchmark_decontam


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection for fuzzy dedup — the
    RefinedWeb/FineWeb discipline: within each near-dup cluster KEEP the
    highest-quality member, not the smallest id.  Min-id canonicals
    (dedup_clusters) are cheap but keep whichever clone happened to land
    first; production corpora keep the best-written duplicate, so the
    canonical choice is argmax over a quality signal with a
    deterministic id tie-break.

    Composition, all existing gated pieces: the connected-component
    labels from :func:`dedup_clusters` (LSH-banded, never all-pairs)
    joined to the ``quality_score`` heuristic, then ONE window per
    cluster — rank by (quality desc, doc_id asc), keep rank 1.  Ranking
    uses the ROUNDED quality (bit-identical across engines by the r6
    contract), so the argmax cannot split between Spark and the oracle.
    Scale shape: clusters are tiny (near-dup groups), the window key is
    the cluster id — O(cluster members) per group, no new wide state.
    """
    from .text_analysis import quality_score

    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        labels.join(q, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            (F.col("rk") == 1).alias("keep"),
        )
    )
# the dedup_clusters closure CTEs + the quality_score scoring CTEs, then
# one keep-window; STOPWORDS_SQL keeps the stopword test identical to the
# Spark side (the quality_score contract)
from ..functions import STOPWORDS_SQL as _STOPWORDS_SQL  # noqa: E402

ORACLES["dedup_keep_best"] = f"""
WITH RECURSIVE {SHINGLES_CTE}, {MINHASH_CTE},
bands AS (
  SELECT doc_id, cast(floor(seed / {N_HASHES // N_BANDS}) AS bigint) AS band,
         string_agg(cast(minhash AS varchar), '|' ORDER BY seed) AS band_sig
  FROM mh GROUP BY doc_id, 2
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
isect AS (
  SELECT c.doc_a, c.doc_b, count(*) AS isect
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
  GROUP BY c.doc_a, c.doc_b
),
lshp AS (
  SELECT i.doc_a, i.doc_b
  FROM isect i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE (round(i.isect * 1.0 / (na.n + nb.n - i.isect), 6) + 0.0)
        >= {CLUSTER_MIN_JACCARD}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM lshp
  UNION
  SELECT doc_b, doc_a FROM lshp
),
reach(s, d) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
labels AS (SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s),
qtoks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
per_doc AS (
  SELECT doc_id, count(*) AS n_words, avg(length(w)) AS awl,
         sum(CASE WHEN w IN {_STOPWORDS_SQL} THEN 1 ELSE 0 END) * 1.0
           / count(*) AS swr
  FROM qtoks GROUP BY doc_id
),
q AS (
  SELECT doc_id,
         (round(0.4 * least(n_words / 50.0, 1.0)
               + 0.3 * (1.0 - abs(swr - 0.4))
               + 0.3 * least(awl / 8.0, 1.0), 6) + 0.0) AS quality
  FROM per_doc
)
SELECT l.doc_id, l.cluster_id, q.quality,
       row_number() OVER (PARTITION BY l.cluster_id
                          ORDER BY q.quality DESC, l.doc_id) = 1 AS keep
FROM labels l JOIN q USING (doc_id)
"""
QUERIES["dedup_keep_best"] = dedup_keep_best


# ---------------------------------------------------------------------------
# LSH band-layout tuning sweep
# ---------------------------------------------------------------------------

TUNING_BAND_CONFIGS = (1, 2, 4, 8, 16)  # band counts over the 16-hash sig
TUNING_J = 0.5  # exact-Jaccard ground-truth threshold for the sweep


def minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision curve over MinHash-LSH band layouts — the lexical
    twin of ``similarity.ann_recall_sweep``: the table an operator reads
    to pick bands x rows before committing a 100 TB dedup pass to one
    S-curve.

    Every layout re-bands the SAME {N_HASHES}-hash signature (bands b,
    rows r = {N_HASHES}/b); candidates are band-collision pairs, scored
    against the exact ground truth of shingle-Jaccard >= {TUNING_J}
    pairs.  The truth set is COMPLETE despite blocking: a pair with
    J >= t > 0 shares at least one shingle by definition, so the
    shared-shingle equi-join loses nothing.  More bands / fewer rows =>
    looser sieve (recall up, precision down); the emitted counts trace
    that curve empirically rather than from the 1-(1-J^r)^b idealization.

    Unlike the ANN sweeps (learned quantizers => determinate-fact gates),
    everything here is deterministic — md5-derived MinHash, exact integer
    counts, unrounded int/int ratios — so the sweep is FULL value-gated.

    Scale shape: ONE signature build and ONE exact-truth build (both
    pinned, reused by all {len(TUNING_BAND_CONFIGS)} layouts), then per
    layout a slim (doc_id, band, band_sig) self-join and one scalar
    aggregate.  In production the sweep runs on a bounded calibration
    sample (ann_recall_sweep's N_QUERIES discipline), never the full
    corpus.
    """
    sig = pin(_wide_sigs(spark, sf_dir))
    pairs, sizes = _shared_shingle_pairs(
        spark, sf_dir, "doc_a", "doc_b", symmetric=True
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    truth = pin(
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.col("isect") / (F.col("n_a") + F.col("n_b") - F.col("isect"))
            >= TUNING_J
        )
        .select("doc_a", "doc_b", F.lit(1).alias("t"))
    )
    truth_n = truth.agg(F.count("*").cast("long").alias("n_truth"))
    out = None
    for b in TUNING_BAND_CONFIGS:
        r = N_HASHES // b
        bands = sig.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("band"),
            "sigs",
        ).select(
            "doc_id",
            "band",
            F.concat_ws(
                "|",
                *[
                    F.element_at(
                        "sigs", F.col("band").cast("int") * r + j
                    ).cast("string")
                    for j in range(1, r + 1)
                ],
            ).alias("band_sig"),
        )
        x, y = bands.alias("x"), bands.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.band_sig") == F.col("y.band_sig"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        stats = (
            cand.join(truth, ["doc_a", "doc_b"], "left")
            .agg(
                F.lit(b).cast("long").alias("bands"),
                F.lit(r).cast("long").alias("rows_per_band"),
                F.count("*").cast("long").alias("n_candidates"),
                F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_hits"),
            )
            .crossJoin(F.broadcast(truth_n))
        )
        row = stats.select(
            "bands",
            "rows_per_band",
            "n_truth",
            "n_candidates",
            "n_hits",
            (
                F.col("n_hits") / F.expr("nullif(n_truth, 0)")
            ).alias("recall"),
            (
                F.col("n_hits") / F.expr("nullif(n_candidates, 0)")
            ).alias("precision"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_TUNING_CFG_SQL = ", ".join(str(b) for b in TUNING_BAND_CONFIGS)

ORACLES["minhash_band_tuning"] = f"""
WITH {SHINGLES_CTE}, {MINHASH_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
isect AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
  FROM grams a JOIN grams b ON b.g = a.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM isect i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE i.isect * 1.0 / (na.n + nb.n - i.isect) >= {TUNING_J}
),
tn AS (SELECT count(*) AS n_truth FROM truth),
cfg AS (SELECT unnest([{_TUNING_CFG_SQL}]) AS bands),
bsig AS (
  SELECT c.bands, m.doc_id,
         cast(floor(m.seed / ({N_HASHES} / c.bands)) AS bigint) AS band,
         string_agg(cast(m.minhash AS varchar), '|' ORDER BY m.seed)
           AS band_sig
  FROM mh m CROSS JOIN cfg c
  GROUP BY 1, 2, 3
),
cand AS (
  SELECT DISTINCT x.bands, x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bsig x
  JOIN bsig y ON y.bands = x.bands AND y.band = x.band
             AND y.band_sig = x.band_sig AND x.doc_id < y.doc_id
),
agg AS (
  SELECT c.bands, count(*) AS n_candidates,
         sum(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
  FROM cand c
  LEFT JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
  GROUP BY 1
)
SELECT cast(cfg.bands AS bigint) AS bands,
       cast({N_HASHES} // cfg.bands AS bigint) AS rows_per_band,
       cast(tn.n_truth AS bigint) AS n_truth,
       cast(coalesce(a.n_candidates, 0) AS bigint) AS n_candidates,
       cast(coalesce(a.n_hits, 0) AS bigint) AS n_hits,
       coalesce(a.n_hits, 0)
         / cast(nullif(tn.n_truth, 0) AS double) AS recall,
       coalesce(a.n_hits, 0)
         / cast(nullif(coalesce(a.n_candidates, 0), 0) AS double)
         AS "precision"
FROM cfg LEFT JOIN agg a USING (bands) CROSS JOIN tn
"""
QUERIES["minhash_band_tuning"] = minhash_band_tuning
