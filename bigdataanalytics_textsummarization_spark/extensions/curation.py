"""End-to-end training-data curation pipeline — the flagship composition.

Chains the extension operators the way a real corpus build does:

    quality filter -> language filter -> exact-dedup canonical filter ->
    near-dup cluster canonical filter -> deterministic train/valid/test
    split -> per-split document/token accounting

Every stage is one of the already-gated operators (quality_score, lang_id,
dedup_exact, dedup_clusters, train_test_split, token_count), composed as
plain DataFrame joins/anti-joins, so the whole pipeline remains a single
declarative plan — Catalyst sees through the composition (filters push,
dims broadcast, the dedup diamond reuses its shuffles at scale shape).
The DuckDB oracle re-composes the same stages as one WITH RECURSIVE
statement and value-checks the final per-split accounting.

At 100 TB this is the query that matters: it touches the corpus a
bounded number of times (text scans for scoring + shingling), shuffles
only on doc-sized keys, and ends in a 3-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import SPLIT_BUCKET_SQL, STOPWORDS_SQL, leaf, pin, r6
from ..io import load_table
from .dedup import (
    CLUSTER_MIN_JACCARD,
    MINHASH_CTE,
    N_BANDS,
    N_HASHES,
    SHINGLES_CTE,
    dedup_clusters,
    dedup_exact,
    _lsh_pairs,
)
from .dedup import ORACLES as _DEDUP_ORACLES
from .similarity import (
    _EMB_CTE,
    _EMB_CTE_WIDE,
    NEAR_DUP_THRESHOLD,
    SIGN_DIMS,
    SIGN_DIMS_WIDE,
    _bucket_cosine_pairs,
)
from .text_analysis import _LEX_VALUES, lang_id, quality_score, token_count, train_test_split

QUALITY_MIN = 0.6
KEEP_LANG = "en"


def _kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents surviving quality -> language -> exact-dup -> near-dup."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keep_q = quality_score(spark, sf_dir).filter(
        F.col("quality") >= QUALITY_MIN
    ).select("doc_id")
    keep_l = lang_id(spark, sf_dir).filter(
        F.col("pred_lang") == KEEP_LANG
    ).select("doc_id")
    drop_exact = dedup_exact(spark, sf_dir).filter(
        F.col("is_duplicate")
    ).select("doc_id")
    drop_near = dedup_clusters(spark, sf_dir).filter(
        F.col("is_duplicate")
    ).select("doc_id")
    return (
        docs.join(keep_q, "doc_id")
        .join(keep_l, "doc_id")
        .join(drop_exact, "doc_id", "left_anti")
        .join(drop_near, "doc_id", "left_anti")
    )


def _split_accounting(spark: SparkSession, sf_dir: str, kept: DataFrame) -> DataFrame:
    split = train_test_split(spark, sf_dir).select("doc_id", "split")
    toks = token_count(spark, sf_dir).select("doc_id", "ws_tokens")
    return (
        kept.join(split, "doc_id")
        .join(toks, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("n_tokens"),
        )
    )


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split (train/valid/test) surviving-document and token counts
    after the full curation chain."""
    return _split_accounting(spark, sf_dir, _kept_docs(spark, sf_dir))


def curation_with_observation(spark: SparkSession, sf_dir: str):
    """``curation_pipeline`` plus free run accounting.

    Returns ``(result_df, observation)``: the Observation's metrics
    (surviving doc count) are computed as a side effect of whatever action
    the caller runs on the result — at 100 TB the difference between this
    and a separate ``kept.count()`` is a full re-execution of the chain.
    ``observation.get`` blocks until the caller's action completes.
    """
    from pyspark.sql import Observation

    obs = Observation("curation")
    kept = _kept_docs(spark, sf_dir).observe(
        obs, F.count(F.lit(1)).alias("kept_docs")
    )
    return _split_accounting(spark, sf_dir, kept), obs


# Per-language sampling rates: the data-mixing knob of corpus curation
# (up/down-weight languages or sources when composing a training mix).
SAMPLE_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.1}
SAMPLE_DEFAULT_RATE = 0.05
_SAMPLE_BUCKETS = 10000


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample of the corpus.

    Keep decision = md5 of the salted doc key modulo 10k buckets compared
    against the stratum's rate — a pure projection: no shuffle, no RNG, no
    driver state.  Unlike ``df.sampleBy`` (seeded Bernoulli whose draw
    depends on partition layout), the hash decision is reproducible across
    engines, cluster sizes, and re-runs, and any doc's fate is auditable
    from its id alone — the property a 100 TB corpus build needs when a
    sample must be re-derived months later.  The salt decorrelates the
    sample from the train/valid/test split hash (same md5 family,
    different key-space).
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lg, F.lit(r))
            for lg, r in SAMPLE_RATES.items()
        ],
        F.lit(SAMPLE_DEFAULT_RATE),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % _SAMPLE_BUCKETS
    )
    return docs.select(
        "doc_id",
        "lang",
        rate.alias("rate"),
        bucket.alias("bucket"),
        (bucket < F.round(rate * _SAMPLE_BUCKETS)).alias("sampled"),
    )


MIX_ALPHA = 0.5  # temperature exponent for source re-weighting
MIX_BUDGET = 10_000  # docs per sampling epoch


def source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing weights (the multilingual-sampling
    rule of mBERT/XLM-R, applied to corpus sources): raw share p_s is
    flattened to p_s^alpha and renormalized, so low-resource sources are
    up-sampled without letting any single giant source dominate an epoch.
    ``quota`` is the resulting per-source document budget.

    The corpus is scanned ONCE into the per-source count; the scalar
    normalizers (corpus total, sums of flattened weights) are 1-row
    aggregates broadcast back over the O(sources) frame (the ``eede4da``
    DSIR pattern, r13) — no unpartitioned window, so no stage coalesces
    the frame to a single partition and the certified plan carries no
    ``WindowExec: No Partition Defined`` warning.  The aggregates read
    the per-source frame, never the corpus, so the corpus is still
    scanned exactly once.

    The QUOTA column is derived with the order-fixed integer chain of
    :func:`token_budget_mixture` (r11: ``quota`` gates document
    membership downstream — ``mixture_sample`` admits ``rk <= quota`` —
    so a free-double ``round()`` at a .5 boundary was the same latent
    flake class fixed there): sqrt (IEEE correctly-rounded, unlike pow)
    floor-quantized to integer micro-units, then bigint division.  The
    descriptive ``p_mix`` ratio derives from the SAME integer
    ``pa_micro`` totals (ADVICE r13: a raw-double ``sum(pa)``
    normalizer's fold order can vary with partitioning, so an r6
    rounding-boundary flip vs the oracle was theoretically possible);
    ``p_raw`` is a per-row double over an exact-integer bigint sum —
    no distributed double fold remains anywhere in the query.
    """
    assert MIX_ALPHA == 0.5  # the quota chain's sqrt IS pow(·, MIX_ALPHA)
    docs = load_table(spark, sf_dir, "documents")
    # leafed so the two scalar-total branches and the final select all
    # read the materialized O(sources) aggregate — the corpus is scanned
    # once, at leaf build (the broadcast branches never touch the files)
    per = leaf(
        docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    )
    total = per.agg(F.sum("n_docs").cast("long").alias("_total_docs"))
    based = (
        per.crossJoin(F.broadcast(total))
        .withColumn("p", F.col("n_docs") / F.col("_total_docs"))
        .withColumn(
            "pa_micro",
            F.floor(F.sqrt("p") * F.lit(1_000_000.0)).cast("long"),
        )
    )
    sums = based.agg(F.sum("pa_micro").cast("long").alias("_sum_pa_micro"))
    return based.crossJoin(F.broadcast(sums)).select(
        "source",
        "n_docs",
        r6(F.col("p")).alias("p_raw"),
        r6(F.col("pa_micro") / F.col("_sum_pa_micro")).alias("p_mix"),
        F.expr(f"(pa_micro * {MIX_BUDGET}) div _sum_pa_micro")
        .cast("long")
        .alias("quota"),
    )


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature mixture: the per-source quotas of
    ``source_mixture`` become an actual epoch sample — each source's
    documents are ranked by salted hash and the top ``quota`` survive.

    This closes the loop from mixing policy to training epoch: the
    sampling is an order-by-hash rank within each source (deterministic,
    re-derivable, decorrelated from the split and stratified-sample
    hashes by its own salt), so two runs — or two engines — materialize
    the identical epoch.  Shape: the quota table is O(sources) and
    broadcasts; ranking is one hash shuffle on source + per-source local
    sort, same as shard_shuffle.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    quotas = source_mixture(spark, sf_dir).select("source", "quota")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = docs.select("doc_id", "source", h.alias("h")).withColumn(
        "rk", F.row_number().over(w).cast("long")
    )
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "source", "rk")
    )


WRS_K = 200  # weighted-sample size (without replacement)


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement by the Efraimidis-Spirakis
    A-Res scheme: each document draws key = ln(u)/w (u uniform, w its
    weight — here ``n_chars``) and the k largest keys are the sample;
    the classic distributed one-pass algorithm (a length-weighted epoch
    favors long documents without ever materializing per-copy
    expansion).

    Reproducibility: u is not an RNG draw but an md5-derived uniform in
    (0, 1) keyed by doc_id — two runs, two engines, or a re-run on grown
    data give the SAME keys for the same documents (the engine's salted-
    hash convention, which is what makes the sample value-gateable at
    all).  Scale shape: key assignment is a zero-shuffle projection and
    the top-k is a distributed TakeOrdered (sort+limit), never a global
    window over the corpus; the rank window runs on the k survivors
    only.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":wrs"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    u = (h + 1) / F.lit(float(2**48 + 1))  # in (0, 1): ln() stays finite
    keyed = (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            (F.log(u) / F.col("n_chars")).alias("key"),
        )
        .orderBy(F.desc("key"), "doc_id")
        .limit(WRS_K)
    )
    w = Window.orderBy(F.desc("key"), "doc_id")
    return keyed.select(
        "doc_id",
        "weight",
        F.row_number().over(w).cast("long").alias("rk"),
        r6(F.col("key")).alias("key"),
    )


N_SHARDS = 8


def shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: shard assignment + in-shard
    position for writing training shards.

    Training wants the corpus in a reproducible pseudo-random order, but a
    global ``orderBy(rand())`` is a full sort with an RNG that depends on
    partition layout.  The scale shape is hash-order: md5 of the salted
    key picks both the shard (modulo) and the within-shard order (the hash
    value itself) — one hash shuffle on ``shard`` plus a per-shard local
    sort, no global sort, and any document's placement is re-derivable
    from its id alone.  This is exactly
    ``repartition(N, shard).sortWithinPartitions(h)`` at write time; the
    query exposes the assignment so the oracle can value-check it.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    sharded = docs.select("doc_id", h.alias("h"), (h % N_SHARDS).alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return sharded.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


_SPLIT_EXPR = SPLIT_BUCKET_SQL  # the shared split contract (functions.py)

_RATE_SQL = "cast(CASE " + " ".join(
    f"WHEN lang = '{lg}' THEN {r}" for lg, r in SAMPLE_RATES.items()
) + f" ELSE {SAMPLE_DEFAULT_RATE} END AS double)"

_BUCKET_SQL = (
    "cast(cast(concat('0x', substr(md5(cast(doc_id AS varchar) || ':sample'), "
    "1, 12)) AS ubigint) AS bigint) % " + str(_SAMPLE_BUCKETS)
)

ORACLES: dict[str, str] = {
    "curation_pipeline": f"""
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
near_dups AS (
  SELECT s AS doc_id FROM reach GROUP BY s HAVING s <> min(d)
),
exact_dups AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM documents
  ) WHERE doc_id <> canon
),
qtoks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
per_doc AS (
  SELECT doc_id, count(*) AS n_words, avg(length(w)) AS awl,
         sum(CASE WHEN w IN {STOPWORDS_SQL} THEN 1 ELSE 0 END) * 1.0
           / count(*) AS swr
  FROM qtoks GROUP BY doc_id
),
keep_q AS (
  SELECT doc_id FROM per_doc
  WHERE (round(0.4 * least(n_words / 50.0, 1.0)
              + 0.3 * (1.0 - abs(swr - 0.4))
              + 0.3 * least(awl / 8.0, 1.0), 6) + 0.0) >= {QUALITY_MIN}
),
lex(cand_lang, w) AS (VALUES {_LEX_VALUES}),
lscores AS (
  SELECT t.doc_id, l.cand_lang, count(*) AS score
  FROM qtoks t JOIN lex l ON t.w = l.w
  GROUP BY t.doc_id, l.cand_lang
),
keep_l AS (
  SELECT doc_id FROM (
    SELECT doc_id, cand_lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cand_lang ASC) AS rk
    FROM lscores
  ) WHERE rk = 1 AND cand_lang = '{KEEP_LANG}'
),
kept AS (
  SELECT d.doc_id FROM documents d
  JOIN keep_q USING (doc_id)
  JOIN keep_l USING (doc_id)
  WHERE d.doc_id NOT IN (SELECT doc_id FROM exact_dups)
    AND d.doc_id NOT IN (SELECT doc_id FROM near_dups)
)
SELECT CASE WHEN {_SPLIT_EXPR} < 80 THEN 'train'
            WHEN {_SPLIT_EXPR} < 90 THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       cast(sum(len(string_split(text, ' '))) AS bigint) AS n_tokens
FROM documents
WHERE doc_id IN (SELECT doc_id FROM kept)
GROUP BY 1
""",
    "stratified_sample": f"""
SELECT doc_id, lang,
       {_RATE_SQL} AS rate,
       {_BUCKET_SQL} AS bucket,
       {_BUCKET_SQL} < round(({_RATE_SQL}) * {_SAMPLE_BUCKETS}) AS sampled
FROM documents
""",
    "shard_shuffle": f"""
WITH h AS (
  SELECT doc_id,
         cast(cast(concat('0x',
           substr(md5(cast(doc_id AS varchar) || ':shard'), 1, 12))
           AS ubigint) AS bigint) AS h
  FROM documents
)
SELECT doc_id, h % {N_SHARDS} AS shard,
       cast(row_number() OVER (PARTITION BY h % {N_SHARDS}
                               ORDER BY h, doc_id) AS bigint) AS pos
FROM h
""",
    "mixture_sample": f"""
WITH per AS (
  SELECT source, cast(count(*) AS bigint) AS n_docs FROM documents GROUP BY source
),
shared AS (
  SELECT source, n_docs,
         cast(floor(sqrt(
             n_docs / (SELECT cast(sum(n_docs) AS double) FROM per)
         ) * 1000000.0) AS bigint) AS pa_micro
  FROM per
),
q AS (
  SELECT source,
         cast((pa_micro * {MIX_BUDGET})
              // (SELECT cast(sum(pa_micro) AS bigint) FROM shared)
              AS bigint) AS quota
  FROM shared
),
h AS (
  SELECT doc_id, source,
         cast(cast(concat('0x',
           substr(md5(cast(doc_id AS varchar) || ':mix'), 1, 12))
           AS ubigint) AS bigint) AS h
  FROM documents
),
r AS (
  SELECT doc_id, source,
         cast(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
              AS bigint) AS rk
  FROM h
)
SELECT doc_id, source, rk FROM r JOIN q USING (source) WHERE rk <= quota
""",
    "source_mixture": f"""
WITH per AS (
  SELECT source, cast(count(*) AS bigint) AS n_docs FROM documents GROUP BY source
),
shared AS (
  SELECT source, n_docs,
         n_docs / (SELECT cast(sum(n_docs) AS double) FROM per) AS p,
         cast(floor(sqrt(
             n_docs / (SELECT cast(sum(n_docs) AS double) FROM per)
         ) * 1000000.0) AS bigint) AS pa_micro
  FROM per
)
SELECT source, n_docs,
       (round(p, 6) + 0.0) AS p_raw,
       (round(pa_micro / (SELECT cast(sum(pa_micro) AS double) FROM shared),
              6) + 0.0) AS p_mix,
       cast((pa_micro * {MIX_BUDGET})
            // (SELECT cast(sum(pa_micro) AS bigint) FROM shared)
            AS bigint) AS quota
FROM shared
""",
}

QUERIES = {
    "curation_pipeline": curation_pipeline,
    "stratified_sample": stratified_sample,
    "source_mixture": source_mixture,
    "shard_shuffle": shard_shuffle,
    "mixture_sample": mixture_sample,
}


ORACLES["weighted_sample"] = f"""
WITH keyed AS (
  SELECT doc_id, cast(n_chars AS bigint) AS weight,
         ln((cast(cast(concat('0x',
               substr(md5(cast(doc_id AS varchar) || ':wrs'), 1, 12))
               AS ubigint) AS bigint) + 1) / {float(2**48 + 1)})
           / n_chars AS key
  FROM documents WHERE n_chars > 0
)
SELECT * FROM (
  SELECT doc_id, weight,
         cast(row_number() OVER (ORDER BY key DESC, doc_id) AS bigint) AS rk,
         (round(key, 6) + 0.0) AS key
  FROM keyed
) WHERE rk <= {WRS_K}
"""
QUERIES["weighted_sample"] = weighted_sample


# ---------------------------------------------------------------------------
# Per-domain admission caps (Common-Crawl per-host cap shape)
# ---------------------------------------------------------------------------

DOMAIN_CAP = 10  # max docs admitted per (source, lang) domain


def domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain admission cap: keep at most DOMAIN_CAP documents per
    (source, lang) domain, chosen by a deterministic md5 lottery — the
    per-host cap a web-corpus build applies so no single domain dominates
    the training mix (source/lang stand in for the crawl host key).

    The lottery key is md5(doc_id), so admission is reproducible across
    engines and runs, uniform within a domain, and independent of row
    order — which is also what makes it value-gateable.  Output is the
    admitted docs with their lottery rank.  Distinct from
    ``stratified_sample`` (per-stratum RATES — proportions preserved) and
    ``mixture_sample`` (target mix): a cap is a hard per-domain CEILING,
    leaving small domains untouched while truncating heavy ones.

    Scale note: rank-within-domain is one shuffle on the domain key.  A
    hot domain serializes its own ranking window; at crawl scale the
    two-phase variant (per-salt partial top-CAP, then merge — the exact
    top-k decomposition, since a domain's global top-CAP is contained in
    the union of its per-salt top-CAPs) bounds any reducer at CAP x
    N_SALTS rows.  At the gate the single-window form IS the plan
    AQE-free Spark picks.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= DOMAIN_CAP)
    )


ORACLES["domain_caps"] = f"""
SELECT doc_id, source, lang, rk FROM (
  SELECT doc_id, source, lang,
         cast(row_number() OVER (
             PARTITION BY source, lang
             ORDER BY md5(cast(doc_id AS varchar)), doc_id
         ) AS bigint) AS rk
  FROM documents
) WHERE rk <= {DOMAIN_CAP}
"""
QUERIES["domain_caps"] = domain_caps


# ---------------------------------------------------------------------------
# Token-budgeted mixture epoch (r10): mixtures are specified in TOKENS
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 500_000  # tokens per sampling epoch


def _token_quotas(per: DataFrame) -> DataFrame:
    """(source, src_tokens) -> (source, token_quota): the order-fixed
    temperature-quota chain shared verbatim by :func:`token_budget_mixture`
    and its salted twin (they gate against the same oracle, so the quota
    derivation must be one copy).  Scalar totals are 1-row aggregates
    broadcast back over the O(sources) frame (the ``eede4da`` DSIR
    pattern, r13) instead of unpartitioned windows — same exact-integer
    values (long sums are fold-order-free; pa_micro is per-row), no
    single-partition stage in the plan.  ``per`` is leafed here (both
    twins build the identical O(sources) aggregate over the shared docs
    leaf, so the memo hands them ONE materialized frame) — the total and
    sum branches read the leaf, never re-aggregating the corpus.
    """
    per = leaf(per)
    total = per.agg(F.sum("src_tokens").cast("long").alias("_total_tokens"))
    based = per.crossJoin(F.broadcast(total)).withColumn(
        "pa_micro",
        F.floor(
            F.sqrt(F.col("src_tokens") / F.col("_total_tokens"))
            * F.lit(1_000_000.0)
        ).cast("long"),
    )
    sums = based.agg(F.sum("pa_micro").cast("long").alias("_sum_pa"))
    return based.crossJoin(F.broadcast(sums)).select(
        "source",
        F.expr(f"(pa_micro * {TOKEN_BUDGET}) div _sum_pa")
        .cast("long")
        .alias("token_quota"),
    )


def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a TOKEN-budgeted mixture epoch — the way real
    pretraining mixtures are specified (a source contributes N tokens,
    not N documents; a source of long documents would otherwise eat the
    epoch).  Per-source raw TOKEN shares are temperature-flattened
    exactly like :func:`source_mixture` (p_s^alpha, renormalized) into
    per-source token quotas, then each source's documents are ranked by
    salted hash (its own ``:tokmix`` salt, decorrelated from the split/
    sample/mix hashes) and the greedy hash-ordered PREFIX whose running
    token sum stays within quota survives — the deterministic epoch cut,
    not a knapsack (same prefix discipline as :func:`mixture_sample`,
    budget-aware).

    Scale shape: the (doc_id, source, n_tokens) projection is an owned
    leaf — the quota branch and the ranking branch both consume it, so
    the text column is scanned and token-counted ONCE (the leaf is 3
    narrow columns, far smaller than the text it summarizes); the quota
    table is O(sources) and broadcasts; ranking + running sum is ONE
    hash shuffle on source and one per-source window pass.
    Deterministic and re-derivable: two runs, two engines, or a re-run
    on grown data admit the same prefix for unchanged (source, hash)
    ranks.

    Quota arithmetic is ORDER-FIXED and engine-exact (ADVICE r10: a
    free-double ``round()`` quota can flip by one token at a .5
    boundary, and a one-token quota flip flips document membership at
    the prefix cut — the textrank top-k flake class).  Three exact
    steps: (1) token totals sum as LONGS (order-independent), so
    ``p = src_tokens / total`` is one correctly-rounded double division
    of exact integers; (2) the temperature flatten is ``sqrt(p)``
    (MIX_ALPHA == 0.5) — IEEE-754 requires sqrt to be CORRECTLY
    ROUNDED, unlike pow, so both engines produce the identical double —
    quantized to integer micro-units by ``floor``; (3) quota =
    ``pa_micro * TOKEN_BUDGET div sum(pa_micro)`` is pure bigint
    arithmetic.  No free double ever reaches the membership gate.

    Hot-source note (VERDICT r10): the per-source running sum is a
    single-reducer window per source — at the gate (and for any mixture
    whose sources are balanced) that IS the plan Spark picks, and the
    reducer is bounded by the largest source's doc COUNT (3 narrow
    columns, not text).  For a genuinely hot source at crawl scale the
    classic two-phase distributed prefix sum applies: range-partition
    each source by the hash-rank key, compute per-range partial token
    sums (one map-side pass), broadcast the O(ranges) cumulative
    offsets, then cut each range locally at ``quota - offset`` — same
    admitted prefix, reducer bounded at corpus/ranges rows.  (Unlike
    ``domain_caps``'s top-CAP union trick, a prefix CUT needs the
    offset broadcast — the cut point depends on every earlier range's
    total.)
    """
    assert MIX_ALPHA == 0.5  # the sqrt() below IS pow(·, MIX_ALPHA)
    docs = leaf(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        )
    )
    per = docs.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("src_tokens")
    )
    quotas = _token_quotas(per)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":tokmix"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    ws = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = (
        docs.select("doc_id", "source", "n_tokens", h.alias("h"))
        .withColumn("rk", F.row_number().over(ws).cast("long"))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens")
            .over(ws.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
    )
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("cum_tokens") <= F.col("token_quota"))
        .select("doc_id", "source", "rk", "n_tokens", "cum_tokens")
    )


ORACLES["token_budget_mixture"] = f"""
WITH docs_t AS (
  SELECT doc_id, source,
         cast(len(string_split(text, ' ')) AS bigint) AS n_tokens,
         cast(cast(concat('0x',
             substr(md5(cast(doc_id AS varchar) || ':tokmix'), 1, 12))
             AS ubigint) AS bigint) AS h
  FROM documents
),
per AS (
  SELECT source, cast(sum(n_tokens) AS bigint) AS src_tokens
  FROM docs_t GROUP BY source
),
shared AS (
  SELECT source,
         cast(floor(sqrt(
             src_tokens
             / (SELECT cast(sum(src_tokens) AS bigint) FROM per)
         ) * 1000000.0) AS bigint) AS pa_micro
  FROM per
),
quotas AS (
  SELECT source,
         cast((pa_micro * {TOKEN_BUDGET})
              // (SELECT cast(sum(pa_micro) AS bigint) FROM shared)
              AS bigint) AS token_quota
  FROM shared
),
ranked AS (
  SELECT doc_id, source, n_tokens,
         cast(row_number() OVER (
             PARTITION BY source ORDER BY h, doc_id) AS bigint) AS rk,
         cast(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS bigint) AS cum_tokens
  FROM docs_t
)
SELECT r.doc_id, r.source, r.rk, r.n_tokens, r.cum_tokens
FROM ranked r JOIN quotas q ON r.source = q.source
WHERE r.cum_tokens <= q.token_quota
"""
QUERIES["token_budget_mixture"] = token_budget_mixture


N_PREFIX_RANGES = 8  # hash ranges per source in the two-phase prefix cut


def token_budget_mixture_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-source plan for :func:`token_budget_mixture` (VERDICT r10
    task 6), as certifiable code: the classic TWO-PHASE distributed
    prefix sum replaces the per-source single-reducer running-sum
    window, producing the BIT-IDENTICAL epoch cut (it shares the same
    oracle).

    The per-source (h, doc_id) order is range-partitioned by the hash
    value into ``N_PREFIX_RANGES`` contiguous intervals (``h div W`` —
    ranges respect the sort order by construction, and a row's range is
    a projection, no sampling pass).  Phase 1: rank and prefix-sum
    WITHIN each (source, range) — every reducer is bounded at
    ~|source| / N_PREFIX_RANGES rows instead of the whole source.
    Phase 2: per-(source, range) totals (an O(sources × ranges)
    aggregate) turn into cumulative offsets via a window over that tiny
    frame, broadcast back, and each row's global rank / running sum is
    local + offset.  The cut at ``quota`` then happens range-locally.
    All arithmetic is exact integers, so local + offset EQUALS the
    single-window prefix — which is what makes the decomposition
    value-gateable against the same SQL, not merely argued.  (A prefix
    CUT needs the offset broadcast, unlike ``domain_caps``'s top-CAP
    union trick: the cut point depends on every earlier range's total.)
    """
    assert MIX_ALPHA == 0.5  # same quota derivation as the single-window twin
    docs = leaf(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        )
    )
    per = docs.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("src_tokens")
    )
    quotas = _token_quotas(per)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":tokmix"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    range_w = (2**48) // N_PREFIX_RANGES  # h is 12 hex chars: h < 2^48
    keyed = docs.select(
        "doc_id", "source", "n_tokens", h.alias("h")
    ).withColumn("rng", F.expr(f"h div {range_w}").cast("long"))
    # phase 1: bounded per-(source, range) local rank + local prefix sum
    lw = Window.partitionBy("source", "rng").orderBy("h", "doc_id")
    local = keyed.withColumn(
        "l_rk", F.row_number().over(lw).cast("long")
    ).withColumn(
        "l_cum",
        F.sum("n_tokens")
        .over(lw.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    # phase 2: O(sources x ranges) totals -> cumulative offsets
    ow = (
        Window.partitionBy("source")
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        keyed.groupBy("source", "rng")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("n_tokens").cast("long").alias("rng_tokens"),
        )
        .select(
            "source",
            "rng",
            F.coalesce(F.sum("n_rows").over(ow), F.lit(0))
            .cast("long")
            .alias("rk_off"),
            F.coalesce(F.sum("rng_tokens").over(ow), F.lit(0))
            .cast("long")
            .alias("tok_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), ["source", "rng"])
        .join(F.broadcast(quotas), "source")
        .select(
            "doc_id",
            "source",
            (F.col("l_rk") + F.col("rk_off")).alias("rk"),
            "n_tokens",
            (F.col("l_cum") + F.col("tok_off")).alias("cum_tokens"),
            "token_quota",
        )
        .filter(F.col("cum_tokens") <= F.col("token_quota"))
        .select("doc_id", "source", "rk", "n_tokens", "cum_tokens")
    )


# bit-identical by construction to the single-window form: same oracle
ORACLES["token_budget_mixture_salted"] = ORACLES["token_budget_mixture"]
QUERIES["token_budget_mixture_salted"] = token_budget_mixture_salted


# ---------------------------------------------------------------------------
# Hybrid dedup agreement audit (r10): lexical vs semantic near-dup pairs
# ---------------------------------------------------------------------------


def _hybrid_dedup_audit_at(
    spark: SparkSession, sf_dir: str, dims: int
) -> DataFrame:
    """Agreement audit between the two near-dup detectors — the question
    a curation engineer actually asks before trusting cheap lexical
    dedup at 100 TB: which pairs does MinHash-LSH (exact Jaccard >= the
    cluster threshold) flag that embedding-cosine dedup misses, and vice
    versa?  One row per pair FLAGGED by either detector, with scores
    (absent score = -1.0, kept null-free for the typed value gate).

    Each method's verdict is THREE-state (ADVICE r10 — a binary verdict
    conflated 'scored below threshold' with 'never even a candidate'):

    * ``flagged`` — the detector surfaced the pair and scored it at or
      above its threshold;
    * ``below_threshold`` — the pair WAS a candidate (LSH band
      collision with a shared shingle; same cosine bucket) but scored
      under the threshold — a genuine detector disagreement;
    * ``not_a_candidate`` — the pair never reached the detector's
      scorer (band non-collision on the lexical side, bucket mismatch
      on the semantic side) — a blocking/recall artifact, not a scored
      disagreement.

    Bridges the documents and embeddings tables through the corpus's
    1:1 doc_id↔vec_id keying.  Scale shape: both inputs are already
    candidate-bounded (banded LSH; bucketed cosine), and the audit is
    ONE full-outer equi-join of the two candidate sets keyed on the
    pair — O(candidates), never a new pairwise stage.
    """
    lex_c = _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    sem_c = _bucket_cosine_pairs(spark, sf_dir, dims=dims).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        "sim_raw",
    )
    lex_state = (
        F.when(F.col("jaccard").isNull(), F.lit("not_a_candidate"))
        .when(
            F.col("jaccard") >= CLUSTER_MIN_JACCARD, F.lit("flagged")
        )
        .otherwise(F.lit("below_threshold"))
    )
    sem_state = (
        F.when(F.col("sim_raw").isNull(), F.lit("not_a_candidate"))
        .when(
            F.col("sim_raw") >= NEAR_DUP_THRESHOLD, F.lit("flagged")
        )
        .otherwise(F.lit("below_threshold"))
    )
    return (
        lex_c.join(sem_c, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            lex_state.alias("lexical"),
            sem_state.alias("semantic"),
            F.coalesce("jaccard", F.lit(-1.0)).alias("jaccard"),
            F.coalesce(r6(F.col("sim_raw")), F.lit(-1.0)).alias("cosine"),
        )
        .filter(
            (F.col("lexical") == "flagged") | (F.col("semantic") == "flagged")
        )
    )


def hybrid_dedup_audit(
    spark: SparkSession, sf_dir: str, dims: int = SIGN_DIMS_WIDE
) -> DataFrame:
    """Lexical-vs-semantic near-dup agreement audit (see
    :func:`_hybrid_dedup_audit_at`).

    The public default is the PRODUCTION semantic blocking width
    (``SIGN_DIMS_WIDE``; dims ~ log2(corpus)) — the narrow ``SIGN_DIMS``
    width is an oracle-gate constant, pinned expressly by the registered
    query (:func:`hybrid_dedup_audit_gate`; VERDICT r15 task 3)."""
    return _hybrid_dedup_audit_at(spark, sf_dir, dims)


def hybrid_dedup_audit_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered ``hybrid_dedup_audit`` oracle gate: the identical plan
    with the narrow SIGN_DIMS semantic width pinned expressly (the
    public API defaults to production width)."""
    return _hybrid_dedup_audit_at(spark, sf_dir, SIGN_DIMS)


def hybrid_dedup_audit_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-width hybrid audit: the same one-full-outer-join
    composition with the semantic candidate set blocked at
    SIGN_DIMS_WIDE hyperplanes (the lexical side's banded LSH is
    already occupancy-bounded at any scale) — the audit tier inherits
    whatever blocking its detectors ship, so the production audit
    composes over the production detector, removing the narrow
    16-bucket candidate wall from the audit's own x100 row."""
    return _hybrid_dedup_audit_at(spark, sf_dir, SIGN_DIMS_WIDE)


# the oracle composes the lexical detector's certified candidate oracle
# verbatim as a nested CTE body (DuckDB scopes inner WITHs per-CTE) and
# the semantic candidate set from the shared _EMB_CTE (the same CTE the
# certified embedding_near_dups oracle filters), so the audit's ground
# truth cannot drift from the detectors' own gates
def _hybrid_audit_oracle_of(emb_cte: str) -> str:
    """The audit oracle at either semantic blocking width: the lexical
    detector's certified candidate oracle rides verbatim; only the
    embedding CTE (and with it the bucket width) varies."""
    return f"""
WITH lex AS ({_DEDUP_ORACLES["dedup_minhash_lsh"]}),
{emb_cte},
sem AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS sim_raw
  FROM embn a
  JOIN embn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT * FROM (
  SELECT coalesce(l.doc_a, s.doc_a) AS doc_a,
         coalesce(l.doc_b, s.doc_b) AS doc_b,
         CASE WHEN l.jaccard IS NULL THEN 'not_a_candidate'
              WHEN l.jaccard >= {CLUSTER_MIN_JACCARD} THEN 'flagged'
              ELSE 'below_threshold' END AS lexical,
         CASE WHEN s.sim_raw IS NULL THEN 'not_a_candidate'
              WHEN s.sim_raw >= {NEAR_DUP_THRESHOLD} THEN 'flagged'
              ELSE 'below_threshold' END AS semantic,
         coalesce(l.jaccard, -1.0) AS jaccard,
         coalesce((round(s.sim_raw, 6) + 0.0), -1.0) AS cosine
  FROM lex l
  FULL OUTER JOIN sem s ON l.doc_a = s.doc_a AND l.doc_b = s.doc_b
) WHERE lexical = 'flagged' OR semantic = 'flagged'
"""


ORACLES["hybrid_dedup_audit"] = _hybrid_audit_oracle_of(_EMB_CTE)
QUERIES["hybrid_dedup_audit"] = hybrid_dedup_audit_gate
ORACLES["hybrid_dedup_audit_wide"] = _hybrid_audit_oracle_of(_EMB_CTE_WIDE)
QUERIES["hybrid_dedup_audit_wide"] = hybrid_dedup_audit_wide


# ---------------------------------------------------------------------------
# DSIR — data selection by importance resampling (Xie et al. 2023, r11)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024  # hashed-unigram feature space (the paper hashes n-grams)
DSIR_TARGET_LANG = "en"  # the target-domain slice the raw corpus is steered to
DSIR_K = 200  # resampled epoch size


def _dsir_doc_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document hashed-unigram bucket counts — the single corpus scan
    the whole DSIR pipeline rides, leafed so the target LM, the raw
    (source) LM and the per-document scoring all consume ONE
    materialized (doc_id, lang, b, cnt) aggregate instead of
    re-tokenizing the text three times.  Cardinality is bounded by
    docs × min(doc vocab, DSIR_BUCKETS) — far smaller than the token
    stream at any scale."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ", -1)).alias("w"),
    )
    b = (
        F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    return leaf(
        docs.select("doc_id", "lang", b.alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per document, the
    log-likelihood ratio of a TARGET-domain hashed-unigram LM over the
    RAW-corpus LM — the standard cheap way to steer a crawl-scale corpus
    toward a target domain without a trained classifier.  Target here is
    the corpus's own ``lang = 'en'`` slice (the paper's target is any
    small high-quality set; the mechanics are identical).

    Both LMs are add-1-smoothed over the DSIR_BUCKETS hashed-feature
    space: p(b) = (c(b) + 1) / (N + B).  Since the source LM counts the
    FULL corpus, every bucket a document can hit has a source count, so
    the log-ratio is total on the join — no null handling in the fold.

    Scale shape: ONE corpus scan (the leafed ``_dsir_doc_buckets``
    aggregate feeds both LMs and the scoring), the LM table is O(B)
    rows and broadcasts, the per-document score is an ORDER-FIXED fold
    (bucket-sorted, the vocab_kl_drift pattern) over that document's
    buckets.  The two scalar token totals are a 1-row aggregate
    broadcast back over the O(B) LM frame (the snapshot_drift pattern)
    rather than an unpartitioned window, so no stage ever coalesces the
    frame to a single partition.
    """
    db = _dsir_doc_buckets(spark, sf_dir)
    src = db.groupBy("b").agg(F.sum("cnt").cast("long").alias("c_s"))
    tgt = (
        db.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.sum("cnt").cast("long").alias("c_t"))
    )
    counts = src.join(tgt, "b", "left").select(
        "b", "c_s", F.coalesce("c_t", F.lit(0)).alias("c_t")
    )
    totals = counts.agg(
        F.sum("c_s").cast("long").alias("n_s"),
        F.sum("c_t").cast("long").alias("n_t"),
    )
    lm = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.col("c_t") + 1)
                    / (F.col("n_t") + F.lit(DSIR_BUCKETS)).cast("double")
                )
                - F.log(
                    (F.col("c_s") + 1)
                    / (F.col("n_s") + F.lit(DSIR_BUCKETS)).cast("double")
                )
            ).alias("r"),
        )
    )
    contrib = db.join(F.broadcast(lm), "b").select(
        "doc_id", "lang", "b", "cnt", (F.col("cnt") * F.col("r")).alias("c")
    )
    fold = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("b", F.col("c")))),
            lambda s: s["c"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return contrib.groupBy("doc_id", "lang").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        r6(fold).alias("logw"),
        r6(fold / F.sum("cnt")).alias("logw_per_token"),
    )


def dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR resampling step: a without-replacement sample of DSIR_K
    documents with probability proportional to the importance weight —
    Efraimidis-Spirakis A-Res exactly as :func:`weighted_sample`, with
    w_d = exp(per-token log ratio).  The weight input is the ROUNDED
    ``logw_per_token`` (the certified engine-equal value), so the
    membership cut never reads a free engine-ulp double — the textrank
    top-k lesson.  u is the md5-derived uniform under its own ``:dsir``
    salt; two engines or two runs admit the identical epoch.  Top-k is a
    distributed TakeOrdered (sort+limit), never a corpus-wide window.
    """
    scored = dsir_weights(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":dsir"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    u = (h + 1) / F.lit(float(2**48 + 1))  # in (0, 1): ln() stays finite
    keyed = (
        scored.select(
            "doc_id",
            "logw_per_token",
            (F.log(u) / F.exp(F.col("logw_per_token"))).alias("key"),
        )
        .orderBy(F.desc("key"), "doc_id")
        .limit(DSIR_K)
    )
    rkw = Window.orderBy(F.desc("key"), "doc_id")
    return keyed.select(
        "doc_id",
        "logw_per_token",
        F.row_number().over(rkw).cast("long").alias("rk"),
        r6(F.col("key")).alias("key"),
    )


_DSIR_BUCKET_SQL = (
    "cast(cast(concat('0x', substr(md5(w), 1, 12)) AS ubigint) AS bigint) "
    f"% {DSIR_BUCKETS}"
)

_DSIR_WEIGHTS_CTE = f"""
db AS (
  SELECT doc_id, lang, b, cast(count(*) AS bigint) AS cnt FROM (
    SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS b
    FROM (SELECT doc_id, lang,
                 unnest(string_split(lower(text), ' ')) AS w
          FROM documents)
  ) GROUP BY doc_id, lang, b
),
lm AS (
  SELECT b,
         ln((c_t + 1) / cast((SELECT sum(c_t) FROM (
               SELECT cast(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                                    THEN cnt ELSE 0 END) AS bigint) AS c_t
               FROM db GROUP BY b)) + {DSIR_BUCKETS} AS double))
         - ln((c_s + 1) / cast((SELECT sum(c_s) FROM (
               SELECT cast(sum(cnt) AS bigint) AS c_s
               FROM db GROUP BY b)) + {DSIR_BUCKETS} AS double)) AS r
  FROM (
    SELECT b,
           cast(sum(cnt) AS bigint) AS c_s,
           cast(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                         THEN cnt ELSE 0 END) AS bigint) AS c_t
    FROM db GROUP BY b
  )
),
scored AS (
  SELECT doc_id, lang,
         cast(sum(cnt) AS bigint) AS n_tokens,
         (round(
            list_aggregate(list(cnt * r ORDER BY b), 'sum'), 6) + 0.0
         ) AS logw,
         (round(
            list_aggregate(list(cnt * r ORDER BY b), 'sum') / sum(cnt),
            6) + 0.0
         ) AS logw_per_token
  FROM db JOIN lm USING (b)
  GROUP BY doc_id, lang
)"""

ORACLES["dsir_weights"] = f"""
WITH {_DSIR_WEIGHTS_CTE}
SELECT doc_id, lang, n_tokens, logw, logw_per_token FROM scored
"""
QUERIES["dsir_weights"] = dsir_weights

ORACLES["dsir_sample"] = f"""
WITH {_DSIR_WEIGHTS_CTE},
keyed AS (
  SELECT doc_id, logw_per_token,
         ln((cast(cast(concat('0x',
               substr(md5(cast(doc_id AS varchar) || ':dsir'), 1, 12))
               AS ubigint) AS bigint) + 1) / {float(2**48 + 1)})
           / exp(logw_per_token) AS key
  FROM scored
)
SELECT doc_id, logw_per_token, rk, (round(key, 6) + 0.0) AS key FROM (
  SELECT doc_id, logw_per_token, key,
         cast(row_number() OVER (ORDER BY key DESC, doc_id) AS bigint) AS rk
  FROM keyed
) WHERE rk <= {DSIR_K}
"""
QUERIES["dsir_sample"] = dsir_sample


DSIR_INGEST_MOD = 10  # doc_id % MOD == 0 arrives "new"; the LM trains on the rest


def _dsir_bucket(col: str):
    """Shared hashed-unigram bucket expression (md5 % DSIR_BUCKETS)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")
        % DSIR_BUCKETS
    )


def _dsir_lm(train_docs: DataFrame) -> DataFrame:
    """The STATIC DSIR log-ratio table a deployment freezes at train
    time: one row per bucket 0..DSIR_BUCKETS-1 (spine-complete via a
    range join, so serve-time lookups are total — an arriving document
    can hash anywhere), with the add-1-smoothed target/source log
    ratio.  O(B) rows: broadcast at serve time."""
    spark = train_docs.sparkSession
    wb = train_docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ", -1)).alias("w")
    ).select("lang", _dsir_bucket("w").alias("b"))
    counts = wb.groupBy("b").agg(
        F.count("*").cast("long").alias("c_s"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).cast("long").alias("c_t"),
    )
    spine = spark.range(DSIR_BUCKETS).select(F.col("id").alias("b"))
    filled = spine.join(counts, "b", "left").select(
        "b",
        F.coalesce("c_s", F.lit(0)).alias("c_s"),
        F.coalesce("c_t", F.lit(0)).alias("c_t"),
    )
    totals = filled.agg(
        F.sum("c_s").cast("long").alias("n_s"),
        F.sum("c_t").cast("long").alias("n_t"),
    )
    return (
        filled.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.col("c_t") + 1)
                    / (F.col("n_t") + F.lit(DSIR_BUCKETS)).cast("double")
                )
                - F.log(
                    (F.col("c_s") + 1)
                    / (F.col("n_s") + F.lit(DSIR_BUCKETS)).cast("double")
                )
            ).alias("r"),
        )
    )


def dsir_ingest_score(new_docs: DataFrame, lm: DataFrame) -> DataFrame:
    """Score ARRIVING documents against the static DSIR ratio table —
    the serve-time half of importance-based selection (train/serve
    split, unlike :func:`dsir_weights` where the corpus scores itself).

    ``new_docs`` may be a STREAM: bucket extraction is row-local, the
    ratio lookup is ONE stateless stream-static broadcast join against
    the spine-complete O(B) table (total — no unseen-bucket null path),
    and because each document arrives as one row the per-doc fold is
    micro-batch-local — run it inside ``foreachBatch`` with zero
    cross-batch state (the ``ppl_ingest_score`` argument)."""
    new_bk = (
        new_docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ", -1)).alias("w")
        )
        .select("doc_id", _dsir_bucket("w").alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    contrib = new_bk.join(F.broadcast(lm), "b").select(
        "doc_id", "b", "cnt", (F.col("cnt") * F.col("r")).alias("c")
    )
    fold = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("b", F.col("c")))),
            lambda s: s["c"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        r6(fold).alias("logw"),
        r6(fold / F.sum("cnt")).alias("logw_per_token"),
    )


def dsir_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming DSIR gate: docs with
    doc_id % DSIR_INGEST_MOD == 0 arrive 'new'; the ratio table trains
    on the rest (stream==batch pinned in tests/test_streaming.py)."""
    docs = load_table(spark, sf_dir, "documents")
    lm = pin(
        _dsir_lm(docs.filter(F.col("doc_id") % DSIR_INGEST_MOD != 0))
    )
    return dsir_ingest_score(
        docs.filter(F.col("doc_id") % DSIR_INGEST_MOD == 0), lm
    )


ORACLES["dsir_ingest"] = f"""
WITH train_wb AS (
  SELECT lang, {_DSIR_BUCKET_SQL} AS b
  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
        FROM documents WHERE doc_id % {DSIR_INGEST_MOD} <> 0)
),
counts AS (
  SELECT b, cast(count(*) AS bigint) AS c_s,
         cast(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                       THEN 1 ELSE 0 END) AS bigint) AS c_t
  FROM train_wb GROUP BY b
),
lm AS (
  SELECT s.b,
         ln((coalesce(c.c_t, 0) + 1)
            / cast((SELECT sum(c_t) FROM counts) + {DSIR_BUCKETS} AS double))
         - ln((coalesce(c.c_s, 0) + 1)
            / cast((SELECT sum(c_s) FROM counts) + {DSIR_BUCKETS} AS double))
           AS r
  FROM (SELECT unnest(range(0, {DSIR_BUCKETS})) AS b) s
  LEFT JOIN counts c ON c.b = s.b
),
new_bk AS (
  SELECT doc_id, b, cast(count(*) AS bigint) AS cnt FROM (
    SELECT doc_id, {_DSIR_BUCKET_SQL} AS b
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
          FROM documents WHERE doc_id % {DSIR_INGEST_MOD} = 0)
  ) GROUP BY doc_id, b
)
SELECT doc_id,
       cast(sum(cnt) AS bigint) AS n_tokens,
       (round(
          list_aggregate(list(cnt * r ORDER BY b), 'sum'), 6) + 0.0
       ) AS logw,
       (round(
          list_aggregate(list(cnt * r ORDER BY b), 'sum') / sum(cnt),
          6) + 0.0
       ) AS logw_per_token
FROM new_bk JOIN lm USING (b)
GROUP BY doc_id
"""
QUERIES["dsir_ingest"] = dsir_ingest


# ---------------------------------------------------------------------------
# Decontamination audit (late r13): lexical vs semantic benchmark
# attribution on the same doc_ids — the eval-hygiene twin of
# hybrid_dedup_audit.
# ---------------------------------------------------------------------------


def decontam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between the two decontaminators — the question an
    eval-hygiene pass answers before deleting anything: which training
    documents does the shingle gate (``benchmark_decontam``) flag that
    the embedding gate (``semantic_decontam``) misses, and vice versa?
    Paraphrase contamination shows up as semantic-only; short verbatim
    quotes as lexical-only; hard contamination as both.

    One row per training document flagged by EITHER detector, carrying
    each detector's worst-match attribution (benchmark id + score) with
    null-free sentinels (-1 ids/counts, -1.0 cosine).  Both detectors
    run on the same doc_id % 17 benchmark slice and the corpus's 1:1
    doc_id<->vec_id keying bridges documents to embeddings, so the join
    key IS the document.  Scale shape: both inputs are already
    candidate-bounded AND argmax-reduced to one row per flagged doc, so
    the audit is one full-outer equi-join over two tiny frames —
    O(flagged docs)."""
    from .dedup import benchmark_decontam
    from .similarity import semantic_decontam_gate

    lex = benchmark_decontam(spark, sf_dir).select(
        "doc_id",
        F.col("bench_id").alias("lex_bench_id"),
        "n_shared",
    )
    # the semantic side pins the narrow oracle-gate width expressly (the
    # public semantic_decontam defaults to production width since r16;
    # this audit's DuckDB oracle composes the narrow detector oracle)
    sem = semantic_decontam_gate(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.col("benchmark_id").alias("sem_bench_id"),
        "cosine",
    )
    return lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("n_shared").isNull(), F.lit("clean"))
        .otherwise(F.lit("flagged"))
        .alias("lexical"),
        F.when(F.col("cosine").isNull(), F.lit("clean"))
        .otherwise(F.lit("flagged"))
        .alias("semantic"),
        F.coalesce("lex_bench_id", F.lit(-1).cast("long")).alias(
            "lex_bench_id"
        ),
        F.coalesce("n_shared", F.lit(-1).cast("long")).alias("n_shared"),
        F.coalesce("sem_bench_id", F.lit(-1).cast("long")).alias(
            "sem_bench_id"
        ),
        F.coalesce("cosine", F.lit(-1.0)).alias("cosine"),
    )


def _install_decontam_audit_oracle() -> None:
    from .similarity import ORACLES as _SIM_ORACLES

    ORACLES["decontam_audit"] = f"""
WITH lex AS ({_DEDUP_ORACLES["benchmark_decontam"]}),
sem AS ({_SIM_ORACLES["semantic_decontam"]})
SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
       CASE WHEN l.n_shared IS NULL THEN 'clean' ELSE 'flagged' END
         AS lexical,
       CASE WHEN s.cosine IS NULL THEN 'clean' ELSE 'flagged' END
         AS semantic,
       coalesce(l.bench_id, cast(-1 AS bigint)) AS lex_bench_id,
       coalesce(l.n_shared, cast(-1 AS bigint)) AS n_shared,
       coalesce(s.benchmark_id, cast(-1 AS bigint)) AS sem_bench_id,
       coalesce(s.cosine, -1.0) AS cosine
FROM lex l
FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
"""


_install_decontam_audit_oracle()
QUERIES["decontam_audit"] = decontam_audit
