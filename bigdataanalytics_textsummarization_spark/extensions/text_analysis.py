"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, winnowing fingerprints.

All four are pure relational/column transforms — no UDF anywhere, so every
operator stays inside whole-stage codegen and the DuckDB oracle replicates
the values exactly.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import (
    SPLIT_BUCKET_SQL,
    STOPWORDS,
    STOPWORDS_SQL,
    _owned_ckpt,
    _retire_ckpt,
    leaf,
    pin,
    r6,
    split_bucket,
)
from ..io import input_bytes, load_table

# Small marker lexicons per language (public stopword cores).  The synthetic
# corpus is English-flavored word soup, so the *predictions* skew 'en' — the
# operator contract (deterministic n-gram/lexicon scoring, argmax with
# lexicographic tiebreak, 'und' when no evidence) is what's under test.
LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "fr": ("le", "la", "les", "et", "des", "une", "est", "pour"),
    "es": ("el", "los", "las", "y", "de", "que", "una", "por"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh": ("de", "shi", "bu", "wo", "ni", "ta", "men", "zai"),
}

FINGERPRINT_WINDOW = 4  # winnowing window (w consecutive k-gram hashes)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-hit language ID with deterministic argmax.

    score(doc, lang) = #tokens in lang's lexicon; prediction = lang with the
    highest score (ties -> lexicographically smallest lang); 'und' with
    score 0 when nothing matches.
    """
    docs = load_table(spark, sf_dir, "documents")
    # VALUES LocalRelation (r17, the bm25 pattern): canonicalization-
    # stable across builds, no driver RDD round-trip.  Values are
    # ''-escaped (ADVICE r17): today's lexicon is plain ASCII, but a
    # future entry containing a quote must not break the parse.
    _vals = ", ".join(
        f"('{lang}', '{w.replace(chr(39), chr(39) * 2)}')"
        for lang, words in LEXICONS.items()
        for w in words
    )
    lex = spark.sql(f"SELECT cand_lang, w FROM VALUES {_vals} AS v(cand_lang, w)")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ", -1)).alias("w")
    )
    scores = (
        toks.join(F.broadcast(lex), "w")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("score"))
    )
    # argmax as one aggregate (r17, the LPA mode() discipline): max
    # score with ties to the lexicographically smallest lang is
    # min(struct(-score, lang)) — removes the window's exchange + sort
    best = (
        scores.groupBy("doc_id")
        .agg(
            F.min(F.struct((-F.col("score")).alias("ns"), "cand_lang")).alias(
                "m"
            )
        )
        .select(
            "doc_id",
            F.col("m.cand_lang").alias("cand_lang"),
            (-F.col("m.ns")).alias("score"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cand_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
            F.col("lang").alias("labeled_lang"),
        )
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, word-shape, and stopword signals.

    score = 0.4 * min(n_words/50, 1)            (enough content)
          + 0.3 * (1 - |stopword_ratio - 0.4|)  (natural-language register)
          + 0.3 * min(avg_word_len/8, 1)        (lexical richness)
    """
    docs = load_table(spark, sf_dir, "documents")
    # r17 (guide §2.4 "remove shuffles outright"): every signal is
    # document-LOCAL, so the old explode + groupBy(doc_id) + join-back
    # (two exchanges over the corpus token stream) is a zero-shuffle
    # array projection.  Values are bit-identical: the word multiset is
    # the same split, n_words == count of exploded rows (split(-1)
    # keeps empties), and awl/swr divide EXACT integer sums (lengths
    # and stopword hits sum as longs < 2^53 in any order) by the same
    # count — the identical IEEE division the aggregate computed.
    arr = F.split(F.lower("text"), " ", -1)
    n_words = F.size(arr).cast("long")
    sum_len = F.aggregate(
        arr, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    # one parsed SQL expression, not a 179-literal python Column tree:
    # building isin(*STOPWORDS) through py4j cost ~0.2s of CONSTRUCT per
    # build (measured; the parser takes ~0.01s for the same tree)
    n_stop = F.expr(
        "cast(size(filter(split(lower(text), ' ', -1),"
        f" w -> w IN {STOPWORDS_SQL})) AS bigint)"
    )
    # text IS NOT NULL pins the NULL-text semantics to the oracle's
    # (ADVICE r17): the oracle's per_doc CTE derives from unnest(),
    # which emits nothing for NULL text, and the final INNER join drops
    # such docs — the row-local projection must drop them too, not emit
    # a row of NULL metrics.  No-op on the (NULL-free) testdata.
    return (
        docs.filter(F.col("text").isNotNull())
        .withColumns(
            {
                "n_words": n_words,
                "awl": sum_len / n_words,
                "swr": n_stop / n_words,
            }
        )
        .select(
            "doc_id",
            "n_words",
            F.col("n_chars").cast("long").alias("n_chars"),
            r6(F.col("awl")).alias("avg_word_len"),
            r6(F.col("swr")).alias("stopword_ratio"),
            r6(
                0.4 * F.least(F.col("n_words") / 50.0, F.lit(1.0))
                + 0.3 * (1.0 - F.abs(F.col("swr") - 0.4))
                + 0.3 * F.least(F.col("awl") / 8.0, F.lit(1.0))
            ).alias("quality"),
        )
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish token counts per document (F7 analog).

    bpe_ish counts maximal runs of letters, digits, or single other
    non-space symbols — a cheap proxy for subword tokenizer cost
    accounting in data pipelines.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("ws_tokens"),
        F.expr(
            "size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))"
        )
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.length("text").cast("long").alias("chars"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003 pattern):
    md5 over word-3-grams, min over each sliding window of 4 hashes,
    distinct mins per doc.  Rolling-hash document fingerprinting for
    robust near-dup detection at scale (fingerprints are tiny vs text)."""
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ", -1)
    # entirely array-side: gram hashes via transform, sliding-window min via
    # slice + array_min — no window, no sort, no shuffle before the distinct
    hashes = F.when(
        F.size(arr) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - F.lit(2)),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at(arr, i),
                    F.element_at(arr, i + 1),
                    F.element_at(arr, i + 2),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Materialize the gram hashes as a column first: fps below references it
    # three times (size, sequence bound, slice), and inlining the md5-per-gram
    # transform at each reference would re-hash the whole doc once per window
    # position — O(n^2) md5 calls.  A separate projection keeps it O(n);
    # CollapseProject leaves non-cheap multi-referenced aliases alone.
    hashed = docs.select("doc_id", hashes.alias("hashes"))
    fps = F.when(
        F.size("hashes") > 0,
        F.transform(
            F.sequence(F.lit(1), F.size("hashes")),
            lambda i: F.array_min(F.slice("hashes", i, FINGERPRINT_WINDOW)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        hashed.select("doc_id", F.explode(F.array_distinct(fps)).alias("fp"))
        .distinct()
    )


_LEX_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, words in LEXICONS.items() for w in words
)

def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based corpus split — the training-data staple.

    split(doc) = first byte of md5(doc_id) mod 100: < 80 -> train,
    < 90 -> valid, else test.  Content-free and key-stable: re-running on
    grown data never reassigns an existing document, and the assignment is
    reproducible on any engine (md5 is the cross-engine hash contract).
    A pure projection — at 100 TB this is a zero-shuffle map over the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket()
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for every VALID/TEST document, the
    fraction of its ``SPAN_N``-grams that also occur in some TRAIN
    document — the standard eval-leakage audit run before a training mix
    ships (the n-gram-overlap decontamination of GPT-3/PaLM reports).

    Uses the same key-stable md5 split as ``train_test_split``, so the
    audit is reproducible from ids alone.  Shape at 100 TB: one shingle
    explode, one distinct on train grams (shuffle keyed on the gram), one
    left semi-ish join back — O(tokens), no pairwise stage, same skeleton
    as ``substring_dedup``.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket()
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    toks = docs.select(
        "doc_id",
        split.alias("split"),
        F.split(F.lower("text"), " ", -1).alias("__w"),
    ).select(
        "doc_id", "split", "__w", F.size("__w").cast("long").alias("n_tokens")
    )
    sh = (
        toks.filter(F.col("n_tokens") >= SPAN_N)
        .select(
            "doc_id",
            "split",
            F.posexplode(
                F.sequence(F.lit(1), (F.col("n_tokens") - SPAN_N + 1).cast("int"))
            ).alias("__p", "i"),
            "__w",
        )
        .select(
            "doc_id",
            "split",
            F.concat_ws(" ", F.slice("__w", F.col("i"), SPAN_N)).alias("gram"),
        )
    )
    train_grams = (
        sh.filter(F.col("split") == "train").select("gram").distinct()
        .withColumn("__in_train", F.lit(1))
    )
    eval_sh = sh.filter(F.col("split") != "train")
    hits = (
        eval_sh.join(train_grams, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__in_train"), F.lit(0)))
            .cast("long")
            .alias("contam_grams"),
        )
    )
    return (
        toks.filter(F.col("split") != "train")
        .select("doc_id", "split", "n_tokens")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "split",
            "n_tokens",
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce(F.col("contam_grams"), F.lit(0).cast("long")).alias(
                "contam_grams"
            ),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                r6(F.col("contam_grams") / F.col("n_grams")),
            )
            .otherwise(F.lit(0.0))
            .alias("contam_frac"),
        )
    )


def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics over the corpus.

    (w1, w2) -> count and conditional probability p(w2|w1) =
    c(w1,w2) / c(w1,*).  One positional explode (codegen: posexplode +
    element_at, no window), one shuffle on the bigram key; the unigram
    denominator re-aggregates the bigram shuffle (exchange reuse), so the
    corpus is tokenized exactly once.  The shape of every n-gram count /
    perplexity-filter pass a training-data pipeline runs.
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ", -1)
    bigrams = (
        docs.filter(F.size(arr) >= 2)
        .select(F.lower("text").alias("lt"))
        .select(F.split("lt", " ", -1).alias("__w"))
        .select(
            "__w",
            F.posexplode(
                F.sequence(F.lit(1), F.size("__w") - F.lit(1))
            ).alias("__p", "__i"),
        )
        .select(
            F.element_at("__w", F.col("__i")).alias("w1"),
            F.element_at("__w", F.col("__i") + 1).alias("w2"),
        )
    )
    pair = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = pair.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return pair.join(uni, "w1").select(
        "w1",
        "w2",
        F.col("c12").cast("long").alias("n"),
        r6(F.col("c12") / F.col("c1")).alias("p_cond"),
    )


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText rules):
    duplicate fraction of unigrams, bigrams, and trigrams per document.

    High duplicate-n-gram fractions flag boilerplate, templated spam, and
    decoding loops — the standard reason a document is dropped from a
    training mix.  Everything is row-local array math (split ->
    array_distinct / positional transform), so at 100 TB this is a pure
    zero-shuffle projection over the scan, like the other quality scores.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.split(F.lower("text"), " ", -1).alias("w")
    )

    def grams(n: int):
        if n == 1:
            return F.col("w")
        return F.when(
            F.size("w") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("w") - F.lit(n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("w", i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    staged = base.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        grams(1).alias("g1"),
        grams(2).alias("g2"),
        grams(3).alias("g3"),
    )

    def dup_frac(col: str):
        return F.when(
            F.size(col) > 0,
            1.0 - F.size(F.array_distinct(col)) / F.size(col),
        ).otherwise(F.lit(0.0))

    return staged.select(
        "doc_id",
        "n_tokens",
        r6(dup_frac("g1")).alias("dup_unigram_frac"),
        r6(dup_frac("g2")).alias("dup_bigram_frac"),
        r6(dup_frac("g3")).alias("dup_trigram_frac"),
    )


# Redaction patterns kept to syntax both Java regex (Spark) and RE2
# (DuckDB) interpret identically: plain char classes, no backrefs.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_URL = "https?://[^ ]+"
PII_DIGITS = "[0-9]{7,}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count and mask emails, URLs, and long digit
    runs (phone/account-number shaped) per document.

    The hygiene gate of a training-data pipeline — runs as one projection
    (regexp_count + three chained regexp_replace), zero shuffle at any
    scale.  The synthetic corpus is clean, so counts are zero here; the
    masking behavior itself is pinned on adversarial strings in
    tests/test_text_quality.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_URL,
            "<URL>",
        ),
        PII_DIGITS,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_URL)).cast("long").alias("n_urls"),
        F.regexp_count(F.col("text"), F.lit(PII_DIGITS)).cast("long").alias("n_digit_runs"),
        clean.alias("clean_text"),
    )


TOPK_NGRAMS = 20


def topk_ngrams(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Corpus-wide top-k n-grams — the LM-data composition report.

    One positional explode (no window over raw tokens), one shuffle on the
    gram key with map-side partial counts, then a deterministic top-k
    (count desc, gram asc).  At 100 TB the gram-key aggregate is the only
    shuffle and is the textbook combiner-friendly one.
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split(F.lower("text"), " ", -1)
    grams = (
        docs.select(arr.alias("w"))
        .filter(F.size("w") >= n)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - F.lit(n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at("w", i + j) for j in range(n)]
                    ),
                )
            ).alias("gram")
        )
    )
    counts = grams.groupBy("gram").agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("gram"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOPK_NGRAMS)
        .select("rk", "gram", "n")
    )


def compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document — the classic redundancy
    signal (templated/boilerplate text compresses far below natural
    prose; near-random text compresses above it).

    An Arrow-batched ``mapInPandas`` kernel (zlib is not expressible in
    SQL): one linear pass per document, no shuffle, embarrassingly
    distributed.  Value-gated against a committed golden snapshot —
    level-6 zlib output is deterministic for a fixed zlib build, and
    regeneration reproduces the parquet byte-identically; the ratio
    definition is additionally pinned against direct zlib in
    tests/test_text_quality.py.
    """
    import zlib
    from collections.abc import Iterator as _It

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = (
        "doc_id long, raw_bytes long, zlib_bytes long, compression_ratio double"
    )

    def kernel(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            rb = raw.str.len()
            zb = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_bytes": rb,
                    "zlib_bytes": zb,
                    "compression_ratio": (zb / rb.clip(lower=1)).round(6),
                }
            )

    return docs.mapInPandas(kernel, schema=schema)


PACK_CTX = 512


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM sequence packing: documents concatenated in stable order and cut
    into fixed ``PACK_CTX``-token context windows — every document mapped
    to its absolute token span and the pack(s) it lands in.

    The final assembly step of a training-data pipeline (docs flow
    continuously; a document may straddle a pack boundary, exactly like
    real LM packing).  Packing runs PER SOURCE corpus: the window
    partitions on source, so at 100 TB no global single-partition sort
    exists — each corpus packs independently and in parallel, and the
    pack id is deterministic from (source, doc order) alone.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        "source",
        "doc_id",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_tok"),
        (cum - 1).alias("end_tok"),
        F.floor((cum - F.col("n_tokens")) / PACK_CTX).cast("long").alias("start_pack"),
        F.floor((cum - 1) / PACK_CTX).cast("long").alias("end_pack"),
    )


PPL_SMOOTH_K = 0.5  # add-k smoothing for the bigram LM
SPAN_N = 8  # tokens per cross-document duplicated span


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) for every adjacent lowercase-token pair — the shared
    explode of the LM operators (positional, codegen-friendly: posexplode +
    element_at, no window)."""
    return (
        docs.select("doc_id", F.split(F.lower("text"), " ", -1).alias("__w"))
        .filter(F.size("__w") >= 2)
        .select(
            "doc_id",
            "__w",
            F.posexplode(
                F.sequence(F.lit(1), F.size("__w") - F.lit(1))
            ).alias("__p", "__i"),
        )
        .select(
            "doc_id",
            F.element_at("__w", F.col("__i")).alias("w1"),
            F.element_at("__w", F.col("__i") + 1).alias("w2"),
        )
    )


def doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy / perplexity under the corpus-trained
    bigram LM (add-k smoothing) — the CCNet-style quality filter: docs the
    corpus LM finds surprising are boilerplate, word salad, or wrong-
    language, and get dropped or down-bucketed in a training mix.

    One tokenization pass: per-doc bigram counts are the base aggregate;
    the corpus LM (pair and context counts) re-aggregates it, then rides
    back on a (w1, w2) equi-join.  The base aggregate is persisted because
    the optimizer collapses the stacked aggregations and ReusedExchange
    stops matching (same diamond as text.py term_stats).  Vocabulary size
    and doc scores are scalar broadcast joins — nothing lands on the
    driver.  At 100 TB every stage is O(tokens) with combiner-friendly
    single-key shuffles.

    Output: one row per document with >= 2 tokens; h = mean -log2
    p(w2|w1), ppl = 2^h.
    """
    docs = load_table(spark, sf_dir, "documents")
    doc_pair = (
        _doc_bigrams(docs)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("m"))
    )
    doc_pair = pin(doc_pair)
    pair = doc_pair.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    uni = pair.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = uni.agg(F.count("*").cast("double").alias("V"))
    neglog = F.col("m") * -F.log2(
        (F.col("c12") + F.lit(PPL_SMOOTH_K))
        / (F.col("c1") + F.lit(PPL_SMOOTH_K) * F.col("V"))
    )
    h = F.sum(neglog) / F.sum("m")
    return (
        doc_pair.join(pair, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            r6(h).alias("h"),
            r6(F.pow(F.lit(2.0), h)).alias("ppl"),
        )
    )


# Gopher/MassiveText rule thresholds (Rae et al. 2021 table A1 shape,
# bounds kept where the synthetic corpus makes the verdict non-trivial)
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_AWL, GOPHER_MAX_AWL = 3.0, 10.0
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_DUP_BIGRAM = 0.2


def gopher_rules_from(docs: DataFrame) -> DataFrame:
    """Rule table over any (doc_id, text) frame — including a STREAM:
    every signal is row-local, so the whole pass is a stateless append-mode
    projection (stream==batch pinned in tests/test_streaming.py)."""
    w = F.split(F.lower("text"), " ", -1)
    n = F.size(w)
    awl = F.aggregate(
        w, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / n
    stop_hits = F.size(
        F.array_distinct(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    )
    alpha_frac = F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_bigram = F.when(
        F.size(bigrams) > 0,
        1.0 - F.size(F.array_distinct(bigrams)) / F.size(bigrams),
    ).otherwise(F.lit(0.0))
    staged = docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        r6(awl).alias("avg_word_len"),
        stop_hits.cast("long").alias("stopword_hits"),
        r6(alpha_frac).alias("alpha_frac"),
        r6(dup_bigram).alias("dup_bigram_frac"),
    )
    rules = {
        "r_word_count": (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS),
        "r_word_len": (F.col("avg_word_len") >= GOPHER_MIN_AWL)
        & (F.col("avg_word_len") <= GOPHER_MAX_AWL),
        "r_stopwords": F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS,
        "r_alpha": F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC,
        "r_repetition": F.col("dup_bigram_frac") <= GOPHER_MAX_DUP_BIGRAM,
    }
    out = staged.select(
        "doc_id",
        "n_words",
        "avg_word_len",
        "stopword_hits",
        "alpha_frac",
        "dup_bigram_frac",
        *[expr.alias(name) for name, expr in rules.items()],
    )
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule table: one row per document with each filter rule's
    boolean verdict and the composite ``keep`` — the canonical rule-based
    cleaning pass of a training-data pipeline, with per-rule accounting so
    a corpus build can report WHY documents dropped.

    Every signal is row-local array math over one split of the text
    (word count, mean word length, distinct-stopword hits, alphabetic-word
    fraction, duplicate-bigram fraction): zero shuffle, zero explode — at
    100 TB this is a pure projection pass over the scan, like the other
    hygiene operators.
    """
    return gopher_rules_from(load_table(spark, sf_dir, "documents"))


PPL_INGEST_MOD = 10  # doc_id % 10 == 0 plays the arriving stream


def ppl_ingest_score(new_docs: DataFrame, pair: DataFrame, uni: DataFrame) -> DataFrame:
    """Score arriving documents against a STATIC bigram LM — the serve-time
    half of the perplexity gate (train/serve split, unlike
    ``doc_perplexity`` where the corpus scores itself).

    ``new_docs`` may be a STREAM: bigram extraction is row-local, the LM
    lookups are stateless stream-static joins, and because each document
    arrives as ONE row, the per-doc rollup is micro-batch-local — run it
    inside ``foreachBatch`` with zero cross-batch state (the same
    no-watermark-needed argument as ``dedup.near_dup_ingest_join``).

    Unseen bigrams take the smoothed floor (c12=0, and c1=0 for unseen
    contexts — p = k/(c1 + kV), never null); ``oov_frac`` reports how much
    of the doc fell outside the LM, a filter signal in its own right.
    V floors at 1 so a degenerate EMPTY LM scores every doc at the neutral
    p=1 / ppl=1 instead of dividing by zero (found by hypothesis).
    """
    vocab = uni.agg(
        F.greatest(F.count("*"), F.lit(1)).cast("double").alias("V")
    )
    new_bg = _doc_bigrams(new_docs).groupBy("doc_id", "w1", "w2").agg(
        F.count("*").alias("m")
    )
    c12 = F.coalesce(F.col("c12"), F.lit(0).cast("long"))
    c1 = F.coalesce(F.col("c1"), F.lit(0).cast("long"))
    neglog = F.col("m") * -F.log2(
        (c12 + F.lit(PPL_SMOOTH_K)) / (c1 + F.lit(PPL_SMOOTH_K) * F.col("V"))
    )
    h = F.sum(neglog) / F.sum("m")
    return (
        new_bg.join(pair, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            (
                F.sum(F.when(F.col("c12").isNull(), F.col("m")).otherwise(0))
                .cast("double")
                / F.sum("m")
            ).alias("__oov"),
            r6(h).alias("h"),
            r6(F.pow(F.lit(2.0), h)).alias("ppl"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            r6(F.col("__oov")).alias("oov_frac"),
            "h",
            "ppl",
        )
    )


def ppl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming perplexity gate: docs with
    doc_id % 10 == 0 arrive 'new'; the LM trains on the rest."""
    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % PPL_INGEST_MOD == 0)
    corpus_pair = (
        _doc_bigrams(docs.filter(F.col("doc_id") % PPL_INGEST_MOD != 0))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    # consumed twice: context counts + the scoring join
    corpus_pair = pin(corpus_pair)
    corpus_uni = corpus_pair.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return ppl_ingest_score(new_docs, corpus_pair, corpus_uni)


def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span coverage (the exact-substring dedup
    signal of Lee et al. 2022): per document, the fraction of token
    positions covered by some ``SPAN_N``-gram that also appears in at
    least one OTHER document.

    Shape at 100 TB: shingle explode -> count-distinct-docs per shingle
    (one shuffle on the gram key) -> semi-join back -> position explode ->
    per-doc distinct count.  Every stage is O(tokens x SPAN_N) with equi-
    join keys only — no pairwise comparison exists.  The gram key is the
    raw token string here so the DuckDB oracle replicates values exactly;
    a production run would key on ``xxhash64(gram)`` to shrink shuffle
    width (collision rate 2^-64 — same trade documented in dedup.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.lower("text"), " ", -1).alias("__w"),
    ).select("doc_id", "__w", F.size("__w").cast("long").alias("n_tokens"))
    sh = (
        toks.filter(F.col("n_tokens") >= SPAN_N)
        .select(
            "doc_id",
            "__w",
            F.posexplode(
                F.sequence(F.lit(1), (F.col("n_tokens") - SPAN_N + 1).cast("int"))
            ).alias("__p", "i"),
        )
        .select(
            "doc_id",
            "i",
            F.concat_ws(" ", F.slice("__w", F.col("i"), SPAN_N)).alias("gram"),
        )
    )
    dup = (
        sh.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    covered = (
        sh.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SPAN_N - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("covered"))
    )
    return (
        toks.select("doc_id", "n_tokens")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("covered"), F.lit(0).cast("long")).alias("covered"),
            r6(
                F.coalesce(F.col("covered"), F.lit(0)) / F.col("n_tokens")
            ).alias("dup_frac"),
        )
    )


CLF_BUCKETS = 4096  # feature-hash dimensionality of the linear scorer


def classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier scoring — the fasttext-style
    quality-classifier plumbing of corpus curation (CCNet/GPT-3 use a
    linear model over hashed token features to score every document),
    expressed entirely JVM-side.

    The hashing trick: token -> md5 -> bucket in [0, CLF_BUCKETS); the
    per-bucket weight is looked up and summed, logit = mean weight,
    prob = sigmoid(logit).  Weights here are a deterministic closed
    formula over the bucket id ((bucket % 2001 - 1000)/1000, uniform in
    [-1, 1]) standing in for a learned weight vector — the container has
    no model artifacts, and a learned vector would join in as a
    CLF_BUCKETS-row broadcast table without changing the plan.  Shape at
    100 TB: explode -> projection (hash + weight are per-row expressions,
    no dictionary shuffle) -> one groupBy(doc_id).  The whole scorer is
    one shuffle of (doc_id, weight) pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ", -1)).alias("w")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("w"), F.lit(":clf"))), 1, 8), 16, 10
        ).cast("long")
        % CLF_BUCKETS
    )
    # weights are integers/1000, so the per-doc reduction stays in exact
    # integer space — float enters only at the final division, making the
    # result independent of summation order (and engine)
    weight_milli = bucket % 2001 - 1000
    per = toks.select("doc_id", weight_milli.alias("wm")).groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_feats"),
        F.sum("wm").cast("long").alias("s"),
    )
    # logit = s/(1000*n) is a RATIONAL of integers, so it can land exactly
    # on a half-microunit (e.g. s=-10309, n=80 -> -0.1288625), where
    # engines' round() disagree (Spark rounds the shortest-decimal string
    # HALF_UP, DuckDB the binary value).  So the 6-decimal quantization is
    # done in exact integer arithmetic — round-half-away-from-zero of
    # s*1000/n micro-units — identically on both sides; float enters only
    # for the final exact division by 1e6.
    logit_micro = F.expr(
        "CASE WHEN s >= 0 THEN (2000 * s + n_feats) DIV (2 * n_feats) "
        "ELSE -((2000 * -s + n_feats) DIV (2 * n_feats)) END"
    )
    logit_raw = F.col("s") / (F.lit(1000.0) * F.col("n_feats"))
    return per.select(
        "doc_id",
        "n_feats",
        (logit_micro / F.lit(1000000.0)).alias("logit"),
        r6(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit_raw))).alias("prob"),
    )


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization accounting: strip control characters,
    collapse whitespace runs, trim — the first pass of every corpus
    cleanup — reported as before/after lengths, a changed flag, and the
    md5 of the normalized form (the key later dedup stages would use).

    Zero-shuffle projection; the normalized text itself never leaves the
    executor — only its length and hash do, which is also why the oracle
    can value-check a transformation whose output column would be the
    corpus itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "[\\x00-\\x1f]", ""), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("raw_chars"),
        F.length(norm).cast("long").alias("norm_chars"),
        (F.length("text") != F.length(norm)).alias("changed"),
        F.md5(norm).alias("norm_hash"),
    )


NOVELTY_N = 3  # n-gram order for the novelty curve


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: of a document's distinct trigrams,
    the fraction it INTRODUCES to the corpus (its doc_id is the minimum
    over all documents containing the gram).

    Reading the column in doc_id order gives the corpus's diversity
    curve — the marginal-new-content measure used to judge whether more
    data of a source is still worth ingesting (novelty decaying to ~0
    means the source is exhausted or boilerplate).  Shape: one shuffle
    keyed on the gram (min-doc aggregate, text never shuffles — grams
    ride as md5), one semi-join back, one doc-keyed count.  The fraction
    is an unrounded division of exact integers.
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split(F.lower("text"), " ", -1)
    grams = (
        docs.filter(F.size(arr) >= NOVELTY_N)
        .select("doc_id", arr.alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - F.lit(NOVELTY_N - 1)),
                        lambda i: F.md5(
                            F.concat_ws(
                                " ",
                                *[
                                    F.element_at("w", i + j)
                                    for j in range(NOVELTY_N)
                                ],
                            )
                        ),
                    )
                )
            ).alias("g"),
        )
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (F.col("n_novel") / F.col("n_grams")).alias("novelty"),
        )
    )


OUTLIER_Z = 3.0  # |z| beyond which a document length is flagged


def length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length z-scores with an outlier flag — the
    screening pass that catches truncated or concatenated documents
    (a crawler bug's signature) before they skew training.

    Determinism without rounding: the per-source moments reduce in exact
    integer space (sum of lengths, sum of squared lengths), the variance
    is formed from those exact integers, and IEEE-754 requires sqrt to
    be correctly rounded — so mean, std, and z are bit-identical across
    engines and partitionings, and the raw doubles are emitted unrounded
    (no r6, nothing to diverge).  Zero-variance sources flag nothing.
    Shape: one source-keyed aggregate broadcast back onto the corpus
    projection.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").cast("long").alias("len")
    )
    mom = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("len").cast("long").alias("s"),
        F.sum(F.col("len") * F.col("len")).cast("long").alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    stats = mom.select(
        "source", mean.alias("mean_len"), F.sqrt(var).alias("std_len")
    )
    z = F.when(
        F.col("std_len") > 0,
        (F.col("len") - F.col("mean_len")) / F.col("std_len"),
    ).otherwise(F.lit(0.0))
    return (
        docs.join(F.broadcast(stats), "source")
        .select(
            "doc_id",
            "source",
            "len",
            z.alias("z"),
            (F.abs(z) > OUTLIER_Z).alias("is_outlier"),
        )
    )


LINE_ENC = 1_000_000  # (doc_id, pos) -> doc_id*LINE_ENC + pos (pos < 1e6)


def _line_occ(docs: DataFrame, with_text: bool = False) -> DataFrame:
    """The C4 keep-first-occurrence construction both line queries ride
    (VERDICT r14 task 1b): non-empty '.'-sentence occurrences joined
    with their corpus-wide stats — (doc_id, pos, [ts,] key, enc, n_occ,
    first_enc).  An occurrence is kept iff ``n_occ == 1 or enc ==
    first_enc`` (minimal (doc_id, pos) encoded as doc_id*LINE_ENC + pos,
    so the argmin is a plain integer MIN — exact in both engines).

    One shuffle on the sentence-hash key; ``with_text=False``
    (line_dedup's accounting) shuffles only the md5, ``with_text=True``
    (boilerplate_strip's reassembly) carries the trimmed sentence text
    through that one hash-key shuffle because the rebuild needs it back.
    """
    cols = [
        "doc_id",
        "pos",
        F.md5(F.trim("sentence")).alias("key"),
        (F.col("doc_id") * LINE_ENC + F.col("pos")).alias("enc"),
    ]
    if with_text:
        cols.insert(2, F.trim("sentence").alias("ts"))
    occ = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", "\\.")).alias("pos", "sentence"),
        )
        .filter(F.trim("sentence") != "")
        .select(*cols)
    )
    # r17 (guide §2.4): corpus stats per key as WINDOW aggregates over
    # the one hash-key exchange, not a groupBy re-derivation joined back
    # — the old shape exploded the corpus twice and shuffled the
    # occurrence stream into both the join probe and the aggregate.
    # count(*)/min(enc) over the unordered key partition are the same
    # exact integers the join carried.
    w = Window.partitionBy("key")
    return occ.select(
        "*",
        F.count("*").over(w).cast("long").alias("n_occ"),
        F.min("enc").over(w).alias("first_enc"),
    )


def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicated-line dedup accounting: per document, how many
    of its sentences occur elsewhere in the corpus, and how many survive
    keep-first-occurrence removal.

    C4 discards repeated spans corpus-wide (boilerplate: headers,
    disclaimers, navigation); this is that rule over the engine's naive
    '.' sentence unit.  An occurrence is KEPT iff its sentence is unique
    or it is the first occurrence (minimal (doc_id, pos), encoded as
    doc_id*LINE_ENC + pos so the argmin is a plain integer MIN — exact
    in both engines).  Whitespace-only sentences are excluded (the empty
    string between every '.' would otherwise mark every document
    duplicated).

    Scale shape: one shuffle on the sentence hash (the sentence TEXT
    never shuffles — md5 rides instead), one shuffle back on doc_id.
    keep_frac is an unrounded division of exact integers — identical
    IEEE doubles on both engines, per the never-round-a-rational rule.
    """
    kept = F.when(
        (F.col("n_occ") == 1) | (F.col("enc") == F.col("first_enc")), 1
    ).otherwise(0)
    return (
        _line_occ(load_table(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sents"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
            F.sum(kept).cast("long").alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_sents",
            "n_dup",
            "n_kept",
            (F.col("n_kept") / F.col("n_sents")).alias("keep_frac"),
        )
    )


CM_DEPTH = 4  # count-min hash rows
CM_WIDTH = 1024  # buckets per row
HH_K = 20  # heavy hitters to certify


def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters, exactly value-checkable.

    The bounded-memory frequency sketch of stream processing: every token
    increments one bucket per hash row (md5-derived, so the sketch is
    deterministic and cross-engine reproducible), and a word's estimate
    is the MIN over its CM_DEPTH bucket counts — an upper bound on the
    true count (collisions only ever inflate).  The query reports the
    exact top-HH_K words with their sketch estimates and the
    overcount, so the gate certifies the sketch's defining inequality
    est >= exact on every row, at exact value level.

    Scale shape: the sketch aggregate is CM_DEPTH x CM_WIDTH cells
    REGARDLESS of vocabulary size — the point of the structure: the
    shuffle carries at most 4096 (row, bucket) partial counts per map
    task however hot or wide the token distribution is.  The exact top-k
    (one word-keyed shuffle) exists here as the certification side; a
    production monitor would keep only the sketch.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ", -1)).alias("w")
    )

    def cm_bucket(w, j):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(w, F.lit(f":cm{j}"))), 1, 12
                ),
                16,
                10,
            ).cast("long")
            % CM_WIDTH
        )

    cells = (
        toks.select(
            F.posexplode(
                F.array(*[cm_bucket(F.col("w"), j) for j in range(CM_DEPTH)])
            ).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    exact = toks.groupBy("w").agg(F.count("*").cast("long").alias("exact"))
    wnd = Window.orderBy(F.desc("exact"), F.asc("w"))
    top = (
        exact.withColumn("rk", F.row_number().over(wnd).cast("long"))
        .filter(F.col("rk") <= HH_K)
    )
    probes = top.select(
        "rk",
        "w",
        "exact",
        F.posexplode(
            F.array(*[cm_bucket(F.col("w"), j) for j in range(CM_DEPTH)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(cells, ["row", "bucket"])
        .groupBy("rk", "w", "exact")
        .agg(F.min("cnt").alias("est"))
        .select(
            "rk",
            F.col("w").alias("word"),
            "exact",
            "est",
            (F.col("est") - F.col("exact")).alias("overcount"),
        )
    )


CLF_KEEP_PROB = 0.5  # admission threshold of the ingest gate


def clf_ingest_score(new_docs: DataFrame) -> DataFrame:
    """Row-local classifier scoring — the ingest-gate formulation.

    Same model as ``classifier_score`` (hashed buckets, integer milli-
    weights, integer-quantized logit), but the per-doc reduction runs as
    a higher-order ``aggregate`` over the token array INSIDE the row:
    zero shuffle, zero state, so ``new_docs`` may be an unbounded STREAM
    and the gate stays append-mode legal (the same codegen-vs-HOF trade
    dedup.py documents for its stream path — the batch path keeps the
    codegen explode+groupBy form).  The keep decision compares the
    integer weight sum against 0 (sigmoid is monotone, so prob >= 0.5
    <=> s >= 0) — no float anywhere in the admission decision.
    """
    toks = F.split(F.lower("text"), " ", -1)
    wm = F.transform(
        toks,
        lambda w: (
            F.conv(
                F.substring(F.md5(F.concat(w, F.lit(":clf"))), 1, 8), 16, 10
            ).cast("long")
            % CLF_BUCKETS
        )
        % 2001
        - 1000,
    )
    base = new_docs.select(
        "doc_id",
        F.aggregate(wm, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("s"),
        F.size(toks).cast("long").alias("n_feats"),
    )
    logit_micro = F.expr(
        "CASE WHEN s >= 0 THEN (2000 * s + n_feats) DIV (2 * n_feats) "
        "ELSE -((2000 * -s + n_feats) DIV (2 * n_feats)) END"
    )
    logit_raw = F.col("s") / (F.lit(1000.0) * F.col("n_feats"))
    return base.select(
        "doc_id",
        "n_feats",
        (logit_micro / F.lit(1000000.0)).alias("logit"),
        r6(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit_raw))).alias("prob"),
        (F.col("s") >= 0).alias("keep"),
    )


def clf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming classifier gate: docs with
    doc_id % PPL_INGEST_MOD == 0 play the arriving stream."""
    docs = load_table(spark, sf_dir, "documents")
    return clf_ingest_score(docs.filter(F.col("doc_id") % PPL_INGEST_MOD == 0))


def _cm_bucket_sql(w_expr: str, j: int) -> str:
    return (
        f"cast(cast(concat('0x', substr(md5({w_expr} || ':cm{j}'), 1, 12)) "
        f"AS ubigint) AS bigint) % {CM_WIDTH}"
    )


_CM_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
),
hashed AS (
  SELECT w, j,
         CASE {' '.join(f"WHEN j = {j} THEN {_cm_bucket_sql('w', j)}" for j in range(CM_DEPTH))}
         END AS bucket
  FROM toks CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS j)
),
cells AS (
  SELECT j AS row, bucket, cast(count(*) AS bigint) AS cnt
  FROM hashed GROUP BY 1, 2
),
exact AS (
  SELECT w, cast(count(*) AS bigint) AS exact FROM toks GROUP BY w
),
top AS (
  SELECT w, exact,
         cast(row_number() OVER (ORDER BY exact DESC, w ASC) AS bigint) AS rk
  FROM exact QUALIFY rk <= {HH_K}
),
probes AS (
  SELECT t.rk, t.w, t.exact, h.j AS row,
         CASE {' '.join(f"WHEN h.j = {j} THEN {_cm_bucket_sql('t.w', j)}" for j in range(CM_DEPTH))}
         END AS bucket
  FROM top t CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS j) h
)
SELECT p.rk, p.w AS word, p.exact, min(c.cnt) AS est,
       min(c.cnt) - p.exact AS overcount
FROM probes p JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
GROUP BY p.rk, p.w, p.exact
"""


ORACLES: dict[str, str] = {
    "text_normalize": r"""
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(text, '[\x00-\x1f]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       cast(length(text) AS bigint) AS raw_chars,
       cast(length(norm) AS bigint) AS norm_chars,
       length(text) <> length(norm) AS changed,
       md5(norm) AS norm_hash
FROM n
""",
    "ngram_novelty": f"""
WITH wsplit AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
  WHERE len(string_split(lower(text), ' ')) >= {NOVELTY_N}
),
grams AS (
  SELECT DISTINCT doc_id, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM wsplit)
),
firsts AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT doc_id,
       cast(count(*) AS bigint) AS n_grams,
       cast(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS bigint)
         AS n_novel,
       sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) * 1.0 / count(*)
         AS novelty
FROM grams JOIN firsts USING (g)
GROUP BY doc_id
""",
    "length_outliers": f"""
WITH d AS (
  SELECT doc_id, source, cast(length(text) AS bigint) AS len FROM documents
),
mom AS (
  SELECT source, cast(count(*) AS bigint) AS n,
         cast(sum(len) AS bigint) AS s,
         cast(sum(len * len) AS bigint) AS ss
  FROM d GROUP BY source
),
stats AS (
  SELECT source, s / n AS mean_len,
         sqrt(ss / n - (s / n) * (s / n)) AS std_len
  FROM mom
)
SELECT d.doc_id, d.source, d.len,
       CASE WHEN st.std_len > 0 THEN (d.len - st.mean_len) / st.std_len
            ELSE 0.0 END AS z,
       abs(CASE WHEN st.std_len > 0 THEN (d.len - st.mean_len) / st.std_len
                ELSE 0.0 END) > {OUTLIER_Z} AS is_outlier
FROM d JOIN stats st USING (source)
""",
    "line_dedup": f"""
WITH occ AS (
  SELECT doc_id, pos, md5(trim(sentence)) AS key,
         doc_id * {LINE_ENC} + pos AS enc
  FROM (
    SELECT doc_id,
           unnest(string_split(text, '.')) AS sentence,
           unnest(range(len(string_split(text, '.')))) AS pos
    FROM documents
  )
  WHERE trim(sentence) <> ''
),
stats AS (
  SELECT key, cast(count(*) AS bigint) AS n_occ, min(enc) AS first_enc
  FROM occ GROUP BY key
)
SELECT o.doc_id,
       cast(count(*) AS bigint) AS n_sents,
       cast(sum(CASE WHEN s.n_occ > 1 THEN 1 ELSE 0 END) AS bigint) AS n_dup,
       cast(sum(CASE WHEN s.n_occ = 1 OR o.enc = s.first_enc
                     THEN 1 ELSE 0 END) AS bigint) AS n_kept,
       sum(CASE WHEN s.n_occ = 1 OR o.enc = s.first_enc THEN 1 ELSE 0 END)
         * 1.0 / count(*) AS keep_frac
FROM occ o JOIN stats s USING (key)
GROUP BY o.doc_id
""",
    "heavy_hitters_sketch": _CM_ORACLE,
    "clf_ingest": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE doc_id % {PPL_INGEST_MOD} = 0
),
feat AS (
  SELECT doc_id,
         (cast(cast(concat('0x', substr(md5(w || ':clf'), 1, 8))
            AS ubigint) AS bigint) % {CLF_BUCKETS}) AS bucket
  FROM toks
),
per AS (
  SELECT doc_id, cast(count(*) AS bigint) AS n_feats,
         cast(sum(bucket % 2001 - 1000) AS bigint) AS s
  FROM feat GROUP BY doc_id
)
SELECT doc_id, n_feats,
       (CASE WHEN s >= 0 THEN (2000 * s + n_feats) // (2 * n_feats)
             ELSE -((2000 * -s + n_feats) // (2 * n_feats)) END)
         / 1000000.0 AS logit,
       (round(1.0 / (1.0 + exp(-(s / (1000.0 * n_feats)))), 6) + 0.0) AS prob,
       s >= 0 AS keep
FROM per
""",
    "classifier_score": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
feat AS (
  SELECT doc_id,
         (cast(cast(concat('0x', substr(md5(w || ':clf'), 1, 8))
            AS ubigint) AS bigint) % {CLF_BUCKETS}) AS bucket
  FROM toks
),
per AS (
  SELECT doc_id, cast(count(*) AS bigint) AS n_feats,
         cast(sum(bucket % 2001 - 1000) AS bigint) AS s
  FROM feat GROUP BY doc_id
)
SELECT doc_id, n_feats,
       (CASE WHEN s >= 0 THEN (2000 * s + n_feats) // (2 * n_feats)
             ELSE -((2000 * -s + n_feats) // (2 * n_feats)) END)
         / 1000000.0 AS logit,
       (round(1.0 / (1.0 + exp(-(s / (1000.0 * n_feats)))), 6) + 0.0) AS prob
FROM per
""",
    "gopher_rules": f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
staged AS (
  SELECT doc_id,
         cast(len(w) AS bigint) AS n_words,
         (round(list_sum(list_transform(w, x -> cast(len(x) AS double)))
               / len(w), 6) + 0.0) AS avg_word_len,
         cast(len(list_distinct(list_filter(w, x -> x IN {{STOP}}))) AS bigint)
           AS stopword_hits,
         (round(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
               * 1.0 / len(w), 6) + 0.0) AS alpha_frac,
         CASE WHEN len(w) >= 2 THEN (round(
           1.0 - len(list_distinct(list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i+1])))
               * 1.0 / (len(w) - 1), 6) + 0.0)
         ELSE 0.0 END AS dup_bigram_frac
  FROM base
)
SELECT *,
       (r_word_count AND r_word_len AND r_stopwords AND r_alpha
        AND r_repetition) AS keep
FROM (
  SELECT *,
         n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS r_word_count,
         avg_word_len BETWEEN {GOPHER_MIN_AWL} AND {GOPHER_MAX_AWL} AS r_word_len,
         stopword_hits >= {GOPHER_MIN_STOPWORD_HITS} AS r_stopwords,
         alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} AS r_alpha,
         dup_bigram_frac <= {GOPHER_MAX_DUP_BIGRAM} AS r_repetition
  FROM staged
)
""".replace("{STOP}", STOPWORDS_SQL),
    "doc_perplexity": f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM toks WHERE len(w) >= 2)
),
doc_pair AS MATERIALIZED (
  SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY doc_id, w1, w2
),
pair AS MATERIALIZED (
  SELECT w1, w2, cast(sum(m) AS bigint) AS c12 FROM doc_pair GROUP BY w1, w2
),
uni AS MATERIALIZED (
  SELECT w1, cast(sum(c12) AS bigint) AS c1 FROM pair GROUP BY w1
),
vocab AS (SELECT cast(count(*) AS double) AS V FROM uni)
SELECT doc_id,
       cast(sum(m) AS bigint) AS n_bigrams,
       (round(sum(m * -log2((c12 + {PPL_SMOOTH_K}) / (c1 + {PPL_SMOOTH_K} * V)))
             / sum(m), 6) + 0.0) AS h,
       (round(pow(2.0, sum(m * -log2((c12 + {PPL_SMOOTH_K}) / (c1 + {PPL_SMOOTH_K} * V)))
                      / sum(m)), 6) + 0.0) AS ppl
FROM doc_pair
JOIN pair USING (w1, w2)
JOIN uni USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
""",
    "contamination_check": f"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN {SPLIT_BUCKET_SQL} < 80 THEN 'train'
              WHEN {SPLIT_BUCKET_SQL} < 90 THEN 'valid'
              ELSE 'test' END AS split,
         string_split(lower(text), ' ') AS w,
         cast(len(string_split(lower(text), ' ')) AS bigint) AS n_tokens
  FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, split, array_to_string(w[i:i + {SPAN_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, split, w, unnest(range(1, len(w) - {SPAN_N} + 2)) AS i
        FROM tagged WHERE len(w) >= {SPAN_N})
),
train_grams AS (
  SELECT DISTINCT gram FROM sh WHERE split = 'train'
),
hits AS (
  SELECT e.doc_id,
         cast(count(*) AS bigint) AS n_grams,
         cast(sum(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
           AS contam_grams
  FROM sh e LEFT JOIN train_grams t USING (gram)
  WHERE e.split <> 'train'
  GROUP BY e.doc_id
)
SELECT d.doc_id, d.split, d.n_tokens,
       coalesce(h.n_grams, cast(0 AS bigint)) AS n_grams,
       coalesce(h.contam_grams, cast(0 AS bigint)) AS contam_grams,
       CASE WHEN coalesce(h.n_grams, 0) > 0
            THEN (round(h.contam_grams * 1.0 / h.n_grams, 6) + 0.0)
            ELSE 0.0 END AS contam_frac
FROM tagged d LEFT JOIN hits h USING (doc_id)
WHERE d.split <> 'train'
""",
    "ppl_ingest": f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM toks WHERE len(w) >= 2)
),
pair AS MATERIALIZED (
  SELECT w1, w2, cast(count(*) AS bigint) AS c12
  FROM bg WHERE doc_id % {PPL_INGEST_MOD} <> 0 GROUP BY w1, w2
),
uni AS MATERIALIZED (
  SELECT w1, cast(sum(c12) AS bigint) AS c1 FROM pair GROUP BY w1
),
vocab AS (SELECT cast(greatest(count(*), 1) AS double) AS V FROM uni),
new_bg AS (
  SELECT doc_id, w1, w2, count(*) AS m
  FROM bg WHERE doc_id % {PPL_INGEST_MOD} = 0 GROUP BY doc_id, w1, w2
)
SELECT doc_id,
       cast(sum(m) AS bigint) AS n_bigrams,
       (round(cast(sum(CASE WHEN p.c12 IS NULL THEN m ELSE 0 END) AS double)
             / sum(m), 6) + 0.0) AS oov_frac,
       (round(sum(m * -log2((coalesce(p.c12, 0) + {PPL_SMOOTH_K})
                           / (coalesce(u.c1, 0) + {PPL_SMOOTH_K} * V)))
             / sum(m), 6) + 0.0) AS h,
       (round(pow(2.0, sum(m * -log2((coalesce(p.c12, 0) + {PPL_SMOOTH_K})
                                    / (coalesce(u.c1, 0) + {PPL_SMOOTH_K} * V)))
                      / sum(m)), 6) + 0.0) AS ppl
FROM new_bg n
LEFT JOIN pair p USING (w1, w2)
LEFT JOIN uni u USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
""",
    "substring_dedup": f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(lower(text), ' ') AS w,
         cast(len(string_split(lower(text), ' ')) AS bigint) AS n_tokens
  FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, i, array_to_string(w[i:i + {SPAN_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - {SPAN_N} + 2)) AS i
        FROM toks WHERE len(w) >= {SPAN_N})
),
dup AS (
  SELECT gram FROM sh GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT s.doc_id, s.i + t.o AS pos
  FROM sh s JOIN dup USING (gram)
  CROSS JOIN range(0, {SPAN_N}) t(o)
),
covc AS (
  SELECT doc_id, cast(count(*) AS bigint) AS covered FROM cov GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       coalesce(c.covered, cast(0 AS bigint)) AS covered,
       (round(coalesce(c.covered, 0) * 1.0 / t.n_tokens, 6) + 0.0) AS dup_frac
FROM toks t LEFT JOIN covc c USING (doc_id)
""",
    "pack_sequences": f"""
WITH toks AS (
  SELECT doc_id, source,
         cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
  FROM documents
),
cum AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS c
  FROM toks
)
SELECT source, doc_id, n_tokens,
       cast(c - n_tokens AS bigint) AS start_tok,
       cast(c - 1 AS bigint) AS end_tok,
       cast(floor((c - n_tokens) * 1.0 / {PACK_CTX}) AS bigint) AS start_pack,
       cast(floor((c - 1) * 1.0 / {PACK_CTX}) AS bigint) AS end_pack
FROM cum
""",
    "doc_repetition": """
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
staged AS (
  SELECT doc_id, w,
    CASE WHEN len(w) >= 2 THEN
      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
    ELSE [] END AS g2,
    CASE WHEN len(w) >= 3 THEN
      list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END AS g3
  FROM base
)
SELECT doc_id,
  cast(len(w) AS bigint) AS n_tokens,
  (round(CASE WHEN len(w) > 0
        THEN 1.0 - len(list_distinct(w)) * 1.0 / len(w) ELSE 0 END, 6) + 0.0)
    AS dup_unigram_frac,
  (round(CASE WHEN len(g2) > 0
        THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2) ELSE 0 END, 6) + 0.0)
    AS dup_bigram_frac,
  (round(CASE WHEN len(g3) > 0
        THEN 1.0 - len(list_distinct(g3)) * 1.0 / len(g3) ELSE 0 END, 6) + 0.0)
    AS dup_trigram_frac
FROM staged
""",
    "pii_scrub": f"""
SELECT doc_id,
  cast(len(regexp_extract_all(text, '{PII_EMAIL}')) AS bigint) AS n_emails,
  cast(len(regexp_extract_all(text, '{PII_URL}')) AS bigint) AS n_urls,
  cast(len(regexp_extract_all(text, '{PII_DIGITS}')) AS bigint) AS n_digit_runs,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
      '{PII_URL}', '<URL>', 'g'),
    '{PII_DIGITS}', '<NUM>', 'g') AS clean_text
FROM documents
""",
    "topk_ngrams": f"""
WITH words AS (
  SELECT doc_id AS d, unnest(string_split(lower(text), ' ')) AS w,
         unnest(range(len(string_split(lower(text), ' ')))) AS pos
  FROM documents
),
grams AS (
  SELECT w || ' ' || lead(w, 1) OVER (PARTITION BY d ORDER BY pos)
         || ' ' || lead(w, 2) OVER (PARTITION BY d ORDER BY pos) AS gram
  FROM words
  QUALIFY lead(w, 2) OVER (PARTITION BY d ORDER BY pos) IS NOT NULL
),
counts AS (SELECT gram, cast(count(*) AS bigint) AS n FROM grams GROUP BY gram)
SELECT cast(row_number() OVER (ORDER BY n DESC, gram ASC) AS bigint) AS rk,
       gram, n
FROM counts
QUALIFY rk <= {TOPK_NGRAMS}
""",
    "bigram_lm": """
WITH words AS (
  SELECT doc_id AS doc_row, unnest(string_split(lower(text), ' ')) AS w,
         unnest(range(len(string_split(lower(text), ' ')))) AS pos
  FROM documents
),
bg AS (
  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_row ORDER BY pos) AS w2
  FROM words
  QUALIFY w2 IS NOT NULL
),
pair AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
uni AS (SELECT w1, sum(c12) AS c1 FROM pair GROUP BY w1)
SELECT p.w1, p.w2, cast(p.c12 AS bigint) AS n,
       (round(p.c12 * 1.0 / u.c1, 6) + 0.0) AS p_cond
FROM pair p JOIN uni u ON p.w1 = u.w1
""",
    "train_test_split": f"""
SELECT doc_id,
       {SPLIT_BUCKET_SQL} AS bucket,
       CASE WHEN {SPLIT_BUCKET_SQL} < 80 THEN 'train'
            WHEN {SPLIT_BUCKET_SQL} < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM documents
""",
    "lang_id": f"""
WITH lex(cand_lang, w) AS (VALUES {_LEX_VALUES}),
toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
scores AS (
  SELECT t.doc_id, l.cand_lang, count(*) AS score
  FROM toks t JOIN lex l ON t.w = l.w
  GROUP BY t.doc_id, l.cand_lang
),
best AS (
  SELECT doc_id, cand_lang, score
  FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cand_lang ASC) AS rk
    FROM scores
  ) WHERE rk = 1
)
SELECT d.doc_id,
       coalesce(b.cand_lang, 'und') AS pred_lang,
       coalesce(b.score, 0) AS score,
       d.lang AS labeled_lang
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
""",
    "quality_score": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
per_doc AS (
  SELECT doc_id, count(*) AS n_words, avg(length(w)) AS awl,
         sum(CASE WHEN w IN {STOPWORDS_SQL} THEN 1 ELSE 0 END) * 1.0
           / count(*) AS swr
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, p.n_words, d.n_chars,
       (round(p.awl, 6) + 0.0) AS avg_word_len,
       (round(p.swr, 6) + 0.0) AS stopword_ratio,
       (round(0.4 * least(p.n_words / 50.0, 1.0)
             + 0.3 * (1.0 - abs(p.swr - 0.4))
             + 0.3 * least(p.awl / 8.0, 1.0), 6) + 0.0) AS quality
FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
""",
    "token_count": """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
       length(text) AS chars
FROM documents
""",
    "doc_fingerprint": f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
grams AS (
  SELECT doc_id, pos,
         md5(w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
               || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS h
  FROM words
  QUALIFY lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {FINGERPRINT_WINDOW - 1} FOLLOWING) AS fp
FROM grams
""",
}

# zlib is not SQL, but level-6 output is deterministic for a fixed zlib
# build (regeneration reproduces the parquet byte-identically), so the
# value gate reads a committed golden snapshot at the driver's gate scale
# — same pattern as the LSA/SVD goldens (scripts/make_golden.py).
_GOLDEN_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "tests",
    "golden",
    "sf0.01",
)
ORACLES["compression_ratio"] = (
    f"SELECT * FROM '{os.path.join(_GOLDEN_DIR, 'compression_ratio.parquet')}'"
)

QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "train_test_split": train_test_split,
    "bigram_lm": bigram_lm,
    "doc_repetition": doc_repetition,
    "pii_scrub": pii_scrub,
    "topk_ngrams": topk_ngrams,
    "compression_ratio": compression_ratio,  # golden-gated (zlib determinism)
    "pack_sequences": pack_sequences,
    "doc_perplexity": doc_perplexity,
    "ppl_ingest": ppl_ingest,
    "substring_dedup": substring_dedup,
    "gopher_rules": gopher_rules,
    "contamination_check": contamination_check,
    "classifier_score": classifier_score,
    "clf_ingest": clf_ingest,
    "heavy_hitters_sketch": heavy_hitters_sketch,
    "line_dedup": line_dedup,
    "length_outliers": length_outliers,
    "ngram_novelty": ngram_novelty,
    "text_normalize": text_normalize,
}


# ---------------------------------------------------------------------------
# RAG-style sliding-window chunking
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64  # tokens per retrieval chunk
CHUNK_STRIDE = 48  # chunk start spacing (16-token overlap)


def doc_chunks_from(docs: DataFrame) -> DataFrame:
    """Sliding-window token chunking (the RAG / context-window prep step):
    each document's whitespace token stream is cut into ``CHUNK_TOKENS``-token
    windows every ``CHUNK_STRIDE`` tokens, so consecutive chunks share a
    16-token overlap and no token is lost at the tail.

    Scale shape: one projection — the chunk index set is generated
    row-locally (``sequence`` + ``explode``) and each chunk is a ``slice``
    of the already-split token array, so there is NO shuffle and no
    re-tokenization per chunk; output size is corpus tokens x ~1.33
    (the overlap factor).  At 100 TB this runs as a map-only stage and
    the chunk writer inherits the scan's partitioning.  Because it is a
    stateless projection it is also stream-legal as-is: chunking happens
    at ingest in append mode with no watermark and no state
    (test_streaming pins stream==batch).
    """
    toks = docs.select(
        "doc_id", F.split("text", " ", -1).alias("toks")
    ).withColumn("n", F.size("toks").cast("long"))
    # genuine INTEGER division (Spark SQL `div`), mirroring the oracle's
    # `//` floor division exactly rather than relying on double-division
    # truncation coinciding with floor for non-negative operands
    n_chunks = F.when(
        F.col("n") <= CHUNK_TOKENS, F.lit(1).cast("long")
    ).otherwise(
        F.expr(
            f"((n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)"
            f" div {CHUNK_STRIDE}) + 1"
        ).cast("long")
    )
    chunked = toks.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
    )
    start = F.col("chunk_id") * CHUNK_STRIDE  # 0-based
    return chunked.select(
        "doc_id",
        "chunk_id",
        start.alias("start_tok"),
        F.least(F.lit(CHUNK_TOKENS).cast("long"), F.col("n") - start).alias(
            "chunk_tokens"
        ),
        F.concat_ws(
            " ", F.slice(F.col("toks"), (start + 1).cast("int"), CHUNK_TOKENS)
        ).alias("chunk_text"),
    )


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch entry point for :func:`doc_chunks_from`."""
    return doc_chunks_from(load_table(spark, sf_dir, "documents"))


ORACLES["doc_chunks"] = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         cast(len(string_split(text, ' ')) AS bigint) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks, n,
         unnest(range(CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                           ELSE (n - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1})
                                // {CHUNK_STRIDE} + 1 END)) AS chunk_id
  FROM t
)
SELECT doc_id, cast(chunk_id AS bigint) AS chunk_id,
       cast(chunk_id * {CHUNK_STRIDE} AS bigint) AS start_tok,
       cast(least({CHUNK_TOKENS}, n - chunk_id * {CHUNK_STRIDE}) AS bigint)
         AS chunk_tokens,
       array_to_string(
         list_slice(toks, cast(chunk_id * {CHUNK_STRIDE} + 1 AS bigint),
                    cast(least(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n)
                         AS bigint)),
         ' ') AS chunk_text
FROM c
"""
QUERIES["doc_chunks"] = doc_chunks


# ---------------------------------------------------------------------------
# Distributed BPE vocabulary learning (golden-gated)
# ---------------------------------------------------------------------------

BPE_MERGES = 20  # merge operations to learn


def _bpe_merge_udf():
    """Arrow-batched leftmost-first BPE pair merge over symbol arrays."""
    @F.pandas_udf("array<string>")
    def merge(s: pd.Series, a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for toks, x, y in zip(s, a, b):
            xy = x + y
            merged = []
            i, n = 0, len(toks)
            while i < n:
                if i < n - 1 and toks[i] == x and toks[i + 1] == y:
                    merged.append(xy)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            out.append(merged)
        return pd.Series(out)

    return merge


# Learned merge tables are deterministic per corpus directory, so the
# encode query reuses the vocab query's result instead of re-running the
# 20-iteration loop when both land in one driver session.
_MERGE_CACHE: dict[str, list[tuple[int, str, str, int]]] = {}


def _learn_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """The bpe_vocab merge loop (see its docstring for the scale shape);
    returns [(rank, left, right, pair_count)] and memoizes per sf_dir."""
    if sf_dir in _MERGE_CACHE:
        return _MERGE_CACHE[sf_dir]
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # word -> symbol array: characters plus an explicit end-of-word marker.
    # The vocab table is tiny relative to the corpus (and to the cluster),
    # so collapse it to a few partitions: every one of the ~2K merge-loop
    # tasks that follow stops paying per-partition scheduler overhead.
    cur = (
        words.coalesce(4)
        .select(
            "cnt",
            F.concat(
                F.expr(
                    "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
                ),
                F.array(F.lit("</w>")),
            ).alias("s"),
        )
        .transform(_owned_ckpt)
    )
    merge = _bpe_merge_udf()
    pair_expr = F.expr(
        "transform(sequence(1, size(s) - 1),"
        " i -> struct(s[i-1] AS a, s[i] AS b))"
    )
    rows = []
    for rank in range(1, BPE_MERGES + 1):
        best = (
            cur.filter(F.size("s") >= 2)
            .select("cnt", F.explode(pair_expr).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()  # 1 row/iteration: bounded argmax, see docstring
        )
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        rows.append((rank, a, b, n))
        prev = cur
        cur = cur.select(
            "cnt", merge(F.col("s"), F.lit(a), F.lit(b)).alias("s")
        ).transform(_owned_ckpt)
        # cur's eager checkpoint has materialized: the previous iteration's
        # symbol table is dead — reclaim mid-loop (ADVICE r8) so the ~2K
        # merge iterations hold O(1) checkpoints, not O(BPE_MERGES)
        _retire_ckpt(prev)
    _MERGE_CACHE[sf_dir] = rows
    return rows


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-``BPE_MERGES`` byte-pair-encoding merges over the
    corpus (Sennrich et al. 2016), the vocabulary-construction step of a
    subword tokenizer pipeline.

    Scale shape — the reason distributed BPE is tractable at 100 TB: the
    CORPUS is touched exactly once, aggregated to a (word, count) table
    whose cardinality is the vocabulary (bounded, ~10^6 even for web-scale
    text), and the entire merge loop then runs on that vocab-bounded table:
    per iteration one explode+groupBy pair count (a small shuffle over
    O(vocab x word_len) rows) and one Arrow-batched merge application.
    The 1-row argmax collect per iteration is the same bounded-collect
    convergence pattern ``pagerank.ranks_from`` documents; lineage is cut
    with ``localCheckpoint`` per iteration exactly as there.

    Tie-break: highest pair count, then lexicographic (left, right) — the
    output is fully deterministic, so the value gate reads a committed
    golden snapshot (scripts/make_golden.py), the compression_ratio / LSA
    pattern for non-SQL-expressible but deterministic operators.
    """
    return spark.createDataFrame(
        _learn_merges(spark, sf_dir),
        schema="rank bigint, left string, right string, pair_count bigint",
    )


def _bpe_apply_pieces(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Subword pieces `word` segments into under `merges` (last piece
    carries the `</w>` end-of-word marker)."""
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
    return syms


def _bpe_apply(word: str, merges: list[tuple[str, str]]) -> int:
    """Number of subword tokens `word` encodes to under `merges`."""
    return len(_bpe_apply_pieces(word, merges))


# Documents-input byte gate under which bpe_encode's distinct-word vocab
# map may broadcast (overridable via the spark conf key below in
# bpe_encode); see the dispatch comment there for the Heaps'-law sizing.
BPE_BROADCAST_VOCAB_MAX_INPUT_BYTES = 1 << 30


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the learned BPE merges: per document, the
    subword token count and the chars-per-token compression the vocabulary
    achieves — the tokenizer-cost accounting step that turns ``bpe_vocab``
    from a table into a usable tokenizer.

    Scale shape: merges apply to the DISTINCT word table (vocab-bounded),
    never per corpus token — each distinct word maps to its subword count
    once (Arrow-batched), and documents get their totals by joining their
    (word, count) aggregate against that broadcast map and summing
    integers.  The expensive things stay O(corpus): one tokenization
    aggregate and one per-doc rollup; everything involving the merge
    table is O(vocab).  Integer-exact output; the learned merge list is
    session-memoized so the gate does not re-run the learning loop.
    """
    merges = [(a, b) for _, a, b, _ in _learn_merges(spark, sf_dir)]

    @F.pandas_udf("long")
    def n_subwords(w: pd.Series) -> pd.Series:
        return w.map(lambda x: _bpe_apply(x, merges))

    docs = load_table(spark, sf_dir, "documents")
    # r17 (guide §2.4 "remove shuffles outright"): the old shape
    # pre-aggregated to (doc_id, word, cnt) — a full corpus-token
    # exchange — joined the broadcast vocab map, re-aggregated by
    # doc_id (second exchange), and LEFT-joined back onto the doc list
    # to re-add word-free docs (third shuffle-ish pass).  The per-doc
    # totals are plain integer sums over tokens, so the broadcast map
    # can be applied PER TOKEN and everything collapses to one
    # groupBy(doc_id) with map-side partials: identical values (sum
    # over tokens of n_sub == sum over (w, cnt) of cnt * n_sub, exact
    # integers), one exchange.  ``explode_outer`` keeps word-free docs
    # as a NULL-token row — count("w") skips it and the sums coalesce
    # to 0 — so no join-back is needed for the row-per-doc contract.
    toks = docs.select(
        "doc_id",
        F.explode_outer(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    vocab_map = (
        toks.select("w")
        .filter(F.col("w").isNotNull())
        .distinct()
        .coalesce(4)
        .select(
            "w",
            n_subwords(F.col("w")).alias("n_sub"),
            F.length("w").cast("long").alias("n_chars"),
        )
    )
    # r18 size dispatch (VERDICT r17 task 4, guide §3.1): vocab_map is
    # the corpus-DISTINCT word table — Heaps'-law unbounded, so an
    # unconditional broadcast OOMs the driver at 100 TB.  Broadcast only
    # while the documents input is under a measured gate (the LSA
    # size-dispatch precedent; filesystem arithmetic, no extra job);
    # past it the plain shuffle join is the safe plan — identical values
    # either way (same left join, same integer sums).  Gate rationale:
    # Heaps V ~ 30·N_tokens^0.55 puts the framed (w, n_sub, n_chars)
    # relation near the session's 64 MB broadcast threshold at roughly
    # 1 GiB of compressed documents parquet, so the default gate sits
    # there; deployments override via spark conf.
    fits = (
        input_bytes(os.path.join(sf_dir, "documents.parquet"))
        <= int(
            spark.conf.get(
                "spark.graft.bpe.broadcastVocabMaxInputBytes",
                str(BPE_BROADCAST_VOCAB_MAX_INPUT_BYTES),
            )
        )
    )
    vm = F.broadcast(vocab_map) if fits else vocab_map
    zero = F.lit(0).cast("long")
    return (
        toks.join(vm, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("w").cast("long").alias("words"),
            F.coalesce(F.sum("n_sub").cast("long"), zero).alias(
                "bpe_tokens"
            ),
            F.coalesce(F.sum("n_chars").cast("long"), zero).alias(
                "alpha_chars"
            ),
        )
    )


ORACLES["bpe_vocab"] = (
    f"SELECT * FROM '{os.path.join(_GOLDEN_DIR, 'bpe_vocab.parquet')}'"
)
QUERIES["bpe_vocab"] = bpe_vocab
ORACLES["bpe_encode"] = (
    f"SELECT * FROM '{os.path.join(_GOLDEN_DIR, 'bpe_encode.parquet')}'"
)
QUERIES["bpe_encode"] = bpe_encode


# ---------------------------------------------------------------------------
# BM25 full-text retrieval
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# Fixed literal query set (deterministic; terms drawn from the corpus
# domain).  A real deployment would read these from a query table — the
# plan is identical: the parsed query-term relation broadcasts.
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "hash join order"),
    (1, "stream window agg"),
    (2, "fast vector scan"),
    (3, "customer table filter"),
    (4, "sort merge join"),
]


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k document retrieval (Robertson/Lucene idf variant)
    for a fixed query set — the lexical-retrieval baseline every RAG/search
    pipeline starts from.

    score(D,Q) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Scale shape (r17, guide §2.3 "shuffle fewer bytes"): the query-term
    restriction is applied INSIDE the token array, before the explode —
    the generator emits only matching tokens, so the (doc_id, term)
    aggregate shuffles O(docs x query_terms) rows instead of the whole
    corpus token stream (the previous shape aggregated ALL tokens and
    only then semi-joined the broadcast query terms — the full-corpus
    shuffle was pure waste).  Document length needs no explode at all:
    ``dl = size(split(...))`` is a row-local projection, identical to
    counting the exploded rows (split(-1) keeps empties, so every doc
    has >= 1 token and n_docs is the plain document count).  r18
    (VERDICT r17 task 3): documents is scanned ONCE — a leafed
    (doc_id, dl, query-token) base projection feeds the hits aggregate,
    the dl join and the N/avgdl scalars, where the r17 shape paid three
    corpus scans.  df comes from re-aggregating the tiny hits table;
    N and avgdl are a 1-row scalar aggregate broadcast by crossJoin
    (the doc_perplexity pattern); avgdl is exact in any fold order
    (integer-valued doubles, sums < 2^53).  Per-(query, doc) scores are summed by an ORDER-FIXED
    fold over the term-sorted contribution array — both engines add
    identical IEEE doubles in identical order, so ranking ties cannot
    split across engines and the top-k is exact (the ann_cosine_topk
    determinism argument, extended to summed scores).
    """
    docs = load_table(spark, sf_dir, "documents")
    # a VALUES LocalRelation, not createDataFrame (r17): the parsed
    # literal plan is canonicalization-stable across builds (plan and
    # codegen caches hit), and nothing round-trips through a driver RDD.
    # Values are ''-escaped (ADVICE r17): today's terms are plain ASCII,
    # but a future query containing a quote must not break the parse.
    _vals = ", ".join(
        f"({qid}, '{t.replace(chr(39), chr(39) * 2)}')"
        for qid, q in BM25_QUERIES
        for t in q.split(" ")
    )
    qterms = spark.sql(
        "SELECT cast(query_id AS bigint) AS query_id, term "
        f"FROM VALUES {_vals} AS v(query_id, term)"
    )
    qset = sorted({t for _, q in BM25_QUERIES for t in q.split(" ")})
    arr = F.split(F.lower("text"), " ", -1)
    # r18 (VERDICT r17 task 3, guide §1.2 "remove unnecessary passes"):
    # ONE leafed row-local base projection — (doc_id, dl, query-term
    # slice of the token array) — feeds hits, the dl join AND the
    # scalar aggregate.  The r17 shape scanned documents three times
    # (hits leaf build, the dl join branch, the 1-row scalar aggregate);
    # now the corpus parquet is read exactly once, at leaf build, and
    # everything downstream reads the pinned O(docs) rows (a long + a
    # few query-term strings per doc — the cost VERDICT r17 accepted
    # for cutting two full corpus passes at scale).  text IS NOT NULL
    # pins the NULL-text semantics to the oracle's (ADVICE r17): the
    # oracle's dl CTE derives from unnest(), which emits nothing for
    # NULL text, so such docs must not count toward n_docs/avgdl.
    base = leaf(
        docs.filter(F.col("text").isNotNull()).select(
            "doc_id",
            F.size(arr).cast("long").alias("dl"),
            F.filter(arr, lambda t: t.isin(*qset)).alias("qtok"),
        )
    )
    # leaf(): the hits table feeds BOTH df_ and the contribution join —
    # un-leafed, the explode+aggregate subtree runs once per branch (the
    # term_stats tf-leaf precedent; hits is the tiny query-term slice of
    # the corpus, cheap to hold).  Its build reads the base leaf's pinned
    # blocks, not the parquet.  dl rides THROUGH the aggregate (r18,
    # guide §2.4 "remove shuffles outright"): it is functionally
    # dependent on doc_id (every row of a group carries the same value,
    # so max() == the value, exactly), which deletes the old
    # O(docs)-row shuffle join that re-attached dl to the hit docs —
    # the last corpus-sized exchange in the plan; the aggregate's
    # shuffle rows widen by one long.
    hits = leaf(
        base.select("doc_id", "dl", F.explode("qtok").alias("term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
    )
    scalars = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    df_ = hits.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    contrib = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "query_id",
            "doc_id",
            "term",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "c"))),
                lambda s: s["c"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= BM25_TOPK)
        .select("query_id", "rk", "doc_id", r6(F.col("score")).alias("score"))
    )


_BM25_QUERY_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, q in BM25_QUERIES for t in q.split(" ")
)

ORACLES["bm25_search"] = f"""
WITH qterms AS (
  SELECT cast(query_id AS bigint) AS query_id, term
  FROM (VALUES {_BM25_QUERY_VALUES}) v(query_id, term)
),
toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, cast(count(*) AS bigint) AS tf
  FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, cast(count(*) AS bigint) AS dl FROM toks GROUP BY doc_id
),
scalars AS (
  SELECT cast(count(*) AS bigint) AS n_docs,
         avg(cast(dl AS double)) AS avgdl
  FROM dl
),
hits AS (
  SELECT tf.* FROM tf
  WHERE term IN (SELECT DISTINCT term FROM qterms)
),
df_ AS (
  SELECT term, cast(count(DISTINCT doc_id) AS bigint) AS df
  FROM hits GROUP BY term
),
contrib AS (
  SELECT q.query_id, h.doc_id, h.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (h.tf * ({BM25_K1} + 1))
         / (h.tf + {BM25_K1}
            * (1 - {BM25_B} + {BM25_B} * l.dl / s.avgdl)) AS c
  FROM hits h
  JOIN qterms q USING (term)
  JOIN df_ d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN scalars s
),
scored AS (
  SELECT query_id, doc_id,
         list_aggregate(list(c ORDER BY term), 'sum') AS score
  FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id,
       cast(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS bigint)
         AS rk,
       doc_id, (round(score, 6) + 0.0) AS score
FROM scored
QUALIFY rk <= {BM25_TOPK}
"""
QUERIES["bm25_search"] = bm25_search


# ---------------------------------------------------------------------------
# Character-distribution entropy (quality signal)
# ---------------------------------------------------------------------------


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution — the info-theoretic quality signal that separates
    natural text (~4 bits) from degenerate repetition (near 0) and
    random/encoded noise (near log2 alphabet): the cheap complement to
    ``compression_ratio`` that needs no codec.

    Scale shape: explode-to-chars feeds a (doc_id, ch) count whose
    map-side combine collapses each partition to O(docs x alphabet)
    before the shuffle — the wire volume is bounded by the alphabet, not
    by corpus bytes.  The per-doc entropy sum is an ORDER-FIXED fold over
    the char-sorted contribution array (the bm25_search float-parity
    construction), so the doubles are bit-identical across engines before
    the r6 round.
    """
    docs = load_table(spark, sf_dir, "documents")
    nonempty = docs.filter(F.length("text") > 0)
    counts = (
        nonempty.select(
            "doc_id", F.explode(F.split("text", "", -1)).alias("ch")
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n = nonempty.select(
        "doc_id", F.length("text").cast("long").alias("n")
    )
    per_doc = (
        counts.join(n, "doc_id")
        .select(
            "doc_id",
            "ch",
            (
                -(F.col("c") / F.col("n"))
                * F.log2(F.col("c") / F.col("n"))
            ).alias("e"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("distinct_chars"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ch", "e"))),
                    lambda s: s["e"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("h"),
        )
    )
    return docs.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    ).join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("distinct_chars", F.lit(0).cast("long")).alias(
            "distinct_chars"
        ),
        r6(F.coalesce("h", F.lit(0.0))).alias("entropy_bits"),
    )


ORACLES["char_entropy"] = """
WITH counts AS (
  SELECT doc_id, ch, cast(count(*) AS bigint) AS c
  FROM (
    SELECT doc_id, unnest(string_split(text, '')) AS ch
    FROM documents WHERE len(text) > 0
  ) GROUP BY doc_id, ch
),
n AS (
  SELECT doc_id, cast(len(text) AS bigint) AS n
  FROM documents WHERE len(text) > 0
),
per_doc AS (
  SELECT doc_id, cast(count(*) AS bigint) AS distinct_chars,
         list_aggregate(
           list(-(c / n) * log2(c / n) ORDER BY ch), 'sum') AS h
  FROM counts JOIN n USING (doc_id)
  GROUP BY doc_id
)
SELECT d.doc_id, cast(len(d.text) AS bigint) AS n_chars,
       coalesce(p.distinct_chars, 0) AS distinct_chars,
       (round(coalesce(p.h, 0.0), 6) + 0.0) AS entropy_bits
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""
QUERIES["char_entropy"] = char_entropy


# ---------------------------------------------------------------------------
# Approximate string join: edit-distance-1 vocabulary pairs
# ---------------------------------------------------------------------------


TYPO_MAX_DIST = 2  # SymSpell deletion-neighborhood radius

_DEL_EXPR = (
    "transform(sequence(0, length({c})),"
    " i -> concat(substring({c}, 1, i), substring({c}, i + 2)))"
)


def typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary pairs within Levenshtein distance ``TYPO_MAX_DIST`` —
    typo/variant mining for corpus normalization (an approximate STRING
    join, the one join family the relational suite lacked).

    Scale shape is deletion-neighborhood blocking (FastSS / SymSpell):
    each vocabulary word emits every string reachable by deleting up to
    k characters (two rounds of the single-deletion transform; round one
    includes the identity, so the union is the full <=k neighborhood).
    The SymSpell invariant — levenshtein(a, b) <= k implies the two
    deletion sets intersect — turns candidate generation into an
    EQUI-join on the variant key, never an all-pairs cross of the
    vocabulary; the exact ``levenshtein`` runs on candidates only.
    Everything is vocab-bounded (the bpe_vocab argument): ~L^2/2
    variants per word is the standard SymSpell space cost and why k=2
    is the practical radius ceiling.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # round 1 (includes identity at i = length), then round 2: <=2 deletions
    d1 = vocab.select(
        "w", "cnt", F.explode(F.expr(_DEL_EXPR.format(c="w"))).alias("u")
    )
    variants = d1.select(
        "w", "cnt", F.explode(F.expr(_DEL_EXPR.format(c="u"))).alias("v")
    ).distinct()
    a = variants.select(
        F.col("w").alias("word_a"), F.col("cnt").alias("n_a"), "v"
    )
    b = variants.select(
        F.col("w").alias("word_b"), F.col("cnt").alias("n_b"), "v"
    )
    # collapse duplicate candidates (pairs sharing several variants) BEFORE
    # the exact check, so levenshtein — the expensive scalar — runs once
    # per DISTINCT pair, not once per shared variant
    cand = (
        a.join(b, "v")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"))
    )
    return cand.withColumn(
        "dist", F.levenshtein("word_a", "word_b").cast("long")
    ).filter(F.col("dist") <= TYPO_MAX_DIST)


ORACLES["typo_pairs"] = f"""
WITH vocab AS (
  SELECT w, cast(count(*) AS bigint) AS cnt
  FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
  ) GROUP BY w
),
d1 AS (
  SELECT w, cnt,
         unnest([substr(w, 1, i) || substr(w, i + 2)
                 for i in range(0, len(w) + 1)]) AS u
  FROM vocab
),
variants AS (
  SELECT DISTINCT w, cnt, v FROM (
    SELECT w, cnt,
           unnest([substr(u, 1, i) || substr(u, i + 2)
                   for i in range(0, len(u) + 1)]) AS v
    FROM d1
  )
),
cand AS (
  SELECT a.w AS word_a, b.w AS word_b,
         max(a.cnt) AS n_a, max(b.cnt) AS n_b
  FROM variants a
  JOIN variants b USING (v)
  WHERE a.w < b.w
  GROUP BY a.w, b.w
)
SELECT word_a, word_b, n_a, n_b,
       cast(levenshtein(word_a, word_b) AS bigint) AS dist
FROM cand
WHERE levenshtein(word_a, word_b) <= {TYPO_MAX_DIST}
"""
QUERIES["typo_pairs"] = typo_pairs


# ---------------------------------------------------------------------------
# Stupid-backoff trigram LM scoring of the held-out split
# ---------------------------------------------------------------------------

SB_ALPHA = 0.4  # the backoff discount of Brants et al. 2007
SB_OOV = 0.5  # pseudo-count for train-unseen unigrams (ppl_ingest floor)


def stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every held-out document under a trigram LM with stupid
    backoff (Brants et al. 2007, "Large Language Models in Machine
    Translation") trained on the train split — THE web-scale smoothing:
    no discount mass bookkeeping, just S(w3|w1w2) = c123/c12 when the
    trigram was seen, else 0.4 * S(w3|w2), else 0.4^2 * c3/N (train-OOV
    words take a 0.5 pseudo-count).  Scoring the md5-split held-out side
    against the train-side counts is what makes backoff actually fire —
    scoring the training corpus against itself never backs off.

    Scale shape: the train corpus collapses to three n-gram count tables
    (combiner-friendly single-key shuffles, each O(train tokens) in and
    O(distinct grams) out); held-out trigrams join them by gram key.  The
    per-doc log-score average is an ORDER-FIXED fold over the
    position-sorted contributions (the bm25_search construction), so the
    doubles — and therefore the r6 values — are engine-exact.  Output
    also counts which backoff level served each position: the
    observability a data-quality dashboard wants.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket()
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ", -1).alias("__w"), bucket.alias("__b")
    )
    train = toks.filter(F.col("__b") < 80)
    uni = (
        train.select(F.explode("__w").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    total = uni.agg(F.sum("c").cast("long").alias("n_train"))
    bi = (
        train.filter(F.size("__w") >= 2)
        .select(
            F.posexplode(F.sequence(F.lit(1), F.size("__w") - 1)).alias(
                "__p", "__i"
            ),
            "__w",
        )
        .select(
            F.element_at("__w", F.col("__i")).alias("w1"),
            F.element_at("__w", F.col("__i") + 1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tri = (
        train.filter(F.size("__w") >= 3)
        .select(
            F.posexplode(F.sequence(F.lit(1), F.size("__w") - 2)).alias(
                "__p", "__i"
            ),
            "__w",
        )
        .select(
            F.element_at("__w", F.col("__i")).alias("w1"),
            F.element_at("__w", F.col("__i") + 1).alias("w2"),
            F.element_at("__w", F.col("__i") + 2).alias("w3"),
        )
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("c"))
    )
    held = (
        toks.filter((F.col("__b") >= 80) & (F.size("__w") >= 3))
        .select(
            "doc_id",
            "__w",
            F.posexplode(F.sequence(F.lit(1), F.size("__w") - 2)).alias(
                "pos", "__i"
            ),
        )
        .select(
            "doc_id",
            "pos",
            F.element_at("__w", F.col("__i")).alias("w1"),
            F.element_at("__w", F.col("__i") + 1).alias("w2"),
            F.element_at("__w", F.col("__i") + 2).alias("w3"),
        )
    )
    joined = (
        held.join(
            tri.select("w1", "w2", "w3", F.col("c").alias("c123")),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            bi.select("w1", "w2", F.col("c").alias("c12")), ["w1", "w2"], "left"
        )
        .join(
            bi.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c").alias("c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("cw2")),
            ["w2"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w3"), F.col("c").alias("cw3")),
            ["w3"],
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    alpha2 = SB_ALPHA * SB_ALPHA
    score = (
        F.when(
            F.col("c123").isNotNull(), F.col("c123") / F.col("c12")
        )
        .when(
            F.col("c23").isNotNull(),
            F.lit(SB_ALPHA) * F.col("c23") / F.col("cw2"),
        )
        .otherwise(
            F.lit(alpha2)
            * F.coalesce(F.col("cw3"), F.lit(SB_OOV))
            / F.col("n_train")
        )
    )
    level = (
        F.when(F.col("c123").isNotNull(), F.lit(0))
        .when(F.col("c23").isNotNull(), F.lit(1))
        .otherwise(F.lit(2))
    )
    return (
        joined.select(
            "doc_id", "pos", F.log10(score).alias("lg"), level.alias("lvl")
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            r6(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "lg"))),
                        lambda s: s["lg"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count("*")
            ).alias("avg_log10_score"),
            F.sum(F.when(F.col("lvl") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_tri_hits"),
            F.sum(F.when(F.col("lvl") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bi_backoffs"),
            F.sum(F.when(F.col("lvl") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_uni_backoffs"),
        )
    )


_SB_BUCKET = SPLIT_BUCKET_SQL  # the shared split contract

ORACLES["stupid_backoff"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w,
         {_SB_BUCKET} AS b
  FROM documents
),
uni AS (
  SELECT u AS w, cast(count(*) AS bigint) AS c
  FROM (SELECT unnest(w) AS u FROM toks WHERE b < 80) GROUP BY u
),
total AS (SELECT cast(sum(c) AS bigint) AS n_train FROM uni),
bi AS (
  SELECT w[i] AS w1, w[i + 1] AS w2, cast(count(*) AS bigint) AS c
  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks
        WHERE b < 80 AND len(w) >= 2)
  GROUP BY 1, 2
),
tri AS (
  SELECT w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3,
         cast(count(*) AS bigint) AS c
  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i FROM toks
        WHERE b < 80 AND len(w) >= 3)
  GROUP BY 1, 2, 3
),
held AS (
  SELECT doc_id, cast(i AS bigint) AS pos,
         w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks
        WHERE b >= 80 AND len(w) >= 3)
),
scored AS (
  SELECT h.doc_id, h.pos,
         CASE WHEN t.c IS NOT NULL THEN t.c / b12.c
              WHEN b23.c IS NOT NULL
                THEN cast({SB_ALPHA} AS double) * b23.c / u2.c
              ELSE cast({SB_ALPHA * SB_ALPHA!r} AS double)
                   * coalesce(cast(u3.c AS double),
                              cast({SB_OOV} AS double))
                   / tt.n_train
         END AS s,
         CASE WHEN t.c IS NOT NULL THEN 0
              WHEN b23.c IS NOT NULL THEN 1 ELSE 2 END AS lvl
  FROM held h
  LEFT JOIN tri t ON t.w1 = h.w1 AND t.w2 = h.w2 AND t.w3 = h.w3
  LEFT JOIN bi b12 ON b12.w1 = h.w1 AND b12.w2 = h.w2
  LEFT JOIN bi b23 ON b23.w1 = h.w2 AND b23.w2 = h.w3
  LEFT JOIN uni u2 ON u2.w = h.w2
  LEFT JOIN uni u3 ON u3.w = h.w3
  CROSS JOIN total tt
)
SELECT doc_id, cast(count(*) AS bigint) AS n_trigrams,
       (round(list_aggregate(list(log10(s) ORDER BY pos), 'sum')
             / count(*), 6) + 0.0) AS avg_log10_score,
       cast(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_tri_hits,
       cast(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS bigint)
         AS n_bi_backoffs,
       cast(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS bigint)
         AS n_uni_backoffs
FROM scored
GROUP BY doc_id
"""
QUERIES["stupid_backoff"] = stupid_backoff


# ---------------------------------------------------------------------------
# Vocabulary-distribution drift between splits (KL / Jensen-Shannon)
# ---------------------------------------------------------------------------

KL_SMOOTH = 0.5  # add-half smoothing so both distributions support the union


def vocab_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL and Jensen-Shannon divergence (bits) between the train and
    held-out word distributions — the information-theoretic drift check
    that complements ``snapshot_drift``'s count/share deltas: a large
    JS says the held-out split no longer looks like training data (or,
    run between snapshot versions, that the corpus composition moved).

    Scale shape: one tokenization feeds a per-word (train, held) count
    aggregate whose cardinality is the vocabulary; the scalar totals
    broadcast back over it.  The divergence sums are vocab-bounded
    single-row aggregates using the order-fixed fold (word-sorted), so
    the bits are engine-exact before r6; a web-scale vocabulary (~1e6)
    still folds in one bounded buffer — the same vocab-fits-in-one-
    aggregate argument as bpe_vocab's merge table.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket()
    words = docs.select(
        bucket.alias("__b"),
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    counts = words.groupBy("w").agg(
        F.sum(F.when(F.col("__b") < 80, 1).otherwise(0))
        .cast("long")
        .alias("c_tr"),
        F.sum(F.when(F.col("__b") >= 80, 1).otherwise(0))
        .cast("long")
        .alias("c_he"),
    )
    totals = counts.agg(
        F.sum("c_tr").cast("long").alias("n_tr"),
        F.sum("c_he").cast("long").alias("n_he"),
        F.count("*").cast("long").alias("v"),
    )
    k = float(KL_SMOOTH)
    with_p = counts.crossJoin(F.broadcast(totals)).select(
        "w",
        "n_tr",
        "n_he",
        "v",
        ((F.col("c_tr") + k) / (F.col("n_tr") + k * F.col("v"))).alias("p"),
        ((F.col("c_he") + k) / (F.col("n_he") + k * F.col("v"))).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = with_p.select(
        "w",
        "n_tr",
        "n_he",
        "v",
        (F.col("p") * F.log2(F.col("p") / F.col("q"))).alias("kl_w"),
        (
            F.col("p") / 2 * F.log2(F.col("p") / m)
            + F.col("q") / 2 * F.log2(F.col("q") / m)
        ).alias("js_w"),
    )

    def fold(col: str):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", F.col(col)))),
                lambda s: s[col],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return contrib.groupBy("n_tr", "n_he", "v").agg(
        r6(fold("kl_w")).alias("kl_bits"), r6(fold("js_w")).alias("js_bits")
    ).select("n_tr", "n_he", "v", "kl_bits", "js_bits")


ORACLES["vocab_kl_drift"] = f"""
WITH words AS (
  SELECT {_SB_BUCKET} AS b,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
counts AS (
  SELECT w,
         cast(sum(CASE WHEN b < 80 THEN 1 ELSE 0 END) AS bigint) AS c_tr,
         cast(sum(CASE WHEN b >= 80 THEN 1 ELSE 0 END) AS bigint) AS c_he
  FROM words GROUP BY w
),
totals AS (
  SELECT cast(sum(c_tr) AS bigint) AS n_tr,
         cast(sum(c_he) AS bigint) AS n_he,
         cast(count(*) AS bigint) AS v
  FROM counts
),
with_p AS (
  SELECT w, n_tr, n_he, v,
         (c_tr + cast({KL_SMOOTH} AS double))
           / (n_tr + cast({KL_SMOOTH} AS double) * v) AS p,
         (c_he + cast({KL_SMOOTH} AS double))
           / (n_he + cast({KL_SMOOTH} AS double) * v) AS q
  FROM counts CROSS JOIN totals
),
contrib AS (
  SELECT w, n_tr, n_he, v,
         p * log2(p / q) AS kl_w,
         p / 2 * log2(p / ((p + q) / 2))
           + q / 2 * log2(q / ((p + q) / 2)) AS js_w
  FROM with_p
)
SELECT n_tr, n_he, v,
       (round(list_aggregate(list(kl_w ORDER BY w), 'sum'), 6) + 0.0) AS kl_bits,
       (round(list_aggregate(list(js_w ORDER BY w), 'sum'), 6) + 0.0) AS js_bits
FROM contrib
GROUP BY n_tr, n_he, v
"""
QUERIES["vocab_kl_drift"] = vocab_kl_drift


# ---------------------------------------------------------------------------
# Sparse TF-IDF document similarity (inverted-index top-k)
# ---------------------------------------------------------------------------

DOC_SIM_QUERIES = 50  # doc_id < 50 are the query documents
DOC_SIM_TOPK = 3


def tfidf_doc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most similar documents per query document under SPARSE
    TF-IDF cosine — the inverted-index similarity family, completing the
    trio next to MinHash/SimHash (set overlap) and dense-embedding ANN:
    this is how "find related docs" works when vectors are term-weighted
    and mostly zero.

    Scale shape: candidate pairs come from a postings equi-join on the
    term key (docs sharing no term never meet), and corpus-wide terms
    carry idf = log10(N/df) = 0, so the filter ``idf > 0`` prunes
    exactly the postings lists whose quadratic blow-up would hurt — the
    classic stop-postings cut.  Per-pair dot products and per-doc norms
    are order-fixed folds over term-sorted weight arrays, making cosine
    AND ranking engine-exact (the bm25_search construction).  The query
    side is a broadcast (bounded query set), the corpus side shuffles on
    the term key once.

    Corpus caveat: the synthetic testdata vocabulary is ~30 words that
    each appear in ~77% of documents — maximally dense postings with no
    Zipf tail for the idf cut to remove, the adversarial case for sparse
    similarity (sf0.1: ~6M candidate products for 50 queries).  On real
    text the Zipfian df distribution makes the same plan sparse; the
    production escalations are a max-df cut or champion lists
    (impact-ordered postings), both of which drop candidates BEFORE the
    join without changing this plan's shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n_docs = docs.agg(F.count("*").cast("long").alias("n"))
    # (doc_id, w) rows are unique after the tf aggregate, so df is a plain
    # count — countDistinct would only add an Expand pass
    df_ = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    weights = (
        tf.join(F.broadcast(df_), "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "w",
            (F.col("tf") * F.log10(F.col("n") / F.col("df"))).alias("wt"),
        )
        .filter(F.col("wt") > 0)
    )
    # pin (r8): three branches consume weights (norms, query side, corpus
    # side) and the stacked aggregations defeat exchange reuse, so the
    # full text explode + two shuffles executed once PER BRANCH — the
    # dominant share of this query's wall (13.6s exec at sf0.1, 3x the
    # postings work).  One owned cache feeds all three.  pin, not leaf:
    # the query is built once per session (no cross-query sharing) and
    # its subtree is shallow, so the leaf's checkpoint block copy would
    # cost more than the analysis it saves (measured +1.3s at sf0.01).
    weights = pin(weights)

    def fold_sq(col):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", col.alias("x")))),
                lambda s: s["x"] * s["x"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    norms = weights.groupBy("doc_id").agg(
        F.sqrt(fold_sq(F.col("wt"))).alias("nrm")
    )
    q = weights.filter(F.col("doc_id") < DOC_SIM_QUERIES).select(
        F.col("doc_id").alias("qid"), "w", F.col("wt").alias("qwt")
    )
    prod = q.join(
        weights.select(
            F.col("doc_id").alias("cid"), "w", F.col("wt").alias("cwt")
        ),
        "w",
    ).filter(F.col("qid") != F.col("cid"))
    dots = prod.groupBy("qid", "cid").agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("w", (F.col("qwt") * F.col("cwt")).alias("x"))
                    )
                ),
                lambda s: s["x"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dot")
    )
    qnorms = norms.filter(F.col("doc_id") < DOC_SIM_QUERIES).select(
        F.col("doc_id").alias("qid"), F.col("nrm").alias("qn")
    )
    sims = (
        dots.join(F.broadcast(qnorms), "qid")
        .join(
            norms.select(F.col("doc_id").alias("cid"), F.col("nrm").alias("cn")),
            "cid",
        )
        .select(
            "qid", "cid", (F.col("dot") / (F.col("qn") * F.col("cn"))).alias("sim")
        )
    )
    w_rk = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rk", F.row_number().over(w_rk).cast("long"))
        .filter(F.col("rk") <= DOC_SIM_TOPK)
        .select(
            F.col("qid").alias("query_doc"),
            "rk",
            F.col("cid").alias("similar_doc"),
            r6(F.col("sim")).alias("cosine"),
        )
    )


ORACLES["tfidf_doc_topk"] = f"""
WITH tf AS (
  SELECT doc_id, w, cast(count(*) AS bigint) AS tf
  FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
  ) GROUP BY doc_id, w
),
n_docs AS (SELECT cast(count(*) AS bigint) AS n FROM documents),
df_ AS (
  SELECT w, cast(count(DISTINCT doc_id) AS bigint) AS df FROM tf GROUP BY w
),
weights AS (
  SELECT doc_id, w, tf * log10(cast(n AS double) / df) AS wt
  FROM tf JOIN df_ USING (w) CROSS JOIN n_docs
  WHERE tf * log10(cast(n AS double) / df) > 0
),
norms AS (
  SELECT doc_id,
         sqrt(list_aggregate(list(wt * wt ORDER BY w), 'sum')) AS nrm
  FROM weights GROUP BY doc_id
),
dots AS (
  SELECT q.doc_id AS qid, c.doc_id AS cid,
         list_aggregate(list(q.wt * c.wt ORDER BY w), 'sum') AS dot
  FROM weights q
  JOIN weights c USING (w)
  WHERE q.doc_id < {DOC_SIM_QUERIES} AND q.doc_id <> c.doc_id
  GROUP BY 1, 2
),
sims AS (
  SELECT d.qid, d.cid, d.dot / (nq.nrm * nc.nrm) AS sim
  FROM dots d
  JOIN norms nq ON nq.doc_id = d.qid
  JOIN norms nc ON nc.doc_id = d.cid
)
SELECT qid AS query_doc,
       cast(row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, cid ASC) AS bigint) AS rk,
       cid AS similar_doc, (round(sim, 6) + 0.0) AS cosine
FROM sims
QUALIFY rk <= {DOC_SIM_TOPK}
"""
QUERIES["tfidf_doc_topk"] = tfidf_doc_topk


# ---------------------------------------------------------------------------
# Word-association mining: document-level co-occurrence PMI
# ---------------------------------------------------------------------------

PMI_TOP_WORDS = 50  # vocabulary slice the pair join is blocked to
PMI_MIN_PAIR = 5  # minimum co-occurring documents for an edge


def pmi_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between words over document-level
    co-occurrence — the association-mining complement to ``bigram_lm``
    (adjacency) and ``similarity_edges`` (document graph): which words
    appear in the SAME documents far more often than independence
    predicts.

    pmi(a, b) = ln(n_docs * c_ab / (c_a * c_b)) over presence counts.
    The log of an integer rational is irrational, so r6 rounding is
    cross-engine safe (the repo's float-parity convention).

    Scale shape: the pair self-join is blocked to the PMI_TOP_WORDS
    highest-df words (broadcast list), bounding per-document pair
    fan-out at top_words^2/2 regardless of corpus size; counts are
    map-side-combined groupBys.  Widening the vocabulary slice at 100 TB
    means raising one constant — the plan shape is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ", -1)).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]{3,}$"))
        .distinct()
    )
    dfreq = toks.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    top_w = Window.orderBy(F.desc("c"), F.asc("w"))
    top = (
        dfreq.withColumn("rk", F.row_number().over(top_w))
        .filter(F.col("rk") <= PMI_TOP_WORDS)
        .select("w", "c")
    )
    hits = toks.join(F.broadcast(top), "w")
    a = hits.select("doc_id", F.col("w").alias("w_a"), F.col("c").alias("c_a"))
    b = hits.select("doc_id", F.col("w").alias("w_b"), F.col("c").alias("c_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w_a") < F.col("w_b"))
        .groupBy("w_a", "w_b", "c_a", "c_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_PAIR)
    )
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select(
            "w_a",
            "w_b",
            "c_ab",
            "c_a",
            "c_b",
            # doubles BEFORE the products (identical op order in the
            # oracle): int64 c_a*c_b would overflow at web-corpus counts
            r6(
                F.log(
                    (F.col("n_docs").cast("double") * F.col("c_ab"))
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                )
            ).alias("pmi"),
        )
    )


ORACLES["pmi_edges"] = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents
  ) WHERE regexp_matches(w, '^[a-z]{{3,}}$')
),
dfreq AS (SELECT w, cast(count(*) AS bigint) AS c FROM toks GROUP BY w),
top AS (
  SELECT w, c FROM (
    SELECT w, c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk
    FROM dfreq
  ) WHERE rk <= {PMI_TOP_WORDS}
),
hits AS (SELECT t.doc_id, t.w, p.c FROM toks t JOIN top p ON p.w = t.w),
pairs AS (
  SELECT a.w AS w_a, b.w AS w_b, a.c AS c_a, b.c AS c_b,
         cast(count(*) AS bigint) AS c_ab
  FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {PMI_MIN_PAIR}
)
SELECT w_a, w_b, c_ab, c_a, c_b,
       (round(ln((cast((SELECT count(*) FROM documents) AS double) * c_ab)
                / (cast(c_a AS double) * c_b)), 6) + 0.0) AS pmi
FROM pairs
"""
QUERIES["pmi_edges"] = pmi_edges


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility — subwords per word under the
    learned BPE merges — THE statistic a tokenizer eval reports before a
    vocabulary ships (high-fertility languages pay more compute per word
    and hit context limits sooner).

    Composition: the per-doc ``bpe_encode`` accounting (merge list
    session-memoized, so this never re-runs the learning loop) joined to
    the documents' language, reduced to one row per language.  Fertility
    is a rational of integers, so per the repo's float convention it
    ships QUANTIZED by integer arithmetic (milli-units, genuine integer
    div) instead of a rounded double — exact in both engines.  The
    oracle aggregates the committed bpe_encode golden joined to the
    documents view, so the gate checks the join+reduction over certified
    per-doc facts.
    """
    enc = bpe_encode(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        enc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("total_words"),
            F.sum("bpe_tokens").cast("long").alias("total_subwords"),
        )
        .withColumn(
            "fertility_milli",
            F.expr("(1000 * total_subwords) div total_words").cast("long"),
        )
    )


ORACLES["tokenizer_fertility"] = f"""
SELECT d.lang,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(g.words) AS bigint) AS total_words,
       cast(sum(g.bpe_tokens) AS bigint) AS total_subwords,
       cast((1000 * cast(sum(g.bpe_tokens) AS bigint))
            // cast(sum(g.words) AS bigint) AS bigint) AS fertility_milli
FROM '{os.path.join(_GOLDEN_DIR, "bpe_encode.parquet")}' g
JOIN documents d USING (doc_id)
GROUP BY d.lang
"""
QUERIES["tokenizer_fertility"] = tokenizer_fertility


# Oracle-side mirror of multimodal.FILE_CAP (ADVICE r8: interpolated, not
# hardcoded, so a FILE_CAP change can never desynchronize the round-trip
# oracles from their queries — the ORACLES['tar_shards_roundtrip'] pattern).
from .multimodal import FILE_CAP as _FILE_CAP_ORACLE  # noqa: E402


def _ensure_roundtrip_dir(docs: DataFrame, sf_dir: str, kind: str) -> str:
    """Provision the on-disk round-trip fixture for one structured sink,
    once, ATOMICALLY (ADVICE r8): the distributed Spark write goes to a
    pid-suffixed stage directory which is ``os.rename``d into the final
    shared path only after the sink completed — the exact
    ``multimodal._ensure_media_dir`` scheme, so a pytest run alongside
    the driver can never observe (or overwrite) a half-written directory.
    Keyed by a content signature of documents.parquet; a lost rename race
    means the other builder's complete directory wins."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..io import write_jsonl, write_orc

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    sig = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_media", sig, kind)
    if os.path.isdir(root):
        return root
    stage = root + f".stage-{os.getpid()}"
    (write_jsonl if kind == "jsonl" else write_orc)(docs, stage)
    try:
        os.rename(stage, root)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)  # raced: other build won
    return root


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink round-trip as a value-gated query — the last
    pytest-only ingest edge driver-gated (the r8 pattern that closed the
    PPM/WAV/tar edges): documents -> ``io.write_jsonl`` (a DISTRIBUTED
    Spark json sink to a temp dir — executor-side write, unlike the
    media fixtures' driver-side provisioning) -> ``io.read_jsonl`` with
    an EXPLICIT schema (single pass, no inference) -> one row per doc
    with its key columns and text md5.  The oracle recomputes the same
    facts from the documents table, so equality certifies JSON
    escaping/encoding round-trips byte-exactly through the file system.
    Fixture provisioning is stage-and-rename atomic
    (:func:`_ensure_roundtrip_dir`)."""
    from .multimodal import FILE_CAP

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < FILE_CAP)
        .select("doc_id", "source", "lang", "text")
    )
    from ..io import read_jsonl

    out = _ensure_roundtrip_dir(docs, sf_dir, "jsonl")
    back = read_jsonl(spark, out, schema=docs.schema)
    return back.select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
    )


ORACLES["jsonl_roundtrip"] = f"""
SELECT doc_id, source, lang, md5(text) AS text_md5
FROM documents WHERE doc_id < {_FILE_CAP_ORACLE}
"""
QUERIES["jsonl_roundtrip"] = jsonl_roundtrip


def bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer DECODE certificate: every vocabulary word's BPE pieces
    must concatenate back to the word (+ the ``</w>`` marker) — the
    lossless-segmentation invariant that makes detokenization exact.
    ``bpe_encode`` gates the token COUNTS; this gates the pieces
    themselves: a merge-application bug that produced the right count
    with wrong splits (dropped or duplicated characters) passes the
    count gate and fails here.  Determinate facts (the incremental_agg
    merge-==-full pattern): the distinct-vocabulary size, and an
    all-words-round-trip boolean the oracle states as the closed-form
    TRUE.  Scale shape identical to bpe_encode: merges apply to the
    DISTINCT word table (vocab-bounded, Arrow-batched), never per
    corpus token."""
    merges = [(a, b) for _, a, b, _ in _learn_merges(spark, sf_dir)]

    @F.pandas_udf("boolean")
    def roundtrips(w: pd.Series) -> pd.Series:
        return w.map(
            lambda x: "".join(_bpe_apply_pieces(x, merges)) == x + "</w>"
        )

    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .distinct()
        .coalesce(4)
    )
    return vocab.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab_words"),
        F.coalesce(
            F.sum(F.when(~roundtrips(F.col("w")), 1).otherwise(0)) == 0,
            F.lit(True),
        ).alias("all_roundtrip"),
    )


ORACLES["bpe_roundtrip"] = """
SELECT cast(count(DISTINCT w) AS bigint) AS n_vocab_words,
       TRUE AS all_roundtrip
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents)
"""
QUERIES["bpe_roundtrip"] = bpe_roundtrip


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip, the Hive-ecosystem sibling of
    :func:`jsonl_roundtrip` (same fixture scheme, same oracle pattern):
    documents -> ``io.write_orc`` (distributed) -> ``io.read_orc`` ->
    key columns + text md5, value-gated against the documents table —
    with this row every structured source/sink in io.py carries a
    driver gate (parquet: every query; JSONL/ORC: the round-trip rows;
    TSV/binaryFile/tar: the reviews and media-edge rows).  Fixture
    provisioning is stage-and-rename atomic
    (:func:`_ensure_roundtrip_dir`)."""
    from ..io import read_orc
    from .multimodal import FILE_CAP

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < FILE_CAP)
        .select("doc_id", "source", "lang", "text")
    )
    out = _ensure_roundtrip_dir(docs, sf_dir, "orc")
    return read_orc(spark, out).select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
    )


ORACLES["orc_roundtrip"] = f"""
SELECT doc_id, source, lang, md5(text) AS text_md5
FROM documents WHERE doc_id < {_FILE_CAP_ORACLE}
"""
QUERIES["orc_roundtrip"] = orc_roundtrip


# ---------------------------------------------------------------------------
# Corpus diversity (distinct-n) and vocabulary growth (Heaps' law) — the
# corpus-level health curves a training-data pipeline reads before and
# after synthetic-data injection or aggressive dedup (r10)
# ---------------------------------------------------------------------------

DIVERSITY_MAX_N = 3  # distinct-1/2/3
GROWTH_BUCKETS = 10  # nested md5-bucket prefixes for the growth curve


def corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level distinct-n diversity (the distinct-1/distinct-2
    metric of Li et al. 2016, the standard mode-collapse check for
    synthetic training data): for n = 1..DIVERSITY_MAX_N, distinct word
    n-grams over total n-grams — a rational of integers, so quantized
    to exact milli-units by integer division per the repo's float
    convention (never ``round()``).

    Spark-first, ONE corpus pass, O(tokens) peak per-row memory: the
    scan explodes (doc, n) first — DIVERSITY_MAX_N tiny rows per
    document, each still holding the shared token array — and only THEN
    materializes that single n's gram array and explodes it, so no row
    ever holds more than one n's grams at once (ADVICE r10: the old
    flatten-of-three-arrays form materialized all 3·tokens grams per
    document before its explode — a ~300 k-element array for a
    100 k-token document).  Both generators chain inside one narrow
    stage; then one (n, gram)-keyed aggregate with map-side partials.
    At 100 TB this is the ``vocabulary()`` shape (gram-keyed partial
    aggregation; no stage ever holds more than the distinct grams)
    without paying the scan+tokenize DIVERSITY_MAX_N times.
    """
    return _diversity_grams(load_table(spark, sf_dir, "documents")).groupBy(
        "n"
    ).agg(
        F.count("*").cast("long").alias("total_ngrams"),
        F.countDistinct("g").cast("long").alias("distinct_ngrams"),
        F.expr("(1000 * count(DISTINCT g)) div count(*)")
        .cast("long")
        .alias("distinct_milli"),
    )


def _diversity_grams(docs: DataFrame) -> DataFrame:
    """The tagged (n, gram) stream shared by :func:`corpus_diversity`
    and :func:`corpus_diversity_sketch`: one scan, per-n explode."""
    arr = F.split(F.lower("text"), " ", -1)
    return (
        docs.select(
            arr.alias("ws"),
            F.explode(
                F.sequence(F.lit(1), F.lit(DIVERSITY_MAX_N))
            ).alias("n"),
        )
        # guard BEFORE the sequence: sequence(1, 0) would count DOWN
        .filter(F.size("ws") >= F.col("n"))
        .select(
            "n",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size("ws") - F.col("n") + F.lit(1)
                    ),
                    # slice+array_join == the old concat_ws over a
                    # null-free split array: identical gram strings
                    lambda i: F.array_join(
                        F.slice(F.col("ws"), i, F.col("n")), " "
                    ),
                )
            ).alias("g"),
        )
        .select(F.col("n").cast("long").alias("n"), "g")
    )


ORACLES["corpus_diversity"] = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
),
g AS (
  SELECT n,
         unnest(list_transform(
           range(1, len(ws) - n + 2),
           i -> array_to_string(ws[i:i + n - 1], ' '))) AS g
  FROM w, (SELECT unnest(range(1, {DIVERSITY_MAX_N + 1})) AS n)
  WHERE len(ws) >= n
)
SELECT cast(n AS bigint) AS n,
       cast(count(*) AS bigint) AS total_ngrams,
       cast(count(DISTINCT g) AS bigint) AS distinct_ngrams,
       cast((1000 * count(DISTINCT g)) // count(*) AS bigint) AS distinct_milli
FROM g GROUP BY n
"""
QUERIES["corpus_diversity"] = corpus_diversity


def corpus_diversity_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog twin of :func:`corpus_diversity` — the form the
    mode-collapse check actually runs at 100 TB, where the exact
    distinct-gram shuffle IS the dominant cost: ``approx_count_distinct``
    sketches are mergeable, so the distinct-n estimate aggregates
    map-side partial HLLs and ships O(sketch) bytes per partition
    instead of shuffling every distinct gram.

    Same gate pattern as ``distinct_sketch`` (VERDICT r10 task 3): the
    raw HLL estimate is engine- and partitioning-specific, so the
    certified row carries the DETERMINATE facts — the exact counts plus
    a boolean that the estimate landed within 3× the configured relative
    standard deviation (rsd=0.02 → 6%).  A drifting or broken sketch
    flips the driver row red; raw estimates are asserted numerically in
    tests/test_llm_ops.py.  (The exact countDistinct here exists to
    CERTIFY the sketch — production at scale runs the approx column
    alone.)
    """
    return _diversity_grams(load_table(spark, sf_dir, "documents")).groupBy(
        "n"
    ).agg(
        F.count("*").cast("long").alias("total_ngrams"),
        F.countDistinct("g").cast("long").alias("distinct_ngrams"),
        F.approx_count_distinct("g", rsd=0.02).alias("approx"),
    ).select(
        "n",
        "total_ngrams",
        "distinct_ngrams",
        (
            F.abs(F.col("approx") - F.col("distinct_ngrams"))
            <= F.col("distinct_ngrams") * F.lit(0.06)
        ).alias("sketch_within_tol"),
    )


ORACLES["corpus_diversity_sketch"] = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
),
g AS (
  SELECT n,
         unnest(list_transform(
           range(1, len(ws) - n + 2),
           i -> array_to_string(ws[i:i + n - 1], ' '))) AS g
  FROM w, (SELECT unnest(range(1, {DIVERSITY_MAX_N + 1})) AS n)
  WHERE len(ws) >= n
)
SELECT cast(n AS bigint) AS n,
       cast(count(*) AS bigint) AS total_ngrams,
       cast(count(DISTINCT g) AS bigint) AS distinct_ngrams,
       true AS sketch_within_tol
FROM g GROUP BY n
"""
QUERIES["corpus_diversity_sketch"] = corpus_diversity_sketch


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative vocabulary vs
    cumulative tokens over NESTED corpus prefixes — the curve an
    operator reads to extrapolate tokenizer/vocab budgets to the full
    corpus and to spot unnatural flattening after aggressive dedup.

    "Prefix" is the md5-bucket prefix (buckets ``0..b`` of
    ``split_bucket() % GROWTH_BUCKETS``), not a doc_id sort: nested
    random subsets measure the same growth law, the bucketing reuses
    the single-sourced split-hash contract (so the curve is stable
    under corpus growth and engine-portable), and — unlike an ``ntile``
    over a global ``ORDER BY doc_id`` — it needs no global sort at
    100 TB.  The corpus is tokenized ONCE into the (bucket, word) count
    aggregate — an owned leaf bounded by GROWTH_BUCKETS × vocabulary,
    tiny next to the token stream — and both curve branches (per-bucket
    token totals, per-word first-seen bucket) re-aggregate that leaf
    instead of re-scanning the text.  The cumulative curve is a running
    sum over the GROWTH_BUCKETS bucket rows (the only unpartitioned
    window, bounded at 10 rows by construction).  ``ttr_milli`` is the
    type-token ratio of the prefix in exact milli-units (integer
    division — a rational of integers).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (split_bucket() % GROWTH_BUCKETS).alias("bucket"),
        F.explode(F.split(F.lower("text"), " ", -1)).alias("w"),
    )
    bw = leaf(
        toks.groupBy("bucket", "w").agg(
            F.count("*").cast("long").alias("c")
        )
    )
    per_bucket = bw.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("n_tokens")
    )
    first_seen = bw.groupBy("w").agg(F.min("bucket").alias("bucket"))
    new_words = first_seen.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_new")
    )
    # bounded global window: exactly GROWTH_BUCKETS rows reach it
    wspec = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_bucket.join(new_words, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(wspec).cast("long"))
        .withColumn("cum_vocab", F.sum("n_new").over(wspec).cast("long"))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "cum_tokens",
            "cum_vocab",
            F.expr("(1000 * cum_vocab) div cum_tokens")
            .cast("long")
            .alias("ttr_milli"),
        )
    )


ORACLES["vocab_growth"] = f"""
WITH toks AS (
  SELECT ({SPLIT_BUCKET_SQL}) % {GROWTH_BUCKETS} AS bucket,
         unnest(string_split(lower(text), ' ')) AS w
  FROM documents
),
bt AS (SELECT bucket, count(*) AS n_tokens FROM toks GROUP BY bucket),
fs AS (SELECT w, min(bucket) AS bucket FROM toks GROUP BY w),
nw AS (SELECT bucket, count(*) AS n_new FROM fs GROUP BY bucket)
SELECT cast(b.bucket AS bigint) AS bucket,
       cast(sum(b.n_tokens) OVER (ORDER BY b.bucket) AS bigint) AS cum_tokens,
       cast(sum(coalesce(n.n_new, 0)) OVER (ORDER BY b.bucket) AS bigint)
         AS cum_vocab,
       cast((1000 * sum(coalesce(n.n_new, 0)) OVER (ORDER BY b.bucket))
            // sum(b.n_tokens) OVER (ORDER BY b.bucket) AS bigint)
         AS ttr_milli
FROM bt b LEFT JOIN nw n ON b.bucket = n.bucket
"""
QUERIES["vocab_growth"] = vocab_growth


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail per language)
# ---------------------------------------------------------------------------

CCNET_ACC = 10_000  # GK sketch accuracy (rank error <= n / ACC)
CCNET_RANK_TOL = 0.05  # certification band around each tercile
CCNET_QS = (1.0 / 3.0, 2.0 / 3.0)
# Below this many docs the q +- TOL exact-percentile bracket spans < ~3
# ranks, so it is NOT a guarantee of the sketch contract (a 3-doc
# language's sketch cutpoint is an exact order statistic yet can sit
# outside the interpolated band); small languages certify by min/max
# containment instead, which IS a theorem (approx_percentile returns an
# actual element of the group).
CCNET_MIN_BRACKET_DOCS = 50


def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): per language,
    docs bucket by LM perplexity TERCILES — head (lowest ppl) feeds the
    clean mix, tail gets dropped or down-weighted.  Rides the
    :func:`doc_perplexity` scores and the rfm_segments_approx cutpoint
    discipline: each language's two tercile cutpoints come from
    ``approx_percentile`` (mergeable sketch — no global sort, no rank
    window; the per-lang grouping key makes the aggregate as wide as the
    language mix, not the corpus), broadcast back, and every doc scores by
    comparison against the cutpoints.

    Sketch cutpoints are partition-dependent, so the certified row is
    DETERMINATE facts per language (the rfm_segments_approx convention):
    exact doc count; partition_ok (the three buckets tile the language —
    structurally true for any cutpoints, checked); monotone_ok (bucket
    ppl ranges are disjoint and ordered — a theorem of scoring by value
    comparison, checked on the O(langs x 3) frame); non-decreasing
    cutpoints; and two rank-tolerance booleans bracketing each approx
    cutpoint by the exact percentiles at q +- {CCNET_RANK_TOL} (the
    ``percentile`` reference column exists only for certification; the
    production path never computes it).  Languages below
    {CCNET_MIN_BRACKET_DOCS} docs certify the cutpoints by min/max
    containment instead — the interpolated bracket is not a sketch
    guarantee at tiny n (see the constant's comment), while containment
    is, so the booleans stay theorems at every group size.

    A NULL lang coalesces to the '__null__' sentinel BEFORE grouping
    (ADVICE r14): NULL never equi-joins, so without the sentinel a NULL
    language's docs would form a cuts group that never joins back and
    silently vanish from the Spark output while the oracle still counts
    them."""
    ppl = doc_perplexity(spark, sf_dir).select("doc_id", "ppl")
    langs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("lang", F.lit("__null__")).alias("lang")
    )
    # one pin: the doc_perplexity tail (two joins + per-doc rollup) feeds
    # the cuts aggregate AND the bucket scoring — without it the diamond
    # re-executes per branch (the same recompute doc_perplexity's own
    # pin(doc_pair) exists for)
    scored0 = pin(ppl.join(langs, "doc_id"))
    q1, q2 = CCNET_QS
    band = ", ".join(
        f"{q - CCNET_RANK_TOL}, {q + CCNET_RANK_TOL}" for q in CCNET_QS
    )
    cuts = scored0.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(
            f"approx_percentile(ppl, array({q1}, {q2}), {CCNET_ACC})"
        ).alias("ac"),
        F.expr(f"percentile(ppl, array({band}))").alias("ex"),
        F.min("ppl").alias("mn_all"),
        F.max("ppl").alias("mx_all"),
    )
    scored = scored0.join(F.broadcast(cuts.select("lang", "ac")), "lang")
    bucket = (
        F.when(F.col("ppl") <= F.element_at("ac", 1), F.lit(1))
        .when(F.col("ppl") <= F.element_at("ac", 2), F.lit(2))
        .otherwise(F.lit(3))
    )
    per_bucket = scored.groupBy("lang", bucket.alias("bkt")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.min("ppl").alias("mn"),
        F.max("ppl").alias("mx"),
    )
    tiled = per_bucket.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("bucket_total")
    )
    a, b = per_bucket.alias("a"), per_bucket.alias("b")
    mono = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bkt") < F.col("b.bkt")),
        )
        .groupBy(F.col("a.lang").alias("lang"))
        .agg(F.bool_and(F.col("a.mx") <= F.col("b.mn")).alias("monotone_ok"))
    )

    def ok(i: int):
        lo, hi = F.element_at("ex", 2 * i - 1), F.element_at("ex", 2 * i)
        bracket = (lo <= F.element_at("ac", i)) & (
            F.element_at("ac", i) <= hi
        )
        contained = (F.col("mn_all") <= F.element_at("ac", i)) & (
            F.element_at("ac", i) <= F.col("mx_all")
        )
        return F.when(
            F.col("n_docs") < CCNET_MIN_BRACKET_DOCS, contained
        ).otherwise(bracket)

    return (
        cuts.join(tiled, "lang")
        .join(mono, "lang", "left")
        .select(
            "lang",
            "n_docs",
            (F.col("bucket_total") == F.col("n_docs")).alias("partition_ok"),
            F.coalesce("monotone_ok", F.lit(True)).alias("monotone_ok"),
            (F.element_at("ac", 1) <= F.element_at("ac", 2)).alias(
                "cuts_nondecreasing_ok"
            ),
            ok(1).alias("p33_ok"),
            ok(2).alias("p67_ok"),
        )
    )


# One row per language; every boolean is a determinate fact of the
# construction (see docstring), so the oracle is the closed form.  The
# n_docs predicate mirrors doc_perplexity's >= 2 whitespace tokens gate
# (every such doc emits >= 1 bigram and exactly one ppl row).
ORACLES["ccnet_buckets"] = """
SELECT coalesce(lang, '__null__') AS lang,
       cast(count(*) AS bigint) AS n_docs,
       true AS partition_ok,
       true AS monotone_ok,
       true AS cuts_nondecreasing_ok,
       true AS p33_ok,
       true AS p67_ok
FROM documents
WHERE len(string_split(lower(text), ' ')) >= 2
GROUP BY 1
"""
QUERIES["ccnet_buckets"] = ccnet_buckets


def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 boilerplate rule as a TRANSFORM, not just accounting: the
    cleaned corpus with every repeated sentence removed except its first
    corpus occurrence (Raffel et al. 2020 §2.2 keep-one discipline over
    the engine's naive '.' sentence unit).  :func:`line_dedup` reports
    the per-doc keep statistics; this emits the artifact a training
    pipeline actually writes — ``clean_text`` reassembled from the kept
    sentences in document order (trimmed, '.'-joined; original spacing
    is not preserved, which is the C4 behavior too).

    Same plan as line_dedup plus one order-fixed reassembly: one shuffle
    on the sentence-hash key — carrying the trimmed sentence text
    through it once, since the rebuild needs the text back (line_dedup's
    accounting-only twin ships just the md5) — one shuffle back on
    doc_id, and the rebuild is array_sort(collect_list(struct)) — pos is
    unique per doc, so the sort is total and the concat is
    engine-exact.  Docs whose every sentence loses the keep-first race
    emit an empty string, not a dropped row.
    """
    kept = (F.col("n_occ") == 1) | (F.col("enc") == F.col("first_enc"))
    return (
        _line_occ(load_table(spark, sf_dir, "documents"), with_text=True)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sents"),
            F.sum(F.when(~kept, 1).otherwise(0)).cast("long").alias(
                "n_removed"
            ),
            F.concat_ws(
                ".",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept, F.struct("pos", "ts"))
                        )
                    ),
                    lambda s: s.ts,
                ),
            ).alias("clean_text"),
        )
    )


ORACLES["boilerplate_strip"] = f"""
WITH occ AS (
  SELECT doc_id, pos, trim(sentence) AS ts, md5(trim(sentence)) AS key,
         doc_id * {LINE_ENC} + pos AS enc
  FROM (
    SELECT doc_id,
           unnest(string_split(text, '.')) AS sentence,
           unnest(range(len(string_split(text, '.')))) AS pos
    FROM documents
  )
  WHERE trim(sentence) <> ''
),
stats AS (
  SELECT key, cast(count(*) AS bigint) AS n_occ, min(enc) AS first_enc
  FROM occ GROUP BY key
)
SELECT o.doc_id,
       cast(count(*) AS bigint) AS n_sents,
       cast(sum(CASE WHEN s.n_occ > 1 AND o.enc <> s.first_enc
                     THEN 1 ELSE 0 END) AS bigint) AS n_removed,
       coalesce(string_agg(CASE WHEN s.n_occ = 1 OR o.enc = s.first_enc
                                THEN o.ts END, '.' ORDER BY o.pos), '')
         AS clean_text
FROM occ o JOIN stats s USING (key)
GROUP BY o.doc_id
"""
QUERIES["boilerplate_strip"] = boilerplate_strip


def doc_repetition_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated-span trim as a TRANSFORM (VERDICT r15
    task 6): the Gopher/CCNet cleaning stage a pipeline runs BEFORE
    corpus-level dedup — inside each document, keep the first occurrence
    of every distinct '.'-sentence and drop later repeats (templated
    spam, decoding loops, copy-pasted paragraphs).  :func:`doc_repetition`
    measures the repetition; this emits the trimmed artifact.  One row
    per document: (doc_id, n_sents, n_removed, clean_text), clean_text
    reassembled from the kept sentences in document order (trimmed,
    '.'-joined — the :func:`boilerplate_strip` convention).

    Scale shape: the rule is document-LOCAL, so unlike the corpus-level
    keep-first (one sentence-hash shuffle) this is a pure ZERO-shuffle
    projection over the scan — ``transform``/``filter`` array math per
    row, embarrassingly parallel at any corpus size.  The keep test is
    ``array_position(ts, s) == i+1`` (first index of the sentence within
    the doc's own sentence array), O(sents²) per row — fine for
    training-doc sizes; a document long enough to break that bound
    belongs to the corpus-level ``_line_occ`` path partitioned by
    doc_id, not a row-local kernel.  Docs with no non-empty sentence
    emit (0, 0, '') rather than vanishing.
    """
    docs = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split("text", "\\."), lambda s: F.trim(s)),
        lambda ts: ts != "",
    )
    staged = docs.select("doc_id", sents.alias("ts"))
    kept = F.filter(
        F.col("ts"),
        lambda ts, i: F.array_position(F.col("ts"), ts) == i + F.lit(1),
    )
    return staged.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_sents"),
        (F.size("ts") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(".", kept).alias("clean_text"),
    )


ORACLES["doc_repetition_strip"] = """
WITH occ AS (
  SELECT doc_id, pos, trim(sentence) AS ts
  FROM (
    SELECT doc_id,
           unnest(string_split(text, '.')) AS sentence,
           unnest(range(len(string_split(text, '.')))) AS pos
    FROM documents
  )
  WHERE trim(sentence) <> ''
),
marked AS (
  SELECT doc_id, pos, ts,
         min(pos) OVER (PARTITION BY doc_id, ts) AS first_pos
  FROM occ
),
agg AS (
  SELECT doc_id,
         cast(count(*) AS bigint) AS n_sents,
         cast(sum(CASE WHEN pos <> first_pos THEN 1 ELSE 0 END) AS bigint)
           AS n_removed,
         coalesce(string_agg(CASE WHEN pos = first_pos THEN ts END,
                             '.' ORDER BY pos), '') AS clean_text
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_sents, 0) AS n_sents,
       coalesce(a.n_removed, 0) AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
QUERIES["doc_repetition_strip"] = doc_repetition_strip
