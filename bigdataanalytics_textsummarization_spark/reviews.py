"""The reference's end-to-end user workflow on its native TSV review format.

A user of the reference runs two pipelines over a directory of
``<product_id>.txt`` TSV files (BigData-Final.pdf p.2 §IV.B;
BigdataProjectCode.py entry points §3.1-3.2 in SURVEY.md):

- ``LSA(spark, path).ReviewsSummary()``  -> here: :func:`lsa_review_summary`
- ``DataParser.parser()`` + ``TextRank.computeSummary()``
                                         -> here: :func:`textrank_review_summary`

Both are thin compositions of the DataFrame cores (text/graph/pagerank/lsa),
so the exact same operators serve the synthetic corpus, the reference's TSV
reviews, or any (id, source, text) dataset.  One multi-file scan replaces
the reference's per-file driver loop (code:261-263/417-419); everything
downstream is a single distributed plan per pipeline — no collect(), no
per-sentence lookup() jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import lemma_light, lemma_wordnet
from .graph import edges_from
from .io import read_reviews_tsv
from .lsa import lsa_concepts_from, tfidf_long_from
from .pagerank import ranks_from, top_sentences_from
from .text import (
    lsa_sentences_from,
    sentences_from,
    tokens_lsa_from,
    tokens_textrank_from,
)

# The reference lemmatizes review tokens with NLTK's WordNetLemmatizer
# (code:51/68/362/366); True selects the WordNet-parity lemmatizer so a
# reference user gets matching tokens (hence TF-IDF, concepts, and ranks).
# False falls back to the regular-plural rules (the SQL-twin used by the
# oracle-gated synthetic-corpus queries).
WORDNET_LEMMAS = True


def _lemma():
    return lemma_wordnet if WORDNET_LEMMAS else lemma_light


def review_sentences(reviews: DataFrame) -> DataFrame:
    """D2 for reviews: sentence_id = ``<review_id>_<pos>``, corpus key =
    product_id (the reference treats one product file as one corpus)."""
    base = reviews.select(
        F.col("review_id").alias("doc_id"),
        F.col("product_id").alias("source"),
        F.col("review_body").alias("text"),
    )
    return sentences_from(base)


def lsa_review_summary(spark: SparkSession, path: str) -> DataFrame:
    """Reference entry point 1: per-product LSA concepts (5 concepts x
    3 sentences + 3 keywords), one distributed plan."""
    sent = review_sentences(read_reviews_tsv(spark, path))
    toks = tokens_lsa_from(sent, lemma=_lemma())
    tfidf = tfidf_long_from(toks, lsa_sentences_from(sent))
    concepts = lsa_concepts_from(tfidf)
    text = sent.select(F.col("sentence_id").alias("item"), "sentence")
    return (
        concepts.join(text, "item", "left")
        .select(
            "source",
            "concept",
            "kind",
            "rk",
            "item",
            "weight",
            F.when(F.col("kind") == "sentence", F.col("sentence")).alias("sentence"),
        )
    )


def review_rouge_sweep(spark: SparkSession, path: str, k: int = 5) -> DataFrame:
    """Per-product ROUGE-1/2 means — the reference's all-products sweep
    shape (M6, code:258-288, Fig-8) on the TSV review format.

    The reference scores generated summaries against pytldr goldens (M4,
    out of scope per SURVEY §5); here the TextRank top-k summary is scored
    against the LSA summary sentences per product, which exercises the
    same per-corpus pairing + stemmed scorer + per-product mean shape.
    One distributed plan: both summaries, one join on source, the Arrow
    ROUGE kernel, a per-source aggregate.
    """
    from .rouge import rouge_n_from

    tr = textrank_review_summary(spark, path, k=k)
    lsa = lsa_review_summary(spark, path)
    # collect_list order is partitioning-dependent; ROUGE-2 bigrams straddle
    # sentence-join boundaries, so sort by rank inside the aggregate to keep
    # the score deterministic across runs
    def ordered_text(*keys: str) -> Column:
        return F.concat_ws(
            ". ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(*keys, "sentence"))),
                lambda s: s["sentence"],
            ),
        )

    cand = tr.groupBy("source").agg(ordered_text("rk").alias("cand_text"))
    ref = (
        lsa.filter(F.col("kind") == "sentence")
        .groupBy("source")
        .agg(ordered_text("concept", "rk").alias("ref_text"))
    )
    pairs = cand.join(ref, "source").select(
        F.col("source").alias("pair_id"), "cand_text", "ref_text"
    )
    scored = rouge_n_from(pairs, stemmed=True)
    return scored.select(
        F.col("pair_id").alias("source"),
        "rouge1_p", "rouge1_r", "rouge1_f",
        "rouge2_p", "rouge2_r", "rouge2_f",
    )


def textrank_review_summary(spark: SparkSession, path: str, k: int = 5) -> DataFrame:
    """Reference entry point 2: per-product TextRank top-k sentences
    (damping 0.85, 5 iterations, init 0.15 — reference semantics)."""
    sent = review_sentences(read_reviews_tsv(spark, path))
    edges = edges_from(tokens_textrank_from(sent, lemma=_lemma()))
    ranks = ranks_from(edges)
    return top_sentences_from(ranks, sent, k=k)
