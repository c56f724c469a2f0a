"""Shared column expressions and cross-engine-deterministic helpers.

Everything here is chosen so the identical value is computable in both
Spark SQL and DuckDB (the correctness oracle):

- tokenization via ``regexp_extract_all`` + ``lower`` (reference semantics:
  ``re.findall('[a-zA-Z]+', s)`` then ``.lower()``, BigdataProjectCode.py:66/365);
- the NLTK English stopword list inlined as a constant (Spark's default
  ``StopWordsRemover`` list differs — SURVEY.md §2.2 P6);
- a light, rule-based lemmatizer (the container has no NLTK; rules are pure
  regexp so the oracle can replicate them bit-for-bit — stands in for the
  reference's WordNet noun-mode lemmatize, BigdataProjectCode.py:51/68/362);
- md5 as the only hash primitive (identical hex output in Spark and DuckDB,
  unlike murmur3 ``hash()`` which differs between engines) — the basis of the
  MinHash / SimHash / fingerprint operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# NLTK English stopword list (public corpus, nltk.corpus.stopwords.words
# ('english')).  The reference loads this at BigdataProjectCode.py:36.
# Inlined so executors never need the NLTK download and so the DuckDB oracle
# can use the identical list.
STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom", "this",
    "that", "that'll", "these", "those", "am", "is", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "having", "do", "does",
    "did", "doing", "a", "an", "the", "and", "but", "if", "or", "because",
    "as", "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before", "after",
    "above", "below", "to", "from", "up", "down", "in", "out", "on", "off",
    "over", "under", "again", "further", "then", "once", "here", "there",
    "when", "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not", "only",
    "own", "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll", "m",
    "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn", "couldn't",
    "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't", "hasn",
    "hasn't", "haven", "haven't", "isn", "isn't", "ma", "mightn",
    "mightn't", "mustn", "mustn't", "needn", "needn't", "shan", "shan't",
    "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't", "won",
    "won't", "wouldn", "wouldn't",
)


def sql_string_list(values: tuple[str, ...] | list[str]) -> str:
    """Render a list of strings as a SQL ``('a','b',...)`` literal."""
    quoted = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    return f"({quoted})"


STOPWORDS_SQL = sql_string_list(STOPWORDS)


def alpha_tokens(col: Column) -> Column:
    """``re.findall('[a-zA-Z]+', s)`` then lowercase each token (F4+F5)."""
    return F.transform(
        F.expr(f"regexp_extract_all({col._jc.toString()}, '[A-Za-z]+', 0)"),
        lambda w: F.lower(w),
    )


def alpha_tokens_expr(colname: str) -> Column:
    """Same as :func:`alpha_tokens` but from a column name (avoids _jc)."""
    return F.expr(
        f"transform(regexp_extract_all({colname}, '[A-Za-z]+', 0), w -> lower(w))"
    )


# --- light lemmatizer ------------------------------------------------------
# Deterministic suffix rules approximating WordNet noun-mode lemmatization
# for regular plurals.  First matching rule wins; identical CASE logic is
# emitted for the DuckDB oracle by lemma_sql().
def lemma_light(col: Column) -> Column:
    return (
        F.when(
            col.rlike("ies$") & (F.length(col) > 4),
            F.regexp_replace(col, "ies$", "y"),
        )
        .when(col.rlike("sses$"), F.regexp_replace(col, "sses$", "ss"))
        .when(
            col.rlike("[^su]s$") & (F.length(col) > 3),
            F.regexp_replace(col, "s$", ""),
        )
        .otherwise(col)
    )


def lemma_sql(expr: str) -> str:
    """DuckDB CASE expression computing exactly lemma_light(expr)."""
    return (
        "(CASE "
        f"WHEN regexp_matches({expr}, 'ies$') AND length({expr}) > 4 "
        f"THEN regexp_replace({expr}, 'ies$', 'y') "
        f"WHEN regexp_matches({expr}, 'sses$') "
        f"THEN regexp_replace({expr}, 'sses$', 'ss') "
        f"WHEN regexp_matches({expr}, '[^su]s$') AND length({expr}) > 3 "
        f"THEN regexp_replace({expr}, 's$', '') "
        f"ELSE {expr} END)"
    )


def r6(col: Column) -> Column:
    """Round a double to 6 dp — the cross-engine float-compare contract."""
    return F.round(col.cast("double"), 6)


def r2(col: Column) -> Column:
    """Round money-scale aggregates to 2 dp."""
    return F.round(col.cast("double"), 2)


def sum2dp(col: Column) -> Column:
    """Order-independent exact sum of a 2-decimal column.

    Summing doubles is order-dependent (partial aggregation merges differ
    between engines and runs), which lands on rounding boundaries at scale
    — observed as 6th-decimal mismatches at sf0.1.  Summing integer cents
    is exact in both Spark and DuckDB (< 2^53), and the single final
    division is deterministic.  SQL twin: ``SUM2DP_SQL``.
    """
    return F.sum(F.round(col * 100).cast("long")) / F.lit(100.0)


def sum2dp_sql(expr: str) -> str:
    return f"(sum(cast(round({expr} * 100) AS bigint)) / 100.0)"


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, JVM-side (no UDF).

    ``zip_with`` + ``aggregate`` stays inside codegen; accumulation is
    left-to-right, matching DuckDB's list_dot_product order so rounded
    values agree.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
