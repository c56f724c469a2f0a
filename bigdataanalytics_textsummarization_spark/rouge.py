"""ROUGE evaluation operators (SURVEY.md §2.12 M5, FIXTURES.md F8).

The reference calls the ``rouge-score`` library on the driver over
positionally-zipped candidate/reference pairs (BigdataProjectCode.py:
184-202).  Here ROUGE-N is computed *distributed*: each candidate/reference
pair is one row, and the whole metric is row-local — the only shuffle in
any plan is the small pair equi-join.

Two physical paths, one specification:
- ``rouge_n`` (production): an Arrow-batched ``mapInPandas`` kernel
  (Counter-based clipped overlap).  Row-local metric arithmetic is exactly
  the case where a vectorized Python kernel beats Catalyst expressions:
  the pure-expression formulation below relies on higher-order array
  functions, which Spark evaluates interpreted AND whose large expression
  tree costs ~3 s of whole-stage-codegen compilation per cold run —
  measured 6x slower end-to-end than the Arrow kernel at sf0.1 despite
  doing identical work.  The kernel scales embarrassingly (no shuffle, no
  state; one linear pass per pair).
- ``rouge_n_relational``: the same metric as pure JVM array expressions in
  narrow projections (no explode, no aggregation shuffle) — the
  SQL-expressible specification.  Both paths are gated against the same
  DuckDB oracle SQL, so their exact-value equivalence is re-verified by
  the driver every round.

ROUGE-L needs an LCS, which no relational operator expresses — it is a
pandas UDF by necessity (Arrow-batched, linear scan per pair).

Stemming parity (M5): the reference scorer stems tokens (use_stemmer=True,
code:183).  ``rouge_n_stemmed`` / ``rouge_sweep_stemmed`` are the faithful
configuration and are value-gated — the Porter stemmer itself is compiled
to DuckDB SQL (porter_sql.py) so the oracle stems with the same rules.
The unstemmed ``rouge_n`` remains as the tokenization-only baseline.

Pair construction for the synthetic corpus: candidate = even doc_id,
reference = the following odd doc_id (pair_id = doc_id / 2) — the
positional-pairing analog of the reference's ``zip``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import r6
from .io import load_table
from .porter_sql import STEM_DICT_CTES


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        F.col("text").alias("cand_text"),
    )
    ref = docs.filter(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("pair_id"),
        F.col("text").alias("ref_text"),
    )
    return cand.join(ref, "pair_id")


def _stem_tokens_udf():
    """Arrow-batched pandas UDF: lowercase alpha-num tokens, Porter-stemmed
    (the reference scores ROUGE with use_stemmer=True, code:183)."""
    import re

    from .porter import stem

    @F.pandas_udf("array<string>")
    def stem_tokens(s: pd.Series) -> pd.Series:
        tok = re.compile(r"[a-z0-9]+")
        return s.map(lambda t: [stem(w) for w in tok.findall(t.lower())])

    return stem_tokens


def _gram_array(arr, n: int):
    """Array of positional n-grams of a token array, as a column expression
    (row-local, no explode)."""
    if n == 1:
        return arr
    return F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _clipped_match(gc, gr):
    """Clipped n-gram overlap sum_g min(count_c(g), count_r(g)), computed
    row-locally with higher-order functions.  ``array_intersect`` yields the
    distinct common grams; per gram the two occurrence counts are re-counted
    with ``filter`` — O(|common| * (|gc|+|gr|)) per row, trivial at review/
    document sentence lengths and free of any shuffle."""
    return F.aggregate(
        F.array_intersect(gc, gr),
        F.lit(0),
        lambda acc, g: acc
        + F.least(
            F.size(F.filter(gc, lambda x: x == g)),
            F.size(F.filter(gr, lambda x: x == g)),
        ),
    )


def _prf(df: DataFrame, n: int) -> DataFrame:
    """P/R/F columns from staged (m{n}, ct{n}, rt{n}) attribute columns.

    Each stage references the previous stage's columns as plain attributes
    — never re-nesting the expensive match expression.  CollapseProject
    only inlines cheap or single-use expressions, so the optimized plan
    evaluates every sub-expression exactly once and the logical tree stays
    linear (a single nested select duplicated the clipped-match HOF tree
    ~8x per n, costing seconds of analyzer/codegen time per run).
    """
    m, ct, rt = F.col(f"m{n}"), F.col(f"ct{n}"), F.col(f"rt{n}")
    df = df.withColumns(
        {
            f"p{n}": F.when(ct > F.lit(0), m / ct).otherwise(F.lit(0.0)),
            f"r{n}": F.when(rt > F.lit(0), m / rt).otherwise(F.lit(0.0)),
        }
    )
    p, r = F.col(f"p{n}"), F.col(f"r{n}")
    return df.withColumns(
        {
            f"match{n}": m.cast("long"),
            f"rouge{n}_p": r6(p),
            f"rouge{n}_r": r6(r),
            f"rouge{n}_f": r6(
                F.when(
                    (p + r) > F.lit(0), 2 * p * r / (p + r)
                ).otherwise(F.lit(0.0))
            ),
        }
    )


_ROUGE_N_SCHEMA = T.StructType(
    [T.StructField("pair_id", T.LongType())]
    + [
        T.StructField(name, dtype)
        for n in (1, 2)
        for name, dtype in (
            (f"match{n}", T.LongType()),
            (f"rouge{n}_p", T.DoubleType()),
            (f"rouge{n}_r", T.DoubleType()),
            (f"rouge{n}_f", T.DoubleType()),
        )
    ]
)


def _rouge_n_arrow(
    spark: SparkSession, sf_dir: str, stemmed: bool = False
) -> DataFrame:
    """ROUGE-1 + ROUGE-2 per pair via an Arrow-batched row-local kernel.

    Clipped overlap ``sum_g min(count_c(g), count_r(g))`` with hash
    Counters — O(tokens) per pair.  Identical values to the relational
    formulation (same tokenization, same 6-dp rounding; exact ties at the
    6th decimal are impossible for ratios of small integers, so Python and
    SQL rounding agree), which the shared oracle SQL re-checks each round.
    """
    return rouge_n_from(_pairs(spark, sf_dir), stemmed=stemmed)


def rouge_n_from(pairs: DataFrame, stemmed: bool = False) -> DataFrame:
    """Score any (pair_id, cand_text, ref_text) frame with the Arrow
    kernel; pair_id may be any type (it is passed through unchanged)."""
    import re

    from collections import Counter

    use_stem = stemmed
    key_field = pairs.schema["pair_id"]
    out_schema = T.StructType([key_field] + _ROUGE_N_SCHEMA.fields[1:])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = re.compile(r"[a-z0-9]+")
        if use_stem:
            from .porter import stem as _stem

        def toks(t: str) -> list[str]:
            ws = tok.findall(t.lower())
            return [_stem(w) for w in ws] if use_stem else ws

        for pdf in batches:
            rows = []
            for pid, cand, ref in zip(
                pdf["pair_id"], pdf["cand_text"], pdf["ref_text"]
            ):
                a, b = toks(cand), toks(ref)
                row: list = [pid]
                for n in (1, 2):
                    ga = (
                        [" ".join(a[i : i + n]) for i in range(len(a) - n + 1)]
                        if len(a) >= n
                        else []
                    )
                    gb = (
                        [" ".join(b[i : i + n]) for i in range(len(b) - n + 1)]
                        if len(b) >= n
                        else []
                    )
                    cb = Counter(gb)
                    m = sum(
                        min(c, cb[g]) for g, c in Counter(ga).items() if g in cb
                    )
                    p = m / len(ga) if ga else 0.0
                    r = m / len(gb) if gb else 0.0
                    f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
                    row += [m, (round(p, 6) + 0.0), (round(r, 6) + 0.0), (round(f, 6) + 0.0)]
                rows.append(tuple(row))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return pairs.mapInPandas(score, schema=out_schema)


def _rouge_multi_n(
    spark: SparkSession, sf_dir: str, stemmed: bool = False
) -> DataFrame:
    """ROUGE-1 + ROUGE-2 per pair as pure JVM array expressions.

    Both texts of a pair live in one row after the pair join, so the whole
    metric — tokenize, n-gram, clipped overlap, P/R/F — is computed with
    JVM higher-order array expressions staged through narrow projections.
    No explode, no groupBy, no pivot: the only shuffle in the plan is the
    small pair equi-join.  (An earlier revision exploded four n-gram
    streams through two aggregations and a pivot; at sf0.1 that spent ~5 s
    in stage overhead for ~50-token documents.)  This is the relational
    *specification*; the production entry point is the Arrow kernel
    (module docstring) — HOF interpretation + codegen compile time make
    this path ~6x slower cold at sf0.1.
    """
    pairs = _pairs(spark, sf_dir)
    if stemmed:
        stemmer = _stem_tokens_udf()
        df = pairs.select(
            "pair_id",
            stemmer(F.col("cand_text")).alias("ca"),
            stemmer(F.col("ref_text")).alias("ra"),
        )
    else:
        df = pairs.select(
            "pair_id",
            F.expr(
                "regexp_extract_all(lower(cand_text), '[a-z0-9]+', 0)"
            ).alias("ca"),
            F.expr(
                "regexp_extract_all(lower(ref_text), '[a-z0-9]+', 0)"
            ).alias("ra"),
        )
    for n in (1, 2):
        df = df.withColumns(
            {
                f"gc{n}": _gram_array(F.col("ca"), n),
                f"gr{n}": _gram_array(F.col("ra"), n),
            }
        )
        gc, gr = F.col(f"gc{n}"), F.col(f"gr{n}")
        df = df.withColumns(
            {
                f"m{n}": _clipped_match(gc, gr),
                f"ct{n}": F.size(gc),
                f"rt{n}": F.size(gr),
            }
        )
        df = _prf(df, n)
    return df.select(
        "pair_id",
        *[
            c
            for n in (1, 2)
            for c in (
                f"match{n}",
                f"rouge{n}_p",
                f"rouge{n}_r",
                f"rouge{n}_f",
            )
        ],
    )


def rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 + ROUGE-2 per pair — production path (Arrow kernel)."""
    return _rouge_n_arrow(spark, sf_dir)


def rouge_n_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 + ROUGE-2 per pair as pure Catalyst expressions (no UDF) —
    the SQL-checkable specification of ``rouge_n``."""
    return _rouge_multi_n(spark, sf_dir)


def rouge_n_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/2 with Porter stemming — the reference's use_stemmer=True
    configuration (code:183).  Same Arrow kernel with per-token Porter
    stemming; value-gated against the SQL-compiled Porter oracle
    (porter_sql.py)."""
    return _rouge_n_arrow(spark, sf_dir, stemmed=True)


_ROUGE_L_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("lcs", T.LongType()),
        T.StructField("rougeL_p", T.DoubleType()),
        T.StructField("rougeL_r", T.DoubleType()),
        T.StructField("rougeL_f", T.DoubleType()),
    ]
)


def _lcs_len(a: list[str], b: list[str]) -> int:
    """Classic O(len(a)*len(b)) LCS with O(min) memory."""
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_sweep_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source average ROUGE-1/2 F with Porter stemming — the sweep at
    the reference's actual scorer configuration (use_stemmer=True)."""
    return _sweep_from(spark, sf_dir, _rouge_n_arrow(spark, sf_dir, stemmed=True))


def rouge_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source average ROUGE-1/2 F — the reference's all-products sweep
    (M6, BigdataProjectCode.py:258-288, Fig-8), computed per-corpus
    correctly (the reference's stale-variable bug compares product 1's
    candidate summaries against every product, SURVEY.md §2.12 — documented,
    not replicated).

    Averages are exact integer-micros sums (per-pair F values are already
    rounded to 6dp), so the result is order-independent across engines.
    """
    return _sweep_from(spark, sf_dir, _rouge_n_arrow(spark, sf_dir))


def _sweep_from(
    spark: SparkSession, sf_dir: str, per_pair: DataFrame
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        "source",
        F.col("doc_id").alias("__d"),
    ).filter(F.col("__d") % 2 == 0)
    return (
        per_pair.join(docs.drop("__d"), "pair_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (
                F.sum(F.round(F.col("rouge1_f") * 1e6).cast("long"))
                / (F.count("*") * F.lit(1e6))
            ).alias("avg_rouge1_f"),
            (
                F.sum(F.round(F.col("rouge2_f") * 1e6).cast("long"))
                / (F.count("*") * F.lit(1e6))
            ).alias("avg_rouge2_f"),
        )
    )


def rouge_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L per pair via an Arrow-batched pandas UDF (LCS is not
    relational).  Distributed by pair — each worker handles whole pairs."""
    import re

    pairs = _pairs(spark, sf_dir)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            rows = []
            for pid, cand, ref in zip(
                pdf["pair_id"], pdf["cand_text"], pdf["ref_text"]
            ):
                a = tok.findall(cand.lower())
                b = tok.findall(ref.lower())
                l = _lcs_len(a, b)
                p = l / len(a) if a else 0.0
                r = l / len(b) if b else 0.0
                f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
                rows.append(
                    (int(pid), int(l), (round(p, 6) + 0.0), (round(r, 6) + 0.0), (round(f, 6) + 0.0))
                )
            yield pd.DataFrame(
                rows, columns=["pair_id", "lcs", "rougeL_p", "rougeL_r", "rougeL_f"]
            )

    return pairs.mapInPandas(score, schema=_ROUGE_L_SCHEMA)


def _ngram_cte(side: str, n: int) -> str:
    """DuckDB CTE producing ({side}_grams) of n-grams with counts."""
    lead_cols = ["w"] + [
        f"lead(w, {i}) OVER (PARTITION BY pair_id ORDER BY pos)" for i in range(1, n)
    ]
    concat = " || ' ' || ".join(lead_cols)
    qualify = (
        f"QUALIFY lead(w, {n - 1}) OVER (PARTITION BY pair_id ORDER BY pos) IS NOT NULL"
        if n > 1
        else ""
    )
    return f"""
{side}{n}_toks AS (
  SELECT pair_id, unnest(regexp_extract_all(lower({side}_text), '[a-z0-9]+')) AS w,
         unnest(range(len(regexp_extract_all(lower({side}_text), '[a-z0-9]+')))) AS pos
  FROM pairs
),
{side}{n}_grams AS (
  SELECT pair_id, g, count(*) AS cnt FROM (
    SELECT pair_id, {concat} AS g FROM {side}{n}_toks {qualify}
  ) GROUP BY pair_id, g
)
"""


def _rouge_n_sql(n: int) -> str:
    return f"""
m{n} AS (
  SELECT c.pair_id, sum(least(c.cnt, r.cnt)) AS m
  FROM cand{n}_grams c JOIN ref{n}_grams r
    ON c.pair_id = r.pair_id AND c.g = r.g
  GROUP BY c.pair_id
),
ct{n} AS (SELECT pair_id, sum(cnt) AS t FROM cand{n}_grams GROUP BY pair_id),
rt{n} AS (SELECT pair_id, sum(cnt) AS t FROM ref{n}_grams GROUP BY pair_id),
s{n} AS (
  SELECT p.pair_id,
         coalesce(m{n}.m, 0) AS m,
         coalesce(ct{n}.t, 0) AS ct,
         coalesce(rt{n}.t, 0) AS rt
  FROM pairs p
  LEFT JOIN m{n} ON p.pair_id = m{n}.pair_id
  LEFT JOIN ct{n} ON p.pair_id = ct{n}.pair_id
  LEFT JOIN rt{n} ON p.pair_id = rt{n}.pair_id
),
r{n}_out AS (
  SELECT pair_id, cast(m AS bigint) AS match{n},
         (round(CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END, 6) + 0.0) AS rouge{n}_p,
         (round(CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END, 6) + 0.0) AS rouge{n}_r,
         (round(CASE WHEN (CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END)
                       + (CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END) > 0
               THEN 2 * (CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END)
                      * (CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END)
                    / ((CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END)
                       + (CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END))
               ELSE 0 END, 6) + 0.0) AS rouge{n}_f
  FROM s{n}
)
"""


PAIRS_CTE = """
pairs AS (
  SELECT cast(c.doc_id / 2 AS bigint) AS pair_id,
         c.text AS cand_text, r.text AS ref_text
  FROM documents c
  JOIN documents r ON r.doc_id = c.doc_id + 1
  WHERE c.doc_id % 2 = 0
)
"""

# Stemmed variant: tokenize both sides once, stem the DISTINCT vocabulary
# through the pure-SQL Porter chain (porter_sql.py), then rebuild positional
# token streams from the stem dictionary — the gram/score CTEs are reused
# unchanged on the stemmed tokens.
_STEM_TOKS_CTE = f"""
raw_toks AS MATERIALIZED (
  SELECT pair_id, 'c' AS side,
         unnest(regexp_extract_all(lower(cand_text), '[a-z0-9]+')) AS w,
         unnest(range(len(regexp_extract_all(lower(cand_text), '[a-z0-9]+')))) AS pos
  FROM pairs
  UNION ALL
  SELECT pair_id, 'r',
         unnest(regexp_extract_all(lower(ref_text), '[a-z0-9]+')),
         unnest(range(len(regexp_extract_all(lower(ref_text), '[a-z0-9]+'))))
  FROM pairs
),
vocab AS MATERIALIZED (SELECT DISTINCT w AS orig FROM raw_toks),
{STEM_DICT_CTES},
stoks AS MATERIALIZED (
  SELECT t.pair_id, t.side, t.pos, s.stem AS w
  FROM raw_toks t JOIN stems s ON t.w = s.orig
)
"""


def _ngram_cte_stemmed(side: str, n: int) -> str:
    """Gram CTE over the stemmed token stream (same shape as _ngram_cte)."""
    sidechar = "c" if side == "cand" else "r"
    lead_cols = ["w"] + [
        f"lead(w, {i}) OVER (PARTITION BY pair_id ORDER BY pos)"
        for i in range(1, n)
    ]
    concat = " || ' ' || ".join(lead_cols)
    qualify = (
        f"QUALIFY lead(w, {n - 1}) OVER (PARTITION BY pair_id ORDER BY pos) IS NOT NULL"
        if n > 1
        else ""
    )
    return f"""
{side}{n}_grams AS MATERIALIZED (
  SELECT pair_id, g, count(*) AS cnt FROM (
    SELECT pair_id, {concat} AS g FROM stoks WHERE side = '{sidechar}' {qualify}
  ) GROUP BY pair_id, g
)"""


ORACLES: dict[str, str] = {
    "rouge_n": f"""
WITH {PAIRS_CTE},
{_ngram_cte("cand", 1)}, {_ngram_cte("ref", 1)},
{_ngram_cte("cand", 2)}, {_ngram_cte("ref", 2)},
{_rouge_n_sql(1)}, {_rouge_n_sql(2)}
SELECT r1_out.pair_id,
       r1_out.match1, r1_out.rouge1_p, r1_out.rouge1_r, r1_out.rouge1_f,
       r2_out.match2, r2_out.rouge2_p, r2_out.rouge2_r, r2_out.rouge2_f
FROM r1_out JOIN r2_out ON r1_out.pair_id = r2_out.pair_id
""",
    "rouge_sweep": f"""
WITH {PAIRS_CTE},
{_ngram_cte("cand", 1)}, {_ngram_cte("ref", 1)},
{_ngram_cte("cand", 2)}, {_ngram_cte("ref", 2)},
{_rouge_n_sql(1)}, {_rouge_n_sql(2)},
per_pair AS (
  SELECT r1_out.pair_id, r1_out.rouge1_f, r2_out.rouge2_f
  FROM r1_out JOIN r2_out ON r1_out.pair_id = r2_out.pair_id
),
src AS (
  SELECT cast(doc_id / 2 AS bigint) AS pair_id, source
  FROM documents WHERE doc_id % 2 = 0
)
SELECT s.source, count(*) AS n_pairs,
       sum(cast(round(p.rouge1_f * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_rouge1_f,
       sum(cast(round(p.rouge2_f * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_rouge2_f
FROM per_pair p JOIN src s ON p.pair_id = s.pair_id
GROUP BY s.source
""",
}

# Both physical paths answer to the same SQL specification.
ORACLES["rouge_n_relational"] = ORACLES["rouge_n"]

ORACLES["rouge_n_stemmed"] = f"""
WITH {PAIRS_CTE},
{_STEM_TOKS_CTE},
{_ngram_cte_stemmed("cand", 1)}, {_ngram_cte_stemmed("ref", 1)},
{_ngram_cte_stemmed("cand", 2)}, {_ngram_cte_stemmed("ref", 2)},
{_rouge_n_sql(1)}, {_rouge_n_sql(2)}
SELECT r1_out.pair_id,
       r1_out.match1, r1_out.rouge1_p, r1_out.rouge1_r, r1_out.rouge1_f,
       r2_out.match2, r2_out.rouge2_p, r2_out.rouge2_r, r2_out.rouge2_f
FROM r1_out JOIN r2_out ON r1_out.pair_id = r2_out.pair_id
"""

ORACLES["rouge_sweep_stemmed"] = f"""
WITH {PAIRS_CTE},
{_STEM_TOKS_CTE},
{_ngram_cte_stemmed("cand", 1)}, {_ngram_cte_stemmed("ref", 1)},
{_ngram_cte_stemmed("cand", 2)}, {_ngram_cte_stemmed("ref", 2)},
{_rouge_n_sql(1)}, {_rouge_n_sql(2)},
per_pair AS (
  SELECT r1_out.pair_id, r1_out.rouge1_f, r2_out.rouge2_f
  FROM r1_out JOIN r2_out ON r1_out.pair_id = r2_out.pair_id
),
src AS (
  SELECT cast(doc_id / 2 AS bigint) AS pair_id, source
  FROM documents WHERE doc_id % 2 = 0
)
SELECT s.source, count(*) AS n_pairs,
       sum(cast(round(p.rouge1_f * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_rouge1_f,
       sum(cast(round(p.rouge2_f * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_rouge2_f
FROM per_pair p JOIN src s ON p.pair_id = s.pair_id
GROUP BY s.source
"""

# ROUGE-L's LCS as SQL: the classic DP advances one anti-diagonal per
# recursion step — cell (i, j) on diagonal d = i+j needs (i-1, j) and
# (i, j-1) from diagonal d-1 and (i-1, j-1) from d-2, so there is no
# intra-diagonal dependency and a whole diagonal is one pure function of
# the previous two.  State = ONE ROW PER (pair, diagonal): the current and
# previous diagonals as integer lists, advanced with a row-local
# list_transform (out-of-range indexing yields NULL -> coalesce 0, which
# encodes the DP boundary).  No joins inside the recursion — 24x faster
# than the cell-per-row formulation — and the total work is the same DP
# table the Python kernel fills, just expressed relationally, so the
# driver can value-gate the "not SQL-expressible" operator after all.
ORACLES["rouge_l"] = f"""
WITH RECURSIVE {PAIRS_CTE},
ltoks AS MATERIALIZED (
  SELECT pair_id,
         regexp_extract_all(lower(cand_text), '[a-z0-9]+') AS ca,
         regexp_extract_all(lower(ref_text), '[a-z0-9]+') AS ra,
         len(regexp_extract_all(lower(cand_text), '[a-z0-9]+')) AS m,
         len(regexp_extract_all(lower(ref_text), '[a-z0-9]+')) AS n
  FROM pairs
),
dp(pair_id, d, lo, vd, lo1, vd1) AS (
  SELECT pair_id, 0, 0, [0], 0, cast([] AS integer[]) FROM ltoks
  UNION ALL
  SELECT s.pair_id, s.d + 1,
         greatest(0, s.d + 1 - t.n),
         list_transform(
           range(greatest(0, s.d + 1 - t.n), least(t.m, s.d + 1) + 1),
           i -> CASE WHEN i = 0 OR s.d + 1 - i = 0 THEN 0
                ELSE greatest(
                  coalesce(s.vd[i - 1 - s.lo + 1], 0),
                  coalesce(s.vd[i - s.lo + 1], 0),
                  CASE WHEN t.ca[i] = t.ra[s.d + 1 - i]
                       THEN coalesce(s.vd1[i - 1 - s.lo1 + 1], 0) + 1
                       ELSE 0 END)
                END),
         s.lo, s.vd
  FROM dp s JOIN ltoks t USING (pair_id)
  WHERE s.d + 1 <= t.m + t.n
),
lcs_out AS (
  SELECT t.pair_id, t.m, t.n,
         coalesce(f.vd[t.m - f.lo + 1], 0) AS lcs
  FROM ltoks t
  LEFT JOIN dp f ON f.pair_id = t.pair_id AND f.d = t.m + t.n
)
SELECT pair_id, cast(lcs AS bigint) AS lcs,
       (round(CASE WHEN m > 0 THEN lcs * 1.0 / m ELSE 0 END, 6) + 0.0) AS rougeL_p,
       (round(CASE WHEN n > 0 THEN lcs * 1.0 / n ELSE 0 END, 6) + 0.0) AS rougeL_r,
       (round(CASE WHEN (CASE WHEN m > 0 THEN lcs * 1.0 / m ELSE 0 END)
                     + (CASE WHEN n > 0 THEN lcs * 1.0 / n ELSE 0 END) > 0
             THEN 2 * (CASE WHEN m > 0 THEN lcs * 1.0 / m ELSE 0 END)
                    * (CASE WHEN n > 0 THEN lcs * 1.0 / n ELSE 0 END)
                  / ((CASE WHEN m > 0 THEN lcs * 1.0 / m ELSE 0 END)
                     + (CASE WHEN n > 0 THEN lcs * 1.0 / n ELSE 0 END))
             ELSE 0 END, 6) + 0.0) AS rougeL_f
FROM lcs_out
"""

QUERIES = {
    "rouge_n": rouge_n,
    "rouge_n_relational": rouge_n_relational,
    "rouge_sweep": rouge_sweep,
    "rouge_n_stemmed": rouge_n_stemmed,  # gated: Porter compiled to SQL
    "rouge_sweep_stemmed": rouge_sweep_stemmed,
    "rouge_l": rouge_l,  # gated: LCS as a recursive-CTE wavefront
}


# ---------------------------------------------------------------------------
# BLEU (r16): the standard companion metric to ROUGE — modified n-gram
# PRECISION (n=1..4, reference-clipped) with a brevity penalty, instead
# of ROUGE's recall orientation.  Same pair construction, same
# tokenization, same Arrow-kernel production path as rouge_n.
# ---------------------------------------------------------------------------

_BLEU_MAX_N = 4

_BLEU_COMPONENTS_SCHEMA = T.StructType(
    [T.StructField("pair_id", T.LongType())]
    + [
        T.StructField(f"m{n}", T.LongType())
        for n in range(1, _BLEU_MAX_N + 1)
    ]
    + [
        T.StructField(f"t{n}", T.LongType())
        for n in range(1, _BLEU_MAX_N + 1)
    ]
    + [T.StructField("r_len", T.LongType())]
)


def _bleu_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair BLEU components via an Arrow-batched row-local kernel
    (the rouge_n production-path precedent): clipped n-gram matches
    ``m_n`` and candidate n-gram totals ``t_n`` for n=1..4, plus the
    reference length — ALL exact integers, so the downstream score is
    one deterministic expression and the gate certifies the integer
    surface bit-exactly.  Zero shuffle beyond the pair equi-join;
    O(tokens) per pair; embarrassingly parallel at any corpus size."""
    return _bleu_components_from(_pairs(spark, sf_dir))


def _bleu_components_from(pairs: DataFrame) -> DataFrame:
    """The BLEU component kernel over any (pair_id, cand_text, ref_text)
    frame; pair_id may be any type (passed through unchanged — the
    rouge_n_from precedent)."""
    import re

    from collections import Counter

    key_field = pairs.schema["pair_id"]
    out_schema = T.StructType(
        [key_field] + _BLEU_COMPONENTS_SCHEMA.fields[1:]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = re.compile(r"[a-z0-9]+")

        for pdf in batches:
            rows = []
            for pid, cand, ref in zip(
                pdf["pair_id"], pdf["cand_text"], pdf["ref_text"]
            ):
                a = tok.findall(cand.lower())
                b = tok.findall(ref.lower())
                ms, ts = [], []
                for n in range(1, _BLEU_MAX_N + 1):
                    ga = (
                        [" ".join(a[i : i + n]) for i in range(len(a) - n + 1)]
                        if len(a) >= n
                        else []
                    )
                    gb = (
                        [" ".join(b[i : i + n]) for i in range(len(b) - n + 1)]
                        if len(b) >= n
                        else []
                    )
                    cb = Counter(gb)
                    ms.append(
                        sum(
                            min(c, cb[g])
                            for g, c in Counter(ga).items()
                            if g in cb
                        )
                    )
                    ts.append(len(ga))
                rows.append((pid, *ms, *ts, len(b)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema]
            )

    return pairs.select("pair_id", "cand_text", "ref_text").mapInPandas(
        score, schema=out_schema
    )


def _bleu_expr(smooth: bool):
    """The BLEU score as one Catalyst expression over (m1..m4, t1..t4,
    r_len) attribute columns — identical operand ORDER to the oracle SQL
    so the IEEE double chain is reproducible cross-engine (the
    doc_perplexity log/exp precedent; candidate length is t1).

    ``smooth=True`` is the sentence form: add-one smoothing on the
    higher-order precisions (p̃_n = (m_n+1)/(t_n+1) for n>=2 — a
    candidate shorter than n tokens contributes p̃_n = 1, i.e. no
    penalty from orders it cannot express), zero iff the candidate is
    empty or shares no unigram.  ``smooth=False`` is the corpus form:
    zero iff any order has no match (the standard corpus-BLEU cut)."""
    c_len, r_len = F.col("t1"), F.col("r_len")
    if smooth:
        lns = [F.log(F.col("m1") / F.col("t1"))] + [
            F.log((F.col(f"m{n}") + F.lit(1)) / (F.col(f"t{n}") + F.lit(1)))
            for n in range(2, _BLEU_MAX_N + 1)
        ]
        degenerate = (F.col("t1") == 0) | (F.col("m1") == 0)
    else:
        lns = [
            F.log(F.col(f"m{n}") / F.col(f"t{n}"))
            for n in range(1, _BLEU_MAX_N + 1)
        ]
        degenerate = None
        for n in range(1, _BLEU_MAX_N + 1):
            cond = (F.col(f"t{n}") == 0) | (F.col(f"m{n}") == 0)
            degenerate = cond if degenerate is None else (degenerate | cond)
    ln_sum = lns[0]
    for ln in lns[1:]:
        ln_sum = ln_sum + ln
    bp = F.when(c_len > r_len, F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - r_len / c_len)
    )
    return F.when(degenerate, F.lit(0.0)).otherwise(
        bp * F.exp(F.lit(0.25) * ln_sum)
    )


def bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair smoothed sentence BLEU with its exact integer components
    (clipped matches m1..m4, candidate totals t1..t4, reference length)
    — the per-example eval artifact; `bleu_corpus` is the corpus roll-up
    over the same components."""
    comp = _bleu_components(spark, sf_dir)
    return comp.select(
        "pair_id",
        *[f"m{n}" for n in range(1, _BLEU_MAX_N + 1)],
        *[f"t{n}" for n in range(1, _BLEU_MAX_N + 1)],
        "r_len",
        r6(_bleu_expr(smooth=True)).alias("bleu_smooth"),
    )


def bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU (Papineni et al. 2002): clipped matches and totals
    summed over ALL pairs before the precision ratios (the micro-average
    that makes corpus BLEU robust to short candidates), brevity penalty
    on the corpus lengths.  One row; every component an exact integer.

    Scale shape: the kernel is a zero-shuffle map stage and the roll-up
    is ONE partial-aggregated global sum of 9 longs — the cheapest
    possible reduction at any corpus size."""
    return _bleu_corpus_from(_bleu_components(spark, sf_dir))


def _bleu_corpus_from(comp: DataFrame) -> DataFrame:
    """The corpus roll-up over any BLEU component frame (shared with
    eval_report, which reuses ONE kernel pass for BLEU and GLEU)."""
    sums = comp.agg(
        F.count("*").cast("long").alias("n_pairs"),
        *[
            F.sum(f"m{n}").cast("long").alias(f"m{n}")
            for n in range(1, _BLEU_MAX_N + 1)
        ],
        *[
            F.sum(f"t{n}").cast("long").alias(f"t{n}")
            for n in range(1, _BLEU_MAX_N + 1)
        ],
        F.sum("r_len").cast("long").alias("r_len"),
    )
    return sums.select(
        "n_pairs",
        *[f"m{n}" for n in range(1, _BLEU_MAX_N + 1)],
        *[f"t{n}" for n in range(1, _BLEU_MAX_N + 1)],
        "r_len",
        r6(_bleu_expr(smooth=False)).alias("bleu"),
    )


def _bleu_sql(smooth: bool) -> str:
    """The oracle twin of :func:`_bleu_expr` — identical operand order."""
    if smooth:
        lns = ["ln(m1 * 1.0 / t1)"] + [
            f"ln((m{n} + 1) * 1.0 / (t{n} + 1))"
            for n in range(2, _BLEU_MAX_N + 1)
        ]
        degenerate = "t1 = 0 OR m1 = 0"
    else:
        lns = [
            f"ln(m{n} * 1.0 / t{n})" for n in range(1, _BLEU_MAX_N + 1)
        ]
        degenerate = " OR ".join(
            f"t{n} = 0 OR m{n} = 0" for n in range(1, _BLEU_MAX_N + 1)
        )
    ln_sum = " + ".join(lns)
    return f"""(round(CASE WHEN {degenerate} THEN 0.0
       ELSE (CASE WHEN t1 > r_len THEN 1.0
                  ELSE exp(1.0 - r_len * 1.0 / t1) END)
            * exp(0.25 * ({ln_sum})) END, 6) + 0.0)"""


def _bleu_components_cte() -> str:
    """Per-pair (m1..m4, t1..t4, r_len) as DuckDB CTEs, reusing the
    certified rouge gram machinery for all four orders."""
    grams = ", ".join(
        f"{_ngram_cte(side, n)}"
        for n in range(1, _BLEU_MAX_N + 1)
        for side in ("cand", "ref")
    )
    per_n = ", ".join(
        f"""bm{n} AS (
  SELECT c.pair_id, sum(least(c.cnt, r.cnt)) AS m
  FROM cand{n}_grams c JOIN ref{n}_grams r
    ON c.pair_id = r.pair_id AND c.g = r.g
  GROUP BY c.pair_id
),
bt{n} AS (SELECT pair_id, sum(cnt) AS t FROM cand{n}_grams GROUP BY pair_id)"""
        for n in range(1, _BLEU_MAX_N + 1)
    )
    joins = " ".join(
        f"LEFT JOIN bm{n} ON p.pair_id = bm{n}.pair_id "
        f"LEFT JOIN bt{n} ON p.pair_id = bt{n}.pair_id"
        for n in range(1, _BLEU_MAX_N + 1)
    )
    cols = ", ".join(
        f"cast(coalesce(bm{n}.m, 0) AS bigint) AS m{n}, "
        f"cast(coalesce(bt{n}.t, 0) AS bigint) AS t{n}"
        for n in range(1, _BLEU_MAX_N + 1)
    )
    return f"""{grams},
{per_n},
rlen AS (SELECT pair_id, sum(cnt) AS t FROM ref1_grams GROUP BY pair_id),
comp AS (
  SELECT p.pair_id, {cols},
         cast(coalesce(rlen.t, 0) AS bigint) AS r_len
  FROM pairs p {joins} LEFT JOIN rlen ON p.pair_id = rlen.pair_id
)"""


ORACLES["bleu_pairs"] = f"""
WITH {PAIRS_CTE},
{_bleu_components_cte()}
SELECT pair_id, m1, m2, m3, m4, t1, t2, t3, t4, r_len,
       {_bleu_sql(smooth=True)} AS bleu_smooth
FROM comp
"""
QUERIES["bleu_pairs"] = bleu_pairs

# ---------------------------------------------------------------------------
# WER (late r16): word error rate — Levenshtein word edits / reference
# length, the standard ASR/transcription metric (the eval a multimodal
# audio pipeline reports; candidate plays the hypothesis role).  Like
# ROUGE-L, the edit distance is not relational: the kernel is an
# Arrow-batched pandas UDF (O(m*n) per pair, O(min) memory), and the
# oracle runs the SAME DP as a recursive-CTE anti-diagonal wavefront
# (the rouge_l precedent, with `least`+boundary d where LCS had
# `greatest`+boundary 0).  Every emitted component is an exact integer;
# wer is one division.
# ---------------------------------------------------------------------------

_WER_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("n_cand", T.LongType()),
        T.StructField("n_ref", T.LongType()),
        T.StructField("edits", T.LongType()),
        T.StructField("wer", T.DoubleType()),
    ]
)


def _levenshtein_words(a: list[str], b: list[str]) -> int:
    """Classic O(len(a)*len(b)) word-level Levenshtein, O(min) memory.

    The pure-Python spec; the kernels call :func:`_levenshtein_fast`,
    which computes the identical integer with numpy row scans (guide
    §4.2 — the interpreted inner loop was ~100x the vectorized cost on
    the gate corpus).  Kept as the reference implementation and the
    fallback for tiny inputs, and pinned equal to the fast path by
    tests (test_robustness's independent recomputes exercise both)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, y in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if x == y else 1),
            )
        prev = cur
    return prev[-1]


def _levenshtein_fast(a: list[str], b: list[str]) -> int:
    """Vectorized twin of :func:`_levenshtein_words` — bit-identical.

    Row recurrence ``cur[j] = min(prev[j]+1, prev[j-1]+cost_j,
    cur[j-1]+1)`` unrolls along j to ``cur[j] = min_{k<=j}(base[k] +
    (j-k))`` with ``base[0] = i`` and ``base[j] = min(prev[j]+1,
    prev[j-1]+cost_j)`` — a (min,+) prefix scan, computed exactly as
    ``j + cummin(base - j)`` in int64 (every term an exact integer, no
    float anywhere).  Tokens are mapped to int codes first so the
    per-row equality test is one numpy compare."""
    import numpy as np

    if len(a) < len(b):
        a, b = b, a
    n = len(b)
    if n == 0:
        return len(a)
    if len(a) * n < 256:  # tiny pairs: list DP beats numpy call overhead
        return _levenshtein_words(a, b)
    codes: dict[str, int] = {}
    for t in a:
        if t not in codes:
            codes[t] = len(codes)
    for t in b:
        if t not in codes:
            codes[t] = len(codes)
    a_ids = np.fromiter((codes[t] for t in a), dtype=np.int64, count=len(a))
    b_ids = np.fromiter((codes[t] for t in b), dtype=np.int64, count=n)
    j_idx = np.arange(n + 1, dtype=np.int64)
    prev = j_idx.copy()
    base = np.empty(n + 1, dtype=np.int64)
    for i in range(1, len(a) + 1):
        cost = (b_ids != a_ids[i - 1]).astype(np.int64)
        base[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=base[1:])
        prev = j_idx + np.minimum.accumulate(base - j_idx)
    return int(prev[-1])


def wer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair word error rate: Levenshtein word edits between the
    candidate (hypothesis) and reference token streams, normalized by
    the reference length (0.0 on an empty reference — a convention, and
    unreachable on the gate corpus).  Distributed by pair; zero shuffle
    beyond the pair equi-join."""
    return wer_from(_pairs(spark, sf_dir))


def wer_from(pairs: DataFrame) -> DataFrame:
    """The WER kernel over any (pair_id, cand_text, ref_text) frame;
    pair_id may be any type (passed through unchanged — the
    rouge_n_from precedent).

    The kernel emits EXACT INTEGERS only; the rate division and its
    6dp rounding run as Catalyst expressions (r6 — HALF_UP, matching
    the oracle's round()).  Rounding inside the Python kernel would use
    Python's banker's rounding, which differs on exact ties: the r17
    sf0.1 sweep caught cer = 101/128 = 0.7890625 rounding to .789062
    in-kernel vs .789063 in the oracle — the class this split fixes
    for BOTH wer and cer."""
    import re

    key_field = pairs.schema["pair_id"]
    out_schema = T.StructType([key_field] + _WER_SCHEMA.fields[1:-1])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            rows = []
            for pid, cand, ref in zip(
                pdf["pair_id"], pdf["cand_text"], pdf["ref_text"]
            ):
                a = tok.findall(cand.lower())
                b = tok.findall(ref.lower())
                rows.append((pid, len(a), len(b), _levenshtein_fast(a, b)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema]
            )

    comp = pairs.select("pair_id", "cand_text", "ref_text").mapInPandas(
        score, schema=out_schema
    )
    rate = F.when(
        F.col("n_ref") > 0, F.col("edits") / F.col("n_ref")
    ).otherwise(F.lit(0.0))
    return comp.select("*", r6(rate).alias("wer"))


# Anti-diagonal wavefront: diagonal d holds D[i][d-i] for i in
# [max(0, d-n), min(m, d)]; boundary rows/columns are D = d itself
# (D[0][j] = j, D[i][0] = i); interior cells take the min over the
# three neighbors (diag d-1 at i-1 and i; diag d-2 at i-1).  The 1e9
# coalesce sentinel is defensive only — interior neighbors are always
# inside the previous diagonals' ranges.  The chain from ltoks through
# lev_out is shared by the pair and corpus oracles (r17).
def _lev_ctes(pattern: str) -> str:
    """The wavefront chain parameterized by the unit regex: '[a-z0-9]+'
    gives word-level edits (WER), '[a-z0-9]' character-level (CER) —
    everything after ltoks is unit-agnostic."""
    return _WER_LEV_CTES_BODY.replace("[a-z0-9]+", pattern)


_WER_LEV_CTES_BODY = """
ltoks AS MATERIALIZED (
  SELECT pair_id,
         regexp_extract_all(lower(cand_text), '[a-z0-9]+') AS ca,
         regexp_extract_all(lower(ref_text), '[a-z0-9]+') AS ra,
         len(regexp_extract_all(lower(cand_text), '[a-z0-9]+')) AS m,
         len(regexp_extract_all(lower(ref_text), '[a-z0-9]+')) AS n
  FROM pairs
),
dp(pair_id, d, lo, vd, lo1, vd1) AS (
  SELECT pair_id, 0, 0, [0], 0, cast([] AS integer[]) FROM ltoks
  UNION ALL
  SELECT s.pair_id, s.d + 1,
         greatest(0, s.d + 1 - t.n),
         list_transform(
           range(greatest(0, s.d + 1 - t.n), least(t.m, s.d + 1) + 1),
           i -> CASE WHEN i = 0 OR s.d + 1 - i = 0 THEN s.d + 1
                ELSE least(
                  coalesce(s.vd[i - 1 - s.lo + 1], 1000000000) + 1,
                  coalesce(s.vd[i - s.lo + 1], 1000000000) + 1,
                  coalesce(s.vd1[i - 1 - s.lo1 + 1], 1000000000)
                    + CASE WHEN t.ca[i] = t.ra[s.d + 1 - i]
                           THEN 0 ELSE 1 END)
                END),
         s.lo, s.vd
  FROM dp s JOIN ltoks t USING (pair_id)
  WHERE s.d + 1 <= t.m + t.n
),
lev_out AS (
  SELECT t.pair_id, t.m, t.n,
         CASE WHEN t.m + t.n = 0 THEN 0
              ELSE coalesce(f.vd[t.m - f.lo + 1], 0) END AS edits
  FROM ltoks t
  LEFT JOIN dp f ON f.pair_id = t.pair_id AND f.d = t.m + t.n
)"""

_WER_LEV_CTES = _lev_ctes("[a-z0-9]+")  # word units (identity substitution)

ORACLES["wer_pairs"] = f"""
WITH RECURSIVE {PAIRS_CTE},
{_WER_LEV_CTES}
SELECT pair_id,
       cast(m AS bigint) AS n_cand,
       cast(n AS bigint) AS n_ref,
       cast(edits AS bigint) AS edits,
       (round(CASE WHEN n > 0
                   THEN edits * 1.0 / n
                   ELSE 0.0 END, 6) + 0.0) AS wer
FROM lev_out
"""
QUERIES["wer_pairs"] = wer_pairs


def wer_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus WER — the standard micro-average Σedits / Σref_len (NOT
    the mean of the per-pair rates; long references weigh more, exactly
    as an ASR leaderboard reports it), completing the pair/corpus
    symmetry BLEU and chrF already have (VERDICT r16 task 5).

    Scale shape: the per-pair kernel is the same zero-shuffle Arrow map
    stage as `wer_pairs`; the roll-up is ONE partial-aggregated global
    sum of 3 longs — the cheapest possible reduction at any corpus
    size."""
    comp = wer_pairs(spark, sf_dir)
    sums = comp.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("n_cand").cast("long").alias("n_cand"),
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("edits").cast("long").alias("edits"),
    )
    wer = F.when(
        F.col("n_ref") > 0, F.col("edits") / F.col("n_ref")
    ).otherwise(F.lit(0.0))
    return sums.select(
        "n_pairs",
        "n_cand",
        "n_ref",
        "edits",
        r6(wer).alias("wer"),
    )


ORACLES["wer_corpus"] = f"""
WITH RECURSIVE {PAIRS_CTE},
{_WER_LEV_CTES}
SELECT cast(count(*) AS bigint) AS n_pairs,
       cast(sum(m) AS bigint) AS n_cand,
       cast(sum(n) AS bigint) AS n_ref,
       cast(sum(edits) AS bigint) AS edits,
       (round(CASE WHEN sum(n) > 0
                   THEN sum(edits) * 1.0 / sum(n)
                   ELSE 0.0 END, 6) + 0.0) AS wer
FROM lev_out
"""
QUERIES["wer_corpus"] = wer_corpus


# ---------------------------------------------------------------------------
# CER (r17): character error rate — the WER twin an ASR/OCR eval
# reports beside it (edits over the character stream are robust to
# tokenization and compounding where word edits are not).  Unit chars
# are the [a-z0-9] stream, the same normalization chrF uses; every
# stage downstream of tokenization is shared with WER (the kernel's DP
# and the oracle's recursive wavefront are unit-agnostic).
# ---------------------------------------------------------------------------

_CER_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("n_cand", T.LongType()),
        T.StructField("n_ref", T.LongType()),
        T.StructField("edits", T.LongType()),
        T.StructField("cer", T.DoubleType()),
    ]
)


def cer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair character error rate: Levenshtein edits between the
    [a-z0-9] character streams, normalized by the reference length.
    Same zero-shuffle Arrow map shape as wer_pairs; O(m*n) per pair on
    character counts (documents here are short; production bounds the
    DP with a length cutoff upstream, the quality-filter stage)."""
    return cer_from(_pairs(spark, sf_dir))


def cer_from(pairs: DataFrame) -> DataFrame:
    """The CER kernel over any (pair_id, cand_text, ref_text) frame.
    Integer components from the kernel, rate rounded via r6 Catalyst-
    side — see wer_from's docstring for the banker's-rounding tie the
    split fixes (caught on THIS query at sf0.1: 101/128)."""
    import re

    key_field = pairs.schema["pair_id"]
    out_schema = T.StructType([key_field] + _CER_SCHEMA.fields[1:-1])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = re.compile(r"[a-z0-9]")
        for pdf in batches:
            rows = []
            for pid, cand, ref in zip(
                pdf["pair_id"], pdf["cand_text"], pdf["ref_text"]
            ):
                a = tok.findall(cand.lower())
                b = tok.findall(ref.lower())
                rows.append((pid, len(a), len(b), _levenshtein_fast(a, b)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema]
            )

    comp = pairs.select("pair_id", "cand_text", "ref_text").mapInPandas(
        score, schema=out_schema
    )
    rate = F.when(
        F.col("n_ref") > 0, F.col("edits") / F.col("n_ref")
    ).otherwise(F.lit(0.0))
    return comp.select("*", r6(rate).alias("cer"))


def cer_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus CER — the micro-average Σedits / Σref_chars (the exact
    wer_corpus shape one unit down)."""
    comp = cer_pairs(spark, sf_dir)
    sums = comp.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("n_cand").cast("long").alias("n_cand"),
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("edits").cast("long").alias("edits"),
    )
    cer = F.when(
        F.col("n_ref") > 0, F.col("edits") / F.col("n_ref")
    ).otherwise(F.lit(0.0))
    return sums.select(
        "n_pairs",
        "n_cand",
        "n_ref",
        "edits",
        r6(cer).alias("cer"),
    )


_CER_LEV_CTES = _lev_ctes("[a-z0-9]")  # character units

ORACLES["cer_pairs"] = f"""
WITH RECURSIVE {PAIRS_CTE},
{_CER_LEV_CTES}
SELECT pair_id,
       cast(m AS bigint) AS n_cand,
       cast(n AS bigint) AS n_ref,
       cast(edits AS bigint) AS edits,
       (round(CASE WHEN n > 0
                   THEN edits * 1.0 / n
                   ELSE 0.0 END, 6) + 0.0) AS cer
FROM lev_out
"""
QUERIES["cer_pairs"] = cer_pairs

ORACLES["cer_corpus"] = f"""
WITH RECURSIVE {PAIRS_CTE},
{_CER_LEV_CTES}
SELECT cast(count(*) AS bigint) AS n_pairs,
       cast(sum(m) AS bigint) AS n_cand,
       cast(sum(n) AS bigint) AS n_ref,
       cast(sum(edits) AS bigint) AS edits,
       (round(CASE WHEN sum(n) > 0
                   THEN sum(edits) * 1.0 / sum(n)
                   ELSE 0.0 END, 6) + 0.0) AS cer
FROM lev_out
"""
QUERIES["cer_corpus"] = cer_corpus


# ---------------------------------------------------------------------------
# chrF2 (r16): character n-gram F-score (Popović 2015) — the third
# standard MT/summarization metric beside BLEU and ROUGE.  Tokenization-
# free by design (robust to morphology and segmentation): both texts are
# reduced to their [a-z0-9] character stream and scored on character
# n-grams n=1..6.  Per order: clipped precision and recall; chrP/chrR
# are the arithmetic means over the six orders; chrF2 weights recall
# twice (beta=2): (1+4)PR / (4P + R).  Every component is an exact
# integer and the score needs only divisions and one ratio — no
# transcendental calls at all, the most parity-robust shape available.
# ---------------------------------------------------------------------------

_CHRF_MAX_N = 6
_CHRF_BETA2 = 4  # beta = 2

_CHRF_COMPONENTS_SCHEMA = T.StructType(
    [T.StructField("pair_id", T.LongType())]
    + [
        T.StructField(f"{p}{n}", T.LongType())
        for p in ("cm", "ct", "cr")
        for n in range(1, _CHRF_MAX_N + 1)
    ]
)


def _chrf_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair chrF components via the Arrow row-local kernel: clipped
    char-n-gram matches cm_n, candidate totals ct_n, reference totals
    cr_n for n=1..6.  Zero shuffle beyond the pair equi-join."""
    import re

    from collections import Counter

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        alnum = re.compile(r"[a-z0-9]")

        def grams(s: str, n: int) -> list[str]:
            return (
                [s[i : i + n] for i in range(len(s) - n + 1)]
                if len(s) >= n
                else []
            )

        for pdf in batches:
            rows = []
            for pid, cand, ref in zip(
                pdf["pair_id"], pdf["cand_text"], pdf["ref_text"]
            ):
                cs = "".join(alnum.findall(cand.lower()))
                rs = "".join(alnum.findall(ref.lower()))
                cm, ct, cr = [], [], []
                for n in range(1, _CHRF_MAX_N + 1):
                    ga, gb = grams(cs, n), grams(rs, n)
                    cb = Counter(gb)
                    cm.append(
                        sum(
                            min(c, cb[g])
                            for g, c in Counter(ga).items()
                            if g in cb
                        )
                    )
                    ct.append(len(ga))
                    cr.append(len(gb))
                rows.append((pid, *cm, *ct, *cr))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _CHRF_COMPONENTS_SCHEMA.fields]
            )

    return _pairs(spark, sf_dir).mapInPandas(
        score, schema=_CHRF_COMPONENTS_SCHEMA
    )


def _chrf_expr():
    """chrF2 as one Catalyst expression over the component columns —
    identical operand order to the oracle SQL; divisions of exact
    integers only.  Zero-denominator orders score 0 and ALL 6 orders are
    always averaged — this repo's fixed-order convention; sacrebleu
    instead divides by the count of orders with statistics
    (effective-order averaging), so scores differ from sacrebleu on
    texts shorter than 6 chars.  Internal oracle parity is unaffected
    (the oracle uses the same fixed-order convention)."""
    ns = range(1, _CHRF_MAX_N + 1)

    def ratio(m, t):
        return F.when(F.col(t) > 0, F.col(m) / F.col(t)).otherwise(F.lit(0.0))

    p_sum = None
    r_sum = None
    for n in ns:
        p_n = ratio(f"cm{n}", f"ct{n}")
        r_n = ratio(f"cm{n}", f"cr{n}")
        p_sum = p_n if p_sum is None else (p_sum + p_n)
        r_sum = r_n if r_sum is None else (r_sum + r_n)
    chr_p = p_sum / _CHRF_MAX_N
    chr_r = r_sum / _CHRF_MAX_N
    denom = _CHRF_BETA2 * chr_p + chr_r
    return F.when(
        denom > 0,
        (1 + _CHRF_BETA2) * chr_p * chr_r / denom,
    ).otherwise(F.lit(0.0))


def chrf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair chrF2 with its exact integer components (clipped char
    n-gram matches and both totals, n=1..6)."""
    return _chrf_components(spark, sf_dir).select(
        "pair_id",
        *[
            f"{p}{n}"
            for p in ("cm", "ct", "cr")
            for n in range(1, _CHRF_MAX_N + 1)
        ],
        r6(_chrf_expr()).alias("chrf2"),
    )


def chrf_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus chrF2 as the macro-average of the per-pair scores (the
    sacrebleu reporting convention) — averaged over the ROUNDED per-pair
    values through exact integer micro-units (the rouge_sweep
    discipline), so the mean is bit-identical cross-engine."""
    per = chrf_pairs(spark, sf_dir)
    return per.agg(
        F.count("*").cast("long").alias("n_pairs"),
        (
            F.sum(F.round(F.col("chrf2") * 1e6).cast("long"))
            / (F.count("*") * F.lit(1e6))
        ).alias("avg_chrf2"),
    )


def _chrf_cgram_cte(side: str, n: int) -> str:
    """DuckDB CTE of character n-grams with counts over the [a-z0-9]
    stream of one side (the char twin of _ngram_cte)."""
    col = "cs" if side == "cand" else "rs"
    return f"""{side}{n}_cgrams AS (
  SELECT pair_id, substring({col}, pos + 1, {n}) AS g, count(*) AS cnt
  FROM (
    SELECT pair_id, {col}, unnest(range(len({col}) - {n} + 1)) AS pos
    FROM cstrs
  ) GROUP BY pair_id, substring({col}, pos + 1, {n})
)"""


def _chrf_components_cte() -> str:
    grams = ",\n".join(
        _chrf_cgram_cte(side, n)
        for n in range(1, _CHRF_MAX_N + 1)
        for side in ("cand", "ref")
    )
    per_n = ",\n".join(
        f"""cm{n} AS (
  SELECT c.pair_id, sum(least(c.cnt, r.cnt)) AS m
  FROM cand{n}_cgrams c JOIN ref{n}_cgrams r
    ON c.pair_id = r.pair_id AND c.g = r.g
  GROUP BY c.pair_id
),
ct{n} AS (SELECT pair_id, sum(cnt) AS t FROM cand{n}_cgrams GROUP BY pair_id),
cr{n} AS (SELECT pair_id, sum(cnt) AS t FROM ref{n}_cgrams GROUP BY pair_id)"""
        for n in range(1, _CHRF_MAX_N + 1)
    )
    joins = " ".join(
        f"LEFT JOIN cm{n} ON p.pair_id = cm{n}.pair_id "
        f"LEFT JOIN ct{n} ON p.pair_id = ct{n}.pair_id "
        f"LEFT JOIN cr{n} ON p.pair_id = cr{n}.pair_id"
        for n in range(1, _CHRF_MAX_N + 1)
    )
    cols = ", ".join(
        f"cast(coalesce(cm{n}.m, 0) AS bigint) AS cm{n}, "
        f"cast(coalesce(ct{n}.t, 0) AS bigint) AS ct{n}, "
        f"cast(coalesce(cr{n}.t, 0) AS bigint) AS cr{n}"
        for n in range(1, _CHRF_MAX_N + 1)
    )
    return f"""cstrs AS MATERIALIZED (
  SELECT pair_id,
         array_to_string(regexp_extract_all(lower(cand_text), '[a-z0-9]'), '')
           AS cs,
         array_to_string(regexp_extract_all(lower(ref_text), '[a-z0-9]'), '')
           AS rs
  FROM pairs
),
{grams},
{per_n},
ccomp AS (
  SELECT p.pair_id, {cols}
  FROM pairs p {joins}
)"""


def _chrf_sql() -> str:
    ns = range(1, _CHRF_MAX_N + 1)
    p_sum = " + ".join(
        f"(CASE WHEN ct{n} > 0 THEN cm{n} * 1.0 / ct{n} ELSE 0.0 END)"
        for n in ns
    )
    r_sum = " + ".join(
        f"(CASE WHEN cr{n} > 0 THEN cm{n} * 1.0 / cr{n} ELSE 0.0 END)"
        for n in ns
    )
    p = f"(({p_sum}) / {_CHRF_MAX_N})"
    r = f"(({r_sum}) / {_CHRF_MAX_N})"
    return f"""(round(CASE WHEN {_CHRF_BETA2} * {p} + {r} > 0
       THEN (1 + {_CHRF_BETA2}) * {p} * {r} / ({_CHRF_BETA2} * {p} + {r})
       ELSE 0.0 END, 6) + 0.0)"""


ORACLES["chrf_pairs"] = f"""
WITH {PAIRS_CTE},
{_chrf_components_cte()}
SELECT pair_id,
       {", ".join(f"{p}{n}" for p in ("cm", "ct", "cr") for n in range(1, _CHRF_MAX_N + 1))},
       {_chrf_sql()} AS chrf2
FROM ccomp
"""
QUERIES["chrf_pairs"] = chrf_pairs

ORACLES["chrf_corpus"] = f"""
WITH {PAIRS_CTE},
{_chrf_components_cte()},
scored AS (
  SELECT pair_id, {_chrf_sql()} AS chrf2 FROM ccomp
)
SELECT cast(count(*) AS bigint) AS n_pairs,
       sum(cast(round(chrf2 * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_chrf2
FROM scored
"""
QUERIES["chrf_corpus"] = chrf_corpus


ORACLES["bleu_corpus"] = f"""
WITH {PAIRS_CTE},
{_bleu_components_cte()},
agg AS (
  SELECT cast(count(*) AS bigint) AS n_pairs,
         cast(sum(m1) AS bigint) AS m1, cast(sum(m2) AS bigint) AS m2,
         cast(sum(m3) AS bigint) AS m3, cast(sum(m4) AS bigint) AS m4,
         cast(sum(t1) AS bigint) AS t1, cast(sum(t2) AS bigint) AS t2,
         cast(sum(t3) AS bigint) AS t3, cast(sum(t4) AS bigint) AS t4,
         cast(sum(r_len) AS bigint) AS r_len
  FROM comp
)
SELECT n_pairs, m1, m2, m3, m4, t1, t2, t3, t4, r_len,
       {_bleu_sql(smooth=False)} AS bleu
FROM agg
"""
QUERIES["bleu_corpus"] = bleu_corpus


# ---------------------------------------------------------------------------
# summary_eval (r17): the eval family over ENGINE-PRODUCED summaries —
# the reference's own machine-vs-machine pattern (it scores its LSA
# summaries against pytldr output as a pseudo-golden,
# BigdataProjectCode.py:184-202 / SURVEY M4-M5).  Here the LSA summary
# (M3) plays the candidate and the TextRank top-5 (O2+J3) plays the
# reference, per source; the metric kernels are the exact certified
# rouge_n_from / _bleu_components_from / wer_from paths, so this query
# exercises every eval operator end-to-end on real pipeline output
# instead of the synthetic `documents` pair fixture.
# ---------------------------------------------------------------------------


def summary_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROUGE-1/2 F, smoothed BLEU and WER of the LSA summary
    (candidate) against the TextRank top-5 summary (reference).

    Sentence concatenation is ORDER-FIXED on both engines (LSA: by
    (concept, rk); TextRank: by rk), so the pair texts are deterministic
    strings and the downstream kernels need no further tie-breaking.

    Scale shape: both upstream plans are already bounded (5x3 and 5
    sentences per source); the eval adds three zero-shuffle Arrow map
    stages over one row per source plus tiny key equi-joins — nothing
    super-linear at any corpus size."""
    from .lsa import lsa_summary
    from .pagerank import textrank_top5

    cand = (
        lsa_summary(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_cand_sents"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("concept", "rk", "sentence"))
                    ),
                    lambda s: s["sentence"],
                ),
            ).alias("cand_text"),
        )
    )
    ref = (
        textrank_top5(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_ref_sents"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "sentence"))),
                    lambda s: s["sentence"],
                ),
            ).alias("ref_text"),
        )
    )
    pairs = cand.join(ref, "source").select(
        F.col("source").alias("pair_id"),
        "cand_text",
        "ref_text",
        "n_cand_sents",
        "n_ref_sents",
    )
    rouge = rouge_n_from(pairs).select("pair_id", "rouge1_f", "rouge2_f")
    bleu = _bleu_components_from(pairs).select(
        "pair_id", r6(_bleu_expr(smooth=True)).alias("bleu_smooth")
    )
    wer = wer_from(pairs).select("pair_id", "edits", "wer")
    return (
        pairs.select("pair_id", "n_cand_sents", "n_ref_sents")
        .join(rouge, "pair_id")
        .join(bleu, "pair_id")
        .join(wer, "pair_id")
        .select(
            F.col("pair_id").alias("source"),
            "n_cand_sents",
            "n_ref_sents",
            "rouge1_f",
            "rouge2_f",
            "bleu_smooth",
            "edits",
            "wer",
        )
    )


def _summary_eval_oracle() -> str:
    """Composes the two certified upstream oracles verbatim as nested
    CTE bodies (the ann_ndcg precedent — DuckDB scopes inner WITHs
    per-CTE, so the textrank oracle's own `pairs` CTE shadows nothing),
    then reuses the certified metric CTE generators over the composed
    pair texts."""
    from .lsa import ORACLES as _lsa_oracles
    from .pagerank import ORACLES as _pr_oracles

    return f"""
WITH RECURSIVE
cand_raw AS ({_lsa_oracles["lsa_summary"]}),
ref_raw AS ({_pr_oracles["textrank_top5"]}),
cand AS (
  SELECT source, cast(count(*) AS bigint) AS n_cand_sents,
         string_agg(sentence, ' ' ORDER BY concept, rk) AS cand_text
  FROM cand_raw GROUP BY source
),
ref AS (
  SELECT source, cast(count(*) AS bigint) AS n_ref_sents,
         string_agg(sentence, ' ' ORDER BY rk) AS ref_text
  FROM ref_raw GROUP BY source
),
pairs AS (
  SELECT c.source AS pair_id, c.cand_text, r.ref_text
  FROM cand c JOIN ref r ON c.source = r.source
),
{_bleu_components_cte()},
{_rouge_n_sql(1)},
{_rouge_n_sql(2)},
{_WER_LEV_CTES}
SELECT p.pair_id AS source,
       c.n_cand_sents, r.n_ref_sents,
       r1_out.rouge1_f, r2_out.rouge2_f,
       {_bleu_sql(smooth=True)} AS bleu_smooth,
       cast(lev_out.edits AS bigint) AS edits,
       (round(CASE WHEN lev_out.n > 0
                   THEN lev_out.edits * 1.0 / lev_out.n
                   ELSE 0.0 END, 6) + 0.0) AS wer
FROM pairs p
JOIN cand c ON c.source = p.pair_id
JOIN ref r ON r.source = p.pair_id
JOIN r1_out ON r1_out.pair_id = p.pair_id
JOIN r2_out ON r2_out.pair_id = p.pair_id
JOIN comp ON comp.pair_id = p.pair_id
JOIN lev_out ON lev_out.pair_id = p.pair_id
"""


ORACLES["summary_eval"] = _summary_eval_oracle()
QUERIES["summary_eval"] = summary_eval

# ---------------------------------------------------------------------------
# GLEU (r17): Google's sentence-level GLEU (Wu et al. 2016, "Google's
# Neural Machine Translation System", §5.1) — the RL-reward variant of
# BLEU that stays meaningful per sentence: pool the n-gram statistics of
# ALL orders 1..4 into one bag, then score min(precision, recall) over
# the pooled bag.  No brevity penalty (the recall arm already punishes
# short candidates) and no geometric mean (no zero-collapse on a missing
# order), which is why per-sentence GLEU needs no smoothing.
#
# Engine shape: ZERO new kernel work — the pooled statistics are exact
# integer sums over the already-certified BLEU component surface
# (m1..m4, t1..t4, r_len): pooled matches Σm_n, pooled candidate total
# Σt_n, and the pooled reference total Σ max(r_len-n+1, 0) (the
# candidate identity t_n = max(t1-n+1, 0) holds for the reference side
# too, so r_len determines every ref order total).  The score is one
# least-of-two-divisions expression — parity-trivial (divisions only,
# no transcendentals), the chrF precedent.
# ---------------------------------------------------------------------------


def _gleu_staged(comp: DataFrame) -> DataFrame:
    """Stage the pooled GLEU integers from BLEU component columns."""
    rt_pool = F.col("r_len")
    for n in range(2, _BLEU_MAX_N + 1):
        rt_pool = rt_pool + F.greatest(
            F.col("r_len") - F.lit(n - 1), F.lit(0)
        )
    m_pool = F.col("m1")
    t_pool = F.col("t1")
    for n in range(2, _BLEU_MAX_N + 1):
        m_pool = m_pool + F.col(f"m{n}")
        t_pool = t_pool + F.col(f"t{n}")
    return comp.withColumns(
        {
            "m_pool": m_pool.cast("long"),
            "t_pool": t_pool.cast("long"),
            "rt_pool": rt_pool.cast("long"),
        }
    )


def _gleu_expr():
    """GLEU over staged pooled attributes — identical operand order to
    :func:`_gleu_sql` (two divisions and a ``least``; exact-integer
    operands, so the doubles agree bit-for-bit cross-engine)."""
    m, t, rt = F.col("m_pool"), F.col("t_pool"), F.col("rt_pool")
    return F.when(
        (t == F.lit(0)) | (rt == F.lit(0)), F.lit(0.0)
    ).otherwise(F.least(m / t, m / rt))


def _gleu_sql() -> str:
    return """(round(CASE WHEN t_pool = 0 OR rt_pool = 0 THEN 0.0
       ELSE least(m_pool * 1.0 / t_pool, m_pool * 1.0 / rt_pool)
       END, 6) + 0.0)"""


_GLEU_POOL_SQL = """
       cast(m1 + m2 + m3 + m4 AS bigint) AS m_pool,
       cast(t1 + t2 + t3 + t4 AS bigint) AS t_pool,
       cast(r_len + greatest(r_len - 1, 0) + greatest(r_len - 2, 0)
            + greatest(r_len - 3, 0) AS bigint) AS rt_pool"""


def gleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair sentence GLEU with its exact pooled integer components
    (Σ clipped matches, Σ candidate totals, Σ reference totals over
    orders 1..4).  Same zero-shuffle Arrow map shape as bleu_pairs —
    the component kernel IS bleu's, reused verbatim."""
    staged = _gleu_staged(_bleu_components(spark, sf_dir))
    return staged.select(
        "pair_id",
        "m_pool",
        "t_pool",
        "rt_pool",
        r6(_gleu_expr()).alias("gleu"),
    )


def gleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus GLEU: pooled components summed over ALL pairs before the
    two ratios (micro-average, the bleu_corpus discipline).  One row;
    the roll-up is a 3-long global sum — the cheapest reduction at any
    corpus size."""
    return _gleu_corpus_from(_bleu_components(spark, sf_dir))


def _gleu_corpus_from(comp: DataFrame) -> DataFrame:
    """The corpus roll-up over any BLEU component frame (shared with
    eval_report)."""
    staged = _gleu_staged(comp)
    sums = staged.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("m_pool").cast("long").alias("m_pool"),
        F.sum("t_pool").cast("long").alias("t_pool"),
        F.sum("rt_pool").cast("long").alias("rt_pool"),
    )
    return sums.select(
        "n_pairs",
        "m_pool",
        "t_pool",
        "rt_pool",
        r6(_gleu_expr()).alias("gleu"),
    )


ORACLES["gleu_pairs"] = f"""
WITH {PAIRS_CTE},
{_bleu_components_cte()},
pooled AS (
  SELECT pair_id,{_GLEU_POOL_SQL}
  FROM comp
)
SELECT pair_id, m_pool, t_pool, rt_pool,
       {_gleu_sql()} AS gleu
FROM pooled
"""
QUERIES["gleu_pairs"] = gleu_pairs

ORACLES["gleu_corpus"] = f"""
WITH {PAIRS_CTE},
{_bleu_components_cte()},
pooled AS (
  SELECT pair_id,{_GLEU_POOL_SQL}
  FROM comp
),
sums AS (
  SELECT cast(count(*) AS bigint) AS n_pairs,
         cast(sum(m_pool) AS bigint) AS m_pool,
         cast(sum(t_pool) AS bigint) AS t_pool,
         cast(sum(rt_pool) AS bigint) AS rt_pool
  FROM pooled
)
SELECT n_pairs, m_pool, t_pool, rt_pool,
       {_gleu_sql()} AS gleu
FROM sums
"""
QUERIES["gleu_corpus"] = gleu_corpus

# ---------------------------------------------------------------------------
# ROUGE-SU4 (r17): skip-bigram-plus-unigram ROUGE (Lin 2004, §5 — the
# DUC-configuration "SU4"): the unit bag is every in-order token pair
# with at most 4 tokens between them (skip distance <= 4), unioned with
# the unigrams (the "U" extension keeps a candidate with no co-occurring
# pair from scoring zero).  The reference's rouge-score dependency ships
# ROUGE-N/L only (BigdataProjectCode.py:183); SU4 completes the family a
# summarization eval reports alongside them.
#
# Engine shape: the rouge_n production path — the unit bag is row-local,
# so the kernel is an Arrow-batched mapInPandas pass (O(5·tokens) per
# pair, zero shuffle beyond the pair equi-join) emitting EXACT INTEGERS
# (clipped matches + both side totals); P/R/F are divisions staged over
# those attributes (the _prf discipline).  The oracle builds the same
# bag relationally: a positional self-join banded to 1 <= Δpos <= 5
# UNION ALL the unigram stream — unigram keys contain no space so the
# two unit alphabets cannot collide.
# ---------------------------------------------------------------------------

_SU4_SKIP = 4  # max tokens BETWEEN the two ends of a skip-bigram

_SU4_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("match_su4", T.LongType()),
        T.StructField("cand_units", T.LongType()),
        T.StructField("ref_units", T.LongType()),
    ]
)


def _su4_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair SU4 unit-bag components via the Arrow kernel."""
    import re

    from collections import Counter

    pairs = _pairs(spark, sf_dir)

    def units(toks: list[str]) -> Counter:
        bag = Counter(toks)  # unigrams — no ' ' in the key
        span = _SU4_SKIP + 1  # max positional distance j - i
        for i, w in enumerate(toks):
            for j in range(i + 1, min(i + span, len(toks) - 1) + 1):
                bag[w + " " + toks[j]] += 1
        return bag

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            rows = []
            for pid, cand, ref in zip(
                pdf["pair_id"], pdf["cand_text"], pdf["ref_text"]
            ):
                bc = units(tok.findall(cand.lower()))
                br = units(tok.findall(ref.lower()))
                m = sum(
                    min(c, br[g]) for g, c in bc.items() if g in br
                )
                rows.append(
                    (pid, m, sum(bc.values()), sum(br.values()))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SU4_SCHEMA]
            )

    return pairs.select("pair_id", "cand_text", "ref_text").mapInPandas(
        score, schema=_SU4_SCHEMA
    )


def rouge_su4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair ROUGE-SU4 with exact integer components and P/R/F
    staged as divisions over them (the rouge_n output convention)."""
    comp = _su4_components(spark, sf_dir)
    m, ct, rt = (
        F.col("match_su4"),
        F.col("cand_units"),
        F.col("ref_units"),
    )
    comp = comp.withColumns(
        {
            "p_": F.when(ct > F.lit(0), m / ct).otherwise(F.lit(0.0)),
            "r_": F.when(rt > F.lit(0), m / rt).otherwise(F.lit(0.0)),
        }
    )
    p, r = F.col("p_"), F.col("r_")
    return comp.select(
        "pair_id",
        "match_su4",
        "cand_units",
        "ref_units",
        r6(p).alias("su4_p"),
        r6(r).alias("su4_r"),
        r6(
            F.when((p + r) > F.lit(0), 2 * p * r / (p + r)).otherwise(
                F.lit(0.0)
            )
        ).alias("su4_f"),
    )


def _su4_units_cte(side: str) -> str:
    """DuckDB CTE producing {side}_su (pair_id, g, cnt): skip-bigrams
    banded to 1 <= Δpos <= 5 UNION ALL unigrams."""
    return f"""
{side}_su_toks AS (
  SELECT pair_id,
         unnest(regexp_extract_all(lower({side}_text), '[a-z0-9]+')) AS w,
         unnest(range(len(regexp_extract_all(lower({side}_text), '[a-z0-9]+')))) AS pos
  FROM pairs
),
{side}_su AS (
  SELECT pair_id, g, count(*) AS cnt FROM (
    SELECT a.pair_id, a.w || ' ' || b.w AS g
    FROM {side}_su_toks a
    JOIN {side}_su_toks b
      ON a.pair_id = b.pair_id
     AND b.pos - a.pos BETWEEN 1 AND {_SU4_SKIP + 1}
    UNION ALL
    SELECT pair_id, w AS g FROM {side}_su_toks
  ) GROUP BY pair_id, g
)"""


ORACLES["rouge_su4"] = f"""
WITH {PAIRS_CTE},
{_su4_units_cte("cand")},
{_su4_units_cte("ref")},
su_m AS (
  SELECT c.pair_id, sum(least(c.cnt, r.cnt)) AS m
  FROM cand_su c JOIN ref_su r
    ON c.pair_id = r.pair_id AND c.g = r.g
  GROUP BY c.pair_id
),
su_c AS (SELECT pair_id, sum(cnt) AS t FROM cand_su GROUP BY pair_id),
su_r AS (SELECT pair_id, sum(cnt) AS t FROM ref_su GROUP BY pair_id),
su_s AS (
  SELECT p.pair_id,
         coalesce(su_m.m, 0) AS m,
         coalesce(su_c.t, 0) AS ct,
         coalesce(su_r.t, 0) AS rt
  FROM pairs p
  LEFT JOIN su_m ON p.pair_id = su_m.pair_id
  LEFT JOIN su_c ON p.pair_id = su_c.pair_id
  LEFT JOIN su_r ON p.pair_id = su_r.pair_id
)
SELECT pair_id, cast(m AS bigint) AS match_su4,
       cast(ct AS bigint) AS cand_units,
       cast(rt AS bigint) AS ref_units,
       (round(CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END, 6) + 0.0) AS su4_p,
       (round(CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END, 6) + 0.0) AS su4_r,
       (round(CASE WHEN (CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END)
                     + (CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END) > 0
             THEN 2 * (CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END)
                    * (CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END)
                  / ((CASE WHEN ct > 0 THEN m * 1.0 / ct ELSE 0 END)
                     + (CASE WHEN rt > 0 THEN m * 1.0 / rt ELSE 0 END))
             ELSE 0 END, 6) + 0.0) AS su4_f
FROM su_s
"""
QUERIES["rouge_su4"] = rouge_su4

# ---------------------------------------------------------------------------
# eval_report (r17): the one-call evaluation suite — every corpus-level
# metric the family ships, in ONE row: macro ROUGE-1/2 F (micro-unit
# means, the rouge_sweep discipline), corpus BLEU and GLEU (micro-
# averages over ONE shared component-kernel pass), macro chrF2, and
# micro WER/CER.  This is the report line a training-eval pipeline
# prints per checkpoint; a user of the reference runs five library
# calls and a loop for the same surface (BigdataProjectCode.py:184-202
# runs rouge-score alone).
#
# Scale shape: every upstream is a zero-shuffle Arrow map stage (or
# pure Catalyst array math for rouge_n) followed by a global aggregate
# of a few longs; the final assembly cross-joins six 1-row frames —
# scalar broadcast joins, zero data movement.  The oracle composes the
# six CERTIFIED corpus oracles verbatim as nested subqueries (the
# summary_eval / ann_ndcg precedent), so the report cannot drift from
# the per-metric gates.
# ---------------------------------------------------------------------------


def eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = _bleu_components(spark, sf_dir)  # ONE kernel pass for both
    b = _bleu_corpus_from(comp).select("n_pairs", "bleu")
    g = _gleu_corpus_from(comp).select("gleu")
    r = rouge_n(spark, sf_dir).agg(
        (
            F.sum(F.round(F.col("rouge1_f") * 1e6).cast("long"))
            / (F.count("*") * F.lit(1e6))
        ).alias("avg_rouge1_f"),
        (
            F.sum(F.round(F.col("rouge2_f") * 1e6).cast("long"))
            / (F.count("*") * F.lit(1e6))
        ).alias("avg_rouge2_f"),
    )
    c = chrf_corpus(spark, sf_dir).select("avg_chrf2")
    w = wer_corpus(spark, sf_dir).select("wer")
    e = cer_corpus(spark, sf_dir).select("cer")
    return (
        b.crossJoin(r)
        .crossJoin(g)
        .crossJoin(c)
        .crossJoin(w)
        .crossJoin(e)
        .select(
            "n_pairs",
            "avg_rouge1_f",
            "avg_rouge2_f",
            "bleu",
            "gleu",
            "avg_chrf2",
            "wer",
            "cer",
        )
    )


def _eval_report_oracle() -> str:
    """Six certified corpus oracles nested verbatim, cross-joined (each
    keeps its own WITH [RECURSIVE] scope, so shared CTE names — e.g.
    both BLEU's and ROUGE's cand1_grams — cannot collide)."""
    rouge_mean = f"""
SELECT sum(cast(round(t.rouge1_f * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_rouge1_f,
       sum(cast(round(t.rouge2_f * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_rouge2_f
FROM ({ORACLES["rouge_n"]}) t
"""
    return f"""
SELECT b.n_pairs, r.avg_rouge1_f, r.avg_rouge2_f, b.bleu, g.gleu,
       c.avg_chrf2, w.wer, e.cer
FROM ({ORACLES["bleu_corpus"]}) b
CROSS JOIN ({rouge_mean}) r
CROSS JOIN ({ORACLES["gleu_corpus"]}) g
CROSS JOIN ({ORACLES["chrf_corpus"]}) c
CROSS JOIN ({ORACLES["wer_corpus"]}) w
CROSS JOIN ({ORACLES["cer_corpus"]}) e
"""


ORACLES["eval_report"] = _eval_report_oracle()
QUERIES["eval_report"] = eval_report

# ---------------------------------------------------------------------------
# eval_sweep (r17): the per-source sweep of the whole eval family — the
# reference's per-product sweep pattern (M6, BigdataProjectCode.py:
# 258-288) generalized from ROUGE alone to every metric the family
# ships: macro ROUGE-1/2 F (rouge_sweep verbatim), per-source corpus
# BLEU and GLEU (micro-averaged WITHIN each source over one shared
# component-kernel pass), macro chrF2, micro WER/CER.  One row per
# source.
#
# Scale shape: every arm is (zero-shuffle Arrow map) -> (join to the
# O(1)-per-pair src map) -> (one partial-aggregated groupBy(source));
# the final assembly joins O(sources)-row frames — dim-sized, broadcast
# by AQE.  The oracle nests the per-metric machinery with a shared src
# CTE per subquery scope (the eval_report precedent).
# ---------------------------------------------------------------------------

_SRC_CTE = """
src AS (
  SELECT cast(doc_id / 2 AS bigint) AS pair_id, source
  FROM documents WHERE doc_id % 2 = 0
)"""


def _src_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select(
            (F.col("doc_id") / 2).cast("long").alias("pair_id"),
            "source",
        )
    )


def eval_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _src_map(spark, sf_dir)
    comp = _bleu_components(spark, sf_dir).join(src, "pair_id")

    bsum = comp.groupBy("source").agg(
        *[
            F.sum(f"m{n}").cast("long").alias(f"m{n}")
            for n in range(1, _BLEU_MAX_N + 1)
        ],
        *[
            F.sum(f"t{n}").cast("long").alias(f"t{n}")
            for n in range(1, _BLEU_MAX_N + 1)
        ],
        F.sum("r_len").cast("long").alias("r_len"),
    )
    bleu = bsum.select(
        "source", r6(_bleu_expr(smooth=False)).alias("bleu")
    )

    gsum = _gleu_staged(comp).groupBy("source").agg(
        F.sum("m_pool").cast("long").alias("m_pool"),
        F.sum("t_pool").cast("long").alias("t_pool"),
        F.sum("rt_pool").cast("long").alias("rt_pool"),
    )
    gleu = gsum.select("source", r6(_gleu_expr()).alias("gleu"))

    chrf = (
        chrf_pairs(spark, sf_dir)
        .join(src, "pair_id")
        .groupBy("source")
        .agg(
            (
                F.sum(F.round(F.col("chrf2") * 1e6).cast("long"))
                / (F.count("*") * F.lit(1e6))
            ).alias("avg_chrf2")
        )
    )

    def _rate(per_pair: DataFrame, out: str) -> DataFrame:
        sums = per_pair.join(src, "pair_id").groupBy("source").agg(
            F.sum("edits").cast("long").alias("edits"),
            F.sum("n_ref").cast("long").alias("n_ref"),
        )
        rate = F.when(
            F.col("n_ref") > 0, F.col("edits") / F.col("n_ref")
        ).otherwise(F.lit(0.0))
        return sums.select("source", r6(rate).alias(out))

    wer = _rate(wer_pairs(spark, sf_dir), "wer")
    cer = _rate(cer_pairs(spark, sf_dir), "cer")

    return (
        rouge_sweep(spark, sf_dir)
        .join(bleu, "source")
        .join(gleu, "source")
        .join(chrf, "source")
        .join(wer, "source")
        .join(cer, "source")
        .select(
            "source",
            "n_pairs",
            "avg_rouge1_f",
            "avg_rouge2_f",
            "bleu",
            "gleu",
            "avg_chrf2",
            "wer",
            "cer",
        )
    )


def _eval_sweep_oracle() -> str:
    bleu_src = f"""
WITH {PAIRS_CTE},
{_bleu_components_cte()},
{_SRC_CTE},
bsums AS (
  SELECT s.source,
         {", ".join(f"sum(m{n}) AS m{n}, sum(t{n}) AS t{n}" for n in range(1, _BLEU_MAX_N + 1))},
         sum(r_len) AS r_len
  FROM comp JOIN src s ON comp.pair_id = s.pair_id
  GROUP BY s.source
)
SELECT source, {_bleu_sql(smooth=False)} AS bleu FROM bsums
"""
    gleu_src = f"""
WITH {PAIRS_CTE},
{_bleu_components_cte()},
{_SRC_CTE},
pooled AS (
  SELECT pair_id,{_GLEU_POOL_SQL}
  FROM comp
),
gsums AS (
  SELECT s.source, sum(m_pool) AS m_pool, sum(t_pool) AS t_pool,
         sum(rt_pool) AS rt_pool
  FROM pooled JOIN src s ON pooled.pair_id = s.pair_id
  GROUP BY s.source
)
SELECT source, {_gleu_sql()} AS gleu FROM gsums
"""
    chrf_src = f"""
WITH {PAIRS_CTE},
{_chrf_components_cte()},
{_SRC_CTE},
scored AS (
  SELECT pair_id, {_chrf_sql()} AS chrf2 FROM ccomp
)
SELECT s.source,
       sum(cast(round(chrf2 * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_chrf2
FROM scored JOIN src s ON scored.pair_id = s.pair_id
GROUP BY s.source
"""
    wer_src = f"""
WITH RECURSIVE {PAIRS_CTE},
{_WER_LEV_CTES},
{_SRC_CTE}
SELECT s.source,
       (round(CASE WHEN sum(n) > 0
                   THEN sum(edits) * 1.0 / sum(n)
                   ELSE 0.0 END, 6) + 0.0) AS wer
FROM lev_out JOIN src s ON lev_out.pair_id = s.pair_id
GROUP BY s.source
"""
    cer_src = f"""
WITH RECURSIVE {PAIRS_CTE},
{_CER_LEV_CTES},
{_SRC_CTE}
SELECT s.source,
       (round(CASE WHEN sum(n) > 0
                   THEN sum(edits) * 1.0 / sum(n)
                   ELSE 0.0 END, 6) + 0.0) AS cer
FROM lev_out JOIN src s ON lev_out.pair_id = s.pair_id
GROUP BY s.source
"""
    return f"""
SELECT r.source, r.n_pairs, r.avg_rouge1_f, r.avg_rouge2_f,
       b.bleu, g.gleu, c.avg_chrf2, w.wer, e.cer
FROM ({ORACLES["rouge_sweep"]}) r
JOIN ({bleu_src}) b ON r.source = b.source
JOIN ({gleu_src}) g ON r.source = g.source
JOIN ({chrf_src}) c ON r.source = c.source
JOIN ({wer_src}) w ON r.source = w.source
JOIN ({cer_src}) e ON r.source = e.source
"""


ORACLES["eval_sweep"] = _eval_sweep_oracle()
QUERIES["eval_sweep"] = eval_sweep

# ---------------------------------------------------------------------------
# Self-BLEU (r17): the standard diversity statistic for a generated
# corpus (Zhu et al. 2018, Texygen): score every document as a BLEU
# candidate against OTHER documents of the same corpus as references —
# high self-BLEU = the corpus repeats itself, low = diverse.  This is
# the metric a synthetic-training-data pipeline reports per batch, and
# it adds the family's first MULTI-REFERENCE BLEU surface (clipping
# against the per-gram MAX across references, Papineni §2.1).
#
# Scale design: exact self-BLEU references ALL n-1 other documents —
# O(n²) work that no 100 TB corpus can afford.  The bounded form here
# references K=3 ring neighbors in doc_id space ((doc_id + j) % n,
# j=1..3): deterministic, O(n·K), three shuffle equi-joins — and an
# unbiased diversity probe when ids carry no content order (ours are
# ingest-assigned).  The ring assumes contiguous 0..n-1 ids (the
# fixture contract; re-index upstream if sparse).  Conventions,
# documented like chrF's fixed-order note: brevity-penalty reference
# length = the SHORTEST reference (the conservative NIST choice —
# sacrebleu's multi-ref default is closest-length; on this fixture's
# near-equal lengths the choice rarely binds), smoothed sentence form
# per doc, corpus roll-up = macro mean of the rounded per-doc scores
# (the Texygen convention, via exact integer micro-units).
# ---------------------------------------------------------------------------

_SELF_BLEU_K = 3


def _self_bleu_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc multi-reference BLEU components: clipped matches m1..m4
    (per-gram max across the K ring references), candidate totals
    t1..t4, and r_len = the shortest reference's token count."""
    import re

    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.count("*").cast("long").alias("n"))
    cur = docs.crossJoin(F.broadcast(n))
    for j in range(1, _SELF_BLEU_K + 1):
        r = docs.select(
            F.col("doc_id").alias(f"rid{j}"),
            F.col("text").alias(f"ref{j}_text"),
        )
        cur = cur.join(
            r, F.pmod(cur["doc_id"] + F.lit(j), cur["n"]) == r[f"rid{j}"]
        ).drop(f"rid{j}")
    cur = cur.select(
        "doc_id", "text", *[f"ref{j}_text" for j in range(1, _SELF_BLEU_K + 1)]
    )

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + _BLEU_COMPONENTS_SCHEMA.fields[1:]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = re.compile(r"[a-z0-9]+")

        def grams(toks, nn):
            return Counter(
                " ".join(toks[i : i + nn]) for i in range(len(toks) - nn + 1)
            )

        for pdf in batches:
            rows = []
            ref_cols = [
                pdf[f"ref{j}_text"] for j in range(1, _SELF_BLEU_K + 1)
            ]
            for did, cand, *refs in zip(pdf["doc_id"], pdf["text"], *ref_cols):
                a = tok.findall(cand.lower())
                rtoks = [tok.findall(r.lower()) for r in refs]
                ms, ts = [], []
                for nn in range(1, _BLEU_MAX_N + 1):
                    ga = grams(a, nn)
                    gmax: Counter = Counter()
                    for rt in rtoks:
                        for g, c in grams(rt, nn).items():
                            if c > gmax[g]:
                                gmax[g] = c
                    ms.append(
                        sum(min(c, gmax[g]) for g, c in ga.items() if g in gmax)
                    )
                    ts.append(sum(ga.values()))
                rows.append((did, *ms, *ts, min(len(rt) for rt in rtoks)))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return cur.mapInPandas(score, schema=out_schema)


def self_bleu_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc smoothed self-BLEU with its exact integer components."""
    comp = _self_bleu_components(spark, sf_dir)
    return comp.select(
        "doc_id",
        *[f"m{n}" for n in range(1, _BLEU_MAX_N + 1)],
        *[f"t{n}" for n in range(1, _BLEU_MAX_N + 1)],
        "r_len",
        r6(_bleu_expr(smooth=True)).alias("self_bleu"),
    )


def self_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus self-BLEU: macro mean of the rounded per-doc scores via
    exact integer micro-units (the Texygen reporting convention; LOW is
    diverse)."""
    per = self_bleu_docs(spark, sf_dir)
    return per.agg(
        F.count("*").cast("long").alias("n_docs"),
        (
            F.sum(F.round(F.col("self_bleu") * 1e6).cast("long"))
            / (F.count("*") * F.lit(1e6))
        ).alias("avg_self_bleu"),
    )


def _self_gram_cte(side: str, n: int) -> str:
    """DuckDB n-gram CTE over (key, text) rows of `cand`/`refs` (the
    _ngram_cte shape keyed by doc_id, with refs also keyed by r_idx)."""
    if side == "cand":
        src, keys = "cand", "doc_id"
    else:
        src, keys = "refs", "doc_id, r_idx"
    lead_cols = ["w"] + [
        f"lead(w, {i}) OVER (PARTITION BY {keys} ORDER BY pos)"
        for i in range(1, n)
    ]
    concat = " || ' ' || ".join(lead_cols)
    qualify = (
        f"QUALIFY lead(w, {n - 1}) OVER (PARTITION BY {keys} ORDER BY pos)"
        " IS NOT NULL"
        if n > 1
        else ""
    )
    return f"""
{side}{n}_stoks AS (
  SELECT {keys}, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
         unnest(range(len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS pos
  FROM {src}
),
{side}{n}_sgrams AS (
  SELECT {keys}, g, count(*) AS cnt FROM (
    SELECT {keys}, {concat} AS g FROM {side}{n}_stoks {qualify}
  ) GROUP BY {keys}, g
)"""


def _self_bleu_comp_cte() -> str:
    grams = ",".join(
        _self_gram_cte(side, n)
        for n in range(1, _BLEU_MAX_N + 1)
        for side in ("cand", "ref")
    )
    per_n = ", ".join(
        f"""refmax{n} AS (
  SELECT doc_id, g, max(cnt) AS cnt FROM ref{n}_sgrams GROUP BY doc_id, g
),
sm{n} AS (
  SELECT c.doc_id, sum(least(c.cnt, m.cnt)) AS m
  FROM cand{n}_sgrams c JOIN refmax{n} m
    ON c.doc_id = m.doc_id AND c.g = m.g
  GROUP BY c.doc_id
),
st{n} AS (SELECT doc_id, sum(cnt) AS t FROM cand{n}_sgrams GROUP BY doc_id)"""
        for n in range(1, _BLEU_MAX_N + 1)
    )
    joins = " ".join(
        f"LEFT JOIN sm{n} ON d.doc_id = sm{n}.doc_id "
        f"LEFT JOIN st{n} ON d.doc_id = st{n}.doc_id"
        for n in range(1, _BLEU_MAX_N + 1)
    )
    cols = ", ".join(
        f"cast(coalesce(sm{n}.m, 0) AS bigint) AS m{n}, "
        f"cast(coalesce(st{n}.t, 0) AS bigint) AS t{n}"
        for n in range(1, _BLEU_MAX_N + 1)
    )
    return f"""nn AS (SELECT count(*) AS n FROM documents),
cand AS (SELECT doc_id, text FROM documents),
refs AS (
  SELECT d.doc_id, ridx.r_idx, r.text
  FROM documents d
  CROSS JOIN nn
  CROSS JOIN (VALUES (1), (2), (3)) AS ridx(r_idx)
  JOIN documents r ON r.doc_id = (d.doc_id + ridx.r_idx) % nn.n
),
{grams},
{per_n},
rl AS (
  SELECT doc_id, r_idx,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS l
  FROM refs
),
rlen AS (SELECT doc_id, cast(min(l) AS bigint) AS r_len FROM rl GROUP BY doc_id),
scomp AS (
  SELECT d.doc_id, {cols}, rlen.r_len
  FROM cand d {joins} JOIN rlen ON d.doc_id = rlen.doc_id
)"""


ORACLES["self_bleu_docs"] = f"""
WITH {_self_bleu_comp_cte()}
SELECT doc_id, m1, m2, m3, m4, t1, t2, t3, t4, r_len,
       {_bleu_sql(smooth=True)} AS self_bleu
FROM scomp
"""
QUERIES["self_bleu_docs"] = self_bleu_docs

ORACLES["self_bleu_corpus"] = f"""
WITH {_self_bleu_comp_cte()},
sscored AS (
  SELECT doc_id, {_bleu_sql(smooth=True)} AS self_bleu FROM scomp
)
SELECT cast(count(*) AS bigint) AS n_docs,
       sum(cast(round(self_bleu * 1000000) AS bigint)) / (count(*) * 1000000.0)
         AS avg_self_bleu
FROM sscored
"""
QUERIES["self_bleu_corpus"] = self_bleu_corpus

# ---------------------------------------------------------------------------
# wer_ingest (r17): the eval-family member of the ingest-gate family
# (ppl_ingest / clf_ingest / near_dup_ingest / phash_ingest …): arriving
# CANDIDATE texts are scored against a STATIC reference corpus and
# admitted iff their word error rate clears a threshold — the admission
# gate an ASR/transcription pipeline runs before letting machine output
# into a training corpus.  Candidates play the stream side (even
# doc_ids, the pair fixture's split); the odd-id references are the
# precomputed static side.
#
# Stream legality: ONE stream-static equi-join on pair_id (append-mode
# legal, zero state) followed by the zero-shuffle WER Arrow kernel and
# row-local projections; tests/test_streaming.py runs the same builder
# over an actual readStream and asserts stream == batch.  The keep
# decision is INTEGER-only (edits * WER_KEEP_DEN <= n_ref *
# WER_KEEP_NUM  <=>  wer <= NUM/DEN) — no float in the admission
# boolean, the clf_ingest discipline.
# ---------------------------------------------------------------------------

WER_KEEP_NUM = 4  # admit iff wer <= 4/5 (an empty reference admits only
WER_KEEP_DEN = 5  # an empty candidate: edits*5 <= 0 <=> edits = 0)


def wer_ingest_score(new_docs: DataFrame, refs: DataFrame) -> DataFrame:
    """The gate over any arriving (doc_id, text) frame — batch or
    stream — against a static (pair_id, ref_text) reference frame."""
    cand = new_docs.select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        F.col("text").alias("cand_text"),
    )
    scored = wer_from(cand.join(refs, "pair_id"))
    return scored.select(
        "pair_id",
        "n_cand",
        "n_ref",
        "edits",
        "wer",
        (
            F.col("edits") * F.lit(WER_KEEP_DEN)
            <= F.col("n_ref") * F.lit(WER_KEEP_NUM)
        ).alias("keep"),
    )


def wer_ingest_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static reference side (a deployment materializes this once)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .select(
            ((F.col("doc_id") - 1) / 2).cast("long").alias("pair_id"),
            F.col("text").alias("ref_text"),
        )
    )


def wer_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming WER admission gate: even-id docs play
    the arriving candidates, odd-id docs the static references."""
    docs = load_table(spark, sf_dir, "documents")
    return wer_ingest_score(
        docs.filter(F.col("doc_id") % 2 == 0), wer_ingest_refs(spark, sf_dir)
    )


ORACLES["wer_ingest"] = f"""
WITH RECURSIVE {PAIRS_CTE},
{_WER_LEV_CTES}
SELECT pair_id,
       cast(m AS bigint) AS n_cand,
       cast(n AS bigint) AS n_ref,
       cast(edits AS bigint) AS edits,
       (round(CASE WHEN n > 0
                   THEN edits * 1.0 / n
                   ELSE 0.0 END, 6) + 0.0) AS wer,
       (edits * {WER_KEEP_DEN} <= n * {WER_KEEP_NUM}) AS keep
FROM lev_out
"""
QUERIES["wer_ingest"] = wer_ingest
