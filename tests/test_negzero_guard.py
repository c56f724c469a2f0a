"""Float-parity convention #4: no value-gated column may emit IEEE -0.0.

Root cause (rounds 5-6 `embedding_cov` red row): a tiny negative that
rounds to zero keeps its sign bit in DuckDB (``round(-1e-9, 6)`` ->
-0.0) and in Python (``round(-1e-9, 6)`` -> -0.0) but not in Spark
(``F.round`` -> +0.0).  The values compare EQUAL (``-0.0 == 0.0``), so
tolerance-based sweeps said 165/165 green while the driver's typed
value-hash red-flagged — for two consecutive rounds.

The convention: every rounding that can straddle zero adds ``+ 0.0``
(the IEEE identity that maps -0.0 -> +0.0 and nothing else) on BOTH
engines — ``r6()``/``r2()`` on the Spark side, ``(round(expr, 6) + 0.0)``
in the DuckDB oracles, ``round(x, 6) + 0.0`` in Pandas-UDF Python.

Guards here:
1. engine-level unit proofs that the hazard is real and the guard kills it,
2. a static lint that every bare ``round(expr, 6|2)`` in every registered
   oracle is ``+ 0.0``-guarded (paren-matched, so multi-line calls and
   nested ``round(x * 100)`` cent-casts are handled correctly).
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from bigdataanalytics_textsummarization_spark.functions import r2, r6


def _is_neg_zero(x: float) -> bool:
    return x == 0.0 and math.copysign(1.0, x) < 0


def test_python_round_hazard_is_real():
    # documents WHY UDF-side rounding needs the guard
    assert _is_neg_zero(round(-1e-9, 6))
    assert not _is_neg_zero(round(-1e-9, 6) + 0.0)


def test_duckdb_round_hazard_is_real():
    con = duckdb.connect()
    raw, guarded = con.sql(
        "SELECT round(-1e-9, 6), round(-1e-9, 6) + 0.0"
    ).fetchone()
    assert _is_neg_zero(raw)
    assert not _is_neg_zero(guarded)


def test_r6_r2_normalize_negative_zero(spark):
    row = (
        spark.range(1)
        .select(
            r6(F.lit(-1e-9)).alias("a"),
            r2(F.lit(-1e-9)).alias("b"),
            # -0.0 fed straight through the rounding must also normalize
            r6(F.lit(-0.0)).alias("c"),
            r2(F.lit(-0.0)).alias("d"),
            # sanity: the guard is the identity away from zero
            r6(F.lit(-1.25)).alias("e"),
        )
        .collect()[0]
    )
    for col in ("a", "b", "c", "d"):
        assert not _is_neg_zero(row[col]), col
        assert row[col] == 0.0, col
    assert row["e"] == -1.25


def _bare_round_spans(sql: str, prec: int):
    """(start, end) spans of bare round(<balanced>, prec) calls."""
    for m in re.finditer(r"round\(", sql):
        i = m.start()
        if i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "._"):
            continue  # function-namespaced, e.g. list-lambda locals
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        if depth:
            continue
        inner = sql[m.end() : j - 1]
        if re.search(r",\s*" + str(prec) + r"\s*$", inner):
            yield i, j


def _oracle_items():
    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_every_oracle_round_is_negzero_guarded(name, sql):
    unguarded = []
    for prec in (6, 2):
        for i, j in _bare_round_spans(sql, prec):
            if not re.match(r"\s*\+\s*0\.0", sql[j : j + 12]):
                unguarded.append(sql[i : j + 8].replace("\n", " ")[:90])
    assert not unguarded, (
        f"{name}: round(x, 6|2) without the '+ 0.0' -0.0 guard "
        f"(convention #4): {unguarded}"
    )
