"""Lint every registered oracle's OUTPUT TYPES without executing it.

The round driver hashes typed values, so a DuckDB HUGEINT/DECIMAL output
column red-flags against Spark's BIGINT/DOUBLE even when every value is
equal.  This bit us in round 1 (q12) and round 2 (pack_sequences,
curation_pipeline): DuckDB promotes sum(BIGINT) -> HUGEINT and any
arithmetic on it stays HUGEINT unless cast back.

DuckDB relations are lazy — `.types` comes from binding/planning only —
so this lint covers the expensive recursive-CTE oracles too, in
milliseconds.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from bigdataanalytics_textsummarization_spark.io import TABLES
from tests.conftest import SF_DIR

# Types Spark can emit from our queries (and that the driver's hash treats
# identically on both sides).  Everything DuckDB-only — HUGEINT, UHUGEINT,
# DECIMAL, FLOAT, INTEGER widths Spark wouldn't produce — is banned.
_ALLOWED_PREFIXES = (
    "BIGINT",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",  # TIMESTAMP / TIMESTAMP_NS / TIMESTAMP WITH TIME ZONE
    "INTEGER",    # only where the Spark side deliberately emits int32
)


def _oracle_items():
    return sorted(entry.oracle_sql().items())


@pytest.fixture(scope="module")
def lint_con():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_types_are_hashable(lint_con, name, sql):
    rel = lint_con.sql(sql)
    bad = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, [str(t).upper() for t in rel.types])
        if not any(typ.startswith(p) for p in _ALLOWED_PREFIXES)
        or typ.startswith("INTERVAL")
    ]
    assert not bad, (
        f"oracle '{name}' emits driver-hash-unsafe output types: {bad} — "
        "cast to BIGINT/DOUBLE/VARCHAR (DuckDB sum() promotes to HUGEINT)"
    )
