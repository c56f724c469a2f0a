"""Every queries() entry with an oracle must match DuckDB at sf0.001.

This mirrors the driver's correctness gate (row count + schema + value
compare, order-insensitive) so parity breaks are caught locally before the
round's CORRECTNESS report.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_parity

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, oracle, name):
    from tests.conftest import SF_DIR

    # golden-snapshot oracles are pinned to the driver's gate scale
    # (sf0.01); at any other SF the snapshot is the wrong ground truth
    if "tests/golden/sf0.01" in ORACLES[name] and not SF_DIR.endswith("sf0.01"):
        pytest.skip("golden oracle is sf0.01-only; covered by driver_sim")
    assert_parity(spark, oracle, QUERIES[name], ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, oracle, name):
    from tests.conftest import SF_DIR

    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
