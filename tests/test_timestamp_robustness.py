"""Non-midnight-timestamp fixture for the date-arithmetic divergence class.

All driver testdata orderdates are midnight, so `F.date_add(ts, 60)` (which
truncates TIMESTAMP->DATE) silently agrees with the oracle's
`+ INTERVAL 60 DAY` — until it doesn't (q12 red in round 1; q21 carried the
same latent bug through round 2).  This fixture pins rows where the two
formulations genuinely disagree: a lineitem shipped at 06:00 on the 60th
day after a 13:45 order is ONTIME under interval arithmetic but LATE under
date truncation.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdataanalytics_textsummarization_spark import tpch
from tests.conftest import assert_parity


def _write(path, df: pd.DataFrame) -> None:
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    # testdata parquet carries TIMESTAMP(MICROS); match it
    fields = [
        pa.field(f.name, pa.timestamp("us")) if pa.types.is_timestamp(f.type) else f
        for f in tbl.schema
    ]
    pq.write_table(tbl.cast(pa.schema(fields)), path)


@pytest.fixture(scope="module")
def nonmidnight_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nonmidnight")
    _write(
        d / "orders.parquet",
        pd.DataFrame(
            {
                "o_orderkey": pd.array([1, 2, 3], dtype="int64"),
                "o_custkey": pd.array([1, 1, 2], dtype="int64"),
                "o_orderstatus": ["F", "F", "F"],
                "o_totalprice": [100.0, 200.0, 300.0],
                "o_orderdate": [
                    datetime(1996, 1, 10, 13, 45, 30),
                    datetime(1996, 2, 1, 8, 30, 0),
                    datetime(1996, 1, 1),  # midnight control
                ],
                "o_orderpriority": ["1-URGENT", "5-LOW", "2-HIGH"],
            }
        ),
    )
    li = pd.DataFrame(
        {
            "l_orderkey": pd.array([1, 1, 2, 2, 3], dtype="int64"),
            "l_partkey": pd.array([1, 2, 1, 2, 1], dtype="int64"),
            "l_suppkey": pd.array([10, 11, 10, 11, 10], dtype="int64"),
            "l_linenumber": pd.array([1, 2, 1, 2, 1], dtype="int32"),
            "l_quantity": [1.0] * 5,
            "l_extendedprice": [10.0] * 5,
            "l_discount": [0.0] * 5,
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": [
                # 60 days after order 1 is 1996-03-10 13:45:30.  06:00 that
                # day: LATE under date_add truncation, ONTIME under interval.
                datetime(1996, 3, 10, 6, 0, 0),
                datetime(1996, 3, 11),  # late both ways
                datetime(1996, 4, 1, 8, 30, 0),  # exactly +60d: not late
                datetime(1996, 4, 1, 10, 0, 0),  # 90 min past: late both ways
                datetime(1996, 2, 15),  # midnight control, ontime
            ],
        }
    )
    _write(d / "lineitem.parquet", li)
    _write(
        d / "supplier.parquet",
        pd.DataFrame(
            {
                "s_suppkey": pd.array([10, 11], dtype="int64"),
                "s_name": ["Supplier#10", "Supplier#11"],
                "s_nationkey": pd.array([0, 0], dtype="int32"),
                "s_acctbal": [100.0, 100.0],
            }
        ),
    )
    return str(d)


@pytest.fixture(scope="module")
def nm_oracle(nonmidnight_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{nonmidnight_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_q12_nonmidnight_parity(spark, nm_oracle, nonmidnight_dir):
    assert_parity(
        spark,
        nm_oracle,
        tpch.q12_late_shipments,
        tpch.ORACLES["q12_late_shipments"],
        sf_dir=nonmidnight_dir,
    )


def test_q21_nonmidnight_parity(spark, nm_oracle, nonmidnight_dir):
    assert_parity(
        spark,
        nm_oracle,
        tpch.q21_waiting_suppliers,
        tpch.ORACLES["q21_waiting_suppliers"],
        sf_dir=nonmidnight_dir,
    )


def test_q21_interval_semantics(spark, nonmidnight_dir):
    """Order 1's 06:00 shipment is ONTIME under interval arithmetic, so
    supplier 11 is the lone late shipper on BOTH multi-supplier orders
    (numwait=2).  Under date_add truncation order 1 reads two late
    suppliers and drops out (numwait=1) — this pin flips if the truncating
    formulation ever comes back."""
    rows = tpch.q21_waiting_suppliers(spark, nonmidnight_dir).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("Supplier#11", 2)]


def test_event_funnel_requires_strict_order(spark, tmp_path):
    """A purchase BEFORE the first click doesn't complete the funnel: steps
    counts the longest in-order prefix, not presence of event types."""
    from datetime import datetime

    from bigdataanalytics_textsummarization_spark.relational_ext import event_funnel

    ev = pd.DataFrame(
        {
            "event_id": pd.array(range(6), dtype="int64"),
            "ts": [
                # user 1: view -> click -> purchase (in order, tight)
                datetime(2024, 1, 1, 10, 0),
                datetime(2024, 1, 1, 10, 5),
                datetime(2024, 1, 1, 10, 10),
                # user 2: purchase BEFORE view/click
                datetime(2024, 1, 1, 9, 0),
                datetime(2024, 1, 1, 10, 0),
                datetime(2024, 1, 1, 10, 5),
            ],
            "user_id": pd.array([1, 1, 1, 2, 2, 2], dtype="int64"),
            "event_type": ["view", "click", "purchase", "purchase", "view", "click"],
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    d = tmp_path / "funnel"
    d.mkdir()
    _write(d / "events.parquet", ev)
    rows = {r["user_id"]: r.asDict() for r in event_funnel(spark, str(d)).collect()}
    assert rows[1]["steps"] == 3 and rows[1]["converted"] is True
    assert rows[2]["steps"] == 2 and rows[2]["converted"] is False
    assert rows[2]["purchase_ts"] is None
