"""Shared fixtures: one SparkSession per test run + a DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from bigdataanalytics_textsummarization_spark.io import TABLES
from bigdataanalytics_textsummarization_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(app="tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — mirrors the driver's
    order-insensitive compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def assert_parity(spark, oracle, qfn, sql, sf_dir=SF_DIR):
    got = normalize(qfn(spark, sf_dir).toPandas())
    want = normalize(oracle.sql(sql).df())
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            # Bit-exact, like the driver's typed value-hash: a tolerance
            # compare cannot catch the -0.0/+0.0 class that shipped
            # embedding_cov red in rounds 5-6 (float-parity convention #4).
            import numpy as np

            gb = g.astype("float64").to_numpy().view("int64")
            wb = w.astype("float64").to_numpy().view("int64")
            same = gb == wb
            assert same.all(), (
                f"column {c}: first float bit-mismatch at row "
                f"{int((~same).argmax())}: "
                f"{g[~same].head(3).tolist()} != {w[~same].head(3).tolist()}"
            )
            neg_zero = np.array([-0.0]).view("int64")[0]
            assert not (gb == neg_zero).any(), f"column {c} emits -0.0"
        else:
            same = (g.astype(str).values == w.astype(str).values)
            assert same.all(), (
                f"column {c}: first mismatch at row {int((~same).argmax())}: "
                f"{g[~same].head(3).tolist()} != {w[~same].head(3).tolist()}"
            )


def write_docs(tmp_path_factory, name: str, texts: list[str]) -> str:
    """Write a documents.parquet fixture with the real table shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp(name)
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            # explicit string dtype: an EMPTY texts list would otherwise
            # infer float64 and write a DOUBLE parquet column
            "text": pd.array(texts, dtype="string"),
            "lang": pd.array(["en"] * len(texts), dtype="string"),
            "source": pd.array(["s1"] * len(texts), dtype="string"),
        }
    )
    # astype("string") first: .str on an empty object column raises
    docs["n_chars"] = (
        docs["text"].astype("string").str.len().fillna(0).astype("int64")
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(d / "documents.parquet"),
    )
    return str(d)
