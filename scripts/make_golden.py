"""Regenerate the committed golden parquet fixtures in tests/golden/.

SVD output is not SQL-expressible, but it IS deterministic (sign-fixed
singular vectors, id-tiebroken top-n, weights rounded to 6 decimals), so
the LSA queries are value-gated against a committed golden snapshot at the
driver's gate scale (sf0.01): the oracle is `SELECT * FROM '<golden>'`.

Run this ONLY when an intentional semantic change to the LSA pipeline is
made; the diff of the regenerated parquet is the review surface.

Usage: python scripts/make_golden.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

from bigdataanalytics_textsummarization_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_QUERIES = [
    "lsa_concepts",
    "lsa_summary",
    "lsa_concepts_distributed",
    "compression_ratio",  # zlib bytes: deterministic for a fixed zlib build
    "bpe_vocab",  # deterministic merge argmax (count desc, pair lexicographic)
    "bpe_encode",  # integer-exact application of the deterministic merges
    "embedding_pca",  # sign-fixed eigh of the bounded covariance (LAPACK-deterministic)
    "knn_graph_descent",  # md5-keyed init + JVM folds + id tie-breaks: deterministic
]


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
        "sf0.01",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app="make-golden", cpus=8, shuffle_partitions=16)
    queries = entry.queries()
    wanted = sys.argv[1:] or GOLDEN_QUERIES
    unknown = set(wanted) - set(GOLDEN_QUERIES)
    if unknown:
        raise SystemExit(f"not golden-gated: {sorted(unknown)}")
    for name in wanted:
        pdf = queries[name](spark, SF_DIR).toPandas()
        key = sorted(pdf.columns)
        pdf = (
            pdf.reindex(key, axis=1)
            .sort_values(by=key, kind="mergesort")
            .reset_index(drop=True)
        )
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        print(f"{name}: {len(pdf)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
