"""Sink-layout tests: the write-side half of the 100 TB posture.

Bucketed writes must produce shuffle-free joins; partitioned writes must
produce pruned scans.  Both are asserted on the physical plan, not assumed.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdataanalytics_textsummarization_spark.io import (
    load_table,
    write_bucketed,
    write_partitioned,
)
from tests.conftest import SF_DIR


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # clear any orphaned managed-table locations from prior runs
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "li_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "li_b", "o_orderkey", 4
    )
    # force the fact-fact join path (at real scale neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("orders_b"), "o_orderkey")
        plan = _formatted(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed equi-join must not shuffle"
        assert "Bucketed: true" in plan
        # correctness: same row count as the plain join
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS li_b")


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_part")
    write_partitioned(docs, out, "source")
    one = spark.read.parquet(out).filter(F.col("source") == "web")
    plan = _formatted(one)
    assert "PartitionFilters" in plan
    # the filter must be a partition filter, not a data filter
    assert "isnotnull(source" in plan or "source" in plan.split("PartitionFilters")[1][:200]
    # round-trip correctness
    want = docs.filter(F.col("source") == "web").count()
    assert one.count() == want


def test_jsonl_roundtrip(spark, tmp_path):
    from bigdataanalytics_textsummarization_spark.io import read_jsonl, write_jsonl

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, "source")
    back = read_jsonl(spark, out, schema=docs.schema)
    a = normalize_cols(docs.toPandas())
    b = normalize_cols(back.select("doc_id", "source", "text").toPandas())
    assert a.equals(b)


def normalize_cols(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_partitioned_write_roundtrip_full(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_part")
    write_partitioned(ev.withColumn("day", F.to_date("ts")), out, "day")
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert "day" in back.columns


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from bigdataanalytics_textsummarization_spark.io import compact_parquet, load_table
    from tests.conftest import SF_DIR
    import os

    src = str(tmp_path / "fragmented")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(64).write.parquet(src)  # simulate a fragmented landing zone
    n_in = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_in >= 32

    out = str(tmp_path / "compacted")
    compact_parquet(spark, src, out)
    n_out = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_out < n_in / 8
    assert spark.read.parquet(out).count() == ev.count()


def test_compact_parquet_sorted_gives_disjoint_file_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdataanalytics_textsummarization_spark.io import compact_parquet, load_table
    from tests.conftest import SF_DIR
    import os

    src = str(tmp_path / "fragmented")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(16).write.parquet(src)
    out = str(tmp_path / "clustered")
    # tiny target so several output files exist even at test scale
    compact_parquet(spark, src, out, target_file_bytes=8 * 1024, sort_cols=("ts",))
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) >= 2
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        if r["lo"] is not None:
            ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    # range-clustered output: file value ranges must not overlap, which is
    # exactly what lets parquet min/max stats skip whole files
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next
    total = spark.read.parquet(out).count()
    assert total == ev.count()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from bigdataanalytics_textsummarization_spark.io import read_orc, write_orc

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out, "source")
    back = read_orc(spark, out)
    a = normalize_cols(docs.toPandas())
    b = normalize_cols(back.select("doc_id", "source", "text").toPandas())
    assert a.equals(b)
    # same pushdown/pruning contract as the parquet scans
    plan = (
        back.filter(back.doc_id < 10)
        .select("doc_id")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)" in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_parquet_schema_evolution_merges_columns(spark, tmp_path):
    from bigdataanalytics_textsummarization_spark.io import read_parquet_evolving

    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["doc_id", "text"]).write.parquet(out)
    spark.createDataFrame(
        [(2, "b", "en")], ["doc_id", "text", "lang"]
    ).write.mode("append").parquet(out)
    back = read_parquet_evolving(spark, out)
    assert set(back.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows[1]["lang"] is None  # old files surface the new column as null
    assert rows[2]["lang"] == "en"


def test_bucketed_snapshot_diff_is_shuffle_free(spark):
    """PLANS.md claims the CDC diff goes exchange-free when both snapshot
    versions are bucketed by the key — the deployment posture of an
    incremental landing zone.  Write the two derived snapshots bucketed
    by doc_id and assert the full-outer diff join plans with no Exchange,
    and that its delta equals the unbucketed snapshot_diff."""
    import shutil

    from bigdataanalytics_textsummarization_spark.extensions.snapshot import (
        _new_snapshot,
        _old_snapshot,
        snapshot_diff,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("snap_old_b", "snap_new_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    write_bucketed(_old_snapshot(docs), "snap_old_b", "doc_id", n_buckets=4)
    write_bucketed(_new_snapshot(docs), "snap_new_b", "doc_id", n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("snap_old_b").alias("o")
        n = spark.table("snap_new_b").alias("n")
        joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
        diff = joined.select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            F.when(F.col("o.doc_id").isNull(), F.lit("added"))
            .when(F.col("n.doc_id").isNull(), F.lit("removed"))
            .when(F.col("o.row_hash") != F.col("n.row_hash"), F.lit("changed"))
            .alias("change"),
        ).filter(F.col("change").isNotNull())
        plan = _formatted(diff)
        assert "SortMergeJoin FullOuter" in plan
        assert "Exchange" not in plan, "bucketed CDC diff must not shuffle"
        got = {(r.doc_id, r.change) for r in diff.collect()}
        want = {
            (r.doc_id, r.change) for r in snapshot_diff(spark, SF_DIR).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS snap_old_b")
        spark.sql("DROP TABLE IF EXISTS snap_new_b")


def test_tar_shard_ingest_webdataset_layout(spark, tmp_path):
    """WebDataset-style shards: N tar files, same-stem .txt/.cls members;
    read_tar_shards explodes every member with correct stems/suffixes and
    byte-exact payloads, and samples regroup by (shard, stem)."""
    import tarfile

    from bigdataanalytics_textsummarization_spark.io import read_tar_shards

    shards = tmp_path / "shards"
    shards.mkdir()
    want = {}
    for s in range(3):
        p = shards / f"shard-{s:04d}.tar"
        with tarfile.open(p, "w") as tf:
            for i in range(4):
                stem = f"{s:02d}{i:04d}"
                for suffix, payload in (
                    ("txt", f"document {s}/{i} text".encode()),
                    ("cls", str(i % 2).encode()),
                ):
                    data = payload
                    info = tarfile.TarInfo(name=f"{stem}.{suffix}")
                    info.size = len(data)
                    import io as _io

                    tf.addfile(info, _io.BytesIO(data))
                    want[(f"shard-{s:04d}.tar", stem, suffix)] = data
    (shards / "ignore.bin").write_bytes(b"not a shard")  # glob-filtered

    out = read_tar_shards(spark, str(shards)).toPandas()
    assert len(out) == len(want) == 24
    import os

    for r in out.itertuples():
        key = (os.path.basename(r.shard), r.stem, r.suffix)
        assert bytes(r.content) == want[key]
        assert r.n_bytes == len(want[key])
    # WebDataset sample grouping: every (shard, stem) carries both parts
    grouped = out.groupby(["shard", "stem"])["suffix"].apply(set)
    assert all(s == {"txt", "cls"} for s in grouped)


def test_build_tar_shards_roundtrip_and_determinism(spark, tmp_path):
    """Distributed shard build: same-stem samples co-shard, archives are
    byte-deterministic across runs, and writing then re-reading through
    read_tar_shards reproduces every payload exactly."""
    import pandas as pd

    from bigdataanalytics_textsummarization_spark.io import (
        build_tar_shards,
        read_tar_shards,
    )

    rows = []
    for i in range(40):
        stem = f"{i:06d}"
        rows.append((stem, "txt", f"text {i}".encode()))
        rows.append((stem, "cls", str(i % 3).encode()))
    samples = spark.createDataFrame(
        pd.DataFrame(rows, columns=["stem", "suffix", "content"])
    )
    shards = build_tar_shards(samples, n_shards=4).toPandas()
    assert shards["n_members"].sum() == 80
    again = build_tar_shards(samples, n_shards=4).toPandas()
    a = shards.sort_values("shard").reset_index(drop=True)
    b = again.sort_values("shard").reset_index(drop=True)
    assert [bytes(x) for x in a["tar"]] == [bytes(x) for x in b["tar"]]

    out_dir = tmp_path / "out_shards"
    out_dir.mkdir()
    for r in shards.itertuples():  # the caller's sink
        (out_dir / f"shard-{r.shard:04d}.tar").write_bytes(bytes(r.tar))
    back = read_tar_shards(spark, str(out_dir)).toPandas()
    assert len(back) == 80
    want = {(s, x): c for s, x, c in rows}
    for r in back.itertuples():
        assert bytes(r.content) == want[(r.stem, r.suffix)]
    # same-stem members always co-shard
    per_stem = back.groupby("stem")["shard"].nunique()
    assert (per_stem == 1).all()


def test_avro_roundtrip_or_clear_guard(spark, tmp_path):
    """Avro is built-in-but-external since Spark 2.4: when the connector
    jar is deployed, the entry points must roundtrip like ORC; when it is
    absent (this container), they must fail with the deployment-pointing
    message, not Spark's generic FAILED_TO_FIND_DATA_SOURCE."""
    import pytest

    from bigdataanalytics_textsummarization_spark.io import (
        avro_available,
        read_avro,
        write_avro,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "docs_avro")
    if avro_available(spark):
        write_avro(docs, out, "source")
        back = read_avro(spark, out)
        a = normalize_cols(docs.toPandas())
        b = normalize_cols(back.select("doc_id", "source", "text").toPandas())
        assert a.equals(b)
    else:
        with pytest.raises(RuntimeError, match="spark-avro connector"):
            write_avro(docs, out)
        with pytest.raises(RuntimeError, match="spark-avro connector"):
            read_avro(spark, out)
