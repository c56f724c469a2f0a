"""Sources and sinks (SURVEY.md §2.1 S1-S6).

The reference reads line-oriented TSV review files with positional field
splits (BigdataProjectCode.py:43/54/371) and enumerates a directory as a
poor-man's catalog (code:33/319).  Here every source is a declarative
``spark.read`` so Catalyst gets pushdown/pruning for free, and the directory
loop becomes a single multi-file scan with ``input_file_name()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import session_memo

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Exact 6-column contract of the reference's TSV review files
# (BigData-Final.pdf p.2 §IV.B; parsed positionally at BigdataProjectCode.py:43).
REVIEWS_SCHEMA = T.StructType(
    [
        T.StructField("review_id", T.StringType()),
        T.StructField("product_title", T.StringType()),
        T.StructField("star_rating", T.IntegerType()),
        T.StructField("vine", T.StringType()),
        T.StructField("verified_purchase", T.StringType()),
        T.StructField("review_body", T.StringType()),
    ]
)


@session_memo
def load_table(
    spark: SparkSession, sf_dir: str, name: str, min_partitions: int | None = None
) -> DataFrame:
    """Parquet scan of one synthetic table (column-pruned, filter-pushed).

    Session-memoized (r17): ``spark.read.parquet`` pays ~90-170 ms of
    driver work PER CALL (footer schema read + file listing), which
    multiplied across every query build was the single largest uniform
    construct cost in the bench.  The memo returns the same immutable
    scan frame for the session; release_pins() clears it with the other
    build memos.  (The testdata tables are immutable per sf_dir; a
    caller that rewrites a parquet path mid-session must not read it
    through this loader — none does.)

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark rejects
    by default; read it as long nanos and convert to a microsecond timestamp
    (sub-second precision is irrelevant to every consumer here).

    ``documents``/``embeddings`` default to widening the scan to
    ``defaultParallelism`` partitions: their consumers (shingling, minhash,
    ROUGE, TF-IDF, cosine top-k) are CPU-bound per row, and a small/single
    parquet file would otherwise pin the whole pipeline to one task.  When
    the scan already has >= that many splits (any real-scale dataset), this
    is a no-op — no shuffle is added at 100 TB.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_field = df.schema["ts"]
        if isinstance(ts_field.dataType, T.LongType):
            # integer div: double division loses precision above 2^53 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if min_partitions is None and name in ("documents", "embeddings"):
        min_partitions = spark.sparkContext.defaultParallelism
    if min_partitions and _estimated_scan_partitions(spark, path) < min_partitions:
        df = df.repartition(min_partitions)
    return df


def input_bytes(path: str) -> int:
    """Total on-disk bytes under a data path (file or directory).

    Pure filesystem arithmetic — no Spark job, no plan conversion.  On
    OSError (remote FS, missing path) it returns a huge sentinel so every
    size GATE built on it fails safe toward the big-data branch (skip the
    widening repartition; do not broadcast)."""
    import os as _os

    try:
        if _os.path.isdir(path):
            return sum(
                _os.path.getsize(_os.path.join(root, f))
                for root, _, files in _os.walk(path)
                for f in files
            )
        return _os.path.getsize(path)
    except OSError:
        return 1 << 60  # unknown: assume big


def _estimated_scan_partitions(spark: SparkSession, path: str) -> int:
    """Cheap estimate of how many splits a parquet scan will produce.

    Pure filesystem arithmetic (bytes / maxPartitionBytes) — deliberately
    avoids ``df.rdd`` plan conversion, which costs ~100s of ms of driver time
    per call.  Errs high for multi-row-group files (fine: erring high only
    skips the widening repartition, the behavior a large dataset wants).
    """
    total = input_bytes(path)
    max_bytes = int(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b")
    )
    return max(1, (total + max_bytes - 1) // max_bytes)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines source — the lingua franca of training-data pipelines.

    Pass an explicit schema in production: schema inference scans the data
    twice and silently widens types; a declared StructType keeps the single
    pass and the pushdown/pruning behavior of any other structured scan.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, *partition_cols: str) -> None:
    """JSON-lines sink, optionally partitioned (one dir per key value)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with schema merging for landed data whose schema GREW
    over time (training corpora gain metadata columns between snapshots).

    ``mergeSchema`` unions the footer schemas across all files (older
    files surface the new columns as nulls).  Spark leaves it off by
    default because the union is a per-file footer pass at plan time —
    acceptable for a landing zone, wrong as a default for a 100 TB
    curated table, which is why this is a separate entry point instead of
    an option on ``load_table``."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (built into Spark) — same pushdown/pruning contract as
    parquet (PushedFilters / ReadSchema on the scan, asserted in
    tests/test_sinks.py), for pipelines landing Hive-ecosystem data."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, *partition_cols: str) -> None:
    """ORC sink, optionally partitioned."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro connector is deployed in this runtime.

    Avro has been a BUILT-IN-BUT-EXTERNAL module since Spark 2.4: the
    reader/writer classes ship in a separate ``spark-avro`` artifact that
    production clusters add via ``--packages org.apache.spark:spark-avro``
    (this container carries only the core avro-* jars, not the connector,
    so here this probe returns False and the avro entry points raise a
    clear error instead of Spark's generic FAILED_TO_FIND_DATA_SOURCE).
    Probes ``AvroDataSourceV2`` — the class the connector registers with
    the DataSource ServiceLoader — not ``AvroFileFormat``, which other
    jars can leak onto the classpath without a usable source.

    Resolution order matters (ADVICE r9): connectors deployed via
    ``--packages`` / ``spark.jars.packages`` live in Spark's
    MutableURLClassLoader, which ``java.lang.Class.forName`` from py4j's
    system classloader cannot see — a plain forName probe would report
    "not deployed" on a correctly-deployed cluster.  So probe through
    Spark's own ``Utils.classForName`` (context-or-Spark classloader)
    first, and keep the system-classloader forName only as a fallback
    for runtimes where the Utils entry point itself is unreachable."""
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.spark.sql.avro.AvroDataSourceV2", True, False
        )
        return True
    except Exception:
        pass
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataSourceV2"
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source — the Kafka-ecosystem interchange format; same
    structured-scan contract as :func:`read_orc` when the connector is
    deployed.  Guarded: raises a deployment-pointing error where the
    connector is absent (tests/test_sinks.py roundtrips when present,
    asserts this message when not)."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro connector not deployed; add "
            "org.apache.spark:spark-avro_2.13 via spark.jars.packages"
        )
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Avro sink, optionally partitioned; same guard as :func:`read_avro`."""
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro connector not deployed; add "
            "org.apache.spark:spark-avro_2.13 via spark.jars.packages"
        )
    w = df.write.mode("overwrite").format("avro")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Parquet sink partitioned by the given columns.

    At 100 TB this is the layout that makes partition pruning work: a filter
    on a partition column skips whole directories before any IO happens
    (PartitionFilters in the scan node — asserted in tests/test_sinks.py).
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Bucketed managed-table sink: pre-shuffles once at write time so every
    future equi-join/aggregation on ``bucket_col`` is shuffle-free.

    This is the deployment posture relational.py assumes for the orders x
    lineitem fact join — both sides bucketed by orderkey co-locate, and the
    join plan contains no Exchange (asserted in tests/test_sinks.py).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # in-memory catalog + file warehouse: a previous session's table leaves
    # an orphaned location the catalog no longer knows about — clear it
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:") or wh.startswith("/"):
        import shutil

        shutil.rmtree(
            f"{wh.removeprefix('file:')}/{table.lower()}", ignore_errors=True
        )
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: tuple[str, ...] = (),
) -> int:
    """Small-file compaction — the standing maintenance job of any landing
    zone (streaming sinks and per-batch appends produce thousands of tiny
    files; scan planning and parquet footer reads then dominate query time).

    Output file count = ceil(input bytes / target).  Without ``sort_cols``
    the rewrite uses ``coalesce`` — NO shuffle, each output file absorbs
    whole input files.  With ``sort_cols`` it uses ``repartitionByRange``
    + ``sortWithinPartitions`` — one range shuffle that additionally
    clusters the data, giving disjoint per-file value ranges so parquet
    row-group min/max statistics can skip whole files on range predicates.
    Returns the target partition count.
    """
    import math
    import os as _os

    total = sum(
        _os.path.getsize(_os.path.join(root, f))
        for root, _, files in _os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.coalesce(n)
    df.write.mode("overwrite").parquet(out_path)
    return n


def read_reviews_tsv(
    spark: SparkSession,
    path: str,
    mode: str = "PERMISSIVE",
    keep_header_row: bool = False,
) -> DataFrame:
    """Read the reference's native TSV review format (S1-S3).

    One ``spark.read.csv`` over a file, glob, or directory replaces the
    reference's per-file ``sc.textFile`` loop + manual header strip
    (BigdataProjectCode.py:161-163); ``product_id`` is derived from the file
    name the way the reference derives it from ``os.listdir``.

    Bad-record policy (the reference raises ValueError on any malformed
    line, code:43/54 — a single corrupt row kills a 100 TB job):
    - ``PERMISSIVE`` (default): malformed rows are kept with nulls and the
      raw line captured in ``_corrupt_record`` for quarantine;
    - ``DROPMALFORMED``: malformed rows silently dropped;
    - ``FAILFAST``: the reference's behavior, opt-in.

    DELIBERATE divergence (header-row quirk, SURVEY §1.3): the
    reference's LSA pipeline never strips the TSV header, so the header
    LINE is parsed as a review and contributes one extra "sentence"
    group per product file (BigdataProjectCode.py:43-45; only the eval
    cell strips it, code:162-163).  This reader strips the header by
    default (``option("header")``) — the quirk is a bug a user replaying
    product files would not want bit-reproduced — so expect one fewer
    group than the reference per product file on the LSA path.  For
    bit-parity replays, ``keep_header_row=True`` parses every line as
    data, reference-style: the header row surfaces with its text cells
    intact (``review_body`` = the literal string ``"review_body"``,
    exactly the extra "review" the reference's LSA path sees) while its
    unparseable ``star_rating`` cell follows the selected bad-record
    policy (null + ``_corrupt_record`` capture under PERMISSIVE — the
    typed schema cannot hold the literal string ``star_rating``).
    ``keep_header_row=True`` is incompatible with ``FAILFAST`` (the
    header row's ``star_rating`` cell can never satisfy the typed
    schema, so the whole read would abort on the header itself) and
    raises ``ValueError`` — the replay path works under PERMISSIVE or
    DROPMALFORMED only (ADVICE r15).
    """
    if keep_header_row and mode.upper() == "FAILFAST":
        raise ValueError(
            "keep_header_row=True cannot be combined with mode='FAILFAST': "
            "the header row's star_rating cell never satisfies the typed "
            "schema, so FAILFAST aborts the read on the header itself; "
            "use PERMISSIVE or DROPMALFORMED"
        )
    schema = REVIEWS_SCHEMA
    if mode.upper() == "PERMISSIVE":
        schema = T.StructType(
            REVIEWS_SCHEMA.fields
            + [T.StructField("_corrupt_record", T.StringType())]
        )
    df = (
        spark.read.option("sep", "\t")
        .option("header", "false" if keep_header_row else "true")
        .option("mode", mode)
        .schema(schema)
        .csv(path)
    )
    return df.withColumn(
        "product_id",
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.txt$", 1),
    )


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of opaque media files as a DataFrame — Spark's built-in
    ``binaryFile`` source: one row per file with (path, modificationTime,
    length, content: binary).

    This is the ingest edge of a multimodal pipeline at 100 TB: the
    format lists files in parallel, never materializes more than a
    partition's worth of blobs, and pairs with Arrow-batched decoders
    (``extensions.multimodal.decode_ppm_files``).  For very large blobs,
    ``spark.sql.files.maxPartitionBytes`` bounds per-task bytes the same
    way it does for parquet scans.  (Avro, by contrast, is an EXTERNAL
    Spark module not deployed in this environment — attempting
    ``format("avro")`` raises the standard Spark guidance error, so no
    wrapper is provided.)
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select("path", "length", "content")


def read_tar_shards(
    spark: SparkSession, path: str, glob: str = "*.tar"
) -> DataFrame:
    """WebDataset-style tar-shard ingest: a directory of ``.tar`` files —
    the de-facto LLM training-data layout (one shard = one tar, one
    sample = same-stem members like ``000123.txt`` / ``000123.json``) —
    exploded to one row per member: (shard, member, stem, suffix,
    n_bytes, content: binary).

    Spark-first shape: shards parallelize through the built-in
    ``binaryFile`` source (one task can hold one shard — the same unit
    WebDataset's own loaders use), and the tar parse is Python's stdlib
    ``tarfile`` over an in-memory buffer inside Arrow-batched
    ``mapInPandas`` — sequential within a shard (tar has no random
    index; that's inherent to the format), embarrassingly parallel
    across shards, zero shuffle.  Pair with ``decode_ppm_files``-style
    decoders downstream for the binary members.
    """
    import io as _io
    import posixpath
    import tarfile
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    files = read_binary_dir(spark, path, glob=glob)
    schema = T.StructType(
        [
            T.StructField("shard", T.StringType()),
            T.StructField("member", T.StringType()),
            T.StructField("stem", T.StringType()),
            T.StructField("suffix", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def explode_tar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=_io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        payload = tf.extractfile(m).read()
                        base = posixpath.basename(m.name)
                        stem, dot, suffix = base.partition(".")
                        if dot and not suffix:
                            # trailing-dot name ("foo."): keep the dot in
                            # the stem so (stem, suffix) -> name stays a
                            # byte-exact round trip with build_tar_shards
                            stem, suffix = base, ""
                        rows.append(
                            (
                                str(shard_path),
                                m.name,
                                stem,
                                suffix,
                                len(payload),
                                payload,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return files.mapInPandas(explode_tar, schema=schema)


def build_tar_shards(
    df: DataFrame, n_shards: int = 8
) -> DataFrame:
    """Distributed WebDataset-shard BUILD: pack (stem, suffix, content)
    sample rows into deterministic in-memory tar archives, one row per
    shard: (shard, n_members, n_bytes, tar: binary).

    Sharding is a stable md5 hash of the stem (samples with the same stem
    land in the same shard — the WebDataset grouping invariant), packing
    is one ``applyInPandas`` per shard group, and archives are
    byte-deterministic (members sorted by (stem, suffix), zeroed mtime
    and ownership) so a rebuild reproduces shards bit-for-bit.  The
    engine builds; persisting the blobs is the caller's sink (a
    foreachPartition upload in production) — keeping the build pure
    keeps retries idempotent.
    """
    import io as _io
    import tarfile
    from collections.abc import Iterator  # noqa: F401

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("n_members", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("tar", T.BinaryType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["stem", "suffix"], kind="mergesort")
        buf = _io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for r in pdf.itertuples():
                payload = bytes(r.content)
                # extension-less members round-trip as their bare stem —
                # unconditional "{stem}.{suffix}" minted a trailing dot
                name = f"{r.stem}.{r.suffix}" if r.suffix else r.stem
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, _io.BytesIO(payload))
        blob = buf.getvalue()
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_members": [len(pdf)],
                "n_bytes": [len(blob)],
                "tar": [blob],
            }
        )

    sharded = df.withColumn(
        "shard",
        (
            F.conv(F.substring(F.md5("stem"), 1, 12), 16, 10).cast("long")
            % n_shards
        ),
    )
    return sharded.groupBy("shard").applyInPandas(pack, schema=schema)
