"""Incremental snapshot operators: CDC-style diff and rewrite planning.

A 100 TB corpus is never rebuilt from scratch — each landing-zone drop is
reconciled against the previous snapshot and only the delta flows through
the (expensive) curation chain.  Two operators cover that reconciliation:

- ``snapshot_diff``: classify every key as added / removed / changed
  between two snapshot versions.  The scale-correct shape is to hash each
  row's payload *before* the join, so the single full-outer sort-merge
  join shuffles only ``(key, 32-byte hash)`` — never the document bodies.
  With both snapshots bucketed by the key (io.write_bucketed) the join is
  shuffle-free.
- ``partition_rewrite_plan``: aggregate the diff to per-partition change
  counts and a rewrite verdict — the job-planning step of an incremental
  writer (only partitions with any delta are rewritten; untouched
  partition directories are never opened).

The two snapshot versions are derived deterministically from the
``documents`` table (the fixtures are read-only), which keeps the diff
fully oracle-checkable:

- the OLD snapshot is missing keys with ``doc_id % 17 == 3`` → those rows
  classify as ``added``;
- the NEW snapshot is missing keys with ``doc_id % 13 == 5`` → ``removed``;
- the NEW snapshot revises the text of keys with ``doc_id % 7 == 0`` →
  ``changed`` (when present in both).

Unchanged keys are dropped from the diff output — CDC output is the
delta, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

OLD_DROP_MOD, OLD_DROP_REM = 17, 3
NEW_DROP_MOD, NEW_DROP_REM = 13, 5
REV_MOD = 7


def _old_snapshot(docs: DataFrame) -> DataFrame:
    return docs.filter(
        F.col("doc_id") % OLD_DROP_MOD != OLD_DROP_REM
    ).select("doc_id", "source", F.md5("text").alias("row_hash"))


def _new_snapshot(docs: DataFrame) -> DataFrame:
    revised = F.when(
        F.col("doc_id") % REV_MOD == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    return docs.filter(
        F.col("doc_id") % NEW_DROP_MOD != NEW_DROP_REM
    ).select("doc_id", "source", F.md5(revised).alias("row_hash"))


def _diff(docs: DataFrame) -> DataFrame:
    old = _old_snapshot(docs)
    new = _new_snapshot(docs)
    joined = old.alias("o").join(
        new.alias("n"), F.col("o.doc_id") == F.col("n.doc_id"), "full_outer"
    )
    change = (
        F.when(F.col("o.doc_id").isNull(), F.lit("added"))
        .when(F.col("n.doc_id").isNull(), F.lit("removed"))
        .when(F.col("o.row_hash") != F.col("n.row_hash"), F.lit("changed"))
    )
    return (
        joined.select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            F.coalesce(F.col("o.source"), F.col("n.source")).alias("source"),
            change.alias("change"),
            F.col("o.row_hash").alias("old_hash"),
            F.col("n.row_hash").alias("new_hash"),
        )
        # unchanged rows (change IS NULL) are not part of the delta
        .filter(F.col("change").isNotNull())
    )


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed delta between the two snapshot versions.

    One full-outer join on the key over pre-hashed rows; the payload never
    crosses a shuffle.  The reference has no incremental story at all (it
    re-reads its whole dataset per run, BigdataProjectCode.py:117-118);
    this is the operator that replaces "re-run everything".
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return _diff(docs)


def partition_rewrite_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition (source) change accounting + rewrite verdict.

    The diff is already O(delta); this aggregate is O(partitions).  A
    copy-on-write incremental sink rewrites exactly the partitions where
    ``needs_rewrite`` — everything else is carried forward untouched, so
    the write cost scales with the delta, not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    per = (
        _diff(docs)
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("change") == "added", 1).otherwise(0))
            .cast("long")
            .alias("n_added"),
            F.sum(F.when(F.col("change") == "removed", 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(F.col("change") == "changed", 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
        )
    )
    # partitions with no delta simply don't appear in the diff; a right
    # join against the partition list surfaces them as no-rewrite rows
    parts = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_rows"))
    return (
        parts.join(per, "source", "left")
        .select(
            "source",
            "n_rows",
            F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("n_changed", F.lit(0)).cast("long").alias("n_changed"),
        )
        .withColumn(
            "needs_rewrite",
            (F.col("n_added") + F.col("n_removed") + F.col("n_changed")) > 0,
        )
    )


def snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between the two snapshot versions.

    The data-quality check an incremental pipeline runs before promoting
    a new snapshot: per language stratum, document counts and mean text
    length for both versions, the count delta, and a share-shift column
    (new share minus old share of the corpus).  A large shift flags
    upstream breakage (a crawler dropping a language, an encoding bug
    shortening documents) before the corpus ships to training.

    All aggregates reduce in integer space (counts, length sums); the
    means and shares are unrounded divisions of exact integers, so both
    engines agree bit-for-bit.  Shape: two stratum-keyed aggregates over
    the pre-filtered snapshots and a tiny full-outer join on the stratum
    — O(strata) output regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    old = docs.filter(F.col("doc_id") % OLD_DROP_MOD != OLD_DROP_REM)
    revised = F.when(
        F.col("doc_id") % REV_MOD == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    new = docs.filter(F.col("doc_id") % NEW_DROP_MOD != NEW_DROP_REM).select(
        "doc_id", "lang", revised.alias("text")
    )

    def profile(snap: DataFrame, tag: str) -> DataFrame:
        return snap.groupBy("lang").agg(
            F.count("*").cast("long").alias(f"{tag}_docs"),
            F.sum(F.length("text")).cast("long").alias(f"{tag}_chars"),
        )

    po, pn = profile(old, "old"), profile(new, "new")
    tot_old = F.sum("old_docs").over(Window.partitionBy())
    tot_new = F.sum("new_docs").over(Window.partitionBy())
    joined = po.join(pn, "lang", "full_outer").select(
        "lang",
        F.coalesce("old_docs", F.lit(0)).cast("long").alias("old_docs"),
        F.coalesce("new_docs", F.lit(0)).cast("long").alias("new_docs"),
        F.coalesce("old_chars", F.lit(0)).cast("long").alias("old_chars"),
        F.coalesce("new_chars", F.lit(0)).cast("long").alias("new_chars"),
    )
    return joined.select(
        "lang",
        "old_docs",
        "new_docs",
        (F.col("new_docs") - F.col("old_docs")).alias("delta_docs"),
        F.when(
            F.col("old_docs") > 0, F.col("old_chars") / F.col("old_docs")
        ).otherwise(F.lit(0.0)).alias("old_mean_len"),
        F.when(
            F.col("new_docs") > 0, F.col("new_chars") / F.col("new_docs")
        ).otherwise(F.lit(0.0)).alias("new_mean_len"),
        (F.col("new_docs") / tot_new - F.col("old_docs") / tot_old).alias(
            "share_shift"
        ),
    )


_SNAPSHOTS_CTE = f"""
old AS (
  SELECT doc_id, source, md5(text) AS row_hash
  FROM documents WHERE doc_id % {OLD_DROP_MOD} <> {OLD_DROP_REM}
),
new AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % {REV_MOD} = 0 THEN text || ' rev2'
                  ELSE text END) AS row_hash
  FROM documents WHERE doc_id % {NEW_DROP_MOD} <> {NEW_DROP_REM}
),
diff AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         coalesce(o.source, n.source) AS source,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.row_hash <> n.row_hash THEN 'changed' END AS change,
         o.row_hash AS old_hash,
         n.row_hash AS new_hash
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
"""

ORACLES: dict[str, str] = {
    "snapshot_diff": f"""
WITH {_SNAPSHOTS_CTE}
SELECT * FROM diff WHERE change IS NOT NULL
""",
    "snapshot_drift": f"""
WITH vold AS (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % {OLD_DROP_MOD} <> {OLD_DROP_REM}
),
vnew AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % {REV_MOD} = 0 THEN text || ' rev2'
              ELSE text END AS text
  FROM documents WHERE doc_id % {NEW_DROP_MOD} <> {NEW_DROP_REM}
),
po AS (
  SELECT lang, cast(count(*) AS bigint) AS old_docs,
         cast(sum(length(text)) AS bigint) AS old_chars
  FROM vold GROUP BY lang
),
pn AS (
  SELECT lang, cast(count(*) AS bigint) AS new_docs,
         cast(sum(length(text)) AS bigint) AS new_chars
  FROM vnew GROUP BY lang
),
j AS (
  SELECT coalesce(po.lang, pn.lang) AS lang,
         coalesce(old_docs, 0) AS old_docs,
         coalesce(new_docs, 0) AS new_docs,
         coalesce(old_chars, 0) AS old_chars,
         coalesce(new_chars, 0) AS new_chars
  FROM po FULL OUTER JOIN pn ON po.lang = pn.lang
)
SELECT lang, old_docs, new_docs,
       new_docs - old_docs AS delta_docs,
       CASE WHEN old_docs > 0 THEN old_chars * 1.0 / old_docs
            ELSE 0.0 END AS old_mean_len,
       CASE WHEN new_docs > 0 THEN new_chars * 1.0 / new_docs
            ELSE 0.0 END AS new_mean_len,
       new_docs * 1.0 / (SELECT sum(new_docs) FROM j)
         - old_docs * 1.0 / (SELECT sum(old_docs) FROM j) AS share_shift
FROM j
""",
    "partition_rewrite_plan": f"""
WITH {_SNAPSHOTS_CTE},
delta AS (SELECT * FROM diff WHERE change IS NOT NULL),
per AS (
  SELECT source,
         cast(sum(CASE WHEN change = 'added' THEN 1 ELSE 0 END) AS bigint)
           AS n_added,
         cast(sum(CASE WHEN change = 'removed' THEN 1 ELSE 0 END) AS bigint)
           AS n_removed,
         cast(sum(CASE WHEN change = 'changed' THEN 1 ELSE 0 END) AS bigint)
           AS n_changed
  FROM delta GROUP BY source
),
parts AS (
  SELECT source, cast(count(*) AS bigint) AS n_rows FROM documents GROUP BY source
)
SELECT p.source, p.n_rows,
       coalesce(per.n_added, 0) AS n_added,
       coalesce(per.n_removed, 0) AS n_removed,
       coalesce(per.n_changed, 0) AS n_changed,
       coalesce(per.n_added, 0) + coalesce(per.n_removed, 0)
         + coalesce(per.n_changed, 0) > 0 AS needs_rewrite
FROM parts p LEFT JOIN per ON p.source = per.source
""",
}

QUERIES = {
    "snapshot_diff": snapshot_diff,
    "partition_rewrite_plan": partition_rewrite_plan,
    "snapshot_drift": snapshot_drift,
}


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (partial-state merge == full recompute)
# ---------------------------------------------------------------------------

DELTA_MOD = 10  # event_id % 10 == 0 plays the arriving batch


def incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the standing hourly
    aggregate (events already ingested) absorbs an arriving batch by
    MERGING PARTIAL STATES — re-aggregating (count, integer-cent sum)
    partials on the group key — and the gate certifies the merged view
    equals a FULL recompute, because the oracle IS the full recompute
    over all events.  This is the invariant that lets a 100 TB view
    update in O(delta): commutative-monoid state (counts, cent sums)
    merges associatively, so history is never re-scanned; only the
    delta's partials shuffle.  (``stream_materialize`` is the streaming
    face of the same idea; this is the batch-refresh face with a
    value-level equality certificate.)
    """
    ev = load_table(spark, sf_dir, "events")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )

    state = partials(ev.filter(F.col("event_id") % DELTA_MOD != 0))
    delta = partials(ev.filter(F.col("event_id") % DELTA_MOD == 0))
    return (
        state.unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            (F.sum("cents") / F.lit(100.0)).alias("sum_value"),
        )
    )


# the oracle is the FULL recompute — equality IS the maintenance invariant
ORACLES["incremental_agg"] = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       cast(count(*) AS bigint) AS n_events,
       (sum(cast(round(value * 100) AS bigint)) / 100.0) AS sum_value
FROM events
GROUP BY 1, 2
"""
QUERIES["incremental_agg"] = incremental_agg


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE INTO (the Delta/Iceberg upsert contract) as plain
    DataFrame ops: WHEN MATCHED AND changed THEN UPDATE, WHEN NOT MATCHED
    THEN INSERT, WHEN MATCHED AND gone from source THEN DELETE.

    Applies :func:`snapshot_diff`'s delta to the OLD snapshot; the oracle
    is the NEW snapshot computed directly — so merge == target IS the
    certified invariant, the row-level sibling of ``incremental_agg``'s
    merge == full-recompute.  This is the operator that lets a 100 TB
    table absorb a CDC feed in O(delta): one LEFT ANTI on the (bounded)
    touched-key set + a union — the base table shuffles once on the key
    and untouched rows never rewrite (``partition_rewrite_plan`` says
    which files do).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    old = _old_snapshot(docs)
    delta = _diff(docs)
    upserts = delta.filter(
        F.col("change").isin("added", "changed")
    ).select("doc_id", "source", F.col("new_hash").alias("row_hash"))
    touched = delta.select("doc_id")
    return (
        old.join(touched, "doc_id", "left_anti")
        .unionByName(upserts)
    )


# merge == target: the oracle IS the new snapshot, derived independently
ORACLES["merge_upsert"] = f"""
SELECT doc_id, source,
       md5(CASE WHEN doc_id % {REV_MOD} = 0 THEN text || ' rev2'
            ELSE text END) AS row_hash
FROM documents
WHERE doc_id % {NEW_DROP_MOD} <> {NEW_DROP_REM}
"""
QUERIES["merge_upsert"] = merge_upsert
