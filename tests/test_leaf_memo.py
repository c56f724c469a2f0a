"""Round-8 pins: leaf()/session_memo semantics and the new driver rows.

1. leaf() memoizes per plan semantics: two semantically-equal inputs in
   one pin scope share ONE checkpointed frame (the cross-query reuse that
   keeps the text family's construct time flat), and release_pins() both
   frees the storage and invalidates the memo (a leaf-derived frame is
   unrecomputable after its checkpoint blocks are gone);
2. a shuffle-partition conf change busts both memos (the partition-
   invariance suite depends on rebuilding under each setting);
3. session_memo returns the identical builder output within a pin scope
   and a fresh one after release;
4. the new driver rows (`embedding_cov_gram_check`, the file-system
   ingest edges) hold at test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdataanalytics_textsummarization_spark import text
from bigdataanalytics_textsummarization_spark.functions import (
    _BUILDS,
    _LEAVES,
    leaf,
    release_pins,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_leaf_memoizes_semantically_equal_plans(spark):
    release_pins()
    a = leaf(spark.range(100).select((F.col("id") % 5).alias("k")))
    b = leaf(spark.range(100).select((F.col("id") % 5).alias("k")))
    assert a is b  # one checkpoint, shared
    c = leaf(spark.range(100).select((F.col("id") % 7).alias("k")))
    assert c is not a  # different semantics -> different leaf
    assert len(_LEAVES) == 2
    release_pins()
    assert not _LEAVES
    d = leaf(spark.range(100).select((F.col("id") % 5).alias("k")))
    assert d is not a  # released leaves never come back
    release_pins()


def test_leaf_memo_busted_by_shuffle_conf_change(spark):
    release_pins()
    baseline = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        a = leaf(spark.range(50).select((F.col("id") % 3).alias("k")))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = leaf(spark.range(50).select((F.col("id") % 3).alias("k")))
        assert a is not b  # new conf -> new leaf (partition invariance)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline)
        release_pins()


def test_session_memo_identity_and_release(spark):
    release_pins()
    a = text.tokens_lsa(spark, SF_DIR)
    b = text.tokens_lsa(spark, SF_DIR)
    assert a is b  # identical builder output within the pin scope
    other = text.tokens_textrank(spark, SF_DIR)
    assert other is not a
    release_pins()
    assert not _BUILDS
    c = text.tokens_lsa(spark, SF_DIR)
    assert c is not a  # fresh build after release
    # identical VALUES either way (the memo only skips re-analysis)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))
    release_pins()


def test_embedding_cov_gram_check_all_true(spark):
    from bigdataanalytics_textsummarization_spark.extensions.similarity import (
        embedding_cov_gram_check,
    )

    row = embedding_cov_gram_check(spark, SF_DIR).collect()[0]
    assert row["cells_match"] is True
    assert row["within_tol"] is True
    assert row["n_cells"] > 0
    release_pins()


def test_file_ingest_edges_match_in_memory_twins(spark):
    """The file-system decode queries must agree row-for-row with their
    in-memory twins (same md5-derived payloads, different transport)."""
    from bigdataanalytics_textsummarization_spark.extensions import multimodal as mm

    mem = {
        r["doc_id"]: r
        for r in mm.wav_decode(spark, SF_DIR).collect()
        if r["doc_id"] < mm.FILE_CAP
    }
    fs = {r["doc_id"]: r for r in mm.wav_files_decode(spark, SF_DIR).collect()}
    assert set(fs) == set(mem)
    for did, r in fs.items():
        m = mem[did]
        assert (r["n_samples"], r["sum_amp"], r["max_amp"]) == (
            m["n_samples"],
            m["sum_amp"],
            m["max_amp"],
        )

    tar = mm.tar_shards_roundtrip(spark, SF_DIR).collect()
    docs = {
        str(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < mm.FILE_CAP)
        .collect()
    }
    assert {r["stem"] for r in tar} == set(docs)
    for r in tar:
        assert r["suffix"] == "txt"
        assert r["n_bytes"] == len(docs[r["stem"]].encode())
    release_pins()


def test_jsonl_roundtrip_matches_documents(spark):
    """Driver-row twin of test_sinks' jsonl round-trip: facts re-keyed by
    doc_id must equal the documents table's own."""
    import hashlib

    from bigdataanalytics_textsummarization_spark.extensions import multimodal as mm
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        jsonl_roundtrip,
    )

    got = {r["doc_id"]: r for r in jsonl_roundtrip(spark, SF_DIR).collect()}
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < mm.FILE_CAP)
        .collect()
    )
    assert set(got) == {r["doc_id"] for r in docs}
    for r in docs:
        g = got[r["doc_id"]]
        assert g["source"] == r["source"] and g["lang"] == r["lang"]
        assert g["text_md5"] == hashlib.md5(r["text"].encode()).hexdigest()
    release_pins()


def test_iterative_loop_checkpoints_are_owned(spark):
    """r8 consistency pass on the r7 ownership contract: the iterative
    loops' per-iteration EAGER checkpoints (connected components, k-hop)
    previously escaped the registry as bare .localCheckpoint() calls —
    storage must now be empty after release_pins()."""
    from bigdataanalytics_textsummarization_spark.extensions.dedup import (
        dedup_clusters,
    )
    from bigdataanalytics_textsummarization_spark.graph import graph_khop

    def persistent_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    release_pins()
    before = persistent_ids()
    assert dedup_clusters(spark, SF_DIR).count() >= 0
    assert graph_khop(spark, SF_DIR).count() >= 0
    assert persistent_ids() - before  # the loops really did checkpoint
    release_pins()
    assert persistent_ids() <= before


def test_cross_query_leaf_sharing_skips_retokenization(spark):
    """The architectural claim behind leaf(): after one textrank query
    builds the token leaf, a SECOND query over the same base (the edge
    table) must plan against the existing LogicalRDD leaf — its executed
    plan contains an ExistingRDD scan and NO parquet scan of the
    documents table (the tokenize subtree lives inside the leaf, built
    once per session)."""
    from bigdataanalytics_textsummarization_spark import graph, pagerank

    release_pins()
    try:
        pagerank.textrank_top5(spark, SF_DIR).count()  # builds the leaves
        edges = graph.similarity_edges(spark, SF_DIR)
        plan = edges._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan  # reads the shared token leaf
        assert "documents" not in plan  # never re-scans the corpus
    finally:
        release_pins()
