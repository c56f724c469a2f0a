"""Sketch accuracy + skew-salting correctness tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataanalytics_textsummarization_spark.relational_ext import distinct_sketch
from bigdataanalytics_textsummarization_spark.skew import salted_join
from tests.conftest import SF_DIR, normalize


def test_hll_within_tolerance(spark):
    pdf = distinct_sketch(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    # the gated query folds the rsd=0.02 / 3-sigma check into a column
    assert pdf["sketch_within_tol"].all()
    assert (pdf["exact_users"] > 0).all()


def test_hll_raw_estimate_within_tolerance(spark):
    """Raw numeric check the gated boolean summarizes."""
    from bigdataanalytics_textsummarization_spark.io import load_table

    ev = load_table(spark, SF_DIR, "events")
    pdf = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .toPandas()
    )
    rel_err = (pdf["approx"] - pdf["exact"]).abs() / pdf["exact"].clip(lower=1)
    assert (rel_err <= 0.06).all(), rel_err.tolist()


def test_salted_join_equals_plain_join(spark):
    # heavily skewed big side: 90% of rows share one key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    got = normalize(salted_join(big, small, "k", n_salts=8).toPandas())
    want = normalize(big.join(small, "k").toPandas())
    assert got.shape == want.shape
    assert got.equals(want)


def test_salted_join_shuffles_on_salt(spark):
    big = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("p")
    )
    small = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = salted_join(big, small, "k", n_salts=4)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # join keys must include the salt column, not just k
        assert "__salt" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_curation_observation_piggybacks_on_action(spark):
    # pipeline accounting must come from the SAME action as the result —
    # the observed kept-docs count has to equal the sum the result reports
    from bigdataanalytics_textsummarization_spark.extensions.curation import (
        curation_with_observation,
    )
    from tests.conftest import SF_DIR

    result, obs = curation_with_observation(spark, SF_DIR)
    rows = result.collect()
    assert obs.get["kept_docs"] == sum(r["n_docs"] for r in rows)


def test_count_min_estimate_upper_bounds_exact(spark):
    """The count-min defining inequality: est >= exact on every heavy
    hitter (collisions only inflate); ranks dense 1..k."""
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        HH_K,
        heavy_hitters_sketch,
    )
    from tests.conftest import SF_DIR

    rows = heavy_hitters_sketch(spark, SF_DIR).collect()
    assert sorted(r.rk for r in rows) == list(range(1, min(HH_K, len(rows)) + 1))
    for r in rows:
        assert r.est >= r.exact
        assert r.overcount == r.est - r.exact
