"""Extended relational surface: more TPC-H analogs, as-of / interval joins,
exact percentiles, statistical aggregates.

The as-of join is the one operator here Spark has no builtin for
(SURVEY.md §2.3 marks it ABSENT in the reference too).  The scale-correct
formulation is NOT a theta self-join (quadratic per key) but the
union + ordered forward-fill trick: tag both sides, sort each user's
timeline once, carry the last left-side row forward with
``last(..., ignorenulls=True)``.  One shuffle, one sort, linear in events —
this survives 100 TB where a per-key cross product cannot.  The DuckDB
oracle uses its native ``ASOF JOIN`` so the two formulations check each
other.

The interval-containment join (events into their session window) is
equi-keyed on user_id with a range predicate — the blow-up is bounded by
the per-user session count, so Catalyst's sort-merge join handles it at
scale without a specialized interval index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import r2, r6
from .io import load_table
from .streaming.events import user_sessions


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: fully pushed-down filter + single agg (no joins)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    return out


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: revenue lost to returns per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .select("rk", "c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: promo revenue share, one month, lineitem x part."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            r6(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(0.0))
                / F.sum(disc)
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: orders whose total quantity exceeds 250, with
    customer, ordered by totalprice."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(r2(F.sum("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            r2(F.col("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
    )


def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every error event, the user's most recent click at or
    before it (attribution).  Union + forward-fill — see module docstring."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("error_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("error_id"),
    )
    # clicks sort before errors at equal ts (tag 0 < 1) => ties attach
    timeline = clicks.unionByName(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = timeline.select(
        "user_id",
        "ts",
        "tag",
        "error_id",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last("click_value", ignorenulls=True).over(w).alias("last_click_value"),
    )
    return filled.filter(F.col("tag") == 1).select(
        F.col("error_id").alias("event_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        F.col("last_click_id").alias("click_id"),
        r6(F.col("last_click_value")).alias("click_value"),
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the documents table: per column the
    null count, exact distinct count, and min/max (stringified after the
    aggregate so numeric ordering is preserved) — the data-quality pass a
    pipeline runs before trusting a new snapshot.

    One scan, one aggregate node (the multiple exact count-distincts
    compile to a single-pass Expand — the right call at gate scale; a
    100 TB profile would swap ``countDistinct`` for
    ``approx_count_distinct`` and keep the identical plan shape, as
    ``distinct_sketch`` demonstrates), then an unpivot to long form.
    """
    docs = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stack = F.expr(
        "stack({n}, {args}) AS (column_name, n_nulls, n_distinct, min_value, max_value)".format(
            n=len(_PROFILE_COLS),
            args=", ".join(
                f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
                for c in _PROFILE_COLS
            ),
        )
    )
    return wide.select(stack)


FUNNEL_WINDOW_MIN = 72 * 60  # max view->purchase span (72 h) for a conversion


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel (the MATCH_RECOGNIZE shape): per user, the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that, and whether the full sequence completed
    within ``FUNNEL_WINDOW_MIN`` minutes.

    Three user-keyed aggregations chained by equi-joins — every stage
    shuffles on user_id only (the partitioning is reusable across stages),
    no self-join on the raw event table, no per-user collect of full
    histories.  Output: one row per user with at least one view.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id", "view_ts")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id", "view_ts", "click_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c.select("user_id", "click_ts"), "user_id", "left")
        .join(p.select("user_id", "purchase_ts"), "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            (
                F.lit(1)
                + F.when(F.col("click_ts").isNotNull(), 1).otherwise(0)
                + F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("steps"),
            (
                F.col("purchase_ts").isNotNull()
                & (
                    F.col("purchase_ts")
                    <= F.col("view_ts")
                    + F.expr(f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTES")
                )
            ).alias("converted"),
        )
    )


def events_in_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join: attach each event to its session window.

    Equi-join on user_id + range predicate on ts; per-session event counts
    re-derived as a cross-check of the sessionization itself.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    sess = user_sessions(spark, sf_dir).select(
        "user_id", "session_no", "session_start", "session_end"
    )
    return (
        ev.join(sess, "user_id")
        .filter(
            (F.col("ts") >= F.col("session_start"))
            & (F.col("ts") <= F.col("session_end"))
        )
        .groupBy("user_id", "session_no")
        .agg(F.count("*").cast("long").alias("n_events"))
    )


def rich_customers_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL surface: customers above their nation's average balance.

    Written as a SQL string over registered views (not the DataFrame API)
    to exercise the parser/analyzer path a SQL user takes; the correlated
    aggregate decorrelates to a join in Catalyst — same physical shape as
    the hand-written equivalent.
    """
    from .io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
               (round(c.c_acctbal, 2) + 0.0) AS acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


def events_typed_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON: from_json with an explicit schema — ONE parse into a
    struct column (vs get_json_object's per-field re-parse), the right shape
    when a 100 TB table has many JSON fields."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return ev.select(
        "event_id",
        F.from_json("props", schema).alias("p"),
    ).select(
        "event_id",
        F.col("p.k").alias("k"),
        F.col("p.k").isNotNull().alias("has_k"),
    )


def user_value_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames over event time per user: 3-row moving average,
    lag delta, and running max — the time-series window surface."""
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame3 = order.rowsBetween(-2, 0)
    running = order.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        r6(F.col("value")).alias("value"),
        r6(F.avg("value").over(frame3)).alias("mavg3"),
        r6(F.col("value") - F.lag("value").over(order)).alias("delta"),
        r6(F.max("value").over(running)).alias("running_max"),
    )


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of part retail price per brand."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        r6(F.expr("percentile(p_retailprice, 0.25)")).alias("p25"),
        r6(F.expr("percentile(p_retailprice, 0.5)")).alias("p50"),
        r6(F.expr("percentile(p_retailprice, 0.75)")).alias("p75"),
        F.count("*").cast("long").alias("n_parts"),
    )


def lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev / correlation / covariance of
    quantity vs extended price per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r6(F.stddev_samp("l_extendedprice")).alias("sd_price"),
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r6(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_qty_price"),
        F.count("*").cast("long").alias("n"),
    )


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (orderpriority, orderstatus): all four grouping-set combinations
    in one pass (partial aggregation expands grouping ids map-side)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        r2(F.sum("o_totalprice")).alias("total_sales"),
        F.count("*").cast("long").alias("n_orders"),
    )


def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority), (status), ()) with grouping_id —
    the asymmetric-set case neither rollup nor cube expresses (no
    (priority, status) cell).  One pass: Spark's Expand operator replicates
    each input row once per set before the partial aggregation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               cast(grouping_id(o_orderpriority, o_orderstatus) AS bigint)
                 AS gid,
               (round(sum(o_totalprice), 2) + 0.0) AS total_sales,
               count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """).select(
        "o_orderpriority",
        "o_orderstatus",
        "gid",
        "total_sales",
        F.col("n_orders").cast("long").alias("n_orders"),
    )


def sales_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: discounted revenue per ship-year x return-flag matrix.

    ``pivot`` with an *explicit* value list — with the values declared,
    Spark skips the extra distinct-collection job and compiles the pivot
    into one pass (a single hash aggregate with one conditional sum per
    pivot cell, partial map-side).  Never call ``.pivot(col)`` without
    values at scale: the implicit path first runs a distinct query over
    the whole input to discover them.  Revenue sums use the integer
    1e-4-units convention (extendedprice*(1-discount) has 4 decimals), so
    the cross-engine value-hash is order-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    exact_sum = F.sum(F.round(disc * 10000).cast("long")) / F.lit(10000.0)
    out = (
        li.withColumn("ship_year", F.year("l_shipdate").cast("long"))
        .groupBy("ship_year")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(r2(exact_sum))
    )
    return out.select(
        "ship_year",
        F.col("A").alias("revenue_A"),
        F.col("N").alias("revenue_N"),
        F.col("R").alias("revenue_R"),
    )


def distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approx_count_distinct checked against the exact count
    per event_type.  The sketch is mergeable — the property that matters
    at 100 TB, where exact countDistinct needs a full shuffle of the keys
    but HLL aggregates partial sketches map-side.

    The raw HLL estimate is engine-specific, so the gated output carries
    the DETERMINATE facts instead: the exact count plus a boolean that the
    estimate landed within 3x the configured relative standard deviation
    (rsd=0.02 -> 6%).  The oracle asserts the boolean true — a drifting or
    broken sketch flips the driver row red.  Raw estimates are asserted
    numerically in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").cast("long").alias("exact_users"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(0.06)
            ).alias("sketch_within_tol"),
        )
    )


QSKETCH_ACCURACY = 10_000  # approx_percentile accuracy parameter
QSKETCH_RTOL = 0.01  # certified relative error bound


def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch certification: per return flag, Spark's
    approx_percentile (Greenwald-Khanna summaries, merged per-partition
    — the bounded-memory quantile structure a 100 TB scan must use) is
    checked against the exact interpolated percentile, and the row
    carries the determinate facts: group size and a within-1%-relative
    boolean per quantile.

    Same gate pattern as distinct_sketch (HLL) and heavy_hitters_sketch
    (count-min): the sketch value itself is partition-dependent, so the
    certified facts are the count (exact, oracle-computed) and the error
    bound booleans (true at any partitioning for this accuracy).  With
    this, all three classic sketch families — distinct, frequency,
    quantile — are certified in the gate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr(
            f"approx_percentile(l_extendedprice, array(0.5, 0.95), {QSKETCH_ACCURACY})"
        ).alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("ex"),
    )
    def ok(i: int):
        return (
            F.abs(F.element_at("ap", i) - F.element_at("ex", i))
            <= F.element_at("ex", i) * F.lit(QSKETCH_RTOL)
        )
    return agg.select(
        "l_returnflag",
        "n_rows",
        ok(1).alias("p50_within_tol"),
        ok(2).alias("p95_within_tol"),
    )


ANOMALY_Z = 3.0


def event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly detection per event type: hours whose event
    count sits more than ANOMALY_Z standard deviations from that type's
    hourly mean — the ops-monitoring query a streaming pipeline runs over
    its own throughput (traffic spikes, upstream outages).

    Same exact-float-parity scheme as length_outliers: counts reduce to
    exact integer moments per type, std is IEEE-exact sqrt, z ships
    unrounded (bit-identical across engines).  Hours with zero events do
    not appear (the aggregate can't see them); a spine join
    (timeseries_fill) composes in when silence itself is the anomaly.
    Shape: one (type, hour) aggregate, one tiny per-type moment
    broadcast back.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").cast("long").alias("n"))
    mom = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
    )
    mean = F.col("s") / F.col("n_hours")
    var = F.col("ss") / F.col("n_hours") - mean * mean
    stats = mom.select(
        "event_type", mean.alias("mean_n"), F.sqrt(var).alias("std_n")
    )
    z = F.when(
        F.col("std_n") > 0, (F.col("n") - F.col("mean_n")) / F.col("std_n")
    ).otherwise(F.lit(0.0))
    return hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour",
        "n",
        z.alias("z"),
        (F.abs(z) > ANOMALY_Z).alias("is_anomaly"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the event stream.

    Classic product-analytics shape: cohort = the week of a user's first
    event; each cell = how many cohort users were active ``week_offset``
    weeks later, plus the retention rate vs the cohort's own week-0 size.

    Scale shape: the (user, week) activity grid is one distinct over the
    events scan; first-week is a groupBy(user) on that already-reduced
    grid; the grid joins back co-keyed on user_id.  Every shuffle is
    O(active user-weeks) — far below O(events) — and the output matrix is
    O(weeks^2), so the window computing the week-0 denominator runs on a
    tiny aggregate.  No self-join of the raw event table anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    first = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        weekly.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    w = Window.partitionBy("cohort_week")
    base = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(w)
    return cells.select(
        "cohort_week",
        "week_offset",
        "n_users",
        r6(F.col("n_users") / base).alias("retention"),
    )


def timeseries_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample of each user's event timeline.

    Time-series engines call this gap-filling / resampling: generate the
    dense hour spine between a user's first and last activity with
    ``sequence(min, max, INTERVAL 1 HOUR)``, left-join the sparse hourly
    aggregate onto it, zero-fill the holes, and carry a running total.
    Everything stays integer so the result is exactly reproducible.

    Scale shape: the hourly aggregate is one shuffle of (user, hour)
    partial counts; the spine explodes O(users x span-hours) rows from
    the tiny per-user bounds aggregate — generated, not shuffled — and
    the fill join + cumulative window run on the user_id partitioning the
    aggregate already has.  Span is bounded by the retention window of
    the data (a production spine would also cap it explicitly), so no
    stage depends on raw event volume after the first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").cast("long").alias("n_events"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("n_events").isNull().alias("is_gap"),
        )
        .withColumn("cum_events", F.sum("n_events").over(w).cast("long"))
    )


ORACLES: dict[str, str] = {
    "quantile_sketch": """
SELECT l_returnflag, cast(count(*) AS bigint) AS n_rows,
       true AS p50_within_tol, true AS p95_within_tol
FROM lineitem GROUP BY l_returnflag
""",
    "event_anomalies": f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         cast(count(*) AS bigint) AS n
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type, cast(count(*) AS bigint) AS n_hours,
         cast(sum(n) AS bigint) AS s,
         cast(sum(n * n) AS bigint) AS ss
  FROM hourly GROUP BY event_type
),
stats AS (
  SELECT event_type, s / n_hours AS mean_n,
         sqrt(ss / n_hours - (s / n_hours) * (s / n_hours)) AS std_n
  FROM mom
)
SELECT h.event_type, h.hour, h.n,
       CASE WHEN st.std_n > 0 THEN (h.n - st.mean_n) / st.std_n
            ELSE 0.0 END AS z,
       abs(CASE WHEN st.std_n > 0 THEN (h.n - st.mean_n) / st.std_n
                ELSE 0.0 END) > {ANOMALY_Z} AS is_anomaly
FROM hourly h JOIN stats st USING (event_type)
""",
    "timeseries_fill": """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         cast(count(*) AS bigint) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT s.user_id, s.hour,
       coalesce(h.n_events, 0) AS n_events,
       h.n_events IS NULL AS is_gap,
       cast(sum(coalesce(h.n_events, 0)) OVER (
              PARTITION BY s.user_id ORDER BY s.hour
              ROWS UNBOUNDED PRECEDING) AS bigint) AS cum_events
FROM spine s LEFT JOIN hourly h USING (user_id, hour)
""",
    "cohort_retention": """
WITH weekly AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
firsts AS (
  SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id
),
cells AS (
  SELECT f.cohort_week,
         cast(date_diff('day', f.cohort_week, w.week) // 7 AS bigint)
           AS week_offset,
         cast(count(*) AS bigint) AS n_users
  FROM weekly w JOIN firsts f USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_users,
       (round(n_users * 1.0 / max(CASE WHEN week_offset = 0 THEN n_users END)
             OVER (PARTITION BY cohort_week), 6) + 0.0) AS retention
FROM cells
""",
    "table_profile": "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       cast(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_nulls,
       cast(count(DISTINCT {c}) AS bigint) AS n_distinct,
       cast(min({c}) AS varchar) AS min_value,
       cast(max({c}) AS varchar) AS max_value
FROM documents"""
        for c in _PROFILE_COLS
    ),
    "event_funnel": f"""
WITH v AS (
  SELECT user_id, min(ts) AS view_ts
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, v.view_ts, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id, v.view_ts
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
       cast(1 + CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END
            AS bigint) AS steps,
       coalesce(p.purchase_ts IS NOT NULL
                AND p.purchase_ts <= v.view_ts
                    + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE,
                false) AS converted
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
""",
    "distinct_sketch": """
SELECT event_type,
       cast(count(DISTINCT user_id) AS bigint) AS exact_users,
       cast(count(*) AS bigint) AS n_events,
       true AS sketch_within_tol
FROM events
GROUP BY event_type
""",
    "sales_grouping_sets": """
SELECT o_orderpriority, o_orderstatus,
       cast(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS bigint) AS gid,
       (round(sum(o_totalprice), 2) + 0.0) AS total_sales,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
    "sales_cube": """
SELECT o_orderpriority, o_orderstatus,
       (round(sum(o_totalprice), 2) + 0.0) AS total_sales,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
    "q6_forecast_revenue": """
SELECT (round(sum(l_extendedprice * l_discount), 2) + 0.0) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    "q10_returned_items": """
WITH agg AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         (round(sum(l_extendedprice * (1 - l_discount)), 2) + 0.0) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT cast(row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS bigint) AS rk,
       c_custkey, c_name, c_acctbal, n_name, revenue
FROM agg
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "q14_promo_revenue": """
SELECT (round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) + 0.0) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
""",
    "q18_large_orders": """
WITH big AS (
  SELECT l_orderkey, (round(sum(l_quantity), 2) + 0.0) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       (round(o_totalprice, 2) + 0.0) AS o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    "asof_click_attribution": """
SELECT e.event_id, e.user_id, e.ts AS error_ts,
       c.event_id AS click_id, (round(c.value, 6) + 0.0) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
""",
    "events_typed_props": """
SELECT event_id,
       cast(json_extract(props, '$.k') AS bigint) AS k,
       json_extract(props, '$.k') IS NOT NULL AS has_k
FROM events
""",
    "user_value_moving_avg": """
SELECT event_id, user_id, (round(value, 6) + 0.0) AS value,
       (round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) + 0.0) AS mavg3,
       (round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) + 0.0) AS delta,
       (round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) + 0.0) AS running_max
FROM events
""",
    "rich_customers_sql": """
SELECT c.c_custkey, c.c_name, n.n_name, (round(c.c_acctbal, 2) + 0.0) AS acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (
  SELECT avg(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
    "price_percentiles": """
SELECT p_brand,
       (round(quantile_cont(p_retailprice, 0.25), 6) + 0.0) AS p25,
       (round(quantile_cont(p_retailprice, 0.5), 6) + 0.0) AS p50,
       (round(quantile_cont(p_retailprice, 0.75), 6) + 0.0) AS p75,
       count(*) AS n_parts
FROM part GROUP BY p_brand
""",
    "lineitem_stats": """
SELECT l_returnflag,
       (round(stddev_samp(l_quantity), 6) + 0.0) AS sd_qty,
       (round(stddev_samp(l_extendedprice), 6) + 0.0) AS sd_price,
       (round(corr(l_quantity, l_extendedprice), 6) + 0.0) AS corr_qty_price,
       (round(covar_samp(l_quantity, l_extendedprice), 6) + 0.0) AS covar_qty_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    "sales_pivot": """
SELECT cast(year(l_shipdate) AS bigint) AS ship_year,
       (round(sum(CASE WHEN l_returnflag = 'A'
                 THEN cast(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS bigint) END) / 10000.0, 2) + 0.0) AS revenue_A,
       (round(sum(CASE WHEN l_returnflag = 'N'
                 THEN cast(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS bigint) END) / 10000.0, 2) + 0.0) AS revenue_N,
       (round(sum(CASE WHEN l_returnflag = 'R'
                 THEN cast(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS bigint) END) / 10000.0, 2) + 0.0) AS revenue_R
FROM lineitem GROUP BY 1
""",
}

# sessionize with lag+cumsum, then containment join
ORACLES["events_in_sessions"] = """
WITH lagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, cast(sum(new_session) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS bigint) AS session_no
  FROM lagged
),
sess AS (
  SELECT user_id, session_no, min(ts) AS session_start, max(ts) AS session_end
  FROM numbered GROUP BY user_id, session_no
)
SELECT e.user_id, s.session_no, count(*) AS n_events
FROM events e
JOIN sess s ON e.user_id = s.user_id
           AND e.ts >= s.session_start AND e.ts <= s.session_end
GROUP BY e.user_id, s.session_no
"""

QUERIES = {
    "sales_cube": sales_cube,
    "sales_grouping_sets": sales_grouping_sets,
    "distinct_sketch": distinct_sketch,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "asof_click_attribution": asof_click_attribution,
    "events_in_sessions": events_in_sessions,
    "rich_customers_sql": rich_customers_sql,
    "events_typed_props": events_typed_props,
    "user_value_moving_avg": user_value_moving_avg,
    "price_percentiles": price_percentiles,
    "lineitem_stats": lineitem_stats,
    "sales_pivot": sales_pivot,
    "event_funnel": event_funnel,
    "table_profile": table_profile,
    "cohort_retention": cohort_retention,
    "timeseries_fill": timeseries_fill,
    "event_anomalies": event_anomalies,
    "quantile_sketch": quantile_sketch,
}


# ---------------------------------------------------------------------------
# Engine-portable Bloom-filter semi-join
# ---------------------------------------------------------------------------

BLOOM_M = 4096  # filter bits
BLOOM_K = 3  # hash functions per key


def _bloom_pos(col, j: int):
    """Bit position j of a key: 48 md5 bits mod BLOOM_M (the engine's
    standard cross-engine hash construction — see curation._SPLIT_EXPR)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f":b{j}"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter semi-join: probe every ordering customer
    against a Bloom filter built from the high-balance customer set
    (``c_acctbal > 8000``), reporting per key the filter verdict, ground
    truth, and whether it is one of the filter's false positives.

    Spark injects Bloom runtime filters into scans on its own
    (spark.sql.optimizer.runtime.bloomFilter.enabled, asserted at scale
    shape in test_plans.py); THIS operator is the engine-portable version
    of the same idea — the filter's set-bit table is a first-class
    DataFrame that can be persisted and shipped to a different engine or
    an ingest gate, and the bit positions are the deterministic md5
    construction both Spark and DuckDB evaluate identically (that is what
    the value gate certifies).

    Scale shape: the set-bit table is DISTINCT positions, so it is bounded
    by BLOOM_M rows REGARDLESS of build-side cardinality — it always
    broadcasts.  The probe side explodes to K rows per key (map-side),
    hits the broadcast, and re-aggregates on the probe key: one shuffle
    over O(probe) rows, no join of fact against fact.  Ground truth rides
    the same aggregate via a broadcast left join of the (small) build-key
    set; at 100 TB where the build side is NOT small, the truth column is
    dropped and the filter verdict alone prunes the probe scan — exactly
    how a cross-system dedup/admission gate uses it.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_custkey").alias("k")
    )
    bits = (
        build.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("k"), j) for j in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
        .withColumn("present", F.lit(1))
    )
    probe = orders.select(F.col("o_custkey").alias("k")).distinct()
    probe_bits = probe.select(
        "k",
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), j) for j in range(BLOOM_K)])
        ).alias("bit"),
    )
    verdict = (
        probe_bits.join(F.broadcast(bits), "bit", "left")
        .groupBy("k")
        .agg((F.min(F.coalesce("present", F.lit(0))) == 1).alias("bloom_pass"))
    )
    truth = build.withColumn("actual", F.lit(True))
    return (
        verdict.join(F.broadcast(truth), "k", "left")
        .select(
            F.col("k").alias("o_custkey"),
            "bloom_pass",
            F.coalesce("actual", F.lit(False)).alias("actual"),
            (F.col("bloom_pass") & ~F.coalesce("actual", F.lit(False))).alias(
                "false_pos"
            ),
        )
    )


def _bloom_pos_sql(key: str, j: int) -> str:
    return (
        f"cast(cast(concat('0x', substr(md5(cast({key} AS varchar) || ':b{j}'), "
        f"1, 12)) AS ubigint) AS bigint) % {BLOOM_M}"
    )


ORACLES["bloom_semijoin"] = f"""
WITH build AS (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 8000
),
bits AS (
  SELECT DISTINCT bit FROM build, unnest([
    {", ".join(_bloom_pos_sql("k", j) for j in range(BLOOM_K))}
  ]) AS t(bit)
),
probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
probe_bits AS (
  SELECT k, bit FROM probe, unnest([
    {", ".join(_bloom_pos_sql("k", j) for j in range(BLOOM_K))}
  ]) AS t(bit)
),
verdict AS (
  SELECT pb.k, bool_and(b.bit IS NOT NULL) AS bloom_pass
  FROM probe_bits pb LEFT JOIN bits b USING (bit)
  GROUP BY pb.k
)
SELECT v.k AS o_custkey, v.bloom_pass,
       coalesce(bu.k IS NOT NULL, false) AS actual,
       v.bloom_pass AND bu.k IS NULL AS false_pos
FROM verdict v LEFT JOIN build bu USING (k)
"""
QUERIES["bloom_semijoin"] = bloom_semijoin


# ---------------------------------------------------------------------------
# Data-quality audit (Great-Expectations-style checks as one query)
# ---------------------------------------------------------------------------


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The landing-zone data-quality audit: one row per expectation with
    its violation count and pass verdict — uniqueness, derived-column
    consistency, referential integrity, domain ranges, null screens.
    This is the admission gate a lake runs before promoting a snapshot
    (the relational complement of the text-side gopher/classifier
    gates).

    Scale shape: every check is a single aggregate over one scan or one
    anti-join — uniqueness is count minus distinct-count (map-side
    combine), referential checks are LEFT ANTI joins that shuffle only
    the key column, ranges and null screens are conditional counts that
    fold into the scan.  The result is O(#checks) rows regardless of
    input size; checks over the same table share a scan via one
    multi-aggregate where possible.
    """
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")

    def row(name: str, viol) -> DataFrame:
        # coalesce: a conditional SUM over an EMPTY table is NULL in Spark
        # (an empty landing zone is a plausible admission-gate input), while
        # the oracle's count(*) FILTER is 0 — the verdict must be 0/true
        return viol.select(
            F.lit(name).alias("check_name"),
            F.coalesce(F.col("violations").cast("long"), F.lit(0).cast("long"))
            .alias("violations"),
        )

    checks = [
        row(
            "documents.doc_id is unique",
            docs.agg(
                (F.count("*") - F.countDistinct("doc_id")).alias("violations")
            ),
        ),
        row(
            "documents.n_chars equals length(text)",
            docs.agg(
                F.sum(
                    F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
                ).alias("violations")
            ),
        ),
        row(
            "orders.o_custkey references customer",
            orders.join(
                customer,
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ).agg(F.count("*").alias("violations")),
        ),
        row(
            "lineitem.l_orderkey references orders",
            lineitem.join(
                orders,
                lineitem.l_orderkey == orders.o_orderkey,
                "left_anti",
            ).agg(F.count("*").alias("violations")),
        ),
        row(
            "lineitem.l_quantity in [1, 50]",
            lineitem.agg(
                F.sum(
                    F.when(
                        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
                        1,
                    ).otherwise(0)
                ).alias("violations")
            ),
        ),
        row(
            "lineitem.l_discount in [0, 0.1]",
            lineitem.agg(
                F.sum(
                    F.when(
                        (F.col("l_discount") < 0)
                        | (F.col("l_discount") > 0.1),
                        1,
                    ).otherwise(0)
                ).alias("violations")
            ),
        ),
        row(
            "events.ts is not null",
            events.agg(
                F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias(
                    "violations"
                )
            ),
        ),
        row(
            "events.value is non-negative",
            events.agg(
                F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias(
                    "violations"
                )
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check_name", "violations", (F.col("violations") == 0).alias("ok")
    )


MIN_COOC = 3  # minimum pair co-occurrence (support count) to report


def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order line items: part
    pairs co-ordered at least ``MIN_COOC`` times, with support,
    confidence (a -> b) and lift — the classic co-occurrence analysis
    (and, pointed at token/doc co-occurrence, the same query is PMI
    mining).

    Scale shape: the pair generation is a self-equi-join on the ORDER
    key, so the blow-up is items-per-order squared (a small constant,
    ~4² here), never catalog²; item supports re-aggregate the same
    distinct (order, part) projection, and the order-count scalar rides
    a 1-row broadcast.  lift = (s_ab * N) / (s_a * s_b) is integer
    products with ONE exact division — double parity by construction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n_orders = items.select("okey").distinct().agg(
        F.count("*").cast("long").alias("n_orders")
    )
    supp = items.groupBy("part").agg(F.count("*").cast("long").alias("s"))
    a = items.select("okey", F.col("part").alias("part_a"))
    b = items.select("okey", F.col("part").alias("part_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("s_ab"))
        .filter(F.col("s_ab") >= MIN_COOC)
    )
    sa = supp.select(F.col("part").alias("part_a"), F.col("s").alias("s_a"))
    sb = supp.select(F.col("part").alias("part_b"), F.col("s").alias("s_b"))
    # support table is catalog-sized: no broadcast hint — AQE broadcasts
    # it at test scale and shuffles it if the catalog outgrows the limit
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "s_ab",
            "s_a",
            "s_b",
            r6(F.col("s_ab") / F.col("s_a")).alias("confidence"),
            r6(
                (F.col("s_ab") * F.col("n_orders"))
                / (F.col("s_a") * F.col("s_b"))
            ).alias("lift"),
        )
    )


ORACLES["basket_lift"] = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
),
n_orders AS (
  SELECT cast(count(DISTINCT okey) AS bigint) AS n_orders FROM items
),
supp AS (
  SELECT part, cast(count(*) AS bigint) AS s FROM items GROUP BY part
),
pairs AS (
  SELECT a.part AS part_a, b.part AS part_b,
         cast(count(*) AS bigint) AS s_ab
  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_COOC}
)
SELECT part_a, part_b, s_ab, sa.s AS s_a, sb.s AS s_b,
       (round(s_ab * 1.0 / sa.s, 6) + 0.0) AS confidence,
       (round((s_ab * n_orders) * 1.0 / (sa.s * sb.s), 6) + 0.0) AS lift
FROM pairs
JOIN supp sa ON sa.part = part_a
JOIN supp sb ON sb.part = part_b
CROSS JOIN n_orders
"""
QUERIES["basket_lift"] = basket_lift


RFM_BUCKETS = 5  # quintile scores


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic BI scoring: per customer,
    Recency (days since last order, relative to the corpus-wide latest
    order date), Frequency (order count) and Monetary (total spend),
    each quintile-scored 1..5 with 5 best.

    Scores use the INTEGER construction 1 + (rank-1)*B div n over a
    fully-ordered rank (metric, then custkey) instead of ``ntile`` —
    ntile's remainder distribution is engine-specific trivia, while
    rank arithmetic is exact integer parity by definition.  Scale shape:
    one orders aggregate (shuffle on custkey), a 1-row max-date
    broadcast, then three rank windows over the customer-cardinality
    aggregate — never over raw orders.  The global rank sort is the
    exactness price; at 100 TB (hundreds of millions of customers) the
    production variant scores against approx-percentile boundaries
    (the quantile_sketch machinery) instead of exact ranks — same
    output contract, sketch-certified cutpoints.
    """
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    latest = orders.agg(F.max("o_orderdate").alias("latest"))
    base = per.crossJoin(F.broadcast(latest)).select(
        "custkey",
        F.datediff("latest", "last_order").cast("long").alias("recency_days"),
        "frequency",
        (F.col("cents") / F.lit(100.0)).alias("monetary"),
        "cents",
    )
    n = Window.partitionBy()
    # rank ascending on "goodness": low recency good, high freq/spend good
    # quintile scores via genuine INTEGER division (Spark SQL `div`,
    # bigint in / bigint out), matching the oracle's `//` exactly — not
    # double division + cast truncation, which only coincides with floor
    # for non-negative sub-2^53 operands
    scored = base.withColumn("_n", F.count("*").over(n).cast("long"))
    for name, order_cols in [
        ("r_score", [F.desc("recency_days"), F.asc("custkey")]),
        ("f_score", [F.asc("frequency"), F.asc("custkey")]),
        ("m_score", [F.asc("cents"), F.asc("custkey")]),
    ]:
        w = Window.orderBy(*order_cols)
        scored = scored.withColumn(
            f"_{name}_num",
            # cast BEFORE the multiply: row_number is 32-bit int, so the
            # int*int product would wrap past ~2^31/RFM_BUCKETS (~429M)
            # customers — the cast-after form only looked safe at gate SF
            ((F.row_number().over(w) - 1).cast("long") * RFM_BUCKETS),
        ).withColumn(name, F.expr(f"1 + (_{name}_num div _n)").cast("long"))
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        # r2, not bare round: monetary is strictly positive today (sum of
        # positive order totals), but float-parity convention #4 applies to
        # every rounded-float output — the oracle already carries the +0.0
        # guard (ADVICE r7)
        r2(F.col("monetary")).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )


ORACLES["rfm_segments"] = f"""
WITH per AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS last_order,
         cast(count(*) AS bigint) AS frequency,
         cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
           AS cents
  FROM orders GROUP BY o_custkey
),
latest AS (SELECT max(o_orderdate) AS latest FROM orders),
base AS (
  SELECT custkey,
         cast(date_diff('day', last_order, latest) AS bigint)
           AS recency_days,
         frequency, cents
  FROM per CROSS JOIN latest
)
SELECT custkey, recency_days, frequency,
       (round(cents / 100.0, 2) + 0.0) AS monetary,
       cast(1 + ((row_number() OVER (ORDER BY recency_days DESC, custkey)
                  - 1) * {RFM_BUCKETS}) // (count(*) OVER ()) AS bigint)
         AS r_score,
       cast(1 + ((row_number() OVER (ORDER BY frequency ASC, custkey)
                  - 1) * {RFM_BUCKETS}) // (count(*) OVER ()) AS bigint)
         AS f_score,
       cast(1 + ((row_number() OVER (ORDER BY cents ASC, custkey)
                  - 1) * {RFM_BUCKETS}) // (count(*) OVER ()) AS bigint)
         AS m_score
FROM base
"""
QUERIES["rfm_segments"] = rfm_segments


RFM_APPROX_ACC = 10_000  # GK sketch accuracy (rank error <= n / ACC)
# cutpoint certification is in RANK space, the guarantee GK actually
# gives: the approx q-cutpoint must lie between the exact percentiles at
# q +- RANK_TOL.  (A value-space rtol is wrong at small n, where adjacent
# order statistics can sit far apart.)  RANK_TOL is 200x the sketch's
# 1/ACC rank error, so the booleans are stably true at any partitioning.
RFM_APPROX_RANK_TOL = 0.02


def rfm_segments_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM scoring against APPROX-percentile cutpoints — the 100 TB twin
    of :func:`rfm_segments` (VERDICT r13 task 6): exact quintiles need a
    global rank over every customer, and that single total order is the
    one stage of the exact query that cannot scale out.  Here each
    metric's four quintile CUTPOINTS come from ``approx_percentile``
    (Greenwald-Khanna summaries, merged map-side like any aggregate),
    broadcast back over the per-customer frame, and each customer scores
    1..5 by how many cutpoints its metric clears — plan: one shuffle to
    the per-customer aggregate, one O(metrics) sketch aggregate, one
    broadcast join.  NO global rank window anywhere (`WindowExec` absent
    from the plan).

    Cutpoint scoring also fixes the tie semantics rank-based quintiles
    get wrong at scale: equal metric values always score equally here,
    while row_number splits ties across buckets.

    Sketch values are partition-dependent, so per the quantile_sketch /
    distinct_sketch convention the CERTIFIED row is determinate facts
    per metric: the exact customer count, monotonicity of the scoring
    (every lower score's max goodness <= every higher score's min —
    checked on the O(scores) frame via a tiny self-join, no window),
    non-decreasing cutpoints, and four rank-tolerance booleans — each
    approx cutpoint bracketed by the exact percentiles at q +-
    ``RFM_APPROX_RANK_TOL`` (the ``percentile`` reference column exists
    only for this certification; the production scoring path never
    computes it).  Recency enters as
    its NEGATION ("goodness") so all three metrics score ascending —
    score 5 is the most recent / most frequent / highest spend, matching
    :func:`rfm_segments`'s orientation."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    latest = orders.agg(F.max("o_orderdate").alias("latest"))
    base = per.crossJoin(F.broadcast(latest)).select(
        "custkey",
        (-F.datediff("latest", "last_order")).cast("double").alias("recency"),
        F.col("frequency").cast("double").alias("frequency"),
        F.col("cents").cast("double").alias("monetary"),
    )
    long = base.selectExpr(
        "custkey",
        "stack(3, 'recency', recency, 'frequency', frequency,"
        " 'monetary', monetary) AS (metric, v)",
    )
    qs = "array(0.2, 0.4, 0.6, 0.8)"
    band = ", ".join(
        f"{q - RFM_APPROX_RANK_TOL}, {q + RFM_APPROX_RANK_TOL}"
        for q in (0.2, 0.4, 0.6, 0.8)
    )
    cuts = long.groupBy("metric").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.expr(f"approx_percentile(v, {qs}, {RFM_APPROX_ACC})").alias("ac"),
        F.expr(f"percentile(v, array({band}))").alias("ex"),
    )
    score = F.lit(1)
    for i in range(1, 5):
        score = score + (F.col("v") > F.element_at("ac", i)).cast("int")
    scored = long.join(F.broadcast(cuts.select("metric", "ac")), "metric")
    per_score = scored.groupBy("metric", score.alias("score")).agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    a, b = per_score.alias("a"), per_score.alias("b")
    mono = (
        a.join(
            b,
            (F.col("a.metric") == F.col("b.metric"))
            & (F.col("a.score") < F.col("b.score")),
        )
        .groupBy(F.col("a.metric").alias("metric"))
        .agg(F.bool_and(F.col("a.mx") <= F.col("b.mn")).alias("monotone_ok"))
    )

    def ok(i: int):
        lo, hi = F.element_at("ex", 2 * i - 1), F.element_at("ex", 2 * i)
        return (lo <= F.element_at("ac", i)) & (F.element_at("ac", i) <= hi)

    cuts_nondec = (
        (F.element_at("ac", 1) <= F.element_at("ac", 2))
        & (F.element_at("ac", 2) <= F.element_at("ac", 3))
        & (F.element_at("ac", 3) <= F.element_at("ac", 4))
    )
    return cuts.join(mono, "metric", "left").select(
        "metric",
        "n_customers",
        F.coalesce("monotone_ok", F.lit(True)).alias("monotone_ok"),
        cuts_nondec.alias("cuts_nondecreasing_ok"),
        ok(1).alias("q20_ok"),
        ok(2).alias("q40_ok"),
        ok(3).alias("q60_ok"),
        ok(4).alias("q80_ok"),
    )


ORACLES["rfm_segments_approx"] = """
WITH n AS (
  SELECT cast(count(DISTINCT o_custkey) AS bigint) AS n_customers FROM orders
)
SELECT m.metric, n.n_customers,
       true AS monotone_ok, true AS cuts_nondecreasing_ok,
       true AS q20_ok, true AS q40_ok, true AS q60_ok, true AS q80_ok
FROM n, (VALUES ('recency'), ('frequency'), ('monetary')) m(metric)
"""
QUERIES["rfm_segments_approx"] = rfm_segments_approx


Z_BITS = 16  # bits per dimension (sized to the testdata key domains;
# at larger domains widen — the construction is identical per bit)
Z_BUCKET_SHIFT = 2 * Z_BITS - 6  # top 6 z-bits -> 64 clustering buckets


def _morton(x, y):
    """Bit-interleaved (Morton / Z-order) key of two Z_BITS-wide ints —
    a 2*Z_BITS-term integer expression that constant-folds in codegen."""
    out = None
    for i in range(Z_BITS):
        tx = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = tx + ty if out is None else out + tx + ty
    return out


def zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit: interleave the bits of
    (l_partkey, l_suppkey), cut the keyspace into 64 z-buckets, and
    report each bucket's row count and min/max of BOTH dimensions — the
    file-skipping statistics a lakehouse keeps per data file after an
    OPTIMIZE ZORDER rewrite.  Z-clustering's point is visible directly
    in the output: every bucket bounds every dimension (a linear sort
    bounds only its leading column), so a range predicate on EITHER key
    prunes buckets by min/max.  The engine writes this physically via
    ``io.compact_parquet``'s range clustering; this query is the
    engine-portable key computation plus the audit, value-gated because
    bit interleaving is exact integer arithmetic in both engines.

    Scale shape: the z-key is a row-local integer expression folded into
    the scan; the audit is one groupBy over 64 buckets (map-side combine
    collapses to O(buckets) per partition).  At write time the same key
    feeds ``repartitionByRange`` — no extra shuffle beyond the sort the
    rewrite needs anyway.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("p"),
        F.col("l_suppkey").cast("long").alias("s"),
    )
    # range-normalize each dimension into the full Z_BITS width first
    # (standard Z-order practice — otherwise small key domains leave the
    # high interleaved bits all zero and every row lands in one bucket);
    # integer `div` keeps the scaling exact in both engines
    maxes = li.agg(
        F.max("p").alias("max_p"), F.max("s").alias("max_s")
    )
    scaled = li.crossJoin(F.broadcast(maxes)).select(
        "p",
        "s",
        F.expr(f"(p * {2 ** Z_BITS}) div (max_p + 1)").alias("pn"),
        F.expr(f"(s * {2 ** Z_BITS}) div (max_s + 1)").alias("sn"),
    )
    z = _morton(F.col("pn"), F.col("sn"))
    return (
        scaled.withColumn(
            "bucket", F.shiftright(z, Z_BUCKET_SHIFT).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("p").alias("min_partkey"),
            F.max("p").alias("max_partkey"),
            F.min("s").alias("min_suppkey"),
            F.max("s").alias("max_suppkey"),
        )
    )


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({x} >> {i}) & 1) * {2 ** (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {2 ** (2 * i + 1)}")
    return " + ".join(terms)


ORACLES["zorder_stats"] = f"""
WITH base AS (
  SELECT cast(l_partkey AS bigint) AS p, cast(l_suppkey AS bigint) AS s
  FROM lineitem
),
maxes AS (SELECT max(p) AS max_p, max(s) AS max_s FROM base),
scaled AS (
  SELECT p, s,
         (p * {2 ** Z_BITS}) // (max_p + 1) AS pn,
         (s * {2 ** Z_BITS}) // (max_s + 1) AS sn
  FROM base CROSS JOIN maxes
),
keyed AS (
  SELECT p, s,
         ({_morton_sql("pn", "sn")}) >> {Z_BUCKET_SHIFT} AS bucket
  FROM scaled
)
SELECT cast(bucket AS bigint) AS bucket,
       cast(count(*) AS bigint) AS n_rows,
       min(p) AS min_partkey, max(p) AS max_partkey,
       min(s) AS min_suppkey, max(s) AS max_suppkey
FROM keyed GROUP BY bucket
"""
QUERIES["zorder_stats"] = zorder_stats


ORACLES["dq_checks"] = """
WITH raw(check_name, violations) AS (
  SELECT 'documents.doc_id is unique',
         (SELECT cast(count(*) - count(DISTINCT doc_id) AS bigint)
          FROM documents)
  UNION ALL
  SELECT 'documents.n_chars equals length(text)',
         (SELECT cast(count(*) FILTER (n_chars <> len(text)) AS bigint)
          FROM documents)
  UNION ALL
  SELECT 'orders.o_custkey references customer',
         (SELECT cast(count(*) AS bigint) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'lineitem.l_orderkey references orders',
         (SELECT cast(count(*) AS bigint) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem.l_quantity in [1, 50]',
         (SELECT cast(count(*) FILTER (l_quantity < 1 OR l_quantity > 50)
                      AS bigint) FROM lineitem)
  UNION ALL
  SELECT 'lineitem.l_discount in [0, 0.1]',
         (SELECT cast(count(*) FILTER (l_discount < 0 OR l_discount > 0.1)
                      AS bigint) FROM lineitem)
  UNION ALL
  SELECT 'events.ts is not null',
         (SELECT cast(count(*) FILTER (ts IS NULL) AS bigint) FROM events)
  UNION ALL
  SELECT 'events.value is non-negative',
         (SELECT cast(count(*) FILTER (value < 0) AS bigint) FROM events)
)
SELECT check_name, violations, violations = 0 AS ok FROM raw
"""
QUERIES["dq_checks"] = dq_checks


# ---------------------------------------------------------------------------
# Shuffle-key skew profiling
# ---------------------------------------------------------------------------

# (relation, key column) pairs every big join/agg in this engine shuffles on
SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)
SKEW_HEAVY_X = 10  # a key is heavy when freq > SKEW_HEAVY_X * average


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew audit of the engine's shuffle keys — the measurement behind
    every salting/AQE-skew-join decision: per (relation, key), row and
    key cardinalities, the hottest key and its frequency, how many keys
    exceed {SKEW_HEAVY_X}x the average, and a skew verdict.

    All comparisons are integer cross-multiplications
    (freq * n_keys > X * n_rows), never rounded rationals — the
    classifier_score lesson — so the profile is exactly value-gated.
    Scale shape per key: one count-by-key shuffle (map-side combined)
    plus a single-row aggregate; relations never join each other.
    """
    outs = []
    for rel, key in SKEW_KEYS:
        freq = (
            load_table(spark, sf_dir, rel)
            .filter(F.col(key).isNotNull())
            .groupBy(F.col(key).cast("long").alias("k"))
            .agg(F.count("*").cast("long").alias("freq"))
        )
        prof = freq.agg(
            F.sum("freq").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("freq").cast("long").alias("max_freq"),
        )
        top = freq.join(F.broadcast(prof), F.col("freq") == F.col("max_freq")).agg(
            F.min("k").cast("long").alias("top_key")
        )
        heavy = (
            freq.crossJoin(F.broadcast(prof))
            .filter(
                F.col("freq") * F.col("n_keys")
                > F.lit(SKEW_HEAVY_X) * F.col("n_rows")
            )
            .agg(F.count("*").cast("long").alias("heavy_keys"))
        )
        outs.append(
            prof.crossJoin(top)
            .crossJoin(heavy)
            .select(
                F.lit(rel).alias("rel"),
                F.lit(key).alias("key_col"),
                "n_rows",
                "n_keys",
                "max_freq",
                "top_key",
                "heavy_keys",
                (
                    F.col("max_freq") * F.col("n_keys")
                    > F.lit(SKEW_HEAVY_X) * F.col("n_rows")
                ).alias("skewed"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


ORACLES["key_skew_profile"] = f"""
WITH profiles AS (
  {" UNION ALL ".join(
      f'''
  SELECT '{rel}' AS rel, '{key}' AS key_col,
         cast(sum(freq) AS bigint) AS n_rows,
         cast(count(*) AS bigint) AS n_keys,
         cast(max(freq) AS bigint) AS max_freq,
         cast(min(k) FILTER (freq = (SELECT max(f2.freq) FROM (
             SELECT count(*) AS freq FROM {rel}
             WHERE {key} IS NOT NULL GROUP BY {key}) f2))
           AS bigint) AS top_key,
         cast(count(*) FILTER (freq * (SELECT count(DISTINCT {key})
                                       FROM {rel} WHERE {key} IS NOT NULL)
                      > {SKEW_HEAVY_X} * (SELECT count(*) FROM {rel}
                                          WHERE {key} IS NOT NULL))
           AS bigint) AS heavy_keys
  FROM (SELECT cast({key} AS bigint) AS k, count(*) AS freq
        FROM {rel} WHERE {key} IS NOT NULL GROUP BY {key})
''' for rel, key in SKEW_KEYS)}
)
SELECT rel, key_col, n_rows, n_keys, max_freq, top_key, heavy_keys,
       max_freq * n_keys > {SKEW_HEAVY_X} * n_rows AS skewed
FROM profiles
"""
QUERIES["key_skew_profile"] = key_skew_profile


# ---------------------------------------------------------------------------
# Skew remedy: salted join + salted heavy-key aggregate (the fix for what
# key_skew_profile measures)
# ---------------------------------------------------------------------------

N_JOIN_SALTS = 8
N_AGG_SALTS = 16


def salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join remedy, demonstrated on the engine's canonical
    few-hot-keys shape: events.event_type has ~5 values over the whole
    fact table, so an unsalted shuffle join can use at most 5 reducers
    no matter the cluster size — the pathological case
    ``key_skew_profile`` exists to catch.  :func:`skew.salted_join`
    scatters each hot key across {N_JOIN_SALTS} deterministic sub-keys
    (salt = hash of the big-side row) and replicates the small side per
    salt, so the shuffle key becomes (event_type, __salt) and the hot
    key's rows spread over {N_JOIN_SALTS}x more reducers.  The join is
    pinned to the shuffled path (``shuffle_hash`` hint) because salting
    a broadcast join would be a no-op — this is the 100 TB shape where
    the dim is too big to broadcast.

    The oracle is the PLAIN unsalted join: result equivalence IS the
    gate (salting changes the shuffle distribution, never the result).
    The (event_type, __salt) exchange and the per-key salt spread are
    pinned in tests/test_sketches.py (salted-join plan assertions).
    """
    from .skew import salted_join as salted

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("type_events"))
    )
    joined = salted(
        ev, dim.hint("shuffle_hash"), on="event_type", n_salts=N_JOIN_SALTS
    )
    return joined.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("user_id").cast("long").alias("user_id"),
        "type_events",
    )


ORACLES["salted_join"] = """
WITH dim AS (
  SELECT event_type, cast(count(*) AS bigint) AS type_events
  FROM events GROUP BY event_type
)
SELECT cast(e.event_id AS bigint) AS event_id, e.event_type,
       cast(e.user_id AS bigint) AS user_id, d.type_events
FROM events e JOIN dim d USING (event_type)
"""
QUERIES["salted_join"] = salted_join


def salted_heavy_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key AGGREGATE remedy: exact per-type event and distinct-user
    counts via two-stage salted aggregation.

    ``count(*)`` alone needs no salting (Spark's partial aggregate
    combines map-side), but ``count(DISTINCT user_id)`` over a hot key
    is the shape that melts one reducer: the distinct set of the hottest
    key must be materialized in a single task.  The remedy salts by a
    function OF THE DISTINCT COLUMN — salt = hash(user_id) %
    {N_AGG_SALTS} — so each distinct user lands in exactly one
    (event_type, salt) group and per-salt distinct counts are additive:
    stage 1 aggregates (event_type, salt) partials across
    {N_AGG_SALTS}x more reducers, stage 2 sums {N_AGG_SALTS} tiny rows
    per key.  Result is exactly the direct aggregate (the oracle).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    salted = ev.withColumn(
        "salt", F.pmod(F.hash(F.col("user_id")), F.lit(N_AGG_SALTS))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").cast("long").alias("pn"),
        F.countDistinct("user_id").cast("long").alias("pu"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n_events"),
        F.sum("pu").cast("long").alias("n_users"),
    )


ORACLES["salted_heavy_agg"] = """
SELECT event_type, cast(count(*) AS bigint) AS n_events,
       cast(count(DISTINCT user_id) AS bigint) AS n_users
FROM events WHERE user_id IS NOT NULL GROUP BY event_type
"""
QUERIES["salted_heavy_agg"] = salted_heavy_agg
