"""General relational operator surface over the star schema.

The reference has no SQL surface at all (SURVEY.md §2 — its only joins are a
pair-RDD join and a hand-rolled broadcast nested-loop, §2.3).  A user of a
general engine needs the standard operator set, so this module provides it
over the TPC-H-ish tables: filtered scan + group-agg, multi-way joins
(broadcast for dims, shuffled for facts), windows/top-k, semi/anti joins,
rollup, set operations, JSON extraction, and time-bucketed aggregation.

Scale notes (100 TB posture):
- dimension tables (region/nation/supplier/part/customer) are broadcast —
  Catalyst does this under the autoBroadcastJoinThreshold, AQE re-plans if a
  runtime size estimate crosses it;
- fact-fact joins (orders x lineitem) shuffle on the join key; both sides
  arrive pre-bucketable by orderkey in a real deployment (writer would
  bucketBy(orderkey));
- global top-k uses row_number over a single partition ONLY after a
  group-agg has reduced cardinality to #groups, never over raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import r2, r6, sum2dp
from .io import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: scan-heavy group-agg with pushed-down date filter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price"),
            r2(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            r6(F.avg("l_quantity")).alias("avg_qty"),
            r6(F.avg("l_extendedprice")).alias("avg_price"),
            r6(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: dim-filtered 3-way join + top-10 by revenue."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
    return (
        joined.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
        .select("rk", "o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join, revenue per nation for co-located
    customer/supplier, one region, one year."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k: 3 highest-spending customers per nation (O2/O3 analog)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(r2(F.sum("o_totalprice")).alias("total_spend"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return (
        spend.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("n_name", "rk", "c_custkey", "c_name", "total_spend")
    )


def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one 'O'-status order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) over customer order totals (§2.4 ABSENT ops)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return base.rollup("r_name", "n_name").agg(
        r2(F.sum("o_totalprice")).alias("total_sales"),
        F.count("*").cast("long").alias("n_orders"),
    )


def segment_custkey_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result, tagged by op (§2.6 ABSENT).

    Sets: customers with an open ('O') order vs customers with a finished
    ('F') order.
    """
    orders = load_table(spark, sf_dir, "orders")
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    union = o_keys.union(f_keys).distinct().withColumn("op", F.lit("union"))
    inter = o_keys.intersect(f_keys).withColumn("op", F.lit("intersect"))
    exc = o_keys.exceptAll(f_keys).withColumn("op", F.lit("except"))
    return union.union(inter).union(exc).select("op", "c_custkey")


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation over the events table (batch analog of the
    streaming pipeline in streaming/pipeline.py; SURVEY.md §2.9)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        r2(sum2dp(F.col("value"))).alias("sum_value"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (§2.7 ABSENT map/JSON functions): props.k stats."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            r6(F.avg("k")).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
            F.count("*").cast("long").alias("n"),
        )
    )


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: EXISTS-style semi join with an inequality predicate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp"))
    return (
        orders.join(
            late, orders.o_orderkey == late.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       (round(sum(l_quantity), 2) + 0.0) AS sum_qty,
       (round(sum(l_extendedprice), 2) + 0.0) AS sum_base_price,
       (round(sum(l_extendedprice * (1 - l_discount)), 2) + 0.0) AS sum_disc_price,
       (round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) + 0.0) AS sum_charge,
       (round(avg(l_quantity), 6) + 0.0) AS avg_qty,
       (round(avg(l_extendedprice), 6) + 0.0) AS avg_price,
       (round(avg(l_discount), 6) + 0.0) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "q3_shipping_priority": """
WITH joined AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         (round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0.0) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND l.l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT rk, o_orderkey, o_orderdate, o_orderpriority, revenue
FROM (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS rk
  FROM joined
) WHERE rk <= 10
""",
    "q5_local_supplier_volume": """
SELECT n.n_name,
       (round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0.0) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    "top_customers_per_nation": """
WITH spend AS (
  SELECT o_custkey, (round(sum(o_totalprice), 2) + 0.0) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT n_name, rk, c_custkey, c_name, total_spend
FROM (
  SELECT n.n_name, c.c_custkey, c.c_name, s.total_spend,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY s.total_spend DESC, c.c_custkey ASC) AS rk
  FROM spend s
  JOIN customer c ON s.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
) WHERE rk <= 3
""",
    "customers_with_open_orders": """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
    "customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    "sales_rollup": """
SELECT r.r_name, n.n_name,
       (round(sum(o.o_totalprice), 2) + 0.0) AS total_sales,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    "segment_custkey_setops": """
WITH o_keys AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'),
f_keys AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM o_keys UNION SELECT c_custkey FROM f_keys)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM o_keys INTERSECT SELECT c_custkey FROM f_keys)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM o_keys EXCEPT SELECT c_custkey FROM f_keys)
""",
    "events_hourly": """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       (round(sum(cast(round(value * 100) AS bigint)) / 100.0, 2) + 0.0) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
""",
    "events_json_stats": """
SELECT event_type,
       (round(avg(cast(json_extract_string(props, '$.k') AS bigint)), 6) + 0.0) AS avg_k,
       max(cast(json_extract_string(props, '$.k') AS bigint)) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
""",
    "order_priority_check": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > TIMESTAMP '2000-01-01')
GROUP BY o_orderpriority
""",
}

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "top_customers_per_nation": top_customers_per_nation,
    "customers_with_open_orders": customers_with_open_orders,
    "customers_without_orders": customers_without_orders,
    "sales_rollup": sales_rollup,
    "segment_custkey_setops": segment_custkey_setops,
    "events_hourly": events_hourly,
    "events_json_stats": events_json_stats,
    "order_priority_check": order_priority_check,
}
