"""Relational operator queries (SURVEY §2.B).

Each query exercises one named relational capability through the DataFrame
API (Catalyst plans it; no hand-scheduling) and carries a DuckDB oracle.

Cross-engine determinism rules used throughout:
- money/quantity aggregates go through DECIMAL so sums are exact and
  engine-order-independent, then CAST to DOUBLE for a stable comparable type;
- double aggregates that can't be decimal'd are ROUND()ed far from any
  representable boundary;
- every ORDER BY ... LIMIT has a total tie-break;
- sub-second timestamps in outputs are formatted to microsecond strings.

Scale notes: all joins below are either broadcastable dims (nation, region,
supplier, part at any realistic scale-out of this schema) or shuffle
equi-joins on the natural keys — the shapes AQE handles with runtime
coalescing and skew splitting. Nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


# --- B12 hash aggregation / B4-B5 scan+filter+project: TPC-H Q1 shape ------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> pushed filter -> hash agg (partial+final)."""
    li = load(spark, sf_dir, "lineitem")
    one = F.lit("1.00").cast("decimal(4,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", 4))
    charge = disc_price * (one + _dec("l_tax", 4))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# --- B6 equi-join + B20 top-k: TPC-H Q3 shape -------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o_orderdate AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way equi-join -> agg -> top-k (TakeOrdered)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    one = F.lit("1.00").cast("decimal(4,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", 4))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- B6+B11 multi-join with broadcastable dims: TPC-H Q5 shape --------------


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join; nation/region/supplier broadcast (explicit
    hints — they are tiny at any scale of this schema), fact tables shuffle
    on their natural keys."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    one = F.lit("1.00").cast("decimal(4,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", 4))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --- B7 semi / anti joins ----------------------------------------------------


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having a >400k order."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "anti_join_idle_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders at all."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# --- B6 full outer join ------------------------------------------------------


@query(
    "full_outer_nation_activity",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
    ON c.nk = s.nk
    """,
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with COALESCE'd key."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --- B14 rollup / cube / grouping sets --------------------------------------


@query(
    "rollup_nation_segment",
    oracle="""
    SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (nation -> nation x segment -> grand total)."""
    cust = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "cube_order_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations in one pass."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@query(
    "grouping_sets_order_dims",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_order_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent one-dimension rollups)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n_orders"))


# --- B16-B18 window functions -------------------------------------------------


@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    QUALIFY rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: per-customer top-3 orders by price (deterministic
    tie-break on o_orderkey)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_running_value_per_user",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
)
def window_running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (prefix sums; identical accumulation order
    in both engines, so doubles match bit-for-bit)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("running_value", F.round(F.sum("value").over(w), 2))
        .select("event_id", "user_id", "running_value")
    )


@query(
    "window_lag_value_delta",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
    FROM events
    """,
)
def window_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: delta vs previous event of the same user (NULL first)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


# --- B15 pivot / unpivot ------------------------------------------------------


@query(
    "pivot_user_event_matrix",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events WHERE user_id < 30
    GROUP BY user_id
    """,
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT event_type into columns (explicit value list -> single pass,
    no extra distinct-values job)."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) wide part metrics into (key, metric, value) rows."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# --- B21 set operations -------------------------------------------------------


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "setop_union_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --- B13 distinct aggregation -------------------------------------------------


@query(
    "distinct_event_types_per_user",
    oracle="""
    SELECT user_id, COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def distinct_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + plain COUNT in one aggregation (Spark expands to
    a two-phase plan automatically)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count_distinct("event_type").alias("n_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- B29 JSON functions -------------------------------------------------------


@query(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE) / COUNT(*) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the semi-structured props column + aggregation."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    cnt = F.count(F.lit(1))
    return ev.groupBy("event_type").agg(
        (F.sum(k).cast("double") / cnt).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# --- B25 date/time ------------------------------------------------------------


@query(
    "orders_monthly_volume",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY 1
    """,
)
def orders_monthly_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc to month + aggregation."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@query(
    "events_hourly_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling aggregation over the event stream table (batch twin
    of the streaming windowed count)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


# --- B10 as-of join -----------------------------------------------------------


@query(
    "asof_join_last_click_before_error",
    oracle="""
    SELECT e.event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def asof_join_last_click_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest earlier match) without a native Spark operator:
    union both sides, single window pass with last(ignoreNulls) — one
    shuffle on user_id, no range explosion. This is the scalable as-of
    pattern (vs. the nested-loop range join)."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "error")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # order clicks before errors at identical timestamps (event_type is the
    # tie-break: 'click' < 'error') so a same-microsecond click is visible
    # to the error row — matching DuckDB ASOF's inclusive e.ts >= c.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "error")
        .select(
            "event_id",
            F.date_format("last_click", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_click_ts"),
        )
    )


# --- B9 range join --------------------------------------------------------------


@query(
    "range_join_purchases_after_signup",
    oracle="""
    SELECT s.event_id, COUNT(p.event_id) AS purchases_7d
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id
     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
    GROUP BY s.event_id
    """,
)
def range_join_purchases_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 7 days after each signup. The
    user_id equi-key keeps this a hash/sort-merge join with the range as a
    residual predicate — no nested-loop blowup."""
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"), F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = s.join(
        p,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAY")),
        "left",
    )
    return joined.groupBy(F.col("s_event_id").alias("event_id")).agg(
        F.count("p_event_id").alias("purchases_7d")
    )


# --- B24 string functions -------------------------------------------------------


@query(
    "string_funcs_doc_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(length(text)) AS min_len,
           MAX(length(text)) AS max_len,
           COUNT(DISTINCT lang) AS n_langs,
           MAX(upper(substring(text, 1, 8))) AS max_prefix
    FROM documents GROUP BY source
    """,
)
def string_funcs_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family over documents (length/substr/upper + aggs)."""
    docs = load(spark, sf_dir, "documents")
    cnt = F.count(F.lit(1))
    return docs.groupBy("source").agg(
        cnt.alias("n_docs"),
        (F.sum("n_chars").cast("double") / cnt).alias("avg_chars"),
        F.min(F.length("text")).alias("min_len"),
        F.max(F.length("text")).alias("max_len"),
        F.count_distinct("lang").alias("n_langs"),
        F.max(F.upper(F.substring("text", 1, 8))).alias("max_prefix"),
    )


# --- B26 conditional expressions ------------------------------------------------


@query(
    "part_price_buckets",
    oracle="""
    SELECT p_brand,
           CASE WHEN p_retailprice < 500 THEN 'low'
                WHEN p_retailprice < 1200 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n_parts,
           MAX(p_size) AS max_size
    FROM part GROUP BY 1, 2
    """,
)
def part_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + multi-key aggregation."""
    part = load(spark, sf_dir, "part")
    bucket = (
        F.when(F.col("p_retailprice") < 500, "low")
        .when(F.col("p_retailprice") < 1200, "mid")
        .otherwise("high")
    )
    return part.groupBy("p_brand", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_parts"), F.max("p_size").alias("max_size")
    )


# --- B27 array functions ----------------------------------------------------------


@query(
    "word_stats_per_lang",
    oracle="""
    SELECT lang,
           COUNT(DISTINCT word) AS n_distinct_words,
           COUNT(*) AS total_words
    FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY lang
    """,
)
def word_stats_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode (the tokenization substrate shared by dedup and
    text analysis) + distinct aggregation."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("lang").agg(
        F.count_distinct("word").alias("n_distinct_words"),
        F.count(F.lit(1)).alias("total_words"),
    )
