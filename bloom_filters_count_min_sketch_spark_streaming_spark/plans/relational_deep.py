"""Deeper TPC-H-shaped relational coverage (SURVEY §2.B continued):
subqueries (scalar/IN/EXISTS via joins), HAVING, correlated patterns,
complex OR predicates, percentage-of-total aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _revenue():
    one = F.lit("1.00").cast("decimal(4,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount", 4))


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan (all pushed to parquet)
    + single global aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join, returned-items revenue, top-20."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a left join (order-count
    histogram per customer)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL}
                                 ELSE CAST(0.00 AS DECIMAL(18,4)) END)
                / SUM({_REVENUE_SQL}) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio (percentage-of-total).
    Decimal division then a single cast keeps both engines bit-identical."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(load(spark, sf_dir, "part"))
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
        F.lit("0.00").cast("decimal(18,4)")
    )
    return joined.agg(
        (F.lit(100.0) * F.sum(promo) / F.sum(_revenue())).cast("double").alias("promo_share")
    )


@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate AS orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregation + HAVING threshold + top-n."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "q19_predicate_or_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_predicate_or_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across the
    join (Catalyst pushes the common parts below the join)."""
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part"))
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 40))
    )
    return joined.filter(cond).agg(F.sum(_revenue()).cast("double").alias("revenue"))


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT substring(c_name, 10, 1) AS name_digit,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join + aggregation.

    The scalar average is computed as a 1-row broadcast-joined aggregate
    (Catalyst's decorrelated form), not a driver-side collect."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    idle_rich = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle_rich.groupBy(F.substring("c_name", 10, 1).alias("name_digit")).agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
    )


@query(
    "q7_nation_pair_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name < sn.n_name
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between nation pairs — the same dim
    table joined twice under different roles."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = load(spark, sf_dir, "nation")
    cn = F.broadcast(nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cn, F.col("c_nationkey") == F.col("cnk"))
        .join(sn, F.col("s_nationkey") == F.col("snk"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q12_priority_shipping_buckets",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high' ELSE 'low' END AS priority_class,
           date_part('year', l_shipdate) AS ship_year,
           COUNT(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def q12_priority_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class bucketing x ship-year."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    pclass = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            pclass.alias("priority_class"),
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue 'view' + scalar-max subquery
    (two references to one derived table; Catalyst reuses the exchange)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_revenue()).cast("double").alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(rev, supp.s_suppkey == rev.suppkey)
        .join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                                        / COUNT(*))
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity threshold) — expressed as an aggregate join, which is exactly
    Catalyst's decorrelated plan for the subquery form."""
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23"))
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))).alias(
            "qty_threshold"
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q21_waiting_orders_by_supplier",
    oracle="""
    SELECT s_name, COUNT(DISTINCT o_orderkey) AS n_waiting
    FROM supplier
    JOIN lineitem l ON s_suppkey = l.l_suppkey
    JOIN orders    ON o_orderkey = l.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l.l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY s_name
    """,
)
def q21_waiting_orders_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (simplified to fixture columns): suppliers whose
    line items shipped long after the order date on finalized orders."""
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("s_name")
        .agg(F.count_distinct("o_orderkey").alias("n_waiting"))
    )


@query(
    "exists_subquery_sql_entry",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def exists_subquery_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape, exercised through the spark.sql() ENTRY POINT
    (correlated EXISTS subquery; Catalyst decorrelates to a semi join)."""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"bfcms_{t}")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM bfcms_orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM bfcms_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
        """
    )


@query(
    "in_subquery_parts",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      AND p_type <> 'PROMO'
    GROUP BY p_brand
    """,
)
def in_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (semi join) + negated predicate, via spark.sql()."""
    for t in ("part", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"bfcms_{t}")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM bfcms_part
        WHERE p_partkey IN (SELECT l_partkey FROM bfcms_lineitem WHERE l_quantity >= 49)
          AND p_type <> 'PROMO'
        GROUP BY p_brand
        """
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT date_part('year', o_orderdate) AS o_year,
           ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_2' THEN {_REVENUE_SQL}
                               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM({_REVENUE_SQL}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN part      ON l_partkey = p_partkey
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's trade volume per
    year — conditional aggregation over an 8-table star join. Every dim
    (part, region, both nation roles, supplier) is broadcast; only the
    fact-to-fact lineitem<->orders<->customer path shuffles. The ratio
    divides two exact DECIMAL sums cast to double, so both engines divide
    identical operands (round(6) guards the last bit)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    cn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    )
    sn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    )
    vol = _revenue()
    zero = F.lit("0").cast("decimal(12,2)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cnk"))
        .join(region, F.col("crk") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q16_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_size IN (1, 7, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape with lineitem as the part<->supplier bridge (the
    fixtures carry no partsupp): distinct-supplier counts per part
    attribute triple, excluding flagged suppliers. NOT IN compiles to a
    broadcast anti-join (s_suppkey is never NULL in the fixtures, so anti
    join == NOT IN); the part filter is broadcast so the only shuffle is
    the final distinct aggregation."""
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#3")
            & F.col("p_size").isin(1, 7, 9, 14, 23, 36, 45, 49)
        )
    )
    li = load(spark, sf_dir, "lineitem")
    flagged = F.broadcast(
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(flagged, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation, date_part('year', o_orderdate) AS o_year,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part      ON l_partkey = p_partkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders    ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit = revenue, the fixtures carry no partsupp
    supplycost): supplier-nation x order-year revenue for a part-name
    pattern. The LIKE filter prunes part BEFORE the broadcast, so the
    fact scan only hash-probes matching parts."""
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    sn = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("snk"), F.col("n_name").alias("nation")
        )
    )
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("snk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(_revenue()).cast("double").alias("profit"))
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-range filter + correlated EXISTS (semi join on a
    per-row predicate) + priority group-by. The fixture lineitem has no
    commitdate/receiptdate, so "late" is l_shipdate > o_orderdate + 60 days —
    the correlated-predicate semi-join shape is identical.

    Scale shape: the EXISTS compiles to a left-semi sort-merge/shuffled-hash
    join on l_orderkey with the date predicate evaluated join-side; the
    orders date filter is pushed to the parquet scan.
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "time_hierarchy_rollup",
    oracle="""
    -- hypertable-style time rollup: one pass produces hourly, daily and
    -- grand-total aggregates (GROUPING bitmask disambiguates the levels).
    -- value carries 2 decimals -> DECIMAL-exact sums
    SELECT day(ts) AS d, hour(ts) AS h,
           GROUPING(day(ts), hour(ts)) AS lvl,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(day(ts), hour(ts))
    """,
)
def time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (the hypertable continuous-aggregate shape):
    hour-level, day-level and grand-total aggregates from ONE scan via
    ROLLUP — Spark expands the grouping sets map-side, so the shuffle
    carries partially-aggregated rows for every level at once instead of
    re-scanning per granularity. grouping_id() tags the level (same
    bitmask semantics as DuckDB's GROUPING)."""
    ev = load(spark, sf_dir, "events")
    d, h = F.dayofmonth("ts").alias("d"), F.hour("ts").alias("h")
    return (
        ev.select(d, h, F.col("value").cast("decimal(12,2)").alias("v"))
        .rollup("d", "h")
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("total_value"),
        )
        .select("d", "h", "lvl", "n_events", "total_value")
    )


@query(
    "robust_outlier_bounds",
    oracle="""
    -- median/MAD robust outlier rule (Hampel): both engines compute the
    -- same continuous medians and the same IEEE threshold arithmetic from
    -- identical doubles, so no rounding is needed anywhere
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, med, median(abs(e.value - med)) AS mad
      FROM events e JOIN med ON e.event_type = med.event_type
      GROUP BY e.event_type, med
    )
    SELECT m.event_type, m.med, m.mad,
           CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m ON e.event_type = m.event_type
    GROUP BY m.event_type, m.med, m.mad
    """,
)
def robust_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier detection per event type — the Hampel
    identifier a quality pipeline prefers over mean/stddev because a few
    extreme rows cannot move the fence. Two exact-median aggregations and
    one counting pass; the per-group medians are a ~5-row broadcast back
    onto the fact scan."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"))
                .cast("long")
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select("event_type", "med", "mad", "n_outliers")
    )


@query(
    "funnel_conversion",
    oracle="""
    -- signup -> purchase funnel: users whose FIRST signup is followed by a
    -- purchase within 2 hours; conversion expressed over the signup cohort
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
      SELECT s.user_id,
             MAX(CASE WHEN e.event_type = 'purchase'
                       AND e.ts > s.signup_ts
                       AND e.ts <= s.signup_ts + INTERVAL 2 HOUR
                      THEN 1 ELSE 0 END) AS converted
      FROM s JOIN events e ON e.user_id = s.user_id
      GROUP BY s.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(SUM(converted) * 1.0 / COUNT(*), 6) AS conversion_rate
    FROM conv
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (the event-analytics staple): per user, anchor on
    the FIRST signup, test for a purchase inside the 2-hour window, report
    cohort-level conversion. One groupBy builds the anchor table (small —
    one row per signup user), broadcast back onto the fact scan; the
    window predicate evaluates join-side, so no per-user subquery ever
    runs. Same shape at 100 TB with the anchor table hash-joined instead
    of broadcast."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        ev.join(F.broadcast(s), "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("signup_ts"))
                    & (F.col("ts") <= F.col("signup_ts") + F.expr("INTERVAL 2 HOURS"))
                ).cast("int")
            ).alias("converted")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_signup_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(F.sum("converted") / F.count(F.lit(1)), 6).alias("conversion_rate"),
    )


@query(
    "retention_cohorts",
    oracle="""
    -- weekly retention triangle: cohort = ISO week of a user's first
    -- event; each (cohort, active-week) cell counts distinct users
    WITH first AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT f.user_id,
             week(f.first_ts) AS cohort_week,
             week(e.ts) AS active_week
      FROM events e JOIN first f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(active_week AS BIGINT) AS active_week,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act GROUP BY cohort_week, active_week
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by the week of their first
    event, counted in every week they return — the table behind every
    retention curve. The first-event anchor is one row per user
    (broadcast); the distinct collapses (user, cohort, week) before the
    final count so the heavy agg runs on already-deduplicated rows."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    act = (
        ev.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            F.weekofyear("first_ts").cast("long").alias("cohort_week"),
            F.weekofyear("ts").cast("long").alias("active_week"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "active_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@query(
    "event_transition_matrix",
    oracle="""
    -- First-order Markov transition matrix of event types per user: the
    -- sequence-analytics staple (what follows what?). Transitions come
    -- from LEAD over (user, ts, event_id) — a totally-ordered window, so
    -- both engines see identical successor pairs; probabilities are
    -- exact-int ratios rounded once.
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), t AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), tot AS (
      SELECT cur, CAST(SUM(n) AS BIGINT) AS n_out FROM t GROUP BY cur
    )
    SELECT t.cur, t.nxt, t.n AS n_transitions,
           ROUND(t.n * 1.0 / tot.n_out, 6) AS p
    FROM t JOIN tot USING (cur)
    ORDER BY t.cur, t.nxt
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov chain):
    LEAD over the (user, time) window pairs each event with its successor,
    then one hash aggregate per (cur, next) cell. The window shuffles once
    on user_id; the matrix is |types|^2 rows — broadcastable planner food
    for sequence models and anomaly baselines."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    t = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n_transitions"))
    tot = t.groupBy("cur").agg(F.sum("n_transitions").cast("long").alias("n_out"))
    return (
        t.join(tot, "cur")
        .select(
            "cur",
            "nxt",
            "n_transitions",
            F.round(F.col("n_transitions") * 1.0 / F.col("n_out"), 6).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


@query(
    "skyline_orders",
    oracle="""
    -- Skyline / Pareto-dominance preference query (Borzsony et al. ICDE
    -- 2001): orders not dominated on (low price, recent date) by any other
    -- order of the same status. Dominance is an anti-join against a
    -- strictly-better witness; ties on both dims keep the row.
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders d
      WHERE d.o_orderstatus = o.o_orderstatus
        AND d.o_totalprice <= o.o_totalprice
        AND d.o_orderdate >= o.o_orderdate
        AND (d.o_totalprice < o.o_totalprice OR d.o_orderdate > o.o_orderdate)
    )
    ORDER BY o_orderkey
    """,
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: the Pareto frontier of (minimize price, maximize
    recency) per order status, as a dominance ANTI-join.

    Scale shape: the dominance join is equi on o_orderstatus (hash
    partitionable); within a partition the frontier is tiny. At 100 TB
    you would pre-filter with a grid/quantile pruning pass (any point
    below the per-cell min is dominated) before the pairwise check — the
    partition-key structure here is that design's skeleton."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderstatus").alias("d_status"),
        F.col("o_totalprice").alias("d_price"),
        F.col("o_orderdate").alias("d_date"),
    )
    dominated = (
        (F.col("d_status") == F.col("o_orderstatus"))
        & (F.col("d_price") <= F.col("o_totalprice"))
        & (F.col("d_date") >= F.col("o_orderdate"))
        & ((F.col("d_price") < F.col("o_totalprice")) | (F.col("d_date") > F.col("o_orderdate")))
    )
    return (
        o.join(d, dominated, "left_anti")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "trend_slope_per_type",
    oracle="""
    -- Per-key OLS trend (closed form): slope/intercept of value vs hours-
    -- since-2024-01-01. REGR_SLOPE's internal float accumulation is order-
    -- dependent, so the moments are built the repo's way instead: each
    -- term ROUNDed, summed as DECIMAL (exact, order-free), and the final
    -- slope arithmetic is an identical IEEE chain in both engines.
    WITH m AS (
      SELECT event_type,
             (epoch_us(ts) - 1704067200000000) / 3600000000.0 AS x,
             value AS y
      FROM events
    ), s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(x * x, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxx
      FROM m GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept
    FROM s ORDER BY event_type
    """,
)
def trend_slope_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise linear-regression trend (is `value` drifting over the
    month?) via the closed-form OLS moments — one hash aggregate per key,
    no iteration, deterministic by per-term round + DECIMAL sums. The
    portable alternative to REGR_SLOPE/REGR_INTERCEPT, whose float
    accumulators are summation-order-dependent."""
    ev = load(spark, sf_dir, "events")
    x = (F.unix_micros(F.col("ts")) - F.lit(1704067200000000)) / F.lit(3600000000.0)
    m = ev.select("event_type", x.alias("x"), F.col("value").alias("y"))

    def dsum(col, scale, prec=28):
        return F.sum(F.round(col, scale).cast(f"decimal({prec},{scale})")).cast(
            "double"
        )

    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x"), 6).alias("sx"),
        dsum(F.col("y"), 6).alias("sy"),
        dsum(F.col("x") * F.col("y"), 4).alias("sxy"),
        dsum(F.col("x") * F.col("x"), 4).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    ).orderBy("event_type")


@query(
    "winsorized_stats",
    oracle="""
    -- Winsorized robust mean per key: clamp value to its group's exact
    -- [p05, p95] (quantile_cont — identical sort+interpolate doubles in
    -- both engines), then a rounded-term DECIMAL mean. The standard
    -- outlier-resistant aggregate for noisy metrics.
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    ), c AS (
      SELECT e.event_type,
             e.value AS raw,
             LEAST(GREATEST(e.value, q.lo), q.hi) AS w
      FROM events e JOIN q USING (event_type)
    )
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(ROUND(raw, 6) AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS raw_mean,
           ROUND(CAST(SUM(CAST(ROUND(w, 6) AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS winsorized_mean
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (clamp to exact per-group [p05, p95], then average):
    robust central tendency for heavy-tailed metrics. percentile_cont is a
    sort-based exact aggregate in both engines; the clamp is elementwise;
    the means are rounded-term DECIMAL sums over exact counts. Two hash
    aggregates + one broadcastable |keys|-row join."""
    ev = load(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY value)").alias("lo"),
        F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY value)").alias("hi"),
    )
    c = ev.join(F.broadcast(q), "event_type").select(
        "event_type",
        F.col("value").alias("raw"),
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w"),
    )

    def dmean(col):
        return F.round(
            F.sum(F.round(col, 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )

    return (
        c.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dmean(F.col("raw")).alias("raw_mean"),
            dmean(F.col("w")).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "bitmap_dau_mau",
    oracle="""
    -- Bitmap presence aggregation (the roaring-bitmap pattern in pure
    -- SQL): users packed 32-per-word via bit_or of shifted ones, DAU =
    -- popcount per day, MAU = popcount of the month-OR, stickiness =
    -- DAU/MAU. All integer bit ops — bit-exact in any engine; the bitmap
    -- words are the mergeable "sketch" (exact, O(|users|/32) bytes).
    WITH bits AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             user_id // 32 AS word,
             (CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS b
      FROM events
    ), daily AS (
      SELECT day, word, bit_or(b) AS bm FROM bits GROUP BY day, word
    ), dau AS (
      SELECT day, CAST(SUM(bit_count(bm)) AS BIGINT) AS dau FROM daily GROUP BY day
    ), monthly AS (
      SELECT word, bit_or(bm) AS bm FROM daily GROUP BY word
    ), mau AS (
      SELECT CAST(SUM(bit_count(bm)) AS BIGINT) AS mau FROM monthly
    )
    SELECT day, dau.dau, mau.mau,
           ROUND(dau.dau * 1.0 / mau.mau, 4) AS stickiness
    FROM dau CROSS JOIN mau ORDER BY day
    """,
)
def bitmap_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness via bitmap aggregation: each (day, word) cell
    OR-packs 32 users into one BIGINT, popcounts give exact distinct
    counts, and the month bitmap is the OR of the day bitmaps — an exact,
    mergeable presence sketch at |users|/32 longs per period. The pattern
    behind roaring-bitmap engines (Druid/ClickHouse groupBitmap), here as
    two hash aggregates of integer bit ops."""
    ev = load(spark, sf_dir, "events")
    bits = ev.select(
        F.to_date("ts").cast("string").alias("day"),
        (F.col("user_id") / 32).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").alias("b"),
    ).distinct()
    daily = bits.groupBy("day", "word").agg(F.bit_or("b").alias("bm"))
    dau = daily.groupBy("day").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("dau")
    )
    monthly = daily.groupBy("word").agg(F.bit_or("bm").alias("bm"))
    mau = monthly.agg(F.sum(F.bit_count("bm")).cast("long").alias("mau"))
    return (
        dau.crossJoin(F.broadcast(mau))
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau") * 1.0 / F.col("mau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "market_basket_lift",
    oracle="""
    -- Association rules over order baskets: support / confidence / lift
    -- for brand pairs co-occurring in an order (Agrawal-Srikant's measure
    -- set). All ratios are exact-int divisions; top-15 by lift with a
    -- total tie-break.
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
    brand_cnt AS (
      SELECT brand, COUNT(*) AS cnt FROM items GROUP BY brand
    ), pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_cnt
      FROM items a JOIN items b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, pair_cnt,
           ROUND(pair_cnt * 1.0 / n.n_orders, 6) AS support,
           ROUND(pair_cnt * 1.0 / ca.cnt, 6) AS confidence,
           ROUND(pair_cnt * 1.0 * n.n_orders / (ca.cnt * cb.cnt), 6) AS lift
    FROM pairs
    JOIN brand_cnt ca ON ca.brand = brand_a
    JOIN brand_cnt cb ON cb.brand = brand_b
    CROSS JOIN n
    ORDER BY lift DESC, brand_a, brand_b LIMIT 15
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift) for
    brand pairs within an order — the Apriori single-level measure set.

    Scale shape: the basket self-join is equi on the order key (hash
    partitionable, work ∝ Σ basket²); brand counts and the scalar order
    count broadcast. At 100 TB you'd cap basket size and prune by minimum
    support first — both knobs are one filter on these intermediates."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    items = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    n_orders = items.select("okey").distinct().count()
    brand_cnt = items.groupBy("brand").agg(F.count(F.lit(1)).alias("cnt"))
    a = items.select("okey", F.col("brand").alias("brand_a"))
    b = items.select(F.col("okey").alias("okey_b"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, (a.okey == b.okey_b) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    ca = brand_cnt.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("ca"))
    cb = brand_cnt.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            F.round(F.col("pair_cnt") * 1.0 / F.lit(n_orders), 6).alias("support"),
            F.round(F.col("pair_cnt") * 1.0 / F.col("ca"), 6).alias("confidence"),
            F.round(
                F.col("pair_cnt") * 1.0 * F.lit(n_orders) / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(15)
    )


# --- Spark 4 collation-aware grouping -----------------------------------------


@query(
    "collated_group_counts",
    oracle="""
    SELECT lower(seg) AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM (
      SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                  WHEN c_custkey % 3 = 1 THEN c_mktsegment
                  ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                              lower(substr(c_mktsegment, 2)))
             END AS seg,
             c_acctbal
      FROM customer
    )
    WHERE lower(seg) <> 'machinery'
    GROUP BY lower(seg)
    ORDER BY segment
    """,
)
def collated_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware aggregation (Spark 4 string collations): customers
    whose market segment arrives in inconsistent casing (lower / UPPER /
    Title, deterministically derived from the key) are grouped and
    filtered under the UTF8_LCASE collation — the engine's hash agg and
    comparisons are collation-aware, no normalize-then-group rewrite.

    The oracle (DuckDB has no collations) IS that rewrite — lower() both
    places — which is exactly the equivalence the collation feature
    guarantees. Output key lower()ed + cast back to the default collation
    so the representative's case can't leak nondeterminism."""
    cust = load(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.col("c_mktsegment"))
        .otherwise(F.initcap(F.lower("c_mktsegment")))
    )
    segk = F.collate(F.col("seg"), "UTF8_LCASE")
    return (
        cust.select(seg.alias("seg"), "c_acctbal")
        .filter(segk != F.lit("MACHINERY"))
        .groupBy(segk.alias("segk"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .select(
            F.lower("segk").cast("string").alias("segment"),
            "n_customers",
            "total_bal",
        )
        .orderBy("segment")
    )


# --- sequence mining: most common event-type paths ----------------------------


@query(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT event_type AS t1,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, COUNT(*) AS n_paths
    FROM seq
    WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n_paths DESC, t1, t2, t3
    LIMIT 20
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths across user journeys (sequence-mining
    counterpart of the first-order transition matrix): two LEADs over the
    totally-ordered (user, ts, event_id) window, one hash agg, top-20 with
    a full tie-break. Scale shape: the window shuffles once on user_id and
    both LEADs ride the same sort; the path-count agg is map-side
    combinable (trigram space is tiny vs events)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(20)
    )


# --- distributed Poisson bootstrap --------------------------------------------

# Poisson(1) cumulative thresholds (double literals, identical in both
# engines); resampling weight = inverse-CDF of an md5-uniform, capped at 6
# (P(w > 6) < 1e-4 — the truncation is part of the resampling definition,
# applied identically everywhere).
_POIS_CDF = [
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
]

_BOOT_R = 32

_pois_case_sql = (
    "CASE "
    + " ".join(f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF))
    + " ELSE 6 END"
)


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    -- Distributed Poisson bootstrap (Chamandy et al.): per (row, replicate)
    -- weight ~ Poisson(1) from an md5-uniform — no sampling coordination,
    -- one pass, embarrassingly parallel. CI bounds are ORDER STATISTICS of
    -- the {_BOOT_R} replicate means (rank 2 / rank {_BOOT_R - 1}), not
    -- interpolated quantiles, so cross-engine equality is exact.
    WITH reps AS (SELECT unnest(generate_series(0, {_BOOT_R - 1})) AS r),
    h AS (
      SELECT event_type, value, r,
             (('0x' || substr(md5(event_id::VARCHAR || ':' || r::VARCHAR),
                              1, 12))::BIGINT + 1) / 281474976710656.0 AS u
      FROM events CROSS JOIN reps
    ),
    wt AS (SELECT event_type, value, r, {_pois_case_sql} AS wt FROM h),
    rm AS (
      SELECT event_type, r,
             CAST(SUM(wt * CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(wt) AS DOUBLE) AS m
      FROM wt GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type, m,
             row_number() OVER (PARTITION BY event_type ORDER BY m, r) AS rnk
      FROM rm
    ),
    pt AS (
      SELECT event_type, COUNT(*) AS n_events,
             ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(*), 6) AS point_mean
      FROM events GROUP BY 1
    )
    SELECT pt.event_type, pt.n_events, pt.point_mean,
           ROUND(lo.m, 6) AS boot_lo, ROUND(hi.m, 6) AS boot_hi
    FROM pt
    JOIN (SELECT event_type, m FROM rk WHERE rnk = 2) lo USING (event_type)
    JOIN (SELECT event_type, m FROM rk WHERE rnk = {_BOOT_R - 1}) hi
      USING (event_type)
    ORDER BY pt.event_type
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95%-ish bootstrap CI for the mean event value per type, via the
    distributed Poisson bootstrap: instead of drawing n rows with
    replacement per replicate (a global shuffle per replicate), each row
    independently contributes Poisson(1) copies to every replicate — the
    weights come from an md5 hash of (row id, replicate), so the resample
    is deterministic, engine-portable, and needs NO coordination: one
    map to explode 32 weighted copies, one hash agg, one |types|x32
    window. The standard error machinery for metrics at 100 TB (per-row
    RNG never leaves the executor; replicate count is a constant).

    CI = order statistics (2nd / 31st of 32 replicate means) — exact
    cross-engine equality, no quantile interpolation arithmetic.

    The fixture parquet is one row group -> one scan task, and the
    explode keeps the pipeline narrow, so the rows x 32 md5 draws (the
    query's whole CPU cost) ran in a SINGLE task (r13 profile: 4.6 s in
    one task, ~30 ms everywhere else). Round-robin repartition of the
    3-column projection spreads the map CPU across cores; the one extra
    exchange moves only (event_type, value, event_id) — and every
    downstream aggregate is a rounded-term decimal sum or count, so
    partitioning cannot perturb the result."""
    ev = load(spark, sf_dir, "events")
    reps = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r")
    h = (
        ev.select("event_type", "value", "event_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("event_type", "value", "event_id", reps)
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("event_id").cast("string"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(float(2**48))
    wt_col = F.when(u < float(_POIS_CDF[0]), 0)
    for k, c in enumerate(_POIS_CDF[1:], start=1):
        wt_col = wt_col.when(u < float(c), k)
    wt_col = wt_col.otherwise(6)
    wt = h.select("event_type", "value", "r", wt_col.alias("wt"))
    rm = wt.groupBy("event_type", "r").agg(
        (
            F.sum(F.col("wt") * F.round("value", 6).cast("decimal(28,6)")).cast(
                "double"
            )
            / F.sum("wt").cast("double")
        ).alias("m")
    )
    rk = rm.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("event_type").orderBy("m", "r")),
    )
    pt = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("point_mean"),
    )
    lo = rk.filter(F.col("rnk") == 2).select(
        "event_type", F.round("m", 6).alias("boot_lo")
    )
    hi = rk.filter(F.col("rnk") == _BOOT_R - 1).select(
        "event_type", F.round("m", 6).alias("boot_hi")
    )
    return (
        pt.join(lo, "event_type")
        .join(hi, "event_type")
        .select("event_type", "n_events", "point_mean", "boot_lo", "boot_hi")
        .orderBy("event_type")
    )


# --- NOT IN vs NOT EXISTS null semantics --------------------------------------


@query(
    "not_in_null_semantics",
    oracle="""
    -- the classic three-valued-logic trap: a NULL in the NOT IN subquery
    -- makes `x NOT IN (...)` UNKNOWN for every x (so zero rows survive),
    -- while NOT EXISTS anti-joins as intended — both engines implement
    -- ANSI semantics, so the counts agree
    WITH keys AS (
      SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END AS k
      FROM customer WHERE c_custkey < 1000
    )
    SELECT
      (SELECT COUNT(*) FROM orders
       WHERE o_custkey < 1000 AND o_custkey NOT IN (SELECT k FROM keys))
        AS n_not_in,
      (SELECT COUNT(*) FROM orders o
       WHERE o.o_custkey < 1000
         AND NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = o.o_custkey))
        AS n_not_exists
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS with a NULL-poisoned subquery — the SQL
    correctness edge that silently empties pipelines. Run through
    spark.sql so Catalyst's null-aware anti-join (NOT IN) and regular
    anti-join (NOT EXISTS) are both exercised; a null-aware anti-join at
    scale degrades to broadcast-nested-loop if the subquery is large —
    one more reason production code prefers NOT EXISTS."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("nin_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("nin_orders")
    return spark.sql(
        """
        WITH keys AS (
          SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END AS k
          FROM nin_customer WHERE c_custkey < 1000
        )
        SELECT
          (SELECT COUNT(*) FROM nin_orders
           WHERE o_custkey < 1000 AND o_custkey NOT IN (SELECT k FROM keys))
            AS n_not_in,
          (SELECT COUNT(*) FROM nin_orders o
           WHERE o.o_custkey < 1000
             AND NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = o.o_custkey))
            AS n_not_exists
        """
    )


# --- metric change decomposition ----------------------------------------------


@query(
    "metric_change_decomposition",
    oracle="""
    -- "why did revenue move quarter-over-quarter": per-segment deltas and
    -- contribution shares of the total change. All sums are DECIMAL until
    -- the final share division (identical numerators/denominators ->
    -- identical doubles).
    WITH rev AS (
      SELECT c.c_mktsegment AS segment,
             CASE WHEN o.o_orderdate < DATE '1997-04-01' THEN 'q1' ELSE 'q2' END
               AS q,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
               AS r
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-07-01'
      GROUP BY 1, 2
    ),
    piv AS (
      SELECT segment,
             SUM(CASE WHEN q = 'q1' THEN r ELSE 0 END) AS r1,
             SUM(CASE WHEN q = 'q2' THEN r ELSE 0 END) AS r2
      FROM rev GROUP BY segment
    ),
    tot AS (SELECT SUM(r2 - r1) AS td FROM piv)
    SELECT segment,
           CAST(r1 AS DOUBLE) AS rev_q1,
           CAST(r2 AS DOUBLE) AS rev_q2,
           CAST(r2 - r1 AS DOUBLE) AS delta,
           ROUND(CAST(r2 - r1 AS DOUBLE) / CAST(tot.td AS DOUBLE), 6)
             AS contribution
    FROM piv CROSS JOIN tot
    ORDER BY segment
    """,
)
def metric_change_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-cause decomposition of a metric movement: quarter-over-quarter
    revenue delta split by customer segment with contribution shares —
    the segment-drilldown every metrics platform runs when a topline
    moves. One fact scan (both quarters in one pass, pivoted by a
    conditional aggregate), dims broadcast, the scalar total broadcast
    back; all arithmetic DECIMAL until the final share division."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    rev_expr = _revenue()
    q = F.when(F.col("o_orderdate") < F.lit("1997-04-01").cast("date"), "q1").otherwise("q2")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_mktsegment")),
              orders.o_custkey == F.col("c_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("date"))
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), q.alias("q"))
        .agg(F.sum(rev_expr).alias("r"))
    )
    piv = rev.groupBy("segment").agg(
        F.sum(F.when(F.col("q") == "q1", F.col("r")).otherwise(F.lit(0))).alias("r1"),
        F.sum(F.when(F.col("q") == "q2", F.col("r")).otherwise(F.lit(0))).alias("r2"),
    )
    tot = piv.agg(F.sum(F.col("r2") - F.col("r1")).alias("td"))
    return (
        piv.crossJoin(F.broadcast(tot))
        .select(
            "segment",
            F.col("r1").cast("double").alias("rev_q1"),
            F.col("r2").cast("double").alias("rev_q2"),
            (F.col("r2") - F.col("r1")).cast("double").alias("delta"),
            F.round(
                (F.col("r2") - F.col("r1")).cast("double") / F.col("td").cast("double"),
                6,
            ).alias("contribution"),
        )
        .orderBy("segment")
    )


# --- training-feature generation: trailing time-range windows ----------------


@query(
    "feature_rolling_windows",
    oracle="""
    -- per-event trailing aggregates over REAL time ranges (1h / 24h), the
    -- feature-store primitive: frame bounds in exact integer microseconds
    -- so both engines cut identical windows; the windowed value sum is a
    -- rounded-term DECIMAL sum
    WITH e AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS us
      FROM events WHERE user_id < 20
    )
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS cnt_1h,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
             AS cnt_24h,
           CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6)))
                  OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS val_24h
    FROM e ORDER BY event_id
    """,
)
def feature_rolling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-range features per event (activity in the last hour /
    day, trailing value sum) — what a feature store materializes for every
    training example, computed with RANGE frames over event time so gaps
    and bursts are handled exactly (a ROWS frame would be wrong under
    irregular arrival). One shuffle on user_id serves all three frames.
    Frame bounds are integer microseconds: identical window membership in
    any engine."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    e = ev.select("event_id", "user_id", "value", F.unix_micros("ts").alias("us"))
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    w24 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w1).alias("cnt_1h"),
        F.count(F.lit(1)).over(w24).alias("cnt_24h"),
        F.sum(F.round("value", 6).cast("decimal(28,6)"))
        .over(w24)
        .cast("double")
        .alias("val_24h"),
    ).orderBy("event_id")


@query(
    "debounce_events",
    oracle="""
    -- debounce: drop an event if the SAME (user, type) fired within the
    -- previous 5 minutes — the clickstream noise filter; pure LAG + an
    -- exact microsecond comparison
    WITH lagged AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 300000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 300000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM lagged GROUP BY event_type ORDER BY event_type
    """,
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debouncing (double-fire suppression): an event is noise if the same
    (user, type) occurred <= 5 minutes earlier. LAG over the totally
    ordered per-key window + one integer-microsecond comparison; the
    stateless batch twin of streaming dropDuplicatesWithinWatermark."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    lagged = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    )
    keep = F.col("gap_us").isNull() | (F.col("gap_us") > 300_000_000)
    return (
        lagged.groupBy("event_type")
        .agg(
            F.sum(keep.cast("long")).cast("long").alias("n_kept"),
            F.sum((~keep).cast("long")).cast("long").alias("n_debounced"),
        )
        .orderBy("event_type")
    )


# --- multi-touch attribution --------------------------------------------------


@query(
    "attribution_position_weighted",
    oracle="""
    -- position-based (40/20/40) multi-touch attribution: every purchase
    -- distributes one unit of credit over the user's clicks in the prior
    -- 2 hours — first and last 0.4 each, middles split 0.2 (n=1 -> 1.0,
    -- n=2 -> 0.5/0.5). Weights are exact small ratios; the credit sums
    -- are rounded-term DECIMAL sums.
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click' AND user_id < 200
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase' AND user_id < 200
    ),
    touches AS (
      SELECT p.purchase_id, c.click_id, c.cts,
             row_number() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.cts, c.click_id) AS rn,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS n
      FROM purchases p
      JOIN clicks c ON c.user_id = p.user_id
                   AND c.cts >= p.pts - INTERVAL 2 HOUR AND c.cts < p.pts
    ),
    credit AS (
      SELECT EXTRACT(hour FROM cts) AS click_hour,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn = 1 OR rn = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS w
      FROM touches
    )
    SELECT CAST(click_hour AS BIGINT) AS click_hour,
           COUNT(*) AS n_touches,
           CAST(SUM(CAST(ROUND(w, 8) AS DECIMAL(28,8))) AS DOUBLE) AS credit
    FROM credit GROUP BY 1 ORDER BY 1
    """,
)
def attribution_position_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based multi-touch attribution (the 40/20/40 U-shape):
    each purchase's unit of credit is split across the user's clicks in
    the trailing 2-hour window, then credit is profiled by click
    hour-of-day. The range join is user-keyed (hash-partitionable; the
    binned-interval device applies verbatim at scale), ranking is one
    window per purchase, and credit conservation (sum == #attributed
    purchases) falls out of the weight definition."""
    ev = load(spark, sf_dir, "events")
    # distinct column names on each side of the self-join: reusing
    # `user_id` on both would resolve to one attribute and silently turn
    # the equi-join into a filtered cross product
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 200)).select(
        F.col("user_id").alias("c_uid"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 200)
    ).select(
        F.col("user_id").alias("p_uid"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    touches = (
        purchases.join(
            clicks,
            (F.col("c_uid") == F.col("p_uid"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 2 HOURS"))
            & (F.col("cts") < F.col("pts")),
        )
        .select("purchase_id", "click_id", "cts")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("purchase_id").orderBy("cts", "click_id")
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("purchase_id")))
    )
    w = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credit = touches.select(
        F.hour("cts").cast("long").alias("click_hour"), w.alias("w")
    )
    return (
        credit.groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.round("w", 8).cast("decimal(28,8)")).cast("double").alias("credit"),
        )
        .orderBy("click_hour")
    )


@query(
    "bitwise_agg_family",
    oracle="""
    -- bitwise aggregate family over exact integers: AND / OR / XOR folds
    -- are associative+commutative, so any partition order gives the same
    -- bits — natural partial-aggregation citizens
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS uid_and,
           CAST(bit_or(user_id) AS BIGINT) AS uid_or,
           CAST(bit_xor(user_id) AS BIGINT) AS uid_xor,
           CAST(SUM(bit_count(user_id)) AS BIGINT) AS popcount_sum
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def bitwise_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and / bit_or / bit_xor aggregates + popcount — the integer-fold
    family behind bitmap indexes and feature-flag rollups; associative by
    construction, so map-side partials are exact."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and("user_id").cast("long").alias("uid_and"),
            F.bit_or("user_id").cast("long").alias("uid_or"),
            F.bit_xor("user_id").cast("long").alias("uid_xor"),
            F.sum(F.bit_count("user_id")).cast("long").alias("popcount_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "session_entry_exit",
    oracle="""
    -- product-analytics path view: per gaps-and-islands session, the
    -- entry and exit event types, then the top (entry, exit) combos
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM ordered
    ),
    paths AS (
      SELECT user_id, session_id,
             -- x4096 keeps the composite inside int64 (epoch_us ~ 1.7e15);
             -- (user, ts) is unique in the fixtures at every sf, so the id
             -- component is pure defense against future exact-ts ties
             arg_min(event_type, epoch_us(ts) * 4096 + event_id % 4096) AS entry,
             arg_max(event_type, epoch_us(ts) * 4096 + event_id % 4096) AS exit,
             COUNT(*) AS n_events
      FROM islands GROUP BY user_id, session_id
    )
    SELECT entry, exit,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM paths
    GROUP BY entry, exit
    ORDER BY n_sessions DESC, entry, exit
    LIMIT 15
    """,
)
def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit analysis: gaps-and-islands sessionization, then
    per-session first/last event type via min_by/max_by on the exact
    (microsecond, event_id) composite — no second window pass — and the
    top landing->leaving combos. The argmax-aggregate trick replaces a
    rank window wherever only the extreme row of a group is needed."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer-microsecond gap (NOT double-cast subtraction: at epoch
    # magnitude a double has ~0.24us granularity, which can flip a
    # boundary-exact 30-min comparison vs the oracle's exact INTERVAL) —
    # same discipline as debounce_events / feature_rolling_windows
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
                > F.lit(1_800_000_000)
            ),
            1,
        ).otherwise(0),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = flagged.withColumn(
        "session_id", F.sum("new_session").over(w_run).cast("long")
    )
    ordk = F.unix_micros("ts") * F.lit(4096) + F.col("event_id") % 4096
    paths = islands.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", ordk).alias("entry"),
        F.max_by("event_type", ordk).alias("exit"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        paths.groupBy("entry", "exit")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy(F.desc("n_sessions"), "entry", "exit")
        .limit(15)
    )


@query(
    "conversion_lag_histogram",
    oracle="""
    -- distribution of signup -> first-purchase lag in whole hours; the
    -- funnel's time dimension. First purchase via a per-user MIN over the
    -- candidates; integer hour buckets are exact.
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN s ON s.user_id = e.user_id AND e.ts > s.s_ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT CAST(FLOOR((epoch_us(p.p_ts) - epoch_us(s.s_ts)) / 3600000000.0)
                AS BIGINT) AS lag_hours,
           COUNT(*) AS n_users
    FROM s JOIN p USING (user_id)
    GROUP BY 1 ORDER BY 1 LIMIT 48
    """,
)
def conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-lag distribution: whole-hour histogram of the gap
    between a user's first signup and first subsequent purchase — the
    time axis of the funnel. Two MIN aggregates (no window needed),
    integer-microsecond arithmetic, exact buckets."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lag = F.floor(
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")) / 3600000000.0
    ).cast("long")
    return (
        s.join(p, "user_id")
        .groupBy(lag.alias("lag_hours"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("lag_hours")
        .limit(48)
    )


@query(
    "mean_family",
    oracle="""
    -- arithmetic / geometric / harmonic means per type, every float fold
    -- a rounded-term DECIMAL sum (geometric via exp(mean(ln)), harmonic
    -- via n/sum(1/x)); AM >= GM >= HM by construction
    WITH t AS (SELECT event_type, value FROM events WHERE value > 0)
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_arith,
           ROUND(exp(CAST(SUM(CAST(ROUND(ln(value), 8) AS DECIMAL(28,8)))
                          AS DOUBLE) / COUNT(*)), 6) AS mean_geom,
           ROUND(COUNT(*) / CAST(SUM(CAST(ROUND(1.0 / value, 10)
                                          AS DECIMAL(28,10))) AS DOUBLE), 6)
             AS mean_harm
    FROM t GROUP BY event_type ORDER BY event_type
    """,
)
def mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / geometric / harmonic means (the Pythagorean family)
    per event type — rate-style metrics need the harmonic, multiplicative
    growth the geometric; each is one decimal-safe fold, all three share
    a single aggregation pass."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    n = F.count(F.lit(1))
    return (
        ev.groupBy("event_type")
        .agg(
            n.alias("n"),
            F.round(
                F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double") / n,
                6,
            ).alias("mean_arith"),
            F.round(
                F.exp(
                    F.sum(F.round(F.log("value"), 8).cast("decimal(28,8)")).cast(
                        "double"
                    )
                    / n
                ),
                6,
            ).alias("mean_geom"),
            F.round(
                n
                / F.sum(F.round(F.lit(1.0) / F.col("value"), 10).cast("decimal(28,10)")).cast(
                    "double"
                ),
                6,
            ).alias("mean_harm"),
        )
        .orderBy("event_type")
    )


@query(
    "rfm_segments",
    oracle="""
    -- RFM segmentation: quintile-bucket customers on Recency (days since
    -- last order), Frequency (order count), Monetary (decimal total),
    -- label = concatenated bucket digits. ntile needs a total order ->
    -- every ORDER BY carries the custkey tie-break.
    WITH rfm AS (
      SELECT o_custkey AS cust,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT cust,
             NTILE(5) OVER (ORDER BY last_order DESC, cust) AS r,
             NTILE(5) OVER (ORDER BY freq DESC, cust) AS f,
             NTILE(5) OVER (ORDER BY monetary DESC, cust) AS m
      FROM rfm
    )
    SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
             AS segment,
           COUNT(*) AS n_customers
    FROM scored
    GROUP BY 1
    HAVING COUNT(*) >= 5
    ORDER BY n_customers DESC, segment
    LIMIT 20
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    customer-value grid: one aggregate pass builds the per-customer RFM
    vector, three ntile windows bucket it (each with a total order), and
    the segment label is the digit triple. Top segments by population."""
    orders = load(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("monetary"),
    )
    scored = rfm.select(
        "cust",
        F.ntile(5).over(Window.orderBy(F.desc("last_order"), "cust")).alias("r"),
        F.ntile(5).over(Window.orderBy(F.desc("freq"), "cust")).alias("f"),
        F.ntile(5).over(Window.orderBy(F.desc("monetary"), "cust")).alias("m"),
    )
    seg = F.concat(
        F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
    )
    return (
        scored.groupBy(seg.alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") >= 5)
        .orderBy(F.desc("n_customers"), "segment")
        .limit(20)
    )


@query(
    "funnel_three_step",
    oracle="""
    -- strict-order three-step funnel: signup -> first LATER click ->
    -- first click-later purchase, each within 24h of the prior step;
    -- per-step user counts + conversion rates (exact-int ratios)
    WITH s AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t1
        AND e.ts <= s.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase,
           ROUND((SELECT COUNT(*) FROM c) * 1.0
                 / (SELECT COUNT(*) FROM s), 6) AS rate_click,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / NULLIF((SELECT COUNT(*) FROM c), 0), 6) AS rate_purchase
    """,
)
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order three-step funnel (signup → click → purchase, each
    step within 24h of the previous): successive MIN-aggregate semi-join
    stages — no window over the whole stream, each stage shrinks the user
    set, all joins hash-partition on user. Step counts and conversion
    rates as exact-int ratios."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_s, n_c, n_p = s.count(), c.count(), p.count()
    # rates rounded by Spark's ROUND (half-away, matching the oracle) —
    # python round() is banker's and has bitten this repo before
    return spark.createDataFrame(
        [(n_s, n_c, n_p)], "n_signup long, n_click long, n_purchase long"
    ).select(
        "n_signup",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click") * 1.0 / F.col("n_signup"), 6).alias("rate_click"),
        F.round(
            F.col("n_purchase") * 1.0 / F.nullif(F.col("n_click"), F.lit(0)), 6
        ).alias("rate_purchase"),
    )


@query(
    "weighted_median_family",
    oracle="""
    -- weighted median: first value whose running weight reaches half the
    -- group total. All-integer weights and DECIMAL values -> exact; the
    -- ordering carries a full tie-break.
    WITH t AS (
      SELECT l_returnflag AS flag,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS v,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT flag, v, w,
             CAST(SUM(w) OVER (PARTITION BY flag ORDER BY v, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
      FROM t
    )
    SELECT flag,
           CAST(MIN(v) AS DOUBLE) AS weighted_median,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY flag ORDER BY flag
    """,
)
def weighted_median_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted price per return flag): running
    weight over the value-ordered window, first row to reach half the
    total — the robust central price where every unit shipped votes, not
    every line item. Exact integer weights + DECIMAL values; one shuffle
    on the group key serves the running sum, the group total, and the
    final aggregate."""
    li = load(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    w_run = (
        Window.partitionBy("flag")
        .orderBy("v", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("flag")
    cum = t.select(
        "flag",
        "v",
        F.sum("w").over(w_run).cast("long").alias("cw"),
        F.sum("w").over(w_all).cast("long").alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("v").cast("double").alias("weighted_median"),
            F.max("tw").cast("long").alias("total_weight"),
        )
        .orderBy("flag")
    )


@query(
    "benford_digit_audit",
    oracle="""
    -- Benford's-law first-digit audit: observed leading-digit shares of
    -- order totals vs log10(1 + 1/d) expectation — the classic
    -- fabricated-numbers screen. Counts exact; expected shares are one
    -- libm log10 on exact constants; deviation per digit rounded.
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    n AS (SELECT COUNT(*) AS n FROM d)
    SELECT digit,
           COUNT(*) AS observed,
           ROUND(COUNT(*) * 1.0 / MAX(n.n), 6) AS obs_share,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           ROUND(COUNT(*) * 1.0 / MAX(n.n) - log10(1.0 + 1.0 / digit), 6)
             AS deviation
    FROM d CROSS JOIN n
    GROUP BY digit ORDER BY digit
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: leading-digit shares vs
    the log10(1 + 1/d) law — the forensic-accounting screen for
    fabricated or truncated numeric columns, one scan + a 9-row result.
    (TPC-H prices are uniform-ish, so the deviations themselves are the
    interesting output.)"""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"), 1, 1
    ).cast("long")
    d = orders.select(digit.alias("digit"))
    n = d.count()
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
        .select(
            "digit",
            "observed",
            F.round(F.col("observed") * 1.0 / F.lit(n), 6).alias("obs_share"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_share"),
            F.round(
                F.col("observed") * 1.0 / F.lit(n)
                - F.log10(1.0 + 1.0 / F.col("digit")),
                6,
            ).alias("deviation"),
        )
        .orderBy("digit")
    )


@query(
    "rollup_percent_of_parent",
    oracle="""
    -- hierarchical report with percent-of-parent at each level: nation
    -- revenue as a share of its region, region as share of total. All
    -- shares are ratios of identical DECIMAL sums.
    WITH nr AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
               AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    rr AS (SELECT region, SUM(rev) AS rrev FROM nr GROUP BY region),
    tot AS (SELECT SUM(rev) AS trev FROM nr)
    SELECT nr.region, nr.nation,
           CAST(nr.rev AS DOUBLE) AS revenue,
           ROUND(CAST(nr.rev AS DOUBLE) / CAST(rr.rrev AS DOUBLE), 6)
             AS pct_of_region,
           ROUND(CAST(rr.rrev AS DOUBLE) / CAST(tot.trev AS DOUBLE), 6)
             AS region_pct_of_total
    FROM nr JOIN rr USING (region) CROSS JOIN tot
    ORDER BY region, nation
    """,
)
def rollup_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchical report (nation share of region,
    region share of total): the drilldown table every OLAP frontend
    renders. One fact aggregation feeds all three levels (re-aggregation
    of the nation cells, not a rescan); shares divide identical DECIMAL
    sums so the doubles agree bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit("1.00").cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    nr = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("rev"))
        .persist()
    )
    rr = nr.groupBy("region").agg(F.sum("rev").alias("rrev"))
    tot = nr.agg(F.sum("rev").alias("trev"))
    return (
        nr.join(rr, "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.col("rev").cast("double").alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("rrev").cast("double"), 6
            ).alias("pct_of_region"),
            F.round(
                F.col("rrev").cast("double") / F.col("trev").cast("double"), 6
            ).alias("region_pct_of_total"),
        )
        .orderBy("region", "nation")
    )


@query(
    "running_distinct_event_types",
    oracle="""
    -- running DISTINCT count over an ordered window without windowed
    -- COUNT(DISTINCT) (neither engine supports it): flag each row that is
    -- the FIRST occurrence of its (user, type), then cumulate the flags —
    -- the dedup-in-window rewrite
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type ORDER BY ts, event_id
                  ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events WHERE user_id < 10
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
    FROM flagged ORDER BY user_id, event_id
    """,
)
def running_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count per user (how many event types has this
    user touched so far): windowed COUNT(DISTINCT) doesn't exist in any
    engine, so it's rewritten as first-occurrence flags + a running sum —
    two windows sharing one user_id shuffle. The exact twin of what a
    streaming HLL-per-key approximates."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.row_number().over(w_first) == 1).cast("int").alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    ).orderBy("user_id", "event_id")


@query(
    "pareto_concentration_gini",
    oracle="""
    -- revenue concentration: share of customers covering 80% of revenue
    -- plus the Gini coefficient, from one sorted cumulative pass. Gini =
    -- (2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n) over ascending x;
    -- all sums are DECIMAL with exact integer ranks.
    WITH cr AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS rnk,
             CAST(SUM(CAST(rev AS DECIMAL(28,2)))
                    OVER (ORDER BY rev DESC, o_custkey DESC
                          ROWS UNBOUNDED PRECEDING) AS DECIMAL(28,2))
               AS cum_desc
      FROM cr
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS t,
             CAST(SUM(CAST(rnk AS DECIMAL(28,2)) * CAST(rev AS DECIMAL(28,2)))
                  AS DECIMAL(38,2)) AS iwx
      FROM ranked
    ),
    p80 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k FROM ranked, tot
      WHERE cum_desc < CAST(0.8 AS DECIMAL(3,2)) * tot.t
    )
    SELECT tot.n AS n_customers,
           ROUND((p80.k + 1) * 1.0 / tot.n, 6) AS top_share_for_80pct,
           ROUND(2.0 * CAST(tot.iwx AS DOUBLE) / (tot.n * CAST(tot.t AS DOUBLE))
                 - (tot.n + 1.0) / tot.n, 6) AS gini
    FROM tot CROSS JOIN p80
    """,
)
def pareto_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the 80/20 check (what fraction of customers
    produce 80% of revenue) and the Gini coefficient — distribution-shape
    audits that decide whether per-key skew handling is even needed. One
    per-customer aggregate, one sorted window pass, all DECIMAL with
    exact ranks; the 0.8 threshold is a DECIMAL comparison so the
    crossing index is engine-exact."""
    orders = load(spark, sf_dir, "orders")
    cr = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev")
    )
    w_rank = Window.orderBy("rev", "o_custkey")
    w_desc = Window.orderBy(F.desc("rev"), F.desc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = cr.select(
        F.col("rev"),
        F.row_number().over(w_rank).alias("rnk"),
        F.sum(F.col("rev").cast("decimal(28,2)"))
        .over(w_desc)
        .cast("decimal(28,2)")
        .alias("cum_desc"),
    ).persist()
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rev").cast("decimal(28,2)")).cast("decimal(28,2)").alias("t"),
        F.sum(
            F.col("rnk").cast("decimal(28,2)") * F.col("rev").cast("decimal(28,2)")
        )
        .cast("decimal(38,2)")
        .alias("iwx"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    k80 = j.filter(
        F.col("cum_desc") < F.lit("0.8").cast("decimal(3,2)") * F.col("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("k"))
    return (
        tot.crossJoin(F.broadcast(k80))
        .select(
            F.col("n").alias("n_customers"),
            F.round((F.col("k") + 1) * 1.0 / F.col("n"), 6).alias(
                "top_share_for_80pct"
            ),
            F.round(
                2.0 * F.col("iwx").cast("double") / (F.col("n") * F.col("t").cast("double"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
        )
    )


@query(
    "exp_smoothing_forecast",
    oracle="""
    -- single exponential smoothing (alpha = 0.3) of the daily error-count
    -- series, evaluated in closed form: the smoothed level is a weighted
    -- sum alpha*(1-alpha)^k over the reversed series (+ the (1-alpha)^T
    -- seed term), so no recursion is needed. POWER on identical doubles,
    -- per-term ROUND -> DECIMAL sum.
    WITH bounds AS (
      SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
      FROM events
    ),
    slots AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    series AS (
      SELECT s.day, COALESCE(a.n, 0) AS x,
             row_number() OVER (ORDER BY s.day) AS t
      FROM slots s LEFT JOIN (
        SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
        FROM events WHERE event_type = 'error' GROUP BY 1
      ) a USING (day)
    ),
    tmax AS (SELECT MAX(t) AS tm FROM series),
    terms AS (
      SELECT CASE WHEN s.t = 1
                  THEN ROUND(POWER(0.7, tm - 1) * s.x, 10)
                  ELSE ROUND(0.3 * POWER(0.7, tm - s.t) * s.x, 10) END AS w
      FROM series s CROSS JOIN tmax
    )
    SELECT (SELECT CAST(tm AS BIGINT) FROM tmax) AS n_days,
           ROUND(CAST(SUM(CAST(w AS DECIMAL(28,10))) AS DOUBLE), 6)
             AS forecast_next_day
    FROM terms
    """,
)
def exp_smoothing_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single exponential smoothing over the zero-filled daily error
    series, as a CLOSED FORM instead of a recursion: the level after T
    days is alpha * sum((1-alpha)^age * x) plus the decayed seed — one
    weighted aggregate, no sequential scan, trivially distributable (the
    same de-recursion trick as the decayed-count operator). The smoothed
    level IS the one-step forecast."""
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    ).collect()[0]
    slots = spark.sql(
        f"SELECT explode(sequence(timestamp'{b['lo']}', timestamp'{b['hi']}', "
        "INTERVAL 1 DAY)) AS day"
    )
    actual = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = (
        slots.join(actual, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("x"))
        .withColumn("t", F.row_number().over(Window.orderBy("day")))
        .persist()
    )
    tm = series.agg(F.max("t")).collect()[0][0]
    w = F.when(
        F.col("t") == 1, F.round(F.pow(F.lit(0.7), F.lit(tm - 1)) * F.col("x"), 10)
    ).otherwise(
        F.round(F.lit(0.3) * F.pow(F.lit(0.7), F.lit(tm) - F.col("t")) * F.col("x"), 10)
    )
    return series.select(w.alias("w")).agg(
        F.lit(tm).cast("long").alias("n_days"),
        F.round(
            F.sum(F.col("w").cast("decimal(28,10)")).cast("double"), 6
        ).alias("forecast_next_day"),
    )


@query(
    "kaplan_meier_survival",
    oracle="""
    -- Kaplan-Meier time-to-first-purchase with right-censoring (users who
    -- never purchase are censored at their last observed event):
    -- S(t) = prod over death times <= t of (1 - d_i / n_i), computed as
    -- exp of a cumulative DECIMAL sum of ROUNDed ln terms — the
    -- distributed product-over-ordered-groups trick.
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    death AS (
      SELECT e.user_id, MIN(e.ts) AS td
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t0
      GROUP BY e.user_id
    ),
    last_seen AS (
      SELECT e.user_id, MAX(e.ts) AS tl
      FROM events e JOIN s USING (user_id)
      GROUP BY e.user_id
    ),
    obs AS (
      SELECT s.user_id,
             CASE WHEN d.td IS NOT NULL THEN 1 ELSE 0 END AS died,
             CAST(FLOOR((epoch_us(COALESCE(d.td, l.tl)) - epoch_us(s.t0))
                        / 3600000000.0) AS BIGINT) AS dur_h
      FROM s
      LEFT JOIN death d USING (user_id)
      JOIN last_seen l USING (user_id)
    ),
    dt AS (
      SELECT dur_h AS t, COUNT(*) AS d
      FROM obs WHERE died = 1 GROUP BY dur_h
    ),
    risk AS (
      SELECT dt.t, dt.d,
             (SELECT COUNT(*) FROM obs WHERE obs.dur_h >= dt.t) AS n
      FROM dt
    ),
    curve AS (
      -- d = n (everyone remaining converts) sends S to exactly 0: that
      -- step contributes a zero-flag instead of ln(0)
      SELECT t, CAST(n AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_deaths,
             CASE WHEN MAX(CASE WHEN d >= n THEN 1 ELSE 0 END)
                         OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                  THEN 0.0
                  ELSE ROUND(exp(CAST(SUM(CAST(ROUND(ln(1.0 - d * 1.0 / n), 10)
                                          AS DECIMAL(28,10)))
                                   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                                 AS DOUBLE)), 6) END AS survival
      FROM risk WHERE d < n
      UNION ALL
      SELECT t, CAST(n AS BIGINT), CAST(d AS BIGINT), 0.0
      FROM risk WHERE d >= n
    )
    SELECT t AS hours, n_risk, n_deaths, survival
    FROM curve ORDER BY hours LIMIT 24
    """,
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimator for time-to-first-purchase, with users who
    never convert right-censored at their last observed event — the
    statistically correct conversion curve (a naive rate systematically
    understates late conversion). The ordered product Π(1 - d/n) runs as
    exp of a cumulative decimal sum of ln terms, so the curve is both
    distributable and engine-exact; at-risk counts come from one
    duration table scanned per death time (|death times| is tiny after
    hour-bucketing)."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    death = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("td"))
    )
    last_seen = ev.join(s.select("user_id"), "user_id").groupBy("user_id").agg(
        F.max("ts").alias("tl")
    )
    obs = (
        s.join(death, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            F.when(F.col("td").isNotNull(), 1).otherwise(0).alias("died"),
            F.floor(
                (
                    F.unix_micros(F.coalesce("td", "tl")) - F.unix_micros("t0")
                )
                / 3600000000.0
            )
            .cast("long")
            .alias("dur_h"),
        )
        .persist()
    )
    dt = (
        obs.filter(F.col("died") == 1)
        .groupBy(F.col("dur_h").alias("t"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    at_risk = obs.select(F.col("dur_h"))
    risk = (
        dt.join(at_risk, at_risk.dur_h >= dt.t)
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    alive = risk.filter(F.col("d") < F.col("n")).select(
        "t",
        F.col("n").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_deaths"),
        F.round(
            F.exp(
                F.sum(
                    F.round(F.log(1.0 - F.col("d") * 1.0 / F.col("n")), 10).cast(
                        "decimal(28,10)"
                    )
                )
                .over(w)
                .cast("double")
            ),
            6,
        ).alias("survival"),
    )
    # d = n steps pin S to exactly 0 (ln(0) is the signal, not an error)
    dead = risk.filter(F.col("d") >= F.col("n")).select(
        "t",
        F.col("n").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_deaths"),
        F.lit(0.0).alias("survival"),
    )
    curve = alive.unionAll(dead)
    return curve.select(
        F.col("t").alias("hours"), "n_risk", "n_deaths", "survival"
    ).orderBy("hours").limit(24)


@query(
    "diff_in_diff_estimate",
    oracle="""
    -- difference-in-differences: treatment = odd user_id, post = second
    -- half of the event-time range (fixed cutoff from the data's own
    -- midpoint, floored to whole days so the boundary is exact). The 2x2
    -- cell means come from one decimal-moment pass; DiD and its pooled
    -- standard error are elementwise arithmetic on identical doubles.
    WITH b AS (
      SELECT date_trunc('day', MIN(ts)) + CAST(FLOOR(
               date_diff('day', date_trunc('day', MIN(ts)),
                         date_trunc('day', MAX(ts))) / 2) AS BIGINT)
               * INTERVAL 1 DAY AS cut
      FROM events
    ),
    cells AS (
      SELECT (user_id % 2) AS treated,
             CASE WHEN ts >= b.cut THEN 1 ELSE 0 END AS post,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE)
               AS s2
      FROM events CROSS JOIN b
      GROUP BY 1, 2
    ),
    st AS (
      SELECT treated, post, n, s1 / n AS m,
             (s2 - s1 * s1 / n) / (n - 1) / n AS vm
      FROM cells
    )
    SELECT ROUND((t1.m - t0.m) - (c1.m - c0.m), 6) AS did,
           ROUND(sqrt(t1.vm + t0.vm + c1.vm + c0.vm), 6) AS se,
           CAST(t1.n + t0.n + c1.n + c0.n AS BIGINT) AS n_events
    FROM st t1, st t0, st c1, st c0
    WHERE t1.treated = 1 AND t1.post = 1
      AND t0.treated = 1 AND t0.post = 0
      AND c1.treated = 0 AND c1.post = 1
      AND c0.treated = 0 AND c0.post = 0
    """,
)
def diff_in_diff_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the workhorse quasi-experimental
    estimator — (treated post - treated pre) minus (control post -
    control pre), with a pooled standard error from the four cell
    variances. One moment pass builds the 2x2 design; everything after
    is arithmetic on four rows. Assignment and cutoff are deterministic
    (user parity, the series' own midpoint day)."""
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    ).collect()[0]
    half_days = int(((b["hi"] - b["lo"]).days) // 2)
    cut = b["lo"] + __import__("datetime").timedelta(days=half_days)
    cells = (
        ev.groupBy(
            (F.col("user_id") % 2).alias("treated"),
            (F.col("ts") >= F.lit(cut)).cast("int").alias("post"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double").alias("s1"),
            F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("s2"),
        )
    )
    st = cells.select(
        "treated",
        "post",
        "n",
        (F.col("s1") / F.col("n")).alias("m"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
            / F.col("n")
        ).alias("vm"),
    ).collect()
    cell = {(r["treated"], r["post"]): r for r in st}
    t1, t0, c1, c0 = cell[(1, 1)], cell[(1, 0)], cell[(0, 1)], cell[(0, 0)]
    return spark.createDataFrame(
        [(t1["m"] - t0["m"] - (c1["m"] - c0["m"]),
          (t1["vm"] + t0["vm"] + c1["vm"] + c0["vm"]),
          t1["n"] + t0["n"] + c1["n"] + c0["n"])],
        "did_raw double, var_sum double, n_events long",
    ).select(
        F.round("did_raw", 6).alias("did"),
        F.round(F.sqrt("var_sum"), 6).alias("se"),
        "n_events",
    )


@query(
    "cuped_adjusted_means",
    oracle="""
    -- CUPED variance reduction: per-user post-period metric Y adjusted by
    -- the pre-period covariate X, theta = cov(X,Y)/var(X) from pooled
    -- decimal moments; report per-arm adjusted means and the variance
    -- reduction. Same midpoint cutoff and parity assignment as the DiD.
    WITH b AS (
      SELECT date_trunc('day', MIN(ts)) + CAST(FLOOR(
               date_diff('day', date_trunc('day', MIN(ts)),
                         date_trunc('day', MAX(ts))) / 2) AS BIGINT)
               * INTERVAL 1 DAY AS cut
      FROM events
    ),
    per_user AS (
      SELECT user_id, (user_id % 2) AS treated,
             ROUND(CAST(SUM(CASE WHEN ts < b.cut
                            THEN CAST(ROUND(value, 6) AS DECIMAL(28,6)) END)
                        AS DOUBLE)
                   / NULLIF(COUNT(CASE WHEN ts < b.cut THEN 1 END), 0), 6) AS x,
             ROUND(CAST(SUM(CASE WHEN ts >= b.cut
                            THEN CAST(ROUND(value, 6) AS DECIMAL(28,6)) END)
                        AS DOUBLE)
                   / NULLIF(COUNT(CASE WHEN ts >= b.cut THEN 1 END), 0), 6) AS y
      FROM events CROSS JOIN b
      GROUP BY user_id
    ),
    ok AS (SELECT * FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS syy
      FROM ok
    ),
    th AS (
      SELECT n, sx, sy, syy,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
             (n * syy - sy * sy) / (n * sxx - sx * sx) AS _unused
      FROM m
    ),
    adj AS (
      SELECT o.treated,
             ROUND(o.y - th.theta * (o.x - th.sx / th.n), 6) AS y_adj,
             o.y
      FROM ok o CROSS JOIN th
    )
    SELECT treated,
           COUNT(*) AS n_users,
           ROUND(CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
             AS mean_raw,
           ROUND(CAST(SUM(CAST(y_adj AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
             AS mean_cuped
    FROM adj GROUP BY treated ORDER BY treated
    """,
)
def cuped_adjusted_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data): each
    user's post-period metric is adjusted by their own pre-period
    covariate, theta = cov(X,Y)/var(X) — the industry-standard variance
    reduction that makes experiments read out faster at the same traffic.
    One per-user aggregate, one pooled moment pass, one broadcast theta;
    per-term rounding keeps every stage engine-exact."""
    import datetime

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    ).collect()[0]
    cut = b["lo"] + datetime.timedelta(days=int((b["hi"] - b["lo"]).days // 2))
    pre = F.when(F.col("ts") < F.lit(cut), F.round("value", 6).cast("decimal(28,6)"))
    post = F.when(F.col("ts") >= F.lit(cut), F.round("value", 6).cast("decimal(28,6)"))
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("treated"),
        F.round(
            F.sum(pre).cast("double")
            / F.nullif(F.count(pre), F.lit(0)),
            6,
        ).alias("x"),
        F.round(
            F.sum(post).cast("double")
            / F.nullif(F.count(post), F.lit(0)),
            6,
        ).alias("y"),
    )
    ok = per_user.filter(F.col("x").isNotNull() & F.col("y").isNotNull()).persist()
    m = ok.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
    ).collect()[0]
    n, sx, sy, sxy, sxx = (m["n"], m["sx"], m["sy"], m["sxy"], m["sxx"])
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    adj = ok.select(
        "treated",
        "y",
        F.round(F.col("y") - F.lit(theta) * (F.col("x") - F.lit(xbar)), 6).alias(
            "y_adj"
        ),
    )
    return (
        adj.groupBy("treated")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum(F.col("y").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_raw"),
            F.round(
                F.sum(F.col("y_adj").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_cuped"),
        )
        .orderBy("treated")
    )


@query(
    "growth_accounting_weekly",
    oracle="""
    -- canonical growth accounting: per week, users split into new
    -- (first-ever week), retained (also active previous week),
    -- resurrected (active, not last week, not new); churned = last
    -- week's actives missing this week. All exact set logic on
    -- (user, week) actives.
    WITH wk AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ),
    first_wk AS (
      SELECT user_id, MIN(week) AS fw FROM wk GROUP BY user_id
    ),
    weeks AS (SELECT DISTINCT week FROM wk),
    states AS (
      SELECT w.week,
             CAST(SUM(CASE WHEN f.fw = w.week THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(SUM(CASE WHEN f.fw < w.week AND p.user_id IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN f.fw < w.week AND p.user_id IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM wk w
      JOIN first_wk f USING (user_id)
      LEFT JOIN wk p ON p.user_id = w.user_id
                    AND p.week = w.week - INTERVAL 7 DAY
      GROUP BY w.week
    ),
    churn AS (
      SELECT p.week + INTERVAL 7 DAY AS week,
             CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM wk p
      LEFT JOIN wk c ON c.user_id = p.user_id
                    AND c.week = p.week + INTERVAL 7 DAY
      WHERE c.user_id IS NULL
      GROUP BY p.week
    )
    SELECT strftime(s.week, '%Y-%m-%d') AS week,
           s.n_new, s.n_retained, s.n_resurrected,
           COALESCE(c.n_churned, 0) AS n_churned
    FROM states s
    LEFT JOIN churn c ON c.week = s.week
    JOIN weeks ww ON ww.week = s.week
    ORDER BY week
    """,
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the canonical new / retained /
    resurrected / churned decomposition): exact set logic over distinct
    (user, week) actives — one dedup aggregate, a self-join shifted by a
    week, and a first-week table. Week arithmetic is pure timestamp
    math, so every engine buckets identically."""
    ev = load(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct().persist()
    first_wk = wk.groupBy("user_id").agg(F.min("week").alias("fw"))
    prev = wk.select(
        F.col("user_id").alias("p_user"),
        (F.col("week") + F.expr("INTERVAL 7 DAYS")).alias("p_next"),
    )
    states = (
        wk.join(first_wk, "user_id")
        .join(
            prev,
            (F.col("user_id") == F.col("p_user")) & (F.col("week") == F.col("p_next")),
            "left",
        )
        .groupBy("week")
        .agg(
            F.sum((F.col("fw") == F.col("week")).cast("long"))
            .cast("long")
            .alias("n_new"),
            F.sum(
                ((F.col("fw") < F.col("week")) & F.col("p_user").isNotNull()).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("n_retained"),
            F.sum(
                ((F.col("fw") < F.col("week")) & F.col("p_user").isNull()).cast("long")
            )
            .cast("long")
            .alias("n_resurrected"),
        )
    )
    nxt = wk.select(
        F.col("user_id").alias("c_user"), F.col("week").alias("c_week")
    )
    churn = (
        wk.join(
            nxt,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_week") == F.col("week") + F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .filter(F.col("c_user").isNull())
        .groupBy((F.col("week") + F.expr("INTERVAL 7 DAYS")).alias("week"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        states.join(churn, "week", "left")
        .join(wk.select("week").distinct(), "week")
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("week")
    )


@query(
    "weekday_seasonality_profile",
    oracle="""
    -- day-of-week seasonality indices: weekday mean volume over the
    -- all-days mean (index 1.0 = no seasonality); exact counts, one
    -- division at the end. ISO weekday numbering both engines.
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_days FROM daily
    )
    SELECT CAST(isodow(day) AS BIGINT) AS weekday,
           CAST(SUM(n) AS BIGINT) AS n_events,
           COUNT(*) AS n_days,
           ROUND((SUM(n) * 1.0 / COUNT(*))
                 / (tot.total * 1.0 / tot.n_days), 6) AS seasonality_index
    FROM daily CROSS JOIN tot
    GROUP BY isodow(day), tot.total, tot.n_days
    ORDER BY weekday
    """,
)
def weekday_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality indices (weekday mean volume / overall
    daily mean): the decomposition input every anomaly detector and
    forecast needs before it can tell a quiet Sunday from an incident.
    Exact integer counts; ISO weekday numbering matches across engines."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    ).persist()
    tot = daily.agg(
        F.sum("n").cast("long").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy(F.dayofweek("day").alias("dow_sun1"), "total", "n_days")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).alias("n_wdays"),
        )
        .select(
            # Spark dayofweek: 1=Sunday; ISO: 1=Monday..7=Sunday
            F.when(F.col("dow_sun1") == 1, 7)
            .otherwise(F.col("dow_sun1") - 1)
            .cast("long")
            .alias("weekday"),
            "n_events",
            F.col("n_wdays").alias("n_days"),
            F.round(
                (F.col("n_events") * 1.0 / F.col("n_wdays"))
                / (F.col("total") * 1.0 / F.col("n_days")),
                6,
            ).alias("seasonality_index"),
        )
        .orderBy("weekday")
    )


@query(
    "autocorr_daily_events",
    oracle="""
    -- lag-1 autocorrelation of the daily event-count series: the
    -- burstiness/momentum statistic from one LAG window + decimal
    -- moments (Pearson r on (x_t, x_{t-1}) pairs).
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(n AS DOUBLE) AS y,
             CAST(LAG(n) OVER (ORDER BY day) AS DOUBLE) AS x
      FROM daily
    ),
    ok AS (SELECT x, y FROM pairs WHERE x IS NOT NULL),
    m AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS syy
      FROM ok
    )
    SELECT k AS n_pairs,
           ROUND((k * sxy - sx * sy)
                 / sqrt((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS lag1_r
    FROM m
    """,
)
def autocorr_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily volume — does yesterday predict
    today (momentum) or not (noise)? The statistic that decides whether a
    forecast needs an AR term at all. One daily aggregate, one LAG, one
    decimal-moment Pearson r."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    pairs = daily.select(
        F.col("n").cast("double").alias("y"),
        F.lag("n").over(w).cast("double").alias("x"),
    ).filter(F.col("x").isNotNull())
    m = pairs.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x").cast("decimal(28,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("syy"),
    )
    r = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("k") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(F.col("k").alias("n_pairs"), F.round(r, 6).alias("lag1_r"))


@query(
    "anomaly_seasonal_days",
    oracle="""
    -- seasonality-adjusted daily anomaly flags: each day's volume over
    -- its weekday's mean, flagged when the ratio leaves [0.75, 1.25] —
    -- the adjustment that keeps every Sunday from paging on a weekday
    -- threshold. Exact counts; one ratio at the end.
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    wd AS (
      SELECT isodow(day) AS dow, SUM(n) * 1.0 / COUNT(*) AS wd_mean
      FROM daily GROUP BY 1
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.n AS BIGINT) AS n_events,
           ROUND(d.n / wd.wd_mean, 6) AS vs_weekday_mean,
           (d.n / wd.wd_mean < 0.75 OR d.n / wd.wd_mean > 1.25) AS anomalous
    FROM daily d JOIN wd ON wd.dow = isodow(d.day)
    ORDER BY day
    """,
)
def anomaly_seasonal_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly detection on daily volume: each day
    compared to ITS OWN weekday's mean (the weekday_seasonality_profile
    applied as a detector), flagged outside ±25%. Deterministic, exact,
    and the shape that generalizes to per-key baselines at scale (the
    weekday table just gains a key column)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    ).persist()
    iso = F.when(F.dayofweek("day") == 1, 7).otherwise(F.dayofweek("day") - 1)
    wd = daily.groupBy(iso.alias("dow")).agg(
        (F.sum("n") * 1.0 / F.count(F.lit(1))).alias("wd_mean")
    )
    j = daily.join(F.broadcast(wd), iso == F.col("dow"))
    ratio = F.col("n") / F.col("wd_mean")
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.round(ratio, 6).alias("vs_weekday_mean"),
        ((ratio < 0.75) | (ratio > 1.25)).alias("anomalous"),
    ).orderBy("day")


@query(
    "ltv_cohort_curve",
    oracle="""
    -- cohort LTV curve: customers cohorted by first-order month,
    -- cumulative revenue per customer by months-since-first-order.
    -- DECIMAL revenue, exact month arithmetic, one window per cohort.
    WITH first_order AS (
      SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    cohort_sizes AS (
      SELECT cohort, COUNT(*) AS n_customers FROM first_order GROUP BY cohort
    ),
    rev AS (
      SELECT f.cohort,
             date_diff('month', f.cohort, date_trunc('month', o.o_orderdate))
               AS age,
             SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS r
      FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT strftime(rev.cohort, '%Y-%m') AS cohort,
           CAST(age AS BIGINT) AS age_months,
           CAST(cs.n_customers AS BIGINT) AS n_customers,
           -- exact integer division at 1e-4 dollars: double ROUND of the
           -- quotient sits exactly on .00005 boundaries for some cohorts
           -- and the two engines' last bits flip it differently
           CAST((CAST(SUM(CAST(r AS DECIMAL(28,2)))
                        OVER (PARTITION BY rev.cohort ORDER BY age
                              ROWS UNBOUNDED PRECEDING) * 10000 AS BIGINT)
                 // cs.n_customers) / 10000.0 AS DOUBLE)
             AS cum_ltv_per_customer
    FROM rev JOIN cohort_sizes cs ON cs.cohort = rev.cohort
    WHERE rev.cohort < DATE '1996-01-01'
    ORDER BY cohort, age_months
    """,
)
def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative revenue per customer by
    months since first order, per acquisition cohort (restricted to the
    earliest — 1995 — cohorts so the curve is long; fixture orders span
    1995-2001, so a pre-1995 cutoff would select zero rows and the oracle
    check would pass vacuously, which is exactly what r3 shipped). The
    payback-period table every growth model is built on: one first-order
    aggregate, one month-diff aggregate, one cumulative window per cohort
    — all DECIMAL."""
    orders = load(spark, sf_dir, "orders")
    first_order = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    cohort_sizes = first_order.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rev = (
        orders.join(first_order, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.col("cohort")
            )
            .cast("long")
            .alias("age"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("r"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-customer LTV floored at 1e-4 dollars via exact int64 division
    # (cum DECIMAL(28,2) * 10000 is an exact integer; DIV is exact in both
    # engines; double ROUND of the raw quotient flips on .00005 boundaries)
    micro = (F.sum(F.col("r").cast("decimal(28,2)")).over(w) * 10000).cast("long")
    return (
        rev.join(F.broadcast(cohort_sizes), "cohort")
        .filter(F.col("cohort") < F.lit("1996-01-01").cast("timestamp"))
        .withColumn("micro", micro)
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort"),
            F.col("age").alias("age_months"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.expr("CAST(micro DIV n_customers AS DOUBLE) / 10000.0").alias(
                "cum_ltv_per_customer"
            ),
        )
        .orderBy("cohort", "age_months")
    )


@query(
    "abc_inventory_classification",
    oracle="""
    -- ABC classification: parts ranked by revenue, class A = first 80% of
    -- cumulative revenue, B to 95%, C the tail. DECIMAL cumulative over a
    -- total order; class sizes + revenue shares audited.
    WITH pr AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS t FROM pr),
    ranked AS (
      SELECT rev,
             CAST(SUM(CAST(rev AS DECIMAL(28,2)))
                    OVER (ORDER BY rev DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS DECIMAL(28,2)) AS cum
      FROM pr
    ),
    classed AS (
      SELECT rev,
             CASE WHEN cum <= CAST(0.80 AS DECIMAL(3,2)) * tot.t THEN 'A'
                  WHEN cum <= CAST(0.95 AS DECIMAL(3,2)) * tot.t THEN 'B'
                  ELSE 'C' END AS cls
      FROM ranked CROSS JOIN tot
    )
    SELECT cls,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DOUBLE)
                 / CAST(MAX(tot2.t) AS DOUBLE), 6) AS rev_share
    FROM classed CROSS JOIN tot tot2
    GROUP BY cls ORDER BY cls
    """,
)
def abc_inventory_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification (the inventory-management Pareto): parts ranked
    by revenue, class A carries the first 80% of cumulative revenue, B to
    95%, C the long tail. DECIMAL cumulative sums over a total order, so
    class boundaries are engine-exact; the output audits each class's
    size and revenue share."""
    li = load(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("rev")
    )
    tot = pr.agg(
        F.sum(F.col("rev").cast("decimal(28,2)")).cast("decimal(28,2)").alias("t")
    )
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = pr.select(
        "rev",
        F.sum(F.col("rev").cast("decimal(28,2)")).over(w).cast("decimal(28,2)").alias("cum"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    cls = (
        F.when(F.col("cum") <= F.lit("0.80").cast("decimal(3,2)") * F.col("t"), "A")
        .when(F.col("cum") <= F.lit("0.95").cast("decimal(3,2)") * F.col("t"), "B")
        .otherwise("C")
    )
    return (
        j.select(cls.alias("cls"), "rev", "t")
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("rev").cast("decimal(28,2)")).cast("double").alias("revenue"),
            F.round(
                F.sum(F.col("rev").cast("decimal(28,2)")).cast("double")
                / F.max("t").cast("double"),
                6,
            ).alias("rev_share"),
        )
        .orderBy("cls")
    )


@query(
    "price_elasticity_estimate",
    oracle="""
    -- log-log price elasticity across parts: slope of ln(total quantity)
    -- on ln(avg unit price) per part (cross-sectional), via the decimal-
    -- moment OLS machinery. Unit price = extendedprice / quantity is
    -- exact-ratio-derived; both logs are one libm call on identical
    -- doubles; terms ROUND -> DECIMAL sum.
    WITH pp AS (
      SELECT l_partkey,
             ROUND(ln(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)), 8) AS y,
             ROUND(ln(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                      / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)), 8) AS x
      FROM lineitem GROUP BY l_partkey
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx
      FROM pp
    )
    SELECT n AS n_parts,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity
    FROM m
    """,
)
def price_elasticity_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional price elasticity: OLS slope of log quantity on log
    unit price across parts — the pricing team's first regression.
    (TPC-H prices are size-driven, so the estimate mostly measures that
    correlation — the machinery, one aggregate + one decimal-moment
    regression, is the point.)"""
    li = load(spark, sf_dir, "lineitem")
    pp = li.groupBy("l_partkey").agg(
        F.round(F.log(F.sum(F.col("l_quantity").cast("long")).cast("double")), 8).alias(
            "y"
        ),
        F.round(
            F.log(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / F.sum(F.col("l_quantity").cast("long")).cast("double")
            ),
            8,
        ).alias("x"),
    )
    m = pp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,8)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,8)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_parts"), F.round(slope, 6).alias("elasticity")
    )


@query(
    "mix_shift_decomposition",
    oracle="""
    -- rate-vs-mix decomposition of the change in revenue-per-order
    -- between 1997H1 and 1997H2: for each segment, rate effect =
    -- share_pre * (rate_post - rate_pre), mix effect = (share_post -
    -- share_pre) * rate_post; the effects sum exactly to the total
    -- change. All ratios divide DECIMAL sums by exact counts.
    WITH base AS (
      SELECT c.c_mktsegment AS segment,
             CASE WHEN o.o_orderdate < DATE '1997-07-01' THEN 0 ELSE 1 END AS h,
             COUNT(*) AS n,
             SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate >= DATE '1997-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
      GROUP BY 1, 2
    ),
    tot AS (SELECT h, CAST(SUM(n) AS BIGINT) AS tn FROM base GROUP BY h),
    cells AS (
      SELECT b.segment, b.h,
             b.n * 1.0 / t.tn AS share,
             CAST(b.rev AS DOUBLE) / b.n AS rate
      FROM base b JOIN tot t USING (h)
    )
    SELECT p.segment,
           ROUND(p.share, 6) AS share_pre,
           ROUND(q.share, 6) AS share_post,
           ROUND(p.rate, 4) AS rate_pre,
           ROUND(q.rate, 4) AS rate_post,
           ROUND(p.share * (q.rate - p.rate), 4) AS rate_effect,
           ROUND((q.share - p.share) * q.rate, 4) AS mix_effect
    FROM cells p JOIN cells q ON p.segment = q.segment
    WHERE p.h = 0 AND q.h = 1
    ORDER BY p.segment
    """,
)
def mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-vs-mix decomposition: when revenue-per-order moves, was it
    segments changing their own rates (rate effect) or traffic shifting
    between segments (mix effect)? The two effects sum exactly to the
    topline change — the decomposition behind every 'why did the average
    move' investigation, one level deeper than the contribution shares of
    metric_change_decomposition. One aggregation pass, 2x|segments|
    cells, broadcast arithmetic after."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    h = F.when(F.col("o_orderdate") < F.lit("1997-07-01").cast("date"), 0).otherwise(1)
    base = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(F.broadcast(cust.select("c_custkey", "c_mktsegment")),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"),
        )
    )
    tot = base.groupBy("h").agg(F.sum("n").cast("long").alias("tn"))
    cells = base.join(tot, "h").select(
        "segment",
        "h",
        (F.col("n") * 1.0 / F.col("tn")).alias("share"),
        (F.col("rev").cast("double") / F.col("n")).alias("rate"),
    )
    p = cells.filter(F.col("h") == 0).select(
        "segment", F.col("share").alias("sp"), F.col("rate").alias("rp")
    )
    q = cells.filter(F.col("h") == 1).select(
        F.col("segment").alias("segment_q"),
        F.col("share").alias("sq"),
        F.col("rate").alias("rq"),
    )
    return (
        p.join(q, p.segment == q.segment_q)
        .select(
            "segment",
            F.round("sp", 6).alias("share_pre"),
            F.round("sq", 6).alias("share_post"),
            F.round("rp", 4).alias("rate_pre"),
            F.round("rq", 4).alias("rate_post"),
            F.round(F.col("sp") * (F.col("rq") - F.col("rp")), 4).alias("rate_effect"),
            F.round((F.col("sq") - F.col("sp")) * F.col("rq"), 4).alias("mix_effect"),
        )
        .orderBy("segment")
    )


@query(
    "supplier_concentration_hhi",
    oracle="""
    -- Herfindahl-Hirschman index of supplier revenue concentration per
    -- nation: HHI = sum over suppliers of (share * 10000)^2 scaled — here
    -- sum of squared fractional shares * 10000. Shares divide identical
    -- DECIMAL sums; per-supplier terms ROUND -> DECIMAL-summed.
    WITH sr AS (
      SELECT s.s_nationkey, l.l_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    nt AS (
      SELECT s_nationkey, CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DOUBLE) AS t,
             COUNT(*) AS n_suppliers
      FROM sr GROUP BY 1
    ),
    terms AS (
      SELECT sr.s_nationkey,
             ROUND(POWER(CAST(sr.rev AS DOUBLE) / nt.t, 2) * 10000, 8) AS h
      FROM sr JOIN nt USING (s_nationkey)
    )
    SELECT n.n_name AS nation,
           CAST(MAX(nt.n_suppliers) AS BIGINT) AS n_suppliers,
           ROUND(CAST(SUM(CAST(h AS DECIMAL(28,8))) AS DOUBLE), 2) AS hhi
    FROM terms
    JOIN nt USING (s_nationkey)
    JOIN nation n ON n.n_nationkey = terms.s_nationkey
    GROUP BY n.n_name ORDER BY nation
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of supplier revenue per
    nation (10000 = monopoly, →0 = atomized): the antitrust-grade
    concentration statistic, and operationally the 'is this nation's
    supply single-sourced' risk flag. One revenue aggregate, shares
    against broadcast nation totals, squared-share decimal sum."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    sr = (
        li.join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("rev"))
    )
    nt = sr.groupBy("s_nationkey").agg(
        F.sum(F.col("rev").cast("decimal(28,2)")).cast("double").alias("t"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    terms = sr.join(F.broadcast(nt), "s_nationkey").select(
        "s_nationkey",
        "n_suppliers",
        F.round(
            F.pow(F.col("rev").cast("double") / F.col("t"), 2) * 10000, 8
        ).alias("h"),
    )
    return (
        terms.join(F.broadcast(nation), terms.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n_suppliers").cast("long").alias("n_suppliers"),
            F.round(
                F.sum(F.col("h").cast("decimal(28,8)")).cast("double"), 2
            ).alias("hhi"),
        )
        .orderBy("nation")
    )


@query(
    "dow_hour_activity_matrix",
    oracle="""
    -- weekday x hour activity matrix (the calendar-heatmap source): exact
    -- counts plus each cell's share of its weekday row
    WITH cells AS (
      SELECT CAST(isodow(ts) AS BIGINT) AS weekday,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT weekday, CAST(SUM(n) AS BIGINT) AS rn FROM cells GROUP BY 1)
    SELECT c.weekday, c.hour, CAST(c.n AS BIGINT) AS n_events,
           ROUND(c.n * 1.0 / r.rn, 6) AS share_of_weekday
    FROM cells c JOIN rows_ r USING (weekday)
    ORDER BY weekday, hour
    """,
)
def dow_hour_activity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity matrix with row-normalized shares — the
    calendar-heatmap data source (when does this system actually get
    used) and the base table for staffing / maintenance-window decisions.
    One grouped count, one broadcast row-total join."""
    ev = load(spark, sf_dir, "events")
    iso = F.when(F.dayofweek("ts") == 1, 7).otherwise(F.dayofweek("ts") - 1)
    cells = ev.groupBy(
        iso.cast("long").alias("weekday"), F.hour("ts").cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    rows_ = cells.groupBy("weekday").agg(F.sum("n").cast("long").alias("rn"))
    return (
        cells.join(F.broadcast(rows_), "weekday")
        .select(
            "weekday",
            "hour",
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("n") * 1.0 / F.col("rn"), 6).alias("share_of_weekday"),
        )
        .orderBy("weekday", "hour")
    )


@query(
    "concurrent_sessions_curve",
    oracle="""
    -- sweep-line concurrency: each 30-min click session emits +1 at start
    -- and -1 at end; the running sum over the ordered boundary stream IS
    -- the number of concurrent sessions — no interval self-join at all
    -- (the O(n log n) answer to an O(n^2) stabbing query). Peak
    -- concurrency per hour; ties broken on (us, delta, event_id) with
    -- ends before starts at the same instant.
    WITH s AS (
      SELECT event_id, epoch_us(ts) AS a, epoch_us(ts) + 1800000000 AS b
      FROM events WHERE event_type = 'click'
    ),
    bounds AS (
      SELECT a AS us, 1 AS delta, event_id FROM s
      UNION ALL
      SELECT b AS us, -1 AS delta, event_id FROM s
    ),
    walk AS (
      SELECT us,
             CAST(SUM(delta) OVER (ORDER BY us, delta, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
      FROM bounds
    )
    SELECT CAST(us // 3600000000 AS BIGINT) AS hour_bucket,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrent,
           COUNT(*) AS n_boundaries
    FROM walk
    GROUP BY 1
    ORDER BY hour_bucket
    LIMIT 48
    """,
)
def concurrent_sessions_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session curve by sweep line: sessions become +1/-1
    boundary events and one ordered running sum yields concurrency at
    every instant — the technique that answers 'how many X were open at
    time T' without any interval self-join (capacity planning's favorite
    query, O(n log n) instead of O(n²)). Peak per hour for the first two
    days; deterministic total order on (time, delta, id) closes ends
    before opens at equal instants."""
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        F.unix_micros("ts").alias("a"),
        (F.unix_micros("ts") + 1_800_000_000).alias("b"),
    )
    starts = s.select(F.col("a").alias("us"), F.lit(1).alias("delta"), "event_id")
    ends = s.select(F.col("b").alias("us"), F.lit(-1).alias("delta"), "event_id")
    bounds = starts.unionAll(ends)
    w = Window.orderBy("us", "delta", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = bounds.select(
        "us", F.sum("delta").over(w).cast("long").alias("conc")
    )
    return (
        walk.groupBy((F.col("us") / 3_600_000_000).cast("long").alias("hour_bucket"))
        .agg(
            F.max("conc").cast("long").alias("peak_concurrent"),
            F.count(F.lit(1)).alias("n_boundaries"),
        )
        .orderBy("hour_bucket")
        .limit(48)
    )


@query(
    "tax_discount_interplay",
    oracle="""
    -- effective charged amount per return flag: the TPC-H charge formula
    -- price * (1 - discount) * (1 + tax), all DECIMAL, with the average
    -- effective multiplier vs list price
    SELECT l_returnflag AS flag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
                AS DOUBLE) AS total_charge,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                          * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
                      AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 6)
             AS effective_multiplier
    FROM lineitem GROUP BY l_returnflag ORDER BY flag
    """,
)
def tax_discount_interplay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective charge per return flag — the full TPC-H charge formula
    price*(1-disc)*(1+tax) as exact DECIMAL arithmetic, and the average
    effective multiplier against list price (does tax out-pace discount).
    Completes fixture-column coverage: every lineitem column now feeds at
    least one checked query."""
    li = load(spark, sf_dir, "lineitem")
    one = F.lit("1.00").cast("decimal(4,2)")
    charge = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (one - F.col("l_discount").cast("decimal(4,2)"))
        * (one + F.col("l_tax").cast("decimal(4,2)"))
    )
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(charge).cast("double").alias("total_charge"),
            F.round(
                F.sum(charge).cast("double")
                / F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double"),
                6,
            ).alias("effective_multiplier"),
        )
        .orderBy("flag")
    )


@query(
    "aqp_sampled_groupby",
    oracle="""
    -- approximate query processing (BlinkDB-style): answer a group-by
    -- mean from a ~10% DETERMINISTIC hash sample (md5(event_id) digit
    -- prefix < 0.1 of the 48-bit space) and attach a 95% CI half-width
    -- from the sample's own moments — the reader sees estimate, error
    -- bar, and the exact answer the bar must cover. The sample is a
    -- pure hash predicate, so both engines draw THE SAME rows and the
    -- whole audit is hash-checked.
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
            < 28147497671066
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_sample,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6)))
                  AS DOUBLE) AS s2
      FROM s GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS se
      FROM events GROUP BY event_type
    )
    SELECT m.event_type, m.n_sample, ex.n_exact,
           ROUND(m.s1 / m.n_sample, 6) AS est_mean,
           ROUND(1.959963985
                 * sqrt((m.s2 - m.s1 * m.s1 / m.n_sample)
                        / (m.n_sample - 1) / m.n_sample), 6) AS ci_halfwidth,
           ROUND(ex.se / ex.n_exact, 6) AS exact_mean,
           abs(m.s1 / m.n_sample - ex.se / ex.n_exact)
             <= 1.959963985
                * sqrt((m.s2 - m.s1 * m.s1 / m.n_sample)
                       / (m.n_sample - 1) / m.n_sample) AS ci_covers
    FROM m JOIN ex USING (event_type)
    ORDER BY m.event_type
    """,
)
def aqp_sampled_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing: the BlinkDB shape — answer the
    group-by mean from a ~10% hash sample with a CLT 95% error bar
    instead of scanning everything. At 100 TB this is the difference
    between touching one partition in ten and touching all of them; the
    sample predicate is a pure md5 hash on the row key, so it pushes to
    the scan, needs no stored sample table, draws identical rows in any
    engine, and composes with any aggregate whose moments travel (the
    CI here comes from the same decimal-moment pass the scorecards use).
    The exact answer and a coverage flag ride along as the audit."""
    ev = load(spark, sf_dir, "events")
    z = 1.959963985
    thresh = 28147497671066  # 0.1 * 2^48, the 10% slice of the hash space
    s = ev.filter(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        < thresh
    )
    m = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double").alias("s1"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("s2"),
    )
    ex = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double").alias("se"),
    )
    ci = F.lit(z) * F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_sample"))
        / (F.col("n_sample") - 1)
        / F.col("n_sample")
    )
    est = F.col("s1") / F.col("n_sample")
    exact = F.col("se") / F.col("n_exact")
    return (
        m.join(ex, "event_type")
        .select(
            "event_type",
            "n_sample",
            "n_exact",
            F.round(est, 6).alias("est_mean"),
            F.round(ci, 6).alias("ci_halfwidth"),
            F.round(exact, 6).alias("exact_mean"),
            (F.abs(est - exact) <= ci).alias("ci_covers"),
        )
        .orderBy("event_type")
    )


def _hw_oracle() -> str:
    """Holt-Winters additive (alpha=1/2, beta=1/4, gamma=1/2, m=7) over the
    Jan-1..Jan-28 daily event counts, UNROLLED day by day (21 recurrence
    steps after the first-week init). Every step is a fixed-order double
    chain on exact integer-valued counts — identical IEEE in both engines
    — and each CTE is MATERIALIZED (DuckDB inlining is exponential in the
    unroll depth otherwise, see CLAUDE.md)."""
    sql = """
    WITH daily AS MATERIALIZED (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-28'
      GROUP BY 1
    ),
    step7 AS MATERIALIZED (
      SELECT
        (SELECT SUM(y) FROM daily WHERE d BETWEEN 1 AND 7) / 7.0 AS l,
        ((SELECT SUM(y) FROM daily WHERE d BETWEEN 8 AND 14) / 7.0
         - (SELECT SUM(y) FROM daily WHERE d BETWEEN 1 AND 7) / 7.0) / 7.0 AS b,"""
    for i in range(1, 8):
        sql += f"""
        (SELECT y FROM daily WHERE d = {i})
          - (SELECT SUM(y) FROM daily WHERE d BETWEEN 1 AND 7) / 7.0 AS s{i},"""
    sql = sql.rstrip(",") + """
    )"""
    for d in range(8, 29):
        idx = (d - 1) % 7 + 1
        lnew = (
            f"0.5 * ((SELECT y FROM daily WHERE d = {d}) - p.s{idx})"
            f" + 0.5 * (p.l + p.b)"
        )
        keep = ", ".join(f"p.s{i} AS s{i}" for i in range(1, 8) if i != idx)
        sql += f""",
    step{d} AS MATERIALIZED (
      SELECT ({lnew}) AS l,
             0.25 * (({lnew}) - p.l) + 0.75 * p.b AS b,
             0.5 * ((SELECT y FROM daily WHERE d = {d}) - ({lnew}))
               + 0.5 * p.s{idx} AS s{idx},
             {keep}
      FROM step{d - 1} p
    )"""
    fc = []
    for h in range(1, 8):
        idx = (28 + h - 1) % 7 + 1
        fc.append(
            f"SELECT CAST({h} AS BIGINT) AS h,"
            f" ROUND(l + {h} * b + s{idx}, 6) AS yhat FROM step28"
        )
    sql += "\n    " + "\n    UNION ALL ".join(fc) + "\n    ORDER BY h"
    return sql


@query("holt_winters_forecast", oracle=_hw_oracle())
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters triple exponential smoothing (additive level + trend +
    weekly season) of the daily event-count series — the seasonal upgrade
    of exp_smoothing_forecast: SES flattens the weekly rhythm, HW carries
    it into the forecast. Smoothing constants are dyadic (1/2, 1/4, 1/2)
    and the series integer-valued, so the whole 21-step recurrence is a
    fixed-order double chain the unrolled oracle reproduces bit-for-bit.
    The daily aggregation is distributed; the recurrence folds 28 scalars
    on the driver (dimension-bounded by the calendar, never by rows) —
    the same bounded-series discipline as the EWMA control chart."""
    ev = load(spark, sf_dir, "events")
    daily = {
        int(r["d"]): float(r["y"])
        for r in ev.filter(
            F.to_date("ts").between("2024-01-01", "2024-01-28")
        )
        .groupBy(
            (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) + 1)
            .cast("int")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .collect()
    }
    y = [daily.get(d, 0.0) for d in range(1, 29)]
    week1 = sum(y[0:7]) / 7.0
    week2 = sum(y[7:14]) / 7.0
    level, trend = week1, (week2 - week1) / 7.0
    season = [y[i] - week1 for i in range(7)]
    for d in range(8, 29):
        idx = (d - 1) % 7
        prev_level = level
        yd = y[d - 1]
        level = 0.5 * (yd - season[idx]) + 0.5 * (prev_level + trend)
        trend = 0.25 * (level - prev_level) + 0.75 * trend
        season[idx] = 0.5 * (yd - level) + 0.5 * season[idx]
    from decimal import ROUND_HALF_UP, Decimal

    rows = []
    for h in range(1, 8):
        idx = (28 + h - 1) % 7
        # DuckDB ROUND is half-away-from-zero; Python round() is half-even
        yhat = float(
            Decimal(repr(level + h * trend + season[idx])).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        rows.append((h, yhat))
    return spark.createDataFrame(rows, "h bigint, yhat double").orderBy("h")


@query(
    "nelson_aalen_hazard",
    oracle="""
    -- Nelson-Aalen cumulative hazard for time-to-first-purchase: the
    -- hazard-side twin of kaplan_meier_survival on the SAME censored
    -- observations. H(t) = sum over death times <= t of d_i/n_i — no
    -- ln/exp needed, so the curve is a plain cumulative DECIMAL sum of
    -- rounded terms; at-risk counts come from a window over grouped
    -- durations instead of a correlated subquery.
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    death AS (
      SELECT e.user_id, MIN(e.ts) AS td
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t0
      GROUP BY e.user_id
    ),
    last_seen AS (
      SELECT e.user_id, MAX(e.ts) AS tl
      FROM events e JOIN s USING (user_id)
      GROUP BY e.user_id
    ),
    obs AS (
      SELECT s.user_id,
             CASE WHEN d.td IS NOT NULL THEN 1 ELSE 0 END AS died,
             CAST(FLOOR((epoch_us(COALESCE(d.td, l.tl)) - epoch_us(s.t0))
                        / 3600000000.0) AS BIGINT) AS dur_h
      FROM s
      LEFT JOIN death d USING (user_id)
      JOIN last_seen l USING (user_id)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    per AS (
      SELECT dur_h AS t, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(died) AS BIGINT) AS d
      FROM obs GROUP BY dur_h
    ),
    risk AS (
      SELECT t, d,
             tot.n - CAST(COALESCE(SUM(c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_risk
      FROM per CROSS JOIN tot
    )
    SELECT t, n_risk, CAST(d AS BIGINT) AS n_deaths,
           ROUND(CAST(SUM(CAST(ROUND(d * 1.0 / n_risk, 10) AS DECIMAL(28,10)))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6)
             AS cum_hazard
    FROM risk WHERE d > 0 ORDER BY t
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard — the estimator survival pipelines
    prefer when hazard (instantaneous conversion pressure), not survival
    probability, is the readout; it shares kaplan_meier_survival's
    censored observations but needs no ln/exp, so the whole curve is a
    cumulative DECIMAL sum of ROUND@10 terms. At-risk counts are a
    window over grouped durations (one pass), not a correlated
    subquery."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    death = (
        ev.join(s, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t0")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("td"))
    )
    last_seen = ev.join(s.select("user_id"), "user_id").groupBy("user_id").agg(
        F.max("ts").alias("tl")
    )
    obs = (
        s.join(death, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            F.when(F.col("td").isNotNull(), 1).otherwise(0).alias("died"),
            F.floor(
                (
                    F.unix_micros(F.coalesce("td", "tl"))
                    - F.unix_micros("t0")
                )
                / 3600000000.0
            )
            .cast("long")
            .alias("dur_h"),
        )
    )
    tot = obs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    per = obs.groupBy(F.col("dur_h").alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("died").cast("long").alias("d"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum("c").over(w_prev), F.lit(0)).cast("long")
        ).alias("n_risk"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (
        risk.withColumn(
            "cum_hazard",
            F.round(
                F.sum(
                    F.round(F.col("d") * 1.0 / F.col("n_risk"), 10).cast(
                        "decimal(28,10)"
                    )
                )
                .over(w_cum)
                .cast("double"),
                6,
            ),
        )
        .filter(F.col("d") > 0)
        .select("t", "n_risk", F.col("d").alias("n_deaths"), "cum_hazard")
        .orderBy("t")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution

_MRK_K = 25  # absorption power-iteration steps (geometric convergence)
_MRK_CHANNELS = ["click", "error", "signup", "view"]


def _markov_edges_sql() -> str:
    """Shared CTE prefix: user journeys -> (cur, nxt) edge counts with
    START / CONV / NULL states (journey = events up to first purchase)."""
    return """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    fp AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS fp_rn,
             MAX(rn) AS max_rn
      FROM seq GROUP BY user_id
    ),
    path AS (
      SELECT s.user_id, s.rn,
             CASE WHEN s.event_type = 'purchase' THEN 'CONV'
                  ELSE s.event_type END AS st,
             f.fp_rn, f.max_rn
      FROM seq s JOIN fp f USING (user_id)
      WHERE s.rn <= COALESCE(f.fp_rn, f.max_rn)
    ),
    hops AS (
      SELECT user_id, rn, st,
             LEAD(st) OVER (PARTITION BY user_id ORDER BY rn) AS nxt,
             fp_rn, max_rn
      FROM path
    ),
    edges AS (
      SELECT 'START' AS cur, st AS nxt FROM path WHERE rn = 1
      UNION ALL
      SELECT st, nxt FROM hops WHERE nxt IS NOT NULL
      UNION ALL
      SELECT st, 'NULL' FROM hops
      WHERE nxt IS NULL AND fp_rn IS NULL AND rn = max_rn
    ),
    trans AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM edges GROUP BY 1, 2
    ),
    outs AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS n_out FROM trans GROUP BY cur),
    scen AS (SELECT unnest(['base'] + {chans!r}) AS r),
    strans AS MATERIALIZED (
      SELECT s.r, t.cur,
             CASE WHEN s.r <> 'base' AND t.nxt = s.r THEN 'NULL'
                  ELSE t.nxt END AS nxt,
             CAST(SUM(t.n) AS BIGINT) AS n,
             o.n_out
      FROM scen s
      JOIN trans t ON s.r = 'base' OR t.cur <> s.r
      JOIN outs o ON o.cur = t.cur
      GROUP BY s.r, t.cur, 3, o.n_out
    ),
    p0 AS (SELECT r, 'CONV' AS state, 1.0 AS p FROM scen)""".replace(
        "{chans!r}", repr(_MRK_CHANNELS)
    )


def _markov_oracle() -> str:
    sql = _markov_edges_sql()
    for k in range(1, _MRK_K + 1):
        sql += f""",
    p{k} AS MATERIALIZED (
      SELECT t.r, t.cur AS state,
             CAST(SUM(CAST(ROUND(t.n * 1.0 / t.n_out * q.p, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS p
      FROM strans t JOIN p{k - 1} q ON q.r = t.r AND q.state = t.nxt
      GROUP BY t.r, t.cur
      UNION ALL
      SELECT r, 'CONV', 1.0 FROM scen
    )"""
    sql += f""",
    finals AS MATERIALIZED (
      SELECT r, p FROM p{_MRK_K} WHERE state = 'START'
    ),
    base AS (SELECT p AS bp FROM finals WHERE r = 'base'),
    re AS MATERIALIZED (
      SELECT f.r AS channel, f.p AS conv_prob_removed,
             1.0 - f.p / b.bp AS re
      FROM finals f CROSS JOIN base b WHERE f.r <> 'base'
    ),
    tot AS (SELECT SUM(re) AS s FROM re)
    SELECT channel,
           ROUND(conv_prob_removed, 6) AS conv_prob_removed,
           ROUND(re, 6) AS removal_effect,
           ROUND(re / tot.s, 6) AS attribution_share
    FROM re CROSS JOIN tot
    ORDER BY channel
    """
    return sql


@query("markov_removal_attribution", oracle=_markov_oracle())
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (the data-driven upgrade of
    the position-weighted 40/20/40 rule): model user journeys as a
    first-order chain (START -> channels -> CONV at first purchase / NULL
    at journey end), then credit each channel by how much the absorption
    probability into CONV DROPS when every edge into that channel is
    redirected to NULL — the standard removal-effect construction, the
    unique attribution that respects the actual path structure instead of
    positional heuristics.

    Determinism: absorption probabilities come from a fixed-K power
    iteration whose per-term arithmetic is pinned (ROUND@1e-12 ->
    DECIMAL(38,12) sums — the PageRank discipline), replicated on the
    driver with Decimal HALF_UP over the COLLECTED transition table
    (bounded: |states|^2 <= 36 rows x 5 scenarios), so the result
    hash-equals the oracle's unrolled-CTE iteration at any K.

    Scale shape: the only data pass is the per-user journey window + edge
    aggregate (one shuffle on user_id); the exponential-free part runs on
    the kilobyte transition table — the HHH-lattice discipline again."""
    from decimal import ROUND_HALF_UP, Decimal

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    )
    fp = seq.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).alias("fp_rn"),
        F.max("rn").alias("max_rn"),
    )
    path = (
        seq.join(fp, "user_id")
        .filter(F.col("rn") <= F.coalesce(F.col("fp_rn"), F.col("max_rn")))
        .select(
            "user_id",
            "rn",
            F.when(F.col("event_type") == "purchase", "CONV")
            .otherwise(F.col("event_type"))
            .alias("st"),
            "fp_rn",
            "max_rn",
        )
    )
    wp = Window.partitionBy("user_id").orderBy("rn")
    hops = path.withColumn("nxt", F.lead("st").over(wp))
    edges = (
        path.filter(F.col("rn") == 1)
        .select(F.lit("START").alias("cur"), F.col("st").alias("nxt"))
        .unionAll(
            hops.filter(F.col("nxt").isNotNull()).select(
                F.col("st").alias("cur"), "nxt"
            )
        )
        .unionAll(
            hops.filter(
                F.col("nxt").isNull()
                & F.col("fp_rn").isNull()
                & (F.col("rn") == F.col("max_rn"))
            ).select(F.col("st").alias("cur"), F.lit("NULL").alias("nxt"))
        )
    )
    trans = (
        edges.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")).collect()
    )  # bounded: |states|^2 <= 36 edge rows

    n_out: dict[str, int] = {}
    for r in trans:
        n_out[r["cur"]] = n_out.get(r["cur"], 0) + int(r["n"])

    q12 = Decimal("1e-12")
    scenarios = ["base"] + _MRK_CHANNELS
    results = {}
    for sc in scenarios:
        # redirected transition list: (cur, nxt, prob as exact double)
        agg: dict[tuple[str, str], int] = {}
        for r in trans:
            cur, nxt, n = r["cur"], r["nxt"], int(r["n"])
            if sc != "base" and cur == sc:
                continue
            if sc != "base" and nxt == sc:
                nxt = "NULL"
            agg[(cur, nxt)] = agg.get((cur, nxt), 0) + n
        p = {"CONV": 1.0}
        for _ in range(_MRK_K):
            acc: dict[str, Decimal] = {}
            for (cur, nxt), n in agg.items():
                pv = p.get(nxt, 0.0)
                if pv == 0.0:
                    # term is exactly 0 — same as the SQL sum skipping it
                    term = 0.0
                else:
                    term = n * 1.0 / n_out[cur] * pv
                acc[cur] = acc.get(cur, Decimal(0)) + Decimal(repr(term)).quantize(
                    q12, rounding=ROUND_HALF_UP
                )
            p = {cur: float(v) for cur, v in acc.items()}
            p["CONV"] = 1.0
        results[sc] = p.get("START", 0.0)

    bp = results["base"]
    res = [(c, results[c], 1.0 - results[c] / bp) for c in _MRK_CHANNELS]
    s = sum(re for _, _, re in res)

    def r6(v: float) -> float:
        return float(Decimal(repr(v)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))

    rows = [
        (c, r6(pr), r6(re), r6(re / s)) for c, pr, re in res
    ]
    return spark.createDataFrame(
        sorted(rows),
        "channel string, conv_prob_removed double, removal_effect double, "
        "attribution_share double",
    )
