"""Layer-B relational surface (SURVEY.md §2B) as Spark DataFrame programs with
DuckDB oracle SQL.

The reference inherits these operators from Trino (`docs/src/operations/dql/
select.md`); here Spark SQL/Catalyst provides them, and each query is driven
end-to-end through the engine. Shapes are TPC-H-derived, adapted to the driver
testdata schema (TESTDATA.md; no partsupp/comment/phone columns, orders span
1995-2001, events are 2024).

Determinism: see suite/__init__.py docstring. `dsum` computes an exact
decimal-backed sum returned as DOUBLE so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from . import register


def dsum(col: Column | str, scale: int, alias: str) -> Column:
    """Exact sum of a double expression: accumulate as DECIMAL(38, scale)
    (exact, order-independent) and emit DOUBLE. `scale` must cover the true
    decimal precision of the data (prices/discount/tax have 2 decimals each,
    so products of k factors need scale 2k)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double").alias(alias)


def _dsum_sql(expr: str, scale: int) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# q01 — TPC-H Q1: scan + filter + hash aggregate (8 aggs, 2 group keys).
# Reference surface: GROUP BY + aggregates (select.md "Aggregate Functions").
# Scale notes: partial aggregation map-side, 2-key groupBy shuffles only
# ~6 groups; the scan reads 7 columns of 16 (column pruning).
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {_dsum_sql('l_extendedprice', 2)} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
           {_dsum_sql('l_extendedprice', 2)} / COUNT(*) AS avg_price,
           {_dsum_sql('l_discount', 2)} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: multi-aggregate groupBy",
    tags=("agg", "tpch"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    qty = F.col("l_quantity").cast("bigint")
    return (
        li.filter(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            dsum("l_extendedprice", 2, "sum_base_price"),
            dsum(disc_price, 4, "sum_disc_price"),
            dsum(charge, 6, "sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice", 2, "_").cast("double") / F.count("*")).alias("avg_price"),
            (dsum("l_discount", 2, "_").cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — filter + ORDER BY ... LIMIT (top-k). Physical: TakeOrderedAndProject,
# no full sort/shuffle of the table. Reference: select.md "ORDER BY"/"LIMIT".
# ---------------------------------------------------------------------------
@register(
    "q02_topk_open_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="top-k by price over filtered scan (TakeOrderedAndProject)",
    tags=("topk", "filter"),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q03 — TPC-H Q3: 3-way join + agg + top-k. customer is small → broadcast.
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: broadcast dim join + agg + topk",
    tags=("join", "agg", "tpch"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") > "1998-03-15")
        .join(
            orders.filter(F.col("o_orderdate") < "1998-03-15"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — EXISTS subquery → left-semi join. Reference: select.md "Subquery".
# ---------------------------------------------------------------------------
@register(
    "q04_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount >= 0.06)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXISTS subquery as left-semi join + agg",
    tags=("join", "subquery"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flagged = li.filter(F.col("l_discount") >= 0.06).select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
        )
        .join(flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q05 — TPC-H Q5: 6-way join (region/nation/supplier broadcast) + agg.
# ---------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5: six-way star join, small dims broadcast",
    tags=("join", "agg", "tpch"),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# q06 — TPC-H Q6: pure scan-aggregate; every predicate pushes to parquet.
# ---------------------------------------------------------------------------
@register(
    "q06_revenue_forecast",
    oracle=f"""
    SELECT {_dsum_sql('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: scan-only predicate aggregate (full pushdown)",
    tags=("agg", "filter", "tpch"),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — nation-pair volume: join + derived column (year) grouping.
# ---------------------------------------------------------------------------
@register(
    "q07_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND sn.n_name < cn.n_name
    GROUP BY sn.n_name, cn.n_name, YEAR(l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: self-aliased dim join, expression grouping",
    tags=("join", "agg"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q09 — product profit by nation/year (Q9 shape, supplycost emulated from
# p_retailprice since the testdata has no partsupp).
# ---------------------------------------------------------------------------
@register(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           {_dsum_sql('l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity', 6)} AS profit
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'ECONOMY'
    GROUP BY n_name, YEAR(o_orderdate)
    ORDER BY nation, o_year
    """,
    doc="TPC-H Q9 shape: 5-way join, arithmetic aggregate",
    tags=("join", "agg"),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit, 6, "profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# q10 — returned-item revenue per customer: join + agg + top-k w/ dims.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-item revenue, join + agg + topk",
    tags=("join", "agg", "tpch"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12 — CASE WHEN conditional aggregation over a join (Q12 shape).
# ---------------------------------------------------------------------------
@register(
    "q12_priority_classes",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="CASE WHEN conditional aggregation (TPC-H Q12 shape)",
    tags=("join", "case"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution: LEFT OUTER join + two-level agg.
# ---------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderstatus <> 'P'
          GROUP BY c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: left outer join + double aggregation",
    tags=("join", "agg", "outer"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderstatus") != "P"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue ratio: join + conditional agg + scalar arithmetic.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * {_dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)}
             / {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14: conditional aggregation ratio",
    tags=("join", "case"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.filter((F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(promo, 4, "_p").cast("double")
                / dsum(rev, 4, "_r").cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q15 — top supplier: CTE + agg + scalar-subquery max (Q15 shape).
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: CTE + scalar subquery on aggregate",
    tags=("cte", "subquery", "agg"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q16 — distinct-count with NOT IN subquery (Q16 shape).
# ---------------------------------------------------------------------------
@register(
    "q16_part_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16: COUNT DISTINCT + NOT IN anti-join",
    tags=("join", "distinct", "subquery"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad_supp = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(1, 7, 14, 21, 28, 35, 42, 49)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q17 — correlated scalar subquery (per-part average) — Q17 shape.
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {_dsum_sql('l_extendedprice', 2)} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE)
                                      / COUNT(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17: correlated scalar subquery via groupBy+join",
    tags=("join", "subquery"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Decorrelated form: per-part average via aggregation + join (exactly what
    # Catalyst/Trino do to the correlated subquery).
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("bigint")).cast("double") / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice", 2, "_").cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q18 — large orders: agg-HAVING subquery + 3-way join + topk (Q18).
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18: HAVING subquery (semi-join) + join + topk",
    tags=("join", "agg", "subquery", "having"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive multi-branch predicate join (Q19 shape).
# ---------------------------------------------------------------------------
@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19: OR-of-ANDs disjunctive join predicate",
    tags=("join", "filter"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    b = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(b).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# q22 — anti-join + scalar subquery (Q22 shape).
# ---------------------------------------------------------------------------
@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE)
                              / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22: scalar subquery threshold + NOT EXISTS anti-join",
    tags=("subquery", "antijoin", "agg"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,2)")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(38,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q23 — set operations: INTERSECT / EXCEPT (distinct semantics) + UNION ALL.
# ---------------------------------------------------------------------------
@register(
    "q23_setops_customer_cohorts",
    oracle="""
    SELECT 'retained' AS cohort, COUNT(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997) t1
    UNION ALL
    SELECT 'churned' AS cohort, COUNT(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997) t2
    ORDER BY cohort
    """,
    doc="INTERSECT/EXCEPT cohort analysis + UNION ALL",
    tags=("setops",),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    # intersect/subtract carry SQL set semantics (implicit DISTINCT).
    retained = y96.intersect(y97).agg(F.count("*").alias("n")).select(
        F.lit("retained").alias("cohort"), "n"
    )
    churned = y96.subtract(y97).agg(F.count("*").alias("n")).select(
        F.lit("churned").alias("cohort"), "n"
    )
    return retained.unionAll(churned).orderBy("cohort")


# ---------------------------------------------------------------------------
# q24 — window functions: running sums + rank per partition.
# Reference surface: §2B "Window functions ... engine-provided".
# ---------------------------------------------------------------------------
@register(
    "q24_window_running_revenue",
    oracle="""
    WITH monthly AS (
      SELECT l_suppkey,
             CAST((YEAR(l_shipdate) * 100 + MONTH(l_shipdate)) AS INT) AS ym,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS rev
      FROM lineitem WHERE l_suppkey <= 20
      GROUP BY l_suppkey, YEAR(l_shipdate) * 100 + MONTH(l_shipdate))
    SELECT l_suppkey, ym,
           CAST(rev AS DOUBLE) AS rev,
           CAST(SUM(rev) OVER (PARTITION BY l_suppkey ORDER BY ym
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_rev,
           CAST(RANK() OVER (PARTITION BY l_suppkey ORDER BY rev DESC, ym) AS BIGINT) AS rev_rank
    FROM monthly
    ORDER BY l_suppkey, ym
    """,
    doc="window: running decimal-exact sum + rank per supplier-month",
    tags=("window",),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    monthly = (
        li.filter(F.col("l_suppkey") <= 20)
        .groupBy(
            "l_suppkey",
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("int").alias("ym"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,4)")
            ).cast("decimal(38,4)").alias("rev")
        )
    )
    w_run = W.partitionBy("l_suppkey").orderBy("ym").rowsBetween(W.unboundedPreceding, 0)
    w_rank = W.partitionBy("l_suppkey").orderBy(F.col("rev").desc(), "ym")
    return (
        monthly.select(
            "l_suppkey",
            "ym",
            F.col("rev").cast("double").alias("rev"),
            F.sum("rev").over(w_run).cast("double").alias("running_rev"),
            F.rank().over(w_rank).cast("bigint").alias("rev_rank"),
        )
        .orderBy("l_suppkey", "ym")
    )


# ---------------------------------------------------------------------------
# q25 — top-N per group via row_number window.
# ---------------------------------------------------------------------------
@register(
    "q25_top_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey) t
    WHERE rn <= 5
    ORDER BY c_mktsegment, rn
    """,
    doc="top-N per group (row_number window + filter)",
    tags=("window", "topk"),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


# ---------------------------------------------------------------------------
# q26 — ROLLUP grouping sets.
# ---------------------------------------------------------------------------
@register(
    "q26_rollup_sales",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    doc="ROLLUP grouping sets with subtotal rows",
    tags=("rollup",),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # exact integer cents, not DECIMAL(38,2): ROLLUP's Expand runs every
    # row through the aggregate once per grouping set, and a BigDecimal
    # sum there costs ~4x the long sum (measured at sf1) for the same
    # bit-exact double (cents are exact in BIGINT; /100.0 rounds once,
    # identically in both engines)
    return (
        li.withColumn(
            "cents",
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"),
        )
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            (F.sum("cents") / F.lit(100.0)).alias("total_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_price",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# q27 — ORDER BY + LIMIT/OFFSET pagination (select.md "LIMIT and OFFSET").
# ---------------------------------------------------------------------------
@register(
    "q27_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 200
    """,
    doc="deterministic pagination: order by + offset + limit",
    tags=("limit", "offset"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(200)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q28 — DISTINCT projection (select.md "Distinct values").
# ---------------------------------------------------------------------------
@register(
    "q28_distinct_pairs",
    oracle="""
    SELECT DISTINCT c_mktsegment, o_orderstatus
    FROM customer JOIN orders ON c_custkey = o_custkey
    ORDER BY c_mktsegment, o_orderstatus
    """,
    doc="DISTINCT over join output",
    tags=("distinct",),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_orderstatus")
        .distinct()
        .orderBy("c_mktsegment", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q29 — multi-CTE + HAVING (select.md "Common Table Expression", "HAVING").
# ---------------------------------------------------------------------------
@register(
    "q29_cte_nation_stats",
    oracle="""
    WITH cust_n AS (
      SELECT n_name, COUNT(*) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS cust_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name),
    supp_n AS (
      SELECT n_name, COUNT(*) AS n_supp,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS supp_bal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT c.n_name AS n_name, n_cust, cust_bal, n_supp, supp_bal
    FROM cust_n c JOIN supp_n s ON c.n_name = s.n_name
    WHERE n_cust > 10
    ORDER BY n_name
    """,
    doc="multi-CTE join with HAVING-style filter",
    tags=("cte", "join", "having"),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cust_n = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(38,2)")).cast("double").alias("cust_bal"),
        )
    )
    supp_n = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("sn_name"))
        .agg(
            F.count("*").alias("n_supp"),
            F.sum(F.col("s_acctbal").cast("decimal(38,2)")).cast("double").alias("supp_bal"),
        )
    )
    return (
        cust_n.filter(F.col("n_cust") > 10)
        .join(supp_n, F.col("n_name") == F.col("sn_name"))
        .select("n_name", "n_cust", "cust_bal", "n_supp", "supp_bal")
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q30 — FULL OUTER join (§2B last row: outer joins, engine-provided).
# ---------------------------------------------------------------------------
@register(
    "q30_full_outer_activity",
    oracle="""
    SELECT COALESCE(b.k, s.k) AS custkey,
           COALESCE(n_buy, 0) AS n_buy, COALESCE(n_big, 0) AS n_big
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_buy FROM orders
          WHERE o_totalprice < 2000 GROUP BY o_custkey) b
    FULL OUTER JOIN
         (SELECT o_custkey AS k, COUNT(*) AS n_big FROM orders
          WHERE o_totalprice > 400000 GROUP BY o_custkey) s
      ON b.k = s.k
    ORDER BY custkey
    """,
    doc="FULL OUTER join of two aggregates",
    tags=("join", "outer"),
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = (
        orders.filter(F.col("o_totalprice") < 2000)
        .groupBy(F.col("o_custkey").alias("bk"))
        .agg(F.count("*").alias("n_buy"))
    )
    s = (
        orders.filter(F.col("o_totalprice") > 400000)
        .groupBy(F.col("o_custkey").alias("sk"))
        .agg(F.count("*").alias("n_big"))
    )
    return (
        b.join(s, F.col("bk") == F.col("sk"), "full_outer")
        .select(
            F.coalesce("bk", "sk").alias("custkey"),
            F.coalesce("n_buy", F.lit(0)).alias("n_buy"),
            F.coalesce("n_big", F.lit(0)).alias("n_big"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# q08 — TPC-H Q8 market share: 8-way star join (all dims broadcast) + yearly
# conditional-share aggregation. At scale only lineitem and orders are big;
# their join shuffles on orderkey while part/supplier/customer/nation/region
# ride along as broadcasts — Catalyst picks this given the size stats.
# ---------------------------------------------------------------------------
@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           {_dsum_sql("CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END", 4)}
             / {_dsum_sql('volume', 4)} AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
        AND p_type = 'ECONOMY'
    ) AS all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8: national market share within region/part-type segment",
    tags=("join", "agg", "tpch"),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") <= "1996-12-31")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    cust_in_region = customer.join(
        F.broadcast(
            nation.join(
                F.broadcast(region), nation.n_regionkey == region.r_regionkey
            ).select("n_nationkey")
        ),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")

    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_region), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), lineitem.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    nat_vol = F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(F.lit(0.0))
    return (
        joined.groupBy("o_year")
        .agg(
            (
                dsum(nat_vol, 4, "_num").cast("double")
                / dsum("volume", 4, "_den").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q11 — TPC-H Q11 shape (important stock) with supply value derived from
# lineitem (testdata has no partsupp): per-part value vs a global-total scalar
# subquery threshold. The scalar total is a one-row broadcast cross join; the
# per-part agg reuses the same shuffled base via two aggregations over one
# scan (Spark schedules both from the same exchange).
# ---------------------------------------------------------------------------
@register(
    "q11_important_parts",
    oracle=f"""
    WITH supply AS (
      SELECT l_partkey, l_extendedprice * l_quantity AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2
    )
    SELECT l_partkey AS p_key, {_dsum_sql('val', 4)} AS part_value
    FROM supply
    GROUP BY l_partkey
    HAVING {_dsum_sql('val', 4)} >
           (SELECT {_dsum_sql('val', 4)} * 0.001 FROM supply)
    ORDER BY part_value DESC, p_key
    """,
    doc="TPC-H Q11 shape: per-part value above share-of-total threshold",
    tags=("agg", "subquery", "tpch"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    supply = li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey",
        (F.col("l_extendedprice") * F.col("l_quantity")).alias("val"),
    )
    per_part = supply.groupBy(F.col("l_partkey").alias("p_key")).agg(
        dsum("val", 4, "part_value")
    )
    total = supply.agg(
        (dsum("val", 4, "_t").cast("double") * 0.001).alias("_threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_threshold"))
        .select("p_key", "part_value")
        .orderBy(F.col("part_value").desc(), "p_key")
    )


# ---------------------------------------------------------------------------
# q20 — TPC-H Q20 shape (potential part promotion): nested GROUP-BY-HAVING
# subquery feeding an IN-list semi join against supplier.
# ---------------------------------------------------------------------------
@register(
    "q20_potential_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 30
    )
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: HAVING subquery -> semi join on supplier",
    tags=("join", "semi", "subquery", "tpch"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    eligible = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            eligible, supplier.s_suppkey == eligible.l_suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q21 — TPC-H Q21 shape (suppliers who kept orders waiting): semi + anti
# self-joins on lineitem. The two EXISTS branches become left_semi/left_anti
# joins over the same shuffled (orderkey) base.
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND s_nationkey = n_nationkey AND n_regionkey = 1
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 50
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT-EXISTS self joins on lineitem",
    tags=("join", "semi", "anti", "tpch"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")

    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    base = (
        l1.join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier.join(
                F.broadcast(nation.select("n_nationkey")),
                supplier.s_nationkey == F.col("n_nationkey"),
            ).select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    with_other = base.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    )
    sole_waiter = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    return (
        sole_waiter.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q31 — CUBE grouping sets (Layer B "grouping sets/cube" row): all four
# grouping combinations with subtotal and grand-total rows.
# ---------------------------------------------------------------------------
@register(
    "q31_cube_order_stats",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    doc="CUBE grouping sets (subtotals along both dimensions + grand total)",
    tags=("cube", "agg"),
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# q32 — PIVOT: order counts per year pivoted over the five priority classes.
# Spark's native pivot vs a conditional-aggregation oracle (the relational
# definition of PIVOT), fixed column list so schemas match exactly.
# ---------------------------------------------------------------------------
_Q32_PRIORITIES = (
    ("1-URGENT", "p_urgent"),
    ("2-HIGH", "p_high"),
    ("3-MEDIUM", "p_medium"),
    ("4-NOT SPECIFIED", "p_notspec"),
    ("5-LOW", "p_low"),
)


def _q32_oracle() -> str:
    cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{v}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {alias}"
        for v, alias in _Q32_PRIORITIES
    )
    return f"""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
           {cols}
    FROM orders
    GROUP BY YEAR(o_orderdate)
    ORDER BY o_year
    """


@register(
    "q32_pivot_priority_by_year",
    oracle=_q32_oracle(),
    doc="PIVOT: per-year order counts across the five priority classes",
    tags=("relational", "pivot"),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .pivot("o_orderpriority", [v for v, _ in _Q32_PRIORITIES])
        .count()
    )
    renamed = pivoted
    for v, alias in _Q32_PRIORITIES:
        renamed = renamed.withColumnRenamed(v, alias)
    return renamed.select(
        "o_year",
        *[F.coalesce(F.col(alias), F.lit(0)).alias(alias) for _, alias in _Q32_PRIORITIES],
    ).orderBy("o_year")


# ---------------------------------------------------------------------------
# q33 — exact discrete quantiles WITHOUT engine quantile builtins: both
# sides pick the value at rank floor((n-1)*q)+1 of the per-group sort, so
# no interpolation/rounding semantics can diverge. (Spark's percentile()
# interpolates, DuckDB's quantile_disc has its own index convention —
# explicit window arithmetic is the only bit-safe common ground.)
# ---------------------------------------------------------------------------
_Q33_QS = ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))


def _q33_oracle() -> str:
    picks = ",\n           ".join(
        f"MAX(CASE WHEN rn = CAST(floor((n - 1) * {q}) AS BIGINT) + 1"
        f" THEN o_totalprice END) AS {alias}"
        for q, alias in _Q33_QS
    )
    return f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n,
           {picks}
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


@register(
    "q33_discrete_quantiles",
    oracle=_q33_oracle(),
    doc="exact discrete quantiles via explicit rank arithmetic (no builtins)",
    tags=("relational", "quantile", "window"),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = W.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    picks = [
        F.max(
            F.when(
                F.col("rn")
                == F.floor((F.col("n") - 1) * F.lit(q)).cast("long") + 1,
                F.col("o_totalprice"),
            )
        ).alias(alias)
        for q, alias in _Q33_QS
    ]
    return (
        ranked.groupBy("o_orderpriority")
        .agg(F.max("n").cast("bigint").alias("n"), *picks)
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q34 — analytic window battery: ntile / percent_rank / cume_dist / lead
# over a tie-free ordering (o_totalprice, o_orderkey). percent_rank and
# cume_dist are single IEEE divisions of exact integers, so both engines
# agree bitwise; the lead delta subtracts two stored doubles (exact).
# ---------------------------------------------------------------------------
@register(
    "q34_window_analytics",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           LEAD(o_totalprice) OVER w - o_totalprice AS next_gap
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc="window: ntile + percent_rank + cume_dist + lead gap, tie-free order",
    tags=("relational", "window"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            (F.lead("o_totalprice").over(w) - F.col("o_totalprice")).alias(
                "next_gap"
            ),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# q35 — explicit GROUPING SETS (finer than q26's ROLLUP / q31's CUBE: an
# arbitrary set list) with grouping_id distinguishing the aggregation
# levels, decimal-exact sums throughout.
# ---------------------------------------------------------------------------
@register(
    "q35_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderstatus), ())
    ORDER BY gid, priority, status
    """,
    doc="relational: GROUPING SETS with grouping_id + decimal-exact sums",
    tags=("relational", "agg", "grouping"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            # grouping() is only resolvable inside the grouping-sets
            # aggregate itself, not a downstream projection
            (
                F.grouping("o_orderpriority").cast("bigint") * 2
                + F.grouping("o_orderstatus").cast("bigint")
            ).alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "total",
        )
        .orderBy("gid", "priority", "status")
    )


# ---------------------------------------------------------------------------
# q36 — LATERAL VIEW / UNNEST: split a derived array per row, explode with
# position, and re-aggregate. The classic "one row per element" relational
# shape (DuckDB: UNNEST WITH ORDINALITY).
# ---------------------------------------------------------------------------
@register(
    "q36_lateral_explode",
    oracle="""
    WITH parts AS (
      SELECT o_orderkey, o_orderpriority,
             u.part AS word, u.pos - 1 AS pos
      FROM orders,
           LATERAL (SELECT unnest(string_split(o_orderpriority, '-')) AS part,
                           generate_subscripts(string_split(o_orderpriority, '-'), 1) AS pos) u
      WHERE o_orderkey < 2000)
    SELECT word, CAST(pos AS INT) AS pos, COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM parts
    GROUP BY word, pos
    ORDER BY word, pos
    """,
    doc="LATERAL VIEW posexplode over a split column, re-aggregated "
        "(UNNEST WITH ORDINALITY parity)",
    tags=("sql", "lateral", "explode"),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.filter(F.col("o_orderkey") < 2000).createOrReplaceTempView(
        "_q36_orders"
    )
    return spark.sql("""
        SELECT word, pos, COUNT(*) AS n,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key
        FROM _q36_orders
        LATERAL VIEW posexplode(split(o_orderpriority, '-')) AS pos, word
        GROUP BY word, pos
        ORDER BY word, pos
    """)


# ---------------------------------------------------------------------------
# q37 — WITH RECURSIVE (new in Spark 4): ancestry depth over an implicit
# binary-tree hierarchy (parent(k) = k/2) rooted at customer 1, joined back
# to customer balances. DuckDB replays the identical recursion.
# ---------------------------------------------------------------------------
@register(
    "q37_recursive_cte",
    oracle="""
    WITH RECURSIVE tree(c_custkey, depth) AS (
      SELECT CAST(1 AS BIGINT), 0
      UNION ALL
      SELECT c.c_custkey, t.depth + 1
      FROM customer c JOIN tree t ON c.c_custkey // 2 = t.c_custkey
      WHERE c.c_custkey BETWEEN 2 AND 255)
    SELECT t.depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS bal
    FROM tree t JOIN customer c ON c.c_custkey = t.c_custkey
    GROUP BY t.depth
    ORDER BY t.depth
    """,
    doc="recursive CTE: binary-tree ancestry depth rollup (Spark 4 "
        "WITH RECURSIVE)",
    tags=("sql", "recursive", "cte"),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_q37_customer"
    )
    return spark.sql("""
        WITH RECURSIVE tree(c_custkey, depth) AS (
          SELECT CAST(1 AS BIGINT), 0
          UNION ALL
          SELECT c.c_custkey, t.depth + 1
          FROM _q37_customer c JOIN tree t ON CAST(c.c_custkey / 2 AS BIGINT) = t.c_custkey
          WHERE c.c_custkey BETWEEN 2 AND 255
        )
        SELECT t.depth, COUNT(*) AS n_nodes,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS bal
        FROM tree t JOIN _q37_customer c ON c.c_custkey = t.c_custkey
        GROUP BY t.depth
        ORDER BY t.depth
    """)


# ---------------------------------------------------------------------------
# q38 — time-RANGE window frame: per-customer rolling 30-day order spend
# (RANGE BETWEEN uses the ORDER-BY VALUE, not row offsets — the frame an
# order belongs to depends on o_orderdate arithmetic, which rows-BETWEEN
# cannot express). Decimal accumulator for cross-engine exactness.
# ---------------------------------------------------------------------------
@register(
    "q38_range_frame_rolling",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderkey
    """,
    doc="RANGE BETWEEN INTERVAL window frame: rolling 30-day spend per "
        "customer (value-based frames vs row-based)",
    tags=("sql", "window", "range-frame"),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.filter(F.col("o_custkey") < 200).createOrReplaceTempView(
        "_q38_orders"
    )
    return spark.sql("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_30d
        FROM _q38_orders
        ORDER BY o_custkey, o_orderkey
    """)


# ---------------------------------------------------------------------------
# q39 — NOT IN vs NOT EXISTS under NULLs: the classic three-valued-logic
# trap. The subquery's key set deliberately CONTAINS a NULL (injected via
# CASE), so `NOT IN` must return zero rows for every probe (x <> NULL is
# UNKNOWN) while `NOT EXISTS` with an equality correlation ignores the
# NULL and returns the true anti-join. Both engines must agree on both
# counts — a correctness trap engines have historically botched.
# ---------------------------------------------------------------------------
@register(
    "q39_not_in_null_semantics",
    oracle="""
    WITH probe AS (
      SELECT c_custkey FROM customer WHERE c_custkey < 500),
    keys AS (
      SELECT CASE WHEN o_custkey % 50 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_custkey < 400)
    SELECT
      CAST((SELECT COUNT(*) FROM probe
            WHERE c_custkey NOT IN (SELECT k FROM keys)) AS BIGINT)
        AS n_not_in,
      CAST((SELECT COUNT(*) FROM probe p
            WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = p.c_custkey))
           AS BIGINT) AS n_not_exists,
      CAST((SELECT COUNT(*) FROM probe
            WHERE c_custkey IN (SELECT k FROM keys)) AS BIGINT) AS n_in
    """,
    doc="NOT IN / NOT EXISTS / IN under a NULL-bearing subquery key set "
        "(three-valued logic parity)",
    tags=("sql", "subquery", "null-semantics"),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_q39_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q39_orders")
    return spark.sql("""
        WITH probe AS (
          SELECT c_custkey FROM _q39_cust WHERE c_custkey < 500),
        keys AS (
          SELECT CASE WHEN o_custkey % 50 = 0 THEN NULL ELSE o_custkey END AS k
          FROM _q39_orders WHERE o_custkey < 400)
        SELECT
          CAST((SELECT COUNT(*) FROM probe
                WHERE c_custkey NOT IN (SELECT k FROM keys)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT COUNT(*) FROM probe p
                WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = p.c_custkey))
               AS BIGINT) AS n_not_exists,
          CAST((SELECT COUNT(*) FROM probe
                WHERE c_custkey IN (SELECT k FROM keys)) AS BIGINT) AS n_in
    """)
