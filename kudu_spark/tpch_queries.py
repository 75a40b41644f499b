"""TPC-H-adapted queries over the engine's scan surface.

Kudu's published benchmark IS TPC-H via an engine layered on top
(docs/whitepaper/kudu.tex:884-931 runs all 22 queries through Impala;
BASELINE.md). The reference implements none of these operators itself
— they exercise exactly the division of labor the engine is built
for: pushdown-friendly scans feeding Spark's joins/aggs/windows.
Queries are adapted to the driver's synthetic schema (no
partsupp/ps_supplycost, no l_shipmode/l_commitdate; lineitem's
(l_partkey, l_suppkey) stands in for partsupp) but keep each
original's plan shape: semi/anti joins, correlated aggregates,
scalar subqueries, HAVING, multi-way joins with small broadcast dims.

Scale notes (100 TB): only the bounded dimensions (region: 5 rows,
nation: 25 rows) are broadcast unconditionally. customer/supplier/part
grow with SF (15-20M rows at SF100), so their join strategy is left to
the planner — AQE + autoBroadcastJoinThreshold broadcast them while
they fit and shuffle them when they don't, which is the reference's
own precedent (java/kudu-spark/.../SparkSQLTest.scala:33 asserts Spark
*plans* BroadcastHashJoin rather than forcing it). All predicates are
plain column comparisons that reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from kudu_spark.operators import events as EV
from kudu_spark.queries import load, query


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


@query(
    "tpch_q4_order_priority",
    gated=False,  # r12 rotation: long-green since r1; TPC-H family stays
    # gated ×5 (q7/q12/q17/q18/q19); pytest runs the same oracle
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """Q4: EXISTS → left-semi join (l_commitdate/receiptdate absent;
    adapted to 'shipped after order date')."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    sel = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark, sf_dir):
    """Q7: 5-way join, year rollup. Plan: the nation pair is a
    disjunction ACROSS tables, so Catalyst cannot push it — but each
    side is independently bound to the two nations, so supplier and
    customer are pre-restricted to them (broadcast nation dims) before
    any fact join; lineitem drops to ~2/25 of its rows in its first
    join and only the cross-pair residual is filtered at the end."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    pair = ("NATION_3", "NATION_7")
    n1 = F.broadcast(n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    s2 = s.join(n1, F.col("s_nationkey") == F.col("s_nk")).select("s_suppkey", "supp_nation")
    c2 = c.join(n2, F.col("c_nationkey") == F.col("c_nk")).select("c_custkey", "cust_nation")
    j = (
        l.join(s2, l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c2, o.o_custkey == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@query(
    "tpch_q12_priority_lines",
    gated=False,  # r14 rotation: driver-green since r2; TPC-H family
    # keeps q7/q17/q18/q19 gated + q12 is a bench headline; pytest
    # runs the same oracle
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_lines(spark, sf_dir):
    """Q12: conditional aggregation over a join (l_shipmode absent;
    grouped by returnflag)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    gated=False,  # r10 rotation: long-green; join family stays gated via q12/q17-19
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14: promo revenue share; part dim broadcast."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-06-01")) & (F.col("l_shipdate") < _ts("1997-07-01"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    gated=False,  # r11 rotation: long-green; six TPC-H entries stay gated
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: view + scalar-subquery max (rounded before the compare so
    both engines agree bit-exactly)."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("m"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), revenue.total_revenue == mx.m)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_cnt",
    gated=False,  # per-group distinct-count family gated via agg_distinct_counts
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO' AND p_size IN (1, 14, 23, 45)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """Q16: distinct-count suppliers per part group (lineitem's
    (partkey, suppkey) stands in for partsupp)."""
    p = load(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 14, 23, 45)
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """Q17: correlated aggregate subquery, decorrelated as a window.

    Plan: join lineitem to the brand-filtered parts FIRST (cuts the
    fact to ~1/|brands| of its rows — the correlated average only ever
    needs partkeys of that brand, and a partkey's lineitems are exactly
    the joined rows), then one window avg per partkey replaces the
    full-table aggregate + second join of the naive decorrelation."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cut = (0.2 * F.avg("l_quantity").over(W.partitionBy("l_partkey"))).alias("qty_cut")
    return (
        j.select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("qty_cut", cut)
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 300
    """,
)
def tpch_q18_large_volume(spark, sf_dir):
    """Q18: HAVING over a 3-way join.

    Plan: aggregate lineitem by order key and apply the HAVING cut
    BEFORE the joins — exact because every lineitem of an order joins
    the same single orders/customer row (o_orderkey is in the group
    key, the other group columns are functionally dependent on it).
    The joins then carry the handful of qualifying orders instead of
    the full fact table; an aggregation pushdown Catalyst does not do
    on its own."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    qualifying = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .where(F.col("__sq") > 300)
    )
    return (
        qualifying.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round(F.col("__sq"), 2).alias("sum_qty"),
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark, sf_dir):
    """Q19: disjunctive multi-column predicates across the join."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "tpch_q22_global_sales",
    gated=False,  # anti-join + scalar-subquery families gated via
    # join_anti_orders_without_lineitems and tpch_q15_top_supplier
    oracle="""
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def tpch_q22_global_sales(spark, sf_dir):
    """Q22: scalar subquery + anti join (phone cntrycode absent;
    grouped by nationkey)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    gated=False,  # scalar-correlated-min family gated via tpch_q15_top_supplier
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice) AS ps_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_cost
    FROM part
      JOIN supply   ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND ps_cost = (SELECT min(ps_cost) FROM supply s2
                       JOIN supplier ON s_suppkey = s2.ps_suppkey
                       JOIN nation   ON s_nationkey = n_nationkey
                       JOIN region   ON n_regionkey = r_regionkey
                     WHERE s2.ps_partkey = p_partkey AND r_name = 'EUROPE')
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2: min-cost supplier per part within a region. partsupp is
    absent from the driver schema, so the supply relation is derived
    as min(l_extendedprice) per (l_partkey, l_suppkey) — min of raw
    doubles, no arithmetic, so both engines agree bit-exactly. The
    correlated min subquery decorrelates to a window min over the
    already-region-restricted supply rows (same trick as Q17: the
    correlated min only ever ranges over rows the outer join kept)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supply = l.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min("l_extendedprice").alias("ps_cost"))
    eu_supp = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_acctbal", "s_name", "n_name")
    j = (
        supply.join(p, F.col("ps_partkey") == p.p_partkey)
        .join(eu_supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    min_cost = F.min("ps_cost").over(W.partitionBy("ps_partkey"))
    return (
        j.withColumn("__min", min_cost)
        .where(F.col("ps_cost") == F.col("__min"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_cost")
    )


@query(
    "tpch_q8_market_share",
    gated=False,  # multi-way join + conditional-agg family gated via tpch_q7/tpch_q14
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8: national market share — 8-way join, share-of-total per
    year. Plan: part is filtered before the fact join (biggest
    selectivity), nation/region broadcast unconditionally, customer
    restricted to the region before joining orders."""
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1995-01-01"), _ts("1996-12-31"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nk = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("c_nk")
        )
    )
    c2 = c.join(asia_nk, c.c_nationkey == F.col("c_nk")).select("c_custkey")
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    j = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c2, o.o_custkey == F.col("c_custkey"))
        .join(n2, s.s_nationkey == F.col("s_nk"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_profit",
    gated=False,  # join+year-rollup family gated via tpch_q7_nation_volume
    oracle="""
    SELECT n_name AS nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity
                  AS DECIMAL(18,4)) AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9: product-type profit by supplier nation and year.
    ps_supplycost is absent; the cost term is modeled as 10% of
    p_retailprice per unit, preserving the plan shape (LIKE-filtered
    part driving a 5-way join, two-level group). amount subtracts two
    same-magnitude terms, so float summation order shifts the total
    past the round(2) boundary between engines — both sides sum in
    DECIMAL(18,4) for an order-independent exact total."""
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    j = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    gated=False,  # HAVING-vs-scalar-subquery family gated via tpch_q18/tpch_q15
    oracle="""
    WITH nation_supply AS (
      SELECT l_partkey AS ps_partkey,
             CAST(l_extendedprice * l_quantity AS DECIMAL(18,4)) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    SELECT ps_partkey, CAST(round(sum(value), 2) AS DOUBLE) AS part_value
    FROM nation_supply
    GROUP BY ps_partkey
    HAVING sum(value) > (SELECT sum(value) * 0.001 FROM nation_supply)
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11: parts representing a significant share of one nation's
    supply value (availqty*supplycost modeled as extendedprice*qty).
    The scalar-subquery threshold is a 1-row broadcast join. Sums run
    in DECIMAL(18,4) (as Q9 does) so the HAVING threshold compare is
    order-independent — double summation order differs between Spark
    and DuckDB, and a part within accumulation error of the 0.1% cut
    could flip in/out of the result."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3"))
    supply = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (F.col("l_extendedprice") * F.col("l_quantity"))
            .cast("decimal(18,4)").alias("value"),
        )
    )
    per_part = supply.groupBy("ps_partkey").agg(F.sum("value").alias("__v"))
    threshold = supply.agg((F.sum("value") * F.lit("0.001").cast("decimal(5,4)"))
                           .alias("__cut"))
    return (
        per_part.join(F.broadcast(threshold))
        .where(F.col("__v") > F.col("__cut"))
        .select("ps_partkey",
                F.round(F.col("__v"), 2).cast("double").alias("part_value"))
    )


@query(
    "tpch_q13_customer_distribution",
    gated=False,  # outer-join family; distribution agg over agg
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """Q13: customer order-count distribution — LEFT OUTER join with a
    join-side filter (the o_comment NOT LIKE predicate adapted to
    o_orderstatus <> 'P'), then an aggregate over an aggregate.
    count(o_orderkey) counts only matched rows, so customers with no
    qualifying orders land in the c_count=0 bucket."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q20_excess_suppliers",
    gated=False,  # nested-semi-join family gated via tpch_q4/join_semi_bloom
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_suppkey, l_partkey, sum(l_quantity) AS shipped
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey
        ) sp
        WHERE shipped > (SELECT 0.5 * avg(shipped) FROM (
          SELECT sum(l_quantity) AS shipped
          FROM lineitem
          WHERE l_partkey = sp.l_partkey
            AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey
        ) per_supp)
      )
    """,
)
def tpch_q20_excess_suppliers(spark, sf_dir):
    """Q20: suppliers who moved an outsized share of a part family
    (availqty > half the shipped qty adapted to shipped > half the
    per-part average, partsupp being absent). The correlated average
    decorrelates to a window over the (suppkey, partkey) rollup —
    same rows, one pass, no second scan of lineitem."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7"))
    sp = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("shipped"))
    )
    cut = (0.5 * F.avg("shipped").over(W.partitionBy("l_partkey"))).alias("__cut")
    excess = (
        sp.withColumn("__cut", cut)
        .where(F.col("shipped") > F.col("__cut"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "tpch_q21_waiting_suppliers",
    gated=False,  # exists/not-exists family gated via tpch_q4 + anti-join query
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """Q21: suppliers who alone held up a multi-supplier order
    (lateness adapted to shipdate > orderdate + 90 days; the original's
    receipt/commit dates are absent). The EXISTS / NOT EXISTS pair is
    decorrelated into one per-order aggregate: an order counts for
    supplier s iff its late-supplier set is exactly {s} and it has
    ≥2 distinct suppliers — one shuffle on l_orderkey instead of two
    correlated re-scans of lineitem."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    per_order = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("__late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__nsupp"),
            F.countDistinct(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__nlate"),
            F.max(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__late_supp"),
            # the oracle's count(*) counts qualifying l1 ROWS — a
            # supplier late on two lines of one order counts twice
            F.sum(F.when(F.col("__late"), 1).otherwise(0)).alias("__late_lines"),
        )
        .where((F.col("__nlate") == 1) & (F.col("__nsupp") > 1))
    )
    return (
        per_order.join(s, F.col("__late_supp") == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("__late_lines").alias("numwait"))
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(quantile_cont(l_quantity, 0.99), 4) AS p99_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    gated=False,  # r10 rotation: long-green; agg family stays gated via pricing/rollup
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (both engines implement the
    same continuous-quantile definition, so values hash-match)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
        F.round(F.expr("percentile(l_quantity, 0.99)"), 4).alias("p99_qty"),
    )


@query(
    "scan_json_props",
    gated=False,  # r13 rotation: driver-green many rounds; stays pytest-oracled
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def scan_json_props(spark, sf_dir):
    """Semi-structured JSON column extraction (get_json_object) +
    aggregation — the events-table property-bag pattern."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "join_asof_purchase",
    gated=True,  # r13 rotation IN: the as-of join (custom temporal
    # operator Spark lacks) was never driver-verified
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), p0 AS (
      SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ), p AS (
      SELECT * FROM p0
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY purchase_id DESC) = 1
    )
    SELECT c.event_id, c.user_id, c.ts, p.ts AS asof_ts, p.purchase_id, p.purchase_value
    FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof_purchase(spark, sf_dir):
    """As-of join: each click matched to the user's most recent
    purchase at-or-before it (operators.temporal.asof_join — the
    union + window carry-forward sort-merge; DuckDB's native ASOF
    JOIN is the oracle)."""
    from kudu_spark.operators.temporal import asof_join

    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"), F.col("value").alias("purchase_value"),
    )
    return asof_join(clicks, purchases, on="user_id")


@query(
    "join_range_open_windows",
    gated=False,  # join family gated via join_*; pytest runs the oracle
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), iv AS (
      SELECT user_id, ts AS iv_start, ts + INTERVAL 2 HOUR AS iv_end
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT c.event_id, count(*) AS n
      FROM clicks c JOIN iv ON c.user_id = iv.user_id
        AND iv.iv_start <= c.ts AND c.ts < iv.iv_end
      GROUP BY 1
    )
    SELECT c.event_id, coalesce(m.n, 0) AS n_open
    FROM clicks c LEFT JOIN m USING (event_id)
    """,
)
def join_range_open_windows(spark, sf_dir):
    """Point-in-interval range join: how many of the user's 2-hour
    post-purchase windows each click falls inside
    (operators.temporal.range_point_interval_join — interval
    bucketization turns the inequality into an equi-join; the oracle
    is the plain theta join, viable only at oracle scale)."""
    from kudu_spark.operators.temporal import range_point_interval_join

    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    iv = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("iv_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("iv_end"),
    )
    hits = range_point_interval_join(
        clicks, iv, on="user_id", point_ts="ts",
        start_ts="iv_start", end_ts="iv_end", bucket="1 hour",
    )
    counts = hits.groupBy("event_id").agg(F.count(F.lit(1)).alias("__n"))
    return clicks.select("event_id").join(counts, "event_id", "left_outer").select(
        "event_id", F.coalesce(F.col("__n"), F.lit(0).cast("bigint")).alias("n_open")
    )


@query(
    "join_salted_volume",
    gated=False,  # skew-handling variant of the gated join family
    oracle="""
    SELECT o_orderstatus, round(sum(l_extendedprice), 2) AS volume,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_salted_volume(spark, sf_dir):
    """Skew-salted equi-join (operators.skew.salted_join): lineitem
    joined to orders with the key salted 16 ways — the manual remedy
    for a hot key AQE's sort-merge skew split can't reach. Result must
    be row-identical to the plain join."""
    from kudu_spark.operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    j = salted_join(
        l.select(F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"),
        o, on="o_orderkey", salt=16,
    )
    return j.groupBy("o_orderstatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("volume"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "window_session_events",
    gated=False,  # r12 rotation: long-green since r2; window family stays
    # gated via tumbling + funnel/retention; pytest runs the same oracle
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_session_events(spark, sf_dir):
    """Session windows (30-min gap) per user via F.session_window —
    the batch shape of the streaming sessionization operator
    (SURVEY §2.9; oracle is the classic gaps-and-islands rewrite)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "window_tumbling_events",
    gated=False,  # r14 rotation: driver-green since r1; window family
    # keeps funnel/retention + the new events_sequence_match gated;
    # pytest runs the same oracle
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def window_tumbling_events(spark, sf_dir):
    """Tumbling 1-hour event-time window aggregation (F.window) — the
    batch shape of the Structured Streaming windowed agg (SURVEY §2.9;
    streaming watermark variant in kudu_spark.streaming)."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "window_funnel_conversion",
    oracle=EV.window_funnel_sql(),
    gated=True,  # rotated into the driver gate for r11 verification
)
def window_funnel_conversion(spark, sf_dir):
    """Ordered funnel (signup -> view -> click -> purchase) counted
    per user with strict time ordering — ClickHouse windowFunnel
    re-expressed as one user-keyed shuffle + a codegen array fold
    (operators/events.py window_funnel; the oracle is the classic
    chained min-ts CTE formulation, provably the same greedy walk)."""
    return EV.window_funnel(load(spark, sf_dir, "events"))


@query(
    "window_retention_cohorts",
    oracle=EV.RETENTION_COHORTS_SQL,
    gated=True,  # rotated into the driver gate for r11 verification
)
def window_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention triangle over the events table
    (operators/events.py retention_cohorts): cohort by week of first
    activity, distinct active users per week offset."""
    return EV.retention_cohorts(load(spark, sf_dir, "events"))


@query(
    "window_funnel_within",
    oracle=EV.window_funnel_any_sql(within="2 DAY"),
    gated=True,  # r12 rotation: upgraded to full any-anchor semantics
)
def window_funnel_within(spark, sf_dir):
    """Conversion-window funnel with FULL ClickHouse
    windowFunnel(window, strict_increase) semantics (VERDICT r11 next
    #3): every signup is a candidate anchor, each chain is bounded to
    2 days of ITS anchor, and a user scores the deepest chain over
    all anchors — catching conversions only a later anchor satisfies,
    which first-touch attribution misses. One user-keyed shuffle +
    a nested codegen fold (operators/events.py _funnel_level_any);
    the oracle unrolls the per-anchor min-ts chain as CTEs."""
    return EV.window_funnel(load(spark, sf_dir, "events"), within="2 DAY",
                            anchor="any")


_SEQ_PATTERN = ["signup", ("view", "12 HOUR"), ("click", "12 HOUR"),
                ("purchase", "2 DAY")]


@query(
    "events_sequence_match",
    oracle=EV.sequence_match_sql(_SEQ_PATTERN),
    gated=True,  # rotated INTO the r14 gate (VERDICT r13 #2) alongside
    # the funnel family — the r13 fold operator gets driver rows
)
def events_sequence_match(spark, sf_dir):
    """ClickHouse sequenceMatch (max-gap subset) per user: does some
    strictly-increasing placement of signup -> view (<=12h) ->
    click (<=12h) -> purchase (<=2d) exist, and how deep does the
    longest satisfiable prefix go? One user-keyed shuffle + a
    single-pass latest-completion fold (operators/events.py
    sequence_match — dominance argument in the docstring makes
    backtracking unnecessary for max-gap patterns); the oracle is the
    existential m-way self-join ground truth."""
    return EV.sequence_match(load(spark, sf_dir, "events"), _SEQ_PATTERN)


_CNT_PATTERN = ["view", ("click", "12 HOUR"), ("purchase", "2 DAY")]


@query(
    "events_sequence_count",
    oracle=EV.sequence_count_sql(_CNT_PATTERN),
    gated=False,  # gate capped at 50; pytest runs the oracle —
    # events_sequence_match is the family's driver-gated
    # representative (VERDICT r13 #3 asked for this registry entry)
)
def events_sequence_count(spark, sf_dir):
    """ClickHouse sequenceCount (max-gap subset) per user: how many
    NON-OVERLAPPING view -> click (<=12h) -> purchase (<=2d) chains,
    counted left-to-right with a restart after each completion. One
    user-keyed shuffle + the sequence_match DP plus a reset
    (operators/events.py sequence_count); the oracle is the
    leftmost-completion + restart recursion as a recursive CTE."""
    return EV.sequence_count(load(spark, sf_dir, "events"), _CNT_PATTERN)


# refractory-period shape: a purchase must NOT follow its click
# immediately (bot/accidental-double-tap exclusion) — the min-gap
# operator families r14 added for full ClickHouse (?t OP N) parity
_MINGAP_PATTERN = ["signup", ("view", ">= 30 MINUTE"),
                   ("purchase", "> 1 HOUR")]


@query(
    "events_sequence_match_mingap",
    oracle=EV.sequence_match_sql(_MINGAP_PATTERN),
    gated=False,  # gate capped at 50; pytest runs the oracle —
    # events_sequence_match is the family's driver-gated entry
)
def events_sequence_match_mingap(spark, sf_dir):
    """sequenceMatch with LOWER gap bounds: signup -> view (>=30min
    later) -> purchase (>1h after the view). Runs in the same codegen
    fold as the max-gap subset via the dual dominance argument — a
    lower bound reads the EARLIEST strictly-earlier prefix completion
    (set-once e/q slots), an upper bound the latest (operators/
    events.py _gap_cond); the oracle is the existential self-join with
    the same operator strictness."""
    return EV.sequence_match(load(spark, sf_dir, "events"), _MINGAP_PATTERN)


# dwell-window shape: a click counts only inside (15min, 12h] of its
# view — both bounds on one step, the case no constant-width fold
# state can answer (interval query over the completion SET)
_WINDOW_PATTERN = ["view", ("click", "> 15 MINUTE", "<= 12 HOUR"),
                   ("purchase", "<= 2 DAY")]


@query(
    "events_sequence_match_window",
    oracle=EV.sequence_match_sql(_WINDOW_PATTERN),
    gated=False,
)
def events_sequence_match_window(spark, sf_dir):
    """sequenceMatch with a BOTH-SIDED gap window: view -> click
    within (15min, 12h] -> purchase within 2d. The both-sided step
    routes to the exact level DP (operators/events.py _sequence_dp):
    per user, prefix completions form a ts-sorted array and each
    candidate's feasible window is two np.searchsorted calls —
    Arrow-batched applyInPandas, vectorized numpy inside, pinned
    against exhaustive placement search in pytest; the oracle is the
    same existential self-join."""
    return EV.sequence_match(load(spark, sf_dir, "events"), _WINDOW_PATTERN)


@query(
    "events_sessionize",
    oracle=EV.session_stats_sql("30 MINUTE"),
    gated=False,
)
def events_sessionize(spark, sf_dir):
    """Inactivity-gap sessionization (30-min gap — the batch twin of
    Spark's streaming session_window) + per-session stats: events,
    distinct types, start, duration. ONE user-keyed shuffle: lag and
    the running session counter share a single Window sort, and the
    (user, session_no) aggregate reuses the partitioning with map-side
    partials (operators/events.py sessionize)."""
    s = EV.sessionize(load(spark, sf_dir, "events"), gap="30 MINUTE")
    return s.groupBy("user_id", F.col("session_no").cast("int")
                     .alias("session_no")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min("ts").alias("session_start"),
        (F.unix_timestamp(F.max("ts"))
         - F.unix_timestamp(F.min("ts"))).alias("duration_sec"),
    )


@query(
    "window_funnel_strict_order",
    oracle=EV.window_funnel_strict_sql(EV.DEFAULT_FUNNEL, "strict_order",
                                       within="2 DAY"),
    gated=False,
)
def window_funnel_strict_order(spark, sf_dir):
    """windowFunnel(strict_order): once a user's chain starts, ANY
    non-advancing event — including non-funnel types like 'error' —
    freezes their level (the ClickHouse A->B->D->C example). Same
    one-shuffle codegen fold with a sticky stop flag; the oracle
    simulates the identical walk as a recursive CTE (chained-min-ts
    CTEs cannot express interruption)."""
    return EV.window_funnel(load(spark, sf_dir, "events"), within="2 DAY",
                            mode="strict_order")


@query(
    "window_funnel_strict_dedup",
    oracle=EV.window_funnel_strict_sql(EV.DEFAULT_FUNNEL, "strict_dedup"),
    gated=False,
)
def window_funnel_strict_dedup(spark, sf_dir):
    """windowFunnel(strict_dedup): an event re-matching an
    already-matched funnel step (a second signup mid-chain) freezes
    the level. Recursive-CTE walk oracle, like strict_order."""
    return EV.window_funnel(load(spark, sf_dir, "events"),
                            mode="strict_dedup")


# week-over-week comeback conditions: qualify in week 1, return in
# each later week — arbitrary boolean conditions, the ClickHouse
# retention() shape (retention_cohorts' fixed week grid can't mix
# predicates like event_type into the qualifier)
_RETENTION_CONDS = [
    "event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00'",
    "ts >= TIMESTAMP '2024-01-08 00:00:00' AND "
    "ts < TIMESTAMP '2024-01-15 00:00:00'",
    "ts >= TIMESTAMP '2024-01-15 00:00:00' AND "
    "ts < TIMESTAMP '2024-01-22 00:00:00'",
    "event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-22 00:00:00'",
]


@query(
    "events_retention_conditions",
    oracle=EV.retention_conditions_sql(_RETENTION_CONDS),
    gated=False,
)
def events_retention_conditions(spark, sf_dir):
    """ClickHouse retention(cond1..condN): cond 1 qualifies a user
    (signed up in week 1), each later condition counts only qualified
    users (active week 2, active week 3, purchased after). ONE
    map-side-combined user aggregation — N conditions are N counters
    per group, not N passes (operators/events.py
    retention_conditions)."""
    return EV.retention_conditions(load(spark, sf_dir, "events"),
                                   _RETENTION_CONDS)
