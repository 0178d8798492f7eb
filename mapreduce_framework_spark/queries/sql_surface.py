"""SQL entry point: the same ANSI SQL string runs on Spark AND DuckDB.

The reference's only job-submission surface is an HTTP query string
naming a container and task counts (requesthandler.h:160-202); the
Spark-native generalization of "submit a query by text" is
``spark.sql`` over registered views.  These queries prove the SQL
surface end-to-end with the strongest possible oracle: the ORACLE IS
THE QUERY — one dialect-shared string executed verbatim by both
engines, so any engine-side semantic drift (types, null ordering,
decimal widening) fails the hash.

Catalyst treats a ``spark.sql`` plan identically to the DataFrame API —
same optimization, same physical strategies — so everything in SCALE.md
applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


def _views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


# TPC-H Q3 shape (segment-filtered revenue per order).
_Q3 = """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
GROUP BY o_orderkey, o_orderdate
""".strip()


@register("sql_q3_shape", oracle=_Q3, tags=("sql", "join"))
def sql_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape submitted as SQL text — the oracle runs the very
    same string."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3)


# TPC-H Q5 shape (revenue by nation through a 5-way join).
_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""".strip()


@register("sql_q5_shape", oracle=_Q5, tags=("sql", "join"), bench=True)
def sql_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: customer–orders–lineitem–nation–region chain by
    SQL text; Catalyst broadcast-joins the bounded dims exactly as the
    DataFrame variant (join_multiway) does."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "nation", "region"))
    return spark.sql(_Q5)


# Correlated EXISTS + uncorrelated IN subqueries — Catalyst rewrites
# these to semi-joins; the same text runs on both engines.
_SUBQ = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 200000
      )
  AND c_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 2
      )
""".strip()


@register("sql_exists_subquery", oracle=_SUBQ, tags=("sql", "subquery"))
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS and IN subqueries by SQL text.  Catalyst
    decorrelates both into left-semi joins (no per-row subquery
    execution) — the declarative twin of join_semi."""
    _views(spark, sf_dir, ("customer", "orders", "nation"))
    return spark.sql(_SUBQ)


# Scalar subqueries: correlated aggregates in SELECT + an uncorrelated
# one in WHERE.  The avg threshold goes through DECIMAL so both engines
# compute the identical cutoff (double summation is fold-order-
# dependent; see functions/numeric.py).
_SCALAR_SUBQ = """
SELECT c_custkey,
       c_acctbal,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
       (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
         AS max_price
FROM customer
WHERE c_acctbal >
      (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
       FROM customer)
""".strip()


@register("sql_scalar_subquery", oracle=_SCALAR_SUBQ, tags=("sql", "subquery"))
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subqueries in the SELECT list plus an
    uncorrelated scalar threshold in WHERE.  Catalyst decorrelates the
    SELECT-list subqueries into ONE aggregate per subquery joined back
    (left outer on the correlation key) and evaluates the uncorrelated
    threshold once as a reusable subquery result — no per-row execution
    anywhere, so the plan scales like two joins, not like N queries."""
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SCALAR_SUBQ)


# TPC-H Q18 shape (large-volume orders): grouped-HAVING subquery feeding
# an IN filter over a 3-way join.
_Q18 = """
SELECT c_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
      )
GROUP BY c_custkey, o_orderkey, o_orderdate
""".strip()


@register("sql_q18_shape", oracle=_Q18, tags=("sql", "join", "subquery"), bench=True)
def sql_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape by SQL text: an aggregated-HAVING IN-subquery
    (orders whose total quantity exceeds a threshold) filtering a
    customer–orders–lineitem join.  Catalyst plans the subquery as an
    aggregate + left-semi join — no per-row subquery execution — and
    AQE picks broadcast for the (highly selective) semi side at runtime;
    the quantity sums go through DECIMAL for order-insensitive totals."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q18)


# TPC-H Q7 shape (volume shipping between two nations by year).
_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
      OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
""".strip()


@register("sql_q7_shape", oracle=_Q7, tags=("sql", "join"))
def sql_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (bidirectional two-nation trade volume by ship
    year) submitted as SQL text — exercises the nation dimension joined
    TWICE under aliases with a disjunctive cross-filter, the pattern
    that forces an optimizer to keep both broadcast copies distinct.
    Decimal-summed, double-emitted like the other q* shapes; the
    oracle runs the identical string."""
    _views(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    return spark.sql(_Q7)


# TPC-H Q1 shape (pricing summary report: the canonical wide-aggregate
# single-table scan).  Decimal-cast sums make every aggregate order-
# insensitive; averages divide the exact decimal sum by the group count
# (one double division on identical operands in both engines).
_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip()


@register("sql_q1_shape", oracle=_Q1, tags=("sql", "agg"), bench=True)
def sql_q1_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the pricing-summary wide aggregate, submitted
    as one dialect-shared SQL string (the oracle IS the query).  Eight
    aggregates over one filtered scan; Catalyst compiles it to a single
    partial+final HashAggregate pair, so at 100 TB the exchange moves
    |flags|x|statuses| rows per partition — the textbook map-side-
    combine query and the reason Q1 is the standard scan-throughput
    benchmark."""
    _views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q1)


# TPC-H Q10 shape (returned-item revenue report: top-20 customers by
# revenue lost to returns in one quarter).
_Q10 = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""".strip()


@register("sql_q10_shape", oracle=_Q10, tags=("sql", "join", "limit"))
def sql_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customer-orders-lineitem-nation join filtered
    to one quarter's returns, grouped per customer, top-20 by revenue
    (tie-broken by key, so the row SET is deterministic and the final
    cut is TakeOrderedAndProject, not a global sort).  The join tree is
    the selective-fact pattern: the date filter prunes orders before
    the lineitem join, nation broadcasts, and AQE picks broadcast for
    the pruned orders side at real scale — all free because the plan
    is declarative SQL."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_Q10)


# TPC-H Q14 shape (promotion revenue share in one month).  One double
# division at the end over two decimal-exact sums.
_Q14 = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS promo_revenue_share,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""".strip()


@register("sql_q14_shape", oracle=_Q14, tags=("sql", "join", "agg"))
def sql_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — one month's promotion revenue share: a
    date-pruned fact scan joined to the part dimension, a conditional
    decimal aggregate pair, one final double division.  The dimension
    broadcasts; the date filter reaches the lineitem scan as a pushed
    predicate, so the join probes only the month's rows — the
    conditional-aggregate-over-selective-join pattern every marketing/
    mix report reuses."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q14)


# TPC-H Q19 shape (disjunctive brand/size/quantity predicate blocks —
# the OR-of-conjunctions pushdown stress test), adapted to this
# schema's columns (no p_container/l_shipmode in the testdata).
_Q19 = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1  AND l_quantity <= 11)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""".strip()


@register("sql_q19_shape", oracle=_Q19, tags=("sql", "join", "filter"))
def sql_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — three OR'd conjunctive predicate blocks across
    both join sides, the classic optimizer stress test: Catalyst must
    (a) keep the disjunction from blocking the equi-join extraction,
    (b) derive the common single-side conjuncts (brand/size on part,
    quantity on lineitem) and push them below the join as residual
    filters.  The whole filter evaluates codegen-side; result is one
    (revenue, count) row, decimal-exact."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q19)


# TPC-H Q17 shape (small-quantity-order revenue — the correlated
# per-group AVG scalar subquery, THE decorrelation classic), adapted to
# this schema (p_size stands in for the absent p_container; the /7.0
# "yearly" divisor kept from the original).  Determinism: l_quantity is
# integer-valued, so avg() is an exact-int division in both engines;
# the revenue SUM runs on DECIMAL(18,4).
_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND p_size < 15
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
""".strip()


@register("sql_q17_shape", oracle=_Q17, tags=("sql", "subquery", "agg"))
def sql_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — a correlated scalar subquery computing a
    PER-GROUP aggregate (0.2·avg quantity of the same part), the
    canonical decorrelation stress test: a naive engine re-runs the
    inner aggregate per outer row (O(n²) over the fact); Catalyst must
    rewrite it to ONE per-part aggregate joined back on l_partkey.
    tests/test_plans.py::test_q17_decorrelates_to_aggregate_join pins
    exactly that: an Aggregate over lineitem grouped by l_partkey in
    the plan, no scalar-subquery node surviving.  At 100 TB the
    decorrelated form is two co-partitioned passes over the fact —
    the subquery form would be a disaster the pin makes impossible."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17)


# TPC-H Q21 shape (suppliers who kept orders waiting — stacked EXISTS +
# NOT EXISTS over self-joins of the fact), adapted to this schema:
# "late" is l_returnflag = 'R' (no l_receiptdate/l_commitdate in the
# testdata), i.e. the one supplier whose items came back on a finished
# multi-supplier order.  NATION_3 picked to keep the result non-empty
# at sf0.001.
_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_3'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
""".strip()


@register("sql_q21_shape", oracle=_Q21, tags=("sql", "subquery", "join"))
def sql_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the OTHER decorrelation classic: an EXISTS and
    a NOT EXISTS, both correlated self-joins of the fact table, stacked
    on one outer fact scan.  Catalyst must turn the pair into a
    LeftSemi and a LeftAnti join on l_orderkey (pinned by
    tests/test_plans.py::test_q21_exists_stack_becomes_semi_anti) — the
    per-row form would re-scan lineitem twice per outer row.  At scale
    all three lineitem legs shuffle on the same l_orderkey key, so AQE
    can co-plan them; the supplier/nation dimensions broadcast."""
    _views(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(_Q21)


# TPC-H Q4 shape (order-priority checking — the EXISTS-into-semi-join
# classic on a date-pruned fact slice), adapted: "late line item" is
# l_shipdate > o_orderdate (no l_commitdate/l_receiptdate in the
# testdata).
_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""".strip()


@register("sql_q4_shape", oracle=_Q4, tags=("sql", "subquery", "agg"))
def sql_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — a correlated EXISTS whose predicate references
    BOTH sides (l_shipdate > o_orderdate): the semi-join must carry the
    cross-side comparison as its join condition, and the quarter filter
    must prune the orders scan before the join probes lineitem.  With
    Q17 (correlated scalar AVG), Q18 (IN over a grouped HAVING), Q21
    (EXISTS + NOT EXISTS stack), Q22 (NOT EXISTS + uncorrelated scalar)
    and the two plain subquery keys, the subquery-decorrelation surface
    now covers every TPC-H subquery class."""
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q4)


# TPC-H Q22 shape (global sales opportunity — anti-join against orders
# plus an uncorrelated scalar threshold), adapted: c_nationkey stands
# in for the phone country code, and the anti-join target is "no
# order above 300k" (nearly every customer in this data has SOME
# order, which would leave the classic no-orders predicate a
# near-empty fixture).  The threshold average is computed as
# an EXACT decimal sum cast to double ONCE, then one IEEE divide —
# avg() over raw doubles is partition-order-dependent, and a last-ulp
# threshold wiggle flips boundary customers between engines.
_Q22 = """
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c.c_custkey AND o_totalprice > 300000.0
  )
GROUP BY c_nationkey
""".strip()


@register("sql_q22_shape", oracle=_Q22, tags=("sql", "subquery", "agg"))
def sql_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — the customers-without-orders anti-join gated
    by an uncorrelated scalar subquery threshold: the NOT EXISTS must
    become a LeftAnti join on o_custkey, and the scalar average
    evaluates ONCE (a broadcast one-row subquery), never per row.
    Exactness note in _Q22: the threshold is decimal-exact before its
    single double divide, so the boundary set is engine-stable."""
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q22)


# ---------------------------------------------------------------------------
# Round 9 completion: the remaining ten TPC-H query shapes.  The testdata has
# no partsupp table and no l_shipmode/l_commitdate/l_receiptdate columns, so
# the partsupp-based queries (Q2/Q9/Q11/Q16/Q20) treat LINEITEM as the
# part-supplier supply relation (each (l_partkey, l_suppkey) pair is a supply
# fact) and Q12's ship modes become l_returnflag — every adapted query keeps
# the ORIGINAL's plan-shape stress (the correlated MIN of Q2, the nested
# half-average of Q20, the HAVING-vs-global-scalar of Q11, ...), which is
# what the engine is being graded on.  With these ten, all 22 TPC-H shapes
# are dialect-shared strings run verbatim by Spark and DuckDB.
# ---------------------------------------------------------------------------

# TPC-H Q2 shape (minimum-cost supplier): a correlated scalar MIN subquery
# that repeats the OUTER query's own join tree inside the correlation.
# Equality on l_extendedprice is exact: both engines compare the same stored
# double against a MIN over the same stored doubles (no arithmetic).
_Q2 = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       l_extendedprice AS supply_price
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND p_size < 10
  AND l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
""".strip()


@register("sql_q2_shape", oracle=_Q2, tags=("sql", "subquery", "join"))
def sql_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated scalar MIN whose subquery repeats
    the outer join tree.  Catalyst must decorrelate it to ONE
    min(l_extendedprice) aggregate grouped by l_partkey over the
    region-filtered supply join, joined back on (partkey, price) —
    never a per-part re-execution of the inner 4-way join (pinned by
    tests/test_plans.py::test_q2_correlated_min_decorrelates).  At
    100 TB both legs shuffle on l_partkey and the three dimension
    tables broadcast into each leg, so the whole query is two
    co-partitioned passes over the supply fact."""
    _views(spark, sf_dir, ("part", "lineitem", "supplier", "nation", "region"))
    return spark.sql(_Q2)


# TPC-H Q6 shape (forecast revenue change): the pure scan-side query — one
# fact, three range predicates, one aggregate, NO join and NO group-by.
_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""".strip()


@register("sql_q6_shape", oracle=_Q6, tags=("sql", "agg", "filter"))
def sql_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the canonical predicate-pushdown measuring
    stick: every one of the four range predicates must reach the
    parquet scan as a PushedFilter and the ReadSchema must carry only
    the four referenced columns; the aggregate itself is a one-row
    partial/final pair with no shuffle wider than 1.  At 100 TB this
    query IS its scan — row-group statistics prune on l_shipdate, so
    the decisive factor is how little of the fact gets read."""
    _views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q6)


# TPC-H Q8 shape (national market share): the deepest join tree in TPC-H —
# eight relations with nation joined TWICE under different roles — feeding a
# conditional-share aggregate.  Both SUMs run on DECIMAL(18,4) and are cast
# to double before the ONE division per group, so the share is engine-exact.
_Q8 = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume_dec
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(volume_dec) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume_dec,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA' AND p_type = (SELECT MIN(p_type) FROM part)
) all_nations
GROUP BY o_year
""".strip()


@register("sql_q8_shape", oracle=_Q8, tags=("sql", "join", "agg"), bench=True)
def sql_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — the 8-relation join with a SELF-ALIASED
    dimension (nation under two roles: customer's and supplier's) and a
    conditional market-share aggregate.  The join-order stress: the
    p_type filter (an uncorrelated scalar MIN evaluated once) must
    shrink part BEFORE the fact join, the two nation legs and region
    broadcast, and the only big shuffles are lineitem⋈orders and
    orders⋈customer on their natural keys.  Q8 is gated in bench
    because join ORDER, not join algorithm, dominates it at scale."""
    _views(
        spark, sf_dir,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    )
    return spark.sql(_Q8)


# TPC-H Q9 shape (product-type profit by nation and year).  No partsupp in
# the testdata, so profit = revenue − quantity·tax (all lineitem-local);
# the original's shape — LIKE-filtered part driving a 5-relation join into
# a (nation, year) rollup — is intact.  The profit expression runs entirely
# in DECIMAL before the final double cast.
_Q9 = """
SELECT nation, o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - l_quantity * l_tax
                 AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice, l_discount, l_quantity, l_tax
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
""".strip()


@register("sql_q9_shape", oracle=_Q9, tags=("sql", "join", "agg"))
def sql_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — a non-anchored LIKE ('%widget%', no prefix) that
    can NOT become a range predicate, so the plan must still push it to
    the part scan as a post-decode filter, then semi-reduce lineitem
    via the part join before touching orders.  The (nation, year)
    group-by is tiny (25×7 groups) — at 100 TB the entire cost is the
    two fact shuffles, which AQE coalesces after the LIKE slashes the
    build side."""
    _views(spark, sf_dir, ("part", "lineitem", "supplier", "orders", "nation"))
    return spark.sql(_Q9)


# TPC-H Q11 shape (important stock): GROUP BY + HAVING against an
# UNCORRELATED scalar subquery that re-aggregates the same filtered join.
# The original's fixed fraction (0.0001/SF) is data-size-dependent; the
# scale-free equivalent — parts whose supply value exceeds 2× the mean
# part value — keeps the result non-degenerate at every SF.  Both sides
# of the HAVING comparison derive from exact DECIMAL sums.
_Q11 = """
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) >
  (SELECT 2.0 * CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4)))
                 AS DOUBLE) / count(DISTINCT l_partkey)
   FROM lineitem
   JOIN supplier ON l_suppkey = s_suppkey
   JOIN nation   ON s_nationkey = n_nationkey
   JOIN region   ON n_regionkey = r_regionkey
   WHERE r_name = 'ASIA')
""".strip()


@register("sql_q11_shape", oracle=_Q11, tags=("sql", "subquery", "agg"))
def sql_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — HAVING filtered by an uncorrelated scalar
    subquery over the SAME filtered join as the outer aggregate.  The
    scalar evaluates once and broadcasts into the HAVING filter; the
    outer group-by is one shuffle on l_partkey.  (Spark does not reuse
    the filtered-join subplan between the two legs — at 100 TB you
    would CACHE/materialize the region slice once; the two-pass form
    here is still linear and documents that trade.)"""
    _views(spark, sf_dir, ("lineitem", "supplier", "nation", "region"))
    return spark.sql(_Q11)


# TPC-H Q12 shape (shipping-mode priority): conditional priority counting
# per mode, adapted (l_returnflag stands in for l_shipmode; "late" is
# l_shipdate > o_orderdate as in the Q4 adaptation).  The CASE sums are
# cast to BIGINT: DuckDB's SUM(int) widens to HUGEINT, which pandas
# coerces to float64 and the driver's hash would flag against Spark's
# int64 even with equal values.
_Q12 = """
SELECT l_returnflag AS shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_returnflag
""".strip()


@register("sql_q12_shape", oracle=_Q12, tags=("sql", "join", "agg"))
def sql_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — a fact⋈fact join where the AGGREGATE carries
    the conditionals (two CASE-counts per group) instead of the WHERE.
    The date window pushes to the lineitem scan; the cross-side
    predicate (l_shipdate > o_orderdate) rides the join; the group-by
    output is 3 rows, so partial aggregation collapses everything
    map-side before the single narrow shuffle."""
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q12)


# TPC-H Q13 shape (customer order-count distribution): LEFT OUTER JOIN with
# the filter IN THE JOIN CONDITION (not WHERE — moving it would drop
# customers), then a group-by OF a group-by result.
_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""".strip()


@register("sql_q13_shape", oracle=_Q13, tags=("sql", "join", "agg"))
def sql_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the outer-join-aware aggregation classic: the
    priority filter must stay in the LEFT JOIN's ON clause (pushing it
    to WHERE would silently delete zero-order customers, the exact rows
    the query exists to count), count(o_orderkey) must count only
    matched rows, and the distribution is an aggregate OVER an
    aggregate.  At scale the first group-by shares the join's
    o_custkey/c_custkey partitioning (no extra shuffle); the second is
    a ~50-group rollup that collapses map-side."""
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q13)


# TPC-H Q15 shape (top supplier): the original defines a revenue VIEW used
# twice — once as the join input, once under MAX().  Expressed as a CTE;
# the MAX-equality is exact because total_revenue is a DECIMAL sum (ties,
# if any, are exact ties in both engines, and ALL tied rows are returned —
# no nondeterministic LIMIT 1).
_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""".strip()


@register("sql_q15_shape", oracle=_Q15, tags=("sql", "subquery", "agg"))
def sql_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — one named subresult (the revenue CTE) consumed
    by BOTH the join and the scalar MAX threshold.  Spark inlines the
    CTE into each consumer (two lineitem passes; the date filter pushes
    into both scans), DuckDB materializes it — the dialect-shared
    string proves the RESULTS agree regardless.  The argmax-by-
    threshold form returns all exact ties, making it deterministic
    where the classic ORDER BY + LIMIT 1 would not be."""
    _views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(_Q15)


# TPC-H Q16 shape (supplier relationship count): COUNT(DISTINCT) per part
# attribute group with a NOT IN exclusion subquery (itself gated by a
# nested uncorrelated scalar — the testdata's stand-in for the original's
# '%Customer%Complaints%' comment filter).
_Q16 = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier
    WHERE s_acctbal < (SELECT MIN(s_acctbal) + 1.0 FROM supplier)
  )
GROUP BY p_brand, p_size
""".strip()


@register("sql_q16_shape", oracle=_Q16, tags=("sql", "subquery", "agg"))
def sql_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — NOT IN against a subquery (null-aware anti
    join: one NULL in the exclusion list must empty the result, a
    semantics plain LeftAnti gets wrong), feeding a COUNT(DISTINCT) per
    (brand, size).  The exclusion list is tiny and broadcasts; the
    distinct-count expands to a two-phase aggregate (distinct on
    group+suppkey, then count) — both shuffles on the same group keys.
    """
    _views(spark, sf_dir, ("lineitem", "part", "supplier"))
    return spark.sql(_Q16)


# TPC-H Q20 shape (potential part promotion): the DEEPEST nesting in
# TPC-H — an IN whose subquery compares TWO correlated scalar aggregates
# (the supplier's own max shipment vs half the part's average shipment).
# The distinct (l_suppkey, l_partkey) pairs play partsupp.  Determinism:
# l_quantity is integer-valued, so SUM/COUNT are exact and AVG is one
# IEEE divide; MAX is exact; both comparison sides are engine-identical.
_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND s_suppkey IN (
    SELECT ps.l_suppkey
    FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem) ps
    WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      AND (SELECT MAX(l.l_quantity) FROM lineitem l
           WHERE l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey)
          > (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
             WHERE l2.l_partkey = ps.l_partkey)
  )
""".strip()


@register("sql_q20_shape", oracle=_Q20, tags=("sql", "subquery", "join"), bench=True)
def sql_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — the nesting stress test: IN(subquery) whose
    WHERE compares two DIFFERENTLY-correlated scalar aggregates (MAX
    per (part, supplier) vs AVG per part).  Catalyst must decorrelate
    BOTH into grouped aggregates over lineitem joined back on their
    correlation keys, then collapse the IN chain into semi joins — zero
    Subquery nodes may survive (pinned by tests/test_plans.py::
    test_q20_nested_correlation_decorrelates).  At 100 TB all three
    lineitem derivations shuffle on l_partkey(+l_suppkey) — co-
    partitioned passes, never per-row re-scans; gated in bench as the
    priciest decorrelation in the suite."""
    _views(spark, sf_dir, ("supplier", "nation", "lineitem", "part"))
    return spark.sql(_Q20)


# Correlated LATERAL subquery with ORDER BY + LIMIT (per-customer top-2
# orders).  Deterministic: the sort key carries o_orderkey as a total
# tiebreak, so the top-2 set is unique.  Beyond the 22 TPC-H shapes —
# the remaining ANSI construct classes the surface lacked.
_LATERAL = """
SELECT c_custkey, t.o_orderkey, t.o_totalprice
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c_mktsegment = 'BUILDING'
""".strip()


@register(
    "sql_lateral_topk",
    oracle=_LATERAL,
    tags=("sql", "subquery", "window"),
    bench=True,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL with ORDER BY + LIMIT — per-group top-k as a
    join-shaped query.  Catalyst must NOT execute the subquery per
    customer row: it rewrites the lateral into a WindowGroupLimit over
    orders partitioned by o_custkey (a partial/final per-group limit —
    the top-k analog of a map-side combine: each task keeps its own
    top-2 per key before the shuffle, the winner set finalizes after)
    joined back to the filtered customers (pinned by tests/test_plans.
    py::test_lateral_topk_becomes_window_group_limit).  At 100 TB
    that is one fact shuffle keyed by customer with k-bounded state
    per key — the per-row form would re-sort orders once per customer.
    """
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL)


# Recursive CTE (Spark 4.0+): hierarchical traversal of the implicit
# supplier binary tree (parent = floor(suppkey/2) — a pure function of
# the ids, so the hierarchy derives from the data at every SF and the
# recursion DEPTH grows with log2(supplier count): 4 levels at
# sf0.001, 10 at sf0.1).  floor(x/2.0) instead of integer-div syntax:
# `DIV`/`//` spell division differently across the two engines, floor
# is dialect-shared and exact below 2^52.  node_sum is cast to BIGINT
# (DuckDB SUM(int) widens to HUGEINT → pandas float64 → driver-hash
# mismatch against Spark's int64).
_RECURSIVE = """
WITH RECURSIVE chain(node, root, depth) AS (
  SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
  FROM supplier WHERE s_suppkey <= 1
  UNION ALL
  SELECT s.s_suppkey, c.root, c.depth + 1
  FROM supplier s
  JOIN chain c ON CAST(floor(s.s_suppkey / 2.0) AS BIGINT) = c.node
  WHERE s.s_suppkey > 1
)
SELECT depth, count(*) AS n, CAST(sum(node) AS BIGINT) AS node_sum
FROM chain GROUP BY depth
""".strip()


@register("sql_recursive_cte", oracle=_RECURSIVE, tags=("sql", "graph"), bench=True)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE — the declarative twin of the graph family's
    frontier iteration (graph_bfs_persisted walks the persisted
    adjacency imperatively; this walks a hierarchy in pure SQL, new in
    Spark 4.0).  Each recursion level is one join of the previous
    frontier against the anchor table — the same per-round
    frontier⋈edges shape as operators/components.py, but planned by
    the engine with the UnionLoop operator.  Depth is data-driven
    (log2 of the supplier count), so the key exercises real multi-level
    recursion at every SF, and the per-depth rollup keeps the result
    compact and hash-stable.

    Operational note for real corpora (measured by tools/scale_probe.py
    — its first 5e6-node run died on it): Spark guards recursion with
    ``spark.sql.cteRecursionRowLimit`` (default 1e6 TOTAL rows emitted
    across all levels) and ``spark.sql.cteRecursionLevelLimit``; size
    the row limit to the expected closure before running a traversal
    at scale.  The test-SF hierarchies stay far below both."""
    _views(spark, sf_dir, ("supplier",))
    return spark.sql(_RECURSIVE)
