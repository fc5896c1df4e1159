"""TPC-H query-shape registry — the B1 "fully SQL compatible" surface
(reference README.md:23) exercised at depth.

The reference's read story is "point any SQL tool at Postgres"; the Spark
analogue is `spark.sql(...)` over registered views, with Catalyst doing the
planning work Postgres did (decorrelation, join reordering, broadcast
selection, partial aggregation). Q3/Q5/Q8/Q10/Q18/Q21 live in the older
modules; this module completes the TPC-H sweep over the driver's slim
star schema.

Schema adaptations (the fixture is TPC-H-ish, not TPC-H: no partsupp
table, no commit/receipt dates, no shipmode/container/phone columns —
TESTDATA.md): where a canonical query needs a missing column, the query
keeps its PLAN SHAPE (the thing being tested — correlated EXISTS,
scalar-subquery min, double aggregation, disjunctive pushdown...) with the
predicate re-expressed over existing columns, noted per entry.

Determinism rules are registry.py's: exact DECIMAL sums for every
value-checked double aggregate, explicit tie-breaks on every LIMIT, same
aliases both sides.
"""

from __future__ import annotations

from ltss_spark.functions.numeric import oracle_davg, oracle_dsum
from ltss_spark.plans.registry import _t, register, register_views as _views


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar MIN subquery).
# Adapted: no partsupp, so "who supplies part p" comes from the lineitem
# bridge and "cost" is the supplier's account balance; the tested shape —
# a per-part correlated MIN that Catalyst must decorrelate into one
# aggregate + join — is intact.
# ---------------------------------------------------------------------------

_Q2 = """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size <= 15 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM supplier s2, lineitem l2, nation n2, region r2
        WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


@register(
    "sql_q2",
    _Q2,
    survey="B1 join_inner join_broadcast agg_minmax_by (TPC-H Q2 shape: correlated scalar MIN subquery)",
)
def sql_q2(spark, sf_dir):
    """Catalyst decorrelates the per-part MIN into a single grouped
    aggregate joined back on p_partkey — one pass over the bridge, not a
    re-executed subquery per part. MIN over raw doubles is
    order-insensitive, so no decimal detour is needed."""
    _views(spark, sf_dir, "part", "supplier", "lineitem", "nation", "region")
    return spark.sql(_Q2)


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (correlated EXISTS -> semi-join).
# Adapted: no commit/receipt dates; "late line" = shipped more than 60
# days after the order date.
# ---------------------------------------------------------------------------

_Q4 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register(
    "sql_q4",
    _Q4,
    survey="B1 join_semi agg_basic (TPC-H Q4 shape: correlated non-equi EXISTS)",
)
def sql_q4(spark, sf_dir):
    """The correlated EXISTS with a non-equi term (l_shipdate >
    o_orderdate + 60d) plans as a left-semi join on l_orderkey with the
    inequality as a post-join residual — the date window on orders prunes
    the probe side before the shuffle."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4)


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-aggregate; the pushdown
# benchmark: every predicate must reach the parquet reader).
# ---------------------------------------------------------------------------

_Q6 = f"""
    SELECT {oracle_dsum('l_extendedprice * l_discount', 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register(
    "sql_q6",
    _Q6,
    survey="B1 filter_basic agg_basic (TPC-H Q6 shape: full-pushdown scan aggregate)",
)
def sql_q6(spark, sf_dir):
    """No join, no shuffle beyond the final 1-row reduce: all three
    predicates push to the scan (min/max row-group skipping on l_shipdate
    at scale), and the aggregate is a map-side partial + single merge."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (self-joined dimension).
# ---------------------------------------------------------------------------

_Q7_BODY = """
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
"""

_Q7 = f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    {_Q7_BODY}
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "sql_q7",
    _Q7,
    survey="B1 join_inner join_broadcast fn_date agg_basic (TPC-H Q7 shape: nation-pair volume)",
)
def sql_q7(spark, sf_dir):
    """The 25-row nation dimension appears twice (supplier side, customer
    side); both instances broadcast, so the disjunctive nation-pair
    predicate is evaluated map-side and the only shuffles are the two
    fact-key joins."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql(
        f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        {_Q7_BODY}
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: no partsupp, so profit omits the
# ps_supplycost * l_quantity term — it is revenue by nation/year over
# parts matched by name).
# ---------------------------------------------------------------------------

_Q9_BODY = """
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
"""

_Q9 = f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_profit
    {_Q9_BODY}
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    ORDER BY nation, o_year DESC
"""


@register(
    "sql_q9",
    _Q9,
    survey="B1 join_inner join_broadcast filter_like fn_date agg_basic (TPC-H Q9 shape)",
)
def sql_q9(spark, sf_dir):
    """Five-table join where the selective predicate (p_name LIKE) sits on
    a dimension: part is filtered before the fact join, shrinking the
    build side; nation broadcasts; profit sums are exact decimals."""
    _views(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    return spark.sql(
        f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
        {_Q9_BODY}
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
        """
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-priority classification (adapted: no shipmode/commit/
# receipt dates; "late" = shipped after 60 days, classes keyed by
# l_returnflag). The tested shape — join + conditional two-way count —
# is intact.
# ---------------------------------------------------------------------------

_Q12 = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@register(
    "sql_q12",
    _Q12,
    survey="B1 join_inner agg_basic fn_date (TPC-H Q12 shape: conditional count split)",
)
def sql_q12(spark, sf_dir):
    """Both CASE branches fold into one hash aggregate (two counters per
    group), so the priority split costs nothing over a plain count; the
    shipdate window prunes the fact scan."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12)


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (double aggregation over a
# left join with an ON-clause filter).
# ---------------------------------------------------------------------------

_Q13 = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register(
    "sql_q13",
    _Q13,
    survey="B1 join_left agg_basic (TPC-H Q13 shape: double aggregation, COUNT over outer join)",
)
def sql_q13(spark, sf_dir):
    """The classic two-level aggregate: COUNT(o_orderkey) honors the
    left-join NULLs (customers with no qualifying orders count 0, not
    absent), then the distribution re-groups on the count itself. The
    second aggregate's input is |customers| rows — the first shuffle is
    the only big one."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13)


# ---------------------------------------------------------------------------
# Q14 — promotion-effect revenue share.
# ---------------------------------------------------------------------------

_PROMO_NUM = (
    "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
)

_Q14 = f"""
    SELECT 100.00 * {oracle_dsum(_PROMO_NUM, 6)}
           / {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
"""


@register(
    "sql_q14",
    _Q14,
    survey="B1 join_inner agg_basic (TPC-H Q14 shape: conditional-share aggregate)",
)
def sql_q14(spark, sf_dir):
    """Numerator and denominator are exact decimal sums computed in the
    same hash aggregate; the final ratio is one deterministic double
    division, so the share survives any partitioning."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        f"""
        SELECT 100.00 * CAST(SUM(CAST({_PROMO_NUM} AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
               AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
        """
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by revenue (aggregate reused by a MAX subquery).
# ---------------------------------------------------------------------------

_REV_SUM = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)"

_Q15 = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV_SUM} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""


@register(
    "sql_q15",
    _Q15,
    survey="B1 agg_basic join_inner limit (TPC-H Q15 shape: view + scalar MAX subquery)",
)
def sql_q15(spark, sf_dir):
    """The revenue CTE feeds both the join and the scalar MAX; equality on
    total_revenue is safe because both occurrences are the same exact
    decimal sum cast once to double. The MAX side reduces to one row
    before touching the 100-row supplier dimension."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_Q15)


# ---------------------------------------------------------------------------
# Q16 — part/supplier relationship count (adapted: lineitem is the
# part-supplier bridge in lieu of partsupp; the NOT IN anti-join on a
# supplier predicate is intact).
# ---------------------------------------------------------------------------

_Q16 = """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register(
    "sql_q16",
    _Q16,
    survey="B1 join_anti agg_distinct filter_in (TPC-H Q16 shape: NOT IN + COUNT DISTINCT)",
)
def sql_q16(spark, sf_dir):
    """NOT IN over a non-nullable key plans as a broadcast anti-join (the
    excluded-supplier list is tiny); COUNT(DISTINCT) expands to the
    standard two-phase distinct aggregate. Part predicates filter the
    dimension before the fact join."""
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_Q16)


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (per-part average threshold;
# adapted: brand+size stand in for the missing container column).
# ---------------------------------------------------------------------------

_Q17 = f"""
    SELECT {oracle_dsum('l_extendedprice', 2)} / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND p_size <= 5
      AND l_quantity < (
        SELECT 0.2 * ({oracle_davg('l2.l_quantity', 2)})
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
"""


@register(
    "sql_q17",
    _Q17,
    survey="B1 join_inner agg_basic win_frame (TPC-H Q17 shape: correlated per-group average threshold)",
)
def sql_q17(spark, sf_dir):
    """The correlated per-part average decorrelates into one grouped
    aggregate over lineitem joined back on l_partkey — written here
    explicitly as the aggregate+join (what Catalyst produces from the
    subquery form) so the plan is visibly single-pass. The threshold is an
    exact-decimal average times 0.2: one deterministic double product,
    bit-equal to the oracle's correlated form."""
    import pyspark.sql.functions as F

    from ltss_spark.functions.numeric import davg, dsum

    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 5)
    )
    thresholds = l.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity", 2)).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice", 2) / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue over disjunctive brand/size/quantity bands
# (adapted: size bands replace the missing container/shipmode terms).
# The tested behavior: the common join key is extracted from the OR so the
# join stays an equi-join, and the residual disjunction evaluates post-join.
# ---------------------------------------------------------------------------

_Q19 = f"""
    SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30))
"""


@register(
    "sql_q19",
    _Q19,
    survey="B1 join_inner filter_basic agg_basic (TPC-H Q19 shape: disjunctive band predicate)",
)
def sql_q19(spark, sf_dir):
    """Catalyst keeps p_partkey = l_partkey as the (broadcast) join key
    and pushes the part-only disjuncts (brand, size) below the join into
    the dimension scan; only the mixed part-x-lineitem residual runs
    post-join."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
                  AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
                  AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
                  AND l_quantity BETWEEN 20 AND 30))
        """
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess shipments of promo parts (adapted: the
# partsupp availability check becomes a shipped-quantity HAVING over the
# lineitem bridge; IN -> semi-join shape intact).
# ---------------------------------------------------------------------------

_Q20 = f"""
    SELECT s_suppkey, s_name
    FROM supplier, nation, region
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING {oracle_dsum('l_quantity', 2)} > 300
      )
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    ORDER BY s_suppkey
"""


@register(
    "sql_q20",
    _Q20,
    survey="B1 join_semi agg_basic filter_in (TPC-H Q20 shape: grouped-HAVING semi-join)",
)
def sql_q20(spark, sf_dir):
    """The IN-subquery aggregates the fact table once (group by supplier,
    exact-decimal HAVING), then semi-joins the 100-row supplier dimension
    against it — the aggregate runs on the big side where the data lives,
    and the dimension never shuffles (broadcast)."""
    _views(spark, sf_dir, "supplier", "nation", "region", "lineitem", "part")
    return spark.sql(_Q20)


# ---------------------------------------------------------------------------
# Q22 — global-sales-opportunity (adapted: no phone column, so the
# country-code grouping becomes the market segment, and "no orders"
# becomes "no orders since 2000" so the anti-join side is non-empty on
# the fixture). Shape intact: scalar-average threshold + NOT EXISTS
# anti-join + grouped aggregate.
# ---------------------------------------------------------------------------

_Q22 = f"""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           {oracle_dsum('c_acctbal', 2)} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT {oracle_davg('c_acctbal', 2)} FROM customer WHERE c_acctbal > 0.00
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@register(
    "sql_q22",
    _Q22,
    survey="B1 join_anti agg_basic (TPC-H Q22 shape: scalar-avg threshold + NOT EXISTS)",
)
def sql_q22(spark, sf_dir):
    """The scalar average computes once (exact decimal sum / count — the
    threshold double is bit-equal on both engines, so the > filter keeps
    the same rows); NOT EXISTS plans as an anti-join on o_custkey with
    the date predicate pushed into the orders scan."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22)


# ---------------------------------------------------------------------------
# Q11 — important-stock identification (global scalar subquery reused as a
# HAVING threshold). Adapted: no partsupp, so a part's "value held by
# GERMANY's suppliers" is the extendedprice volume its suppliers shipped
# (lineitem bridge, nation via supplier); the tested shape — a per-group
# exact sum filtered against a fraction of the SAME aggregate computed
# globally in a scalar subquery — is intact. Threshold arithmetic stays
# in DECIMAL until one final cast (a double re-sum of group values would
# be order-dependent and flap the boundary rows between engines).
# ---------------------------------------------------------------------------

_Q11 = """
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_9'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(38,6)))
                    * CAST(0.001 AS DECIMAL(10,6)) AS DOUBLE)
        FROM lineitem l2, supplier s2, nation n2
        WHERE l2.l_suppkey = s2.s_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_name = 'NATION_9'
    )
    ORDER BY value DESC, l_partkey
"""


@register(
    "sql_q11",
    _Q11,
    survey="B1 agg_basic join_inner (TPC-H Q11 shape: HAVING vs global scalar-subquery fraction)",
)
def sql_q11(spark, sf_dir):
    """Catalyst plans the scalar subquery as its own aggregate executed
    once and broadcast into the HAVING filter; both the group sums and
    the global threshold are exact DECIMAL sums with a single final
    double cast, so the boundary comparison is bit-deterministic across
    engines. Completes the TPC-H sweep: Q1/Q3 shapes live in
    registry_agg/registry_ltss, q2-q22 here and in registry_ltss."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11)


# ---------------------------------------------------------------------------
# Q1 — pricing summary report. The fixture carries EVERY canonical column
# (returnflag/linestatus/quantity/extendedprice/discount/tax/shipdate), so
# this is the real Q1, not an adaptation: four exact-decimal sums, two
# exact-decimal averages, a count, grouped and ordered by the flags. The
# per-row disc_price/charge products are bit-deterministic IEEE; only the
# aggregation goes through DECIMAL.
# ---------------------------------------------------------------------------

_Q1 = f"""
    SELECT l_returnflag,
           l_linestatus,
           {oracle_dsum('l_quantity', 2)} AS sum_qty,
           {oracle_dsum('l_extendedprice', 2)} AS sum_base_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {oracle_davg('l_quantity', 2)} AS avg_qty,
           {oracle_davg('l_extendedprice', 2)} AS avg_price,
           {oracle_davg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_q1",
    _Q1,
    survey="B1 agg_basic fn_math (TPC-H Q1: the pricing summary, all six aggregate families)",
)
def sql_q1(spark, sf_dir):
    """The canonical warehouse scan-agg: one pass over lineitem, map-side
    partial aggregation into 6 exact-decimal aggregates per (returnflag,
    linestatus) — the query every OLAP engine's codegen is tuned for."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q1)


# ---------------------------------------------------------------------------
# Q3 — shipping-priority candidates. Adapted: no o_shippriority column in
# the fixture (TESTDATA.md), so the select list drops it; the tested shape
# — 3-way join, date window from both sides, revenue aggregate, top-10 by
# revenue — is intact. (registry_ltss.sql_select exercises the same family
# over the ltss tables; this is the canonical TPC-H form.)
# ---------------------------------------------------------------------------

_Q3 = f"""
    SELECT l_orderkey,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register(
    "sql_q3",
    _Q3,
    survey="B1 join_inner agg_basic topk_group (TPC-H Q3: join tree + revenue top-10)",
)
def sql_q3(spark, sf_dir):
    """Catalyst broadcast-joins the filtered customer dim, shuffles the
    fact side once on orderkey; top-10 plans as TakeOrdered. Tie-broken
    on l_orderkey for cross-engine determinism."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3)
