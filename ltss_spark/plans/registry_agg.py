"""Registry part 2: aggregations, windows, sorts/limits, set ops, scalar
function families (SURVEY.md §2.C agg_*, win_*, sort/limit/topk, set_*,
fn_*)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ltss_spark.functions.numeric import davg, dsum, oracle_davg, oracle_dsum
from ltss_spark.plans.registry import _t, register, register_views


# =========================================================================
# Aggregations
# =========================================================================

@register(
    "agg_basic",
    f"""
    SELECT l_returnflag, l_linestatus,
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
    """,
    survey="agg_basic (TPC-H Q1 shape)",
)
def agg_basic(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_base_price"),
        dsum(disc, 6).alias("sum_disc_price"),
        dsum(disc * (1 + F.col("l_tax")), 6).alias("sum_charge"),
        davg("l_quantity", 2).alias("avg_qty"),
        davg("l_extendedprice", 2).alias("avg_price"),
        davg("l_discount", 2).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="agg_distinct",
)
def agg_distinct(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_groupsets",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice', 2)} AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    survey="agg_groupsets",
)
def agg_groupsets(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total"),
        )
    )


@register(
    "agg_minmax_by",
    """
    WITH ranked AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rf
      FROM events
    )
    SELECT user_id,
           MAX(CASE WHEN rl = 1 THEN event_type END) AS last_type,
           MAX(CASE WHEN rf = 1 THEN event_type END) AS first_type,
           COUNT(*) AS n_events
    FROM ranked GROUP BY user_id
    """,
    survey="agg_minmax_by B3",
)
def agg_minmax_by(spark, sf_dir):
    """max_by/min_by (argmax/argmin) — single hash agg, no sort; the scalable
    form of 'latest state per entity' (reference's DESC-index pattern,
    models.py:79). Tie-broken on (ts, event_id) => deterministic."""
    e = _t(spark, sf_dir, "events")
    order = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_type", order).alias("last_type"),
        F.min_by("event_type", order).alias("first_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "agg_first_last",
    """
    WITH ranked AS (
      SELECT event_type, value, ts, event_id,
             row_number() OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS rf,
             row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rf = 1 THEN value END) AS first_value,
           MAX(CASE WHEN rl = 1 THEN value END) AS last_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM ranked GROUP BY event_type
    """,
    survey="agg_first_last",
)
def agg_first_last(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    order = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("event_type").agg(
        F.min_by("value", order).alias("first_value"),
        F.max_by("value", order).alias("last_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "agg_pivot",
    f"""
    SELECT l_returnflag,
           {oracle_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 2)} AS qty_O,
           {oracle_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 2)} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="agg_basic (pivot)",
)
def agg_pivot(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity", 2))
        .withColumnsRenamed({"O": "qty_O", "F": "qty_F"})
    )


@register(
    "agg_approx",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_ok,
           TRUE AS median_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="agg_distinct (approx, the 100TB path)",
)
def agg_approx(spark, sf_dir):
    """At 100 TB exact COUNT(DISTINCT) on an unbounded key is a full shuffle
    of the key universe; HLL (approx_count_distinct) and quantile digests
    are the production path. The sketches themselves are engine-specific,
    so the DRIVER-CHECKABLE form (VERDICT r2 item 2) emits the exact
    count (SQL-derivable) plus deterministic error-bound verdicts computed
    against the sketch estimates in the same plan: HLL within 15% of exact
    (default rsd 5% => ~3 sigma), and the approximate median's rank inside
    [0.4, 0.6] of its group. Any sketch regression flips a verdict and the
    hash gate goes red."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("median_price"),
    )
    rankfrac = (
        li.join(
            F.broadcast(agg.select("l_returnflag", "median_price")),
            "l_returnflag",
        )
        .groupBy("l_returnflag")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("l_extendedprice") <= F.col("median_price"), 1
                    ).otherwise(0)
                )
                / F.count(F.lit(1))
            ).alias("frac_le")
        )
    )
    return agg.join(rankfrac, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.15 * F.col("exact_parts")
        ).alias("hll_ok"),
        F.col("frac_le").between(0.4, 0.6).alias("median_ok"),
    )


# =========================================================================
# Window functions
# =========================================================================

@register(
    "win_rank",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rn, rnk, drnk
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(row_number() OVER w AS INT) AS rn,
             CAST(rank()       OVER w AS INT) AS rnk,
             CAST(dense_rank() OVER w AS INT) AS drnk
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    )
    WHERE rn <= 5
    """,
    survey="win_rank topk_group",
)
def win_rank(spark, sf_dir):
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "win_lag_lead",
    """
    SELECT user_id, event_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT)
             AS gap_micros
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    survey="win_lag_lead B2",
)
def win_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    e = _t(spark, sf_dir, "events")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_micros"
        ),
    )


@register(
    "win_frame",
    """
    SELECT user_id, event_id, value,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w3 AS DOUBLE) AS mov_sum,
           CAST(COUNT(value) OVER w3 AS BIGINT) AS mov_n,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w3 AS DOUBLE)
             / CAST(COUNT(value) OVER w3 AS DOUBLE) AS mov_avg
    FROM events
    WINDOW w3 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    survey="win_frame",
)
def win_frame(spark, sf_dir):
    w3 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    e = _t(spark, sf_dir, "events")
    mov_sum = F.sum(F.col("value").cast("decimal(38,2)")).over(w3).cast("double")
    mov_n = F.count("value").over(w3)
    return e.select(
        "user_id",
        "event_id",
        "value",
        mov_sum.alias("mov_sum"),
        mov_n.alias("mov_n"),
        (mov_sum / mov_n.cast("double")).alias("mov_avg"),
    )


@register(
    "win_cumulative",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS running_total,
           CAST(COUNT(*) OVER w AS BIGINT) AS running_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey="win_cumulative",
)
def win_cumulative(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = _t(spark, sf_dir, "events")
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(38,2)")).over(w).cast("double").alias(
            "running_total"
        ),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


# =========================================================================
# Sorts / limits / top-k
# =========================================================================

@register(
    "sort",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
    survey="sort limit (TakeOrdered top-k, no global sort materialized)",
)
def sort_topn(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@register(
    "limit",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20",
    survey="limit",
)
def limit_q(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(20)
    )


@register(
    "topk_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    survey="topk_group",
)
def topk_group(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# =========================================================================
# Set operations
# =========================================================================

@register(
    "set_union",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT s_nationkey FROM supplier
    """,
    survey="set_union",
)
def set_union(spark, sf_dir):
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    survey="set_intersect",
)
def set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    survey="set_except",
)
def set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, unlike exceptAll


# =========================================================================
# Scalar function families
# =========================================================================

@register(
    "fn_string",
    r"""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_type, 1, 4) AS type4,
           CAST(length(p_name) AS INT) AS name_len,
           replace(p_name, ' ', '_') AS name_snake,
           p_brand || ':' || p_type AS brand_type,
           trim('  ' || p_name || ' ') AS name_trim,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
    FROM part
    """,
    survey="fn_string",
)
def fn_string(spark, sf_dir):
    p = F.col("p_name")
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper(p).alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.length(p).alias("name_len"),
        F.regexp_replace(p, " ", "_").alias("name_snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), p, F.lit(" "))).alias("name_trim"),
        F.regexp_replace(p, "[aeiou]", "").alias("name_novowel"),
        F.size(F.split(p, " ")).alias("n_words"),
    )


@register(
    "fn_date",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           CAST(EXTRACT(month FROM l_shipdate) AS INT) AS ship_month,
           CAST(EXTRACT(day FROM l_shipdate) AS INT) AS ship_day,
           CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
             AS ship_month_start,
           epoch_us(l_shipdate) AS ship_micros,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS INT) AS days_since_95,
           l_shipdate + INTERVAL 30 DAY AS ship_plus_30
    FROM lineitem
    """,
    survey="fn_date",
)
def fn_date(spark, sf_dir):
    # l_shipdate arrives as TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
    # with the session pinned to UTC the instant is unchanged by the cast,
    # which unix_micros requires.
    ts = F.col("l_shipdate").cast("timestamp")
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.year(ts).alias("ship_year"),
        F.month(ts).alias("ship_month"),
        F.dayofmonth(ts).alias("ship_day"),
        F.date_trunc("month", ts).alias("ship_month_start"),
        F.unix_micros(ts).alias("ship_micros"),
        F.datediff(ts, F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
        (ts + F.expr("INTERVAL 30 DAYS")).alias("ship_plus_30"),
    )


@register(
    "fn_math",
    """
    SELECT event_id,
           abs(value - 100.0) AS dist_from_100,
           CAST(floor(value) AS BIGINT) AS value_floor,
           CAST(ceil(value) AS BIGINT) AS value_ceil,
           round(ln(value + 1.0), 6) AS log_value,
           round(sqrt(value), 6) AS sqrt_value,
           CAST(user_id % 7 AS BIGINT) AS user_mod,
           TRY_CAST(event_type AS DOUBLE) AS type_as_num,
           value / 3.0 AS value_third
    FROM events
    """,
    survey="fn_math (incl. try_cast of stringly data)",
)
def fn_math(spark, sf_dir):
    v = F.col("value")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.abs(v - 100.0).alias("dist_from_100"),
        F.floor(v).alias("value_floor"),
        F.ceil(v).alias("value_ceil"),
        F.round(F.log(v + 1.0), 6).alias("log_value"),
        F.round(F.sqrt(v), 6).alias("sqrt_value"),
        F.pmod(F.col("user_id"), F.lit(7)).alias("user_mod"),
        F.col("event_type").try_cast("double").alias("type_as_num"),
        (v / 3.0).alias("value_third"),
    )


@register(
    "fn_array",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           round(CAST(list_sort(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)))[1] AS DOUBLE), 6) AS min_elem
    FROM embeddings
    """,
    survey="fn_array (higher-order fns over embeddings)",
)
def fn_array(spark, sf_dir):
    emb = F.col("embedding")
    as_dbl = F.transform(emb, lambda x: x.cast("double"))
    fsum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size(emb).alias("dim"),
        emb.getItem(0).cast("double").alias("first_elem"),
        F.round(fsum(as_dbl), 6).alias("vec_sum"),
        F.round(F.sqrt(fsum(F.transform(emb, lambda x: x.cast("double") * x.cast("double")))), 6).alias("l2_norm"),
        F.round(F.array_min(as_dbl), 6).alias("min_elem"),
    )


@register(
    "fn_map",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
    survey="fn_map fn_json B5 (attribute map projection)",
)
def fn_map(spark, sf_dir):
    m = F.from_json(F.col("props"), "map<string,string>")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.element_at(m, "k").cast("int").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    """,
    survey="fn_json B5 (JSONB predicate - the GIN-index pattern)",
)
def fn_json(spark, sf_dir):
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", k.alias("k_val"))
        .filter(F.col("k_val") > 50)
    )


@register(
    "agg_skew_distinct",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_user_id,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
    survey="agg_distinct (skew-safe two-phase exact distinct — the salting pattern)",
)
def agg_skew_distinct(spark, sf_dir):
    """events is the canonical skew case (100k+ rows, 5 hot keys): a naive
    per-key distinct funnels each key through one reducer. The two-phase
    form dedups on (key, value) first — parallelism follows the data."""
    from ltss_spark.operators.skew import skew_safe_distinct_count

    return skew_safe_distinct_count(
        _t(spark, sf_dir, "events"), ["event_type"], "user_id"
    )


@register(
    "agg_unpivot",
    """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey < 100
    )
    UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
    survey="udtf set_union (UNPIVOT/melt - wide measures to long form)",
)
def agg_unpivot(spark, sf_dir):
    """Wide->long reshape (pandas melt / SQL UNPIVOT): each measure column
    becomes a row. Map-side only (generate), no shuffle."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "val",
        )
    )


@register(
    "win_distribution",
    """
    SELECT c_mktsegment, c_custkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
    survey="win_rank win_frame (distribution functions: ntile/percent_rank/cume_dist)",
)
def win_distribution(spark, sf_dir):
    from pyspark.sql import Window as W

    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "fn_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'urgent!') AS prio_or_flag,
           least(o_custkey % 10 + 1, 5) AS prio_capped,
           greatest(CAST(o_totalprice AS DOUBLE), 50000.0) AS floor_price,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS closed_status
    FROM orders
    """,
    survey="fn_math filter_basic (CASE/coalesce/nullif/least/greatest)",
)
def fn_conditional(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("urgent!")
        ).alias("prio_or_flag"),
        F.least(F.col("o_custkey") % 10 + 1, F.lit(5)).alias("prio_capped"),
        F.greatest(F.col("o_totalprice").cast("double"), F.lit(50000.0)).alias(
            "floor_price"
        ),
        F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ).alias("closed_status"),
    )


@register(
    "agg_collect",
    """
    SELECT o_orderstatus,
           array_to_string(list(DISTINCT o_orderpriority ORDER BY o_orderpriority), '|') AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    survey="agg_distinct fn_array (collect_set with deterministic ordering)",
)
def agg_collect(spark, sf_dir):
    """Set aggregation surfaced as a SORTED array — the only
    hash-comparable form (collect_set order is partition-dependent;
    array_sort pins it)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "sql_subquery",
    f"""
    SELECT c_custkey, c_name, n_orders, spent
    FROM (
      SELECT c_custkey, c_name,
             (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
             (SELECT {oracle_dsum('o_totalprice', 2)} FROM orders
               WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS spent
      FROM customer
    )
    WHERE n_orders > (SELECT AVG(cnt) FROM (
        SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey))
    """,
    survey="B1 join_semi agg_basic (correlated scalar subqueries - Catalyst decorrelation)",
)
def sql_subquery(spark, sf_dir):
    """Correlated scalar subqueries + uncorrelated scalar filter, through
    the SQL entry: Catalyst decorrelates both into aggregating joins (no
    per-row re-execution — check the plan for the two left joins)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, n_orders, spent
        FROM (
          SELECT c_custkey, c_name,
                 (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
                 (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                    FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS spent
          FROM customer
        )
        WHERE n_orders > (SELECT AVG(cnt) FROM (
            SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey))
        """
    )


@register(
    "sort_nulls",
    """
    SELECT event_id, user_id, value
    FROM events
    ORDER BY value DESC NULLS LAST, event_id ASC
    LIMIT 200
    """,
    survey="sort (explicit null ordering - Spark and ANSI defaults differ)",
)
def sort_nulls(spark, sf_dir):
    """Null-ordering is a portability trap: Spark's default is NULLS FIRST
    for ASC / NULLS LAST for DESC, DuckDB's is NULLS LAST everywhere.
    Explicit desc_nulls_last pins it."""
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy(F.col("value").desc_nulls_last(), F.col("event_id").asc())
        .limit(200)
    )


@register(
    "win_range_frame",
    """
    SELECT user_id, ts, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_24h,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS sum_trailing_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
    survey="win_frame fn_date (RANGE frame over event time - trailing 24h per user)",
)
def win_range_frame(spark, sf_dir):
    """Value-based (RANGE) frame: everything within the trailing 24 hours
    of each event, regardless of row count — the time-series moving
    aggregate ROWS frames cannot express. Ordered by epoch micros so the
    range arithmetic is exact integers on both engines."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    e = _t(spark, sf_dir, "events")
    return e.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_24h"),
        F.sum(F.col("value").cast("decimal(38,2)")).over(w).cast("double").alias("sum_trailing_24h"),
    )


@register(
    "fn_fuzzy",
    """
    SELECT p_partkey, p_name,
           CAST(levenshtein(p_name, 'standard polished widget') AS INT) AS dist
    FROM part
    WHERE levenshtein(p_name, 'standard polished widget') <= 18
    """,
    survey="fn_string (edit-distance fuzzy matching)",
)
def fn_fuzzy(spark, sf_dir):
    """Levenshtein edit distance — the fuzzy-match primitive for entity
    resolution; here as a filter against a probe string (the scalable form
    pre-blocks candidates with LSH, then edit-distance verifies — same
    verify-after-block shape as the dedup operators)."""
    probe = F.lit("standard polished widget")
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_name",
            F.levenshtein(F.col("p_name"), probe).alias("dist"),
        )
        .filter(F.col("dist") <= 18)
    )


@register(
    "filter_not_in",
    """
    WITH probe AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    SELECT 'not_in_clean' AS variant, COUNT(*) AS n
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM probe)
    UNION ALL
    SELECT 'not_in_with_null' AS variant, COUNT(*) AS n
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM probe
                                        UNION ALL SELECT NULL)
    UNION ALL
    SELECT 'not_exists' AS variant, COUNT(*) AS n
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM probe p WHERE p.c_custkey = o.o_custkey)
    """,
    survey="filter_in join_anti (ANSI NOT IN vs NOT EXISTS null semantics)",
)
def filter_not_in(spark, sf_dir):
    """The classic ANSI trap, proven identical on both engines: a NULL in
    the NOT IN subquery makes the predicate UNKNOWN for every row (count
    0), while NOT EXISTS keeps anti-join semantics. An engine with naive
    set semantics would disagree on the middle variant."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        WITH probe AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        SELECT 'not_in_clean' AS variant, COUNT(*) AS n
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM probe)
        UNION ALL
        SELECT 'not_in_with_null' AS variant, COUNT(*) AS n
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM probe
                                            UNION ALL SELECT NULL)
        UNION ALL
        SELECT 'not_exists' AS variant, COUNT(*) AS n
        FROM orders o WHERE NOT EXISTS (
          SELECT 1 FROM probe p WHERE p.c_custkey = o.o_custkey)
        """
    )


@register(
    "agg_percentile",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    survey="agg_basic fn_math (exact interpolated percentiles per group — the p50/p95 dashboard shape)",
)
def agg_percentile(spark, sf_dir):
    """Exact linear-interpolated percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`, both the standard R-7 interpolation; rounded
    to 6 for last-ulp determinism). Exact percentile sorts each group's
    values — fine keyed by low-cardinality groups; unbounded-cardinality
    keys should use `percentile_approx` (registered as agg_approx)."""
    e = _t(spark, sf_dir, "events")
    pct = F.percentile(F.col("value"), F.lit([0.5, 0.95]))
    return e.groupBy("event_type").agg(
        F.round(F.element_at(pct, 1), 6).alias("p50"),
        F.round(F.element_at(pct, 2), 6).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_sketch_rollup",
    """
    SELECT event_type,
           COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS rollup_ok
    FROM events GROUP BY event_type
    """,
    survey="agg_approx agg_basic (mergeable HLL sketch rollup: pre-aggregate per day, union at query)",
)
def agg_sketch_rollup(spark, sf_dir):
    """The mergeable-sketch pattern that makes distinct counts tractable at
    100 TB: build one HLL sketch per (event_type, day) partition — the
    expensive pass touches each row once, map-side combinable — then answer
    "distinct users per event_type" by UNIONING the tiny daily sketches
    (bytes each) instead of re-scanning. This is how a daily
    materialization serves ad-hoc distinct queries over arbitrary date
    ranges without a second scan of the facts.

    Driver-checkable form (VERDICT r2 item 2): the Datasketches HLL binary
    has no DuckDB twin, so the entry emits the SQL-derivable exact distinct
    count and day count plus rollup_ok — the merged-sketch estimate within
    5% of exact (lgK=12 => rsd ~1.6%, so 5% is ~3 sigma and the value is
    deterministic for fixed data). An estimate or merge regression flips
    the verdict and the hash gate goes red."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg(F.col("user_id"), 12).alias("sk"))
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return rolled.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("rollup_ok"),
    )


@register(
    "agg_mode",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type DESC) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS mode_event_type, n AS mode_n
    FROM ranked WHERE rn = 1
    """,
    survey="agg_basic agg_minmax_by (statistical MODE with deterministic tie-break)",
)
def agg_mode(spark, sf_dir):
    """Most-frequent value per group — Postgres ``mode() WITHIN GROUP``.
    NOT a window over raw rows: count first (map-side combinable, shuffle
    bounded by |group x value|), then ONE ``max_by`` hash aggregation over
    the counted side keyed by the (n, value) struct — deterministic
    tie-break (higher count, then lexicographically larger value) with no
    second sort pass."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    key = F.struct(F.col("n"), F.col("event_type"))
    return counts.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("mode_event_type"),
        F.max("n").alias("mode_n"),
    )


@register(
    "win_ntile",
    """
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
                AS INT) AS balance_quartile
    FROM customer
    """,
    survey="win_rank sort (NTILE bucket assignment)",
)
def win_ntile(spark, sf_dir):
    """Quartile assignment over a global order — NTILE's equal-size
    buckets (vs width_bucket's equal-width). The unique c_custkey
    tie-break makes bucket boundaries deterministic.

    r8: the single-partition global window is GONE (the last ledger entry
    of that shape): the global rank comes from distributed_row_number
    (range-partitioned two-pass above its threshold) and NTILE's exact
    bucket arithmetic is reproduced from the broadcast total — with
    n = q*k + r, the first r buckets take q+1 rows: bucket(rn) =
    (rn-1) div (q+1) + 1 up to the cutoff r*(q+1), else
    r + (rn - cutoff - 1) div q + 1. Bit-equal to the oracle's ntile(4)
    (hash-checked) and scale-safe at any n."""
    from ltss_spark.operators.rank import distributed_row_number

    k = 4
    ranked = distributed_row_number(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        out_col="__rn",
    )
    n_row = ranked.agg(F.count(F.lit(1)).alias("__n"))
    q = F.floor(F.col("__n") / k)
    r = F.col("__n") % k
    cutoff = r * (q + 1)
    rn = F.col("__rn")
    bucket = F.when(
        rn <= cutoff, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((rn - cutoff - 1) / q) + 1)
    return ranked.crossJoin(F.broadcast(n_row)).select(
        "c_custkey",
        "c_acctbal",
        bucket.cast("int").alias("balance_quartile"),
    )


@register(
    "join_skew_salted",
    """
    WITH dim AS (
      SELECT event_type, MIN(value) AS type_min, MAX(value) AS type_max
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value, d.type_min, d.type_max
    FROM events e JOIN dim d USING (event_type)
    """,
    survey="join_inner join_broadcast (salt-replication skew join: hot keys spread over N reduce tasks)",
)
def join_skew_salted(spark, sf_dir):
    """events is the canonical hot-key case (100k+ rows over 5 event
    types): a plain shuffle join funnels each type through one task.
    salted_join (operators/skew.py) spreads every hot key over 8 salt
    buckets by replicating the small side — result provably identical to
    the unsalted join (this oracle), plan asserted shuffle-shaped in
    tests/test_plans.py."""
    from ltss_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events")
    dim = e.groupBy("event_type").agg(
        F.min("value").alias("type_min"), F.max("value").alias("type_max")
    )
    return salted_join(
        e.select("event_id", "event_type", "value"),
        dim,
        on=["event_type"],
        salt_src=F.col("event_id"),
        salt_buckets=8,
    ).select("event_id", "event_type", "value", "type_min", "type_max")


@register(
    "agg_corr",
    """
    WITH sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(user_id AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(value * user_id AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(user_id * user_id AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS corr_value_user
    FROM sums
    """,
    survey="agg_basic fn_math (Pearson correlation from exact-decimal moment sums)",
)
def agg_corr(spark, sf_dir):
    """Pearson correlation per group WITHOUT F.corr: the five moment sums
    are exact decimals (order-insensitive — F.corr's streaming update is
    partitioning-dependent in the last ulps), then one fixed IEEE formula
    per group. The same one-pass shape (all five sums in a single hash
    aggregation), deterministic across engines and shuffles."""
    e = _t(spark, sf_dir, "events")
    v, u = F.col("value"), F.col("user_id")
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(v, 6).alias("sx"),
        dsum(u.cast("double"), 6).alias("sy"),
        dsum(v * u, 6).alias("sxy"),
        dsum(v * v, 6).alias("sxx"),
        dsum(u * u, 6).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return sums.select(
        "event_type",
        "n",
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_value_user"),
    )


@register(
    "win_time_range",
    """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_trailing_1h,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE)
             AS sum_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    survey="win_frame fn_date (time-interval RANGE frame: trailing-window analytics per entity)",
)
def win_time_range(spark, sf_dir):
    """Trailing 1-hour window per user over EVENT TIME (RANGE frame on a
    timestamp, not a row count) — the dashboard 'last hour' aggregate at
    every event. One per-key sort; frame bounds slide by time so
    irregular sampling is handled exactly. Decimal window sum keeps the
    result order-insensitive. Rows with equal ts are RANGE-peers on both
    engines, so counts are deterministic without a tie-break."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_trailing_1h,
               CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE)
                 AS sum_trailing_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "join_bloom",
    f"""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 3
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    survey="join_inner filter_basic agg_basic (runtime Bloom semi-join reduction: fact scan pruned by the filtered dim's key Bloom before the shuffle)",
)
def join_bloom(spark, sf_dir):
    """Dynamic filtering (operators/runtime_filter.py): the dim filter
    p_size <= 3 keeps ~12% of parts, but static pruning cannot see which
    l_partkey values survive it — so a plain shuffle join moves ALL of
    lineitem. Catalyst's InjectRuntimeFilter builds a Bloom filter over
    the filtered dim's keys and injects might_contain(bloom,
    xxhash64(l_partkey)) below lineitem's Exchange, dropping non-matching
    fact rows at the scan. Semantics unchanged (no false negatives; false
    positives die in the join) — this oracle is the plain join. At 100 TB
    the rule self-arms past the 10 GB scan threshold; locally the scoped
    freeze in with_runtime_bloom pins the same plan (asserted in
    tests/test_plans.py::test_join_bloom_plan)."""
    from ltss_spark.operators.runtime_filter import with_runtime_bloom

    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    out = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("revenue"),
        )
        .orderBy("p_brand")
    )
    return with_runtime_bloom(out)


@register(
    "diag_skew",
    """
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM per_key
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) / total, 6) AS share,
           round(CAST(n AS DOUBLE) / (CAST(total AS DOUBLE) / n_keys), 6)
             AS skew_factor
    FROM per_key CROSS JOIN tot
    ORDER BY n DESC, user_id
    LIMIT 10
    """,
    survey="agg_basic topk_group (pre-shuffle heavy-hitter diagnostic: per-key share and skew factor, one scan)",
)
def diag_skew(spark, sf_dir):
    """The decision input for the skew toolkit (plain shuffle vs AQE
    skew-split vs salted_join): top-10 hottest user_id values with each
    key's row share and its size relative to the mean key — computed in
    ONE scan (map-side partial combine bounds reducer input to #maps x
    #keys) plus a 1-row totals broadcast and a TakeOrdered. At 100 TB
    this is the cheap pre-flight that tells you whether the nightly join
    needs salting before you learn it from a straggler task."""
    from ltss_spark.operators.skew import key_skew_profile

    return key_skew_profile(_t(spark, sf_dir, "events"), ["user_id"], top_k=10)


@register(
    "agg_theta_overlap",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM a JOIN b USING (user_id)) AS n_both,
      (SELECT CAST(COUNT(*) AS BIGINT)
       FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS n_either,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM a
       WHERE user_id NOT IN (SELECT user_id FROM b)) AS n_click_only
    """,
    survey="agg_distinct set_intersect set_except (theta-sketch audience overlap: mergeable distinct sets with intersection/difference, which HLL cannot do)",
)
def agg_theta_overlap(spark, sf_dir):
    """Audience overlap between the click and purchase user sets via
    THETA sketches: intersection, union, and difference estimated from
    two mergeable per-segment sketches — the capability HLL lacks
    (HLL unions only). At 100 TB each segment keeps one bounded sketch
    (map-side partial agg, shuffle = |partitions| x sketch size) and ANY
    pairwise overlap is answerable from stored sketches without
    re-scanning — the audience-analytics building block. Below the
    sketch's retention threshold (4096 entries at the default lgK=12)
    theta sketches are provably EXACT, and the fixture's user
    cardinality sits under it, so this oracle is the plain relational
    intersection/union/anti — the hash match certifies the sketch path
    end to end; at real scale the same plan returns estimates with
    published error bounds."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH a AS (SELECT theta_sketch_agg(user_id) AS sk FROM events
                   WHERE event_type = 'click'),
             b AS (SELECT theta_sketch_agg(user_id) AS sk FROM events
                   WHERE event_type = 'purchase')
        SELECT
          CAST(theta_sketch_estimate(theta_intersection(a.sk, b.sk)) AS BIGINT)
            AS n_both,
          CAST(theta_sketch_estimate(theta_union(a.sk, b.sk)) AS BIGINT)
            AS n_either,
          CAST(theta_sketch_estimate(theta_difference(a.sk, b.sk)) AS BIGINT)
            AS n_click_only
        FROM a, b
        """
    )


@register(
    "agg_median_exact",
    """
    SELECT round(median(CAST(value AS DOUBLE)), 6) AS median_value,
           CAST(COUNT(value) AS BIGINT) AS n
    FROM events WHERE value IS NOT NULL
    """,
    survey="udaf agg_percentile sort (EXACT global median without a "
    "single-reducer sort: distributed rank -> the one or two middle "
    "rows -> their mean; the scale path for the udaf ledger entry's "
    "exact-median form — approx stays agg_approx)",
)
def agg_median_exact(spark, sf_dir):
    """Exact median of a 100 TB column, distributed: global rank via
    distributed_row_number (range-partitioned two-pass above its
    threshold — no full sort through one reducer), then ONLY the middle
    row(s) survive the rank filter and a 2-row aggregate averages them.
    Odd n picks the single middle twice (same row — mean is itself);
    even n averages the two middles, exactly DuckDB median()'s
    interpolation at q=0.5. The 2-decimal value domain makes (a+b)/2
    exactly representable, so the expression-form difference vs
    quantile interpolation cannot surface; rounded to 6 regardless."""
    from ltss_spark.operators.rank import distributed_row_number

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("value").cast("double").alias("v"), "event_id")
    )
    ranked = distributed_row_number(
        e, [F.col("v").asc(), F.col("event_id").asc()], out_col="__rn"
    )
    n_row = ranked.agg(F.count(F.lit(1)).alias("__n"))
    mid = ranked.crossJoin(F.broadcast(n_row)).filter(
        (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rn") == F.floor(F.col("__n") / 2) + 1)
    )
    # coalesce: on an empty/all-null column the mid frame is empty, so
    # max(__n) is NULL while the oracle's COUNT is 0 (ADVICE r8) — the
    # count itself is still the broadcast scalar, not a recount
    return mid.agg(
        F.round(F.avg("v"), 6).alias("median_value"),
        F.coalesce(F.max("__n"), F.lit(0).cast("long")).alias("n"),
    )
