"""Relational core operators [EXT] (SURVEY.md §2.2).

The reference has no filter/join/aggregate/window/sort — its only
"predicate" is the ordinal bounds check (vector_engine.rs:34,41) and
its only aggregate is `len` (dynamic_vector_manage_service.rs:72-79).
This module supplies the full relational surface the north star
mandates, each operator as an idiomatic Catalyst-planned DataFrame
query with a DuckDB oracle.

Scale notes per operator are inline; the cross-cutting ones:
  * dimension joins broadcast (`F.broadcast`) — no shuffle of the fact;
  * aggregates are partial/final automatically (map-side combine);
  * top-k is orderBy+limit → Spark plans TakeOrderedAndProject
    (per-partition heap, no global sort);
  * exact-decimal aggregation (functions/exact.py) makes float sums
    order-independent — correct under AQE re-planning at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vector_db_core_spark.functions.exact import dec, dsum, davg
from vector_db_core_spark.operators.registry import register
from vector_db_core_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Money-safe decimal casts for products (keep widths small enough that
# DuckDB's width-sum rule and Spark's precision cap both stay exact:
# (18,2)*(7,2)*(7,2) → (34,6), scale 6 holds the ≤6 decimal digits of
# a 2dp*2dp*2dp product exactly).
_D18 = "decimal(18,2)"
_D7 = "decimal(7,2)"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice").cast(_D18) * (F.lit(1) - F.col("l_discount")).cast(_D7)


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1) + F.col("l_tax")).cast(_D7)


_DISC_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(7,2))"
_CHARGE_SQL = f"{_DISC_SQL} * CAST(1 + l_tax AS DECIMAL(7,2))"


# ---------------------------------------------------------------- Q1
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_DISC_SQL}) AS DOUBLE)                            AS sum_disc_price,
           CAST(SUM({_CHARGE_SQL}) AS DOUBLE)                          AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg, 8 aggregates, 6 groups.

    The plan to want at 100 TB: parquet scan with the shipdate filter
    pushed down, partial agg (6 groups → tiny), exchange, final agg.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------- Q3
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-10.

    customer(filtered) is small relative to lineitem: joined first so
    the orders/lineitem join only carries qualifying orders. Top-k is
    orderBy+limit (TakeOrderedAndProject — no global sort). Revenue is
    exact-decimal so the top-10 cut is deterministic; l_orderkey
    tiebreak pins ordering fully.
    """
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- Q5
@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, revenue by nation.

    nation/region are O(25)/O(5) rows at *any* SF — broadcast them so
    the only shuffles are the fact-fact joins, which AQE can reorder
    and skew-split at runtime.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ------------------------------------------------------------- joins
@register(
    "join_semi_orders_with_bulk_items",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS — no row multiplication, no payload shuffle."""
    orders = _t(spark, sf_dir, "orders")
    bulk = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return orders.join(bulk, orders.o_orderkey == bulk.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS: customers with no orders in the
    store's first year. Date-scoped because every fixture customer has
    SOME order — the unscoped anti join is vacuously empty at every
    SF, which would make its hash-check trivially green; the 1995
    probe keeps both outcomes populated (the build side is filtered
    BEFORE the anti join, so the filter prunes the shuffle too)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast_brand_volume",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join sized by the optimizer, not by hand.

    `part` is SF-scaled (~200k rows x SF) — an explicit broadcast hint
    here would OOM executors at the 100 TB design point, so the join is
    left to AQE: below autoBroadcastJoinThreshold it becomes a
    broadcast-hash join at runtime, above it a shuffle join with skew
    splitting. Only the 2 needed part columns are scanned (pruning).
    The genuinely-always-broadcastable dims are region/nation — see
    `join_broadcast_nation_volume`."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "join_broadcast_nation_volume",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_broadcast_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join on a dim that is bounded at ANY
    scale factor (nation = 25 rows by TPC-H spec, loaders.BROADCASTABLE):
    the supplier fact never shuffles for the join, only for the
    25-group aggregate."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_suppliers"), dsum("s_acctbal", "total_acctbal"))
    )


@register(
    "join_outer_order_counts",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving zero-order customers (COUNT skips nulls)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ------------------------------------------------------- sort / top-k
@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — per-partition heaps of k,
    merged on the driver; never a full sort at any scale."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@register(
    "group_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window; one shuffle on the group key.
    (Spark pushes a per-partition rank-limit below the exchange.)"""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


# ------------------------------------------------------------ windows
@register(
    "window_running_total",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(27,6)))
                OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total — analytic window, exact-decimal accumulation."""
    w = W.partitionBy("user_id").orderBy("event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
    )


@register(
    "window_lag_lead_delta",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time: previous/next value and the
    delta to it — one window, one shuffle on the high-card user key."""
    w = W.partitionBy("user_id").orderBy("event_id")
    v = F.col("value")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag(v).over(w).alias("prev_value"),
        F.lead(v).over(w).alias("next_value"),
        (v - F.lag(v).over(w)).alias("delta"),
    )


@register(
    "window_rank_dense_rank",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS price_dense_rank
    FROM orders
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank partitioned by a HIGH-cardinality key
    (o_custkey scales with SF), so window parallelism scales with the
    data instead of capping at the handful of distinct values a
    low-card key like o_orderpriority would give (each of its 5
    partitions would sort millions of rows at 100 TB)."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


# ------------------------------------------------------------ set ops
@register(
    "set_union_active_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + aggregate-on-all-columns, one shuffle."""
    a = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@register(
    "set_intersect_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers appearing in both order populations
    — plans as a left-semi join under a distinct aggregate."""
    a = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000).select("c_custkey")
    b = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@register(
    "set_except_inactive_custkeys",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers in one population but not the other —
    plans as a left-anti join under a distinct aggregate."""
    a = _t(spark, sf_dir, "customer").select("c_custkey")
    b = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return a.subtract(b)  # EXCEPT (distinct) semantics


# ----------------------------------------------------- distinct / agg
@register(
    "distinct_market_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct on a projected column — partial-aggregated before the
    shuffle, so the exchange carries one row per segment per partition."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "agg_stats_lineitem",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty
    FROM lineitem
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total aggregate panel: count/min/max/countDistinct and
    exact-decimal sum/avg in ONE pass over lineitem (no per-metric scans)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        dsum("l_quantity", "total_qty"),
    )


@register(
    "rollup_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals + grand total in one pass."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations in one
    pass; rows expand BEFORE the shuffle but only aggregated rows move."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


# ------------------------------------------------------ scalar funcs
@register(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS lname,
           UPPER(p_brand) AS ubrand,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           SUBSTRING(p_type, 1, 4) AS type4,
           p_brand || '/' || p_type AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           REVERSE(p_name) AS rname,
           LPAD(p_brand, 12, '*') AS brand_pad
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function panel (concat/substring/upper/lower/trim/lpad/
    length/regexp_extract/replace/split) — per-row codegen, no shuffle.

    Exactness: REVERSE assumes ASCII input — Spark reverses UTF-8
    code points while DuckDB reverses grapheme clusters, so a
    combining sequence or astral character in ``p_name`` would
    diverge (the same boundary the md5-raster derivations were
    hardened against in r11). The fixture's ``p_name``/``p_brand``/
    ``p_type`` are ASCII by construction and pinned so
    (tests/test_fixture_schema.py::test_string_fixture_columns_are_ascii);
    a non-ASCII fixture would fail that pin before it could silently
    shift this panel's hashes."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_name").alias("rname"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS order_epoch,
           CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INT) AS days_to_y2k
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal functions — incl. the reference's epoch-seconds
    convention for timestamps (/root/reference/readme.md:25-26)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_y2k"),
    )


@register(
    "scalar_math_functions",
    oracle="""
    SELECT event_id,
           event_id % 7 AS id_mod7,
           ABS(value - 250.0) AS dist_from_250,
           CAST(CEIL(value) AS DOUBLE) AS value_ceil,
           CAST(FLOOR(value) AS DOUBLE) AS value_floor,
           CAST(SIGN(value - 250.0) AS DOUBLE) AS sign_250,
           GREATEST(value, 100.0) AS val_hi,
           LEAST(value, 100.0) AS val_lo
    FROM events
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function panel (abs/round/floor/ceil/sqrt/exp/ln/pow/mod/sign)
    with exact-decimal casts where engines round differently."""
    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        (F.col("event_id") % 7).alias("id_mod7"),
        F.abs(v - 250.0).alias("dist_from_250"),
        F.ceil(v).cast("double").alias("value_ceil"),
        F.floor(v).cast("double").alias("value_floor"),
        F.signum(v - 250.0).alias("sign_250"),
        F.greatest(v, F.lit(100.0)).alias("val_hi"),
        F.least(v, F.lit(100.0)).alias("val_lo"),
    )


@register(
    "scalar_trig_functions",
    oracle="""
    SELECT event_id,
           round(sin(value / 100.0), 6) AS sin_t,
           round(cos(value / 100.0), 6) AS cos_t,
           round(tan(value / 1000.0), 6) AS tan_u,
           round(asin(value / 1000.0), 6) AS asin_u,
           round(acos(value / 1000.0), 6) AS acos_u,
           round(atan(value / 100.0), 6) AS atan_t,
           round(atan2(value, 100.0), 6) AS atan2_v,
           round((exp(2 * value / 100.0) - 1)
                 / (exp(2 * value / 100.0) + 1), 6) AS tanh_t,
           round(degrees(value / 1000.0), 6) AS deg_u,
           round(radians(value), 6) AS rad_v
    FROM events
    """,
)
def scalar_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / inverse-trig / hyperbolic scalar panel
    (sin/cos/tan/asin/acos/atan/atan2/tanh/degrees/radians) — the
    remaining math-function family beside ``scalar_math_functions``.

    Exactness: every argument is DELIBERATELY range-bounded (value/100
    in [0,~5], value/1000 in [0,0.5] for the inverse functions' domain
    and tan's singularity) so each result is O(1) and the engines'
    libm implementations (JVM fdlibm vs C libm, both <=1 ulp) differ
    by at most ~1e-16 absolute — six decimal places below the shared
    round(6) display contract. No unbounded tan and no large-argument
    reduction anywhere. The oracle spells tanh as its exp identity
    (this DuckDB build ships no tanh); the identity's few-ulp error at
    |result|<=1 is likewise ~1e-15, invisible at round(6).

    Plan/scale: pure per-row projection — whole-stage codegen, no
    shuffle, no state; identical at any scale."""
    e = _t(spark, sf_dir, "events")
    t = F.col("value") / 100.0
    u = F.col("value") / 1000.0
    return e.select(
        "event_id",
        F.round(F.sin(t), 6).alias("sin_t"),
        F.round(F.cos(t), 6).alias("cos_t"),
        F.round(F.tan(u), 6).alias("tan_u"),
        F.round(F.asin(u), 6).alias("asin_u"),
        F.round(F.acos(u), 6).alias("acos_u"),
        F.round(F.atan(t), 6).alias("atan_t"),
        F.round(F.atan2(F.col("value"), F.lit(100.0)), 6).alias("atan2_v"),
        F.round(F.tanh(t), 6).alias("tanh_t"),
        F.round(F.degrees(u), 6).alias("deg_u"),
        F.round(F.radians(F.col("value")), 6).alias("rad_v"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access — the `events.props` payload (FIXTURES.md)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@register(
    "case_bucketize_orders",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS price_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS bucket_total
    FROM orders GROUP BY 1
    """,
)
def case_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-expression bucketing of order totals into named bands + one
    aggregate per band — the searched-CASE surface in a grouped plan."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("price_bucket")
    )
    return o.groupBy(bucket).agg(
        F.count("*").alias("n"), dsum("o_totalprice", "bucket_total")
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1))
                  AS DOUBLE) AS new_price,
             'PROCESSED' AS new_status
      FROM orders WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '4')
    SELECT o.o_orderkey,
           COALESCE(u.new_price, o.o_totalprice) AS o_totalprice,
           COALESCE(u.new_status, o.o_orderstatus) AS o_orderstatus,
           u.o_orderkey IS NOT NULL AS was_updated
    FROM orders o LEFT JOIN updates u ON o.o_orderkey = u.o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert semantics without a table format: apply an
    update batch to a base snapshot by key, producing the merged
    snapshot plus an audit flag — WHEN MATCHED THEN UPDATE, WHEN NOT
    MATCHED (on the base side) THEN KEEP, expressed as a left join +
    COALESCE per column. The update batch here is derived
    deterministically (a content-hash quarter of orderkeys gets a
    repriced PROCESSED version) so the oracle can build the identical
    batch; in production the batch is the CDC stream.

    100 TB shape: the join keys on the snapshot's primary key — with
    the base bucketed/sorted on that key (write_sorted_shards) the
    merge is co-partitioned and the update batch (usually ≪ base)
    broadcasts; insert-only rows (WHEN NOT MATCHED INSERT) arrive by
    unioning the updates' anti-join remainder, omitted here because
    the derived batch is update-only. The exact-decimal reprice keeps
    the new price bit-identical to the oracle.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    upd = o.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) < "4"
    ).select(
        F.col("o_orderkey").alias("u_orderkey"),
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(1.1).cast("decimal(3,1)"))
        .cast("double")
        .alias("new_price"),
        F.lit("PROCESSED").alias("new_status"),
    )
    return o.join(upd, F.col("o_orderkey") == F.col("u_orderkey"), "left").select(
        "o_orderkey",
        F.coalesce("new_price", "o_totalprice").alias("o_totalprice"),
        F.coalesce("new_status", "o_orderstatus").alias("o_orderstatus"),
        F.col("u_orderkey").isNotNull().alias("was_updated"),
    )


def _run_sql_text(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Run a ``{p}``-templated SQL text through the front end: register
    sf_dir-prefixed temp views, resolve the text with ``spark.sql``,
    then drop the views again (the returned DataFrame carries its
    analyzed plan — it no longer reads the catalog), so repeated
    builds leave no session-lifetime views behind. The prefix encodes
    the sf_dir so two fixtures in one JVM (sweep at sf0.1 + pytest at
    sf0.01) can't serve each other stale tables."""
    import hashlib

    from vector_db_core_spark.sources import TABLES, register_views

    prefix = f"sqlapi_{hashlib.md5(sf_dir.encode()).hexdigest()[:6]}_"
    register_views(spark, sf_dir, prefix=prefix)
    try:
        return spark.sql(text.format(p=prefix))
    finally:
        for t in TABLES:
            spark.catalog.dropTempView(prefix + t)


_SQL_API_TEXT = """
SELECT n.n_name AS nation,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM {p}nation n
JOIN {p}customer c ON c.c_nationkey = n.n_nationkey
LEFT JOIN {p}orders o ON o.o_custkey = c.c_custkey
GROUP BY n.n_name
"""


@register(
    "sql_api_nation_revenue",
    oracle=_SQL_API_TEXT.format(p=""),
)
def sql_api_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-SQL FRONT END as a first-class entry point: the same
    engine surface every DataFrame query uses, driven through
    ``register_views`` + ``spark.sql`` with ONE query text that runs
    near-verbatim on DuckDB as its own oracle (only the view prefix
    differs — the literal demonstration that a SQL-speaking user of
    the reference can point their query text at this engine). Catalyst
    plans SQL and DataFrame identically — same broadcast decision for
    the bounded nation dim, same exact-DECIMAL revenue discipline
    (CAST inside SUM) the DataFrame queries get from
    ``functions.exact``.

    Generalization beyond this one statement: ALL 22 TPC-H oracle
    texts run verbatim through the same front end and match their
    DataFrame twins row-for-row — pinned by
    tests/test_sql_frontend.py; ``sql_api_tpch_q4`` carries a second
    registered+oracled front-end row under the full hash gate."""
    return _run_sql_text(spark, sf_dir, _SQL_API_TEXT)


_SQL_API_Q4_TEXT = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM {p}orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM {p}lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


@register("sql_api_tpch_q4", oracle=_SQL_API_Q4_TEXT.format(p=""))
def sql_api_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking) driven end-to-end through
    the ANSI-SQL front end: the Spark side IS ``spark.sql`` over
    registered views, and the oracle is the SAME text with the view
    prefix removed — one statement, two engines, hash-identical
    answers. Picked for the correlated EXISTS: it exercises Catalyst's
    subquery DECORRELATION (rewrite to left-semi join with the
    non-equi lateness predicate as a residual), the part of a SQL
    front end a curated SELECT-JOIN-GROUP statement like
    ``sql_api_nation_revenue`` never touches. The
    tests/test_sql_frontend.py sweep additionally pins all 22 TPC-H
    texts as spark.sql-vs-DataFrame parity.

    Plan/scale: identical physical plan to the hand-built DataFrame
    twin (``q4_order_priority_checking``): quarter filter pushed to
    the orders scan, ONE orderkey shuffle for the semi join
    (AQE-splittable), 5-value group key aggregate moving ~nothing."""
    return _run_sql_text(spark, sf_dir, _SQL_API_Q4_TEXT)
