"""Relational query surface over the TPC-H-ish fixture tables.

The reference has no joins/set-ops/rollups (SURVEY.md §2.9) — Spark
provides them natively; these queries exercise that surface with
scale-conscious physical plans: dimension tables broadcast, fact-table
aggregations map-side-combinable, rank windows partitioned by key.

Cross-engine money policy: parquet stores doubles, and a double SUM is
order-dependent — the one thing that breaks value-hash parity between
engines. Every monetary expression is therefore converted per-row to
integer cents/percent (floor(x*100+0.5) — exact on identical input
doubles), summed as BIGINT (order-independent, overflow-safe to sf1000),
and divided back at the end (single float op on identical integers =
bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickdatapipeline_spark.functions.rounding import rnd, sql_rnd
from tickdatapipeline_spark.sources.io import read_parquet

CUTOFF = "1999-12-31"


def _cents(c) -> F.Column:
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


# ---- R1: pricing summary report (TPC-H Q1 shape) ----

def r1_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= CUTOFF)
    qty_c = _cents(F.col("l_quantity"))
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))   # discount in percent units (0..10)
    tax_c = _cents(F.col("l_tax"))
    disc_price = price_c * (100 - disc_c)            # cents*1e2
    charge = disc_price * (100 + tax_c)              # cents*1e4
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / 100.0).alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(disc_price) / 10000.0).alias("sum_disc_price"),
            (F.sum(charge) / 1000000.0).alias("sum_charge"),
            rnd(F.sum(qty_c) / 100.0 / F.count(F.lit(1))).alias("avg_qty"),
            rnd(F.sum(price_c) / 100.0 / F.count(F.lit(1))).alias("avg_price"),
            rnd(F.sum(disc_c).cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_CENTS = "CAST(floor({x} * 100 + 0.5) AS BIGINT)"

R1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       sum({_CENTS.format(x='l_quantity')}) / 100.0 AS sum_qty,
       sum({_CENTS.format(x='l_extendedprice')}) / 100.0 AS sum_base_price,
       sum({_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')})) / 10000.0 AS sum_disc_price,
       sum({_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')}) * (100 + {_CENTS.format(x='l_tax')})) / 1000000.0 AS sum_charge,
       {sql_rnd(f"sum({_CENTS.format(x='l_quantity')}) / 100.0 / count(*)")} AS avg_qty,
       {sql_rnd(f"sum({_CENTS.format(x='l_extendedprice')}) / 100.0 / count(*)")} AS avg_price,
       {sql_rnd(f"CAST(sum({_CENTS.format(x='l_discount')}) AS DOUBLE) / 100.0 / count(*)")} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# ---- R2: top-3 orders per customer by value (rank window + broadcast join) --

def r2_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn("total_cents", _cents(F.col("o_totalprice")))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    w = Window.partitionBy("o_custkey").orderBy(F.col("total_cents").desc(), F.col("o_orderkey"))
    top = (
        orders.withColumn("order_rank", F.row_number().over(w).cast("long"))
        .where(F.col("order_rank") <= 3)
    )
    return (
        top.join(cust, top.o_custkey == cust.c_custkey)  # cust scales with SF: AQE decides
        .select(
            "c_custkey", "c_name", "o_orderkey", "order_rank",
            (F.col("total_cents") / 100.0).alias("o_totalprice"),
        )
    )


R2_SQL = f"""
WITH ranked AS (
    SELECT o_custkey, o_orderkey, {_CENTS.format(x='o_totalprice')} AS total_cents,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY {_CENTS.format(x='o_totalprice')} DESC, o_orderkey) AS BIGINT) AS order_rank
    FROM orders
)
SELECT c_custkey, c_name, o_orderkey, order_rank, total_cents / 100.0 AS o_totalprice
FROM ranked JOIN customer ON o_custkey = c_custkey
WHERE order_rank <= 3
"""

# ---- R3: revenue by region/nation (multi-join, dims broadcast) ----

def r3_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)  # scales with SF: AQE decides
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum(rev) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


R3_SQL = f"""
SELECT r_name, n_name,
       sum({_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')})) / 10000.0 AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""

# ---- R4: rollup by order-year / priority ----

def r4_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn("order_year", F.year("o_orderdate").cast("long"))
    return (
        orders.rollup("order_year", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total_value"),
        )
    )


R4_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year, o_orderpriority,
       count(*) AS n_orders,
       sum({_CENTS.format(x='o_totalprice')}) / 100.0 AS total_value
FROM orders
GROUP BY ROLLUP (order_year, o_orderpriority)
"""

# ---- R5: set ops — building-segment customers who also placed urgent orders,
#          minus those with any low-priority order ----

def r5_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    low = orders.where(F.col("o_orderpriority") == "5-LOW").select(F.col("o_custkey").alias("custkey"))
    return building.intersect(urgent).subtract(low)


R5_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""

# ---- R6: anti join — customers with no orders at all ----

def r6_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


R6_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

# ---- R7: semi join + conditional agg — per-part order stats for parts that
#          actually ship (exercises semi + groupBy on the fact table) ----

def r7_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") >= 40).select("p_partkey", "p_brand")
    j = li.join(part, li.l_partkey == part.p_partkey, "inner")  # part scales with SF: AQE decides
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("total_price"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        )
        .orderBy("p_brand")
    )


R7_SQL = f"""
SELECT p_brand,
       count(*) AS n_lineitems,
       sum({_CENTS.format(x='l_extendedprice')}) / 100.0 AS total_price,
       -- CAST: DuckDB sum(int) is HUGEINT (int128) while Spark's is BIGINT;
       -- pandas renders them differently, breaking the value hash.
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
FROM lineitem JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size >= 40) p
  ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# ---- R8: supplier revenue by nation (the remaining fixture table) ----

def r8_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)  # supplier scales with SF: AQE decides
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.sum(rev) / 10000.0).alias("supplier_revenue"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


R8_SQL = f"""
SELECT n_name,
       sum({_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')})) / 10000.0 AS supplier_revenue,
       count(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

# ---- R9: semi-structured JSON props on the events stream ----

def r9_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.sum(k).alias("sum_k"),
        )
        .orderBy("event_type")
    )


R9_SQL = """
SELECT event_type,
       count(*) AS n_events,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---- R10: cube over segment x priority (completes rollup/cube/grouping) ----

def r10_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)  # cust scales with SF: AQE decides
    return (
        j.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total_value"),
        )
    )


R10_SQL = f"""
SELECT c_mktsegment, o_orderpriority,
       count(*) AS n_orders,
       sum({_CENTS.format(x='o_totalprice')}) / 100.0 AS total_value
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
"""


# ---- R11: pivot (orders count by year x priority, priorities as columns) ----

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


def r11_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("order_year"), "o_orderpriority"
    )
    piv = (
        orders.groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)  # explicit values: no extra distinct pass
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "order_year",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(c) for p, c in zip(_PRIORITIES, _PIV_COLS)],
    )
    return renamed.orderBy("order_year")


R11_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p1_urgent,
       CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p2_high,
       CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3_medium,
       CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4_not_specified,
       CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p5_low
FROM orders
GROUP BY order_year
ORDER BY order_year
"""


# ---- R12: ntile quartiles of customers by balance within nation ----

def r12_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_cents")
    )
    # unique (bal, custkey) order makes ntile deterministic cross-engine
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("bal_cents").desc(), F.col("c_custkey")
    )
    q = cust.withColumn("quartile", F.ntile(4).over(w).cast("long"))
    return (
        q.groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("bal_cents") / 100.0).alias("total_balance"),
        )
        .orderBy("c_nationkey", "quartile")
    )


R12_SQL = f"""
WITH q AS (
    SELECT c_nationkey,
           {_CENTS.format(x='c_acctbal')} AS bal_cents,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY {_CENTS.format(x='c_acctbal')} DESC, c_custkey) AS BIGINT) AS quartile
    FROM customer
)
SELECT c_nationkey, quartile, count(*) AS n_customers,
       sum(bal_cents) / 100.0 AS total_balance
FROM q GROUP BY c_nationkey, quartile
ORDER BY c_nationkey, quartile
"""


# ---- R13: running + sliding window frames (per-customer spend) ----


def r13_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running total and 3-order moving average of order
    value — the ROWS-frame window shapes (UNBOUNDED PRECEDING and
    k PRECEDING) the suite did not yet cover. The unique
    (o_orderdate, o_orderkey) sort key makes frames deterministic
    cross-engine; integer-cents sums keep float parity.

    Scale: both windows partition by o_custkey — one hash exchange,
    no global sort, frames evaluated in a single pass per partition.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    w3 = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum("cents").over(wrun) / 100.0).alias("running_spend"),
        rnd(
            F.sum("cents").over(w3).cast("double")
            / F.count(F.lit(1)).over(w3) / F.lit(100.0)
        ).alias("moving_avg3"),
    )


R13_SQL = f"""
SELECT o_custkey, o_orderkey,
       sum(cents) OVER wrun / 100.0 AS running_spend,
       {sql_rnd('CAST(sum(cents) OVER w3 AS DOUBLE) / count(*) OVER w3 / 100.0')} AS moving_avg3
FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             {_CENTS.format(x='o_totalprice')} AS cents FROM orders)
WINDOW wrun AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w3   AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ---- R14: full-outer join (the one join type the suite lacked) ----

R14_CUST_BAL, R14_SUPP_BAL = 9800, 7000  # both sides miss nations at sf0.01


def r14_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations' high-balance customer vs supplier counts via FULL OUTER
    join — nations rich on only one side surface with a NULL other side
    (2 customer-only and 8 supplier-only nations at sf0.01). Spark's
    ``join(on=..., how="full_outer")`` coalesces the key like SQL USING.

    Scale: both inputs are pre-aggregated to nation cardinality before
    the join — the outer join runs on two tiny frames, never on the raw
    tables.
    """
    hc = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") >= R14_CUST_BAL)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    hs = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") >= R14_SUPP_BAL)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    return hc.join(hs, on="nationkey", how="full_outer")


R14_SQL = f"""
WITH hc AS (
    SELECT c_nationkey AS nationkey, count(*) AS n_rich_customers
    FROM customer WHERE c_acctbal >= {R14_CUST_BAL} GROUP BY 1
),
hs AS (
    SELECT s_nationkey AS nationkey, count(*) AS n_rich_suppliers
    FROM supplier WHERE s_acctbal >= {R14_SUPP_BAL} GROUP BY 1
)
SELECT nationkey, n_rich_customers, n_rich_suppliers
FROM hc FULL OUTER JOIN hs USING (nationkey)
"""


# ---- R15: RANGE window frame (time-based trailing aggregate) ----

R15_TRAIL_DAYS = 30


def r15_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer trailing-30-day spend at each order — the RANGE
    window frame (value-based, includes ALL rows tied on the ordering
    value, so it is deterministic under same-day order ties where a ROWS
    frame would not be). Integer epoch-day ordering keeps the frame
    arithmetic exact on both engines.

    Scale: one hash exchange on o_custkey; the range frame evaluates in
    a single pass per partition.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("day_num"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey").orderBy("day_num")
        .rangeBetween(-(R15_TRAIL_DAYS - 1), 0)
    )
    return orders.select(
        "o_custkey", "o_orderkey", "day_num",
        (F.sum("cents").over(w) / 100.0).alias("trailing_spend"),
        F.count(F.lit(1)).over(w).alias("n_orders_window"),
    )


R15_SQL = f"""
SELECT o_custkey, o_orderkey, day_num,
       sum(cents) OVER w / 100.0 AS trailing_spend,
       count(*) OVER w AS n_orders_window
FROM (SELECT o_custkey, o_orderkey,
             date_diff('day', DATE '1970-01-01', o_orderdate) AS day_num,
             {_CENTS.format(x='o_totalprice')} AS cents
      FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN {R15_TRAIL_DAYS - 1} PRECEDING AND CURRENT ROW)
"""


# ---- R16: small-quantity revenue loss (TPC-H Q17 shape) ----


def r16_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand yearly revenue that would be lost by dropping
    small-quantity line items (quantity below 20% of the part's average
    order quantity) — the TPC-H Q17 shape: a fact-table aggregate joined
    back against the fact table as a per-key scalar threshold.

    Cross-engine exactness: the 0.2x-average comparison is pure integer
    algebra — qty < 0.2 * (sum_qty / n) is evaluated as
    5 * qty_c * n < sum_qty_c with BIGINT cents, so no float threshold
    crosses the engines; the final division on identical BIGINT sums is
    one IEEE op per row.

    Scale: the per-part stats groupBy is map-side combinable and
    shuffles on l_partkey; the threshold join is a self equi-join on the
    SAME key, so AQE plans it against the just-shuffled stats side (at
    sf0.01 it broadcasts; at 100 TB both sides co-partition on
    l_partkey with no extra exchange for the fact side). The part
    dimension joins on p_partkey AFTER the filter has cut the fact rows
    ~20x; the final per-brand rollup is |brands| rows.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        _cents(F.col("l_quantity")).alias("qty_c"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    )
    stats = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum("qty_c").alias("sum_qty_c"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    small = li.join(stats, on="l_partkey").where(
        F.col("qty_c") * 5 * F.col("n_li") < F.col("sum_qty_c")
    )
    return (
        small.join(part, small["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            (F.sum("price_c") / 100.0 / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_li"),
        )
        .orderBy("p_brand")
    )


R16_SQL = f"""
WITH li AS (
    SELECT l_partkey,
           {_CENTS.format(x='l_quantity')} AS qty_c,
           {_CENTS.format(x='l_extendedprice')} AS price_c
    FROM lineitem
),
stats AS (
    SELECT l_partkey, count(*) AS n_li,
           CAST(sum(qty_c) AS BIGINT) AS sum_qty_c
    FROM li GROUP BY l_partkey
)
SELECT p_brand,
       CAST(sum(price_c) AS BIGINT) / 100.0 / 7.0 AS avg_yearly,
       count(*) AS n_small_li
FROM li
JOIN stats USING (l_partkey)
JOIN part ON l_partkey = p_partkey
WHERE qty_c * 5 * n_li < sum_qty_c
GROUP BY p_brand
ORDER BY p_brand
"""


# ---- R17: late-delivery order priority check (TPC-H Q4 shape) ----

R17_LO = "1996-01-01"
R17_HI = "1996-12-31"
R17_LATE_DAYS = 45


def r17_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority in one year that contain at least one
    slow-shipping line item (shipped more than R17_LATE_DAYS days after
    the order date) — the TPC-H Q4 EXISTS shape, the one classic join
    mode the relational surface didn't yet exercise: a LEFT SEMI join
    with a correlated non-equi term (existence test, no fan-out, so no
    dedup pass afterwards). The synthetic lineitem carries no
    commit/receipt dates, so lateness is ship lag vs the order date.

    Dates compare as epoch-day integers on both engines (the fixture
    timestamps are midnight-aligned; Spark datediff truncates to DATE
    exactly like DuckDB's date_diff('day', ...) boundary count).

    Scale: the order-side year filter prunes at the parquet scan; the
    semi join shuffles both sides on the order key and emits each order
    at most once, so the priority rollup is |priorities| rows. A plain
    inner join + distinct would shuffle the same data twice; the semi
    join is the single-pass formulation.
    """
    day = lambda c: F.datediff(c, F.lit("1970-01-01")).cast("long")  # noqa: E731
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= R17_LO) & (F.col("o_orderdate") <= R17_HI)
    ).select("o_orderkey", "o_orderpriority", day(F.col("o_orderdate")).alias("o_day"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", day(F.col("l_shipdate")).alias("l_day")
    )
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_day"] - orders["o_day"] > R17_LATE_DAYS
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


R17_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{R17_LO} 00:00:00'
  AND o_orderdate <= TIMESTAMP '{R17_HI} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND date_diff('day', DATE '1970-01-01', l_shipdate)
                    - date_diff('day', DATE '1970-01-01', o_orderdate)
                    > {R17_LATE_DAYS})
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---- R18: table profiler (data-quality column stats) ----

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def r18_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the lineitem measures — row/null/distinct
    counts plus min/max/sum in exact cents, one output row per column:
    the 'what is actually in this table' data-quality sweep that runs
    before any pipeline trusts a new drop of data.

    Scale: ONE pass over the fact table — all per-column aggregates run
    in a single groupBy-less agg (Catalyst expands the multiple
    count-distincts; at extreme cardinalities swap them for
    approx_count_distinct the way the DAU twin does). The unpivot to
    long form happens on the single 1-row aggregate output, map-side.
    """
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        cc = _cents(F.col(c))
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(cc).alias(f"{c}__distinct"),
            F.min(cc).alias(f"{c}__min"),
            F.max(cc).alias(f"{c}__max"),
            F.sum(cc).alias(f"{c}__sum"),
        ]
    wide = li.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_c"),
            F.col(f"{c}__max").alias("max_c"),
            F.col(f"{c}__sum").alias("sum_c"),
        )
        for c in PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def _profile_col_sql(c: str) -> str:
    cents = _CENTS.format(x=c)
    return f"""
SELECT '{c}' AS column_name,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {cents}) AS n_distinct,
       min({cents}) AS min_c,
       max({cents}) AS max_c,
       CAST(sum({cents}) AS BIGINT) AS sum_c
FROM lineitem"""


R18_SQL = "\nUNION ALL\n".join(_profile_col_sql(c) for c in PROFILE_COLS)


# ---- R19: idle high-balance customers (TPC-H Q22 shape) ----


R19_CUTOFF = "1999-01-01"


def r19_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count and total balance of customers whose balance is
    above the average positive balance AND who have placed no order
    since R19_CUTOFF (churned-rich) — the TPC-H Q22 shape: a 1-row
    scalar-aggregate threshold combined with a LEFT ANTI existence
    join (every fixture customer has SOME order, so the anti side is
    date-restricted to keep the query discriminating).

    Cross-engine exactness: the above-average test is integer algebra
    (bal_c * n_pos > sum_pos_c in BIGINT cents), so no float threshold
    crosses engines; the final division on identical sums is one IEEE
    op.

    Scale: the positive-balance stats aggregate is ONE broadcast row;
    the anti join shuffles customers and the orders key projection
    co-partitioned on custkey (orders prunes to the single o_custkey
    column at the scan); the nation rollup is |nations| rows.
    """
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_c")
    )
    stats = cust.where(F.col("bal_c") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"), F.sum("bal_c").alias("sum_pos_c")
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= R19_CUTOFF
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(stats))
        .where(F.col("bal_c") * F.col("n_pos") > F.col("sum_pos_c"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("bal_c") / 100.0).alias("total_balance"),
        )
        .orderBy("c_nationkey")
    )


R19_SQL = f"""
WITH cust AS (
    SELECT c_custkey, c_nationkey, {_CENTS.format(x='c_acctbal')} AS bal_c
    FROM customer
),
stats AS (
    SELECT count(*) AS n_pos, CAST(sum(bal_c) AS BIGINT) AS sum_pos_c
    FROM cust WHERE bal_c > 0
)
SELECT c_nationkey, count(*) AS n_customers,
       CAST(sum(bal_c) AS BIGINT) / 100.0 AS total_balance
FROM cust, stats
WHERE bal_c * n_pos > sum_pos_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{R19_CUTOFF} 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---- R20: shipping-priority revenue top-k (TPC-H Q3 shape) ----

R20_SEGMENT = "BUILDING"
R20_DATE = "1998-06-30"
R20_K = 10


def r20_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K unshipped orders by outstanding revenue for one market
    segment — the TPC-H Q3 shape: two date filters on opposite sides of
    a cutoff, a three-table join, and a top-K that must plan as
    TakeOrdered (per-partition partial top-K), never a global sort.

    Cross-engine exactness: revenue accumulates as BIGINT
    cents x (100 - discount%) units; the ORDER BY ranks the integer (no
    float ties), and the final division is one IEEE op per output row.

    Scale: both fact scans prune at parquet (segment/date pushdown);
    the customer side reduces to the segment subset before the join;
    revenue aggregates map-side-combinable on l_orderkey.
    """
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == R20_SEGMENT
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < R20_DATE
    ).select("o_orderkey", "o_custkey", "o_orderpriority",
             F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("o_day"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > R20_DATE).select(
        "l_orderkey",
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).alias("rev_u"),
    )
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_day", "o_orderpriority")
        .agg(F.sum("rev_u").alias("rev_u"))
        .orderBy(F.col("rev_u").desc(), "o_orderkey")
        .limit(R20_K)
        .select(
            "o_orderkey",
            (F.col("rev_u") / 10000.0).alias("revenue"),
            "o_day",
            "o_orderpriority",
        )
    )


R20_SQL = f"""
SELECT o_orderkey,
       CAST(sum(rev_u) AS BIGINT) / 10000.0 AS revenue,
       o_day, o_orderpriority
FROM (
    SELECT o.o_orderkey, o.o_orderpriority,
           date_diff('day', DATE '1970-01-01', o.o_orderdate) AS o_day,
           {_CENTS.format(x='l.l_extendedprice')} * (100 - {_CENTS.format(x='l.l_discount')}) AS rev_u
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = '{R20_SEGMENT}'
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '{R20_DATE} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{R20_DATE} 00:00:00'
)
GROUP BY o_orderkey, o_day, o_orderpriority
ORDER BY CAST(sum(rev_u) AS BIGINT) DESC, o_orderkey
LIMIT {R20_K}
"""


# ---- R21: nation-pair trade volume (TPC-H Q7 shape) ----

R21_NATION_A, R21_NATION_B = "NATION_1", "NATION_2"
R21_LO, R21_HI = "1996-01-01", "1997-12-31"


def r21_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations by ship year — the TPC-H Q7
    shape: a five-table join where the two nation dimensions join the
    SAME tiny table under different roles (supplier's vs customer's
    nation), with a disjunctive nation-pair predicate and a ship-date
    range.

    Cross-engine exactness: revenue is the BIGINT
    cents x (100 - discount%) accumulation; one IEEE division per
    output row.

    Scale: both nation sides broadcast (25-row dimension); supplier is
    SF-scaled so its join is left to AQE; the date filter
    prunes the lineitem scan at parquet; the only big shuffles are
    lineitem->orders (orderkey) and orders->customer (custkey). The
    pair predicate applies AFTER the nation joins on broadcast rows —
    no fact-side OR in the scan, so pushdown stays simple equalities.
    """
    nations = (R21_NATION_A, R21_NATION_B)
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(R21_LO, R21_HI + " 23:59:59")
    ).select(
        "l_orderkey", "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).alias("rev_u"),
    )
    n1 = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations)) \
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations)) \
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])  # SF-scaled: AQE decides
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == R21_NATION_A) & (F.col("cust_nation") == R21_NATION_B))
            | ((F.col("supp_nation") == R21_NATION_B) & (F.col("cust_nation") == R21_NATION_A))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("rev_u") / 10000.0).alias("revenue"))
    )


R21_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev_u) AS BIGINT) / 10000.0 AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_CENTS.format(x='l.l_extendedprice')} * (100 - {_CENTS.format(x='l.l_discount')}) AS rev_u
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = '{R21_NATION_A}' AND n2.n_name = '{R21_NATION_B}')
        OR (n1.n_name = '{R21_NATION_B}' AND n2.n_name = '{R21_NATION_A}'))
      AND l.l_shipdate BETWEEN TIMESTAMP '{R21_LO} 00:00:00'
                           AND TIMESTAMP '{R21_HI} 23:59:59'
)
GROUP BY supp_nation, cust_nation, l_year
"""


# ---- R22: sole-late-supplier ranking (TPC-H Q21 shape) ----

R22_LATE_DAYS = 90
R22_K = 10


def r22_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who, alone, held up multi-supplier finished orders —
    the TPC-H Q21 shape (this schema has no commit/receipt dates, so
    "late" is shipping more than {R22_LATE_DAYS} days after the order
    date). Q21's correlated EXISTS ("another supplier in the order") /
    NOT EXISTS ("no OTHER supplier was late") is re-expressed as ONE
    per-order aggregate — n_suppliers >= 2 AND n_late_suppliers == 1 —
    which Spark executes as map-side-combinable distinct counts instead
    of two additional self-joins of the fact table; the SQL twin uses
    the identical formulation, so the gate compares like for like.

    Scale: one orderkey-partitioned aggregate over the pruned (status
    F) join; the supplier attribution joins the per-order verdicts
    (small) back to the distinct late (order, supplier) pairs; the
    top-K plans as TakeOrdered.
    """
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F") \
        .select("o_orderkey", "o_orderdate")
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), R22_LATE_DAYS))
            .alias("late"),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    sole = (
        li.where(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            on="l_orderkey",
        )
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(supp, sole["l_suppkey"] == supp["s_suppkey"])  # SF-scaled: AQE decides
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(R22_K)
    )


R22_SQL = f"""
WITH li AS (
    SELECT l.l_orderkey, l.l_suppkey,
           l.l_shipdate > o.o_orderdate + INTERVAL {R22_LATE_DAYS} DAY AS late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
),
per_order AS (
    SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
    FROM li GROUP BY l_orderkey
),
sole AS (
    SELECT DISTINCT w.l_orderkey, w.l_suppkey
    FROM li w
    JOIN per_order p ON w.l_orderkey = p.l_orderkey
                    AND p.n_supp >= 2 AND p.n_late_supp = 1
    WHERE w.late
)
SELECT s.s_name, count(*) AS numwait
FROM sole JOIN supplier s ON sole.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT {R22_K}
"""


# ---- R24: promo revenue share (TPC-H Q14 shape) ----

R24_LO, R24_HI = "1997-09-01", "1997-09-30"


def r24_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue from promotional parts — the TPC-H
    Q14 shape: a conditional aggregate ratio over a date-windowed
    fact/dimension join, the pattern behind every "what fraction of X
    was Y" KPI.

    Cross-engine exactness: both the promo and total revenue
    accumulate as BIGINT cents x (100 - discount%); the percentage is
    ONE double division of two exact integers, rounded with the shared
    policy — no float SUM ever crosses rows.

    Scale: the month filter prunes the lineitem scan; part (projected
    to two columns) is SF-scaled so AQE picks its join side; the ratio is a single
    map-side-combinable conditional aggregate — no second pass, no
    join reordering hazard.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(R24_LO, R24_HI + " 23:59:59")
    ).select(
        "l_partkey",
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).alias("rev_u"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])  # SF-scaled: AQE decides
    return j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_u")).otherwise(F.lit(0).cast("long"))).alias("promo_u"),
        F.sum("rev_u").alias("total_u"),
    ).select(
        (F.col("promo_u") / 10000.0).alias("promo_revenue"),
        (F.col("total_u") / 10000.0).alias("total_revenue"),
        rnd(F.lit(100.0) * F.col("promo_u").cast("double") / F.col("total_u").cast("double")).alias("promo_share_pct"),
    )


R24_SQL = f"""
SELECT CAST(promo_u AS BIGINT) / 10000.0 AS promo_revenue,
       CAST(total_u AS BIGINT) / 10000.0 AS total_revenue,
       {sql_rnd('100.0 * CAST(promo_u AS DOUBLE) / CAST(total_u AS DOUBLE)')} AS promo_share_pct
FROM (
    SELECT sum(CASE WHEN p.p_type = 'PROMO' THEN rev_u ELSE 0 END) AS promo_u,
           sum(rev_u) AS total_u
    FROM (
        SELECT l_partkey,
               {_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')}) AS rev_u
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '{R24_LO} 00:00:00'
                             AND TIMESTAMP '{R24_HI} 23:59:59'
    ) l
    JOIN part p ON l.l_partkey = p.p_partkey
)
"""


# ---- R25: large-volume customers (TPC-H Q18 shape) ----

R25_MIN_QTY = 300
R25_K = 20


def r25_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose single orders exceed a total-quantity threshold —
    the TPC-H Q18 shape: a HAVING aggregate over the fact table whose
    survivors (a tiny set) join back to orders and customer; the
    classic aggregate-then-semi-join pattern that must NEVER join the
    full fact table to customers first.

    Cross-engine exactness: quantities sum as exact cents; the top-K
    ranks (total price cents, orderkey) — all integers, no float ties.

    Scale: the HAVING aggregate is map-side-combinable on l_orderkey;
    its survivor set (orders over the threshold) is small enough that
    AQE broadcasts it into both subsequent joins; top-K plans as
    TakeOrdered.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", _cents(F.col("l_quantity")).alias("qty_c")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty_c").alias("qty_c_sum"))
        .where(F.col("qty_c_sum") > R25_MIN_QTY * 100)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        _cents(F.col("o_totalprice")).alias("price_c"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("o_day"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("price_c").desc(), "o_orderkey")
        .limit(R25_K)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_day",
            (F.col("price_c") / 100.0).alias("total_price"),
            (F.col("qty_c_sum") / 100.0).alias("sum_qty"),
        )
    )


R25_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       date_diff('day', DATE '1970-01-01', o.o_orderdate) AS o_day,
       {_CENTS.format(x='o.o_totalprice')} / 100.0 AS total_price,
       CAST(b.qty_c_sum AS BIGINT) / 100.0 AS sum_qty
FROM (
    SELECT l_orderkey, sum({_CENTS.format(x='l_quantity')}) AS qty_c_sum
    FROM lineitem GROUP BY l_orderkey
    HAVING sum({_CENTS.format(x='l_quantity')}) > {R25_MIN_QTY * 100}
) b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY {_CENTS.format(x='o.o_totalprice')} DESC, o.o_orderkey
LIMIT {R25_K}
"""


# ---- R29: top supplier(s) by quarter revenue (TPC-H Q15 shape) ----

R29_LO, R29_HI = "1997-01-01", "1997-03-31"


def r29_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) whose quarterly revenue equals the maximum — the
    TPC-H Q15 shape: an aggregate compared against the scalar MAX of
    the same aggregate (the reference formulates it as a view used
    twice), which must plan as one aggregate + a broadcast 1-row max,
    never a re-aggregation per row or a rank-the-world sort.

    Cross-engine exactness: revenue is BIGINT cents units end to end;
    the equality against the max is integer, so 'all tied winners'
    needs no epsilon.

    Scale: the quarter filter prunes the lineitem scan; ONE map-side-
    combinable supplier aggregate, its 1-row MAX broadcast back; the
    SF-scaled supplier name join is left to AQE.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(R29_LO, R29_HI + " 23:59:59")
    ).select(
        "l_suppkey",
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).alias("rev_u"),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("rev_u").alias("rev_u"))
    mx = rev.agg(F.max("rev_u").alias("max_u"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_u") == F.col("max_u"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))  # SF-scaled: AQE
        .select(
            "s_suppkey", "s_name",
            (F.col("rev_u") / 10000.0).alias("total_revenue"),
        )
    )


R29_SQL = f"""
WITH rev AS (
    SELECT l_suppkey,
           CAST(sum({_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')})) AS BIGINT) AS rev_u
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '{R29_LO} 00:00:00'
                         AND TIMESTAMP '{R29_HI} 23:59:59'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.rev_u / 10000.0 AS total_revenue
FROM rev
JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.rev_u = (SELECT max(rev_u) FROM rev)
"""


# ---- R23: disjunctive-bracket revenue (TPC-H Q19 shape) ----

R23_BRACKETS = (  # (brand, max_size, qty_lo, qty_hi)
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
)


def r23_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue over three disjunctive brand/size/quantity
    brackets — the TPC-H Q19 shape: an OR-of-ANDs predicate spanning
    BOTH join sides, the classic test that the optimizer still pushes
    the per-side residuals (quantity range to lineitem, brand/size to
    part) under a disjunction instead of filtering after the join.

    Cross-engine exactness: quantities compare in exact cents (the
    driver stores them as whole-number doubles); revenue is the shared
    BIGINT cents x (100 - discount%) accumulation — one row out, one
    division.

    Scale: part is SF-scaled so its join is left to AQE (it broadcasts
    whenever the bracket subset fits); lineitem keeps only the union quantity
    range at the scan (Catalyst derives l_quantity bounds from the OR),
    and the bracket predicate evaluates post-join on codegen'd columns.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        _cents(F.col("l_quantity")).alias("qty_c"),
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).alias("rev_u"),
    )
    cond = None
    for brand, max_size, lo, hi in R23_BRACKETS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("qty_c").between(lo * 100, hi * 100)
        )
        cond = c if cond is None else (cond | c)
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])  # SF-scaled: AQE decides
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("rev_u") / 10000.0).alias("revenue"),
        )
    )


_R23_PRED = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {ms}"
    f" AND {_CENTS.format(x='l.l_quantity')} BETWEEN {lo * 100} AND {hi * 100})"
    for b, ms, lo, hi in R23_BRACKETS
)

R23_SQL = f"""
SELECT count(*) AS n_lines,
       CAST(sum({_CENTS.format(x='l.l_extendedprice')} * (100 - {_CENTS.format(x='l.l_discount')})) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_R23_PRED}
"""


# ---- R26: national market share (TPC-H Q8 shape) ----

R26_REGION = "ASIA"
R26_NATION = "NATION_2"
R26_PTYPE = "STANDARD"


def r26_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's market for one part type, by
    order year — the TPC-H Q8 shape: a six-table join where nation
    joins twice under different roles (the customer's nation scopes the
    MARKET via region; the supplier's nation is the SHARE numerator),
    finished by a conditional-aggregate ratio per group.

    Cross-engine exactness: both ratio legs accumulate BIGINT cents;
    one rounded double division per year row.

    Scale: nation/region broadcast (fixed 25/5 rows); the SF-scaled
    part subset and supplier chain are left to AQE; the only big shuffles are
    lineitem->orders and orders->customer on their keys; the ratio is
    a map-side-combinable conditional aggregate over |years| rows.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == R26_PTYPE) \
        .select("p_partkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == R26_REGION) \
        .select("r_regionkey")
    mkt_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select(F.col("n_nationkey").alias("mkt_nkey"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey") \
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey") \
        .join(F.broadcast(mkt_nations), F.col("c_nationkey") == F.col("mkt_nkey")) \
        .select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).alias("rev_u"),
    )
    j = (
        li.join(part, li["l_partkey"] == part["p_partkey"])  # SF-scaled sides:
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])  # AQE decides
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
    )
    return (
        j.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == R26_NATION, F.col("rev_u"))
                  .otherwise(F.lit(0).cast("long"))).alias("nation_u"),
            F.sum("rev_u").alias("total_u"),
        )
        .select(
            "o_year",
            (F.col("nation_u") / 10000.0).alias("nation_revenue"),
            (F.col("total_u") / 10000.0).alias("total_revenue"),
            rnd(F.col("nation_u").cast("double") / F.col("total_u").cast("double")).alias("mkt_share"),
        )
    )


R26_SQL = f"""
SELECT o_year,
       CAST(nation_u AS BIGINT) / 10000.0 AS nation_revenue,
       CAST(total_u AS BIGINT) / 10000.0 AS total_revenue,
       {sql_rnd('CAST(nation_u AS DOUBLE) / CAST(total_u AS DOUBLE)')} AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           sum(CASE WHEN ns.n_name = '{R26_NATION}' THEN rev_u ELSE 0 END) AS nation_u,
           sum(rev_u) AS total_u
    FROM (
        SELECT l_orderkey, l_partkey, l_suppkey,
               {_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')}) AS rev_u
        FROM lineitem
    ) l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{R26_PTYPE}'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = '{R26_REGION}'
    GROUP BY 1
)
"""


# ---- R27: returned-item revenue ranking (TPC-H Q10 shape) ----

R27_LO, R27_HI = "1997-01-01", "1997-03-31"
R27_K = 20


def r27_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in one quarter — the
    TPC-H Q10 shape: a date-windowed fact join filtered to returned
    lines (l_returnflag = 'R'), aggregated per customer with nation
    context, top-K by lost revenue.

    Cross-engine exactness: revenue accumulates as BIGINT cents units;
    the top-K ranks (revenue units, custkey) — all integers.

    Scale: the quarter filter prunes orders at the scan and the
    returnflag filter prunes lineitem (both pushed); nation broadcasts;
    the per-customer aggregate is map-side-combinable; top-K plans as
    TakeOrdered.
    """
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(R27_LO, R27_HI + " 23:59:59")
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).alias("rev_u"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_c")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("rev_u").alias("rev_u"))
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .orderBy(F.col("rev_u").desc(), "c_custkey")
        .limit(R27_K)
        .select(
            "c_custkey", "c_name",
            (F.col("rev_u") / 10000.0).alias("lost_revenue"),
            (F.col("bal_c") / 100.0).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
    )


R27_SQL = f"""
SELECT c.c_custkey, c.c_name,
       CAST(b.rev_u AS BIGINT) / 10000.0 AS lost_revenue,
       {_CENTS.format(x='c.c_acctbal')} / 100.0 AS acctbal,
       n.n_name AS nation
FROM (
    SELECT o.o_custkey,
           sum({_CENTS.format(x='l.l_extendedprice')} * (100 - {_CENTS.format(x='l.l_discount')})) AS rev_u
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate BETWEEN TIMESTAMP '{R27_LO} 00:00:00'
                            AND TIMESTAMP '{R27_HI} 23:59:59'
    GROUP BY o.o_custkey
) b
JOIN customer c ON b.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY CAST(b.rev_u AS BIGINT) DESC, c.c_custkey
LIMIT {R27_K}
"""


# ---- R28: per-customer order cadence (lead/percent_rank windows) ----

R28_MIN_ORDERS = 8


def r28_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order cadence: the gap in days to each customer's
    NEXT order (lead window) and where that gap sits in the customer's
    own gap distribution (percent_rank) — the repeat-purchase /
    churn-risk signal, and the window-function breadth the surface
    lacked (lead + percent_rank; lag/ntile/running frames live in
    r13/r12/r15).

    Only customers with at least {R28_MIN_ORDERS} orders report (a
    distribution over 2 gaps is noise). Deterministic: order dates tie-
    break by o_orderkey; percent_rank runs on the integer (gap_days,
    next o_orderkey) pair so equal gaps rank identically cross-engine.

    Scale: ONE hash exchange on o_custkey serves the lead window, the
    gap-rank window and the per-customer count (same key — Catalyst
    reuses the partitioning); output is one row per kept gap.
    """
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("o_day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_day", "o_orderkey")
    gaps = (
        o.withColumn("next_day", F.lead("o_day").over(w))
        .withColumn("next_key", F.lead("o_orderkey").over(w))
        .withColumn("n_orders", F.count(F.lit(1)).over(Window.partitionBy("o_custkey")))
        .where(F.col("next_day").isNotNull() & (F.col("n_orders") >= R28_MIN_ORDERS))
        .select(
            "o_custkey", "o_orderkey", "o_day",
            (F.col("next_day") - F.col("o_day")).alias("gap_days"),
            "next_key",
        )
    )
    wr = Window.partitionBy("o_custkey").orderBy("gap_days", "next_key")
    return gaps.select(
        "o_custkey", "o_orderkey", "o_day", "gap_days",
        rnd(F.percent_rank().over(wr)).alias("gap_pct_rank"),
    )


R28_SQL = f"""
WITH o AS (
    SELECT o_custkey, o_orderkey,
           date_diff('day', DATE '1970-01-01', o_orderdate) AS o_day
    FROM orders
),
gaps AS (
    SELECT o_custkey, o_orderkey, o_day,
           lead(o_day) OVER w - o_day AS gap_days,
           lead(o_orderkey) OVER w AS next_key,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_day, o_orderkey)
)
SELECT o_custkey, o_orderkey, o_day, gap_days,
       {sql_rnd('percent_rank() OVER (PARTITION BY o_custkey ORDER BY gap_days, next_key)')} AS gap_pct_rank
FROM gaps
WHERE gap_days IS NOT NULL AND n_orders >= {R28_MIN_ORDERS}
"""


# ---- R30: customer order-count distribution (TPC-H Q13 shape) ----

R30_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


def r30_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N qualifying orders, for every
    N including zero — the TPC-H Q13 shape (LEFT OUTER join + count +
    a second aggregate over the counts). The fixture orders carry no
    comment column, so the Q13 ``NOT LIKE '%special%requests%'``
    exclusion is played by one order-priority class.

    Scale: the fact table is aggregated to per-customer counts FIRST
    (map-side combinable groupBy on o_custkey), so the outer join is
    1:1 on the customer key — |customer| rows meet |active customers|
    rows, never |customer| x |orders|. The second groupBy runs over
    |customer| rows and yields the tiny distribution. Both key columns
    prune to 2 ints at the scan.
    """
    cnt = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != R30_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(cnt, cust["c_custkey"] == cnt["o_custkey"], "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


R30_SQL = f"""
WITH cnt AS (
    SELECT o_custkey, count(*) AS n
    FROM orders
    WHERE o_orderpriority <> '{R30_EXCLUDED_PRIORITY}'
    GROUP BY o_custkey
)
SELECT COALESCE(n, 0) AS c_count, count(*) AS custdist
FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


# ---- R31: product-line profit by nation and year (TPC-H Q9 shape) ----

R31_NAME_TOKEN = "red"


def r31_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation per ship year for one product line —
    the TPC-H Q9 shape: the fact table joined to part (filtered by a
    name substring), supplier, and nation, with a derived measure that
    subtracts cost from discounted revenue. The fixture has no partsupp
    table, so supply cost is played by p_retailprice x quantity.

    Exactness: revenue and cost both live at the 1e-4-dollar scale
    (cents x percent and cents x hundredth-qty respectively), summed as
    BIGINT and divided once at the end — order-independent, so the
    hash matches DuckDB despite the 4-way join's nondeterministic row
    order.

    Scale: part and supplier scale with SF but stay orders of magnitude
    below lineitem — AQE picks broadcast vs shuffle per SF (same
    posture as R21/R26); nation (25 rows) is explicitly broadcast. The
    p_name filter prunes the part side before the join, which under
    AQE turns into dynamic partition pruning of the fact scan at real
    SFs. The final aggregate is |nations| x |years| rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").contains(R31_NAME_TOKEN)
    ).select("p_partkey", _cents(F.col("p_retailprice")).alias("retail_c"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
        - _cents(F.col("l_quantity")) * F.col("retail_c")
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").cast("long").alias("o_year"))
        .agg((F.sum(profit) / 10000.0).alias("sum_profit"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("nation", F.desc("o_year"))
    )


R31_SQL = f"""
SELECT n_name AS nation,
       year(l_shipdate) AS o_year,
       CAST(sum({_CENTS.format(x='l_extendedprice')} * (100 - {_CENTS.format(x='l_discount')})
                - {_CENTS.format(x='l_quantity')} * {_CENTS.format(x='p_retailprice')}) AS BIGINT)
           / 10000.0 AS sum_profit,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{R31_NAME_TOKEN}%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---- R32: priority mix by line status in a ship year (TPC-H Q12 shape) ----

R32_YEAR = 1997
R32_HIGH = ("1-URGENT", "2-HIGH")


def r32_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per line status, how many lines shipped in one year belong to
    high- vs low-priority orders — the TPC-H Q12 shape: a fact-to-fact
    equi-join (lineitem x orders on the order key) feeding two
    conditional counts. The fixture lineitem has no l_shipmode, so
    l_linestatus plays the grouping column.

    Scale: the year filter is written as a shipdate RANGE (not
    ``year(..) = Y``, which no engine pushes past the function call) so
    it prunes at the parquet scan; the join shuffles both sides on the
    order key (no small side — this is the one TPC-H join AQE cannot
    broadcast) and the conditional counts are map-side combinable into
    |statuses| rows. Each side projects only its join key + 1 column.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= f"{R32_YEAR}-01-01")
        & (F.col("l_shipdate") < f"{R32_YEAR + 1}-01-01")
    ).select("l_orderkey", "l_linestatus")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin(*R32_HIGH).cast("long")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(F.sum(high).alias("high_line_count"),
             F.sum(1 - high).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


R32_SQL = f"""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('{R32_HIGH[0]}', '{R32_HIGH[1]}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('{R32_HIGH[0]}', '{R32_HIGH[1]}')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{R32_YEAR}-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '{R32_YEAR + 1}-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---- R33: supplier variety per part segment (TPC-H Q16 shape) ----

R33_EXCLUDED_TYPE = "PROMO"


def r33_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers have shipped parts of each
    (brand, size) segment, excluding one part type and excluding
    suppliers in arrears — the TPC-H Q16 shape (COUNT DISTINCT with a
    NOT-IN supplier exclusion). The fixture has no partsupp, so the
    part-supplier relation is derived from lineitem; no s_comment, so
    the complaint filter is played by negative account balance.

    Scale: lineitem is reduced to DISTINCT (l_partkey, l_suppkey)
    pairs FIRST — a map-side-combinable distinct that collapses the
    fact table to the much smaller relation Q16 reads from partsupp —
    before any join. The arrears exclusion is a broadcast anti-join
    (|bad suppliers| << |suppliers|), and the final aggregate is Q16's
    count(DISTINCT l_suppkey): a supplier shipping several parts of the
    same (brand, size) counts once, exercising
    distinct-aggregation-after-anti-join.
    """
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    part = _t(spark, sf_dir, "part").where(
        ~F.col("p_type").startswith(R33_EXCLUDED_TYPE)
    ).select("p_partkey", "p_brand", "p_size")
    bad = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        pairs.join(part, pairs["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(bad), pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


R33_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_type NOT LIKE '{R33_EXCLUDED_TYPE}%'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# ---- R34: dominant suppliers of a product line (TPC-H Q20 shape) ----

R34_YEAR = 1996
R34_NAME_PREFIX = "small"
R34_SHARE_PM = 300  # dominance threshold in per-mille of the part's year qty


def r34_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than R34_SHARE_PM/1000 of some
    'small %' part's total quantity in one year — the TPC-H Q20 shape:
    a nested aggregate (per part-supplier qty vs per-part total)
    gating a supplier semi-join. The fixture has no partsupp, so Q20's
    ``ps_availqty > 0.5 x shipped`` becomes a share-of-part-total
    dominance test on the same nested-aggregate skeleton.

    Exactness: the share test multiplies integers (qty_sp * 1000 >
    total * R34_SHARE_PM) — no float division crosses the oracle.

    Scale: the fact is aggregated to (partkey, suppkey) granularity
    first; the per-part total is a window SUM over that aggregate
    (partitioned by partkey — bounded by suppliers-per-part, no
    self-join). Only qualifying suppkeys — a key set far smaller than
    the fact — reach the semi-join against supplier.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= f"{R34_YEAR}-01-01")
        & (F.col("l_shipdate") < f"{R34_YEAR + 1}-01-01")
    ).select("l_partkey", "l_suppkey", _cents(F.col("l_quantity")).alias("qty_c"))
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").startswith(R34_NAME_PREFIX)
    ).select("p_partkey")
    sp = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty_c").alias("qty_sp"))
    )
    total = Window.partitionBy("l_partkey")
    dominant = (
        sp.withColumn("part_total", F.sum("qty_sp").over(total))
        .where(F.col("qty_sp") * 1000 > F.col("part_total") * R34_SHARE_PM)
        .select("l_suppkey").distinct()
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.join(dominant, sup["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", rnd(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


R34_SQL = f"""
WITH sp AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum({_CENTS.format(x='l_quantity')}) AS BIGINT) AS qty_sp
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{R34_YEAR}-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '{R34_YEAR + 1}-01-01 00:00:00'
      AND p_name LIKE '{R34_NAME_PREFIX}%'
    GROUP BY 1, 2
),
dom AS (
    SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, qty_sp,
               sum(qty_sp) OVER (PARTITION BY l_partkey) AS part_total
        FROM sp
    ) WHERE qty_sp * 1000 > part_total * {R34_SHARE_PM}
)
SELECT s_suppkey, s_name, {sql_rnd('s_acctbal', 2)} AS s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
ORDER BY s_suppkey
"""


# ---- R35: forecast revenue change (TPC-H Q6 shape) ----

R35_YEAR = 1997
R35_DISC_LO_C = 5   # discount band, percent units (fixture stores 0.00-0.10)
R35_DISC_HI_C = 7
R35_QTY_LT_C = 2400  # quantity < 24.00, hundredths


def r35_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be recovered by dropping a discount band for
    low-quantity lines in one year — TPC-H Q6: the canonical
    scan-filter-aggregate with zero joins. Kept as a shape of its own
    because it is THE predicate-pushdown probe: a raw-column range
    filter per predicate must reach the parquet scan, and the whole
    query is one map-side-combinable partial aggregate into a single
    row (asserted in the plan-shape suite).

    Exactness vs pushdown: the EXACT band tests run on integer cents
    (floor(x*100+0.5) — identical on both engines), which no scanner
    pushes past the floor(); each cents predicate is therefore paired
    with a strictly-weaker raw-column range that IS pushable (cents in
    [5,7] implies raw in [0.045, 0.075); the superset [0.04, 0.08]
    prunes row groups at the scan, the cents band then decides
    exactly). Same for the year (date range, not year()=Y) and the
    quantity cap. Price x discount lives at the 1e-4-dollar scale,
    summed BIGINT, divided once.
    """
    li = _t(spark, sf_dir, "lineitem")
    qty_c = _cents(F.col("l_quantity"))
    disc_c = _cents(F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= f"{R35_YEAR}-01-01")
            & (F.col("l_shipdate") < f"{R35_YEAR + 1}-01-01")
            & (F.col("l_discount") >= 0.04) & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24.01)
            & disc_c.between(R35_DISC_LO_C, R35_DISC_HI_C)
            & (qty_c < R35_QTY_LT_C)
        )
        .agg(
            (F.sum(_cents(F.col("l_extendedprice")) * disc_c) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


R35_SQL = f"""
SELECT CAST(sum({_CENTS.format(x='l_extendedprice')} * {_CENTS.format(x='l_discount')}) AS BIGINT)
           / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{R35_YEAR}-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '{R35_YEAR + 1}-01-01 00:00:00'
  AND l_discount >= 0.04 AND l_discount <= 0.08
  AND l_quantity < 24.01
  AND {_CENTS.format(x='l_discount')} BETWEEN {R35_DISC_LO_C} AND {R35_DISC_HI_C}
  AND {_CENTS.format(x='l_quantity')} < {R35_QTY_LT_C}
"""


# ---- R36: fuzzy part-name matching (blocked entity resolution) ----

R36_MAX_LEV = 3


def r36_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution shape: near-identical part names found by
    BLOCKING + edit-distance verification — the standard fuzzy-join
    recipe (an unblocked levenshtein self-join is O(n^2) on the whole
    table; blocking makes it sum of per-block n^2, the same cost shape
    as LSH dedup). The block key is the name's last word (the noun in
    the fixture's "adjective noun" names), so only same-noun parts are
    compared; levenshtein is exact integer DP in both engines.

    The match runs over the NAME DICTIONARY, not part rows: names are
    deduped (with their part multiplicities) before the self-join, so
    the quadratic work is |distinct names per block|^2, independent of
    how many parts share a name — the dedupe-then-match decomposition
    every fuzzy join at scale uses (the row-level pairing is a re-join
    on the matched names).

    Output: (name_a, name_b, lev, n_parts_a, n_parts_b) for lev <= 3,
    name_a < name_b within a block.

    Scale: the self-join shuffles on the block key; a skewed block
    (one noun dominating the catalog) gets the same cap_group_sizes
    guard the LSH paths use — on a real catalog the name dictionary is
    orders of magnitude smaller than the part table."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("blk", F.element_at(F.split(F.col("name"), " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    lev = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"),
            lev.cast("long").alias("lev"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
        .where(F.col("lev") <= R36_MAX_LEV)
    )


R36_SQL = f"""
WITH names AS (
    SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts,
           split_part(p_name, ' ', -1) AS blk
    FROM part GROUP BY p_name
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b
  ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {R36_MAX_LEV}
"""


# ---- R37: min-cost supplier per part (TPC-H Q2 shape) ----
# The fixture has no partsupp table, so the per-(part, supplier) supply
# cost is DERIVED: the minimum observed unit price on lineitem, in
# integer cents via BIGINT DIV (quantities are integral, 1..50), which
# keeps the whole query exact cross-engine.

R37_SIZE = 15
R37_TYPE = "STANDARD"
R37_REGION = "EUROPE"
R37_TOPK = 100


def r37_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in one
    region offering it at the REGIONAL MINIMUM cost — the classic
    correlated scalar subquery (cost = min cost among that region's
    suppliers of that part), decorrelated the way every engine executes
    it: a per-part min aggregate joined back on (part, cost). Dimension
    chains broadcast; the top-k is ORDER BY + LIMIT with a total
    tie-break order, so Spark plans TakeOrderedAndProject (never a
    global sort materialization)."""
    li = _t(spark, sf_dir, "lineitem")
    unit = li.select(
        "l_partkey", "l_suppkey",
        F.expr(
            "floor(l_extendedprice * 100 + 0.5) DIV (floor(l_quantity * 100 + 0.5) DIV 100)"
        ).cast("long").alias("unit_c"),
    )
    ps = unit.groupBy("l_partkey", "l_suppkey").agg(F.min("unit_c").alias("cost_c"))
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == R37_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = ps.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") <= R37_SIZE) & (F.col("p_type") == R37_TYPE)
    )
    regional = regional.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    mins = regional.groupBy("p_partkey").agg(F.min("cost_c").alias("min_c"))
    return (
        regional.join(mins, "p_partkey")
        .where(F.col("cost_c") == F.col("min_c"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"), "p_name",
            (F.col("cost_c") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(R37_TOPK)
    )


R37_SQL = f"""
WITH unit AS (
    SELECT l_partkey, l_suppkey,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             // (CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 100) AS unit_c
    FROM lineitem
),
ps AS (
    SELECT l_partkey, l_suppkey, CAST(min(unit_c) AS BIGINT) AS cost_c
    FROM unit GROUP BY 1, 2
),
sup AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = '{R37_REGION}'
),
regional AS (
    SELECT ps.*, sup.s_name, sup.s_acctbal, sup.n_name, part.p_partkey, part.p_name
    FROM ps
    JOIN sup ON ps.l_suppkey = sup.s_suppkey
    JOIN part ON ps.l_partkey = part.p_partkey
      AND part.p_size <= {R37_SIZE} AND part.p_type = '{R37_TYPE}'
),
mins AS (SELECT p_partkey, min(cost_c) AS min_c FROM regional GROUP BY 1)
SELECT s_acctbal, s_name, n_name, CAST(regional.p_partkey AS BIGINT) AS p_partkey,
       p_name, cost_c / 100.0 AS supply_cost
FROM regional JOIN mins ON regional.p_partkey = mins.p_partkey
WHERE cost_c = min_c
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT {R37_TOPK}
"""


# ---- R38: local-supplier volume by nation (TPC-H Q5 shape) ----

R38_FROM = "1997-01-01"
R38_TO = "1998-01-01"
R38_REGION = "ASIA"


def r38_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the
    CUSTOMER and the SUPPLIER share the nation (the join graph's one
    cycle — c_nationkey = s_nationkey closes customer->orders->lineitem
    ->supplier back onto nation), for one region and one order year.
    Dimensions broadcast; revenue in exact integer cents."""
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == R38_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= R38_FROM) & (F.col("o_orderdate") < R38_TO)
    )
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(sup),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


R38_SQL = f"""
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = '{R38_REGION}'
JOIN orders ON c_custkey = o_custkey
  AND o_orderdate >= '{R38_FROM}' AND o_orderdate < '{R38_TO}'
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---- R39: revenue-important parts vs a global scalar (TPC-H Q11 shape) ----

R39_NATION = "NATION_7"
R39_FRACTION_DEN = 1000  # part qualifies if value * DEN > global value


def r39_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part revenue supplied from one nation,
    keeping parts whose value exceeds a FRACTION of the global total —
    the HAVING-against-a-scalar-subquery pattern. The scalar is a 1-row
    broadcast join, and the comparison is the INTEGER cross-multiply
    value_c * {R39_FRACTION_DEN} > total_c (never a float threshold —
    exact in both engines; the int64 contract is value sums below
    ~2^62/{R39_FRACTION_DEN} cents, re-scale the fraction above it)."""
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation").where(F.col("n_name") == R39_NATION)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    value = li.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("value_c")
    )
    total = value.agg(F.sum("value_c").alias("total_c"))
    return (
        value.join(F.broadcast(total))
        .where(F.col("value_c") * R39_FRACTION_DEN > F.col("total_c"))
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            (F.col("value_c") / 100.0).alias("value"),
        )
        .orderBy(F.col("value_c").desc(), "p_partkey")
    )


R39_SQL = f"""
WITH v AS (
    SELECT l_partkey,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_name = '{R39_NATION}'
    GROUP BY 1
),
t AS (SELECT CAST(sum(value_c) AS BIGINT) AS total_c FROM v)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey, value_c / 100.0 AS value
FROM v, t
WHERE value_c * {R39_FRACTION_DEN} > total_c
ORDER BY value_c DESC, p_partkey
"""


def queries() -> dict[str, tuple]:
    return {
        "rel_pricing_summary": (r1_fn, R1_SQL),
        "rel_top_orders_per_customer": (r2_fn, R2_SQL),
        "rel_revenue_by_nation": (r3_fn, R3_SQL),
        "rel_rollup_year_priority": (r4_fn, R4_SQL),
        "rel_setops_segments": (r5_fn, R5_SQL),
        "rel_customers_without_orders": (r6_fn, R6_SQL),
        "rel_brand_shipping_stats": (r7_fn, R7_SQL),
        "rel_supplier_revenue": (r8_fn, R8_SQL),
        "rel_events_json_props": (r9_fn, R9_SQL),
        "rel_cube_segment_priority": (r10_fn, R10_SQL),
        "rel_pivot_year_priority": (r11_fn, R11_SQL),
        "rel_customer_balance_quartiles": (r12_fn, R12_SQL),
        "rel_customer_running_spend": (r13_fn, R13_SQL),
        "rel_nation_gap_full_outer": (r14_fn, R14_SQL),
        "rel_customer_trailing_spend": (r15_fn, R15_SQL),
        "rel_small_qty_parts": (r16_fn, R16_SQL),
        "rel_late_order_priority": (r17_fn, R17_SQL),
        "rel_lineitem_profile": (r18_fn, R18_SQL),
        "rel_idle_rich_customers": (r19_fn, R19_SQL),
        "rel_unshipped_topk_revenue": (r20_fn, R20_SQL),
        "rel_volume_shipping": (r21_fn, R21_SQL),
        "rel_sole_late_supplier": (r22_fn, R22_SQL),
        "rel_disjunctive_brackets": (r23_fn, R23_SQL),
        "rel_promo_share": (r24_fn, R24_SQL),
        "rel_large_volume_customers": (r25_fn, R25_SQL),
        "rel_market_share": (r26_fn, R26_SQL),
        "rel_returned_revenue_topk": (r27_fn, R27_SQL),
        "rel_order_cadence": (r28_fn, R28_SQL),
        "rel_top_supplier": (r29_fn, R29_SQL),
        "rel_order_count_distribution": (r30_fn, R30_SQL),
        "rel_product_profit": (r31_fn, R31_SQL),
        "rel_priority_mix_by_status": (r32_fn, R32_SQL),
        "rel_supplier_part_variety": (r33_fn, R33_SQL),
        "rel_dominant_suppliers": (r34_fn, R34_SQL),
        "rel_forecast_revenue": (r35_fn, R35_SQL),
        "rel_part_fuzzy_pairs": (r36_fn, R36_SQL),
        "rel_min_cost_supplier": (r37_fn, R37_SQL),
        "rel_local_supplier_volume": (r38_fn, R38_SQL),
        "rel_important_parts": (r39_fn, R39_SQL),
    }
