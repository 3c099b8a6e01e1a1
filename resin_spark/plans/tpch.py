"""Relational query core (SURVEY.md §2 block A).

Classic warehouse shapes over the benchmark star schema, written
declaratively so Catalyst gets full predicate pushdown / column
pruning / join reordering. Scale notes per query:

- dimension tables (region, nation, customer at low SF ratios) are
  explicitly broadcast — no shuffle on the fact side for those joins;
- fact⋈fact joins (orders⋈lineitem) shuffle on the join key and rely
  on AQE skew splitting;
- every query filters + projects before joining, so the parquet scan
  reads only the referenced columns (verify: .explain → ReadSchema).

All hash-compared double aggregates go through
:mod:`resin_spark.functions.exact` so the DuckDB oracle matches bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from resin_spark.functions.exact import davg, dsum

Tables = dict[str, DataFrame]


def q1_pricing_summary(t: Tables) -> DataFrame:
    """TPC-H Q1 shape: big scan, group on two low-cardinality flags.

    Map-side partial aggregation does nearly all the work; the shuffle
    carries ~|flags|² rows regardless of input scale.
    """
    l = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=4).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q1_oracle() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """


def q3_shipping_priority(t: Tables) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-10.

    customer is far smaller than orders/lineitem → broadcast; the
    orders⋈lineitem join shuffles on orderkey. Top-10 via orderBy+limit
    is a TakeOrderedAndProject — no global sort materialisation.
    """
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    line = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(line, orders.o_orderkey == line.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(revenue, scale=4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
    )


def q3_oracle() -> str:
    return """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """


def q5_local_supplier(t: Tables) -> DataFrame:
    """TPC-H Q5 shape: star join through two dim chains.

    region→nation is guaranteed-tiny (25/5 rows at any SF) and hinted
    broadcast. customer/supplier are NOT hinted: they grow linearly with
    SF (multi-GB at sf100+), so the broadcast-vs-shuffle choice is left
    to AQE, which converts to broadcast at runtime when the actual
    post-scan size is under the threshold — the size-gated behaviour a
    hard hint can't give. The n_nationkey equality between customer and
    supplier nations is applied as a post-join filter, exactly as the
    reference SQL states it.
    """
    region = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    nation = t["nation"].join(
        broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = t["customer"].select("c_custkey", "c_nationkey")
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    line = t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, scale=4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q5_oracle() -> str:
    return """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """


def topk_per_group(t: Tables, k: int = 3) -> DataFrame:
    """Top-k rows per group via rank window — one shuffle on the group key.

    At scale this is preferable to per-group sorts: the window sort is
    local to each hash partition after a single exchange.
    """
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("o_orderpriority", "rank")
    )


def topk_per_group_oracle(k: int = 3) -> str:
    return f"""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders
    ) WHERE rank <= {k}
    ORDER BY o_orderpriority, rank
    """


def agg_rollup(t: Tables) -> DataFrame:
    """Grouping-sets rollup over (returnflag, linestatus) — subtotals and
    grand total (Spark expands grouping sets map-side).

    The () level is a separate always-present global aggregate row:
    Spark's ``rollup()`` over an EMPTY relation yields zero rows, while
    SQL-standard GROUP BY ROLLUP emits the grand-total grouping-set row
    (COUNT=0) even on empty input (r7 rel-fuzz seed 9106) — a global
    ``.agg()`` returns exactly one row on empty input in both engines,
    so planning levels (a,b)+(a) as grouping sets and unioning the
    global row restores the standard semantics. Two codegen'd
    count+sum scans instead of one; both prune to two columns.
    """
    li = t["lineitem"]
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    ]
    levels = (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"]],
            "l_returnflag", "l_linestatus")
        .agg(*aggs)
    )
    total = li.agg(*aggs).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "n_rows", "sum_qty",
    )
    return (
        levels.unionByName(total)
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


def agg_rollup_oracle() -> str:
    return """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """

# --- A6/A7 (overtime r6): the two join shapes A1-A5 didn't cover ---------------


def q4_order_priority(t: Tables) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → LEFT SEMI join, then a tiny rollup.

    The semi join is the shape's whole point: lineitem is probed for
    MATCH EXISTENCE only — no lineitem column survives, no row
    multiplies (an inner join + distinct would shuffle the multiplied
    pairs first). Catalyst plans orders⋈lineitem as a semi hash join
    on orderkey; the aggregate then sees |orders-in-window| rows onto
    |priorities| groups. Adapted to the synthetic schema: the
    existence predicate is a returned item (l_returnflag = 'R') —
    commit/receipt dates aren't generated.

    Exactness: pure counts, no floats anywhere.
    """
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey,
                    "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q4_oracle() -> str:
    return """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


def q22_idle_customers(t: Tables) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery + NOT EXISTS →
    LEFT ANTI join.

    Two shapes A1-A5 lack: (1) the corpus-wide scalar (mean positive
    account balance) joins back as a BROADCAST single row — the
    corpus never reshuffles to meet its own aggregate; (2) customers
    with no orders are found by an ANTI hash join on custkey — the
    only shuffle columns are the two keys, and no pair row ever
    materialises. Group is c_nationkey (the synthetic schema has no
    phone country code).

    Exactness: the threshold mean is a decimal-exact sum over an
    exact count, landing the same IEEE double both engines compare
    raw balances against — boundary customers decide identically;
    the final sum is the same decimal recipe.
    """
    cust = t["customer"].select("c_custkey", "c_nationkey", "c_acctbal")
    pos_avg = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("ab"))
    )
    return (
        cust.join(broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(t["orders"].select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum("c_acctbal").alias("totacctbal"))
        .orderBy("c_nationkey")
    )


def q22_oracle() -> str:
    return """
    WITH pos AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(c_acctbal) AS ab
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
    FROM customer, pos
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """
