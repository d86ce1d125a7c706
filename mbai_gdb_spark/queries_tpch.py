"""TPC-H completion queries (round 3).

Together with the adaptations already registered in ``queries.py``
(Q1≈a1, Q3, Q4/Q6/Q14 in tpch_scalar_suite, Q5≈j5, Q7, Q10, Q13≈a13,
Q17, Q18, Q19, Q21, Q22) these close out all 22 TPC-H query *shapes* on
the fixture's reduced schema.  The fixture has no ``partsupp`` table and
no ship-mode/commit-date columns, so the shapes that need them (Q2, Q8,
Q9, Q11, Q12, Q15, Q16, Q20) are re-anchored on ``lineitem`` as the
part↔supplier link — the join/aggregation topology (the thing that
matters for the planner) is preserved.

Conventions follow ``queries.py``: exact fixed-point money arithmetic,
identical aliases in Spark and SQL, unique-id tie-breaks on every
ranking, scalar subqueries as 1-row broadcast joins (never a global
window), and per-group thresholds as *partitioned* windows.  All
threshold predicates are relative (fractions of group totals), never
absolute row counts, so they are scale-factor-free.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mbai_gdb_spark.queries import (
    _t,
    epoch_us,
    money_sum,
    query,
    scaled_long,
)

# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (correlated MIN via partitioned window)
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT))
                 AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT p.p_partkey, p.p_name, eur.s_name, eur.n_name,
             cost.cost_cents,
             MIN(cost.cost_cents) OVER (PARTITION BY p.p_partkey)
                 AS min_cents
      FROM part p
      JOIN cost ON cost.l_partkey = p.p_partkey
      JOIN eur ON eur.s_suppkey = cost.l_suppkey
      WHERE p.p_type = 'LARGE' AND p.p_size <= 10
    )
    SELECT p_partkey, p_name, s_name, n_name,
           cost_cents / 100 AS unit_cost
    FROM ranked WHERE cost_cents = min_cents
    ORDER BY p_partkey, s_name LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 adaptation: for each filtered part, the EUROPE supplier
    offering the minimum observed unit price.  The partsupp link is
    derived from lineitem (min unit price per part+supplier).  The
    correlated-MIN subquery is a window partitioned by partkey (never a
    global sort); dims broadcast; unit prices compared as exact cents."""
    li = _t(spark, sf_dir, "lineitem")
    unit_cents = scaled_long(F.col("l_extendedprice") / F.col("l_quantity"), 100)
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("cost_cents")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    w = Window.partitionBy("p_partkey")
    ranked = (
        cost.join(F.broadcast(eur), cost.l_suppkey == eur.s_suppkey)
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .withColumn("min_cents", F.min("cost_cents").over(w))
    )
    return (
        ranked.filter(F.col("cost_cents") == F.col("min_cents"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            (F.col("cost_cents") / 100).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region, by order year
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    """
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS DOUBLE) * 1000000
                 / CAST(CAST(SUM(CAST(ROUND(l.l_extendedprice
                       * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
                   AS DOUBLE)) / 1000000 AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 adaptation: NATION_7 suppliers' share of PROMO-part
    revenue sold to AMERICA-region customers, per order year.  Both
    sums are exact scaled longs; the share is one double division
    rounded to 1e-6 — bit-identical across engines.  Every dim
    (nation x2, region, part, supplier, customer) broadcasts; the only
    shuffle is the final year aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("n2_name")
    )
    rev = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    nat = F.sum(F.when(F.col("n2_name") == "NATION_7", rev).otherwise(F.lit(0)))
    tot = F.sum(rev)
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (
                F.round(nat.cast("double") * F.lit(1000000) / tot.cast("double"), 0)
                / F.lit(1000000)
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                         * 10000) AS BIGINT)
                  - CAST(ROUND(p.p_retailprice * l.l_quantity * 0.5
                         * 10000) AS BIGINT)) AS BIGINT) / 10000
               AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 adaptation: profit on 'red' parts by supplier nation and
    order year.  The fixture has no ps_supplycost, so unit cost is the
    deterministic surrogate retailprice/2; revenue and cost are rounded
    to exact fixed-point PER ROW and subtracted as longs, so the SUM is
    order-independent.  part/supplier/nation broadcast; lineitem-orders
    is the one big join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    rev = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    cost = scaled_long(
        F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.5), 10000
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg((F.sum(rev - cost) / F.lit(10000)).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (value above a relative fraction of the total)
# ---------------------------------------------------------------------------


@query(
    "q11_important_parts",
    """
    WITH val AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM val)
    SELECT v.l_partkey, v.value_cents / 100 AS part_value
    FROM val v, tot
    WHERE v.value_cents * 500 > tot.total_cents
    ORDER BY part_value DESC, v.l_partkey
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 adaptation: parts whose ASIA-supplied revenue exceeds
    1/500 of the ASIA total.  The scalar total is a 1-row aggregate
    broadcast onto the per-part values (the q22 pattern — never a
    global window); the threshold compares exact integer cents scaled
    by the fraction's denominator, so membership is engine-exact and
    the predicate is scale-factor-relative."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(F.sum(scaled_long(F.col("l_extendedprice"), 100)).alias("value_cents"))
    )
    tot = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 500 > F.col("total_cents"))
        .select(
            "l_partkey", (F.col("value_cents") / 100).alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay buckets vs order priority (conditional counts)
# ---------------------------------------------------------------------------


@query(
    "q12_late_shipment_priority",
    """
    SELECT CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                     > CAST(5184000000000 AS BIGINT) THEN 'LATE' ELSE 'ONTIME' END
               AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ship_bucket
    """,
)
def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 adaptation: the fixture has no ship modes, so lines
    bucket by shipping delay (>60 days = LATE) instead; per bucket,
    counts of high- vs low-priority order lines.  Delay compares
    integer microseconds (never date arithmetic that could round
    differently); the year filter pushes to the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    delay_us = epoch_us("l_shipdate") - epoch_us("o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                delay_us > F.lit(60 * 86400 * 1000000).cast("long"), "LATE"
            ).otherwise("ONTIME"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (scalar MAX broadcast)
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS BIGINT) AS rev_scaled
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    ),
    best AS (SELECT MAX(rev_scaled) AS max_scaled FROM rev)
    SELECT s.s_suppkey, s.s_name, rev.rev_scaled / 10000 AS total_revenue
    FROM rev CROSS JOIN best
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rev_scaled = best.max_scaled
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 adaptation: supplier(s) with the maximum revenue over
    1997Q1.  The view's MAX is a 1-row aggregate broadcast back onto
    the per-supplier revenues; equality compares exact scaled longs so
    ties are found identically in both engines (and surfaced, ordered
    by suppkey, rather than broken arbitrarily)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
        ).alias("rev_scaled")
    )
    best = rev.agg(F.max("rev_scaled").alias("max_scaled"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("rev_scaled") == F.col("max_scaled"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_scaled") / 10000).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part group, excluding flagged suppliers
# ---------------------------------------------------------------------------


@query(
    "q16_part_supplier_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16 adaptation: distinct-supplier variety per
    (brand, type, size) group over the lineitem part-supplier link,
    excluding negative-balance suppliers (the fixture's stand-in for
    Q16's complaint blacklist).  The exclusion is an anti-join against
    a tiny broadcast list; part filters push to the dim before the
    broadcast; COUNT(DISTINCT) is a two-stage partial aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — dominant suppliers of a part family (relative-share semi-join)
# ---------------------------------------------------------------------------


@query(
    "q20_excess_suppliers",
    """
    WITH red AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
                 AS qty_scaled
      FROM lineitem l
      JOIN red ON red.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, qty_scaled,
               SUM(qty_scaled) OVER (PARTITION BY l_partkey) AS part_total
        FROM shipped
      ) WHERE qty_scaled * 2 > part_total
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE EXISTS (SELECT 1 FROM dominant d WHERE d.l_suppkey = s.s_suppkey)
    ORDER BY s.s_suppkey
    """,
)
def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 adaptation: suppliers who shipped more than half of a
    'red' part's 1997 volume (the relative stand-in for Q20's
    availqty > half-of-demand predicate).  The per-part total is a
    window partitioned by partkey; the share test compares exact
    scaled quantities; supplier qualification is a semi-join; date and
    part-name filters push to the scans."""
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(scaled_long(F.col("l_quantity"), 100)).alias("qty_scaled"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_total", F.sum("qty_scaled").over(w))
        .filter(F.col("qty_scaled") * 2 > F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )
