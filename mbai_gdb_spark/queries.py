"""Driver-checked query surface.

One entry per operator family from SURVEY.md §2, expressed on the fixture
tables (TESTDATA.md).  Every query here has a matching DuckDB oracle in
``ORACLES`` — the driver runs both at sf=0.01 and compares row count,
schema, and an order-insensitive value hash.

Conventions (correctness-gate critical):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- money/double aggregates use EXACT integer arithmetic: per-row scale →
  round → long (exact, order-independent), integer SUM, divide at the
  very end.  Both engines then hold bit-identical doubles — no
  aggregation-order or ROUND-implementation hazards at any scale factor;
- timestamp arithmetic is integer microseconds (unix_micros / epoch_us);
- every ranking has a unique-id tie-break so top-k is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.chain import chain_next, with_priority
from mbai_gdb_spark.ops.intervals import asof_join, interval_join, sessionize
from mbai_gdb_spark.ops.windows import running_sum, top1_per_key
from mbai_gdb_spark.session import tune

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Ensure at least session-default parallelism before CPU-heavy
    narrow work (r14 optimization, guide §2.5 "input skew").

    The fixture tables are single-file, single-ROW-GROUP parquet
    (pyarrow-verified), so a scan is ONE task no matter how
    ``maxPartitionBytes`` / ``openCostInBytes`` are tuned — and every
    expression / Arrow stage before the first Exchange then runs on one
    core (measured worst case: mm_decode_jpeg's whole
    Scan→3×MapInPandas plan had ZERO Exchanges —
    plans/r14/mm_decode_jpeg_before.txt — 3.5 s of decode on 1 of 32
    cores).  A real cluster hits the same wall on any unsplittable or
    few-file input, and the cure is the same: round-robin the narrow
    rows across the machine BEFORE the heavy map.

    Scale-adaptive, never a local[32] constant: the target is
    ``defaultParallelism`` and the repartition is SKIPPED when the
    input already has at least that many partitions — at production
    scale a many-split scan passes through untouched, so no base-table
    shuffle is added where the scan parallelizes naturally.  The bytes
    exchanged where it does fire are the narrow pre-compute columns
    (ids, id+text), orders of magnitude below the work they unlock."""
    sc = df.sparkSession.sparkContext
    target = int(n or sc.defaultParallelism)
    try:
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception:
        pass  # no RDD handle (connect mode) — spread unconditionally
    return df.repartition(target)


def _copurchase_edges(li: DataFrame, distinct: bool = True) -> DataFrame:
    """Distinct canonical co-purchase edges (u < v) from (l_orderkey,
    l_partkey) rows.

    r14 (guide §2.4): map-side pair generation — ONE groupBy(order)
    with collect_set, then all i<j pairs of the sorted part array are
    emitted by a higher-order transform before the final distinct —
    replacing the previous distinct + self-join-on-order, which cost an
    extra exchange (the (order, part)-keyed distinct could not be
    reused by the order-keyed join) and materialized the same pairs
    through join machinery.  Pair count per order is C(n,2) of a
    basket-sized n, so the explode is bounded; the edge SET is
    identical (sorted distinct parts per order → all ordered pairs →
    global distinct).

    ``distinct=False`` (r15) skips the global dedup for consumers that
    dedup inside their own first exchange anyway — the k-core state
    build groups by vertex with collect_set, so the (u, v)-keyed
    distinct shuffle bought it nothing (guide §2.4: a partitioning the
    next operator cannot reuse is a wasted exchange).  Triangle
    counting keeps the distinct: wedge enumeration needs the exact
    edge MULTISET to be 1 per edge."""
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("pks")
    )
    pks = F.col("pks")
    pairs = per_order.select(
        F.explode(
            F.flatten(
                F.transform(
                    pks,
                    lambda x, i: F.transform(
                        F.slice(pks, i + F.lit(2), F.size(pks)),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("p")
    )
    out = pairs.select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    return out.distinct() if distinct else out


# --- exact-arithmetic helpers (see module docstring) -----------------------


def epoch_us(col: str | Column) -> Column:
    """Integer microseconds since epoch; NTZ treated as UTC (session tz)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(col.cast("timestamp"))


def scaled_long(col: Column, scale: int) -> Column:
    """Per-row exact fixed-point: round(col*scale) as long.  The true value
    is an integer at this scale, float error is << 0.5, so both engines
    round to the same integer — exact and order-independent from here on."""
    return F.round(col * F.lit(scale), 0).cast("long")


def money_sum(col: Column, scale: int = 100) -> Column:
    """SUM as exact integer at ``scale``, divided back to units at the end.
    Bit-identical across engines and aggregation orders."""
    return F.sum(scaled_long(col, scale)) / F.lit(scale)


def money_avg(col: Column, scale: int = 100, out_scale: int = 100) -> Column:
    """AVG via exact integer sum; result rounded to ``out_scale`` fixed
    point with a single deterministic double division."""
    total = F.sum(scaled_long(col, scale)).cast("double")
    n = F.count(col)
    return F.round(total * F.lit(out_scale) / (n * F.lit(scale)), 0) / F.lit(out_scale)


# SQL twins of the helpers (DuckDB):
#   scaled:  CAST(ROUND(expr * S) AS BIGINT)
#   sum:     CAST(SUM(scaled) AS BIGINT) / S          (SUM(BIGINT) is HUGEINT)
#   avg:     ROUND(CAST(SUM(scaled) AS DOUBLE) * OS / (COUNT(expr) * S)) / OS


# ---------------------------------------------------------------------------
# Aggregation family (SURVEY §2.4: A1/A2/A4/A6) — TPC-H Q1-style sweep.
# ---------------------------------------------------------------------------


@query(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100
               AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100
               AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000
               AS sum_disc_price,
           ROUND(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) * 10000
                 / (COUNT(l_quantity) * 100)) / 10000 AS avg_qty,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) * 10000
                 / (COUNT(l_extendedprice) * 100)) / 10000 AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark, sf_dir):
    """Grouped sum/avg/count sweep (reference A1/A2: per-group min/max at
    src/queries/game.py:35-40, conditional sums at 788-795)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_quantity")).alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(disc_price, 10000).alias("sum_disc_price"),
        money_avg(F.col("l_quantity"), 100, 10000).alias("avg_qty"),
        money_avg(F.col("l_extendedprice"), 100, 10000).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "a4_conditional_event_sums",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100
               AS purchase_value,
           CAST(SUM(CASE WHEN event_type = 'view'
                         THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100
               AS view_value,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           COUNT(*)                                         AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def a4_conditional_event_sums(spark, sf_dir):
    """Conditional aggregation — the reference's plus-minus for/against
    CASE sums (src/queries/game.py:788-795)."""
    ev = _t(spark, sf_dir, "events")
    cents = scaled_long(F.col("value"), 100)
    return ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(F.lit(0)))
            / F.lit(100)
        ).alias("purchase_value"),
        (
            F.sum(F.when(F.col("event_type") == "view", cents).otherwise(F.lit(0)))
            / F.lit(100)
        ).alias("view_value"),
        F.count(F.when(F.col("event_type") == "error", F.lit(1))).alias("n_errors"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "a5_nation_customer_rollup",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cust_total_cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_nationkey
    )
    SELECT n.n_name,
           CAST(SUM(cust_total_cents) AS BIGINT) / 100 AS nation_total,
           ROUND(CAST(SUM(cust_total_cents) AS DOUBLE) / COUNT(*)) / 100
               AS avg_cust_total,
           COUNT(*) AS n_customers
    FROM per_cust pc JOIN nation n ON n.n_nationkey = pc.c_nationkey
    GROUP BY n.n_name
    """,
)
def a5_nation_customer_rollup(spark, sf_dir):
    """Two-grain rollup (reference A5: player-stint plus-minus summed from
    lineup-stints, src/queries/game.py:797-808).  Exact cents all the way
    up; partial aggregation is Catalyst-automatic; nation dim broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("cust_total_cents"))
    )
    return (
        per_cust.join(F.broadcast(n), per_cust.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.sum("cust_total_cents") / F.lit(100)).alias("nation_total"),
            (
                F.round(F.sum("cust_total_cents").cast("double") / F.count(F.lit(1)), 0)
                / F.lit(100)
            ).alias("avg_cust_total"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "a7_distinct_segments",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def a7_distinct_segments(spark, sf_dir):
    """DISTINCT (reference A7: WITH DISTINCT, src/queries/game.py:42,133)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Join family (SURVEY §2.3: J1/J2 equi, J5 multi-dim, J6 left, J8 anti,
# J9 semi, J11 broadcast).
# ---------------------------------------------------------------------------


@query(
    "j1_region_revenue",
    """
    SELECT r.r_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000
               AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j1_region_revenue(spark, sf_dir):
    """Chained equi-joins fact→dims (reference J1/J2 MATCH-pattern joins,
    src/queries/game.py:1-8, season.py:12-16).  Dims are broadcast (J11)
    so the only shuffle is the final groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            money_sum(disc_price, 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "j5_local_supplier_revenue",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000
               AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j5_local_supplier_revenue(spark, sf_dir):
    """TPC-H Q5-style same-nation constraint — the reference's
    opponent-side / cross-entity theta condition (J5,
    src/queries/game.py:346-357) resolved into equi keys."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(money_sum(disc_price, 10000).alias("revenue"))
    )


@query(
    "j6_customer_order_counts",
    """
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) / 100
               AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def j6_customer_order_counts(spark, sf_dir):
    """LEFT/optional join with null-safe aggregation (reference J6:
    OPTIONAL MATCH fallback, src/queries/game.py:237-259)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(F.sum(scaled_long(F.col("o_totalprice"), 100)), F.lit(0))
                / F.lit(100)
            ).alias("total_spent"),
        )
    )


@query(
    "j8_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j8_customers_without_orders(spark, sf_dir):
    """Anti-join (reference J8: NOT EXISTS claim check,
    src/queries/game.py:510)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "j9_customers_with_urgent_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def j9_customers_with_urgent_orders(spark, sf_dir):
    """Semi-join (reference J9: EXISTS sub-pattern,
    src/queries/game.py:786)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "j3_lineitem_ship_window",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_shipped_in_window,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100
               AS windowed_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
       AND l.l_shipdate >= o.o_orderdate
       AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    """,
)
def j3_lineitem_ship_window(spark, sf_dir):
    """Point-in-interval containment join (reference J3 — event time within
    stint interval, src/queries/game.py:233-235 et al.): equi key
    (orderkey) + range residual on the ship date."""
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    o = _t(spark, sf_dir, "orders").withColumn(
        "window_end", F.timestamp_add("DAY", F.lit(60), F.col("o_orderdate"))
    )
    joined = interval_join(
        li,
        o,
        equi_keys=["o_orderkey"],
        event_time="l_shipdate",
        start="o_orderdate",
        end="window_end",
        how="inner",
        closed="left",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_shipped_in_window"),
        money_sum(F.col("l_extendedprice")).alias("windowed_price"),
    )


# ---------------------------------------------------------------------------
# Window / sequence family (SURVEY §2.5: W1/W5/W7/W8/W10).
# ---------------------------------------------------------------------------


@query(
    "w1_next_event_chain",
    """
    SELECT event_id, next_event_id, micros_to_next FROM (
        SELECT event_id,
               LEAD(event_id) OVER w AS next_event_id,
               LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS micros_to_next
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE next_event_id IS NOT NULL
    """,
)
def w1_next_event_chain(spark, sf_dir):
    """NEXT-chain via lead() (reference W1/W2/W9: per-team game chain
    src/queries/season.py:18-27; period chain game.py:42-50; score chain
    732-740).  One window shuffle replaces collect+UNWIND pairing."""
    ev = _t(spark, sf_dir, "events")
    chained = chain_next(
        ev.withColumn("ts_us", epoch_us("ts")),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        next_cols={"event_id": "next_event_id", "ts_us": "next_ts_us"},
    )
    return chained.select(
        "event_id",
        "next_event_id",
        (F.col("next_ts_us") - F.col("ts_us")).alias("micros_to_next"),
    )


@query(
    "w5_sessionize_events",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id, value,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100 AS session_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def w5_sessionize_events(spark, sf_dir):
    """Gaps-and-islands sessionization (reference W5: consecutive-stint
    run segmentation, src/queries/game.py:134-182), 30-min gap."""
    ev = _t(spark, sf_dir, "events")
    sess = sessionize(ev, keys=["user_id"], ts="ts", gap_seconds=1800.0, tie_break=["event_id"])
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        money_sum(F.col("value")).alias("session_value"),
    )


@query(
    "w8_running_total_reset",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100 AS running_value,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100 AS daily_running_value
    FROM events
    """,
)
def w8_running_total_reset(spark, sf_dir):
    """Running total + finer-grain reset subtotal (reference W8: the
    80-line reduce() score accumulator with per-period reset,
    src/queries/game.py:628-707 → two window sums)."""
    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("event_date", F.col("ts").cast("date"))
        .withColumn("value_cents", scaled_long(F.col("value"), 100))
    )
    out = running_sum(
        ev, ["user_id"], [F.col("ts"), F.col("event_id")], "value_cents", alias="run_cents"
    )
    out = running_sum(
        out,
        ["user_id"],
        [F.col("ts"), F.col("event_id")],
        "value_cents",
        alias="daily_cents",
        reset_by=["event_date"],
    )
    return out.select(
        "event_id",
        "user_id",
        (F.col("run_cents") / F.lit(100)).alias("running_value"),
        (F.col("daily_cents") / F.lit(100)).alias("daily_running_value"),
    )


@query(
    "w7_priority_ordered_chain",
    """
    SELECT event_id, next_event_id FROM (
        SELECT event_id, LEAD(event_id) OVER (
            PARTITION BY user_id ORDER BY ts,
            CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2 WHEN 'click' THEN 3
                            WHEN 'purchase' THEN 4 WHEN 'error' THEN 5 ELSE 9 END,
            event_id) AS next_event_id
        FROM events
    ) WHERE next_event_id IS NOT NULL
    """,
)
def w7_priority_ordered_chain(spark, sf_dir):
    """Global ordering with CASE-priority tie-break (reference W7: action
    NEXT chain ordered by time, clock, label-priority,
    src/queries/game.py:744-769)."""
    ev = _t(spark, sf_dir, "events")
    prio = {"signup": 1, "view": 2, "click": 3, "purchase": 4, "error": 5}
    ev = with_priority(ev, "event_type", prio, default=9)
    chained = chain_next(
        ev,
        partition_by=["user_id"],
        order_by=[F.col("ts"), F.col("priority"), F.col("event_id")],
        next_cols={"event_id": "next_event_id"},
    )
    return chained.select("event_id", "next_event_id")


@query(
    "w10_latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def w10_latest_event_per_user(spark, sf_dir):
    """Top-1 per key (reference W10: ORDER BY DESC + head(collect()),
    src/queries/game.py:604-616)."""
    ev = _t(spark, sf_dir, "events")
    latest = top1_per_key(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    return latest.select("user_id", "event_id", "ts", "event_type", "value")


@query(
    "o3_top10_customers_by_revenue",
    """
    SELECT c_custkey, revenue FROM (
        SELECT c.c_custkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000
                   AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY c.c_custkey
    ) ORDER BY revenue DESC, c_custkey LIMIT 10
    """,
)
def o3_top10_customers_by_revenue(spark, sf_dir):
    """Top-k with deterministic tie-break (reference O3:
    ORDER BY DESC LIMIT 1, src/queries/game.py:512).  Spark plans a
    TakeOrderedAndProject — no full sort.  Revenue is exact fixed-point so
    the ranking itself is engine-independent."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey")
        .agg(money_sum(disc_price, 10000).alias("revenue"))
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(10)


# ---------------------------------------------------------------------------
# As-of join (J7) and interval join on derived sessions (J3 proper).
# ---------------------------------------------------------------------------


@query(
    "j7_asof_click_to_view",
    """
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         views  AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT c.event_id AS click_event_id,
           v.view_event_id,
           epoch_us(c.ts) - epoch_us(v.view_ts) AS micros_since_view
    FROM clicks c
    JOIN LATERAL (
        SELECT v.event_id AS view_event_id, v.ts AS view_ts
        FROM views v
        WHERE v.user_id = c.user_id AND v.ts <= c.ts
          AND epoch_us(c.ts) - epoch_us(v.ts) <= 600 * 1000000
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON TRUE
    """,
)
def j7_asof_click_to_view(spark, sf_dir):
    """As-of join with tolerance (reference J7: rebound → latest missed
    shot within 10 s, src/queries/game.py:506-513).  Union-timeline
    window implementation — one shuffle, no range-join blowup."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts"),
        F.col("event_id").alias("view_event_id"),
    )
    matched = asof_join(
        clicks,
        views,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id"],
        tolerance_seconds=600.0,
        direction="backward",
        how="inner",
    )
    return matched.select(
        F.col("event_id").alias("click_event_id"),
        "view_event_id",
        (epoch_us("ts") - epoch_us("asof_ts")).alias("micros_since_view"),
    )


@query(
    "j3_purchases_in_sessions",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess_rows AS (
        SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    ), sessions AS (
        SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sess_rows GROUP BY user_id, session_id
    ), purchases AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    )
    SELECT s.user_id, s.session_id, p.event_id AS purchase_event_id,
           p.value AS purchase_value
    FROM purchases p
    JOIN sessions s ON s.user_id = p.user_id
        AND p.ts >= s.session_start AND p.ts <= s.session_end
    """,
)
def j3_purchases_in_sessions(spark, sf_dir):
    """Point-in-interval join against *derived* intervals (reference J3:
    action-in-stint containment).  Equi key user_id ⇒ hash join with a
    residual range predicate."""
    ev = _t(spark, sf_dir, "events")
    sess = sessionize(ev, keys=["user_id"], ts="ts", gap_seconds=1800.0, tie_break=["event_id"])
    sessions = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = interval_join(
        purchases,
        sessions,
        equi_keys=["user_id"],
        event_time="ts",
        start="session_start",
        end="session_end",
        how="inner",
        closed="both",
    )
    return joined.select(
        "user_id",
        "session_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Set ops (U1), scalar function families (§2.8), misc.
# ---------------------------------------------------------------------------


@query(
    "u1_union_trading_nations",
    """
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
    UNION
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
    """,
)
def u1_union_trading_nations(spark, sf_dir):
    """UNION-dedup (reference U1: union of stint entity pairs,
    src/queries/game.py:185-195)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    cust_nations = n.join(c, "n_nationkey", "left_semi").select("n_nationkey", "n_name")
    supp_nations = n.join(s, "n_nationkey", "left_semi").select("n_nationkey", "n_name")
    return cust_nations.unionByName(supp_nations).dropDuplicates()


@query(
    "f_string_part_features",
    """
    SELECT p_partkey,
           CAST(string_split(p_brand, '#')[2] AS BIGINT)   AS brand_num,
           CASE WHEN contains(p_type, 'BRUSHED') THEN 1 ELSE 0 END AS is_brushed,
           upper(p_name)                                   AS name_upper,
           length(p_name)                                  AS name_len,
           concat(p_brand, '_', CAST(p_size AS VARCHAR))   AS brand_size_key,
           substr(p_name, 1, 5)                            AS name_prefix
    FROM part
    """,
)
def f_string_part_features(spark, sf_dir):
    """String function family (reference §2.8: toString/concat/split/
    CONTAINS id recipes, src/queries/game.py:17,69-70,383-397)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split(F.col("p_brand"), "#").getItem(1).cast("long").alias("brand_num"),
        F.when(F.col("p_type").contains("BRUSHED"), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_brushed"
        ),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("_"), F.col("p_size").cast("string")).alias(
            "brand_size_key"
        ),
        F.substring("p_name", 1, 5).alias("name_prefix"),
    )


@query(
    "f_datetime_orders",
    """
    SELECT o_orderkey,
           year(o_orderdate)                         AS order_year,
           month(o_orderdate)                        AS order_month,
           quarter(o_orderdate)                      AS order_quarter,
           dayofweek(o_orderdate) + 1                AS order_dow,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           epoch_us(o_orderdate)                     AS order_epoch_us
    FROM orders
    """,
)
def f_datetime_orders(spark, sf_dir):
    """Datetime function family (reference §2.8: datetime()/duration
    arithmetic, src/queries/game.py:18-25,370-371).

    DuckDB's dayofweek is 0-6 (Sun=0), Spark's is 1-7 (Sun=1) — the
    oracle adds 1 to align."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.timestamp_add("DAY", F.lit(90), F.col("o_orderdate")).cast("date").alias("due_date"),
        epoch_us("o_orderdate").alias("order_epoch_us"),
    )


# ---------------------------------------------------------------------------
# Flagship: composite pipeline exercising the signature operators at once
# (sessionize → conditional agg → window rank).
# ---------------------------------------------------------------------------


@query(
    "flagship_session_attribution",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess_rows AS (
        SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_id,
               MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100
                   AS purchase_revenue
        FROM sess_rows GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, session_start, n_events, n_purchases, purchase_revenue,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY purchase_revenue DESC, session_id) AS INT)
               AS revenue_rank
    FROM per_session
    """,
)
def flagship_session_attribution(spark, sf_dir):
    """Flagship composite: sessionize the event stream (W5), aggregate
    conditional purchase revenue per session (A4), rank sessions per user
    (W10).  One pipeline touching the reference's signature temporal
    operators (src/queries/game.py:134-182, 628-707, 788-795)."""
    ev = _t(spark, sf_dir, "events")
    sess = sessionize(ev, keys=["user_id"], ts="ts", gap_seconds=1800.0, tie_break=["event_id"])
    cents = scaled_long(F.col("value"), 100)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", F.lit(1))).alias("n_purchases"),
        (
            F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(F.lit(0)))
            / F.lit(100)
        ).alias("purchase_revenue"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("purchase_revenue").desc(), F.col("session_id")
    )
    return per_session.withColumn("revenue_rank", F.row_number().over(w))


@query(
    "f_json_event_props",
    """
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS prop_k,
           CASE WHEN CAST(props->>'k' AS BIGINT) >= 50 THEN 'high' ELSE 'low' END
               AS k_band
    FROM events
    """,
)
def f_json_event_props(spark, sf_dir):
    """JSON extraction family (reference §2.8: JSON parsing at source,
    src/fetcher.py:101-102 — here as a column-level from_json/path
    extraction that Catalyst can prune)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band"),
    )


@query(
    "j10_motif_customer_supplier_nation",
    """
    SELECT n.n_nationkey, n.n_name, COUNT(*) AS n_pairs
    FROM customer c
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
)
def j10_motif_customer_supplier_nation(spark, sf_dir):
    """Multi-hop motif join (reference J10: 5-way MATCH patterns in the
    export reads, src/managers/game.py:346-358) via the graph layer's
    motif_chain — chained equi-joins Catalyst reorders freely."""
    from mbai_gdb_spark.ops.graph import motif_chain

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust"), F.col("c_nationkey").alias("nat")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nat"), F.col("s_suppkey").alias("supp")
    )
    n = _t(spark, sf_dir, "nation")
    paths = motif_chain([(c, "cust", "nat"), (s, "nat", "supp")])
    return (
        paths.join(F.broadcast(n), paths.v1 == n.n_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "graph_bfs_trade_hops",
    """
    WITH RECURSIVE trade_edges AS (
        SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    walk(id, hops) AS (
        SELECT CAST(0 AS BIGINT) AS id, 0 AS hops
        UNION
        SELECT e.dst, w.hops + 1
        FROM walk w JOIN trade_edges e ON e.src = w.id
        WHERE w.hops < 5
    )
    SELECT id AS nation_key, CAST(MIN(hops) AS INT) AS hops
    FROM walk GROUP BY id
    """,
)
def graph_bfs_trade_hops(spark, sf_dir):
    """Iterative graph analytics with a full oracle: BFS shortest hop
    counts from nation 0 over the directed supplier-nation →
    customer-nation trade graph (edges = distinct nation pairs linked by
    a lineitem).  Spark side runs ops.graph.bfs (frontier join +
    left_anti visited set, localCheckpoint-truncated lineage per hop);
    the oracle is a recursive CTE over the same edge list — hop counts
    are integers, so the comparison is exact.  Upgrades the graph
    family (PageRank/CC/BFS, tests in test_graph.py) to a driver-checked
    row."""
    from mbai_gdb_spark.ops.graph import bfs

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )
    vertices = n.select(F.col("n_nationkey").alias("id"))
    out = bfs(vertices, edges, [0], max_hops=5)
    return out.select(
        F.col("id").alias("nation_key"), F.col("hops").cast("int").alias("hops")
    )


@query(
    "a2_order_span_per_customer",
    """
    SELECT o_custkey,
           MIN(o_orderdate) AS first_order_date,
           MAX(o_orderdate) AS last_order_date,
           MIN_BY(o_orderkey, CAST(epoch_us(o_orderdate) / 86400000000 AS BIGINT)
                              * 10000000000 + o_orderkey) AS first_order_key,
           MAX_BY(o_orderkey, CAST(epoch_us(o_orderdate) / 86400000000 AS BIGINT)
                              * 10000000000 + o_orderkey) AS last_order_key,
           date_diff('day', CAST(MIN(o_orderdate) AS DATE), CAST(MAX(o_orderdate) AS DATE))
               AS span_days
    FROM orders GROUP BY o_custkey
    """,
)
def a2_order_span_per_customer(spark, sf_dir):
    """First/last element per group (reference A2: period start/end from
    first/second marker row, src/managers/game.py:129-132) via
    min/max and deterministic min_by/max_by on a composite key."""
    o = _t(spark, sf_dir, "orders")
    comp = (
        (epoch_us("o_orderdate") / F.lit(86400000000)).cast("long") * F.lit(10000000000)
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order_date"),
        F.max("o_orderdate").alias("last_order_date"),
        F.min_by("o_orderkey", comp).alias("first_order_key"),
        F.max_by("o_orderkey", comp).alias("last_order_key"),
        F.datediff(
            F.max("o_orderdate").cast("date"), F.min("o_orderdate").cast("date")
        ).alias("span_days"),
    )


@query(
    "f_array_ops",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               list(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                    ORDER BY epoch_us(o_orderdate), o_orderkey) AS cents_arr
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           len(cents_arr) AS n_orders,
           list_reduce(list_prepend(CAST(0 AS BIGINT), cents_arr), (a, x) -> a + x)
               AS total_cents,
           cents_arr[1] AS first_cents,
           cents_arr[-1] AS last_cents,
           list_reduce(list_prepend(CAST(0 AS BIGINT), cents_arr[1:3]), (a, x) -> a + x)
               AS first3_cents
    FROM per_cust
    """,
)
def f_array_ops(spark, sf_dir):
    """Array/higher-order function family (reference §2.8: collect / size
    / head / last / slice / index / reduce, src/queries/game.py:44-47,
    101-108,142-167,630-707) — ordered collect, slice, element_at, and a
    sequential aggregate fold."""
    o = _t(spark, sf_dir, "orders")
    arr = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    epoch_us("o_orderdate").alias("k1"),
                    F.col("o_orderkey").alias("k2"),
                    scaled_long(F.col("o_totalprice"), 100).alias("cents"),
                )
            )
        ),
        lambda s: s["cents"],
    )
    per_cust = o.groupBy("o_custkey").agg(arr.alias("cents_arr"))
    fold = lambda a: F.aggregate(a, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return per_cust.select(
        "o_custkey",
        F.size("cents_arr").alias("n_orders"),
        fold(F.col("cents_arr")).alias("total_cents"),
        F.element_at("cents_arr", 1).alias("first_cents"),
        F.element_at("cents_arr", -1).alias("last_cents"),
        fold(F.slice("cents_arr", 1, 3)).alias("first3_cents"),
    )


@query(
    "a10_rollup_revenue",
    """
    SELECT COALESCE(l_returnflag, '__ALL__') AS returnflag,
           COALESCE(l_linestatus, '__ALL__') AS linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100
               AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a10_rollup_revenue(spark, sf_dir):
    """Hierarchical ROLLUP aggregation (beyond the reference's surface —
    SURVEY §2.4 notes grouping sets absent there but free in Spark).
    Null grouping markers normalized to '__ALL__' for hash stability."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_extendedprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("__ALL__")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("__ALL__")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


@query(
    "a13_order_count_distribution",
    """
    SELECT n_orders, COUNT(*) AS n_customers FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ) GROUP BY n_orders
    """,
)
def a13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13-style double aggregation: distribution of customers by
    order count (including zero via the left join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "a11_quantity_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.5)  AS median_qty,
           quantile_cont(l_quantity, 0.75) AS p75_qty,
           quantile_cont(l_quantity, 0.95) AS p95_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_quantity_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (beyond the reference's surface —
    SURVEY §2.4 notes these absent there, free in Spark).  Computed on
    integral quantities so the interpolation arithmetic is
    engine-identical."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
    )


@query(
    "q7_nation_trade_volume",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000
               AS volume,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
    GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
    """,
)
def q7_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7-style cross-nation volume: the same dimension table
    joined twice under different roles plus an inequality residual —
    exercises Catalyst's self-join aliasing and join reordering."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .filter(F.col("c_nk") != F.col("s_nk"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            money_sum(disc_price, 10000).alias("volume"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "w12_hourly_time_buckets",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100 AS bucket_value
    FROM events
    GROUP BY 1, 2
    """,
)
def w12_hourly_time_buckets(spark, sf_dir):
    """Tumbling time-window aggregation (the batch twin of the streaming
    windowed agg — F.window buckets align with DuckDB time_bucket on
    UTC epochs)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("bucket_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "bucket_value",
        )
    )


@query(
    "a12_pivot_event_counts",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END)    AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END)   AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END)    AS error
    FROM events GROUP BY user_id
    """,
)
def a12_pivot_event_counts(spark, sf_dir):
    """PIVOT: wide per-type counts via Spark's pivot operator (explicit
    value list → no extra distinct pass)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "tpch_scalar_suite",
    """
    SELECT 'q4_orders_' || o.o_orderpriority AS metric,
           CAST(COUNT(*) AS DOUBLE) AS value
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    UNION ALL
    SELECT 'q6_revenue' AS metric,
           CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) / 10000
               AS value
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      AND l_shipdate >= TIMESTAMP '2024-01-01'
    UNION ALL
    SELECT 'q6_n_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      AND l_shipdate >= TIMESTAMP '2024-01-01'
    UNION ALL
    SELECT 'q14_promo_share_pct' AS metric,
           ROUND(
             CAST(SUM(CASE WHEN contains(p.p_type, 'PROMO')
                       THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                       ELSE 0 END) AS DOUBLE) * 10000
             / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS DOUBLE)
           ) / 100 AS value
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def tpch_scalar_suite(spark, sf_dir):
    """TPC-H Q4 + Q6 + Q14 adaptations fused into one labeled
    (metric, value) suite — one driver slot for three plan shapes:
    correlated-EXISTS semi-join before aggregation (Q4), pure
    filter+aggregate with full scan-level pushdown (Q6), and a
    conditional-over-total share with exact fixed-point numerators
    (Q14).  Each branch keeps its round-1 physical plan; results are
    unioned as labeled scalars."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey")
        .distinct()
    )
    q4 = (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .select(
            F.concat(F.lit("q4_orders_"), F.col("o_orderpriority")).alias("metric"),
            F.col("order_count").cast("double").alias("value"),
        )
    )
    q6 = (
        li.filter(
            F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
            & (F.col("l_shipdate") >= F.lit("2024-01-01").cast("timestamp"))
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("double").alias("n_rows"),
        )
        .select(
            F.expr(
                "stack(2, 'q6_revenue', revenue, 'q6_n_rows', n_rows)"
                " AS (metric, value)"
            )
        )
    )
    disc4 = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    promo = F.sum(
        F.when(F.col("p_type").contains("PROMO"), disc4).otherwise(F.lit(0))
    ).cast("double")
    total = F.sum(disc4).cast("double")
    q14 = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.round(promo * F.lit(10000) / total, 0) / F.lit(100)).alias("value"))
        .select(F.lit("q14_promo_share_pct").alias("metric"), "value")
    )
    return q4.unionByName(q6).unionByName(q14)


@query(
    "q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT) / 100
               AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    HAVING SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) > 150 * 100
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 adaptation: large-volume orders — groupBy + HAVING on an
    exact fixed-point sum."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    qty_cents = scaled_long(F.col("l_quantity"), 100)
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            (F.sum(qty_cents) / F.lit(100)).alias("total_qty"),
            F.sum(qty_cents).alias("__qc__"),
        )
        .filter(F.col("__qc__") > 150 * 100)
        .drop("__qc__")
    )


@query(
    "q19_bracketed_revenue",
    """
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 25 AND 50)
    """,
)
def q19_bracketed_revenue(spark, sf_dir):
    """TPC-H Q19 adaptation: disjunction of per-bracket conjunctions over
    a dimension join — the OR-of-ANDs shape Catalyst must keep partially
    pushable (the common l_partkey equi-key stays a hash join; the
    brackets become a residual filter, never a cartesian)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(25, 50)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q17_below_avg_quantity",
    """
    WITH j AS (
      SELECT CAST(ROUND(l.l_quantity) AS BIGINT) AS qty_l, l.l_extendedprice,
             SUM(CAST(ROUND(l.l_quantity) AS BIGINT))
                 OVER (PARTITION BY l.l_partkey) AS sq,
             COUNT(*) OVER (PARTITION BY l.l_partkey) AS cnt
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#5'
    )
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100
               AS small_qty_revenue,
           COUNT(*) AS n_rows
    FROM j WHERE 5 * qty_l * cnt < sq
    """,
)
def q17_below_avg_quantity(spark, sf_dir):
    """TPC-H Q17 adaptation: per-part correlated threshold (quantity
    below 20% of that part's average).  The correlated scalar subquery
    becomes one window over the part key; the comparison is kept in
    integers (5*qty*cnt < sum  <=>  qty < 0.2*avg) so both engines make
    bit-identical membership decisions — no float-threshold hazard."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    w = Window.partitionBy("l_partkey")
    qty_l = F.round(F.col("l_quantity"), 0).cast("long")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("qty_l", qty_l)
        .withColumn("sq", F.sum("qty_l").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
    )
    return j.filter(5 * F.col("qty_l") * F.col("cnt") < F.col("sq")).agg(
        money_sum(F.col("l_extendedprice")).alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q21_sole_problem_supplier",
    """
    WITH r AS (
      SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = r.l_orderkey
                    AND l2.l_suppkey <> r.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = r.l_orderkey
                        AND l3.l_suppkey <> r.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_sole_problem_supplier(spark, sf_dir):
    """TPC-H Q21 adaptation: suppliers solely responsible for a returned
    item in multi-supplier orders — the EXISTS(other supplier) +
    NOT EXISTS(other supplier also returned) double correlated pattern
    as a semi-join then anti-join on (orderkey, suppkey<>) — both keep
    the orderkey equi key, so neither is a cartesian."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    other = li.select(
        F.col("l_orderkey").alias("__ok__"), F.col("l_suppkey").alias("__sk__")
    )
    other_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("__ok__"), F.col("l_suppkey").alias("__sk__")
    )
    sole = r.join(
        other,
        (F.col("__ok__") == F.col("l_orderkey"))
        & (F.col("__sk__") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        other_r,
        (F.col("__ok__") == F.col("l_orderkey"))
        & (F.col("__sk__") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q22_dormant_capital",
    """
    WITH pos AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100
               AS totacctbal
    FROM customer c, pos
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM recent WHERE recent.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_capital(spark, sf_dir):
    """TPC-H Q22 adaptation: above-average-balance customers with no
    recent orders, by nation.  The scalar 'average positive balance'
    subquery is a 1-row aggregate cross-joined (broadcast) onto the
    customer scan; membership compares integers (cents*n > sum_cents)
    so both engines agree exactly; the dormancy check is an anti-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    bal_cents = scaled_long(F.col("c_acctbal"), 100)
    pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(bal_cents).alias("__s__"), F.count(F.lit(1)).alias("__n__"))
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(bal_cents * F.col("__n__") > F.col("__s__"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "j12_concurrent_sessions",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    ), iv AS (
        SELECT user_id, session_id,
               epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
        FROM sess GROUP BY user_id, session_id
    )
    SELECT a.user_id AS user_a, a.session_id AS session_a,
           b.user_id AS user_b, b.session_id AS session_b,
           LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    """,
)
def j12_concurrent_sessions(spark, sf_dir):
    """Concurrent-session detection: sessionize per user (W5), then pair
    sessions of DIFFERENT users whose [start, end] intervals overlap —
    an interval×interval OVERLAP join.  The oracle writes the natural
    theta join; the Spark plan is the binned equi-join
    (ops.intervals.interval_overlap_join, 1-hour bins): explode to
    touched time bins, hash-join on the bin, emit each pair once —
    linear in Σ(session_len/bin), never a per-key cartesian."""
    from mbai_gdb_spark.ops.intervals import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    sess = sessionize(
        ev, keys=["user_id"], ts="ts", gap_seconds=1800.0, tie_break=["event_id"]
    )
    iv = sess.groupBy("user_id", "session_id").agg(
        epoch_us(F.min("ts")).alias("s_us"), epoch_us(F.max("ts")).alias("e_us")
    )
    a = iv.select(
        F.col("user_id").alias("user_a"),
        F.col("session_id").alias("session_a"),
        F.col("s_us").alias("s_a"),
        F.col("e_us").alias("e_a"),
    )
    b = iv.select(
        F.col("user_id").alias("user_b"),
        F.col("session_id").alias("session_b"),
        F.col("s_us").alias("s_b"),
        F.col("e_us").alias("e_b"),
    )
    pairs = interval_overlap_join(
        a, b, [], "s_a", "e_a", "s_b", "e_b",
        bin_width=3_600.0 * 1_000_000, closed="both",
    ).filter(F.col("user_a") < F.col("user_b"))
    return pairs.select(
        "user_a",
        "session_a",
        "user_b",
        "session_b",
        (F.least("e_a", "e_b") - F.greatest("s_a", "s_b")).alias("overlap_us"),
    )


@query(
    "w13_ranking_family",
    """
    WITH t AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    )
    SELECT c_custkey, c_mktsegment, cents / 100 AS total_value,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS dense_rnk,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM t
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY cents DESC, c_custkey)
    """,
)
def w13_ranking_family(spark, sf_dir):
    """Ranking-analytics family over one window spec: rank, dense_rank,
    ntile, percent_rank per market segment by customer revenue.  The
    reference never uses ranking functions (SURVEY §2.5 note); Spark
    plans all four in ONE Window operator over a single shuffle.  The
    unique c_custkey tie-break makes ntile's row order total, so both
    engines bucket identically."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    t = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("cents"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("cents"), "c_custkey")
    return t.select(
        "c_custkey",
        "c_mktsegment",
        (F.col("cents") / 100).alias("total_value"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@query(
    "q3_unshipped_revenue",
    """
    SELECT l.l_orderkey, o.o_orderdate,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) AS BIGINT) / 10000 AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-15'
      AND l.l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_unshipped_revenue(spark, sf_dir):
    """TPC-H Q3 adaptation: top-10 highest-revenue orders booked before
    but not shipped by the cutoff, for one market segment.  Both date
    predicates push to the scans; the segment dim filter rides the
    (broadcast) customer join; exact fixed-point revenue; the top-k is a
    TakeOrderedAndProject with an orderkey tie-break."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q10_returned_revenue",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) AS BIGINT) / 10000 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 adaptation: top-20 customers by revenue lost to returns
    in one year.  Return-flag and date predicates push to the scans;
    nation broadcasts; exact fixed-point revenue; custkey tie-break
    keeps the LIMIT deterministic."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH ev AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (
        SELECT user_id, min(ts) AS first_view_ts
        FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS first_click_ts
        FROM ev e JOIN v ON v.user_id = e.user_id AND e.ts > v.first_view_ts
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase_ts
        FROM ev e JOIN c ON c.user_id = e.user_id AND e.ts > c.first_click_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT u.user_id, v.first_view_ts, c.first_click_ts, p.first_purchase_ts,
           CAST(CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS steps_completed
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v USING (user_id)
    LEFT JOIN c USING (user_id)
    LEFT JOIN p USING (user_id)
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered funnel over the event stream: per user, the first view,
    the first click strictly after it, the first purchase strictly
    after that, and how many steps completed
    (ops.funnel.funnel_first_completion).  Each stage is a conditional
    min on the user key; every join reuses that key's partitioning."""
    from mbai_gdb_spark.ops.funnel import funnel_first_completion

    ev = _t(spark, sf_dir, "events")
    return funnel_first_completion(ev, ["view", "click", "purchase"])


# ---------------------------------------------------------------------------
# Sink semantics (SURVEY §2: S7 MERGE-by-unique-id) — driver-visible oracle.


@query(
    "io_merge_idempotent",
    """
    WITH base AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
               o_orderstatus
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    batch AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100000 AS price_cents,
               'R' AS o_orderstatus
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    after_insert AS (
        SELECT * FROM base
        UNION ALL
        SELECT * FROM batch
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM base)
    ),
    upd AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) + 700 AS price_cents,
               'U' AS o_orderstatus
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT o_orderkey, price_cents, o_orderstatus FROM upd
    UNION ALL
    SELECT o_orderkey, price_cents, o_orderstatus FROM after_insert
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    """,
)
def io_merge_idempotent(spark, sf_dir):
    """S7 sink semantics end-to-end, driver-checked: ON-CREATE-keep-first
    (``write_insert_if_absent``, replayed to prove idempotence — reference
    MERGE ... ON CREATE SET, src/queries/game.py:21-25 / setup.py:1-34)
    followed by a full upsert (``merge_upsert``, WHEN MATCHED UPDATE).
    The oracle is the INSERT .. ON CONFLICT DO NOTHING / DO UPDATE
    algebra over the same batches."""
    import os
    import shutil
    import tempfile

    from mbai_gdb_spark.io import merge_upsert, write_insert_if_absent

    orders = _t(spark, sf_dir, "orders")
    cents = scaled_long(F.col("o_totalprice"), 100)
    base = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", cents.alias("price_cents"), "o_orderstatus"
    )
    batch = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (cents + F.lit(100000)).alias("price_cents"),
        F.lit("R").alias("o_orderstatus"),
    )
    upd = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        (cents + F.lit(700)).alias("price_cents"),
        F.lit("U").alias("o_orderstatus"),
    )
    path = os.path.join(tempfile.gettempdir(), f"mbai_merge_sink_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    write_insert_if_absent(base, path, ["o_orderkey"], spark)
    write_insert_if_absent(batch, path, ["o_orderkey"], spark)
    write_insert_if_absent(batch, path, ["o_orderkey"], spark)  # replay: no-op
    merge_upsert(upd, path, ["o_orderkey"], spark)
    return spark.read.parquet(path).select(
        "o_orderkey", "price_cents", "o_orderstatus"
    )


@query(
    "graph_pagerank_trade",
    """
    WITH RECURSIVE trade_edges AS (
        SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM trade_edges GROUP BY src),
    pr(iter, id, rank) AS (
        SELECT 0, n_nationkey, CAST(1000000000 AS BIGINT) FROM nation
        UNION ALL
        SELECT pr.iter + 1, e.dst,
               CAST(150000000 + (85 * SUM(pr.rank // d.d)) // 100 AS BIGINT)
        FROM pr
        JOIN trade_edges e ON e.src = pr.id
        JOIN deg d ON d.src = pr.id
        WHERE pr.iter < 10
        GROUP BY pr.iter, e.dst
    )
    SELECT id AS nation_key, rank AS pagerank_scaled
    FROM pr WHERE iter = 10
    """,
)
def graph_pagerank_trade(spark, sf_dir):
    """Iterative PageRank with a FULL value-hash oracle — possible
    because ops.graph.pagerank_integer runs in scaled-integer
    arithmetic (order-independent sums, floor divisions), so ten
    DataFrame iterations and a ten-level recursive CTE produce
    bit-identical longs.  Upgrades PageRank from tests-only to a
    driver-checked row (BFS got its row in round 2; float PageRank
    remains in ops.graph for production use)."""
    from mbai_gdb_spark.ops.graph import pagerank_integer

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )
    vertices = n.select(F.col("n_nationkey").alias("id"))
    out = pagerank_integer(vertices, edges, n_iter=10)
    return out.select(
        F.col("id").alias("nation_key"), F.col("rank").alias("pagerank_scaled")
    )


@query(
    "graph_triangle_count",
    """
    WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    e AS (
        SELECT DISTINCT a.pk AS u, b.pk AS v
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    pv AS (
        SELECT a AS vertex FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT vertex AS part_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM pv GROUP BY vertex
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Per-part triangle counts on the co-purchase graph (parts linked
    when they appear in the same order).  Spark side runs the
    degree-ordered orientation scheme (ops.graph.triangle_count) whose
    wedge fan-out is bounded by sqrt(2m) per vertex regardless of
    degree skew — the formulation that survives power-law graphs at
    100 TB.  The oracle enumerates triangles by the simpler a<b<c id
    ordering; both count every triangle exactly once, so the per-vertex
    counts agree exactly.  Triangle membership is the standard
    cheap-and-strong signal for community/co-occurrence structure in
    recommendation-style training data.

    Scaling evidence (r7): the sf1 tier carries EXACTLY 10x the
    oriented wedge volume of sf0.1 (41,087,491 -> 410,874,910
    measured), so the observed ~4.5x sf1/sf0.1 wall ratio is strongly
    SUBLINEAR in actual work — the earlier 'wedge count grows
    superlinearly' reading conflated data ratio with work ratio; the
    plan has no superlinear term on this tier."""
    from mbai_gdb_spark.ops.graph import triangle_count

    edges = _copurchase_edges(
        spread(_t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"))
    )
    return triangle_count(edges, "u", "v").select(
        F.col("vertex").alias("part_key"), "n_triangles"
    )


@query(
    "w14_cohort_weekly_retention",
    """
    WITH weekly AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(activity_week) AS cohort_week
        FROM weekly GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST((epoch_us(w.activity_week) - epoch_us(c.cohort_week))
                / 604800000000 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM weekly w JOIN cohorts c USING (user_id)
    GROUP BY c.cohort_week, week_offset
    """,
)
def w14_cohort_weekly_retention(spark, sf_dir):
    """Cohort retention matrix over the event stream: users bucketed by
    first-activity week, counted in every later week they return —
    (cohort_week, week_offset, n_users).  Two aggregations on the
    user key (the second reuses the first's partitioning) and an
    integer-exact week offset (both weeks are Monday-truncated
    timestamps, so the µs difference is an exact multiple of 7 days —
    no float date math)."""
    ev = _t(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(
        F.min("activity_week").alias("cohort_week")
    )
    offset = (
        (epoch_us("activity_week") - epoch_us("cohort_week"))
        / F.lit(604800000000)
    ).cast("long")
    return (
        weekly.join(cohorts, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "w15_gap_fill",
    """
    WITH ev AS (
        SELECT user_id, ts, event_id, value,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC
        ) AS rn FROM ev
    ),
    daily AS (SELECT user_id, day, value FROM ranked WHERE rn = 1),
    span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM span
    ),
    j AS (
        SELECT g.user_id, g.day, d.value
        FROM grid g LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, day,
           last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled,
           CAST(value IS NOT NULL AS INT) AS is_observed
    FROM j
    """,
)
def w15_gap_fill(spark, sf_dir):
    """Time-series gap fill: densify each user's event stream onto a
    daily grid between their first and last activity, forward-filling
    the last observed value across silent days (the standard
    resample-and-ffill of telemetry/feature pipelines).  Day-level
    observation = last event of the day (ts desc, event_id desc — a
    deterministic tie-break).  Plan: one row_number window for the
    daily reduce, a per-user sequence() explode for the grid (grid size
    is bounded by the user's own activity span — no global calendar
    join), a left join back, and one ignore-nulls last() window.  The
    day-level reduce keys on (user_id, day) — map-side-partial-friendly
    — and every later join/window keys on user_id; values pass through
    untouched (no float arithmetic), so the hash gate is exact."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).withColumn("day", F.date_trunc("day", F.col("ts")).cast("date"))
    w_rn = W.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w_ff = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.last("value", ignorenulls=True).over(w_ff).alias("value_filled"),
        F.col("value").isNotNull().cast("int").alias("is_observed"),
    )


@query(
    "w16_rolling_7d",
    """
    WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ets,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_id, user_id, ets,
           CAST(SUM(cents) OVER w AS BIGINT) AS roll_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS roll_n
    FROM ev
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ets
        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def w16_rolling_7d(spark, sf_dir):
    """Rolling 7-day per-user aggregate: for every event, the sum/count
    of that user's events in the trailing week — the standard
    time-RANGE sliding window of feature pipelines (not a row-count
    frame: gaps and bursts change how many rows the frame holds).
    RANGE frames include all epoch ties as peers, so the result is
    deterministic under any shuffle order; sums run in integer cents
    (exact).  One shuffle on user_id; the frame is evaluated by a
    single running-window pass over each partition's sort — no
    self-join, no explode."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("ets"),
        scaled_long(F.col("value"), 100).alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ets")
        .rangeBetween(-604_800_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ets",
        F.sum("cents").over(w).alias("roll_cents"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


@query(
    "a12_cube_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                AS BIGINT) AS revenue_e4
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def a12_cube_revenue(spark, sf_dir):
    """CUBE multidimensional rollup: revenue/count at every grain of
    (returnflag, linestatus) including the two marginals and the grand
    total, with grouping_id disambiguating aggregate NULLs — the
    OLAP-cube member of the aggregation family (A5/A10 cover
    single-path rollups).  One pass: Spark expands the cube map-side
    into the grouping-set union and shares the shuffle; revenue in
    exact integer ten-thousandths."""
    li = _t(spark, sf_dir, "lineitem")
    rev = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).alias("revenue_e4"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_items", "revenue_e4")
    )


@query(
    "a13_pivot_order_matrix",
    """
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def a13_pivot_order_matrix(spark, sf_dir):
    """PIVOT: order counts as a status × priority matrix via the
    DataFrame pivot API with an EXPLICIT value list (an implicit list
    costs an extra distinct-scan job and makes the output schema
    data-dependent — never acceptable at 100 TB).  Catalyst compiles it
    to exactly the oracle's conditional-sum form: one shuffle, no
    transpose materialization."""
    o = _t(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    renames = {
        "1-URGENT": "p1_urgent",
        "2-HIGH": "p2_high",
        "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_not_specified",
        "5-LOW": "p5_low",
    }
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(renames[p]) for p in prios],
    )


@query(
    "u2_set_ops_customers",
    """
    WITH y95 AS (
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    ),
    y96 AS (
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ),
    both_years AS (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96),
    only_95 AS (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    SELECT 'retained' AS cohort, o_custkey FROM both_years
    UNION ALL
    SELECT 'churned' AS cohort, o_custkey FROM only_95
    """,
)
def u2_set_ops_customers(spark, sf_dir):
    """INTERSECT / EXCEPT set algebra (U-family beyond U1's union):
    1995 buyers split into retained (also bought in 1996) and churned
    (did not).  Spark's intersect/exceptAll compile to left-semi /
    left-anti hash joins over the deduped keysets — same shuffle shape
    as J8/J9, no sort-based set operator involved."""
    o = _t(spark, sf_dir, "orders")
    y95 = (
        o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    )
    y96 = (
        o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    )
    both_years = y95.intersect(y96).select(
        F.lit("retained").alias("cohort"), "o_custkey"
    )
    only_95 = y95.exceptAll(y96).select(
        F.lit("churned").alias("cohort"), "o_custkey"
    )
    return both_years.unionAll(only_95)


@query(
    "a14_corr_qty_price",
    """
    WITH sums AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)
                        * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr_qty_price
    FROM sums
    """,
)
def a14_corr_qty_price(spark, sf_dir):
    """Pearson correlation per return flag — computed from EXACT
    integer moment sums (n, Σx, Σy, Σx², Σy², Σxy as BIGINTs; price
    rounded to whole units so Σy² stays in int64), with the float
    formula applied once per GROUP to the exact sums.  Spark's builtin
    corr() streams float partials whose accumulation order varies run
    to run; this form is order-independent and bit-reproducible on any
    engine — the moment sums are also exactly what a 1000-way partial
    aggregation merges by addition.  The raw moments are emitted
    alongside for the hash gate."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice"), 0).cast("long")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    corr = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - sxd * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - syd * F.col("sy"))
    )
    return sums.select(
        "l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy",
        corr.alias("corr_qty_price"),
    )


@query(
    "w17_scd2_user_value",
    """
    WITH ev AS (
        SELECT user_id, ts, event_id, value,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC
        ) AS rn FROM ev
    ),
    daily AS (SELECT user_id, day, value FROM ranked WHERE rn = 1),
    flagged AS (
        SELECT user_id, day, value,
               ROW_NUMBER() OVER w AS pos,
               LAG(value) OVER w AS prev_value
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    changes AS (
        SELECT user_id, day AS valid_from, value
        FROM flagged
        WHERE pos = 1 OR value IS DISTINCT FROM prev_value
    )
    SELECT user_id, valid_from,
           LEAD(valid_from) OVER w2 AS valid_to,
           value,
           CAST(ROW_NUMBER() OVER w2 AS INT) AS version
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
    """,
)
def w17_scd2_user_value(spark, sf_dir):
    """Slowly-changing-dimension type 2 built from the raw event
    stream: each user's day-level value collapsed to validity
    intervals — a row per VALUE CHANGE with [valid_from, valid_to)
    and a version number (valid_to NULL = current).  The standard
    warehouse dimension-history shape: a (user_id, day)-keyed window
    picks each day's last value (deterministic tie-break), then the
    change-detection lag and interval-closing lead windows both run on
    the user_id partitioning — two exchanges total, the second shared
    by both interval windows."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).withColumn("day", F.date_trunc("day", F.col("ts")).cast("date"))
    w_rn = W.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    w = W.partitionBy("user_id").orderBy("day")
    flagged = daily.select(
        "user_id",
        "day",
        "value",
        F.row_number().over(w).alias("pos"),
        F.lag("value").over(w).alias("prev_value"),
    )
    changes = flagged.filter(
        (F.col("pos") == 1) | ~F.col("value").eqNullSafe(F.col("prev_value"))
    ).select("user_id", F.col("day").alias("valid_from"), "value")
    w2 = W.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "value",
        F.row_number().over(w2).alias("version"),
    )


_KCORE_GOLD = [
    # (distinct co-purchase edge-count fingerprint, k, n_vertices, n_edges)
    (8899, 48, 200, 8899),
    (8899, 80, 0, 0),
    (8899, 112, 0, 0),
    (115729, 48, 1999, 115687),
    (115729, 80, 1857, 105232),
    (115729, 112, 0, 0),
    (1196000, 48, 19989, 1195519),
    (1196000, 80, 18863, 1114197),
    (1196000, 112, 0, 0),
    # sf1 (r14): independently verified by a numpy batch peel over the
    # DuckDB-extracted co-purchase edges (/tmp-scripted, recorded in
    # NOTES.md round 14) — engine ≡ reference bit-equal.
    (11960000, 48, 199890, 11955190),
    (11960000, 80, 188630, 11141970),
    (11960000, 112, 0, 0),
]


@query(
    "graph_kcore_profile",
    f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    e AS (
        SELECT DISTINCT a.pk AS u, b.pk AS v
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    ),
    m AS (SELECT COUNT(*) AS m FROM e),
    golden(m, k, n_vertices, n_edges) AS (
        VALUES {", ".join(f"({m}, {k}, {n}, {s})" for m, k, n, s in _KCORE_GOLD)}
    )
    SELECT CAST(k AS INT) AS k, CAST(n_vertices AS BIGINT) AS n_vertices,
           CAST(n_edges AS BIGINT) AS n_edges
    FROM golden JOIN m USING (m)
    """,
)
def graph_kcore_profile(spark, sf_dir):
    """k-core decomposition profile of the co-purchase graph: for k in
    (48, 80, 112), the size of the maximal subgraph where every part
    co-occurs with >= k others (ops.graph.kcore_profile — delta-based
    Matula-Beck peel: ONE immutable adjacency frame, one continuous
    peel threading the small (vertex, degree) table through ascending
    ks; per round only the newly-peeled delta touches the adjacency,
    and n_edges falls out of the fixpoint degrees as sum(deg)/2, so
    no edge frame is ever rewritten, semi-joined, or re-aggregated).
    The peel is iterative-to-fixpoint — not ANSI-SQL-expressible — so
    the oracle pins the deterministic profile as golden VALUES keyed by
    the SQL-computable edge-count fingerprint (the W11/BPE golden
    scheme); the k-core's uniqueness makes the result peel-order- and
    partitioning-independent, and unit tests certify the algorithm on
    closed-form graphs."""
    from mbai_gdb_spark.ops.graph import kcore_profile

    # distinct=False (r15): the peel's state build dedups inside its
    # own vertex-keyed collect_set exchange — see _copurchase_edges.
    edges = _copurchase_edges(
        spread(_t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")),
        distinct=False,
    )
    rows = kcore_profile(edges, [48, 80, 112], "u", "v")
    return spark.createDataFrame(rows, "k int, n_vertices long, n_edges long")


@query(
    "a15_mode_order_priority",
    """
    WITH counts AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority
        ) AS rn FROM counts
    ) WHERE rn = 1
    """,
)
def a15_mode_order_priority(spark, sf_dir):
    """Mode (most frequent value) per group with a deterministic
    tie-break — built as count + top-1 window rather than Spark's
    ``mode()`` aggregate, whose tie choice is undefined and therefore
    unhashable cross-engine.  The window runs on group-count rows (one
    per (status, priority)), not the fact table."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


@query(
    "a16_revenue_share",
    """
    WITH nat AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) AS BIGINT) AS rev_e4
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, rev_e4,
           CAST(rev_e4 AS DOUBLE)
           / SUM(rev_e4) OVER (PARTITION BY region) AS region_share,
           CAST(rev_e4 AS DOUBLE) / SUM(rev_e4) OVER () AS global_share
    FROM nat
    """,
)
def a16_revenue_share(spark, sf_dir):
    """Ratio-to-report: each nation's share of its region's revenue and
    of the global total — the percent-of-parent idiom of every OLAP
    report.  Revenue aggregates in exact integer ten-thousandths, so
    the two window sums are integer-exact and the final share division
    is one deterministic float op; the windows run over the 25-row
    nation rollup, not the fact table (the global-total window's single
    partition holds 25 rows — allowlisted scale-wise by construction)."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
    )
    nat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("rev_e4"))
    )
    return nat.select(
        "region",
        "nation",
        "rev_e4",
        (
            F.col("rev_e4").cast("double")
            / F.sum("rev_e4").over(W.partitionBy("region"))
        ).alias("region_share"),
        (
            F.col("rev_e4").cast("double")
            / F.sum("rev_e4").over(W.partitionBy())
        ).alias("global_share"),
    )
