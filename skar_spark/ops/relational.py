"""Relational operator surface — skar's query DSL re-expressed on Spark.

Every operator family from SURVEY.md §2.2-2.6 gets a (DataFrame fn,
oracle SQL) pair on the driver's TPC-H-ish tables. The Spark side is pure
DataFrame API (Catalyst plans: pushdown, broadcast, codegen); the SQL side
is ANSI DuckDB — the driver cross-checks them at sf0.01.

Column aliases match exactly between both sides (the driver hashes values
under sorted column names).
"""

from __future__ import annotations

from functools import reduce
import operator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """CPU-bound per-row kernels need cluster-wide parallelism: a small
    bench input arrives as ONE parquet split, serializing the expensive
    expression pipeline onto one core. Repartition ONLY when the scan
    yields fewer splits than cores — at production scale parquet already
    provides ≥ cores splits, so no shuffle is ever added at 10^12 docs."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


# --- F1: range predicate (execution/mod.rs:341-353) -------------------------

def q_range_filter(spark, sf):
    li = load(spark, sf, "lineitem")
    # no rounding: IEEE double products are bit-identical across engines,
    # while round() half-way tie-breaking differs between Spark and DuckDB
    return (li.filter((F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 5000))
            .select("l_orderkey", "l_partkey", "l_quantity",
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .alias("net_price")))


SQL_RANGE_FILTER = """
SELECT l_orderkey, l_partkey, l_quantity,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 5000
"""

# --- F2/F6/F8: OR-of-conjunctions of IN-sets (execution/mod.rs:120-261) ------

_CUSTS = [1, 7, 13, 42, 100, 555]
_PRIOS = ["1-URGENT", "2-HIGH"]


def q_inset_disjunction(spark, sf):
    o = load(spark, sf, "orders")
    sel1 = F.col("o_custkey").isin(_CUSTS) & (F.col("o_orderstatus") == "O")
    sel2 = F.col("o_orderpriority").isin(_PRIOS) & (F.col("o_totalprice") > 200000)
    conds = reduce(operator.or_, [sel1, sel2])
    return o.filter(conds).select("o_orderkey", "o_custkey", "o_orderstatus",
                                  "o_orderpriority")


SQL_INSET_DISJUNCTION = f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders
WHERE (o_custkey IN ({','.join(map(str, _CUSTS))}) AND o_orderstatus = 'O')
   OR (o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice > 200000)
"""

# --- F4: composite-key IN-set — (block_number, tx_index) pair membership
#     (execution/mod.rs:375-391); realized as a broadcast semi-join on the
#     pair, the scalable form of the reference's hash-set probe ------------

_PAIRS = [(1, 1), (3, 2), (32, 1), (70, 3), (99, 1), (1000, 2)]


def q_pair_inset(spark, sf):
    li = load(spark, sf, "lineitem")
    pairs = spark.createDataFrame(_PAIRS, "l_orderkey long, l_linenumber int")
    return (li.join(F.broadcast(pairs), ["l_orderkey", "l_linenumber"],
                    "left_semi")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))


SQL_PAIR_INSET = f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
WHERE (l_orderkey, l_linenumber) IN (
  {', '.join(f'({a}, {b})' for a, b in _PAIRS)})
"""

# --- J1/J2: semi-join (execution/mod.rs:86-95,176-194) -----------------------

def q_semi_join(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 150000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name", "c_nationkey"))


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
"""

# --- J4-style anti-join (validate_parquet.rs:31-63 membership checks) --------

def q_anti_join(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""

# --- J3: ingest-time inner join (schema.rs:183-244) --------------------------

def q_inner_join(spark, sf):
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey, "inner")
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
            .filter(F.col("o_totalprice") > 250000)
            .select("o_orderkey", "c_name", "n_name",
                    F.col("o_totalprice").alias("total")))


SQL_INNER_JOIN = """
SELECT o_orderkey, c_name, n_name, o_totalprice AS total
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
WHERE o_totalprice > 250000
"""

# --- A1: zone-map min/max aggregation (build_parquet_idx.rs:50-83) -----------

def q_zone_minmax(spark, sf):
    li = load(spark, sf, "lineitem")
    return (li.withColumn("bucket", (F.col("l_orderkey") / 1000).cast("long"))
            .groupBy("bucket")
            .agg(F.min("l_orderkey").alias("min_key"),
                 F.max("l_orderkey").alias("max_key"),
                 F.count("*").alias("n_rows")))


SQL_ZONE_MINMAX = """
SELECT CAST(l_orderkey // 1000 AS BIGINT) AS bucket,
       min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
       count(*) AS n_rows
FROM lineitem GROUP BY 1
"""

# --- A2: distinct-set build (build_parquet_idx.rs:89-171) --------------------

def q_distinct_sets(spark, sf):
    li = load(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                 F.countDistinct("l_partkey").alias("n_part")))


SQL_DISTINCT_SETS = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part
FROM lineitem GROUP BY l_returnflag
"""

# --- flagship aggregate: TPC-H Q1 shape (hash agg — absent in reference,
#     supplied natively by Spark; SURVEY §2.4) --------------------------------

def q_tpch_q1(spark, sf):
    li = load(spark, sf, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order")))


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

def q_percentile_agg(spark, sf):
    """Exact percentiles per group (Spark `percentile`, linear
    interpolation — matches DuckDB quantile_cont bitwise): the order-
    statistics aggregate surface. At scale this is a single shuffle on
    the group key; `approx_percentile` is the sketch alternative when
    exactness isn't required (not used here so the oracle stays exact)."""
    li = load(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
                 .alias("med_price"),
                 F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4)
                 .alias("p90_price"),
                 F.count("*").alias("n")))


SQL_PERCENTILE_AGG = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_tpch_q3(spark, sf):
    """TPC-H Q3 shape: the canonical 3-table join pipeline — filtered
    customer segment ⨝ orders ⨝ lineitem, grouped revenue, deterministic
    top-N (total order: revenue desc, orderdate, orderkey). At scale the
    filtered dimension sides are broadcast-able and the big join shuffles
    on the orderkey equi-key; nothing here fights Catalyst/AQE."""
    c = (load(spark, sf, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING")
         .select("c_custkey"))
    o = (load(spark, sf, "orders")
         .filter(F.col("o_orderdate") < F.lit("1997-06-01"))
         .select("o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"))
    li = (load(spark, sf, "lineitem")
          .filter(F.col("l_shipdate") > F.lit("1997-06-01"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(c, o.o_custkey == c.c_custkey))
    rev = F.round(F.sum(F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))), 2)
    return (j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(rev.alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(),
                     F.col("l_orderkey").asc())
            .limit(10))


SQL_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


# --- O1/O3: multi-key lexsort + limit (write_parquet.rs:131-153) -------------

def q_lexsort_topn(spark, sf):
    li = load(spark, sf, "lineitem")
    return (li.orderBy(F.col("l_returnflag").asc(), F.col("l_shipdate").desc(),
                       F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
            .select("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")
            .limit(100))


SQL_LEXSORT_TOPN = """
SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber
FROM lineitem
ORDER BY l_returnflag ASC, l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
"""

# --- U1: UNION ALL (write_parquet.rs:105-129) --------------------------------

def q_union_all(spark, sf):
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", F.lit("high").alias("tier"))
    b = o.filter(F.col("o_totalprice") < 50000).select(
        "o_orderkey", F.lit("low").alias("tier"))
    return a.unionAll(b)


SQL_UNION_ALL = """
SELECT o_orderkey, 'high' AS tier FROM orders WHERE o_totalprice > 300000
UNION ALL
SELECT o_orderkey, 'low' AS tier FROM orders WHERE o_totalprice < 50000
"""

# --- C1/C4: hex + prefix derivations (server.rs:444-497, schema.rs:224) ------

def q_hex_derive(spark, sf):
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.lower(F.hex(F.col("o_orderpriority"))).alias("prio_hex"),
        F.substring("o_orderpriority", 1, 1).alias("prio_class"),
        F.concat(F.lit("0x"), F.lower(F.hex(F.col("o_orderkey")))).alias("key_hex"),
    ).filter(F.col("o_orderkey") < 2000)


SQL_HEX_DERIVE = """
SELECT o_orderkey, lower(hex(o_orderpriority)) AS prio_hex,
       substr(o_orderpriority, 1, 1) AS prio_class,
       concat('0x', lower(hex(o_orderkey))) AS key_hex
FROM orders WHERE o_orderkey < 2000
"""

# --- A6: contiguity / gap detection (ingest/src/validate.rs:51-68) -----------

def q_gap_detect(spark, sf):
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (ev.withColumn("prev_id", F.lag("event_id").over(w))
            .filter(F.col("prev_id").isNotNull())
            .withColumn("gap", F.col("event_id") - F.col("prev_id"))
            .filter(F.col("gap") > 1000)
            .select("user_id", "prev_id", "event_id", "gap"))


SQL_GAP_DETECT = """
SELECT user_id, prev_id, event_id, gap FROM (
  SELECT user_id, event_id,
         lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id,
         event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS gap
  FROM events) t
WHERE prev_id IS NOT NULL AND gap > 1000
"""

# --- window top-k per group (SURVEY §2.5: absent in reference, Spark-native) --

def q_window_topk(spark, sf):
    o = load(spark, sf, "orders")
    return (o.withColumn("grp", F.pmod(F.col("o_custkey"), F.lit(50)))
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("grp").orderBy(
                    F.col("o_totalprice").desc(), F.col("o_orderkey").asc())))
            .filter(F.col("rn") <= 3)
            .select("grp", "rn", "o_orderkey",
                    F.col("o_totalprice").alias("total")))


SQL_WINDOW_TOPK = """
SELECT grp, rn, o_orderkey, o_totalprice AS total FROM (
  SELECT o_custkey % 50 AS grp, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey % 50
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 3
"""

# --- rollup (SURVEY §2.4: absent in reference, Spark-native) ------------------

def q_rollup(spark, sf):
    li = load(spark, sf, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("qty")))


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# --- left outer join + agg (round 2: outer-join surface) ----------------------

def q_left_join(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return (j.groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders"),
                 F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2)
                 .alias("total_f")))


SQL_LEFT_JOIN = """
SELECT c_custkey, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_f
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
  ON c_custkey = o_custkey
GROUP BY c_custkey
"""

# --- group-by + HAVING --------------------------------------------------------

def q_having(spark, sf):
    li = load(spark, sf, "lineitem")
    return (li.groupBy("l_suppkey")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_extendedprice"), 2).alias("rev"))
            .filter(F.col("n") >= 30))


SQL_HAVING = """
SELECT l_suppkey, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
FROM lineitem GROUP BY l_suppkey HAVING count(*) >= 30
"""

# --- event sessionization (gaps-and-islands; 30-min inactivity window) --------

def q_sessionize(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    # events.ts is TIMESTAMP_NTZ; session tz is UTC so the cast is exact
    gap = us(F.col("ts")) - us(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    sess = (e.withColumn("is_new", new_sess)
            .withColumn("sess", F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "sess")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sess_value"),
                 ((F.unix_micros(F.max("ts").cast("timestamp"))
                   - F.unix_micros(F.min("ts").cast("timestamp")))
                  / 1_000_000).alias("span_sec")))


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
  FROM g)
SELECT user_id, sess, count(*) AS n_events,
       round(sum(value), 2) AS sess_value,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1000000
           AS span_sec
FROM s GROUP BY user_id, sess
"""

# --- JSON property extraction over events --------------------------------------

def q_json_extract(spark, sf):
    # JSON parsing is the CPU-bound kernel here; a bench-sized events
    # table arrives as 1-4 splits, so spread the 2 needed columns across
    # cores first (no-op at production split counts — see _spread)
    e = _spread(spark, load(spark, sf, "events").select("event_type",
                                                        "props"))
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("k_sum"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max")))


SQL_JSON_EXTRACT = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
"""

# --- AS-OF join (custom operator: Spark has no native ASOF) -------------------
#
# For each 'click' event, the latest 'view' event of the same user at or
# before it. Spark realization is the sorted-union window trick — tag the
# two streams, order by (ts, kind) within user, and carry the last seen
# view via last(..., ignorenulls) — one shuffle on user_id, no UDF, no
# cross product. DuckDB oracle uses its native ASOF JOIN. At 10^12 rows
# the window runs per user partition (bounded), same shape as any
# sessionization.

def q_asof_join(spark, sf):
    e = load(spark, sf, "events")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    views = (e.filter(F.col("event_type") == "view")
             .select("user_id", "ts", "event_id", F.lit(0).alias("kind")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id", F.lit(1).alias("kind")))
    u = views.unionAll(clicks)
    # kind=0 (view) sorts before kind=1 (click) on ts ties → `<=` asof
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = (u.withColumn(
        "view_event_id",
        F.last(F.when(F.col("kind") == 0, F.col("event_id")),
               ignorenulls=True).over(w))
        .withColumn(
        "view_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ts")),
               ignorenulls=True).over(w)))
    return (carried.filter(F.col("kind") == 1)
            .select(F.col("event_id").alias("click_id"), "user_id",
                    "view_event_id",
                    ((us(F.col("ts")) - us(F.col("view_ts"))) / 1_000_000)
                    .alias("gap_sec")))


SQL_ASOF_JOIN = """
SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_event_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS DOUBLE) / 1000000
           AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""

# --- range join (time-window join via bucketing) -------------------------------
#
# For each 'error' event, how many 'click' events the same user made in
# the preceding 5 minutes. A naive theta-join is O(n·m); the scalable
# plan buckets time into window-sized cells so the join is an EQUI-join
# on (user_id, bucket) — each click lands in exactly the 2 buckets that
# could contain a matching error — with the exact range as a residual
# filter. DuckDB oracle uses the plain inequality join.

_RANGE_US = 5 * 60 * 1_000_000


def q_range_join(spark, sf):
    e = load(spark, sf, "events")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    errors = (e.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"), "user_id",
                      us(F.col("ts")).alias("e_us"))
              .withColumn("bucket", (F.col("e_us") / _RANGE_US)
                          .cast("long")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      us(F.col("ts")).alias("c_us")))
    # a click at t can match errors in (t, t + 5min] → buckets b and b+1
    cand = clicks.withColumn(
        "bucket", F.explode(F.array(
            (F.col("c_us") / _RANGE_US).cast("long"),
            (F.col("c_us") / _RANGE_US).cast("long") + 1)))
    j = errors.join(
        cand,
        (errors.user_id == cand.c_user) & (errors.bucket == cand.bucket)
        & (cand.c_us >= errors.e_us - F.lit(_RANGE_US))
        & (cand.c_us < errors.e_us),
        "left")
    return (j.groupBy("error_id", "user_id")
            .agg(F.count("click_id").alias("n_clicks_5m")))


SQL_RANGE_JOIN = """
SELECT e.event_id AS error_id, e.user_id,
       count(c.event_id) AS n_clicks_5m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND epoch_us(c.ts) >= epoch_us(e.ts) - 5 * 60 * 1000000
 AND epoch_us(c.ts) < epoch_us(e.ts)
GROUP BY e.event_id, e.user_id
"""
