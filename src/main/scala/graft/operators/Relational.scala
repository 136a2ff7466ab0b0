package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Num._

/** Part-B relational surface (SURVEY.md §2 Part B): scans, projection,
  * filter, equi/semi/anti/outer/theta joins, aggregation, rollup/cube,
  * windows, sort/top-k, set ops, scalar functions.
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region, nation, small literal lookups) are
  *    `broadcast()`ed — no shuffle for those joins at any SF;
  *  - fact-fact joins (lineitem⋈orders, orders⋈customer) shuffle on their
  *    keys and rely on AQE for skew/coalesce; nothing collects to the driver;
  *  - every aggregate gets a map-side partial for free via hash aggregation;
  *  - all money math runs in DECIMAL (see [[Num]]) — order-independent, so
  *    results are stable under any partitioning.
  */
object Relational {

  /** TPC-H Q1 shape: scan-filter-aggregate over lineitem. */
  val q01PricingSummary = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) * (1 + CAST(l_tax AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""") { (spark, dir) =>
    T(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).cast("double").as("sum_charge"),
        dmean(col("l_quantity")).as("avg_qty"),
        dmean(col("l_extendedprice")).as("avg_price"),
        dmean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q5 shape: star join; nation+region broadcast, fact joins shuffle. */
  val q02RevenueByNation = Q(
    "q02_revenue_by_nation",
    """SELECT r_name, n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY r_name, n_name
       ORDER BY r_name, n_name""") { (spark, dir) =>
    val li = T(spark, dir, "lineitem")
    val o = T(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val c = T(spark, dir, "customer")
    val n = T(spark, dir, "nation")
    val r = T(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-k by aggregate: revenue per order, global top 10 (sort+limit). */
  val q03TopOrders = Q(
    "q03_top_orders",
    """SELECT o_orderkey, o_custkey,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderkey, o_custkey
       ORDER BY revenue DESC, o_orderkey
       LIMIT 10""") { (spark, dir) =>
    // r12 optimization (guide §2.3 "aggregate before you shuffle"):
    // revenue depends only on lineitem columns and o_custkey is
    // functionally determined by o_orderkey, so the per-order decimal
    // sum runs BEFORE the join — map-side partials collapse ~4 lines per
    // order ahead of the exchange and the join carries one row per order
    // instead of every line. Values identical: one exact decimal sum per
    // order, cast once, same group set as the oracle's post-join GROUP BY.
    T(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("r"))
      .join(T(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("r").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4 shape: EXISTS as a left-semi join (no row multiplication). */
  val q04OrderPriority = Q(
    "q04_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""") { (spark, dir) =>
    val o = T(spark, dir, "orders")
    val li = T(spark, dir, "lineitem").filter(col("l_discount") > 0.05)
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Per-group top-k via window row_number (two-stage: agg then window). */
  val q05TopPartsPerFlag = Q(
    "q05_top_parts_per_flag",
    """SELECT l_returnflag, l_partkey, revenue, rn FROM (
         SELECT l_returnflag, l_partkey, revenue,
                ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                   ORDER BY revenue DESC, l_partkey) AS rn
         FROM (SELECT l_returnflag, l_partkey,
                      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS revenue
               FROM lineitem GROUP BY l_returnflag, l_partkey))
       WHERE rn <= 3
       ORDER BY l_returnflag, rn""") { (spark, dir) =>
    val agg = T(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(dsum(col("l_extendedprice")).as("revenue"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("revenue").desc, col("l_partkey"))
    agg.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_returnflag"), col("l_partkey"), col("revenue"), col("rn"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** Running aggregate with an explicit ROWS frame (full 60k-row output —
    * value-level window correctness, not just shape). */
  val q06RunningRevenue = Q(
    "q06_running_revenue",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_rev
       FROM lineitem
       ORDER BY l_suppkey, l_orderkey, l_linenumber, running_rev""") { (spark, dir) =>
    // l_extendedprice is the LAST window order key because (orderkey,
    // linenumber) is not guaranteed unique in the data (sf0.1 carries one
    // duplicated key pair): without it the engines disagree on which twin
    // accumulates first and the two prefix sums differ mid-series. Rows
    // still tied after the price carry equal contributions, so every
    // prefix sum is well-defined whatever order an engine picks.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_extendedprice"))).over(w).cast("double").as("running_rev"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("running_rev"))
  }

  /** lag/lead over a per-user event sequence. */
  val q07LagLead = Q(
    "q07_lag_lead",
    """SELECT user_id, event_id, value,
       LAG(value)  OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
       FROM events
       ORDER BY user_id, event_id""") { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    T(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Semi join: customers with at least one big order. */
  val q08BigOrderCustomers = Q(
    "q08_big_order_customers",
    """SELECT c_custkey, c_name
       FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 400000)
       ORDER BY c_custkey""") { (spark, dir) =>
    val c = T(spark, dir, "customer")
    val o = T(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Anti join: customers with no high-value orders. */
  val q09CustomersWithoutOrders = Q(
    "q09_customers_without_big_orders",
    """SELECT c_custkey, c_mktsegment
       FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 450000)
       ORDER BY c_custkey""") { (spark, dir) =>
    val c = T(spark, dir, "customer")
    val o = T(spark, dir, "orders").filter(col("o_totalprice") > 450000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Set operations: intersect / except / union-all, tagged. */
  val q10SetOps = Q(
    "q10_set_ops",
    """SELECT 'both' AS tag, k FROM
         (SELECT c_nationkey AS k FROM customer
          INTERSECT SELECT s_nationkey AS k FROM supplier)
       UNION ALL
       SELECT 'cust_only' AS tag, k FROM
         (SELECT c_nationkey AS k FROM customer
          EXCEPT SELECT s_nationkey AS k FROM supplier)
       ORDER BY tag, k""") { (spark, dir) =>
    val ck = T(spark, dir, "customer").select(col("c_nationkey").as("k"))
    val sk = T(spark, dir, "supplier").select(col("s_nationkey").as("k"))
    val both = ck.intersect(sk).select(lit("both").as("tag"), col("k"))
    val custOnly = ck.except(sk).select(lit("cust_only").as("tag"), col("k"))
    both.unionByName(custOnly).orderBy(col("tag"), col("k"))
  }

  /** ROLLUP with grouping indicators (cast to BIGINT on both sides). */
  val q11Rollup = Q(
    "q11_rollup",
    """SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { (spark, dir) =>
    T(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"),
        col("g_status"), col("n"), col("sum_qty"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** CUBE over two order dimensions. */
  val q12Cube = Q(
    "q12_cube",
    """SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_price
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (spark, dir) =>
    T(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"),
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("g_status"),
        col("g_priority"), col("n"), col("sum_price"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** COUNT DISTINCT per group (expands to two-phase distinct aggregation). */
  val q13DistinctAgg = Q(
    "q13_distinct_parts",
    """SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag""") { (spark, dir) =>
    T(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Scalar string functions (codegen'd built-ins, no UDFs). */
  val q14StringFns = Q(
    "q14_string_fns",
    """SELECT p_partkey,
       UPPER(p_name) AS uname,
       SUBSTR(p_name, 1, 3) AS prefix3,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word
       FROM part
       ORDER BY p_partkey""") { (spark, dir) =>
    T(spark, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 3).as("prefix3"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
      .orderBy(col("p_partkey"))
  }

  /** Temporal functions: truncation + extraction, monthly aggregation. */
  val q15MonthlyOrders = Q(
    "q15_monthly_orders",
    """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
       CAST(YEAR(o_orderdate) AS BIGINT) AS y,
       CAST(MONTH(o_orderdate) AS BIGINT) AS m,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total
       FROM orders
       GROUP BY 1, 2, 3
       ORDER BY month""") { (spark, dir) =>
    T(spark, dir, "orders")
      .groupBy(
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("month"))
  }

  /** Conditional aggregation (CASE WHEN inside aggregates). */
  val q16ConditionalAgg = Q(
    "q16_conditional_agg",
    """SELECT o_orderpriority,
       CAST(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS finished_total,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_count,
       COUNT(*) AS n
       FROM orders
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""") { (spark, dir) =>
    T(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(dec(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0)))).cast("double").as("finished_total"),
        count(when(col("o_orderstatus") === "O", lit(1))).as("open_count"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** HAVING: group filter after aggregation. */
  val q17Having = Q(
    "q17_having",
    """SELECT l_suppkey, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS qty
       FROM lineitem
       GROUP BY l_suppkey
       HAVING COUNT(*) > 100
       ORDER BY l_suppkey""") { (spark, dir) =>
    T(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .filter(col("n") > 100)
      .orderBy(col("l_suppkey"))
  }

  /** Full outer join of two aggregates (null-producing sides exercised). */
  val q18FullOuter = Q(
    "q18_full_outer",
    """SELECT COALESCE(c.k, s.k) AS nationkey,
              COALESCE(c.n_cust, 0) AS n_cust,
              COALESCE(s.n_supp, 0) AS n_supp
       FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
       FULL OUTER JOIN
            (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
       ON c.k = s.k
       ORDER BY nationkey""") { (spark, dir) =>
    val c = T(spark, dir, "customer").groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val s = T(spark, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, col("ck") === col("sk"), "full_outer")
      .select(
        coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Theta (range) join against a broadcast literal band table. */
  val q19PriceBands = Q(
    "q19_price_bands",
    """SELECT band, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total
       FROM orders
       JOIN (VALUES ('low', 0, 100000), ('mid', 100000, 300000),
                    ('high', 300000, 1000000)) b(band, lo, hi)
         ON o_totalprice >= lo AND o_totalprice < hi
       GROUP BY band
       ORDER BY band""") { (spark, dir) =>
    import spark.implicits._
    val bands = Seq(("low", 0d, 100000d), ("mid", 100000d, 300000d),
      ("high", 300000d, 1000000d)).toDF("band", "lo", "hi")
    T(spark, dir, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("band"))
  }

  /** Per-group top-k customers by spend (window over join+agg). */
  val q20TopCustomersPerSegment = Q(
    "q20_top_customers_per_segment",
    """SELECT c_mktsegment, c_custkey, spend, rn FROM (
         SELECT c_mktsegment, c_custkey, spend,
                ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY spend DESC, c_custkey) AS rn
         FROM (SELECT c_mktsegment, c_custkey,
                      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS spend
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_mktsegment, c_custkey))
       WHERE rn <= 3
       ORDER BY c_mktsegment, rn""") { (spark, dir) =>
    val agg = T(spark, dir, "orders")
      .join(T(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(dsum(col("o_totalprice")).as("spend"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("spend").desc, col("c_custkey"))
    agg.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"), col("spend"), col("rn"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** q87: per-group top-k WITH TIES — `rank() <= k`, the FETCH FIRST k
    * ROWS WITH TIES semantics, vs [[q05TopPartsPerFlag]]'s row_number
    * (which silently DROPS tied peers: a report that cuts one of two
    * equal-revenue parts is wrong in a way nobody notices). Revenue is
    * banded to hundred-thousand-dollar integers so ties genuinely occur
    * (ScaleSpec pins a real multi-row tie group) and the tie groups are
    * value-determined — output size varies per group, by design. Spark plans the rank filter as a map-side WindowGroupLimit
    * exactly like the row_number form (PlanSpec-gated), so "with ties"
    * costs nothing extra at scale. */
  val q87TopKWithTies = Q(
    "q87_topk_with_ties",
    """SELECT l_returnflag, l_partkey, rev_k, rnk FROM (
         SELECT l_returnflag, l_partkey, rev_k,
                CAST(RANK() OVER (PARTITION BY l_returnflag
                                  ORDER BY rev_k DESC) AS BIGINT) AS rnk
         FROM (SELECT l_returnflag, l_partkey,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) * 100
                           AS BIGINT) // 10000000 AS rev_k
               FROM lineitem GROUP BY l_returnflag, l_partkey))
       WHERE rnk <= 3
       ORDER BY l_returnflag, rnk, l_partkey""") { (spark, dir) =>
    val agg = T(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(expr("cast(sum(cast(l_extendedprice as decimal(12,4))) * 100 " +
        "as bigint) div 10000000").as("rev_k"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("rev_k").desc)
    agg.withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("l_returnflag"), col("l_partkey"), col("rev_k"), col("rnk"))
      .orderBy(col("l_returnflag"), col("rnk"), col("l_partkey"))
  }

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02RevenueByNation, q03TopOrders, q04OrderPriority,
    q05TopPartsPerFlag, q06RunningRevenue, q07LagLead, q08BigOrderCustomers,
    q09CustomersWithoutOrders, q10SetOps, q11Rollup, q12Cube, q13DistinctAgg,
    q14StringFns, q15MonthlyOrders, q16ConditionalAgg, q17Having,
    q18FullOuter, q19PriceBands, q20TopCustomersPerSegment, q87TopKWithTies)
}
