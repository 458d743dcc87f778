package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Det._

/** The relational operator suite (SURVEY.md §2.2): one declared,
  * oracle-paired query per operator family the reference lacks but the
  * north star requires. All plans are declarative DataFrame code so
  * Catalyst owns pushdown / pruning / join selection; `broadcast()` hints
  * mark the genuinely small dimensions (they stay small at any scale
  * factor — region/nation/part are fixed-size or sublinear dims).
  *
  * Scale notes (100 TB thinking):
  *  - fact-fact joins (lineitem x orders) shuffle on the join key only
  *    after filters are pushed below the join;
  *  - every window query partitions by a key with bounded cardinality per
  *    partition (custkey / suppkey / user_id), never a global orderBy over
  *    the fact table except for explicit top-k (TakeOrderedAndProject);
  *  - aggregates are partial-aggregated map-side by Catalyst (sum/count
  *    over decimals), so shuffle volume is #groups, not #rows.
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- Q1:
    // full-scan hash aggregate (TPC-H Q1 analog): scan -> filter -> 6-way
    // aggregate. Partial aggregation makes the shuffle 6 rows wide.
    QueryDef(
      "q01_pricing_summary",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
            round(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))
                .cast("decimal(18,6)") *
              (lit(1).cast("decimal(8,6)") + rate(col("l_tax")))), 4)
              .cast("double").as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)))), 4) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---------------------------------------------------------------- Q2:
    // selective filter + projection — both must reach the parquet scan
    // (PushedFilters / 5-column ReadSchema at any SF).
    QueryDef(
      "q02_filter_project",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") >= 48.0 && col("l_returnflag") === "R" &&
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_quantity >= 48.0 AND l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1997-01-01'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---------------------------------------------------------------- Q3:
    // 3-way join + agg + top-k (TPC-H Q3 analog). Filters sit below the
    // joins; final top-10 is TakeOrderedAndProject, not a full sort.
    QueryDef(
      "q03_shipping_priority",
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")),

    // ---------------------------------------------------------------- Q4:
    // left-semi join (EXISTS). Semi-join shuffles only the key column of
    // the probe side and short-circuits on first match.
    QueryDef(
      "q04_exists_semi_join",
      (s, d) => {
        val ord = t(s, d, "orders")
        val big = t(s, d, "lineitem").filter(col("l_quantity") > 49)
        ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        ORDER BY o_orderkey""")),

    // ---------------------------------------------------------------- Q5:
    // left-anti join (NOT EXISTS): customers with no orders.
    QueryDef(
      "q05_not_exists_anti_join",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ord = t(s, d, "orders").filter(col("o_orderstatus") === "P")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- Q6:
    // broadcast hash join against a small dim — no shuffle of the fact
    // side at all; the dim table is sublinear in SF so the hint holds at
    // 100 TB.
    QueryDef(
      "q06_broadcast_dim_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val part = broadcast(t(s, d, "part"))
        li.join(part, li("l_partkey") === part("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n_items"),
            dsum(col("l_quantity")).as("sum_qty"),
            davg(col("l_extendedprice")).as("avg_price"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // ---------------------------------------------------------------- Q7:
    // snowflake join chain region->nation->customer->orders->lineitem.
    // The three dims broadcast; only orders x lineitem shuffles.
    QueryDef(
      "q07_nation_revenue",
      (s, d) => {
        val reg = broadcast(t(s, d, "region"))
        val nat = broadcast(t(s, d, "nation"))
        val cust = broadcast(t(s, d, "customer"))
        val ord = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy("r_name", "n_name")
      },
      Some("""
        SELECT r_name, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        FROM lineitem
        JOIN orders   ON l_orderkey  = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---------------------------------------------------------------- Q8:
    // non-equi (range/theta) join: events banded into value buckets via a
    // tiny literal dim — broadcast nested-loop, the right shape for a
    // band join whose dim is O(1).
    QueryDef(
      "q08_range_bucket_join",
      (s, d) => {
        import s.implicits._
        val buckets = Seq(
          ("b0", 0.0, 100.0), ("b1", 100.0, 200.0), ("b2", 200.0, 300.0),
          ("b3", 300.0, 400.0), ("b4", 400.0, 500.0))
          .toDF("bucket", "lo", "hi")
        val ev = t(s, d, "events")
        ev.join(broadcast(buckets),
            ev("value") >= buckets("lo") && ev("value") < buckets("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("bucket")
      },
      Some("""
        SELECT bucket, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
        FROM events
        JOIN (VALUES ('b0', 0.0, 100.0), ('b1', 100.0, 200.0), ('b2', 200.0, 300.0),
                     ('b3', 300.0, 400.0), ('b4', 400.0, 500.0)) AS b(bucket, lo, hi)
          ON value >= lo AND value < hi
        GROUP BY bucket
        ORDER BY bucket""")),

    // ---------------------------------------------------------------- Q9:
    // windowed top-k per group (rank inside partition, no global sort).
    QueryDef(
      "q09_window_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
          FROM orders) x
        WHERE rn <= 3
        ORDER BY o_custkey, rn""")),

    // --------------------------------------------------------------- Q10:
    // running (frame-bounded) window aggregate, exact decimal running sum.
    QueryDef(
      "q10_window_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "lineitem")
          .filter(col("l_suppkey") < 5)
          .withColumn("running_qty", sum(dec4(col("l_quantity"))).over(w).cast("double"))
          .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "running_qty")
          .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        FROM lineitem
        WHERE l_suppkey < 5
        ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""")),

    // --------------------------------------------------------------- Q11:
    // analytic lag/lead over an event stream per user.
    QueryDef(
      "q11_window_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .filter(col("user_id") < 50)
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_value", lead(col("value"), 1).over(w))
          .withColumn("delta", col("value") - col("prev_value"))
          .select("user_id", "ts", "event_id", "value", "prev_value", "next_value", "delta")
          .orderBy("user_id", "ts", "event_id")
      },
      Some("""
        SELECT user_id, ts, event_id, value,
               LAG(value)  OVER w AS prev_value,
               LEAD(value) OVER w AS next_value,
               value - LAG(value) OVER w AS delta
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts, event_id""")),

    // --------------------------------------------------------------- Q12:
    // ROLLUP with grouping flags (multi-level aggregate in one pass).
    QueryDef(
      "q12_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
          .orderBy("g_rf", "g_ls", "returnflag", "linestatus"),
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, returnflag, linestatus""")),

    // --------------------------------------------------------------- Q13:
    // CUBE over two order dimensions.
    QueryDef(
      "q13_cube",
      (s, d) =>
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("int").as("g_st"),
            grouping(col("o_orderpriority")).cast("int").as("g_pr"),
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
            col("g_st"), col("g_pr"), col("n"), col("sum_price"))
          .orderBy("g_st", "g_pr", "orderstatus", "orderpriority"),
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_st, g_pr, orderstatus, orderpriority""")),

    // --------------------------------------------------------------- Q14:
    // exact multi-column DISTINCT aggregation (expand + two-phase agg).
    QueryDef(
      "q14_distinct_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_suppliers"),
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_suppkey)  AS BIGINT) AS n_suppliers,
               CAST(COUNT(DISTINCT l_partkey)  AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // --------------------------------------------------------------- Q15:
    // set op: UNION (distinct).
    QueryDef(
      "q15_union",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val b = t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        a.union(b).distinct().orderBy("custkey")
      },
      Some("""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey""")),

    // --------------------------------------------------------------- Q16:
    // set op: INTERSECT.
    QueryDef(
      "q16_intersect",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val b = t(s, d, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("custkey"))
        a.intersect(b).orderBy("custkey")
      },
      Some("""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        ORDER BY custkey""")),

    // --------------------------------------------------------------- Q17:
    // set op: EXCEPT.
    QueryDef(
      "q17_except",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
          .select(col("c_custkey").as("custkey"))
        val b = t(s, d, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("custkey"))
        a.except(b).orderBy("custkey")
      },
      Some("""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        ORDER BY custkey""")),

    // --------------------------------------------------------------- Q18:
    // global top-k — plans as TakeOrderedAndProject (heap per partition +
    // merge of k), not a total sort.
    QueryDef(
      "q18_topk_global",
      (s, d) =>
        t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(25),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25""")),

    // --------------------------------------------------------------- Q19:
    // scalar string function battery (all codegen'd built-ins).
    QueryDef(
      "q19_string_funcs",
      (s, d) =>
        t(s, d, "part")
          .filter(col("p_partkey") < 200)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up_name"),
            length(col("p_name")).as("name_len"),
            substring(col("p_name"), 1, 5).as("pre5"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_name"), " ", "_").as("snake_name"),
            instr(col("p_name"), "e").cast("int").as("first_e"),
            lpad(col("p_brand"), 10, "*").as("pad_brand"),
            col("p_name").like("red%").as("is_red"),
            regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey,
               UPPER(p_name) AS up_name,
               CAST(LENGTH(p_name) AS INTEGER) AS name_len,
               SUBSTR(p_name, 1, 5) AS pre5,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               REPLACE(p_name, ' ', '_') AS snake_name,
               CAST(STRPOS(p_name, 'e') AS INTEGER) AS first_e,
               LPAD(p_brand, 10, '*') AS pad_brand,
               (p_name LIKE 'red%') AS is_red,
               COALESCE(REGEXP_EXTRACT(p_name, '([a-z]+)$', 1), '') AS last_word
        FROM part
        WHERE p_partkey < 200
        ORDER BY p_partkey""")),

    // --------------------------------------------------------------- Q20:
    // scalar date/time function battery.
    QueryDef(
      "q20_date_funcs",
      (s, d) =>
        t(s, d, "orders")
          .filter(col("o_orderkey") < 2000)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            quarter(col("o_orderdate")).as("qtr"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp"))
              .cast("int").as("days_since"),
            weekday(col("o_orderdate")).cast("int").as("wd"),
            last_day(col("o_orderdate")).as("month_end"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            date_add(col("o_orderdate"), 30).as("plus30"))
          .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
               CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
               CAST(DAY(o_orderdate) AS INTEGER) AS dom,
               CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
               CAST(ISODOW(o_orderdate) - 1 AS INTEGER) AS wd,
               CAST(LAST_DAY(o_orderdate) AS DATE) AS month_end,
               CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30
        FROM orders
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey""")),

    // --------------------------------------------------------------- Q21:
    // scalar math battery (IEEE-exact ops only — no libm divergence).
    QueryDef(
      "q21_math_funcs",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_orderkey") < 300)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            sqrt(col("l_quantity")).as("sqrt_qty"),
            abs(col("l_discount") - 0.05).as("abs_disc"),
            ceil(col("l_extendedprice")).as("ceil_price"),
            floor(col("l_extendedprice")).as("floor_price"),
            round(col("l_extendedprice"), 1).as("round_price"),
            (col("l_orderkey") % 7).as("mod7"),
            (col("l_quantity") * col("l_quantity")).as("qty_sq"),
            signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
            greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
            least(col("l_quantity"), col("l_tax") * 100).as("ls"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
               SQRT(l_quantity) AS sqrt_qty,
               ABS(l_discount - 0.05) AS abs_disc,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
               ROUND(l_extendedprice, 1) AS round_price,
               l_orderkey % 7 AS mod7,
               l_quantity * l_quantity AS qty_sq,
               CAST(SIGN(l_discount - 0.05) AS INTEGER) AS disc_sign,
               GREATEST(l_quantity, l_discount * 100) AS gr,
               LEAST(l_quantity, l_tax * 100) AS ls
        FROM lineitem
        WHERE l_orderkey < 300
        ORDER BY l_orderkey, l_linenumber""")),

    // --------------------------------------------------------------- Q22:
    // conditional (CASE WHEN) aggregation.
    QueryDef(
      "q22_conditional_agg",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
            sum(when(col("o_totalprice") > 200000.0, dec4(col("o_totalprice")))
              .otherwise(lit(0).cast("decimal(12,4)"))).cast("double").as("high_value_total"))
          .withColumn("finished_share",
            col("n_finished").cast("double") / col("n"))
          .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE) AS high_value_total,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS finished_share
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // --------------------------------------------------------------- Q23:
    // JSON field extraction + aggregate (reference P6 analog on events.props).
    QueryDef(
      "q23_json_extract",
      (s, d) =>
        t(s, d, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("k"),
      Some("""
        SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
        ORDER BY k""")),

    // --------------------------------------------------------------- Q24:
    // JSON round-trip: from_json -> project -> to_json (reference P6+P7,
    // predict.py:31,38 analog).
    QueryDef(
      "q24_json_roundtrip",
      (s, d) =>
        t(s, d, "events")
          .filter(col("event_id") < 500)
          .withColumn("parsed",
            from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
          .withColumn("k", col("parsed.k"))
          .withColumn("json", to_json(struct(col("event_id"), col("k"))))
          .select("event_id", "k", "json")
          .orderBy("event_id"),
      Some("""
        SELECT event_id,
               CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k,
               '{"event_id":' || event_id || ',"k":' || JSON_EXTRACT_STRING(props, '$.k') || '}' AS json
        FROM events
        WHERE event_id < 500
        ORDER BY event_id""")),

    // --------------------------------------------------------------- Q61:
    // conditional-aggregate battery (FILTER-clause family): count_if,
    // filtered decimal-exact sums, bool_or/bool_and. Fills the historical
    // q61 numbering gap. Same shuffle shape as q01 — partial aggregation
    // makes the shuffle |groups| wide regardless of predicate mix, which
    // is why conditional aggregates beat self-joins-per-predicate at
    // 100 TB (one scan, one shuffle, any number of conditions).
    QueryDef(
      "q61_conditional_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count_if(col("l_quantity") > 25).as("n_bulk"),
            count_if(col("l_discount") > 0.05).as("n_disc"),
            dsum(when(col("l_discount") > 0.05, col("l_extendedprice"))
              .otherwise(lit(0.0))).as("disc_rev"),
            bool_or(col("l_quantity") === 50.0).as("any_max_qty"),
            bool_and(col("l_quantity") >= 1.0).as("all_positive"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
               CAST(SUM(CASE WHEN l_discount > 0.05
                             THEN CAST(l_extendedprice AS DECIMAL(12,4))
                             ELSE CAST(0.0 AS DECIMAL(12,4)) END) AS DOUBLE)
                 AS disc_rev,
               BOOL_OR(l_quantity = 50.0) AS any_max_qty,
               BOOL_AND(l_quantity >= 1.0) AS all_positive
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // --------------------------------------------------------------- Q62:
    // row-generator expansion (date spine): sequence + explode turns each
    // order into its 3-month activity spine — the backfill/densify
    // pattern every reporting pipeline needs (calendar spines, gap
    // filling). Fills the historical q62 numbering gap. The generator is
    // a per-row codegen'd expand (no join against a calendar table, no
    // driver-side range materialization); output is |rows|·3, aggregated
    // back down map-side.
    QueryDef(
      "q62_date_spine_expand",
      (s, d) =>
        t(s, d, "orders")
          .filter(col("o_orderkey") < 500)
          .select(explode(expr(
            """sequence(date_trunc('MONTH', o_orderdate),
              |         date_trunc('MONTH', o_orderdate) + interval 2 month,
              |         interval 1 month)""".stripMargin)).as("spine_month"))
          .groupBy("spine_month")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("spine_month"),
      Some("""
        SELECT spine_month, COUNT(*) AS n_orders
        FROM (SELECT unnest(generate_series(
                       DATE_TRUNC('month', o_orderdate),
                       DATE_TRUNC('month', o_orderdate) + INTERVAL 2 MONTH,
                       INTERVAL 1 MONTH)) AS spine_month
              FROM orders WHERE o_orderkey < 500)
        GROUP BY spine_month
        ORDER BY spine_month""")),

    // --------------------------------------------------------------- Q168:
    // ranking-function battery: rank / dense_rank / percent_rank /
    // cume_dist / ntile — the analytic-ranking family q09/q57 don't
    // touch. The tie-INSENSITIVE functions (rank, dense_rank,
    // percent_rank, cume_dist) order by the tied l_quantity alone —
    // their results are peer-group properties, deterministic under any
    // tie order; ntile is row-position-based, so its window adds the
    // unique (orderkey, linenumber) tiebreak. percent_rank/cume_dist
    // are single divisions of integers — identical IEEE in both
    // engines. One shuffle on the partition key, as every window query.
    QueryDef(
      "q168_ranking_battery",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byQty = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        val unique = Window.partitionBy("l_returnflag")
          .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
        t(s, d, "lineitem")
          .filter(col("l_orderkey") < 400)
          .select(col("l_returnflag"), col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"))
          .withColumn("rk", rank().over(byQty))
          .withColumn("drk", dense_rank().over(byQty))
          .withColumn("prk", round(percent_rank().over(byQty), 6))
          .withColumn("cd", round(cume_dist().over(byQty), 6))
          .withColumn("quartile", ntile(4).over(unique))
          .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               CAST(RANK() OVER wq AS INTEGER) AS rk,
               CAST(DENSE_RANK() OVER wq AS INTEGER) AS drk,
               round(PERCENT_RANK() OVER wq, 6) AS prk,
               round(CUME_DIST() OVER wq, 6) AS cd,
               CAST(NTILE(4) OVER wu AS INTEGER) AS quartile
        FROM lineitem
        WHERE l_orderkey < 400
        WINDOW wq AS (PARTITION BY l_returnflag ORDER BY l_quantity),
               wu AS (PARTITION BY l_returnflag
                      ORDER BY l_quantity, l_orderkey, l_linenumber)
        ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber"""))
  )
}
