package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ql._
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}

/** Relational core — scan/filter/agg/join/window/top-k shapes (SURVEY §2.2).
  *
  * Spark-first: declarative DataFrame plans; Catalyst handles pushdown,
  * pruning and join selection. region/nation are fixed-size at any SF →
  * explicit broadcast hints; customer/supplier/orders scale with SF so
  * those joins shuffle (AQE may still broadcast them at small SF).
  *
  * Hash-compare discipline: money sums via decimal (exact + order-
  * independent), integer-ish derived cols cast to long on both sides,
  * every query deterministically ordered with a unique tie-break.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_shipping_priority" -> { (s, d) =>
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    "q5_local_supplier" -> { (s, d) =>
      val region = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA"))
      val nation = broadcast(t(s, d, "nation"))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      t(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    "q4_order_priority" -> { (s, d) =>
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      ord.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    "q6_revenue" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
               .cast("double").as("revenue"),
             count(lit(1)).as("n"))
    },

    "q7_volume_shipping" -> { (s, d) =>
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
      t(s, d, "supplier")
        .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    "q10_returned_items" -> { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },

    "q19_bracket_filter" -> { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 20) &&
            col("l_quantity").between(5, 30)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(10, 40) &&
            col("l_quantity").between(10, 35)))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"), count(lit(1)).as("n"))
    },

    "q_topk_orders" -> { (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
    },

    "q_window_rank" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk", "o_orderkey")
    },

    "q_running_total" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("running_spend",
          sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    "q_distinct_count" -> { (s, d) =>
      t(s, d, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
    },

    "q_semijoin" -> { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    "q_antijoin" -> { (s, d) =>
      val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      t(s, d, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    "q_rollup" -> { (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    "q_conditional_pivot" -> { (s, d) =>
      val zero = lit(0.0).cast("decimal(18,2)")
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).cast("long").as("n_p"),
          sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
            .otherwise(zero)).cast("double").as("f_total"))
        .orderBy("o_orderpriority")
    },

    "q_salted_join" -> { (s, d) =>
      // threshold ~ the mean rows-per-suppkey, so a realistic subset of
      // keys is detected hot and salted while the rest take the plain
      // path — the oracle asserts result identity either way
      SkewJoin.saltedJoin(t(s, d, "lineitem"), "l_suppkey",
          Seq("l_orderkey", "l_linenumber"), t(s, d, "supplier"), "s_suppkey",
          hotKeyThreshold = 600L)
        .groupBy("s_name")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"), count(lit(1)).as("n"))
        .orderBy("s_name")
    },

    // TPC-H Q13 shape: filtered LEFT OUTER join + two-level aggregation
    // (per-customer order count -> count histogram)
    "q13_customer_distribution" -> { (s, d) =>
      val ord = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      t(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count")) // count(col): non-null only
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // TPC-H Q18 shape: HAVING-filtered aggregate joined back to the
    // fact's parent (orders with > 250 total quantity)
    "q18_large_orders" -> { (s, d) =>
      val big = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250.0)
      t(s, d, "orders").join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(desc("total_qty"), asc("o_orderkey"))
    },

    // statistical aggregate surface: mean / sample stddev / Pearson
    // correlation from exact decimal power sums (NOT stddev()/corr()
    // builtins — their streaming algorithms differ between engines;
    // the manual formula over order-independent decimal sums is
    // bit-reproducible and oracle-mirrorable)
    "q_stats_moments" -> { (s, d) =>
      val q = dec(col("l_quantity")); val e = dec(col("l_extendedprice"))
      val g = t(s, d, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("sx"),
        sum((q * q).cast("decimal(38,6)")).cast("double").as("sxx"),
        sum(e).cast("double").as("sy"),
        sum((e * e).cast("decimal(38,6)")).cast("double").as("syy"),
        sum((q * e).cast("decimal(38,6)")).cast("double").as("sxy"))
      val nd = col("n").cast("double")
      g.select(col("l_returnflag"), col("n"),
          (col("sx") / nd).as("mean_qty"),
          sqrt((nd * col("sxx") - col("sx") * col("sx")) / (nd * (nd - 1.0)))
            .as("std_qty"),
          ((nd * col("sxy") - col("sx") * col("sy")) /
            (sqrt(nd * col("sxx") - col("sx") * col("sx")) *
              sqrt(nd * col("syy") - col("sy") * col("sy")))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    // bucket-chunked range join: lineitem prices into supplier-derived
    // intervals — an equi-join on bucket ids, not a BNLJ (RangeJoin)
    "q_range_join" -> { (s, d) =>
      val intervals = t(s, d, "supplier").select(col("s_suppkey"),
        (col("s_acctbal") * 10).as("lo"),
        (col("s_acctbal") * 10 + 2000.0).as("hi"))
      RangeJoin.pointInInterval(
          t(s, d, "lineitem").select("l_orderkey", "l_extendedprice"),
          "l_extendedprice", intervals, "lo", "hi", bucketWidth = 2000.0)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("price_sum"))
        .orderBy("s_suppkey")
    },

    "q_asof_join" -> { (s, d) =>
      val events = graft.ql.events(s, d).select("event_id", "user_id", "ts")
      val daily = t(s, d, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_orderkey"),
             dsum(col("o_totalprice")).as("day_total"))
      AsOfJoin.asofBackward(events, "user_id", "ts",
          daily, "o_custkey", "o_orderdate")
        .select("event_id", "user_id", "last_orderkey", "day_total")
        .orderBy("event_id")
    }
  )

  private val rev =
    """CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"""

  val oracle: Map[String, String] = Map(
    "q_range_join" ->
      """WITH iv AS (SELECT s_suppkey, s_acctbal*10 AS lo,
        |    s_acctbal*10 + 2000.0 AS hi FROM supplier)
        |SELECT s_suppkey, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM lineitem JOIN iv
        |  ON l_extendedprice >= lo AND l_extendedprice <= hi
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "q13_customer_distribution" ->
      """WITH pc AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250)
        |SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,

    // decimal -> double goes through VARCHAR: DuckDB's direct decimal
    // cast double-rounds (int128 -> double, then /10^scale) and drifts
    // 1 ulp from Spark's correctly-rounded BigDecimal.doubleValue on
    // sums wider than 2^53; strtod on the exact digits is correctly
    // rounded and matches Spark bit-for-bit (verified on syy)
    "q_stats_moments" ->
      """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy,
        |  CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | sx / CAST(n AS DOUBLE) AS mean_qty,
        | sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
        |   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS std_qty,
        | (CAST(n AS DOUBLE) * sxy - sx * sy)
        |   / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
        |      * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM($rev) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(SUM($rev) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      s"""SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(SUM($rev) AS DOUBLE) AS volume
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, CAST(SUM($rev) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q19_bracket_filter" ->
      s"""SELECT CAST(SUM($rev) AS DOUBLE) AS revenue, COUNT(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
        |        AND l_quantity BETWEEN 5 AND 30)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 40
        |        AND l_quantity BETWEEN 10 AND 35)""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        | FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk, o_orderkey""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_distinct_count" ->
      """SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        | COUNT(*) AS n_orders,
        | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders""".stripMargin,

    "q_semijoin" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_antijoin" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        | COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_conditional_pivot" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_salted_join" ->
      s"""SELECT s_name, CAST(SUM($rev) AS DOUBLE) AS revenue, COUNT(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "q_asof_join" ->
      """WITH daily AS (
        | SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        | FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, d.last_orderkey, d.day_total
        |FROM events e ASOF JOIN daily d
        |  ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
        |ORDER BY e.event_id""".stripMargin
  )
}
