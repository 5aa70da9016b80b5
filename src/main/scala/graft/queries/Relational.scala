package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QueryDefs._

/** Relational operator suite (SURVEY §2 B). Every query is expressed with
  * the declarative DataFrame API so Catalyst handles pushdown / pruning /
  * join selection; small dimension tables are broadcast explicitly.
  * Money math uses integer cents (exact, associative) so results are
  * bit-identical to the DuckDB oracle regardless of aggregation order.
  */
object Relational {

  // Common cents snippets, mirrored literally in the oracle SQL.
  private val PC = "CAST(round(l_extendedprice*100) AS BIGINT)"
  private val DC = "CAST(round(l_discount*100) AS BIGINT)"
  private val TC = "CAST(round(l_tax*100) AS BIGINT)"
  private val QC = "CAST(round(l_quantity*100) AS BIGINT)"
  private val OC = "CAST(round(o_totalprice*100) AS BIGINT)"

  val queries: Seq[GQ] = Seq(
    // B1 ---------------------------------------------------------------
    GQ("q1_pricing_summary", (s, d) => {
      import s.implicits._
      table(s, d, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("2000-09-01")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          centsToDouble(sum(cents($"l_quantity"))).as("sum_qty"),
          centsToDouble(sum(cents($"l_extendedprice"))).as("sum_base_price"),
          (sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).cast("double") / lit(10000.0)).as("sum_disc_price"),
          (sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")) * (lit(100L) + cents($"l_tax"))).cast("double") / lit(1000000.0)).as("sum_charge"),
          (sum(cents($"l_quantity")).cast("double") / lit(100.0) / count(lit(1))).as("avg_qty"),
          (sum(cents($"l_extendedprice")).cast("double") / lit(100.0) / count(lit(1))).as("avg_price"),
          (sum(cents($"l_discount")).cast("double") / lit(100.0) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM($QC) AS DOUBLE)/100.0 AS sum_qty,
        CAST(SUM($PC) AS DOUBLE)/100.0 AS sum_base_price,
        CAST(SUM($PC*(100-$DC)) AS DOUBLE)/10000.0 AS sum_disc_price,
        CAST(SUM($PC*(100-$DC)*(100+$TC)) AS DOUBLE)/1000000.0 AS sum_charge,
        CAST(SUM($QC) AS DOUBLE)/100.0/COUNT(*) AS avg_qty,
        CAST(SUM($PC) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
        CAST(SUM($DC) AS DOUBLE)/100.0/COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), bench = true),

    // B2 ---------------------------------------------------------------
    GQ("q3_shipping_priority", (s, d) => {
      import s.implicits._
      val cust = table(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = table(s, d, "orders").filter($"o_orderdate" < to_timestamp(lit("1998-03-15")))
      val li = table(s, d, "lineitem").filter($"l_shipdate" > to_timestamp(lit("1998-03-15")))
      // no broadcast hint on customer: filtered it is small at sf0.1, but
      // unbounded at 100x — AQE picks broadcast vs shuffle from actual size
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg((sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).cast("double") / lit(10000.0)).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }, Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM($PC*(100-$DC)) AS DOUBLE)/10000.0 AS revenue
      FROM customer JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15'
        AND l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""), bench = true),

    // B3 ---------------------------------------------------------------
    GQ("q5_local_supplier", (s, d) => {
      import s.implicits._
      val region = table(s, d, "region").filter($"r_name" === "ASIA")
      val nation = table(s, d, "nation")
      val cust = table(s, d, "customer")
      val ord = table(s, d, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
                $"o_orderdate" < to_timestamp(lit("1998-01-01")))
      val li = table(s, d, "lineitem")
      val supp = table(s, d, "supplier")
      // hints only on the genuinely bounded dims (region: 5 rows, nation:
      // 25 rows — fixed by the data model); supplier/customer grow with SF,
      // so AQE sizes those joins at runtime instead of a hardcoded hint
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .join(cust, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg((sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).cast("double") / lit(10000.0)).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }, Some(s"""
      SELECT n_name, CAST(SUM($PC*(100-$DC)) AS DOUBLE)/10000.0 AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""), bench = true),

    // B4 ---------------------------------------------------------------
    GQ("q6_forecast_revenue", (s, d) => {
      import s.implicits._
      table(s, d, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
                $"l_shipdate" < to_timestamp(lit("1997-01-01")) &&
                cents($"l_discount").between(5, 7) && $"l_quantity" < 24)
        .agg(
          (sum(cents($"l_extendedprice") * cents($"l_discount")).cast("double") / lit(10000.0)).as("revenue"),
          count(lit(1)).as("n_lines"))
    }, Some(s"""
      SELECT CAST(SUM($PC*$DC) AS DOUBLE)/10000.0 AS revenue, COUNT(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND $DC BETWEEN 5 AND 7 AND l_quantity < 24"""), bench = true),

    // B5 ---------------------------------------------------------------
    GQ("q_group_having", (s, d) => {
      import s.implicits._
      table(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
             centsToDouble(sum(cents($"o_totalprice"))).as("total_spend"))
        .filter($"n_orders" >= 3)
        .orderBy($"o_custkey")
    }, Some(s"""
      SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM($OC) AS DOUBLE)/100.0 AS total_spend
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
      ORDER BY o_custkey""")),

    // B6 ---------------------------------------------------------------
    GQ("q_semi_join", (s, d) => {
      import s.implicits._
      val bigOrders = table(s, d, "orders").filter($"o_totalprice" > 400000)
      table(s, d, "customer")
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      ORDER BY c_custkey""")),

    // B7 ---------------------------------------------------------------
    GQ("q_anti_join", (s, d) => {
      import s.implicits._
      val urgent = table(s, d, "orders").filter($"o_orderpriority" === "1-URGENT")
      table(s, d, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")),

    // B8 ---------------------------------------------------------------
    GQ("q_window_topn", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      table(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_orderpriority", $"rn".cast("long").as("rn"), $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rn")
    }, Some("""
      SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3
      ORDER BY o_orderpriority, rn""")),

    // B9 ---------------------------------------------------------------
    GQ("q_window_running", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      table(s, d, "orders").filter($"o_custkey" < 50)
        .withColumn("run_cents", sum(cents($"o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_orderkey", lag($"o_orderkey", 1).over(w))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          centsToDouble($"run_cents").as("running_spend"), $"prev_orderkey")
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }, Some(s"""
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM($OC) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0 AS running_spend,
        LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
      FROM orders WHERE o_custkey < 50
      ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // B10 --------------------------------------------------------------
    GQ("q_rollup", (s, d) => {
      import s.implicits._
      table(s, d, "orders")
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n"),
             centsToDouble(sum(cents($"o_totalprice"))).as("total"))
        .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
    }, Some(s"""
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        CAST(SUM($OC) AS DOUBLE)/100.0 AS total
      FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // B11 --------------------------------------------------------------
    GQ("q_distinct_agg", (s, d) => {
      import s.implicits._
      table(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("n_orders"),
             countDistinct($"l_partkey").as("n_parts"),
             count(lit(1)).as("n_lines"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
        COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // B12 --------------------------------------------------------------
    GQ("q_union_all", (s, d) => {
      import s.implicits._
      val c = table(s, d, "customer").select(lit("c").as("src"), $"c_nationkey".cast("int").as("k"))
      val sp = table(s, d, "supplier").select(lit("s").as("src"), $"s_nationkey".cast("int").as("k"))
      c.union(sp).distinct()
        .groupBy($"src").agg(count(lit(1)).as("n_nations"))
        .orderBy($"src")
    }, Some("""
      SELECT src, COUNT(*) AS n_nations FROM (
        SELECT 'c' AS src, c_nationkey AS k FROM customer
        UNION
        SELECT 's' AS src, s_nationkey AS k FROM supplier)
      GROUP BY src ORDER BY src""")),

    // B13 --------------------------------------------------------------
    GQ("q_exists_subquery", (s, d) => {
      import s.implicits._
      val o = table(s, d, "orders")
      val urgentBig = o.filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 450000)
      table(s, d, "customer")
        .join(urgentBig, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 450000)
      ORDER BY c_custkey""")),

    // B14 --------------------------------------------------------------
    GQ("q_case_string_date", (s, d) => {
      import s.implicits._
      table(s, d, "orders")
        .withColumn("yr", year($"o_orderdate").cast("long"))
        .withColumn("bucket",
          when($"o_totalprice" > 350000, "large")
            .when($"o_totalprice" > 150000, "medium")
            .otherwise("small"))
        .withColumn("prio3", upper(substring($"o_orderpriority", 1, 3)))
        .groupBy($"yr", $"bucket", $"prio3")
        .agg(count(lit(1)).as("n"),
             centsToDouble(sum(cents($"o_totalprice"))).as("total"))
        .orderBy($"yr", $"bucket", $"prio3")
    }, Some(s"""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        CASE WHEN o_totalprice > 350000 THEN 'large'
             WHEN o_totalprice > 150000 THEN 'medium'
             ELSE 'small' END AS bucket,
        upper(substr(o_orderpriority, 1, 3)) AS prio3,
        COUNT(*) AS n, CAST(SUM($OC) AS DOUBLE)/100.0 AS total
      FROM orders GROUP BY 1, 2, 3 ORDER BY yr, bucket, prio3""")),

    // B15 --------------------------------------------------------------
    // Skew-resistant pattern: salted partial aggregation of the fact table
    // before the join (integer sums make salting semantically invisible).
    GQ("q_skew_salted_join", (s, d) => {
      import s.implicits._
      val li = table(s, d, "lineitem")
      // salt from several columns: l_linenumber alone has <= 7 distinct
      // values, so a hot key would split at most 7 ways no matter the mod
      val partial = li
        .groupBy($"l_orderkey",
          pmod(hash($"l_linenumber", $"l_partkey", $"l_suppkey"), lit(8)).as("salt"))
        .agg(sum(cents($"l_quantity")).as("qc"), count(lit(1)).as("nl"))
      val perOrder = partial.groupBy($"l_orderkey")
        .agg(sum($"qc").as("qc"), sum($"nl").as("nl"))
      table(s, d, "orders")
        .join(perOrder, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg((sum($"qc").cast("double") / lit(100.0)).as("sum_qty"),
             sum($"nl").as("n_lines"))
        .orderBy($"o_orderpriority")
    }, Some(s"""
      SELECT o_orderpriority, CAST(SUM($QC) AS DOUBLE)/100.0 AS sum_qty,
        COUNT(*) AS n_lines
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""), bench = true),

    // B17 ---------------------------------------------------------------
    GQ("q_scalar_subquery", (s, d) => {
      import s.implicits._
      val o = table(s, d, "orders")
      val mx = o.agg(max($"o_totalprice").as("mx"))
      o.crossJoin(broadcast(mx))
        .filter($"o_totalprice" > $"mx" * 0.9)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.9
      ORDER BY o_orderkey""")),

    // B18 ---------------------------------------------------------------
    GQ("q_cube", (s, d) => {
      import s.implicits._
      table(s, d, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
             centsToDouble(sum(cents($"o_totalprice"))).as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }, Some(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM($OC) AS DOUBLE)/100.0 AS total
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // B19 ---------------------------------------------------------------
    GQ("q_minmax_by", (s, d) => {
      import s.implicits._
      table(s, d, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          max_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("biggest_order"),
          min_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("smallest_order"),
          max($"o_totalprice").as("max_price"),
          min($"o_totalprice").as("min_price"))
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH r AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        FROM orders)
      SELECT o_orderpriority,
        MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
        MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order,
        MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
      FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // B16 ---------------------------------------------------------------
    // As-of join: for each error event, the user's most recent purchase
    // at or before it. Composed from union + ordered window with
    // last(ignoreNulls) — one shuffle on user_id, no range-join blowup;
    // at 100 TB this beats an inequality join by orders of magnitude.
    // The oracle uses DuckDB's native ASOF JOIN.
    GQ("q_asof_join", (s, d) => {
      import s.implicits._
      val ev = events(s, d)
      val err = ev.filter($"event_type" === "error")
        .select($"user_id", $"ts", lit(1).as("is_err"), $"event_id",
          lit(null).cast("long").as("p_event_id"), lit(null).cast("double").as("p_value"))
      val pur = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(0).as("is_err"),
          lit(null).cast("long").as("event_id"), $"event_id".as("p_event_id"),
          $"value".as("p_value"))
      // purchases sort before errors at equal ts, so "<= ts" is inclusive
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"is_err")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      err.unionByName(pur)
        .withColumn("purchase_event_id", last($"p_event_id", ignoreNulls = true).over(w))
        .withColumn("purchase_value", last($"p_value", ignoreNulls = true).over(w))
        .filter($"is_err" === 1)
        // TIMESTAMP_NTZ: dump type independent of writer conf (UTC session)
        .select($"event_id", $"user_id", $"ts".cast("timestamp_ntz").as("ts"),
          $"purchase_event_id", $"purchase_value")
        .orderBy($"event_id")
    }, Some("""
      SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        p.event_id AS purchase_event_id, p.value AS purchase_value
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND p.ts <= e.ts
      ORDER BY e.event_id""")),

    // B20 ---------------------------------------------------------------
    // Sessionization: split each user's event stream into sessions at
    // >30-minute silence gaps, report per-session stats. One shuffle on
    // user_id serves both windows and the aggregation; at 100 TB the
    // cost is a single hash partitioning of the events — the canonical
    // clickstream shape. Gap arithmetic in integer microseconds (exact
    // in both engines; epoch() doubles would drift).
    GQ("q_sessionize", (s, d) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(wOrd))
        .withColumn("is_new",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sess", sum($"is_new").over(wCum))
        .groupBy($"user_id", $"sess")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("session_start"),
          max($"ts").as("session_end"),
          centsToDouble(sum(cents($"value"))).as("sum_value"))
        .orderBy($"user_id", $"sess")
    }, Some("""
      WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
          lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
            (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
        FROM events),
      m AS (SELECT *, CASE WHEN prev_us IS NULL
            OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
        FROM o),
      g AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM m)
      SELECT user_id, sess, COUNT(*) AS n_events,
        MIN(ts) AS session_start, MAX(ts) AS session_end,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      FROM g GROUP BY user_id, sess ORDER BY user_id, sess""")),

    // B21 ---------------------------------------------------------------
    // PIVOT: per user cohort, event-type spend matrix as columns. The
    // pivot value list is declared (no collect-distinct job); Catalyst
    // compiles it to one pass of conditional aggregates — a single
    // shuffle on the cohort key at any scale.
    GQ("q_pivot", (s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy(($"user_id" % 10).as("cohort"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(centsToDouble(sum(cents($"value"))))
        .orderBy($"cohort")
    }, Some("""
      SELECT user_id % 10 AS cohort,
        CAST(SUM(CASE WHEN event_type='click' THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE)/100.0 AS click,
        CAST(SUM(CASE WHEN event_type='error' THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE)/100.0 AS error,
        CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE)/100.0 AS purchase,
        CAST(SUM(CASE WHEN event_type='signup' THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE)/100.0 AS signup,
        CAST(SUM(CASE WHEN event_type='view' THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE)/100.0 AS view
      FROM events GROUP BY 1 ORDER BY cohort""")),

    // B22 ---------------------------------------------------------------
    // Exact discrete percentiles (percentile_disc semantics: the smallest
    // element with cume_dist >= p) per group, computed via row_number so
    // both engines pick the IDENTICAL element — engine-native quantile
    // functions differ in interpolation. One shuffle; the rank window
    // and the aggregation share the partitioning on the group key.
    GQ("q_percentiles", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      val wAll = Window.partitionBy($"o_orderpriority")
      table(s, d, "orders")
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy($"o_orderpriority")
        .agg(max($"n").as("n_orders"),
          min(when($"r" === ceil($"n" * lit(0.5)), $"o_totalprice")).as("p50"),
          min(when($"r" === ceil($"n" * lit(0.9)), $"o_totalprice")).as("p90"),
          min(when($"r" === $"n", $"o_totalprice")).as("p100"))
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH r AS (SELECT o_orderpriority, o_totalprice,
          CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS r,
          CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        FROM orders)
      SELECT o_orderpriority, MAX(n) AS n_orders,
        MIN(CASE WHEN r = ceil(n * 0.5) THEN o_totalprice END) AS p50,
        MIN(CASE WHEN r = ceil(n * 0.9) THEN o_totalprice END) AS p90,
        MIN(CASE WHEN r = n THEN o_totalprice END) AS p100
      FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // B23 ---------------------------------------------------------------
    // Set operators INTERSECT / EXCEPT (distinct semantics): customers
    // with both urgent and non-urgent orders vs urgent-only. Catalyst
    // plans these as left-semi / left-anti aggregate joins — one shuffle
    // per side on the join key, no sort.
    GQ("q_intersect_except", (s, d) => {
      import s.implicits._
      val ord = table(s, d, "orders")
      val urgent = ord.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      val other = ord.filter($"o_orderpriority" =!= "1-URGENT")
        .select($"o_custkey")
      val both = urgent.intersect(other)
        .select($"o_custkey", lit("both").as("kind"))
      val only = urgent.except(other)
        .select($"o_custkey", lit("urgent_only").as("kind"))
      both.unionByName(only).orderBy($"o_custkey", $"kind")
    }, Some("""
      WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      o AS (SELECT o_custkey FROM orders WHERE o_orderpriority <> '1-URGENT'),
      both_k AS (SELECT o_custkey, 'both' AS kind FROM (SELECT o_custkey FROM u INTERSECT SELECT o_custkey FROM o)),
      only_k AS (SELECT o_custkey, 'urgent_only' AS kind FROM (SELECT o_custkey FROM u EXCEPT SELECT o_custkey FROM o))
      SELECT * FROM both_k UNION ALL SELECT * FROM only_k
      ORDER BY o_custkey, kind""")),

    // B24 ---------------------------------------------------------------
    // Explicit GROUPING SETS (beyond rollup/cube): Catalyst plans one
    // Expand over the input (one copy per set) feeding a single hash
    // aggregate — one shuffle total, no matter how many sets.
    GQ("q_grouping_sets", (s, d) => {
      import s.implicits._
      table(s, d, "orders")
        .groupingSets(
          Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderstatus"), Seq()),
          $"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
             centsToDouble(sum(cents($"o_totalprice"))).as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }, Some(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM($OC) AS DOUBLE)/100.0 AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // B25 ---------------------------------------------------------------
    // LATERAL flattening with ordinality: posexplode unnests the token
    // array WITH its position entirely inside the row's task (a Generate
    // node — no shuffle), then one hash aggregate over (pos, token).
    // Leading-position token histograms are a real corpus signal
    // (boilerplate openers). DuckDB replays it by unnesting an
    // index-carrying list_transform over the same regex token list.
    GQ("q_lateral_explode", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "token")))
        .filter($"pos" < 3)
        .groupBy($"pos", $"token")
        .agg(count(lit(1)).as("n"))
        .filter($"n" >= 5)
        .orderBy($"pos", $"token")
    }, Some("""
      WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
      e AS (SELECT doc_id, unnest(list_transform(toks[1:3],
                (x, i) -> {'pos': i - 1, 'token': x})) AS u FROM tok)
      SELECT CAST(u.pos AS INTEGER) AS pos, u.token AS token, COUNT(*) AS n FROM e
      GROUP BY 1, 2 HAVING COUNT(*) >= 5 ORDER BY pos, token""")),

    // B26 ---------------------------------------------------------------
    // Time-RANGE window frame: per-customer trailing-30-day spend. The
    // frame is ordered by integer epoch-millis on BOTH engines, so the
    // peer/boundary semantics are bit-identical (no interval arithmetic
    // ambiguity), and the sum stays in exact integer cents. One shuffle
    // on o_custkey; the frame scan is a per-partition sliding pointer.
    GQ("q_window_range", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy(unix_millis($"o_orderdate".cast("timestamp")))
        .rangeBetween(-30L * 86400000L, 0L)
      table(s, d, "orders")
        .filter(pmod($"o_custkey", lit(50)) === 0)
        .withColumn("trailing_30d", centsToDouble(sum(cents($"o_totalprice")).over(w)))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"trailing_30d")
        .orderBy($"o_custkey", $"o_orderkey")
    }, Some(s"""
      SELECT o_orderkey, o_custkey, o_orderdate,
        CAST(SUM($OC) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
          RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
          AS trailing_30d
      FROM orders WHERE o_custkey % 50 = 0
      ORDER BY o_custkey, o_orderkey""")),

    // B27 ---------------------------------------------------------------
    // Navigation/distribution window functions (lag, lead, first_value,
    // ntile) share ONE window partitioning: Catalyst plans a single
    // shuffle + sort on (o_custkey, order) for all four — adding a fifth
    // function over the same frame costs nothing extra. Order keys are
    // unique (date, key), so every function is deterministic; prices pass
    // through unchanged (no float arithmetic).
    GQ("q_window_suite", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      table(s, d, "orders")
        .filter(pmod($"o_custkey", lit(50)) === 0)
        .select($"o_orderkey", $"o_custkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first_value($"o_totalprice").over(w).as("first_price"),
          ntile(4).over(w).as("quartile"))
        .orderBy($"o_custkey", $"o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_custkey,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        first_value(o_totalprice) OVER w AS first_price,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile
      FROM orders WHERE o_custkey % 50 = 0
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""")),

    // B28 ---------------------------------------------------------------
    // Statistical aggregates from exact integer moments. Spark's
    // stddev/corr aggregates accumulate doubles in partition order, so
    // their low bits differ run-to-run and engine-to-engine; here the
    // five moments (n, Σx, Σy, Σx², Σy², Σxy) are summed as EXACT
    // integers (per-row products fit a long; the sums go through
    // decimal(38,0) ≡ DuckDB HUGEINT, so no overflow at any corpus
    // size), and mean/stddev/corr come out of ONE closed-form double
    // formula evaluated in a fixed operation order — bit-identical on
    // both engines and associativity-proof at 100 TB. One partial-agg
    // shuffle on the group key; everything else is per-row expression.
    GQ("q_stats_moments", (s, d) => {
      import s.implicits._
      val q = $"l_quantity".cast("long")
      val p = cents($"l_extendedprice")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val agg = table(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec(q)).as("sq"), sum(dec(p)).as("sp"),
          sum(dec(q * q)).as("sqq"), sum(dec(p * p)).as("spp"),
          sum(dec(q * p)).as("sqp"))
      val nD = $"n".cast("double")
      def D(name: String) = col(name).cast("double")
      agg.select($"l_returnflag", $"n",
          (D("sq") / nD).as("mean_qty"),
          sqrt((nD * D("sqq") - D("sq") * D("sq")) / (nD * (nD - lit(1.0))))
            .as("stddev_qty"),
          ((nD * D("sqp") - D("sq") * D("sp")) /
            (sqrt(nD * D("sqq") - D("sq") * D("sq")) *
              sqrt(nD * D("spp") - D("sp") * D("sp")))).as("corr_qty_price"))
        .orderBy($"l_returnflag")
    }, Some(s"""
      WITH m AS (
        SELECT l_returnflag, COUNT(*) AS n,
          SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sq,
          SUM(CAST($PC AS HUGEINT)) AS sp,
          SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sqq,
          SUM(CAST($PC * $PC AS HUGEINT)) AS spp,
          SUM(CAST(CAST(l_quantity AS BIGINT) * $PC AS HUGEINT)) AS sqp
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
        sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
            - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty,
        (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
            - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
          / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
              - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS corr_qty_price
      FROM m ORDER BY l_returnflag""")),

    // B29 ---------------------------------------------------------------
    // Time-series gap fill: per event_type hourly counts densified over
    // the type's [min, max] hour span, absent buckets zero-filled — the
    // densification step every dashboard / anomaly detector needs before
    // window math. Scale shape: the grid explodes from a TYPE-sized
    // aggregate (types × hours, never rows × anything) and the left join
    // runs bucket-grained on (type, hour) — both sides are already
    // reduced, so the raw event volume touches only the one partial-agg
    // shuffle that built the buckets.
    GQ("q_gap_fill", (s, d) => {
      import s.implicits._
      val ev = events(s, d).withColumn("hr", date_trunc("hour", $"ts"))
      val actual = ev.groupBy($"event_type", $"hr")
        .agg(count(lit(1)).as("n"),
          centsToDouble(sum(cents($"value"))).as("sum_value"))
      val grid = ev.groupBy($"event_type")
        .agg(min($"hr").as("h0"), max($"hr").as("h1"))
        .select($"event_type",
          explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("hr"))
      grid.join(actual, Seq("event_type", "hr"), "left")
        .select($"event_type", $"hr",
          coalesce($"n", lit(0L)).as("n"),
          coalesce($"sum_value", lit(0.0)).as("sum_value"))
        .orderBy($"event_type", $"hr")
    }, Some("""
      WITH e AS (SELECT event_type,
          date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, value FROM events),
      a AS (SELECT event_type, hr, COUNT(*) AS n,
          CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        FROM e GROUP BY 1, 2),
      s AS (SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM e GROUP BY 1),
      g AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        FROM s)
      SELECT g.event_type, g.hr, CAST(COALESCE(n, 0) AS BIGINT) AS n,
        COALESCE(sum_value, 0.0) AS sum_value
      FROM g LEFT JOIN a ON g.event_type = a.event_type AND g.hr = a.hr
      ORDER BY 1, 2""")),

    // B30 ---------------------------------------------------------------
    // UNPIVOT (wide → long): per-returnflag measure columns melted into
    // (measure, value) rows — the reshaping step feeding any generic
    // metric store / plotting layer. Spark's native unpivot is an Expand
    // node over the already-aggregated frame, so the melt itself touches
    // FLAG-sized data (6 rows × 3 measures), never the raw scan; the one
    // shuffle is the partial aggregation that built the wide frame.
    GQ("q_unpivot", (s, d) => {
      import s.implicits._
      val wide = table(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          centsToDouble(sum(cents($"l_quantity"))).as("qty"),
          centsToDouble(sum(cents($"l_extendedprice"))).as("price"),
          centsToDouble(sum(cents($"l_discount"))).as("disc"))
      wide.unpivot(
          Array($"l_returnflag"),
          Array($"qty", $"price", $"disc"),
          "measure", "value")
        .orderBy($"l_returnflag", $"measure")
    }, Some(s"""
      WITH a AS (
        SELECT l_returnflag,
          CAST(SUM($QC) AS DOUBLE)/100.0 AS qty,
          CAST(SUM($PC) AS DOUBLE)/100.0 AS price,
          CAST(SUM($DC) AS DOUBLE)/100.0 AS disc
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'qty' AS measure, qty AS value FROM a
      UNION ALL SELECT l_returnflag, 'price', price FROM a
      UNION ALL SELECT l_returnflag, 'disc', disc FROM a
      ORDER BY 1, 2""")),

    // B31 ---------------------------------------------------------------
    // Semi-structured extraction: events.props is a JSON string; parse it
    // with a TYPED from_json schema (codegen'd Jackson, no UDF) and
    // aggregate the extracted field per event_type. The parse is per-row
    // map work that scales embarrassingly; the single shuffle is the
    // partial-agg on event_type. Oracle extracts the same field with
    // DuckDB's JSON operators — integer values, so the hash comparison is
    // exact with no float formatting concerns.
    GQ("q_json_extract", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", LongType)))
      events(s, d)
        .withColumn("k", from_json($"props", schema).getField("k"))
        .filter($"k".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"),
          (sum($"k").cast("double") / count(lit(1)).cast("double")).as("avg_k"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
        CAST(SUM(k) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_k
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events)
      WHERE k IS NOT NULL
      GROUP BY event_type ORDER BY event_type""")),

    // B32 ---------------------------------------------------------------
    // Banded range join: orders priced into IRREGULAR price bands (a
    // geometric ladder, so no equi-bucketing rewrite applies) via a
    // non-equi lo <= p < hi join. The band table is O(1) rows and
    // explicitly broadcast, so the plan is a BroadcastNestedLoopJoin
    // that stays map-only over the fact scan — the shape that survives
    // 100× data (each row tests ≤10 bands; nothing shuffles but the
    // final band-grained aggregation).
    GQ("q_range_join", (s, d) => {
      import s.implicits._
      val edges = Seq(0L, 5000L, 12000L, 25000L, 45000L, 80000L,
        130000L, 200000L, 300000L, 1000000L)
      val bands = edges.zip(edges.tail).zipWithIndex
        .map { case ((lo, hi), i) => (i, lo * 100, hi * 100) }
        .toDF("band", "lo_c", "hi_c")
      table(s, d, "orders")
        .withColumn("p_c", cents($"o_totalprice"))
        .join(broadcast(bands), $"p_c" >= $"lo_c" && $"p_c" < $"hi_c")
        .groupBy($"band")
        .agg(count(lit(1)).as("n"),
          centsToDouble(sum($"p_c")).as("sum_price"),
          countDistinct($"o_custkey").as("n_cust"))
        .orderBy($"band")
    }, Some(s"""
      WITH bands AS (
        SELECT CAST(band AS INTEGER) AS band,
          CAST(lo*100 AS BIGINT) AS lo_c, CAST(hi*100 AS BIGINT) AS hi_c
        FROM (VALUES (0,0,5000),(1,5000,12000),(2,12000,25000),
          (3,25000,45000),(4,45000,80000),(5,80000,130000),
          (6,130000,200000),(7,200000,300000),(8,300000,1000000))
          t(band, lo, hi))
      SELECT band, COUNT(*) AS n,
        CAST(SUM($OC) AS DOUBLE)/100.0 AS sum_price,
        COUNT(DISTINCT o_custkey) AS n_cust
      FROM orders JOIN bands
        ON $OC >= lo_c AND $OC < hi_c
      GROUP BY band ORDER BY band""")),

    // B33 ---------------------------------------------------------------
    // Recursive CTE (Spark 4's UnionLoop): variable-depth graph walk — a
    // binary tree over part keys (parent = key DIV 2) traversed from the
    // root, profiling each level. Iteration count is the tree DEPTH
    // (log₂ N — 14 iterations at 20k keys, 27 at 100M), and each step is
    // one distributed join of the frontier against the key column, so
    // the walk scales with the frontier, never materializing paths. The
    // canonical shape for org charts / BOM explosions / lineage closures
    // that fixed-depth self-joins cannot express.
    GQ("q_recursive", (s, d) => {
      table(s, d, "part").createOrReplaceTempView("part_b33")
      s.sql(s"""
        WITH RECURSIVE walk AS (
          SELECT p_partkey AS k, 0 AS depth,
            CAST(round(p_retailprice*100) AS BIGINT) AS pc
          FROM part_b33 WHERE p_partkey = 1
          UNION ALL
          SELECT p.p_partkey, w.depth + 1,
            CAST(round(p.p_retailprice*100) AS BIGINT)
          FROM part_b33 p JOIN walk w
            ON p.p_partkey DIV 2 = w.k AND p.p_partkey > 1
        )
        SELECT depth, COUNT(*) AS n,
          CAST(SUM(pc) AS DOUBLE)/100.0 AS sum_price
        FROM walk GROUP BY depth ORDER BY depth""")
    }, Some("""
      WITH RECURSIVE walk AS (
        SELECT p_partkey AS k, 0 AS depth,
          CAST(round(p_retailprice*100) AS BIGINT) AS pc
        FROM part WHERE p_partkey = 1
        UNION ALL
        SELECT p.p_partkey, w.depth + 1,
          CAST(round(p.p_retailprice*100) AS BIGINT)
        FROM part p JOIN walk w
          ON p.p_partkey // 2 = w.k AND p.p_partkey > 1
      )
      SELECT depth, COUNT(*) AS n,
        CAST(SUM(pc) AS DOUBLE)/100.0 AS sum_price
      FROM walk GROUP BY depth ORDER BY depth""")),

    // B34 ---------------------------------------------------------------
    // NEAREST as-of join: each error matched to the temporally CLOSEST
    // purchase by the same user in EITHER direction (B16's asof is
    // backward-only — DuckDB's ASOF can't express nearest, so the oracle
    // is a window argmin). The candidate join is BAND-LIMITED to ±6 h,
    // which is what keeps it scale-safe: per user the join touches only
    // the 12-hour neighborhood, never the user's full history, and the
    // argmin is a bounded partial aggregate (≤1 row per map task per
    // error crosses the shuffle). Ties break earlier-then-lower-id; all
    // arithmetic is integer microseconds.
    GQ("q_asof_nearest", (s, d) => {
      import s.implicits._
      val ev = events(s, d)
      val e = ev.filter($"event_type" === "error")
        .select($"event_id".as("e_id"), $"user_id", unix_micros($"ts").as("e_us"))
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"),
          unix_micros($"ts").as("p_us"))
      val band = 6L * 3600 * 1000000
      e.join(p, $"user_id" === $"p_user" &&
          $"p_us" >= $"e_us" - band && $"p_us" <= $"e_us" + band)
        .withColumn("adt", abs($"e_us" - $"p_us"))
        .groupBy($"e_id", $"user_id")
        .agg(min_by(struct($"p_id", $"p_us"), struct($"adt", $"p_us", $"p_id")).as("m"))
        .select($"e_id", $"user_id", $"m.p_id".as("p_id"))
        .orderBy($"e_id")
    }, Some("""
      WITH e AS (SELECT event_id AS e_id, user_id,
              epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
            FROM events WHERE event_type = 'error'),
      p AS (SELECT event_id AS p_id, user_id,
              epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
            FROM events WHERE event_type = 'purchase'),
      c AS (SELECT e.e_id, e.user_id, p.p_id, abs(e.e_us - p.p_us) AS adt, p.p_us
            FROM e JOIN p ON e.user_id = p.user_id
              AND p.p_us >= e.e_us - CAST(6*3600 AS BIGINT)*1000000
              AND p.p_us <= e.e_us + CAST(6*3600 AS BIGINT)*1000000)
      SELECT e_id, user_id, p_id FROM (
        SELECT e_id, user_id, p_id,
          ROW_NUMBER() OVER (PARTITION BY e_id ORDER BY adt, p_us, p_id) AS rn
        FROM c)
      WHERE rn = 1 ORDER BY e_id""")),

    // B35 ---------------------------------------------------------------
    // Semi-structured VARIANT analytics (Spark 4 VariantType): each event
    // is wrapped into a nested JSON envelope, parsed ONCE into a variant
    // (binary-encoded, so repeated path extraction does not re-parse
    // text — the schema-on-read answer for heterogeneous event payloads
    // at 100 TB), then navigated with typed `variant_get` paths and
    // aggregated per extracted type. All per-row map work until the one
    // partial-agg shuffle on the ≤4 extracted types. The oracle runs the
    // identical envelope through DuckDB's JSON operators — integer
    // payloads keep the hash comparison exact.
    GQ("q_variant", (s, d) => {
      import s.implicits._
      val envelope = concat(
        lit("""{"meta":{"type":""""), $"event_type",
        lit("""","uid":"""), $"user_id",
        lit("""},"payload":"""), $"props", lit("}"))
      events(s, d)
        .withColumn("v", parse_json(envelope))
        .select(
          variant_get($"v", "$.meta.type", "string").as("vtype"),
          variant_get($"v", "$.meta.uid", "bigint").as("uid"),
          variant_get($"v", "$.payload.k", "bigint").as("k"))
        .filter($"k".isNotNull)
        .groupBy($"vtype")
        .agg(count(lit(1)).as("n"),
          countDistinct($"uid").as("n_users"),
          sum($"k").as("sum_k"),
          max($"k").as("max_k"))
        .orderBy($"vtype")
    }, Some("""
      WITH j AS (SELECT
          concat('{"meta":{"type":"', event_type, '","uid":', user_id,
            '},"payload":', props, '}') AS v
        FROM events),
      x AS (SELECT
          json_extract_string(v, '$.meta.type') AS vtype,
          CAST(json_extract(v, '$.meta.uid') AS BIGINT) AS uid,
          CAST(json_extract(v, '$.payload.k') AS BIGINT) AS k
        FROM j)
      SELECT vtype, COUNT(*) AS n, COUNT(DISTINCT uid) AS n_users,
        CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
      FROM x WHERE k IS NOT NULL
      GROUP BY vtype ORDER BY vtype"""))
  )
}
