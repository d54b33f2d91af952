package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dsl._

/** SURVEY §2.2 — the full relational-algebra surface the reference lacks
  * (README "Limitations": no joins, single table) but any OLAP engine at
  * scale needs. All plans are declarative: Catalyst chooses broadcast vs
  * shuffle joins (hinted where the right answer is known statically), AQE
  * handles skew/coalescing at runtime.
  */
object RelationalSuite {

  private val ts = (s: String) => lit(s).cast("timestamp")

  val queries: Seq[Q] = Seq(

    // #12 broadcast dim join: nation+region are tiny dimension tables —
    // broadcast them so the fact scan never shuffles.
    Q("join_broadcast",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("r_name"),
      Some(s"""SELECT r_name, COUNT(*) AS n_cust, ${dsumSql("c_acctbal")} AS sum_bal
               FROM customer
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               GROUP BY r_name ORDER BY r_name""")),

    // #13 fact-fact equi-join: shuffles both sides on the join key; at
    // 100 TB this is the canonical co-partitioned shuffle join (AQE picks
    // shuffled-hash vs sort-merge and splits skewed partitions).
    Q("join_shuffle",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          psum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_items,
               ${psumSql(revenueSql)} AS revenue
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey
               GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // #14 left-semi (EXISTS): customers with at least one order.
    Q("join_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_active FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // #15 left-anti (NOT EXISTS): customers that never ordered.
    Q("join_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey AND o_totalprice > 400000)
              ORDER BY c_custkey""")),

    // #16 left-outer join with null-safe aggregation.
    Q("join_outer",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spent"))
        .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               COALESCE(${dsumSql("o_totalprice")}, 0.0) AS spent
               FROM customer LEFT JOIN orders ON c_custkey = o_custkey
               GROUP BY c_custkey ORDER BY c_custkey""")),

    // #17 ranking window: top-3 customers by balance per nation.
    Q("window_rank", (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
        .orderBy("c_nationkey", "rnk", "c_custkey")
    },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
                SELECT c_nationkey, c_custkey, c_acctbal,
                       RANK() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rnk
                FROM customer) t
              WHERE rnk <= 3 ORDER BY c_nationkey, rnk, c_custkey""")),

    // #18 running aggregate + lag: per-customer cumulative spend.
    Q("window_running", (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .withColumn("prev_date", lag(to_date(col("o_orderdate")), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"),
          col("running_spend"), col("prev_date"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
                CAST(SUM(CAST(CAST(ROUND((o_totalprice) * 100) AS BIGINT) * 0.0100 AS DECIMAL(25,4)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_spend,
                LAG(CAST(o_orderdate AS DATE), 1)
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                  AS prev_date
              FROM orders
              ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // #19 ROLLUP hierarchy totals.
    Q("rollup_agg",
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               ${dsumSql("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
               ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // #20 CUBE cross-tab totals.
    Q("cube_agg",
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               ${dsumSql("l_extendedprice")} AS sum_price
               FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
               ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // #21 set operations: nations that have customers vs suppliers.
    Q("set_ops", (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("k"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      val both = c.intersect(sup).withColumn("tag", lit("both"))
      val custOnly = c.except(sup).withColumn("tag", lit("cust_only"))
      both.unionAll(custOnly).select("tag", "k").orderBy("tag", "k")
    },
      Some("""SELECT 'both' AS tag, k FROM
                (SELECT c_nationkey AS k FROM customer
                 INTERSECT SELECT s_nationkey FROM supplier) t1
              UNION ALL
              SELECT 'cust_only' AS tag, k FROM
                (SELECT c_nationkey AS k FROM customer
                 EXCEPT SELECT s_nationkey FROM supplier) t2
              ORDER BY tag, k""")),

    // #22 pivot: linestatus values become columns.
    Q("pivot_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4)) END) AS DOUBLE) AS "F",
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4)) END) AS DOUBLE) AS "O"
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // #23 scalar + IN subqueries (Catalyst rewrites IN to a semi join and
    // the scalar subquery to a broadcast of one row).
    Q("subquery_in", (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE)/COUNT(*) FROM orders)
                 AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
               ORDER BY o_orderkey""")
    },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE)/COUNT(*) FROM orders)
                AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              ORDER BY o_orderkey""")),

    // #24 CASE WHEN bucketing + conditional aggregation.
    Q("case_expr",
      (s, d) => Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("large"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket"),
      Some(s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                           WHEN o_totalprice < 150000 THEN 'mid'
                           ELSE 'large' END AS bucket,
               COUNT(*) AS cnt,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               ${dsumSql("o_totalprice")} AS sum_price
               FROM orders GROUP BY 1 ORDER BY bucket""")),

    // #25 string function family.
    Q("string_funcs",
      (s, d) => Tables.part(s, d)
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 10).as("name10"),
          concat(col("p_type"), lit("#"), col("p_brand")).as("type_brand"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("name_us"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u, SUBSTR(p_name, 1, 10) AS name10,
              p_type || '#' || p_brand AS type_brand,
              CAST(LENGTH(p_name) AS INTEGER) AS name_len,
              REPLACE(p_name, ' ', '_') AS name_us
              FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""")),

    // #26 date/time function family.
    Q("date_funcs",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
              CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
              CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
              CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
              CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
              CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER) AS days_since
              FROM orders ORDER BY o_orderkey""")),

    // #27 TPC-H Q1 pricing summary (flagship wide aggregation).
    Q("tpch_q1",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          psum(revenue(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
          // (1-d)*(1+t) is an exact 4-decimal product of 2-decimal inputs:
          // combine in double space first so only one decimal multiply is
          // needed (a decimal triple product overflows DuckDB's width rules).
          psum(dmoney(col("l_extendedprice")) *
            dfrac((lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
               ${dsumSql("l_quantity")} AS sum_qty,
               ${dsumSql("l_extendedprice")} AS sum_base_price,
               ${psumSql(revenueSql)} AS sum_disc_price,
               ${psumSql(s"${dmoneySql("l_extendedprice")} * ${dfracSql("(1 - l_discount) * (1 + l_tax)")}")} AS sum_charge,
               ${davgSql("l_quantity")} AS avg_qty,
               ${davgSql("l_extendedprice")} AS avg_price,
               ${davgSql("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
               FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    // #28 TPC-H Q3 shipping priority: selective dim filter first, then two
    // shuffle joins on the fact keys, then top-k (TakeOrderedAndProject).
    Q("tpch_q3", (s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
        .agg(psum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
               ${psumSql(revenueSql)} AS revenue
               FROM customer
               JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON o_orderkey = l_orderkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                 AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
               GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
               ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // #29 TPC-H Q5 local supplier volume: 6-way join; dims broadcast, facts
    // shuffle on their keys.
    Q("tpch_q5", (s, d) => {
      val asia = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
      val nat = broadcast(Tables.nation(s, d))
      // supplier is SF-proportional (~1M rows at sf100): no static broadcast
      // hint — AQE picks broadcast vs shuffle from the actual runtime size.
      val sup = Tables.supplier(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00"))
      Tables.customer(s, d)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(asia, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(psum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },
      Some(s"""SELECT n_name, ${psumSql(revenueSql)} AS revenue
               FROM customer
               JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON o_orderkey = l_orderkey
               JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA'
                 AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
               GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // #30 TPC-H Q6 forecast revenue: pure pushed-filter + single aggregate.
    Q("tpch_q6",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(psum(dmoney(col("l_extendedprice")) * dfrac(col("l_discount"))).as("revenue"),
          count(lit(1)).as("n")),
      Some(s"""SELECT ${psumSql(s"${dmoneySql("l_extendedprice")} * ${dfracSql("l_discount")}")} AS revenue, COUNT(*) AS n
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                 AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""")),

    // #66 TPC-H Q10 returned-item reporting: 4-way join, revenue rollup,
    // top-20 customers. Dim joins (nation) broadcast; the customer join is
    // keyed so AQE picks broadcast vs shuffle by actual size.
    Q("tpch_q10", (s, d) => {
      val nat = broadcast(Tables.nation(s, d))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1996-04-01 00:00:00"))
      Tables.customer(s, d)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(psum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
                 ${psumSql(revenueSql)} AS revenue
               FROM customer
               JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON o_orderkey = l_orderkey
               JOIN nation ON c_nationkey = n_nationkey
               WHERE l_returnflag = 'R'
                 AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
               GROUP BY c_custkey, c_name, c_acctbal, n_name
               ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // #67 TPC-H Q12 (adapted to this schema: ship-delay buckets instead of
    // shipmodes): conditional aggregation over an order⋈lineitem join.
    Q("tpch_q12", (s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .withColumn("delay_days", datediff(col("l_shipdate"), col("o_orderdate")))
        .withColumn("speed", when(col("delay_days") <= 30, "fast")
          .when(col("delay_days") <= 90, "medium").otherwise("slow"))
        .groupBy("speed")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_lines"),
          sum(when(hi, 0L).otherwise(1L)).as("low_lines"))
        .orderBy("speed")
    },
      Some("""SELECT CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 30 THEN 'fast'
                          WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 90 THEN 'medium'
                          ELSE 'slow' END AS speed,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY 1 ORDER BY speed""")),

    // #68 TPC-H Q14 promotion effect: percentage-of-revenue with a
    // broadcast part join; ratio computed from two exact decimal sums.
    Q("tpch_q14", (s, d) => {
      val pt = broadcast(Tables.part(s, d).select("p_partkey", "p_type"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-03-01 00:00:00") &&
          col("l_shipdate") < ts("1996-04-01 00:00:00"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            psum(when(col("p_type") === "PROMO",
              revenue(col("l_extendedprice"), col("l_discount")))
              .otherwise(lit(null))) /
            psum(revenue(col("l_extendedprice"), col("l_discount"))))
            .as("promo_revenue_pct"))
    },
      Some(s"""SELECT 100.0 *
                 ${psumSql(s"CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE NULL END")} /
                 ${psumSql(revenueSql)} AS promo_revenue_pct
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""")),

    // #94 TPC-H Q7 volume shipping: five-way join with two broadcast
    // nation dims, revenue between a nation pair by direction and year.
    Q("tpch_q7", (s, d) => {
      val n1 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      Tables.supplier(s, d)
        .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .withColumn("l_year", year(col("l_shipdate")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(psum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      CAST(YEAR(l_shipdate) AS INT) AS l_year,
                      ${psumSql(revenueSql)} AS revenue
               FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
               WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                 AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
               GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // #95 TPC-H Q8 national market share: a region's customer revenue on
    // one part type, NATION_3-supplied share per order year.
    Q("tpch_q8", (s, d) => {
      val amNations = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cust_nk")))
      val suppNation = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation")))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(amNations, col("c_nationkey") === col("cust_nk"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("supp_nk"))
        .withColumn("o_year", year(col("o_orderdate")))
        .groupBy("o_year")
        .agg((psum(when(col("supp_nation") === "NATION_3",
            revenue(col("l_extendedprice"), col("l_discount"))).otherwise(lit(null))) /
          psum(revenue(col("l_extendedprice"), col("l_discount")))).as("mkt_share"))
        .orderBy("o_year")
    },
      Some(s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
                      ${psumSql(s"CASE WHEN n2.n_name = 'NATION_3' THEN $revenueSql ELSE NULL END")} /
                      ${psumSql(revenueSql)} AS mkt_share
               FROM lineitem JOIN part ON l_partkey = p_partkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON c_nationkey = n1.n_nationkey
                 JOIN region ON n1.n_regionkey = r_regionkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation n2 ON s_nationkey = n2.n_nationkey
               WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
               GROUP BY 1 ORDER BY 1""")),

    // #96 TPC-H Q13 customer order distribution: left join preserves
    // zero-order customers, two-level aggregation.
    Q("tpch_q13", (s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
      Some("""SELECT c_count, COUNT(*) AS custdist
              FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
                    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                    GROUP BY c_custkey)
              GROUP BY c_count
              ORDER BY custdist DESC, c_count DESC""")),

    // #97 TPC-H Q15 top supplier: suppliers whose quarter revenue equals
    // the maximum — revenue kept as EXACT decimal through the max-equality
    // join (a double compare could split ties differently per engine).
    Q("tpch_q15", (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1996-04-01 00:00:00"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("total_rev"))
      val mx = broadcast(rev.agg(max(col("total_rev")).as("mx")))
      rev.join(mx, col("total_rev") === col("mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    },
      Some(s"""WITH rev AS (
                 SELECT l_suppkey, CAST(SUM($revenueSql) AS DECIMAL(38,6)) AS total_rev
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
                 GROUP BY l_suppkey)
               SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
               FROM rev JOIN supplier ON l_suppkey = s_suppkey
               WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
               ORDER BY s_suppkey""")),

    // #98 TPC-H Q17 small-quantity-order revenue: per-part average
    // quantity as a correlated threshold. The 0.2*avg comparison is
    // rewritten to the integer-exact 5 * qty * count < sum so both
    // engines decide the boundary identically (a rounded decimal
    // division would not).
    Q("tpch_q17", (s, d) => {
      val li = Tables.lineitem(s, d)
      val partKeys = broadcast(Tables.part(s, d)
        .filter(col("p_brand") === "Brand#3" && col("p_size") <= 20)
        .select("p_partkey"))
      // The per-part average is only ever consumed for the ~4% of parts
      // passing the brand/size filter, so semi-join lineitem against
      // those keys BEFORE the groupBy: the l_partkey shuffle carries
      // only qualifying rows instead of the whole table (the same
      // prune-below-the-aggregate shape as tpch_q2 and tpch_q20).
      val perPart = li
        .join(partKeys, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("agg_pk"))
        .agg(sum(dec(col("l_quantity")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4)).as("qty_sum"),
          count(lit(1)).as("qty_n"))
      li.join(partKeys, col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("agg_pk"))
        .filter(dec(col("l_quantity")) * lit(5) * col("qty_n") < col("qty_sum"))
        .agg((psum(dmoney(col("l_extendedprice"))) / lit(7.0)).as("avg_yearly"))
    },
      Some(s"""SELECT ${psumSql(dmoneySql("l_extendedprice"))} / 7.0 AS avg_yearly
               FROM lineitem JOIN part ON l_partkey = p_partkey
                 JOIN (SELECT l_partkey AS agg_pk,
                              CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4))) AS DECIMAL(38,4)) AS qty_sum,
                              COUNT(*) AS qty_n
                       FROM lineitem GROUP BY l_partkey) ON l_partkey = agg_pk
               WHERE p_brand = 'Brand#3' AND p_size <= 20
                 AND CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4)) * 5 * qty_n < qty_sum""")),

    // #99 TPC-H Q18 large-volume customers: orders whose total quantity
    // clears a threshold (exact decimal compare), top by order value.
    Q("tpch_q18", (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("big_ok"))
        .agg(sum(dec(col("l_quantity")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4)).as("sum_qty_dec"))
        .filter(col("sum_qty_dec") > 300)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("big_ok"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty_dec").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                     CAST(sum_qty_dec AS DOUBLE) AS sum_qty
              FROM orders
                JOIN (SELECT l_orderkey AS big_ok,
                             CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4))) AS DECIMAL(38,4)) AS sum_qty_dec
                      FROM lineitem GROUP BY l_orderkey
                      HAVING CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4))) AS DECIMAL(38,4)) > 300)
                  ON o_orderkey = big_ok
                JOIN customer ON o_custkey = c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // #100 TPC-H Q19 discounted revenue: OR of brand/size/quantity
    // conjunctions — one broadcast join, predicate-only selectivity.
    Q("tpch_q19", (s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(psum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
    },
      Some(s"""SELECT ${psumSql(revenueSql)} AS revenue
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                      AND l_quantity BETWEEN 1 AND 11)
                  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                      AND l_quantity BETWEEN 10 AND 20)
                  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                      AND l_quantity BETWEEN 20 AND 30)""")),

    // #101 TPC-H Q2 (adapted) minimum-cost supplier. This schema has no
    // partsupp, so the part-supplier catalog derives from lineitem:
    // "supply cost" of (part, supplier) := MIN(l_extendedprice) ever
    // charged. For one size/type slice, EUROPE suppliers matching the
    // per-part regional minimum (a correlated-min subquery, here a
    // groupBy-min rejoin). MIN picks an existing double value — exact
    // cross-engine without decimal casts.
    Q("tpch_q2", (s, d) => {
      val eurSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val parts = Tables.part(s, d)
        .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
        .select("p_partkey", "p_brand")
      // semi-join BEFORE the aggregate: the p_type/p_size filter keeps
      // ~5% of parts, so pre-pruning lineitem here shrinks the groupBy
      // shuffle ~20× — at 100 TB the difference between a full-corpus
      // shuffle and a selective one
      val cost = Tables.lineitem(s, d)
        .join(broadcast(parts.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("supp_cost"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
      // per-part regional minimum as a window over the (small) joined
      // catalog — NOT a groupBy-min rejoin, which would recompute the
      // whole lineitem aggregate a second time (2× the scan at 100 TB)
      cost.withColumn("min_cost",
          min(col("supp_cost")).over(Window.partitionBy(col("p_partkey"))))
        .filter(col("supp_cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_brand"), col("supp_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
      Some("""WITH cost AS (
                SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supp_cost
                FROM lineitem GROUP BY 1, 2)
              SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supp_cost
              FROM cost
                JOIN part ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
              WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
                AND r_name = 'EUROPE'
                AND supp_cost = (
                  SELECT MIN(c2.supp_cost) FROM cost c2
                  JOIN supplier s2 ON c2.l_suppkey = s2.s_suppkey
                  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                  WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
              ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""")),

    // #102 TPC-H Q4 (adapted) order priority checking. No commit/receipt
    // dates in this schema, so "late" := shipped more than 60 days after
    // the order date; the shape — a correlated EXISTS become a left-semi
    // join with a non-equi condition — is Q4's.
    Q("tpch_q4", (s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
          col("o_orderdate") < ts("1996-10-01 00:00:00"))
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey
                              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // #103 TPC-H Q9 (adapted) product-type profit. partsupp's supplycost
    // is gone, so unit cost := 60% of p_retailprice (2-decimal in the
    // data; quantities are integral — both factor casts exact). Each
    // profit term is cast to DECIMAL(20,6) before the subtraction so
    // neither engine's intermediate widens past 38 digits.
    Q("tpch_q9", (s, d) => {
      val dec206 = org.apache.spark.sql.types.DecimalType(20, 6)
      val profit =
        revenue(col("l_extendedprice"), col("l_discount")).cast(dec206) -
          (dmoney(col("p_retailprice")) *
            col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(12, 2)) *
            lit(0.6).cast(org.apache.spark.sql.types.DecimalType(2, 1))).cast(dec206)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").contains("widget"))
          .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .withColumn("o_year", year(col("o_orderdate")))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(psum(profit).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
      Some(s"""SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
                      ${psumSql(s"CAST($revenueSql AS DECIMAL(20,6)) - " +
                        s"CAST(${dmoneySql("p_retailprice")} * CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(12,2)) * " +
                        "CAST(0.6 AS DECIMAL(2,1)) AS DECIMAL(20,6))")} AS sum_profit
               FROM lineitem JOIN part ON l_partkey = p_partkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
               WHERE p_name LIKE '%widget%'
               GROUP BY 1, 2 ORDER BY nation, o_year DESC""")),

    // #104 TPC-H Q11 (adapted) important stock: per-part inventory value
    // held by one nation's suppliers, kept when above 1/500 of the nation
    // total. No partsupp, so value := decimal sum of extendedprice over
    // that nation's lineitems; the share threshold is the integer-exact
    // 500·part_value > total (a decimal-fraction product would round
    // differently per engine).
    Q("tpch_q11", (s, d) => {
      // Reduce the filtered dimension FIRST: supplier ⋈ σ(nation) is a
      // tiny broadcast build side (~1/25 of suppliers), so lineitem rows
      // drop at their single join instead of surviving an unfiltered
      // lineitem⋈supplier and only then meeting the nation predicate.
      val natSupp = broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey")
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
      val byPart = Tables.lineitem(s, d)
        .join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(dmoney(col("l_extendedprice")))
          .cast(org.apache.spark.sql.types.DecimalType(20, 4)).as("part_value_dec"))
      val total = broadcast(byPart.agg(sum(col("part_value_dec"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 4)).as("total_value")))
      byPart.crossJoin(total)
        .filter(col("part_value_dec") * lit(500) > col("total_value"))
        .select(col("l_partkey"), col("part_value_dec").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },
      Some(s"""WITH byp AS (
                 SELECT l_partkey,
                        CAST(SUM(${dmoneySql("l_extendedprice")}) AS DECIMAL(20,4)) AS part_value_dec
                 FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                   JOIN nation ON s_nationkey = n_nationkey
                 WHERE n_name = 'NATION_5'
                 GROUP BY l_partkey)
               SELECT l_partkey, CAST(part_value_dec AS DOUBLE) AS part_value
               FROM byp,
                 (SELECT CAST(SUM(part_value_dec) AS DECIMAL(38,4)) AS total_value FROM byp) t
               WHERE part_value_dec * 500 > total_value
               ORDER BY part_value DESC, l_partkey""")),

    // #105 TPC-H Q16 (adapted) parts/supplier relationship: supplier
    // diversity per (brand, type, size) over the lineitem-derived
    // catalog, excluding one brand, one type, and "complaint" suppliers
    // (proxy: negative account balance — no comment column) via NOT IN.
    Q("tpch_q16", (s, d) => {
      Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey").as("bad_sk")),
          col("l_suppkey") === col("bad_sk"), "left_anti")
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
      Some("""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
                AND p_size IN (1, 4, 9, 16, 25, 36, 49)
                AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              GROUP BY 1, 2, 3
              ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // #106 TPC-H Q20 (adapted) potential part promotion: one nation's
    // suppliers who shipped most of their lifetime volume of some
    // red-named part recently (2·recent > total, exact decimal
    // quantities). partsupp availability is gone, so "excess stock"
    // becomes recent-shipment share; the nested-IN chain (part →
    // (part,supplier) volumes → suppliers) is Q20's.
    Q("tpch_q20", (s, d) => {
      val vol = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").startsWith("red"))
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("total_qty"),
          sum(when(col("l_shipdate") >= ts("1999-01-01 00:00:00"),
            dec(col("l_quantity")))).as("recent_qty"))
        .filter(col("recent_qty") * 2 > col("total_qty"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .join(vol, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_suppkey"))
        .orderBy("s_name")
    },
      Some("""SELECT s_name, s_suppkey
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_7'
                AND s_suppkey IN (
                  SELECT l_suppkey FROM lineitem
                  WHERE l_partkey IN (SELECT p_partkey FROM part
                                      WHERE p_name LIKE 'red%')
                  GROUP BY l_partkey, l_suppkey
                  HAVING CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
                                       THEN CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4)) END)
                              AS DECIMAL(38,4)) * 2
                         > CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(25,4))) AS DECIMAL(38,4)))
              ORDER BY s_name""")),

    // #107 TPC-H Q21 (adapted) suppliers who kept orders waiting: for
    // finished orders, count each late lineitem whose supplier was the
    // ONLY late supplier on a multi-supplier order ("late" := shipped
    // >60 days after the order date — no receipt/commit dates here).
    // The two correlated EXISTS become one per-order aggregate: distinct
    // suppliers > 1 and distinct LATE suppliers == 1.
    Q("tpch_q21", (s, d) => {
      // per-order distinct-supplier sets as ONE window pass over the
      // order-status join (orders are ~7 lineitems wide, so the per-key
      // collect_set state is tiny) — a groupBy + rejoin would shuffle
      // and sort the same fact rows on the same key twice.
      val w = Window.partitionBy(col("l_orderkey"))
      Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("n_late_supp",
          size(collect_set(when(col("is_late"), col("l_suppkey"))).over(w)))
        .filter(col("is_late") && col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_4")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
      Some("""SELECT s_name, COUNT(*) AS numwait
              FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                JOIN orders ON o_orderkey = l1.l_orderkey
              WHERE n_name = 'NATION_4' AND o_orderstatus = 'F'
                AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM lineitem l3
                                WHERE l3.l_orderkey = l1.l_orderkey
                                  AND l3.l_suppkey <> l1.l_suppkey
                                  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
              GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""")),

    // #108 TPC-H Q22 (adapted) global sales opportunity: rich customers
    // with no URGENT orders (every customer here has orders, so the
    // original's order-less NOT EXISTS would be empty), grouped by a
    // derived "country code" (no phone column) := c_nationkey % 5. The
    // above-positive-average balance filter is rewritten integer-exact
    // (bal·n > total) — a divided average would round differently per
    // engine.
    Q("tpch_q22", (s, d) => {
      val dec12 = org.apache.spark.sql.types.DecimalType(12, 4)
      val cust = Tables.customer(s, d)
        .withColumn("cntrycode", (col("c_nationkey") % 5).cast("int"))
        .filter(col("cntrycode").isin(0, 2, 4))
      val thresh = broadcast(cust.filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast(dec12)).as("tot_bal"),
          count(lit(1)).as("n_pos")))
      cust.join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(thresh)
        .filter(col("c_acctbal").cast(dec12) * col("n_pos") > col("tot_bal"))
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    },
      Some(s"""WITH cust AS (
                 SELECT c_custkey, c_acctbal, CAST(c_nationkey % 5 AS INT) AS cntrycode
                 FROM customer WHERE c_nationkey % 5 IN (0, 2, 4)),
               t AS (
                 SELECT CAST(SUM(CAST(CAST(ROUND((c_acctbal) * 100) AS BIGINT) * 0.0100 AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS tot_bal,
                        COUNT(*) AS n_pos
                 FROM cust WHERE c_acctbal > 0)
               SELECT cntrycode, COUNT(*) AS numcust, ${dsumSql("c_acctbal")} AS totacctbal
               FROM cust, t
               WHERE CAST(CAST(ROUND((c_acctbal) * 100) AS BIGINT) * 0.0100 AS DECIMAL(12,4)) * n_pos > tot_bal
                 AND NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND o_orderpriority = '1-URGENT')
               GROUP BY cntrycode ORDER BY cntrycode""")),

    // #31 tumbling time-window aggregation over the event stream (batch
    // twin of streaming/EventsPipeline; epoch-aligned hourly buckets).
    Q("events_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_start", "event_type"),
      Some(s"""SELECT strftime(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
               FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""")),

    // #73 hopping (sliding) window: 1-hour windows every 30 minutes — each
    // event lands in two windows. The DuckDB twin materializes the same
    // two epoch-aligned buckets per event explicitly.
    Q("events_hopping", (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type"),
      Some(s"""WITH b AS (
                 SELECT strftime(to_timestamp(epoch(ts) - epoch(ts) % 1800),
                                 '%Y-%m-%d %H:%M:%S') AS win_start, event_type, value
                 FROM events
                 UNION ALL
                 SELECT strftime(to_timestamp(epoch(ts) - epoch(ts) % 1800 - 1800),
                                 '%Y-%m-%d %H:%M:%S') AS win_start, event_type, value
                 FROM events)
               SELECT win_start, event_type, COUNT(*) AS n,
                      ${dsumSql("value")} AS sum_value
               FROM b GROUP BY win_start, event_type
               ORDER BY win_start, event_type""")),

    // #32 sessionization: 30-minute-gap sessions via lag + prefix sum (the
    // batch twin of the stateful streaming sessionizer).
    Q("events_sessionize", (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
      Some("""WITH flagged AS (
                SELECT user_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                              OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
                     COUNT(*) AS n_events
              FROM flagged GROUP BY user_id ORDER BY user_id""")),

    // #118 funnel analysis: per-user ordered stage progression (first
    // view → first click AFTER it → first purchase AFTER that) counted
    // per stage — the classic product-analytics query. Single-pass: ONE
    // events scan, one user_id shuffle for the chained window-mins (all
    // three share the partitioning so Spark plans one Exchange), and the
    // per-user groupBy rides the same partitioning exchange-free. The
    // old three-aggregates-joined-forward shape scanned events 5×.
    Q("events_funnel", (s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val stages = Tables.events(s, d).select("user_id", "event_type", "ts")
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("ts") > col("t_view"),
            col("ts"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
            col("ts"))).over(w))
        .groupBy("user_id")
        .agg(min("t_view").as("t_view"), min("t_click").as("t_click"),
          min("t_purchase").as("t_purchase"))
      stages.select(explode(array(
          when(col("t_view").isNotNull, lit("1_view")),
          when(col("t_click").isNotNull, lit("2_click")),
          when(col("t_purchase").isNotNull, lit("3_purchase")))).as("stage"))
        .filter(col("stage").isNotNull)
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .orderBy("stage")
    },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                         WHERE event_type = 'view' GROUP BY user_id),
              c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
                    JOIN v USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > v.t_view
                    GROUP BY e.user_id),
              p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
                    JOIN c USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                    GROUP BY e.user_id)
              SELECT stage, COUNT(*) AS n_users FROM (
                SELECT '1_view' AS stage, user_id FROM v
                UNION ALL SELECT '2_click', user_id FROM c
                UNION ALL SELECT '3_purchase', user_id FROM p) t
              GROUP BY stage ORDER BY stage""")),

    // #119 cohort retention: users bucketed by their first-activity day,
    // retention = distinct users active again N days later (0..7). One
    // (user, day) dedup + one per-user min + one keyed join — the whole
    // curve in three shuffles regardless of event volume.
    Q("events_retention", (s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
      days.join(cohort, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
        .filter(col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                            FROM events),
              cohort AS (SELECT user_id, MIN(day) AS cohort_day
                         FROM days GROUP BY user_id)
              SELECT cohort_day, day - cohort_day AS day_offset,
                     COUNT(DISTINCT d.user_id) AS n_users
              FROM days d JOIN cohort USING (user_id)
              WHERE day - cohort_day <= 7
              GROUP BY cohort_day, day_offset
              ORDER BY cohort_day, day_offset""")),

    // #121 resample with gap filling: the complete hourly spine per event
    // type — EMPTY buckets included, which plain groupBy can never emit.
    // The spine is generated from one aggregate row (global bounds ×
    // distinct types: tiny × tiny, the only sane place for a cross join)
    // and the per-bucket aggregates LEFT-join onto it; event volume never
    // rides the spine generation.
    Q("events_resample", (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
      val counts = ev.groupBy("event_type", "h")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      val spine = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
        .crossJoin(ev.select("event_type").distinct())
      spine.join(counts, Seq("event_type", "h"), "left_outer")
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0d)).as("sum_value"))
        .orderBy("event_type", "hour")
    },
      Some(s"""WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h, value
                           FROM events),
               spine AS (SELECT t.event_type, u.h
                         FROM (SELECT DISTINCT event_type FROM ev) t,
                              UNNEST(generate_series((SELECT min(h) FROM ev),
                                (SELECT max(h) FROM ev), INTERVAL 1 HOUR)) u(h)),
               c AS (SELECT event_type, h, COUNT(*) AS n,
                            ${dsumSql("value")} AS sum_value
                     FROM ev GROUP BY event_type, h)
               SELECT s.event_type, strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
                      COALESCE(c.n, 0) AS n, COALESCE(c.sum_value, 0.0) AS sum_value
               FROM spine s LEFT JOIN c USING (event_type, h)
               ORDER BY event_type, hour""")),

    // #33a exact distinct count (oracle twin of the HLL sketch below).
    Q("distinct_count",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // #33b HLL approximate distinct — sketch values differ per engine, so
    // rows-only check; the spec asserts <5% error vs the exact twin.
    Q("approx_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("n_parts_approx"))
        .orderBy("l_returnflag"),
      None)
  )
}
