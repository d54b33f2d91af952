package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import Dsl._

/** SURVEY §2.1 — the reference engine's own query surface, re-expressed as
  * declarative Spark plans.
  *
  * The reference's `QueryExecutor` (reference: include/execution.h:99-120)
  * supports projection, conjunctive numeric predicates
  * (include/execution.h:39-59), COUNT/SUM/MIN/MAX aggregates
  * (include/execution.h:62-67) and single-column GROUP BY
  * (include/execution.h:112) over its columnar files, with per-page min/max
  * skipping (include/format.h:41-46). On Spark the same semantics are a
  * parquet scan: Catalyst pushes the predicates (`PushedFilters`), prunes
  * columns (`ReadSchema`), parquet row-group stats provide the data
  * skipping, and partial aggregation gives the map-side combine the
  * reference does per batch.
  */
object CoreSuite {

  val queries: Seq[Q] = Seq(

    // #1 full scan — reference `query <file>` with no options (src/cli.cpp:268).
    Q("scan_full",
      (s, d) => Tables.lineitem(s, d)
        .withColumn("l_shipdate", to_date(col("l_shipdate")))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
              l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
              CAST(l_shipdate AS DATE) AS l_shipdate
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // #2 projection — reference `--select` (src/cli.cpp:226); column pruning
    // reaches the scan (ReadSchema lists only these two columns).
    Q("scan_project",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice")
        .orderBy("l_orderkey", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_extendedprice FROM lineitem
              ORDER BY l_orderkey, l_extendedprice""")),

    // #3 conjunctive numeric predicates — reference `--where col op value`,
    // ops EQ/NE/LT/LE/GT/GE (include/execution.h:39-46). All six operators
    // exercised; all pushed to the parquet scan.
    Q("filter_numeric",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_linenumber") <= 3 &&
          col("l_suppkey") =!= 5 && col("l_partkey") >= 10 &&
          col("l_discount") < 0.05 && col("l_orderkey") < 1000000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_suppkey", "l_partkey", "l_discount")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_suppkey, l_partkey, l_discount
              FROM lineitem
              WHERE l_quantity > 30 AND l_linenumber <= 3 AND l_suppkey <> 5
                AND l_partkey >= 10 AND l_discount < 0.05 AND l_orderkey < 1000000
              ORDER BY l_orderkey, l_linenumber""")),

    // #4 stat-based data skipping — reference `Predicate::canSkipPage`
    // (include/execution.h:58). A tight range on the clustered key lets
    // parquet row-group min/max stats skip most of the file.
    Q("filter_range_skip",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") >= 100 && col("l_orderkey") <= 200 && col("l_linenumber") === 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
              WHERE l_orderkey >= 100 AND l_orderkey <= 200 AND l_linenumber = 1
              ORDER BY l_orderkey, l_linenumber""")),

    // #5 COUNT — reference AggFunc::COUNT (include/execution.h:63).
    Q("agg_count",
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("cnt")),
      Some("SELECT COUNT(*) AS cnt FROM lineitem")),

    // #6 SUM/MIN/MAX in one pass — reference executeAggregate computes all
    // of count/sum/min/max in a single scan (include/execution.h:70-75).
    Q("agg_sum_min_max",
      (s, d) => Tables.lineitem(s, d).agg(
        count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(col("l_partkey")).as("sum_partkey"),
        min(to_date(col("l_shipdate"))).as("min_ship"),
        max(to_date(col("l_shipdate"))).as("max_ship")),
      Some(s"""SELECT COUNT(*) AS cnt, ${dsumSql("l_quantity")} AS sum_qty,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
               CAST(SUM(l_partkey) AS BIGINT) AS sum_partkey,
               MIN(CAST(l_shipdate AS DATE)) AS min_ship,
               MAX(CAST(l_shipdate AS DATE)) AS max_ship
               FROM lineitem""")),

    // #7 AVG — natural extension of the reference's aggregate set.
    Q("agg_avg",
      (s, d) => Tables.lineitem(s, d).agg(
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price")),
      Some(s"""SELECT ${davgSql("l_quantity")} AS avg_qty,
               ${davgSql("l_extendedprice")} AS avg_price FROM lineitem""")),

    // #8 GROUP BY + count/sum — reference executeGroupBy returns (key,
    // count, sum) per group (include/execution.h:112, src/cli.cpp:245-254).
    // Spark plans this as partial (map-side) + final aggregation: the
    // shuffle carries one row per (partition, group), not per input row.
    Q("groupby_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS cnt, ${dsumSql("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // #9 multi-key GROUP BY (extension past the reference's single column).
    Q("groupby_multi",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          dsum(col("l_extendedprice")).as("sum_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               ${dsumSql("l_extendedprice")} AS sum_price,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
               FROM lineitem GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    // #10 DISTINCT — the dictionary-encoded columns' value domain
    // (reference dictionary encoding, include/encoding.h).
    Q("distinct_values",
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    // #11 top-k — ORDER BY + LIMIT plans as TakeOrderedAndProject: each
    // partition keeps only k rows, no global sort at scale.
    Q("topk_order_limit",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(10),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10"""))
  )
}
