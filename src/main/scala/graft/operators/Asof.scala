package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no builtin for.
  *
  * For every left row, attach values from the LATEST right row with the
  * same key and `right.ts <= left.ts` (inclusive). The classic uses are
  * point-in-time feature lookups and market-data joins.
  *
  * Implementation is the scalable tagged-union formulation, not a range
  * join: both sides are unioned with a side tag, shuffled ONCE on the key,
  * sorted per key by (ts, tag) — right rows sort before left rows at equal
  * ts, which is what makes the match inclusive — and a running
  * `last(_, ignoreNulls)` window carries the most recent right payload
  * forward into each left row. Cost is one shuffle + one per-key sort;
  * a range-join formulation would explode to |L|·|R| comparisons per key.
  *
  * The payload rides as ONE struct of all carry columns (a single window
  * pass), and the struct itself is the null marker: it is non-null for
  * every right ROW even when the carried values are NULL, so the latest
  * right row wins with its NULLs intact — matching DuckDB ASOF JOIN
  * semantics — instead of falling back to an older row's value.
  */
object Asof {

  /** @param key   shared equality-key column name (present on both sides)
    * @param ts    shared event-time column name (present on both sides)
    * @param carry right-side columns to attach; emitted as `asof_<name>`
    */
  def joinAsof(left: DataFrame, right: DataFrame, key: String, ts: String,
      carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "carry must name at least one right-side column")
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      carry.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val l = left.select(
      leftCols.map(col) :+
        lit(null).cast(payloadType).as("_r") :+
        lit(1).as("_tag"): _*)
    val r = right.select(
      leftCols.map {
        case c @ (`key` | `ts`) => col(c)
        case c                  => lit(null).cast(left.schema(c).dataType).as(c)
      } :+
        struct(carry.map(col): _*).as("_r") :+
        lit(0).as("_tag"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
    filled.filter(col("_tag") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }
}
