package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an sf1 dataset as a 10× key-shifted replication of the
  * driver's sf0.1 parquet — for SCALING benchmarks (BENCH_r*_sf1), not
  * correctness (the DuckDB gate stays at sf0.01 on driver data).
  *
  * Replication preserves per-replica join cardinalities exactly (every
  * foreign key shifts by the same replica stride on both sides) and the
  * TPC-H convention that region/nation stay constant. Text gets a
  * per-replica suffix and embeddings a per-replica epsilon so the dedup
  * and ANN operators scale over near-structure, not 10 exact clones of
  * every row.
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val replicas = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1
    def replicate(df: DataFrame, shifts: Map[String, Long],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until replicas).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (k, s)) =>
          d.withColumn(k, col(k) + lit(i * s))
        }
        mutate(shifted, i)
      }.reduce(_ unionAll _)
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")

    val (orders, lineitem, customer, supplier, part) =
      (read("orders"), read("lineitem"), read("customer"), read("supplier"), read("part"))
    val (events, documents, embeddings) =
      (read("events"), read("documents"), read("embeddings"))
    val (sO, sC, sS, sP) = (stride(orders, "o_orderkey"), stride(customer, "c_custkey"),
      stride(supplier, "s_suppkey"), stride(part, "p_partkey"))
    val (sE, sU, sD, sV) = (stride(events, "event_id"), stride(events, "user_id"),
      stride(documents, "doc_id"), stride(embeddings, "vec_id"))

    // constant dimensions, verbatim (TPC-H scaling convention)
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)
    write(replicate(customer, Map("c_custkey" -> sC)), "customer", 8)
    write(replicate(supplier, Map("s_suppkey" -> sS)), "supplier", 4)
    write(replicate(part, Map("p_partkey" -> sP)), "part", 8)
    write(replicate(orders, Map("o_orderkey" -> sO, "o_custkey" -> sC)), "orders", 16)
    write(replicate(lineitem,
      Map("l_orderkey" -> sO, "l_partkey" -> sP, "l_suppkey" -> sS)), "lineitem", 32)
    // ts rides as raw int64 nanos (nanosAsLong) — Tables.events converts
    write(replicate(events, Map("event_id" -> sE, "user_id" -> sU)), "events", 16)
    write(replicate(documents, Map("doc_id" -> sD), (d, i) =>
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" r$i")))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents", 8)
    write(replicate(embeddings, Map("vec_id" -> sV), (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), x => (x + lit(i * 1e-3f)).cast("float")))),
      "embeddings", 8)

    graft.Tables.all.foreach { t =>
      println(s"[sf1] $t rows=" + spark.read.parquet(s"$out/$t.parquet").count())
    }
    spark.stop()
  }
}
