package graft

import org.apache.spark.sql.functions._

/** Quick self-check of the driver contract surfaces: entry row count,
  * query/oracle inventory, and a COLE write→read round-trip. Run via
  * `sbt "runMain graft.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    // 1. driver contract: entry must return rows on sf0.001
    println("[probe] entry rows=" + SparkEntry.entry(spark).count())
    println("[probe] queries=" + SparkEntry.queries.size +
      " oracles=" + SparkEntry.oracleSql.size)
    // 2. COLE storage round-trip
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"))
    li.write.format("cole").mode("overwrite")
      .option("rowGroupSize", "2000").save("/tmp/graft_cole_probe")
    val back = spark.read.format("cole").load("/tmp/graft_cole_probe")
    println("[probe] roundtrip rows=" + back.count() + " expect=" + li.count())
    val diff = back.exceptAll(li).count() + li.exceptAll(back).count()
    println("[probe] roundtrip diff=" + diff)
    // 3. reference-engine-written fixture, when present (format fidelity)
    val refFixture = new java.io.File("/tmp/ref_data.col")
    if (refFixture.exists()) {
      val ref = spark.read.format("cole").load(refFixture.getPath)
      println("[probe] ref rows=" + ref.count())
    }
    spark.stop()
  }
}
