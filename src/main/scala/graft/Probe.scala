package graft

import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    // 1. read a REFERENCE-written .col file (format fidelity)
    val ref = spark.read.format("cole").load("/tmp/ref_data.col")
    ref.printSchema()
    println("[probe] ref rows=" + ref.count())
    ref.groupBy("region").agg(count(lit(1)), sum("value"), min("id"), max("id")).show()
    // 2. pushdown + pruning plan
    val q = ref.filter(col("value") > 9000 && col("id") < 1000).select("id", "value")
    q.explain("formatted")
    println("[probe] filtered rows=" + q.count())
    // 3. roundtrip: Spark write -> Spark read
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"))
    li.write.format("cole").mode("overwrite").option("rowGroupSize", "2000").save("/tmp/graft_cole_probe")
    val back = spark.read.format("cole").load("/tmp/graft_cole_probe")
    println("[probe] roundtrip rows=" + back.count() + " expect=" + li.count())
    val diff = back.exceptAll(li).count() + li.exceptAll(back).count()
    println("[probe] roundtrip diff=" + diff)
    spark.stop()
  }
}
