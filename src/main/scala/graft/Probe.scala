package graft

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val n = SparkEntry.entry(spark).count()
    println(s"[probe] entry rows=$n")
    println(s"[probe] queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
