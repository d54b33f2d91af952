package graft.tools
import graft._
/** Ad-hoc: print executed plans of named queries at sf0.001. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    val d = "/root/testdata/sf0.001"
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val joins = p.linesIterator.filter(l => l.contains("Join")).map(_.trim.takeWhile(_ != '(')).toSeq
      println(s"[peek] $n joins: ${joins.mkString(" | ")}")
      if (p.contains("CartesianProduct")) println(s"[peek] $n HAS CARTESIAN")
    }
    spark.stop()
  }
}
