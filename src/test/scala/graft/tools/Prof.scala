package graft.tools
import graft._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s  v=$n")
    }
    for (i <- 1 to 4)
      time(s"join_range $i")(SparkEntry.queries("join_range")(spark, d).count())
    spark.stop()
  }
}
