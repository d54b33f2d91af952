package graft.tools
import graft._
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]")
    val d = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_cole/prof"
    Tables.lineitem(spark, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus")
      .write.format("cole").mode("overwrite").save(dir)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s  v=$n")
    }
    val sz = new java.io.File(dir).listFiles().map(_.length()).sum / 1e6
    println(f"[prof] file size: $sz%.1f MB")
    for (_ <- 1 to 3)
      time("cole full scan+agg")(spark.read.format("cole").load(dir)
        .agg(sum("l_partkey"), count(lit(1))).head())
    for (_ <- 1 to 2)
      time("cole filtered scan")(spark.read.format("cole").load(dir)
        .filter(col("l_orderkey") < 10000).agg(count(lit(1))).head())
    spark.stop()
  }
}
