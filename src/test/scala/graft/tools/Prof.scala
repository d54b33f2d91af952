package graft.tools

import graft._

/** Ad-hoc per-query profiler:
  * `sbt "Test/runMain graft.tools.Prof <query> [runs] [sfDir]"` —
  * times repeated executions (run 1 = cold: plan compile + JIT).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "tpch_q1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = Engine.session("local[32]")
    // optional 4th arg: comma-separated k=v runtime SQL confs to A/B
    if (args.length > 3) args(3).split(',').filter(_.contains("=")).foreach { kv =>
      val i = kv.indexOf('=')
      spark.conf.set(kv.substring(0, i), kv.substring(i + 1))
      System.err.println(s"[prof] conf ${kv.substring(0, i)}=${kv.substring(i + 1)}")
    }
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; keys: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      println(f"[prof] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
