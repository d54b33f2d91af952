package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dump `.explain("formatted")` of named queries (at sf0.1) into
  * plans/r17/<query>_<tag>.txt — the optimization round's plan-evidence
  * artifacts. Special pseudo-queries:
  *   - `cfd_diffpath`: the cole_changefeed_dml feed read FORCED onto the
  *     live-diff path (fixture copied aside, materialized cdf stripped) —
  *     the BEFORE plan of the materialization trim, reproducible from
  *     the current tree.
  * Usage: Test/runMain graft.tools.DumpPlans <tag> <query>[,query...]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(',').filter(_.nonEmpty)
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = Engine.session("local[32]")
    val outDir = new java.io.File("plans/r17")
    outDir.mkdirs()
    def write(name: String, header: String, plan: String): Unit = {
      val w = new java.io.PrintWriter(s"plans/r17/${name}_$tag.txt")
      try { w.println(header); w.println(plan) } finally w.close()
      println(s"[plans] wrote plans/r17/${name}_$tag.txt")
    }
    names.foreach {
      case "cfd_diffpath" =>
        // copy the cfd fixture aside, strip the materialized cdf, read
        // the feed → the pre-materialization (live diff) plan
        val fpCls = Class.forName("graft.queries.ColeSuite$")
        val mod = fpCls.getField("MODULE$").get(null)
        val m = fpCls.getDeclaredMethod("writerFingerprint")
        m.setAccessible(true)
        val fp = m.invoke(mod).asInstanceOf[String]
        val sfx = d.replaceAll("[^a-zA-Z0-9]", "_")
        val src = s"/tmp/graft_cole/warehouse/v${fp}_cfd_$sfx/li"
        val dst = "/tmp/graft_plan_cfd_before/li"
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_plan_cfd_before"), true)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new org.apache.hadoop.fs.Path(src),
          fs, new org.apache.hadoop.fs.Path(dst),
          false, spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$dst/_cole_versions/cdf"), true)
        val feed = graft.sources.cole.ColeChangeFeed.read(spark, dst, 1L, 3L)
          .groupBy(col("_change_type").as("change_type"),
            col("_commit_version").as("commit_version"), col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sum_key"),
            sum("l_linenumber").as("sum_line"))
          .orderBy("commit_version", "change_type", "l_returnflag")
        write("cole_changefeed_dml", s"# cole_changefeed_dml — feed read " +
          "on the LIVE-DIFF path (materialized cdf stripped from a " +
          "fixture copy): the plan before the r17-opt materialization",
          feed.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      case name =>
        val fn = SparkEntry.queries(name)
        val df = fn(spark, d)
        write(name, s"# $name @ $d", df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
