package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dump `.explain("formatted")` of named queries (at sf0.1) into
  * plans/r18/<query>_<tag>.txt — the optimization round's plan-evidence
  * artifacts. Special pseudo-queries (BEFORE plans reproducible from the
  * current tree):
  *   - `cfd_diffpath`: the cole_changefeed_dml feed read FORCED onto the
  *     live-diff path (fixture copied aside, materialized cdf stripped) —
  *     the BEFORE plan of the r17 materialization trim.
  *   - `ngram_oldpath` / `decon_oldpath`: corpus_ngram_stats /
  *     corpus_decontaminate rebuilt with the pre-r18
  *     split → transform(slice/concat_ws) formulation — the BEFORE plans
  *     of the space_ngrams kernel.
  * Usage: Test/runMain graft.tools.DumpPlans <tag> <query>[,query...]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(',').filter(_.nonEmpty)
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = Engine.session("local[32]")
    val outDir = new java.io.File("plans/r18")
    outDir.mkdirs()
    def write(name: String, header: String, plan: String): Unit = {
      val w = new java.io.PrintWriter(s"plans/r18/${name}_$tag.txt")
      try { w.println(header); w.println(plan) } finally w.close()
      println(s"[plans] wrote plans/r18/${name}_$tag.txt")
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
      case "ngram_oldpath" =>
        // pre-r18 corpus_ngram_stats: split + HOF slice/concat_ws chain
        val toks = Tables.documents(spark, d).select(
          split(graft.functions.Text.normalize(col("text")), " ").as("t"))
        val old = toks.filter(size(col("t")) >= 2)
          .select(explode(transform(
            sequence(lit(1), size(col("t")) - 1),
            i => concat_ws(" ", slice(col("t"), i, lit(2))))).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("gram").asc)
          .limit(20)
        write("corpus_ngram_stats", s"# corpus_ngram_stats @ $d — " +
          "pre-r18 formulation (split + transform(slice/concat_ws)), " +
          "rebuilt from the current tree as the BEFORE plan of the " +
          "space_ngrams kernel",
          old.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      case "textrep_oldpath" =>
        // pre-r18 text_repetition: two window passes over (doc, tok)
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.documents(spark, d)
          .select(col("doc_id"),
            explode(split(graft.functions.Text.normalize(col("text")), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("doc_id")
        val old = toks
          .withColumn("n_tokens", sum(col("n")).over(w))
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("n").desc, col("tok").asc)))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("tok").as("top_token"),
            col("n").as("top_count"), col("n_tokens"),
            (col("n").cast("double") / col("n_tokens")).as("repetition_ratio"))
          .orderBy("doc_id")
        write("text_repetition", s"# text_repetition @ $d — pre-r18 " +
          "formulation (two windows over (doc, tok)), rebuilt from the " +
          "current tree as the BEFORE plan of the min-struct rewrite",
          old.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      case "decon_oldpath" =>
        // pre-r18 corpus_decontaminate: same chain, k=3, join shape
        val docs = Tables.documents(spark, d)
        val toks = docs.select(col("doc_id"),
          split(graft.functions.Text.normalize(col("text")), " ").as("t"))
        val grams = toks.filter(size(col("t")) >= 3)
          .select(col("doc_id"), explode(transform(
            sequence(lit(1), size(col("t")) - 2),
            i => concat_ws(" ", slice(col("t"), i, lit(3))))).as("gram"))
        val evalGrams = grams.filter(col("doc_id") % 97 === 0)
          .select("gram").distinct()
        val hits = grams.filter(col("doc_id") % 97 =!= 0)
          .join(evalGrams, "gram")
          .groupBy("doc_id").agg(countDistinct(col("gram")).as("n_hits"))
        val old = docs.filter(col("doc_id") % 97 =!= 0).select("doc_id")
          .join(hits, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)) > 0).as("tainted"))
          .orderBy("doc_id")
        write("corpus_decontaminate", s"# corpus_decontaminate @ $d — " +
          "pre-r18 formulation (split + transform(slice/concat_ws)), " +
          "rebuilt from the current tree as the BEFORE plan of the " +
          "space_ngrams kernel",
          old.queryExecution.explainString(
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
