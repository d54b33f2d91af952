package graft.tools
import graft._
import graft.operators._
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)
    println("docs=" + docs.count())
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s  v=$n")
    }
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val banded = Dedup.bandize(sigs)
    import org.apache.spark.sql.expressions.Window
    time("windowed")(banded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "bh")))
      .filter(col("bucket_n") <= Dedup.maxBucket).count())
    time("cand1")(Dedup.minhashCandidates(docs).count())
    time("cand2")(Dedup.minhashCandidates(docs).count())
    time("report")(Dedup.perDocReport(docs, Dedup.minhashCandidates(docs), "doc_id", "est_jaccard").count())
    spark.stop()
  }
}
