package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Scratch phase attribution for the ann_pq bench key (optimization round):
  * splits codebook training (driver), corpus encode, ADC scoring and the
  * exact re-rank so the expensive phase is named before it is touched.
  * `sbt "Test/runMain graft.tools.AnnAttr [runs] [sfDir]"`.
  */
object AnnAttr {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 4
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val s = Engine.session("local[32]")
    import graft.operators.Ann
    val embs = Tables.embeddings(s, d)
    val queries = embs.filter(col("vec_id") % 100 === 0)
    println(s"[attr] corpus=${embs.count()} queries=${queries.count()}")
    for (i <- 1 to runs) {
      println(s"[attr] --- run $i")
      Attr.time("train (driver)") {
        Ann.trainPq(embs)
      }
      val model = Ann.trainPq(embs)
      Attr.time("encode+noop") {
        Ann.pqEncodeWith(embs, model)
          .write.format("noop").mode("overwrite").save()
      }
      Attr.time("full ann_pq") {
        Ann.pq(embs, queries, k = 5)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank").count()
      }
      Attr.time("packed ann_pq") {
        packedPq(model, embs, queries, k = 5)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank").count()
      }
    }
    // plan + result-identity check for the packed variant
    val model = Ann.trainPq(embs)
    val a = Ann.pq(embs, queries, k = 5)
      .select("query_id", "rank", "neighbor_id")
    val b = packedPq(model, embs, queries, k = 5)
      .select("query_id", "rank", "neighbor_id")
    println(s"[attr] exceptAll diff = ${a.exceptAll(b).count() + b.exceptAll(a).count()}")
    packedApprox(model, embs, queries).explain("formatted")
    s.stop()
  }

  import org.apache.spark.sql.DataFrame
  import graft.functions.sketches._
  import graft.operators.Ann

  /** Experimental flat-PQ ADC: packed codes paired with each query's packed
    * LUT through a constant-key BroadcastHashJoin (non-foldable zero key on
    * both sides keeps the equi-join extraction alive), scoring one pq_adc
    * per pair — no m-way explode, no aggregate.
    */
  private def packedApprox(model: Ann.PqModel, corpus: DataFrame,
      queries: DataFrame): DataFrame = {
    val corpusEnc = corpus.select(col("vec_id").as("neighbor_id"),
      pq_encode(col("embedding"), model.cbFlat, model.m, model.nCodes, model.subLen).as("codes"),
      pmod(xxhash64(col("vec_id")), lit(1L)).as("jk"))
    val qlut = broadcast(queries.select(col("vec_id").as("query_id"),
      pq_lut(col("embedding"), model.cbFlat, model.m, model.nCodes, model.subLen).as("lut"),
      pmod(xxhash64(col("vec_id")), lit(1L)).as("jk2")))
    corpusEnc.join(qlut, col("jk") === col("jk2"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pq_adc(col("codes"), col("lut"), model.nCodes).as("adist"))
  }

  private def packedPq(model: Ann.PqModel, corpus: DataFrame,
      queries: DataFrame, k: Int, rerank: Int = 64): DataFrame = {
    val approx = packedApprox(model, corpus, queries)
    val cand = graft.plans.TopK.perKey(approx, rerank,
      Seq(col("query_id")), Seq(col("adist").asc, col("neighbor_id").asc))
    val cv = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val qv = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(cv, "neighbor_id").join(qv, "query_id")
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
