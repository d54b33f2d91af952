package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Streaming corpus curation (SURVEY §2.8): the batch curation gates —
  * quality filter, exact dedup by normalized-text fingerprint, token
  * budget — expressed once and runnable over either a batch DataFrame or
  * a `readStream` of arriving documents.
  *
  * In streaming, `dropDuplicates("fp")` is Spark's stateful
  * deduplication: a document whose fingerprint was already admitted in
  * any earlier micro-batch is dropped, which is exactly the ingest-time
  * semantics a training-corpus pipeline needs (at 100 TB the state store
  * would be RocksDB-backed and the fingerprint is 32 bytes per retained
  * doc — bound it with `withWatermark` + `dropDuplicatesWithinWatermark`
  * when documents carry an arrival time).
  */
object CorpusPipeline {

  /** Quality gate ∘ exact dedup ∘ token count; identical semantics batch
    * and streaming (batch = "replay everything in one micro-batch").
    * `n_chars` is taken from the input when present (the documents table
    * carries it) and derived from the text otherwise, so a bare
    * (doc_id, source, text) stream curates too.
    */
  def curate(docs: DataFrame, minChars: Int = 50, minTokens: Int = 5): DataFrame = {
    val withChars =
      if (docs.columns.contains("n_chars")) docs
      else docs.withColumn("n_chars", length(col("text")).cast("long"))
    withChars
      .withColumn("fp", Text.fingerprint(col("text")))
      .withColumn("n_tokens", Text.tokenCount(col("text")))
      .filter(col("n_chars") >= minChars && col("n_tokens") >= minTokens)
      .dropDuplicates("fp")
      .select("doc_id", "source", "fp", "n_chars", "n_tokens")
  }
}
