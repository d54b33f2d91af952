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

  /** Word k-grams of the normalized text, exploded one row per gram —
    * the shared shape of batch (#89 corpus_decontaminate) and streaming
    * contamination checks.
    */
  def grams(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"), split(Text.normalize(col("text")), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - (k - 1)),
        i => concat_ws(" ", slice(col("t"), i, lit(k))))).as("gram"))

  /** Streaming contamination flagging: arriving documents sharing any
    * word k-gram with a STATIC eval gram set are emitted (once, stateful
    * dedup on doc_id) to a quarantine sink. Stream-static LEFT SEMI is
    * the supported join shape here — the static side broadcasts per
    * micro-batch; the stream never buffers it as state.
    */
  def flagContaminated(docs: DataFrame, evalGrams: DataFrame, k: Int = 3): DataFrame =
    grams(docs, k)
      .join(evalGrams.select(col("gram")), Seq("gram"), "left_semi")
      .select("doc_id")
      .dropDuplicates("doc_id")

  /** [[flagContaminated]] behind a Bloom prefilter: the static eval-gram
    * set is sketched ONCE at stream start (`graft.operators.Bloom` —
    * geometry-sized, probed by codegen'd built-ins), and every arriving
    * micro-batch probes the sketch BEFORE the stream-static semi join, so
    * the per-batch join work scales with the contaminated sliver, not the
    * batch's full gram stream. Same output as [[flagContaminated]] — the
    * exact join clears bloom false positives — parity-spec'd.
    */
  def flagContaminatedBloom(docs: DataFrame, evalGrams: DataFrame,
      k: Int = 3, numBits: Int = 1 << 17): DataFrame = {
    val bits = graft.operators.Bloom.build(
      evalGrams.select(col("gram")), col("gram"), numBits)
    grams(docs, k)
      .filter(graft.operators.Bloom.mightContain(bits, col("gram")))
      .join(evalGrams.select(col("gram")), Seq("gram"), "left_semi")
      .select("doc_id")
      .dropDuplicates("doc_id")
  }

  /** Streaming ANN ingest: encode ARRIVING embedding rows with a PQ
    * codebook trained ONCE on a historical batch
    * (`graft.operators.Ann.trainPq`) and frozen. The model is KB-scale
    * and rides the codegen'd `pq_encode` expression, so each micro-batch
    * encodes shuffle-free — and, critically, codes from every batch live
    * in the SAME code space as the batch-built index (re-training per
    * batch would silently break ADC comparability). Parity with the
    * batch encode of identical rows is spec'd.
    */
  def encodeArrivals(vectors: DataFrame, model: graft.operators.Ann.PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    graft.operators.Ann.pqEncodeWith(vectors, model, idCol, vecCol)

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
