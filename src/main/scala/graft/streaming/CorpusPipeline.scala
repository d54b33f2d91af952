package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Dedup

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
    // native k-gram kernel (r18): value-identical to the former
    // split → filter(size>=k) → transform(slice/concat_ws) chain — see
    // Text.wordNgrams (< k tokens explode to nothing, the old filter)
    docs.select(col("doc_id"),
      explode(Text.wordNgrams(col("text"), k)).as("gram"))

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

  /** Static MinHash-LSH index of a reference corpus, built ONCE at
    * stream start: `bands` = (band, bh, id) block keys, `sigs` =
    * (id, sig). Kept as two tables so the band join never carries the
    * ~1 KB signatures (the batch-side shuffle-width discipline, SURVEY
    * §5) — signatures rejoin per candidate only. Cache both for
    * per-micro-batch reuse.
    */
  final case class NearDupIndex(bands: DataFrame, sigs: DataFrame)

  def nearDupIndex(corpus: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): NearDupIndex = {
    val sigs = graft.operators.Dedup.minhashSignatures(corpus, idCol, textCol)
    NearDupIndex(
      graft.operators.Dedup.bandize(sigs).select("band", "bh", "id"),
      sigs)
  }

  /** Streaming near-duplicate flagging — the ingest-time twin of batch
    * `dedup_minhash_lsh`: arriving documents whose MinHash signature
    * agrees with any indexed document in ≥ `tau` of positions are
    * emitted as (doc_id, dup_id, est_jaccard) quarantine rows. Per
    * micro-batch the work is: one shuffle-free signature projection
    * (codegen'd `minhash_sig`), a stream-static equality join on the
    * LSH band keys (candidates only — never all pairs), a signature
    * rejoin per candidate, and the agreement filter; the one stateful
    * op is the final dedup on the pair key (a pair is emitted once per
    * stream lifetime). The same definition runs batch for the parity
    * spec — batch = "replay everything in one micro-batch".
    */
  def flagNearDup(docs: DataFrame, index: NearDupIndex, tau: Double = 0.7,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val arriving = graft.operators.Dedup.minhashSignatures(docs, idCol, textCol)
    graft.operators.Dedup.bandize(arriving)
      .select(col("id").as("doc_id"), col("sig"), col("band"), col("bh"))
      .join(index.bands.select(col("band"), col("bh"), col("id").as("dup_id")),
        Seq("band", "bh"))
      .filter(col("doc_id") =!= col("dup_id")) // self-match when re-streaming indexed docs
      .join(index.sigs.select(col("id").as("dup_id"), col("sig").as("sig_b")), "dup_id")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / size(col("sig")))
      .filter(col("est_jaccard") >= tau)
      .select("doc_id", "dup_id", "est_jaccard")
      .dropDuplicates("doc_id", "dup_id")
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

  /** Incremental near-dup index maintenance — the append path
    * [[flagNearDup]] lacks: there the reference set is frozen at stream
    * start, so a duplicate of an EARLIER ARRIVAL (not in the static
    * corpus) sails through. This variant, run per epoch (the standard
    * `foreachBatch` shape), (1) flags arrivals against static index ∪
    * absorbed earlier arrivals ∪ the batch itself, then (2) APPENDS the
    * flagged-clean arrivals' band keys and signatures to a parquet side
    * store, so they become reference docs for every later epoch.
    *
    * 100 TB posture: the side store is append-only parquet keyed the same
    * way as the static index — per epoch the work is one signature
    * projection, equality joins on band keys (candidates only), and an
    * O(clean-arrivals) append; nothing is rewritten. The store's file
    * count grows one per epoch per partition — compact it on the same
    * cadence as any streaming sink (ColeCompact-style swap) when epoch
    * counts get large. Within-batch duplicates resolve by id order (the
    * smaller id wins and is absorbed), so replaying a batch cannot flip
    * winners.
    */
  final class IncrementalNearDupIndex(stateDir: String, static0: NearDupIndex,
      tau: Double = 0.7, idCol: String = "doc_id", textCol: String = "text") {

    private def bandsDir = s"$stateDir/bands"
    private def sigsDir = s"$stateDir/sigs"

    private def readOr(spark: org.apache.spark.sql.SparkSession, dir: String,
        like: DataFrame): DataFrame = {
      // ONLY a missing store means "first epoch, nothing absorbed yet".
      // Any other failure (transient filesystem error, corrupt parquet)
      // must propagate: swallowing it would silently empty the reference
      // set for this epoch — duplicates of earlier arrivals would pass
      // unflagged AND re-absorb, poisoning every later epoch.
      val (fs, p) = graft.sources.cole.ColeIO.resolve(dir, spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) like.limit(0)
      else spark.read.parquet(dir)
    }

    /** Candidate pairs (doc_id ⋈ dup_id by shared band key) scored by
      * signature agreement; `leftSigs`/`rightSigs` supply the vectors.
      */
    private def score(cands: DataFrame, leftSigs: DataFrame,
        rightSigs: DataFrame): DataFrame =
      cands
        .join(leftSigs.select(col("id").as("doc_id"), col("sig")), "doc_id")
        .join(rightSigs.select(col("id").as("dup_id"), col("sig").as("sig_b")), "dup_id")
        .withColumn("est_jaccard",
          aggregate(zip_with(col("sig"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / size(col("sig")))
        .filter(col("est_jaccard") >= tau)
        .select("doc_id", "dup_id", "est_jaccard")

    /** Process one epoch: returns the flagged (doc_id, dup_id,
      * est_jaccard) rows and absorbs the clean arrivals. Call from
      * `foreachBatch` (or directly over batch frames in tests — batch =
      * replay in one epoch).
      */
    def processBatch(batch: DataFrame): DataFrame = {
      val spark = batch.sparkSession
      val arriving = Dedup.minhashSignatures(batch, idCol, textCol)
        .localCheckpoint(true) // two consumers (flag + absorb): plan once
      val arrBands = Dedup.bandize(arriving).select("band", "bh", "id")
      val refBands = static0.bands.unionByName(
        readOr(spark, bandsDir, static0.bands))
      val refSigs = static0.sigs.unionByName(readOr(spark, sigsDir, static0.sigs))
      // vs the reference set (static corpus + absorbed earlier arrivals)
      val vsRef = score(
        arrBands.select(col("id").as("doc_id"), col("band"), col("bh"))
          .join(refBands.select(col("band"), col("bh"), col("id").as("dup_id")),
            Seq("band", "bh"))
          .filter(col("doc_id") =!= col("dup_id"))
          .select("doc_id", "dup_id").distinct(),
        arriving, refSigs)
      // within the batch: the LARGER id is the duplicate, the smaller the
      // winner (deterministic under replay)
      val within = score(
        arrBands.select(col("id").as("doc_id"), col("band"), col("bh"))
          .join(arrBands.select(col("band"), col("bh"), col("id").as("dup_id")),
            Seq("band", "bh"))
          .filter(col("doc_id") > col("dup_id"))
          .select("doc_id", "dup_id").distinct(),
        arriving, arriving)
      val flagged = vsRef.unionByName(within)
        .dropDuplicates("doc_id", "dup_id")
        .localCheckpoint(true) // consumed twice: returned + anti-joined
      // absorb flagged-clean arrivals into the reference set
      val clean = arriving.join(
        flagged.select(col("doc_id").as("id")).distinct(), Seq("id"), "left_anti")
        .localCheckpoint(true)
      appendEpoch(Dedup.bandize(clean).select("band", "bh", "id"), bandsDir)
      appendEpoch(clean.select("id", "sig"), sigsDir)
      flagged
    }

    /** Land one epoch's rows in the side store torn-read-proof: the
      * epoch writes to a dot-prefixed sibling temp dir (invisible to
      * parquet listings), then each completed part file RENAMES into the
      * store — atomic on a rename-capable fs, so a concurrent reader can
      * never list a file mid-materialization (a plain
      * `mode("append")` exposed 4-byte torn footers to same-box
      * readers). Epoch-unique names keep appends collision-free.
      */
    private def appendEpoch(df: DataFrame, dir: String): Unit = {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val (fs, dst) = graft.sources.cole.ColeIO.resolve(dir, conf)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val tmp = new org.apache.hadoop.fs.Path(
        dst.getParent, s".${dst.getName}_tmp_$tag")
      try {
        df.write.mode("overwrite").parquet(tmp.toString)
        fs.mkdirs(dst)
        fs.listStatus(tmp).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .zipWithIndex.foreach { case (st, i) =>
            fs.rename(st.getPath,
              new org.apache.hadoop.fs.Path(dst, s"epoch_${tag}_$i.parquet"))
          }
      } finally fs.delete(tmp, true)
    }
  }
}
