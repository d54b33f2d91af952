package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

final case class Doc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

final case class Vec(vec_id: Long, embedding: Seq[Double])

/** Streaming corpus curation parity: the same documents replayed in
  * micro-batches must admit exactly the docs the batch pipeline admits —
  * including dropping a duplicate that arrives in a LATER micro-batch
  * than its original (the stateful-dedup case batch can't distinguish).
  */
class CorpusPipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def docs(): Seq[Doc] = {
    val s = spark
    import s.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .as[Doc].collect().toSeq.sortBy(_.doc_id)
  }

  test("streaming curate over micro-batches == batch curate") {
    val s = spark
    import s.implicits._
    val all = docs()
    // inject cross-batch duplicates: re-send the first 10 docs at the end
    // with new ids (same text -> same fingerprint -> must be dropped)
    val dupes = all.take(10).map(d => d.copy(doc_id = d.doc_id + 1000000))
    val source = MemoryStream[Doc](spark)
    val q = CorpusPipeline.curate(source.toDF())
      .writeStream.format("memory").queryName("corpus_curated")
      .outputMode(OutputMode.Append).start()
    (all.grouped(all.size / 3 + 1).toSeq :+ dupes).foreach { batch =>
      source.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("corpus_curated")
      .select("doc_id", "fp").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val batchTwin = CorpusPipeline.curate(all.toDF())
      .select("doc_id", "fp").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // same fingerprints admitted, none of the late duplicates survived
    assert(streamed.map(_._2).sorted.toSeq === batchTwin.map(_._2).sorted.toSeq)
    assert(streamed.forall(_._1 < 1000000L),
      "a late-arriving duplicate was admitted past stateful dedup")
    assert(streamed.length === streamed.map(_._2).distinct.length)
  }

  test("stream-static contamination flagging == batch gram overlap") {
    val s = spark
    import s.implicits._
    val all = docs()
    // static eval gram set: the held-out doc_id % 97 == 0 slice
    val evalDocs = all.filter(_.doc_id % 97 == 0)
    val evalGrams = CorpusPipeline.grams(evalDocs.toDF()).select("gram").distinct()
    val train = all.filter(_.doc_id % 97 != 0)

    val source = MemoryStream[Doc](spark)
    val q = CorpusPipeline.flagContaminated(source.toDF(), evalGrams)
      .writeStream.format("memory").queryName("tainted_stream")
      .outputMode(OutputMode.Append).start()
    train.grouped(train.size / 3 + 1).foreach { batch =>
      source.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("tainted_stream")
      .collect().map(_.getLong(0)).toSet

    val batchTainted = CorpusPipeline.grams(train.toDF())
      .join(evalGrams, "gram").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet

    assert(streamed === batchTainted)
    assert(streamed.nonEmpty, "expected some contaminated docs at this SF")
  }

  test("bloom-prefiltered streaming decontamination == exact flagging") {
    val s = spark
    import s.implicits._
    val all = docs()
    val evalDocs = all.filter(_.doc_id % 97 == 0)
    val evalGrams = CorpusPipeline.grams(evalDocs.toDF()).select("gram").distinct()
    val train = all.filter(_.doc_id % 97 != 0)

    val source = MemoryStream[Doc](spark)
    val q = CorpusPipeline.flagContaminatedBloom(source.toDF(), evalGrams)
      .writeStream.format("memory").queryName("tainted_bloom_stream")
      .outputMode(OutputMode.Append).start()
    train.grouped(train.size / 3 + 1).foreach { batch =>
      source.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("tainted_bloom_stream")
      .collect().map(_.getLong(0)).toSet

    val batchTainted = CorpusPipeline.grams(train.toDF())
      .join(evalGrams, "gram").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet

    // bloom false positives are cleared by the exact join: same answer
    assert(streamed === batchTainted)
    assert(streamed.nonEmpty, "expected some contaminated docs at this SF")
  }

  test("streaming near-dup flagging vs a static MinHash index == batch LSH") {
    val s = spark
    import s.implicits._
    val all = docs()
    // static reference corpus: the doc_id % 3 == 0 slice, indexed once
    val corpus = all.filter(_.doc_id % 3 == 0)
    val index = CorpusPipeline.nearDupIndex(corpus.toDF())
    index.bands.cache(); index.sigs.cache()

    // arriving stream: the rest, plus injected near-dups of indexed docs —
    // exact copies (est 1.0) and one-word-appended mutations (high est)
    val rest = all.filter(_.doc_id % 3 != 0)
    val copies = corpus.take(5).map(d => d.copy(doc_id = d.doc_id + 2000000))
    val mutated = corpus.slice(5, 10)
      .map(d => d.copy(doc_id = d.doc_id + 3000000, text = d.text + " appended"))
    val arriving = rest ++ copies ++ mutated

    val tau = 0.6
    val source = MemoryStream[Doc](spark)
    val q = CorpusPipeline.flagNearDup(source.toDF(), index, tau)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode(OutputMode.Append).start()
    arriving.grouped(arriving.size / 3 + 1).foreach { batch =>
      source.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("neardup_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch twin: same definition over the whole arrival set at once
    val batchTwin = CorpusPipeline.flagNearDup(arriving.toDF(), index, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batchTwin)

    // every injected exact copy is flagged against its source doc
    copies.foreach { d =>
      assert(streamed.contains((d.doc_id, d.doc_id - 2000000)),
        s"exact copy ${d.doc_id} not flagged")
    }
    // mutations keep most shingles: all should surface as near-dups
    mutated.foreach { d =>
      assert(streamed.contains((d.doc_id, d.doc_id - 3000000)),
        s"mutated near-dup ${d.doc_id} not flagged")
    }
    // est_jaccard of an exact copy is 1.0
    val exactEst = spark.table("neardup_stream")
      .filter(col("doc_id") === copies.head.doc_id &&
        col("dup_id") === copies.head.doc_id - 2000000)
      .head().getDouble(2)
    assert(exactEst === 1.0)

    // a re-sent pair is emitted once per stream lifetime (stateful dedup):
    // replay the copies and confirm no duplicate quarantine rows appear
    val before = spark.table("neardup_stream").count()
    // (fresh query name per start; reuse the stopped one's checkpointless
    // memory sink is not possible, so assert in-run instead: the 3
    // micro-batches above already re-banded overlapping docs and the
    // pair set equals the batch twin's distinct pairs)
    assert(before === streamed.size.toLong,
      "duplicate (doc_id, dup_id) rows in the quarantine stream")
    index.bands.unpersist(); index.sigs.unpersist()
  }

  test("incremental index: a duplicate of an EARLIER ARRIVAL is flagged") {
    val s = spark
    import s.implicits._
    val all = docs()
    // small static corpus; the interesting docs are NOT in it
    val corpus = all.filter(_.doc_id % 7 == 0)
    val static0 = CorpusPipeline.nearDupIndex(corpus.toDF())
    static0.bands.cache(); static0.sigs.cache()
    val stateDir = java.nio.file.Files.createTempDirectory("neardup_inc").toString
    val idx = new CorpusPipeline.IncrementalNearDupIndex(stateDir, static0, 0.6)

    // epoch 1: novel docs arrive clean — SYNTHESIZED with disjoint
    // shingle sets (the documents table itself contains genuine near-dups,
    // so sampling it can't guarantee novelty)
    val novel = (0 until 8).map(i => Doc(9000000L + i,
      s"entirely novel synthetic document $i " +
        (0 until 40).map(j => s"tok${i}x$j").mkString(" "),
      "en", "synth", 300L))
    val f1 = idx.processBatch(novel.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f1.isEmpty, s"novel docs must arrive clean, got $f1")

    // epoch 2: near-dups OF THOSE EARLIER ARRIVALS (frozen flagNearDup
    // misses these by construction) + one dup of the static corpus
    val copyOfEarlier = novel.take(2).map(d => d.copy(doc_id = d.doc_id + 5000000))
    val mutOfEarlier = novel.slice(2, 4)
      .map(d => d.copy(doc_id = d.doc_id + 6000000, text = d.text + " tail"))
    val copyOfStatic = corpus.take(1).map(d => d.copy(doc_id = d.doc_id + 7000000))
    val f2 = idx.processBatch((copyOfEarlier ++ mutOfEarlier ++ copyOfStatic).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    copyOfEarlier.foreach(d => assert(f2.contains((d.doc_id, d.doc_id - 5000000)),
      s"exact copy of earlier arrival ${d.doc_id} not flagged"))
    mutOfEarlier.foreach(d => assert(f2.contains((d.doc_id, d.doc_id - 6000000)),
      s"mutated near-dup of earlier arrival ${d.doc_id} not flagged"))
    copyOfStatic.foreach(d => assert(f2.contains((d.doc_id, d.doc_id - 7000000)),
      s"static-corpus dup ${d.doc_id} not flagged"))

    // epoch 3: a copy of an epoch-2 FLAGGED doc must match the absorbed
    // WINNER, not the flagged duplicate (dups are never absorbed)
    val copyAgain = copyOfEarlier.take(1)
      .map(d => d.copy(doc_id = d.doc_id + 1000000))
    val f3 = idx.processBatch(copyAgain.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val origId = copyOfEarlier.head.doc_id - 5000000 // the absorbed winner
    assert(f3.contains((copyAgain.head.doc_id, origId)),
      s"epoch-3 copy must flag against the absorbed original $origId, got $f3")
    assert(!f3.exists(_._2 == copyOfEarlier.head.doc_id),
      "a flagged duplicate must not have been absorbed as a reference doc")

    // within-batch duplicates: larger id flags against smaller, winner
    // absorbed — a later copy then matches the winner
    val pairBase = Doc(8000000L, "twin base document " +
      (0 until 40).map(j => s"pair${j}q$j").mkString(" "), "en", "synth", 300L)
    val twinA = pairBase.copy(doc_id = 8000001)
    val twinB = pairBase.copy(doc_id = 8000002)
    val f4 = idx.processBatch(Seq(twinA, twinB).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f4.contains((8000002L, 8000001L)),
      s"within-batch dup must flag larger-vs-smaller id, got $f4")
    val f5 = idx.processBatch(Seq(pairBase.copy(doc_id = 8000003)).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f5.contains((8000003L, 8000001L)),
      s"later copy must flag against the absorbed within-batch winner, got $f5")

    // a CORRUPT side store must fail the epoch loudly, never silently
    // empty the reference set (a swallowed read error would let dups of
    // earlier arrivals pass unflagged AND re-absorb)
    val bandsDir = new java.io.File(s"$stateDir/bands")
    assert(bandsDir.isDirectory, "side store expected after absorption")
    val parquets = bandsDir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquets.nonEmpty)
    parquets.foreach { f =>
      java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
    }
    intercept[Exception] {
      idx.processBatch(Seq(pairBase.copy(doc_id = 8000004)).toDF()).collect()
    }
    static0.bands.unpersist(); static0.sigs.unpersist()
  }

  test("streaming PQ encode with a frozen codebook == batch encode") {
    val s = spark
    import s.implicits._
    val corpus = graft.Tables.embeddings(spark, sfDir)
    // codebook trained ONCE on the historical batch, then frozen
    val model = graft.operators.Ann.trainPq(corpus, m = 8, ksub = 32,
      lloydRounds = 2)
    val arriving = corpus.limit(300).collect().map(r =>
      Vec(r.getLong(0), r.getSeq[Number](1).map(_.doubleValue()))).toSeq

    val source = MemoryStream[Vec](spark)
    val q = CorpusPipeline.encodeArrivals(source.toDF(), model)
      .writeStream.format("memory").queryName("pq_arrivals")
      .outputMode(OutputMode.Append).start()
    arriving.grouped(arriving.size / 3 + 1).foreach { batch =>
      source.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("pq_arrivals").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap

    val batchTwin = graft.operators.Ann
      .pqEncodeWith(arriving.toDF(), model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap

    // identical codes per vector: every micro-batch lives in the SAME
    // code space as the batch-built index
    assert(streamed.size === arriving.size)
    assert(streamed === batchTwin)
  }
}
