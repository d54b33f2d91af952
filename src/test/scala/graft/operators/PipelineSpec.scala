package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.functions.Text

/** Semantic checks for the approximate pipeline operators — the parts the
  * DuckDB oracle can't express (sketches, recall, accuracy) get quantified
  * assertions against exact baselines here.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)
  private def embs = Tables.embeddings(spark, sfDir)

  test("ann_lsh recall@5 vs brute force >= 0.6") {
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val exact = Ann.bruteForce(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lsh(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall@5 = $recall")
  }

  test("ann_ivf recall@5 vs brute force is substantial and beats random") {
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val exact = Ann.bruteForce(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.ivf(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // The deterministic sampler yields ~31 cells on this corpus, so
    // nProbe=4 scans ~13% of it — random subsetting would give ~0.13
    // recall. IVF must do several times better on near vectors.
    assert(recall >= 0.3, s"IVF recall@5 = $recall")

    // Lloyd refinement must not degrade recall (centroids move toward
    // cluster means, so cells align better with the data)
    val refined = Ann.ivf(embs, queries, k = 5, lloydRounds = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refinedRecall = (exact & refined).size.toDouble / exact.size
    assert(refinedRecall >= recall - 0.05,
      s"Lloyd rounds regressed recall: $refinedRecall < $recall")
  }

  test("ann_pq recall@5 vs brute force >= 0.8; rerank dial trades recall") {
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val exact = Ann.bruteForce(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.pq(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact re-rank restores most recall lost to quantization: the
    // PQ shortlist (rerank=64 of ~500 vectors here) must contain nearly
    // all true top-5 neighbors (defaults simulate to recall 1.0 on this
    // corpus; 0.8 leaves margin for sampler differences)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall@5 = $recall")
    // a shortlist the size of k itself (no slack for quantization error)
    // must do worse or equal — the rerank dial is monotone
    val tight = Ann.pq(embs, queries, k = 5, rerank = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tightRecall = (exact & tight).size.toDouble / exact.size
    assert(tightRecall <= recall + 1e-9,
      s"shrinking the shortlist cannot raise recall: $tightRecall > $recall")
    // Lloyd refinement (driver-side k-means on the bounded training
    // sample) must not degrade recall — centroids move toward the data
    val refined = Ann.pq(embs, queries, k = 5, lloydRounds = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refinedRecall = (exact & refined).size.toDouble / exact.size
    assert(refinedRecall >= recall - 0.05,
      s"Lloyd rounds regressed PQ recall: $refinedRecall < $recall")
  }

  test("ann_ivfpq recall tracks ivf's cell pruning and beats random probing") {
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val exact = Ann.bruteForce(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.ivfpq(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // nProbe=4 of ~16 cells scans ~25% of the corpus; random subsetting
    // would land ~0.25 recall. The PQ shortlist inside probed cells is
    // near-lossless (see ann_pq), so recall ≈ IVF's cell recall, which
    // must beat random by a wide margin.
    assert(recall >= 0.3, s"IVF-PQ recall@5 = $recall")
    // probing every cell must recover (almost) full PQ recall — the
    // nProbe dial trades recall for pruning
    val full = Ann.ivfpq(embs, queries, k = 5, nProbe = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullRecall = (exact & full).size.toDouble / exact.size
    assert(fullRecall >= 0.8, s"all-cells IVF-PQ recall@5 = $fullRecall")
  }

  test("clusters == union-find over the same LSH candidate pairs") {
    val pairs = Dedup.minhashCandidates(docs)
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no candidate pairs at sf0.001 — threshold too high")
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val pairsDf = {
      val s = spark
      import s.implicits._
      pairs.toSeq.toDF("id_a", "id_b")
    }
    val got = Dedup.clusters(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("clusters converges on the shapes the radius-1 label init targets") {
    // pins the r18 init (label := min(id, min direct neighbor)): pairs and
    // cliques start AT the fixpoint, and a long path still converges to
    // its global min through pointer jumping — same fixpoint as id-init
    val s = spark
    import s.implicits._
    val pair = Seq((1L, 2L), (3L, 4L))
    val clique = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val path = (20L until 51L).map(i => (i, i + 1)) // 31-edge chain
    val star = (61L to 70L).map(i => (60L, i)) // capped-bucket star shape
    val all = (pair ++ clique ++ path ++ star).toDF("id_a", "id_b")
    val got = Dedup.clusters(all).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want =
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L) ++
        Seq(10L, 11L, 12L).map(_ -> 10L) ++
        (20L to 51L).map(_ -> 20L) ++
        (60L to 70L).map(_ -> 60L)
    assert(got == want)
  }

  test("langid identifies stopword-bearing text per supported language") {
    // The synthetic corpus draws one shared vocabulary for every `lang`
    // label, so no content-based detector can recover that column; the
    // accuracy check instead uses texts with real language signal.
    val s = spark
    import s.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it is a story of the house"),
      ("de", "der hund ist nicht in das haus und die katze ist mit auf"),
      ("es", "el perro y la casa de que un gato en por con los campos"),
      ("fr", "le chien est dans la maison et les chats une des que"),
      ("zh", "的 是 在 了 和 有 我 不 这 个")).toDF("expected", "text")
    val (lang, hits) = Text.langid(col("text"))
    val wrong = samples.select(col("expected"), lang.as("pred"), hits.as("hits"))
      .filter(col("expected") =!= col("pred")).collect()
    assert(wrong.isEmpty, s"mispredicted: ${wrong.mkString(", ")}")
    // corpus behavior: deterministic and always within the supported set
    val (l1, _) = Text.langid(col("text"))
    val preds = docs.select(l1.as("p")).distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Text.stopwords.keySet))
  }

  test("minhash est_jaccard tracks exact ngram jaccard on candidates") {
    val est = Dedup.minhashCandidates(docs)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
    val exact = Dedup.ngramJaccard(docs)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val joined = est.join(exact, Seq("id_a", "id_b")).collect()
    assert(joined.nonEmpty, "LSH produced no candidate pairs on sf0.001")
    val mae = joined.map(r =>
      math.abs(r.getAs[Double]("est_jaccard") - r.getAs[Double]("jaccard"))).sum / joined.length
    assert(mae <= 0.15, s"MinHash estimate MAE = $mae over ${joined.length} pairs")
  }

  test("exact dedup keeps exactly one doc per fingerprint group") {
    val flagged = Dedup.exact(docs)
    val perGroup = flagged.groupBy("fp")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"))
    assert(perGroup.filter(col("keepers") =!= 1).count() === 0)
    // keeper must be the min doc_id of its group
    val badKeeper = flagged.withColumn("mn",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("keep") && col("doc_id") =!= col("mn"))
    assert(badKeeper.count() === 0)
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    val pairs = Dedup.simhashPairs(docs).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Number]("hamming").longValue <= 3)
    }
  }

  test("embedding near-dup pairs all verify cosine >= threshold") {
    val pairs = Dedup.embeddingPairs(embs, minCosine = 0.9)
    assert(pairs.filter(col("cos") < 0.9).count() === 0)
  }

  test("duplicate family larger than maxBucket survives the skew cap") {
    import spark.implicits._
    // 100 identical docs (one hot LSH bucket per band, 100 > maxBucket=64)
    // plus unique filler. Pre-fix, the cap filter dropped the whole family;
    // now the star path must keep it one connected component.
    val family = (0 until 100).map(i => (i.toLong, "the same boilerplate text repeated verbatim"))
    val filler = (100 until 140).map(i => (i.toLong, s"unique document number $i with its own words ${i * 37}"))
    val df = (family ++ filler).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df)
    val ids = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().as[Long].collect().toSet
    assert((0L until 100L).forall(ids.contains),
      s"family members missing from candidate pairs: ${(0L until 100L).filterNot(ids.contains)}")
    // anchor pairs carry real scores: identical docs estimate jaccard 1.0
    assert(pairs.filter(col("id_a") === 0L).agg(min("est_jaccard")).head().getDouble(0) === 1.0)
    val clusters = Dedup.clusters(pairs.filter(col("est_jaccard") >= 0.8)
      .select("id_a", "id_b"))
    val familyClusters = clusters.filter(col("id") < 100)
      .select("cluster_id").distinct().count()
    assert(familyClusters === 1L, s"family split into $familyClusters clusters")
    // observability: the hot buckets are visible in the side output
    val capped = Dedup.cappedMinhashBuckets(df)
    assert(capped.count() > 0)
    assert(capped.agg(max("bucket_n")).head().getLong(0) === 100L)
  }

  test("simhash + embedding hot buckets also route through the star path") {
    import spark.implicits._
    val family = (0 until 80).map(i => (i.toLong, "identical boilerplate for simhash banding"))
    val df = family.toDF("doc_id", "text")
    val sp = Dedup.simhashPairs(df)
    val spIds = sp.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().count()
    assert(spIds === 80L, s"simhash star path covered $spIds/80 family members")
    assert(sp.agg(max("hamming")).head().getInt(0) === 0)
    // embedding cap is maxBucket*4: need >256 identical vectors
    val vecs = (0 until 300).map(i => (i.toLong, Array.fill(16)(0.5f)))
      .toDF("vec_id", "embedding")
    val ep = Dedup.embeddingPairs(vecs)
    val epIds = ep.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().count()
    assert(epIds === 300L, s"embedding star path covered $epIds/300 vectors")
  }

  test("multimodal features: deterministic, byte-exact, entropy-bounded") {
    val media = Multimodal.withPayload(docs)
    val f1 = Multimodal.extractFeatures(media).toDF()
    val f2 = Multimodal.extractFeatures(media).toDF()
    assert(f1.count() === docs.count())
    assert(f1.exceptAll(f2).count() === 0, "stub decoder is not deterministic")
    // n_bytes must equal the UTF-8 octet length of the source text
    val sizeOk = f1.join(docs, "doc_id")
      .filter(col("n_bytes") =!= octet_length(encode(col("text"), "UTF-8")))
    assert(sizeOk.count() === 0)
    val entBad = f1.filter(col("byte_entropy") < 0 || col("byte_entropy") > 8)
    assert(entBad.count() === 0)
  }

  test("frame sampling: metadata-driven offsets, bounded per-asset cost") {
    val media = Multimodal.withPayload(docs)
    val f1 = Multimodal.sampleFrames(media, nFrames = 4, frameBytes = 64).toDF()
    val f2 = Multimodal.sampleFrames(media, nFrames = 4, frameBytes = 64).toDF()
    assert(f1.exceptAll(f2).count() === 0, "frame sampler is not deterministic")
    // never more than nFrames per asset; short assets yield fewer, and no
    // frame may read past the asset (offset + frameBytes <= n_bytes)
    val perDoc = f1.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(perDoc.filter(col("n") > 4).count() === 0)
    val sized = f1.join(media.select(col("doc_id"), col("meta.n_bytes").as("sz")), "doc_id")
    assert(sized.filter(col("offset") + col("n_bytes") > col("sz")).count() === 0,
      "a frame reads past its asset")
    assert(sized.filter(col("offset") < 0).count() === 0)
    // frames are evenly spaced: first at 0, last ending at the asset end
    // for any asset with >= 2 frames
    val multi = f1.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("offset").as("mn"), max("offset").as("mx"))
      .filter(col("n") >= 2)
      .join(media.select(col("doc_id"), col("meta.n_bytes").as("sz")), "doc_id")
    assert(multi.filter(col("mn") =!= 0).count() === 0)
    assert(multi.filter(col("mx") + 64 =!= col("sz")).count() === 0)
  }

  test("decoder seam: the same pipeline runs unchanged under a swapped decoder") {
    // a second deterministic decoder, defined OUTSIDE the operator — the
    // pluggability a real JNI image/audio decoder would use
    object InvertDecoder extends graft.operators.FrameDecoder {
      override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]] =
        payloads.map(_.map(b => (~b).toByte))
    }
    val media = Multimodal.withPayload(docs)
    val id = Multimodal.extractFeatures(media, graft.operators.IdentityDecoder).toDF()
    val inv = Multimodal.extractFeatures(media, InvertDecoder).toDF()
    // same plumbing invariants under both decoders...
    assert(inv.count() === id.count())
    assert(inv.filter(col("byte_entropy") < 0 || col("byte_entropy") > 8).count() === 0)
    // ...but the decode output really came from the plugged decoder:
    // inversion preserves byte count and (byte) entropy, flips mean
    val j = id.select(col("doc_id"), col("n_bytes").as("nb1"),
        col("mean_byte").as("m1"), col("byte_entropy").as("e1"))
      .join(inv.select(col("doc_id"), col("n_bytes").as("nb2"),
        col("mean_byte").as("m2"), col("byte_entropy").as("e2")), "doc_id")
    assert(j.filter(col("nb1") =!= col("nb2")).count() === 0)
    assert(j.filter(abs(col("e1") - col("e2")) > 1e-9).count() === 0)
    assert(j.filter(abs(col("m1") + col("m2") - 255.0) > 1e-9).count() === 0,
      "inverted bytes must mirror the mean around 255")
    // frame sampling with the swapped decoder keeps its spacing contract
    val frames = Multimodal.sampleFrames(media, nFrames = 4, frameBytes = 64,
      decoder = InvertDecoder).toDF()
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(perDoc.filter(col("n") > 4).count() === 0)
  }
}
