package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.sketches._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.5).
  *
  * Brute force is the exact baseline: the (small) query set is broadcast
  * and the corpus is scanned once — at 100 TB the corpus never shuffles,
  * and per-partition top-k (TakeOrdered via window on the query key) keeps
  * the result tiny. The LSH variant buckets the corpus by hyperplane-
  * sketch bands so each query only scores its own buckets.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForce(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** IVF (inverted-file) top-k: a coarse quantizer of `nCells` centroids
    * partitions the corpus into cells; each query scores only the
    * `nProbe` cells nearest to it. The scale path for clustered embedding
    * spaces: the corpus is assigned once (one shuffle-free projection —
    * the posting lists would be the stored layout at 100 TB), and query
    * cost drops from |corpus| to ~nProbe/nCells of it.
    *
    * Centroids are exactly `nCells` deterministically-sampled corpus
    * vectors (lowest xxhash64 rank — IVF-flat with sampled centroids);
    * recall is measured against brute force in the spec. The quantizer is
    * GEOMETRY-sized (nCells × dim doubles — KBs, the PQ-codebook
    * discipline), so it collects to the driver and rides the
    * [[graft.functions.sketches.ivf_assign]] kernel as a reference
    * object: cell assignment is ONE codegen'd shuffle-free projection per
    * row — at 100 TB the corpus streams through its scan stage to find
    * its cell, never crossJoined against the centroids or shuffled
    * through a per-key top-1. `lloydRounds` > 0 refines the sampled
    * centroids with k-means rounds before the final assignment: per
    * round, kernel-assign → per-cell mean via posexplode + (cell, pos)
    * aggregation — map-side combine shrinks the shuffle to cells × dim
    * rows per partition, so refinement stays 100 TB-shaped.
    */
  def ivf(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nCells: Int = 16, nProbe: Int = 4, lloydRounds: Int = 0): DataFrame = {
    var (cents, ids, dim) = collectQuantizer(
      corpus.select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
        .orderBy(xxhash64(col("cell_id")).asc, col("cell_id").asc)
        .limit(nCells))
    for (_ <- 1 to lloydRounds) {
      val refined = corpus
        .select(element_at(ivf_assign(col(vecCol), cents, ids, dim, 1), 1).as("cell_id"),
          posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cell_id", "pos").agg(avg(col("v")).as("m"))
        .groupBy("cell_id").agg(
          transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m").cast("float")).as("centroid"))
      val t = collectQuantizer(refined)
      cents = t._1; ids = t._2
    }
    val corpusCells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      explode(ivf_assign(col(vecCol), cents, ids, dim, 1)).as("cell_id"))
    val queryCells = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(ivf_assign(col(vecCol), cents, ids, dim, nProbe)).as("cell_id"))
    // same shuffle-slimming as [[lsh]]: score on the (broadcast) cell
    // join, then dedup pairs as a (query_id, neighbor_id, cos) aggregate
    // — the exchange never carries the float vectors
    val cand = corpusCells.join(broadcast(queryCells), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Collect a (cell_id, centroid) quantizer frame to flat driver arrays
    * — GEOMETRY-sized (nCells × dim doubles), the same bounded-collect
    * discipline as [[pqCodebook]]'s training sample. Row order is
    * normalized by cell id; selection order never depends on it.
    */
  private def collectQuantizer(df: DataFrame): (Array[Double], Array[Long], Int) = {
    val rows = df.select(col("cell_id").cast("long"), col("centroid"))
      .collect().sortBy(_.getLong(0))
    require(rows.nonEmpty, "IVF needs a non-empty corpus")
    val dim = rows.head.getSeq[Number](1).length
    val cents = new Array[Double](rows.length * dim)
    val ids = new Array[Long](rows.length)
    for ((r, c) <- rows.zipWithIndex) {
      ids(c) = r.getLong(0)
      val v = r.getSeq[Number](1)
      require(v.length == dim, s"centroid dim mismatch: ${v.length} vs $dim")
      var j = 0
      while (j < dim) { cents(c * dim + j) = v(j).doubleValue(); j += 1 }
    }
    (cents, ids, dim)
  }

  /** PQ (product-quantization) top-k with exact re-ranking — the
    * compressed-domain scale path: each corpus vector is stored as `m`
    * byte codes (one per subspace, ≤256 centroids each), so the scoring
    * pass reads m bytes per vector instead of the full float payload —
    * a 32-128× smaller working set at 100 TB, where the codes table fits
    * in memory tiers the raw vectors never could.
    *
    * Shape: vectors are unit-normalized (L2 order on unit vectors ==
    * cosine order), each is sliced into `m` subvectors, and a FIXED-size
    * codebook (`ksub` hash-rank-sampled rows per subspace — sampled
    * quantizer, like [[ivf]]'s centroids) assigns every (vector, sub) its
    * nearest centroid in one codegen'd kernel pass. Queries never touch
    * the corpus vectors during scoring: each query precomputes an
    * (m × ksub) distance LUT against the codebook (asymmetric distance
    * computation), the LUT broadcasts, and the approximate distance is
    * one equality join codes⋈LUT on (sub, code) + a map-side-combined
    * sum — no per-pair float math. The top `rerank` candidates per query
    * then
    * re-rank with the exact cosine on the true vectors, which restores
    * recall lost to quantization. Rows-only; recall vs [[bruteForce]]
    * asserted in the spec.
    */
  /** Driver-built PQ codebook: (flat array for the native kernels laid
    * out [(sub*nCodes + code)*subLen + d], nCodes, subLen). GEOMETRY-
    * sized (m × ksub × subLen doubles — KBs, like Bloom's filter words),
    * so it collects to the driver and rides every expression as a
    * reference object: encoding is a per-row map, never a corpus × ksub
    * join — the only scale-correct shape, since at 100 TB the encode
    * pass must stream the corpus exactly once, shuffle-free.
    */
  private def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, lloydRounds: Int = 0,
      trainSample: Int = 1024): (Array[Double], Int, Int) = {
    require(ksub <= 256, "PQ codes are byte-sized: ksub must be <= 256")
    // with refinement, train on a LARGER (still bounded) sample: k-means
    // over ksub points alone can only reproduce them
    val sampleN = if (lloydRounds > 0) math.max(ksub, trainSample) else ksub
    val sample: Array[Array[Double]] = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
    require(sample.nonEmpty, "PQ needs a non-empty corpus")
    val dim = sample.head.length
    val subLen = (dim + m - 1) / m
    def unitArr(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val unit = sample.map(unitArr)
    val nCodes = math.min(ksub, unit.length)
    // per-sub training views (zero-padded tail like the kernels read it)
    def subOf(v: Array[Double], s: Int): Array[Double] = {
      val out = new Array[Double](subLen)
      var j = 0
      while (j < subLen && s * subLen + j < dim) { out(j) = v(s * subLen + j); j += 1 }
      out
    }
    // init: hash-rank sample rows; optional Lloyd rounds PER SUBSPACE on
    // the driver — the training set is geometry-bounded (trainSample ×
    // dim doubles), so refinement costs no cluster work at any corpus
    // size, exactly how large-scale PQ indexes train (on a sample)
    val cbFlat = new Array[Double](m * nCodes * subLen)
    for (s <- 0 until m) {
      var cents = Array.tabulate(nCodes)(c => subOf(unit(c), s))
      val train = unit.map(subOf(_, s))
      for (_ <- 1 to lloydRounds) {
        val sums = Array.fill(nCodes)(new Array[Double](subLen))
        val counts = new Array[Int](nCodes)
        train.foreach { t =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < nCodes) {
            var d = 0.0; var j = 0
            while (j < subLen) { val x = t(j) - cents(c)(j); d += x * x; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subLen) { sums(best)(j) += t(j); j += 1 }
        }
        cents = Array.tabulate(nCodes)(c =>
          if (counts(c) == 0) cents(c) // empty cell keeps its centroid
          else sums(c).map(_ / counts(c)))
      }
      for (c <- 0 until nCodes)
        System.arraycopy(cents(c), 0, cbFlat, (s * nCodes + c) * subLen, subLen)
    }
    (cbFlat, nCodes, subLen)
  }

  /** Per-query ADC lookup table (query_id, sub, code, pd), broadcast. */
  private def pqLutDf(queries: DataFrame, idCol: String, vecCol: String,
      cbFlat: Array[Double], m: Int, nCodes: Int, subLen: Int): DataFrame =
    broadcast(queries
      .select(col(idCol).as("query_id"),
        posexplode(pq_lut(col(vecCol), cbFlat, m, nCodes, subLen)).as(Seq("idx", "pd")))
      .select(col("query_id"), (col("idx") / nCodes).cast("int").as("sub"),
        pmod(col("idx"), lit(nCodes)).cast("int").as("code"), col("pd")))

  /** Exact-cosine re-rank of an approximate shortlist: keep the `rerank`
    * best per query by approximate distance, join the TRUE vectors back,
    * return the final top-k by exact cosine.
    */
  private def exactRerank(approx: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, rerank: Int,
      idCol: String, vecCol: String): DataFrame = {
    val cand = graft.plans.TopK.perKey(approx, rerank,
      Seq(col("query_id")), Seq(col("adist").asc, col("neighbor_id").asc))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(cv, "neighbor_id").join(qv, "query_id")
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** A trained PQ codebook, frozen and serializable: KB-scale (m × ksub ×
    * subLen doubles), so it broadcasts inside expressions and SURVIVES the
    * batch that trained it — the realistic serving posture, where a
    * long-lived streaming corpus is encoded with a codebook trained once
    * on a historical batch (re-training per micro-batch would make codes
    * from different batches incomparable).
    */
  final case class PqModel(cbFlat: Array[Double], m: Int, nCodes: Int, subLen: Int)

  /** Train a PQ codebook on a (bounded sample of a) corpus — see
    * [[pqCodebook]] for the geometry-bounded training story.
    */
  def trainPq(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", m: Int = 16, ksub: Int = 64,
      lloydRounds: Int = 0): PqModel = {
    val (cbFlat, nCodes, subLen) = pqCodebook(corpus, idCol, vecCol, m, ksub, lloydRounds)
    PqModel(cbFlat, m, nCodes, subLen)
  }

  /** Encode vectors with a FROZEN codebook: one codegen'd projection per
    * row, shuffle-free, batch or streaming alike (the expression is
    * deterministic and stateless, so it runs unchanged inside a
    * micro-batch plan). Output: (id, codes: array<int>) — the stored
    * serving layout's code column.
    */
  def pqEncodeWith(vectors: DataFrame, model: PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol).as("vec_id"),
      pq_encode(col(vecCol), model.cbFlat, model.m, model.nCodes, model.subLen)
        .as("codes"))

  def pq(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      m: Int = 16, ksub: Int = 64, rerank: Int = 64,
      lloydRounds: Int = 0): DataFrame = {
    val (cbFlat, nCodes, subLen) =
      pqCodebook(corpus, idCol, vecCol, m, ksub, lloydRounds)
    // encode: ONE codegen'd projection per row (functions/SketchRuntime
    // .pqEncode) — the corpus streams through in its scan stage,
    // shuffle-free, exactly as a 100 TB encode pass must
    val codes = corpus
      .select(col(idCol).as("neighbor_id"),
        posexplode(pq_encode(col(vecCol), cbFlat, m, nCodes, subLen))
          .as(Seq("sub", "code")))
    // ADC: per-query LUT over the codebook, broadcast; scoring is a code
    // lookup + sum inside ONE fused codegen span (equality join on
    // (sub, code) + map-side partial agg). Flat PQ must pair every
    // (vector, query) regardless of shape — and the packed-codes variant
    // (pq_adc over a nested-loop pair stream, as ivfpq scores) measured
    // 1.7× SLOWER here at sf1 despite 16× fewer rows: Catalyst
    // canonicalizes any cross pairing to BroadcastNestedLoopJoin, whose
    // per-pair JoinedRows cost more than 16 extra fused rows. ivfpq keeps
    // the packed shape because its cell filter thins pairs by equality
    // join BEFORE scoring.
    val lut = pqLutDf(queries, idCol, vecCol, cbFlat, m, nCodes, subLen)
    val approx = codes.join(lut, Seq("sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("pd")).as("adist"))
    exactRerank(approx, corpus, queries, k, rerank, idCol, vecCol)
  }

  /** IVF-PQ top-k — the production ANN serving shape, composing the two
    * scale levers: the IVF coarse quantizer prunes WHICH vectors are
    * scored (each query probes `nProbe` of `nCells` cells), and PQ codes
    * shrink WHAT scoring reads (m bytes per vector, ADC via the
    * broadcast LUT). At 100 TB the stored layout is exactly
    * (cell_id, pq_codes) — this operator's `corpusEnc` — with query cost
    * ~ nProbe/nCells of the corpus in compressed-domain lookups, and the
    * exact re-rank touching only `rerank` true vectors per query.
    * Rows-only; recall vs [[bruteForce]] in the spec.
    */
  def ivfpq(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nCells: Int = 16, nProbe: Int = 4,
      m: Int = 16, ksub: Int = 64, rerank: Int = 64,
      lloydRounds: Int = 0): DataFrame = {
    val (cents, ids, dim) = collectQuantizer(
      corpus.select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
        .orderBy(xxhash64(col("cell_id")).asc, col("cell_id").asc)
        .limit(nCells))
    val (cbFlat, nCodes, subLen) =
      pqCodebook(corpus, idCol, vecCol, m, ksub, lloydRounds)
    // the stored 100 TB layout — one row per vector = (cell, m-byte
    // codes) — materializes in ONE shuffle-free codegen'd projection:
    // both quantizers (coarse cells + PQ codebook) ride as KB-scale
    // reference objects, so the encode pass streams the corpus exactly
    // once, in its scan stage
    val corpusEnc = corpus.select(col(idCol).as("neighbor_id"),
      element_at(ivf_assign(col(vecCol), cents, ids, dim, 1), 1).as("cell_id"),
      pq_encode(col(vecCol), cbFlat, m, nCodes, subLen).as("codes"))
    val queryCells = broadcast(queries.select(col(idCol).as("query_id"),
      explode(ivf_assign(col(vecCol), cents, ids, dim, nProbe)).as("cell_id")))
    val qlut = broadcast(queries.select(col(idCol).as("query_id"),
      pq_lut(col(vecCol), cbFlat, m, nCodes, subLen).as("lut")))
    // candidates = corpus rows in probed cells only (equality join —
    // unprobed cells cost nothing); each surviving pair then scores as
    // ONE pq_adc projection against the query's broadcast LUT array —
    // the codes never explode and nothing aggregates
    val approx = corpusEnc.join(queryCells, "cell_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(qlut, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        pq_adc(col("codes"), col("lut"), nCodes).as("adist"))
    exactRerank(approx, corpus, queries, k, rerank, idCol, vecCol)
  }

  /** SRP-LSH top-k: queries only score corpus vectors sharing at least one
    * sketch band. Approximate — recall measured against [[bruteForce]] in
    * the spec.
    *
    * Band geometry is the recall/pruning dial: for a pair at angle θ each
    * sketch bit agrees with prob 1-θ/π, a band of `bandBits` bits with that
    * prob^bandBits, and recall ≈ 1-(1-p^bits)^bands. The default 16×4
    * favors recall on weakly-clustered corpora (near-random embeddings,
    * neighbor cos ≈ 0.3 → ~0.9 recall); production embedding spaces with
    * neighbor cos ≥ 0.8 should widen to 8×8 for ~100× harder pruning at
    * the same recall. bands*bandBits ≤ 64 (one packed sketch).
    */
  def lsh(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bands: Int = 16, bandBits: Int = 4): DataFrame = {
    require(bands * bandBits <= 64, "band geometry exceeds the 64-bit sketch")
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
          hyperplane_sketch(col(vecCol)).as("sk"))
        .select(col(idAs), col(vecAs),
          explode(array((0 until bands).map(b => struct(lit(b).as("band"),
            shiftrightunsigned(col("sk"), b * bandBits).bitwiseAND(lit(mask)).as("bv"))): _*)).as("bk"))
        .select(col(idAs), col(vecAs), col("bk.band").as("band"), col("bk.bv").as("bv"))
    val cb = banded(corpus, "neighbor_id", "cv")
    val qb = broadcast(banded(queries, "query_id", "qv"))
    // score BEFORE the pair-dedup shuffle: the band join is broadcast (the
    // corpus never shuffles), cosine is ~dim FLOPs, and the one shuffle
    // then carries (query_id, neighbor_id, cos) — tens of bytes per
    // candidate instead of two full float vectors. Map-side combine
    // collapses same-pair hits from different bands before the exchange;
    // MAX over identical scores == the old distinct-then-score.
    val cand = cb.join(qb, Seq("band", "bv"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
