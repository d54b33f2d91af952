package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.functions.sketches._

/** Deduplication operators over a document table (SURVEY §2.4).
  *
  * Every variant is shuffle-bounded: candidates come from equality joins on
  * block keys (LSH bands / hash bands / sketch bands), never from a cross
  * product, so the plans scale to 100 TB corpora. Hot blocks (e.g. boiler-
  * plate duplicated millions of times) are capped at [[maxBucket]] docs —
  * the standard skew guard for LSH joins — but NOT dropped: every member
  * of a capped bucket is star-paired to the bucket's min id (linear in
  * bucket size instead of n²), and those candidates still pass the exact
  * verification stage (signature agreement / hamming / cosine). A
  * duplicate family bigger than the cap therefore stays one connected
  * component in [[clusters]]; only the redundant intra-family pair
  * enumeration is elided. [[cappedMinhashBuckets]]'s side output makes
  * the rerouting observable at scale.
  */
object Dedup {

  val maxBucket = 64

  /** Shared skew-guard: annotate banded block keys with their bucket size,
    * keep small buckets for the n² self-join, and star-route capped ones
    * (anchor = bucket min id → every other member). One window exchange
    * computes both the count and the anchor.
    */
  private def splitByBucket(banded: DataFrame, keyCols: Seq[String], cap: Int)
      : (DataFrame, DataFrame) = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    val withN = banded
      .withColumn("bucket_n", count(lit(1)).over(w))
      .withColumn("anchor", min(col("id")).over(w))
    val small = withN.filter(col("bucket_n") <= cap)
      .drop("bucket_n", "anchor")
    val starred = withN.filter(col("bucket_n") > cap)
      .filter(col("id") =!= col("anchor"))
      .select(col("anchor").as("id_a"), col("id").as("id_b"))
    (small, starred)
  }

  /** Exact dedup: md5-of-normalized-text identity; keeper = min doc id.
    * One shuffle (window by fingerprint).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .withColumn("keep", col(idCol) === min(col(idCol)).over(w))
  }

  /** MinHash signatures per doc: (id, sig array<long>). One projection —
    * the signature is computed in a single pass per row (custom Catalyst
    * expression), so no per-permutation UDF storm.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, perms: Int = 128): DataFrame =
    docs.select(col(idCol).as("id"),
      minhash_sig(Text.shingleHashes(col(textCol), k), perms).as("sig"))

  /** LSH banding: explode each signature into (band, band_hash) block keys.
    * Band keys come from a native one-pass expression — the interpreted
    * HOF formulation (slice→cast-to-string→concat→hash per band) cold-ran
    * ~20× slower on its first evaluation.
    */
  def bandize(sigs: DataFrame, bands: Int = 32, rows: Int = 4): DataFrame =
    sigs.select(col("id"), col("sig"),
        posexplode(band_hashes(col("sig"), bands, rows)).as(Seq("band", "bh")))

  /** Candidate pairs from LSH buckets: equality self-join on (band, bh),
    * skew-capped, deduplicated. Estimated Jaccard = fraction of equal
    * signature positions.
    */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol)
    // Drop the 1 KB signature BEFORE the band shuffle: the bucket window +
    // self-join move only (id, band, bh) — signatures rejoin per candidate
    // pair afterwards. Carrying sig through the banding shuffle multiplies
    // shuffle volume by bands × sigBytes (~32 KB/doc).
    val (banded, starred) = splitByBucket(
      bandize(sigs).select("id", "band", "bh"), Seq("band", "bh"), maxBucket)
    val a = banded.select(col("id").as("id_a"), col("band"), col("bh"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("bh"))
    val pairs = a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").unionAll(starred).distinct()
    val sigA = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sigB = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    pairs.join(sigA, "id_a").join(sigB, "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / size(col("sig_a")))
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Side output: LSH block keys whose bucket exceeded the skew cap, with
    * member counts. Run alongside a candidate query so a 100 TB job can
    * see exactly which (band, bucket) keys were star-routed and how many
    * members each had — the aggregate replaces pair-level accounting that
    * the cap elides.
    */
  def cappedMinhashBuckets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bandize(minhashSignatures(docs, idCol, textCol)).select("id", "band", "bh")
      .groupBy("band", "bh").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Exact n-gram Jaccard, verified only on LSH candidates (never all
    * pairs): |A∩B| / |A∪B| over distinct shingle-hash sets.
    */
  def ngramJaccard(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3): DataFrame = {
    val cand = minhashCandidates(docs, idCol, textCol).select("id_a", "id_b")
    val sh = docs.select(col(idCol).as("id"), Text.shingleHashes(col(textCol), k).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, blocked on four 16-bit
    * bands (hamming ≤ 3 guarantees at least one equal band), verified with
    * bit_count.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
      simhash64(Text.tokens(col(textCol))).as("sh"))
    val (banded, starred) = splitByBucket(
      hashed.select(col("id"), col("sh"),
          explode(array((0 until 4).map(b => struct(lit(b).as("band"),
            shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL)).as("bv"))): _*)).as("bk"))
        .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.bv").as("bv")),
      Seq("band", "bv"), maxBucket)
    val a = banded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("band"), col("bv"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("band"), col("bv"))
    val joined = a.join(b, Seq("band", "bv")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
    // star pairs rejoin the (small) fingerprint table for verification
    val starPairs = starred
      .join(hashed.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(hashed.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select("id_a", "id_b", "sh_a", "sh_b")
    joined.unionAll(starPairs)
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: SRP-LSH blocking (eight 8-bit bands of a
    * 64-bit hyperplane sketch), cosine-verified within blocks.
    */
  def embeddingPairs(embs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", minCosine: Double = 0.95): DataFrame = {
    val sk = embs.select(col(idCol).as("id"),
      hyperplane_sketch(col(vecCol)).as("sk"))
    // Band shuffle carries only (id, band, bv); vectors rejoin per
    // candidate pair for the cosine check — not through the banding.
    val (banded, starred) = splitByBucket(
      sk.select(col("id"),
          explode(array((0 until 8).map(b => struct(lit(b).as("band"),
            shiftrightunsigned(col("sk"), b * 8).bitwiseAND(lit(0xffL)).as("bv"))): _*)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bv").as("bv")),
      Seq("band", "bv"), maxBucket * 4)
    val a = banded.select(col("id").as("id_a"), col("band"), col("bv"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("bv"))
    val pairs = a.join(b, Seq("band", "bv")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").unionAll(starred).distinct()
    val vA = embs.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val vB = embs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    pairs.join(vA, "id_a").join(vB, "id_b")
      .withColumn("cos", cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCosine)
      .select("id_a", "id_b", "cos")
  }

  /** Duplicate clusters from a pair table: connected components by
    * iterative min-label propagation with pointer jumping. Each round is
    * (1) neighbor-min over the edges and (2) a path-compression hop
    * through the current labels (label := label(label)), so convergence
    * is O(log diameter) — a 1000-node chain settles in ~10 rounds, and
    * near-dup cliques in 2-3. Two shuffles per round; `localCheckpoint`
    * cuts lineage so the plan doesn't grow exponentially.
    * Returns (id, cluster_id = min id reachable).
    */
  def clusters(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // label init = min(id, min direct neighbor): the same single shuffle
    // the plain distinct-ids init paid (map-side combine on the symmetric
    // edge list), but the first neighbor-min round comes for free — pair-
    // and clique-shaped duplicate graphs (the near-dup steady state)
    // start AT the fixpoint and chains start one hop closer. Fixpoint
    // unchanged: init is ≥ the final label (min reachable id), ≤ id, and
    // the loop only ever lowers labels.
    var labels = edges.groupBy(col("dst").as("id"))
      .agg(min(col("src")).as("nbr_min"))
      .select(col("id"), least(col("id"), col("nbr_min")).as("cluster_id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val propagated = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"), col("cluster_id").as("old"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      // pointer jump: follow the label one hop (label of my label) — the
      // path-halving step that makes chains converge logarithmically.
      val hop = propagated
        .select(col("id").as("jid"), col("cluster_id").as("jlabel"))
      // the changed count rides an `observe` metric (CollectMetrics), so
      // the eager checkpoint's materialization job IS the convergence
      // count — one job per round instead of checkpoint + count (r18;
      // the r17 lazy-checkpoint experiment that merged them the other
      // way round was a wash and stayed reverted)
      val observed = propagated
        .join(hop, propagated("cluster_id") === hop("jid"), "left_outer")
        .select(propagated("id"), propagated("old"),
          least(propagated("cluster_id"),
            coalesce(col("jlabel"), propagated("cluster_id"))).as("cluster_id"))
        .select(col("id"), col("cluster_id"),
          (col("cluster_id") =!= col("old")).as("chg"))
        .observe(s"dedup_conv_$iter",
          sum(when(col("chg"), 1L).otherwise(0L)).as("changed"))
      val next = observed.localCheckpoint()
      changed = observed.queryExecution.observedMetrics.get(s"dedup_conv_$iter")
        .map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
        // defensive: if the metric did not surface (never seen), fall
        // back to the pre-r18 explicit count over the checkpoint
        .getOrElse(next.filter(col("chg")).count())
      labels = next.select("id", "cluster_id")
      iter += 1
    }
    labels
  }

  /** Per-doc roll-up of a pair table: every input doc appears once, with
    * its candidate-neighbor count and best score (0 when none) — a stable,
    * never-empty dedup report shape.
    */
  def perDocReport(docs: DataFrame, pairs: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val fwd = pairs.select(col("id_a").as("id"), col(scoreCol).as("s"))
    val rev = pairs.select(col("id_b").as("id"), col(scoreCol).as("s"))
    val perDoc = fwd.unionAll(rev).groupBy("id")
      .agg(count(lit(1)).as("n_candidates"), max(col("s")).as("best_score"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("best_score"), lit(0.0)).as("best_score"))
  }
}
