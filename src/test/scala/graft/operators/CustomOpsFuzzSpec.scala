package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

/** Randomized differential tests for the custom operators: many seeded
  * datasets, each checked against an independent naive implementation
  * (window formulation for top-k; driver-side O(n²) lookup for as-of).
  */
class CustomOpsFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("TopKPerKey == window row_number across seeded random datasets") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 5) {
      val n = 200 + (mix(seed) & 0x3ff).toInt // 200..1223 rows
      val nKeys = 1 + (mix(seed * 7) & 0x7).toInt // 1..8 keys
      val k = 1 + (mix(seed * 13) & 0x3).toInt // 1..4
      val rows = (0 until n).map { i =>
        (i.toLong, math.floorMod(mix(seed + i), nKeys).toLong,
          (math.floorMod(mix(seed * 31 + i), 1000) / 10.0))
      }
      val df = rows.toDF("id", "key", "score")
      val got = TopK.perKey(df, k, Seq(col("key")),
          Seq(col("score").desc, col("id").asc))
        .select("id").collect().map(_.getLong(0)).toSet
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"seed=$seed n=$n nKeys=$nKeys k=$k")
    }
  }

  test("Dedup.clusters == union-find on random graphs incl. 400-node chains") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 3) {
      val nNodes = 100 + (mix(seed) & 0xff).toInt
      val nEdges = 50 + (mix(seed * 3) & 0x7f).toInt
      val randomEdges = (0 until nEdges).map(i =>
        (math.floorMod(mix(seed + i), nNodes).toLong,
          math.floorMod(mix(seed * 7 + i), nNodes).toLong))
        .filter { case (a, b) => a != b }
      // a long path: the case plain label propagation needs O(n) rounds
      // for and pointer jumping needs O(log n)
      val chain = (1000L until 1400L).sliding(2).map(w => (w(0), w(1))).toSeq
      val edges = randomEdges ++ chain
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      val got = Dedup.clusters(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed nodes=$nNodes edges=${edges.size}")
    }
  }

  test("Asof.joinAsof == naive point-in-time lookup across seeded datasets") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 5) {
      val nL = 50 + (mix(seed) & 0xff).toInt
      val nR = 50 + (mix(seed * 3) & 0xff).toInt
      val nKeys = 1 + (mix(seed * 5) & 0x3).toInt
      def t(x: Long): Timestamp = new Timestamp(1700000000000L + math.floorMod(x, 100000L) * 1000L)
      val left = (0 until nL).map(i =>
        (i.toLong, math.floorMod(mix(seed + i), nKeys).toLong, t(mix(seed * 11 + i))))
      val right = (0 until nR).map(i =>
        (math.floorMod(mix(seed * 17 + i), nKeys).toLong, t(mix(seed * 19 + i)),
          math.floorMod(mix(seed * 23 + i), 1000).toDouble))
      val lDf = left.toDF("event_id", "user_id", "ts")
      val rDf = right.toDF("user_id", "ts", "price")
      val got = Asof.joinAsof(lDf, rDf, "user_id", "ts", Seq("price", "ts"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(3)), Option(r.get(4)))).toMap
      // naive: latest right row (ties: any, but our data has per-key
      // distinct ts since prices differ; guard by asserting ts uniqueness)
      val want = left.map { case (id, key, ts) =>
        val cands = right.filter(r => r._1 == key && !r._2.after(ts))
        if (cands.isEmpty) id -> (None, None)
        else {
          val best = cands.maxBy(_._2.getTime)
          // tie check: all candidates at the max ts must agree on price
          val atMax = cands.filter(_._2.getTime == best._2.getTime)
          assert(atMax.map(_._3).distinct.size == 1 || atMax.size == 1,
            s"ambiguous tie in generated data, seed=$seed")
          id -> (Some(best._3), Some(best._2))
        }
      }.toMap
      assert(got.keySet == want.keySet, s"seed=$seed row coverage")
      for ((id, (wp, wt)) <- want) {
        val (gp, gt) = got(id)
        assert(gp.map(_.asInstanceOf[Double]) == wp && gt == wt,
          s"seed=$seed event=$id: got ($gp,$gt) want ($wp,$wt)")
      }
    }
  }

  test("observe metric surfaces after eager localCheckpoint (Dedup.clusters' one-job round)") {
    // pins the r18 convergence-count mechanic: the CollectMetrics value
    // must be readable from the ORIGINAL dataset's queryExecution after
    // localCheckpoint materializes it — if this ever breaks in a Spark
    // upgrade, Dedup.clusters silently degrades to its fallback count()
    // (correct but one extra job per round), and this test names it
    val s = spark
    import s.implicits._
    val df = (1L to 100L).toDF("id")
      .select(col("id"), (col("id") % 3 === 0).as("chg"))
      .observe("conv_probe",
        sum(when(col("chg"), 1L).otherwise(0L)).as("changed"))
    df.localCheckpoint()
    val got = df.queryExecution.observedMetrics.get("conv_probe")
      .map(_.getLong(0))
    assert(got === Some(33L),
      "observed metric must be readable right after eager localCheckpoint")
  }

  test("space_ngrams == split/slice/concat_ws chain, incl. degenerate inputs") {
    val s = spark
    import s.implicits._
    import graft.functions.{sketches, Text}
    // random space-separated docs plus every degenerate shape the old
    // chain handled: empty, single token, leading/trailing/double spaces
    // (normalize removes them, but the kernel must match split's
    // semantics on RAW strings too), multi-byte UTF-8 tokens
    val words = Array("the", "quick", "brown", "fox", "naïve", "日本語",
      "a", "über", "z")
    val random = (1 to 300).map { i =>
      val n = (mix(i) & 0x7).toInt // 0..7 tokens
      (i.toLong, (0 until n).map(j =>
        words(math.floorMod(mix(i * 31 + j), words.length).toInt))
        .mkString(" "))
    }
    val degenerate = Seq(
      (1001L, ""), (1002L, "solo"), (1003L, " lead"), (1004L, "trail "),
      (1005L, "a  b"), (1006L, " "), (1007L, "  "), (1008L, "a b c"),
      (1009L, "日本 語 テスト"))
    val df = (random ++ degenerate).toDF("id", "raw")
    for (k <- 2 to 3) {
      val got = df.select(col("id"),
          explode(sketches.space_ngrams(col("raw"), k)).as("gram"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val t = split(col("raw"), " ")
      val want = df.select(col("id"), t.as("t"))
        .filter(size(col("t")) >= k)
        .select(col("id"), explode(transform(
          sequence(lit(1), size(col("t")) - (k - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(k))))).as("gram"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == want, s"k=$k")
    }
    // null text: kernel is null-intolerant, explode drops the row — same
    // as the old chain's null-filtered size() guard
    val withNull = Seq((1L, "a b"), (2L, null)).toDF("id", "raw")
    val survivors = withNull.select(col("id"),
        explode(sketches.space_ngrams(col("raw"), 2)).as("gram"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(survivors == Seq(1L))
    // Text.wordNgrams normalizes first — spot-check the composed helper
    val norm = Seq((1L, "  The   QUICK brown  ")).toDF("id", "text")
      .select(explode(Text.wordNgrams(col("text"), 2)).as("gram"))
      .collect().map(_.getString(0)).toSeq
    assert(norm == Seq("the quick", "quick brown"))
  }
}
