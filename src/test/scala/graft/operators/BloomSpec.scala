package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom prefilter's contract: zero false negatives (correctness),
  * false positives bounded well enough to be a useful prefilter (scale).
  */
class BloomSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no false negatives; fp rate near theory at 10 bits/key") {
    val s = spark
    import s.implicits._
    val keys = (0 until 2000).map(i => s"member_$i")
    val bits = Bloom.build(keys.toDF("k"), col("k"), numBits = 1 << 15)
    // every inserted key must probe true
    val members = keys.toDF("k")
      .filter(!Bloom.mightContain(bits, col("k"))).count()
    assert(members == 0, s"$members false negatives")
    // non-members: 2^15 bits / 2000 keys ≈ 16 bits/key → theoretical fp
    // ~0.4% with 5 hashes; allow 5x slack
    val probes = (0 until 20000).map(i => s"outsider_$i")
    val fp = probes.toDF("k")
      .filter(Bloom.mightContain(bits, col("k"))).count()
    assert(fp < 20000 * 0.02, s"fp rate ${fp / 20000.0} too high")
  }

  test("filter words collapse to a bounded collect regardless of data size") {
    val s = spark
    import s.implicits._
    val bits = Bloom.build((0 until 50000).map(_.toString).toDF("k"),
      col("k"), numBits = 1 << 12)
    assert(bits.length == (1 << 12) / 64) // geometry-, not data-, sized
  }
}
