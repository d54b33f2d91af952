package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Bloom filter built and probed entirely with codegen'd built-in
  * expressions — the scale-path prefilter for semi-joins whose build side
  * is small-ish (an eval set, a blocklist) but whose probe side is the
  * whole corpus.
  *
  * Why not `DataFrameStatFunctions.bloomFilter` / Spark's runtime bloom
  * filters? Those produce an opaque sketch probed through non-codegen
  * internals; this one keeps both sides declarative: the BUILD is a
  * `groupBy(word).bit_or(mask)` aggregation (map-side combined, one
  * shuffle of ≤ numBits/64 rows), and the PROBE is a constant-array
  * lookup — `element_at` + `bitwiseAND` — that stays inside whole-stage
  * codegen. The materialized filter is a fixed-size `Array[Long]`
  * (numBits/64 words), so the driver collect is bounded by the filter
  * geometry, never by the data — the same contract as broadcasting any
  * sketch. At 100 TB only `numBits` grows (1% fp at n keys needs ~10n
  * bits); the build stays one bounded-width shuffle.
  *
  * Hashing: Kirsch-Mitzenmacher double hashing — position_i =
  * (h1 + i·h2) mod numBits with h1/h2 two independent xxhash64 draws —
  * which preserves the standard fp bound with only two hash evaluations
  * per key.
  */
object Bloom {

  /** Number of hash probes for a target bits-per-key budget (ln 2 · b/n);
    * 5 is right for the ~10 bits/key the defaults below give.
    */
  val DefaultHashes = 5

  private def h1(key: Column): Column = xxhash64(key)
  private def h2(key: Column): Column = xxhash64(key, lit(0x9e3779b9L))

  /** (h1 + i·h2) mod B, with both hashes reduced mod B BEFORE the
    * combine — modular arithmetic distributes, and the reduced operands
    * (< B ≤ 2^31, i < numHashes) can never overflow ANSI long math.
    * The step hash is reduced into [1, B-1] (`pmod(h2, B-1) + 1`): a step
    * of 0 would collapse all probes onto one bit, degrading the filter to
    * a single effective hash for those keys.
    */
  private def position(key: Column, i: Int, numBits: Int): Column =
    pmod(pmod(h1(key), lit(numBits.toLong)) +
      lit(i.toLong) * (pmod(h2(key), lit(numBits.toLong - 1)) + 1L),
      lit(numBits.toLong))

  /** Build the filter over the distinct values of `key` in `df`.
    * numBits must be a multiple of 64.
    */
  def build(df: DataFrame, key: Column, numBits: Int,
      numHashes: Int = DefaultHashes): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    val words = numBits / 64
    val pos = explode(array((0 until numHashes)
      .map(i => position(key, i, numBits)): _*)).as("pos")
    val bits = df.select(pos)
      .select((col("pos") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy("word").agg(bit_or(col("mask")).as("bits"))
      .collect()
    val out = new Array[Long](words)
    bits.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Membership test column: true iff every probed bit is set. False
    * positives at the filter's fp rate; never false negatives.
    */
  def mightContain(bits: Array[Long], key: Column,
      numHashes: Int = DefaultHashes): Column = {
    val numBits = bits.length * 64
    val arr = typedlit(bits.toSeq)
    (0 until numHashes).map { i =>
      val pos = position(key, i, numBits)
      (element_at(arr, (pos / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L)
    }.reduce(_ && _)
  }
}
