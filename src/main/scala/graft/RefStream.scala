package graft

/** Reproduction of the reference CLI's random stream (reference:
  * src/cli.cpp:64-118 generateSyntheticData) so `Cli.write` to a single
  * `.col` file emits value-identical data for the same seed, and a user
  * diffing `write` output across engines sees no difference.
  *
  * Both pieces are public specifications: MT19937 is the Matsumoto &
  * Nishimura (1998) generator as standardized by C++ `std::mt19937`, and
  * the bounded-draw mapping is the GNU libstdc++
  * `uniform_int_distribution` downscaling (rejection past the largest
  * multiple of the range, then integer division) — verified in
  * RefStreamSpec against the compiled reference toolchain's output.
  */
final class Mt19937(seed: Long) {
  private val N = 624
  private val mt = new Array[Int](N)
  private var mti = N

  locally {
    mt(0) = seed.toInt
    var i = 1
    while (i < N) {
      mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
      i += 1
    }
  }

  /** Next 32-bit draw as an unsigned value in a Long. */
  def nextUInt(): Long = {
    if (mti >= N) {
      var k = 0
      while (k < N) {
        val y = (mt(k) & 0x80000000) | (mt((k + 1) % N) & 0x7fffffff)
        var next = mt((k + 397) % N) ^ (y >>> 1)
        if ((y & 1) != 0) next ^= 0x9908b0df
        mt(k) = next
        k += 1
      }
      mti = 0
    }
    var y = mt(mti)
    mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y.toLong & 0xffffffffL
  }

  /** libstdc++ `uniform_int_distribution(a, b)(urng)` for a 32-bit
    * generator: Lemire's nearly-divisionless downscaling (Fast Random
    * Integer Generation in an Interval, ACM TOMACS 29(1), 2019 — the
    * algorithm GCC's uniform_int_dist.h `_S_nd` implements): take the top
    * 32 bits of draw×range, rejecting the small biased region below
    * `(2^32 - range) mod range`.
    */
  def uniformInt(a: Long, b: Long): Long = {
    val range = b - a + 1 // ≤ 2^32: u64 product arithmetic wraps like C
    require(range > 0 && range <= 0x100000000L, s"range [$a,$b] unsupported")
    var product = nextUInt() * range
    var low = product & 0xffffffffL
    if (low < range) {
      val threshold = ((-range) & 0xffffffffL) % range
      while (low < threshold) {
        product = nextUInt() * range
        low = product & 0xffffffffL
      }
    }
    (product >>> 32) + a
  }
}
