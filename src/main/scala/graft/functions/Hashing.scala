package graft.functions

/** Deterministic 64-bit mixing/hashing primitives shared by the sketch
  * expressions. Pure functions of their inputs — no global RNG — so every
  * signature is reproducible across partitions, executors, and runs.
  */
object Hashing {
  /** splitmix64 finalizer — strong 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over raw bytes — stable string hashing. */
  def fnv1a64(bytes: Array[Byte]): Long = fnv1a64(bytes, 0, bytes.length)

  /** FNV-1a 64 over bytes[from, until). */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Deterministic salt stream: salts(seed)(j) differs per permutation. */
  def salts(seed: Long, n: Int): Array[Long] =
    Array.tabulate(n)(j => mix64(seed + j * 0x632be59bd9b4e019L))
}
