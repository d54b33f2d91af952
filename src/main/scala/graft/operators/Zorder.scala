package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column stat skipping.
  *
  * A table sorted on one column skips row groups only for predicates on
  * THAT column; a 100 TB table queried by two independent dimensions
  * needs a layout whose row groups are tight in BOTH. Interleaving the
  * bits of the two keys makes lexicographic order on the z-value a
  * space-filling curve: rows close in z are close in (a, b), so every
  * row group covers a small rectangle of the key space and per-column
  * min/max stats prune it for predicates on either column (or both).
  *
  * The cluster write is `repartitionByRange(z)` + `sortWithinPartitions
  * (z)` — one range shuffle, the same cost as any clustered write, after
  * which the layout pays for itself on every read. All expressions are
  * built-in bitwise ops (codegen'd, ANSI-safe: shifts and masks cannot
  * overflow).
  */
object Zorder {

  /** Spread the low 32 bits of x so bit i lands at position 2i
    * (the standard mask-shift doubling sequence).
    */
  private def spread(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x3333333333333333L))
    m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two non-negative 32-bit keys: a's bits at even
    * positions, b's at odd. Keys wider than 32 bits are masked — callers
    * with genuinely wider domains should pre-rank them (e.g. percent_rank
    * × 2^32) so locality survives the truncation.
    */
  def zvalue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Rank-free 32-bit z-key of a DOUBLE column: IEEE-754 bits remapped
    * to an order-preserving integer (functions/ZorderBits), top 32 bits
    * kept. Locality in key space tracks locality in double order — and
    * unlike a `percent_rank` key, it costs one codegen'd projection, not
    * a global sort/window pass over the 100 TB table being clustered.
    * (The top 32 bits are sign + exponent + 20 mantissa bits: plenty to
    * separate row groups unless the column is near-constant.)
    */
  def doubleKey(c: Column): Column =
    shiftrightunsigned(
      graft.functions.bits.double_sortable_bits(c)
        .bitwiseXOR(lit(Long.MinValue)), 32)

  /** Re-cluster df on the z-order of (a, b): one range shuffle into
    * `numPartitions` z-contiguous partitions, rows sorted by z within
    * each, so a columnar writer downstream produces row groups tight in
    * both keys.
    *
    * Sorting uses the UNSIGNED order of the Morton code (sign bit
    * flipped): b's bit 31 lands at z's bit 63, so keys in [2^31, 2^32)
    * would otherwise sort as negative z and split the curve at the
    * signed discontinuity.
    */
  def cluster(df: DataFrame, a: Column, b: Column,
      numPartitions: Int = 8): DataFrame = {
    val z = zvalue(a, b).bitwiseXOR(lit(Long.MinValue))
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
