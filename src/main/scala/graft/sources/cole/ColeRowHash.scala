package graft.sources.cole

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Order-insensitive multiset fingerprint of a row stream — the engine
  * side of no-op rewrite detection for row-level UPDATE/MERGE.
  *
  * A group-based ReplaceData rewrite classifies a file as "affected"
  * whenever the join/condition MATCHES, even when no assignment changes
  * any row (the standard idempotent-pipeline shape: a re-run MERGE whose
  * WHEN MATCHED condition excludes already-processed rows). Without
  * detection, every such file is rewritten byte-for-byte-equivalent but
  * physically new — write amplification plus file-count fragmentation on
  * every re-run. Detection = compare the rows READ from a candidate file
  * against the rows WRITTEN as its replacement; equality means the
  * original stays and the replacement is discarded.
  *
  * The comparison must be order-insensitive (a shuffle or join between
  * the group scan and the write can permute rows) and cheap (no second
  * I/O pass), so both sides fold each row into a commutative fingerprint
  * as the rows stream by: `count` plus three independent 64-bit
  * combinations (two seeded sums and an xor) of a per-row hash over the
  * DATA columns in name-sorted order. Equal fingerprints ⇒ equal row
  * multisets (modulo a ~2^-192 collision for non-adversarial data);
  * unequal ⇒ definitely different, rewrite proceeds. Misalignment
  * between scan slices and write tasks (an unexpected exchange) can only
  * produce MISMATCHES — detection then degrades to the global
  * whole-operation check, never to a wrong discard.
  */
object ColeRowHash {

  /** The canonical hash column order: every data column, name-sorted.
    * Both sides (scan projection and write schema) must agree on this
    * list or fingerprints are incomparable (the commit checks).
    */
  def hashableNames(schema: StructType): Seq[String] =
    schema.fieldNames.toSeq.filterNot(_ == ColeUtil.FileMetaCol).sorted

  // splitmix64 finalizer — the per-field and per-row avalanche
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def foldBytes(seed: Long, b: Array[Byte]): Long = {
    var h = seed
    var i = 0
    // 8 bytes at a time, tail bytes one by one
    while (i + 8 <= b.length) {
      var w = 0L
      var j = 0
      while (j < 8) { w = (w << 8) | (b(i + j) & 0xFFL); j += 1 }
      h = mix(h ^ w)
      i += 8
    }
    while (i < b.length) { h = mix(h ^ (b(i) & 0xFFL)); i += 1 }
    mix(h ^ b.length)
  }

  private val NullMarker = 0x6E756C6C5F763141L

  /** Streaming fingerprint accumulator over one side's row stream.
    * Not thread-safe — one instance per reader/writer task.
    */
  final class RowHasher(schema: StructType) {
    // name-sorted data-column ordinals + types (FileMetaCol excluded)
    private val fields: Array[(Int, DataType)] = schema.fields.zipWithIndex
      .filterNot(_._1.name == ColeUtil.FileMetaCol)
      .sortBy(_._1.name)
      .map { case (f, i) => (i, f.dataType) }.toArray

    var count: Long = 0L
    var sum1: Long = 0L
    var sum2: Long = 0L
    var xor1: Long = 0L

    private def fieldHash(row: InternalRow, ord: Int, dt: DataType): Long =
      if (row.isNullAt(ord)) NullMarker
      else dt match {
        case IntegerType => mix(row.getInt(ord).toLong)
        case LongType | TimestampType | TimestampNTZType => mix(row.getLong(ord))
        // doubleToLongBits canonicalizes NaN, so equal values hash equal
        case DoubleType => mix(java.lang.Double.doubleToLongBits(row.getDouble(ord)))
        case FloatType => mix(java.lang.Float.floatToIntBits(row.getFloat(ord)).toLong)
        case StringType => foldBytes(0x73747268L, row.getUTF8String(ord).getBytes)
        case BinaryType => foldBytes(0x62696E68L, row.getBinary(ord))
        case dt: DecimalType =>
          val d = row.getDecimal(ord, dt.precision, dt.scale)
          // scale is fixed by the schema, so the unscaled value is the
          // full identity; wide decimals fold their two's-complement bytes
          if (dt.precision <= Decimal.MAX_LONG_DIGITS) mix(d.toUnscaledLong)
          else foldBytes(0x64656377L,
            d.toJavaBigDecimal.unscaledValue().toByteArray)
        case ArrayType(FloatType, _) =>
          val a = row.getArray(ord)
          var h = 0x61727266L
          var i = 0
          val n = a.numElements()
          while (i < n) {
            h = mix(h ^ java.lang.Float.floatToIntBits(a.getFloat(i)).toLong)
            i += 1
          }
          mix(h ^ n)
        case other =>
          throw new IllegalArgumentException(
            s"no-op detection cannot hash type $other")
      }

    def add(row: InternalRow): Unit = {
      var h = 0L
      var i = 0
      while (i < fields.length) {
        val (ord, dt) = fields(i)
        h = mix(h ^ fieldHash(row, ord, dt))
        i += 1
      }
      count += 1
      sum1 += h
      sum2 += mix(h ^ 0xA5A5A5A5DEADBEEFL)
      xor1 ^= mix(h ^ 0x0F0F0F0F12345678L)
    }
  }

  /** One side's fingerprint total — additive, so per-slice / per-task
    * fingerprints sum into per-file and whole-operation ones.
    */
  final case class Fp(count: Long, sum1: Long, sum2: Long, xor1: Long) {
    def +(o: Fp): Fp = Fp(count + o.count, sum1 + o.sum1, sum2 + o.sum2,
      xor1 ^ o.xor1)
  }
  object Fp {
    val zero: Fp = Fp(0L, 0L, 0L, 0L)
    def of(h: RowHasher): Fp = Fp(h.count, h.sum1, h.sum2, h.xor1)
  }

  /** Accumulator element: fingerprint of the rows one scan SLICE
    * (input partition) delivered. `idx` is the partition's position in
    * the planned array — the join key back to write-task partition ids.
    */
  final case class ScanSlice(idx: Int, fp: Fp)
}
