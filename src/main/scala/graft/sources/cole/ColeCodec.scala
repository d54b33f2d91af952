package graft.sources.cole

import java.io.ByteArrayOutputStream

/** Binary codecs for the COLE columnar format.
  *
  * Implemented from the published format spec
  * (reference: docs/FORMAT.md — varint/zigzag, RLE, DELTA, DICTIONARY,
  * PLAIN string layout; reference: src/encoding.cpp:13-37 for the exact
  * zigzag-varint run/delta value encoding). All multi-byte integers are
  * little-endian.
  */
object ColeCodec {

  // ---- optional page compression (raw DEFLATE, no zlib wrapper) ----
  //
  // The reference format has no compression (README "Limitations"); graft
  // adds it as an OPT-IN write option because at 100 TB the dominant cost
  // is bytes moved, not CPU. The page header already carries
  // (uncompressedSize, compressedSize) — the reference always writes them
  // equal — so compressed pages are simply pages where they differ;
  // default writes stay byte-compatible with the reference reader.

  /** Deflate `raw`; returns `raw` unchanged unless compression strictly
    * wins, so incompressible pages cost nothing and sizes-equal remains
    * the "stored" marker.
    */
  def deflate(raw: Array[Byte]): Array[Byte] = {
    if (raw.length < 64) return raw // header overhead beats any win
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(raw); d.finish()
    val out = new Array[Byte](raw.length - 1) // accept only strictly smaller
    var n = 0
    while (!d.finished() && n < out.length)
      n += d.deflate(out, n, out.length - n)
    val won = d.finished() && n < raw.length
    d.end()
    if (won) java.util.Arrays.copyOf(out, n) else raw
  }

  /** Inflate `len` bytes at `buf[off..]` into exactly `uncLen` bytes. */
  def inflate(buf: Array[Byte], off: Int, len: Int, uncLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(buf, off, len)
    val out = new Array[Byte](uncLen)
    var n = 0
    try {
      while (n < uncLen && !inf.finished()) {
        val k = inf.inflate(out, n, uncLen - n)
        if (k == 0 && inf.needsInput())
          throw new ColeFormat.ColeFormatException("truncated compressed page")
        n += k
      }
      // the size lie in the OTHER direction: the stream continues past
      // the declared uncompressed size — whether it produces more bytes
      // OR needs more input to do so, it is not the stream the header
      // describes; reject rather than silently truncate
      if (n == uncLen && !inf.finished()) {
        val k = inf.inflate(new Array[Byte](1))
        if (k > 0 || (!inf.finished() && inf.needsInput()))
          throw new ColeFormat.ColeFormatException(
            s"corrupt compressed page: stream continues past declared $uncLen bytes")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new ColeFormat.ColeFormatException(s"corrupt compressed page: ${e.getMessage}")
    } finally inf.end()
    if (n != uncLen)
      throw new ColeFormat.ColeFormatException(s"inflate: got $n of $uncLen bytes")
    out
  }

  /** Forward cursor over a byte array with little-endian primitives. */
  final class Cursor(val buf: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def i32(): Int = u32()
    def i64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def uvarint(): Long = {
      var result = 0L
      var shift = 0
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def zz32(): Int = { val e = uvarint().toInt; (e >>> 1) ^ -(e & 1) }
    def zz64(): Long = { val e = uvarint(); (e >>> 1) ^ -(e & 1L) }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
  }

  /** Little-endian growable output buffer. */
  final class Out(initial: Int = 64) {
    private val os = new ByteArrayOutputStream(initial)
    def size: Int = os.size()
    def u8(v: Int): Unit = os.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >>> 8) }
    def u32(v: Int): Unit = { u8(v); u8(v >>> 8); u8(v >>> 16); u8(v >>> 24) }
    def i64(v: Long): Unit = {
      var i = 0
      while (i < 8) { os.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def uvarint(value: Long): Unit = {
      var v = value
      while ((v & ~0x7fL) != 0) { os.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      os.write(v.toInt)
    }
    def zz32(v: Int): Unit = uvarint(((v << 1) ^ (v >> 31)) & 0xffffffffL)
    def zz64(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    def raw(b: Array[Byte]): Unit = os.write(b, 0, b.length)
    def toBytes: Array[Byte] = os.toByteArray
  }

  // ---- RLE: [num_runs uvarint] ([run_len uvarint][value zigzag-varint])*

  def encodeRleInt(values: Array[Int]): Array[Byte] = {
    // Always emit the run-count header (0 for empty input): the decoder
    // unconditionally reads it, and a header-less empty chunk would desync
    // any cursor that reads further (e.g. the dictionary page layout).
    val out = new Out(values.length)
    var runs = 0
    val body = new Out(values.length)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      var len = 1
      while (i + len < values.length && values(i + len) == v) len += 1
      body.uvarint(len.toLong); body.zz32(v)
      runs += 1
      i += len
    }
    out.uvarint(runs.toLong); out.raw(body.toBytes)
    out.toBytes
  }

  def encodeRleLong(values: Array[Long]): Array[Byte] = {
    val out = new Out(values.length)
    var runs = 0
    val body = new Out(values.length)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      var len = 1
      while (i + len < values.length && values(i + len) == v) len += 1
      body.uvarint(len.toLong); body.zz64(v)
      runs += 1
      i += len
    }
    out.uvarint(runs.toLong); out.raw(body.toBytes)
    out.toBytes
  }

  def decodeRleInt(c: Cursor, numValues: Int): Array[Int] = {
    val out = new Array[Int](numValues)
    val runs = c.uvarint().toInt
    var idx = 0
    var r = 0
    while (r < runs) {
      val len = c.uvarint().toInt
      val v = c.zz32()
      java.util.Arrays.fill(out, idx, idx + len, v)
      idx += len
      r += 1
    }
    out
  }

  def decodeRleLong(c: Cursor, numValues: Int): Array[Long] = {
    val out = new Array[Long](numValues)
    val runs = c.uvarint().toInt
    var idx = 0
    var r = 0
    while (r < runs) {
      val len = c.uvarint().toInt
      val v = c.zz64()
      java.util.Arrays.fill(out, idx, idx + len, v)
      idx += len
      r += 1
    }
    out
  }

  // ---- DELTA: [base fixed-width LE][num_deltas uvarint][delta zigzag-varint]*

  def encodeDeltaInt(values: Array[Int]): Array[Byte] = {
    val out = new Out(values.length)
    if (values.isEmpty) return out.toBytes
    out.u32(values(0))
    out.uvarint((values.length - 1).toLong)
    var i = 1
    while (i < values.length) { out.zz32(values(i) - values(i - 1)); i += 1 }
    out.toBytes
  }

  def encodeDeltaLong(values: Array[Long]): Array[Byte] = {
    val out = new Out(values.length)
    if (values.isEmpty) return out.toBytes
    out.i64(values(0))
    out.uvarint((values.length - 1).toLong)
    var i = 1
    while (i < values.length) { out.zz64(values(i) - values(i - 1)); i += 1 }
    out.toBytes
  }

  def decodeDeltaInt(c: Cursor, numValues: Int): Array[Int] = {
    if (numValues == 0) return Array.emptyIntArray
    val out = new Array[Int](numValues)
    out(0) = c.i32()
    val n = c.uvarint().toInt
    var i = 0
    while (i < n) { out(i + 1) = out(i) + c.zz32(); i += 1 }
    out
  }

  def decodeDeltaLong(c: Cursor, numValues: Int): Array[Long] = {
    if (numValues == 0) return Array.emptyLongArray
    val out = new Array[Long](numValues)
    out(0) = c.i64()
    val n = c.uvarint().toInt
    var i = 0
    while (i < n) { out(i + 1) = out(i) + c.zz64(); i += 1 }
    out
  }

  // ---- PLAIN

  def encodePlainInt(values: Array[Int]): Array[Byte] = {
    val out = new Out(values.length * 4)
    values.foreach(out.u32)
    out.toBytes
  }

  def encodePlainLong(values: Array[Long]): Array[Byte] = {
    val out = new Out(values.length * 8)
    values.foreach(out.i64)
    out.toBytes
  }

  def decodePlainInt(c: Cursor, numValues: Int): Array[Int] =
    Array.fill(numValues)(c.i32())

  def decodePlainLong(c: Cursor, numValues: Int): Array[Long] =
    Array.fill(numValues)(c.i64())

  // ---- PLAIN doubles (format v2): 8-byte little-endian IEEE-754 bits

  def encodePlainDouble(values: Array[Double]): Array[Byte] = {
    val out = new Out(values.length * 8)
    values.foreach(d => out.i64(java.lang.Double.doubleToRawLongBits(d)))
    out.toBytes
  }

  def decodePlainDouble(c: Cursor, numValues: Int): Array[Double] =
    Array.fill(numValues)(java.lang.Double.longBitsToDouble(c.i64()))

  /** PLAIN float32 vectors: [element offsets u32 x (n+1)][f32 LE data] —
    * the PLAIN-strings layout with 4-byte elements, so variable per-row
    * dimensions cost one offset per row and decode is a bulk sweep.
    */
  def encodePlainVecs(values: Array[Array[Float]]): Array[Byte] = {
    var total = 0
    values.foreach(v => total += v.length)
    val out = new Out((values.length + 1 + total) * 4)
    var off = 0
    values.foreach { v => out.u32(off); off += v.length }
    out.u32(off)
    values.foreach(v => v.foreach(f => out.u32(java.lang.Float.floatToRawIntBits(f))))
    out.toBytes
  }

  def decodePlainVecs(c: Cursor, numValues: Int): Array[Array[Float]] = {
    val offsets = Array.fill(numValues + 1)(c.u32())
    val base = c.pos
    Array.tabulate(numValues) { i =>
      val len = offsets(i + 1) - offsets(i)
      val a = new Array[Float](len)
      var p = base + offsets(i) * 4
      var j = 0
      while (j < len) {
        a(j) = java.lang.Float.intBitsToFloat(
          (c.buf(p) & 0xff) | ((c.buf(p + 1) & 0xff) << 8) |
            ((c.buf(p + 2) & 0xff) << 16) | ((c.buf(p + 3) & 0xff) << 24))
        p += 4; j += 1
      }
      a
    }
  }

  // ---- validity bitmaps (format v2): bit set = value present. The
  // bitmap prefixes the page body; encoded values cover present rows only.

  def packValidity(isNull: Array[Boolean]): Array[Byte] = {
    val out = new Array[Byte]((isNull.length + 7) / 8)
    var i = 0
    while (i < isNull.length) {
      if (!isNull(i)) out(i >>> 3) = (out(i >>> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Reads ceil(n/8) bitmap bytes from the cursor; returns per-row isNull. */
  def readValidity(c: Cursor, n: Int): Array[Boolean] = {
    val bytes = c.bytes((n + 7) / 8)
    Array.tabulate(n)(i => (bytes(i >>> 3) & (1 << (i & 7))) == 0)
  }

  /** PLAIN strings: [offsets u32 x (n+1)][utf8 bytes]. */
  def encodePlainStrings(values: Array[Array[Byte]]): Array[Byte] = {
    val out = new Out()
    var off = 0
    values.foreach { v => out.u32(off); off += v.length }
    out.u32(off)
    values.foreach(out.raw)
    out.toBytes
  }

  def decodePlainStrings(c: Cursor, numValues: Int): Array[Array[Byte]] = {
    val offsets = Array.fill(numValues + 1)(c.u32())
    Array.tabulate(numValues) { i => c.buf.slice(c.pos + offsets(i), c.pos + offsets(i + 1)) }
    // NOTE: cursor is left at the offsets' end + total bytes by caller design:
  } // callers always consume whole pages, so trailing position is unused

  // ---- DICTIONARY strings: [dict_size u32]([len u32][bytes])* [indices RLE-int32]

  def encodeDictStrings(values: Array[Array[Byte]]): Array[Byte] = {
    val index = new java.util.LinkedHashMap[String, Integer]()
    val indices = new Array[Int](values.length)
    val entries = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = 0
    while (i < values.length) {
      val key = new String(values(i), java.nio.charset.StandardCharsets.ISO_8859_1)
      var idx = index.get(key)
      if (idx == null) {
        idx = Integer.valueOf(entries.size)
        index.put(key, idx)
        entries += values(i)
      }
      indices(i) = idx.intValue()
      i += 1
    }
    val out = new Out()
    out.u32(entries.size)
    entries.foreach { e => out.u32(e.length); out.raw(e) }
    out.raw(encodeRleInt(indices))
    out.toBytes
  }

  /** Dictionary page as (entries, per-row ids) — the layout the vectorized
    * reader hands to Spark's dictionary-aware column vectors verbatim.
    */
  def decodeDictRaw(c: Cursor, numValues: Int): (Array[Array[Byte]], Array[Int]) = {
    val dictSize = c.u32()
    val dict = Array.fill(dictSize) { val len = c.u32(); c.bytes(len) }
    (dict, decodeRleInt(c, numValues))
  }

  def decodeDictStrings(c: Cursor, numValues: Int): Array[Array[Byte]] = {
    val (dict, indices) = decodeDictRaw(c, numValues)
    indices.map(dict(_))
  }

  // ---- streaming numeric aggregation (no array materialization)
  //
  // The aggregate-pushdown path sweeps encoded pages directly: RLE pages
  // contribute in O(runs) (a run of length L adds L·v in one step), DELTA
  // pages keep only a running value, PLAIN pages sweep fixed-width bytes.
  // This is what lets SUM/MIN/MAX/COUNT run at decode speed or better
  // without building column vectors.

  /** Mutable (count,sum,min,max) accumulator for one column chunk. */
  final class NumAgg {
    var count: Long = 0L
    var sum: Long = 0L
    var min: Long = Long.MaxValue
    var max: Long = Long.MinValue
    @inline def add(v: Long): Unit = {
      count += 1; sum += v
      if (v < min) min = v
      if (v > max) max = v
    }
    @inline def addRun(v: Long, len: Long): Unit = {
      count += len; sum += v * len
      if (len > 0) {
        if (v < min) min = v
        if (v > max) max = v
      }
    }
  }

  def aggRleInt(c: Cursor, acc: NumAgg): Unit = {
    val runs = c.uvarint().toInt
    var r = 0
    while (r < runs) {
      val len = c.uvarint()
      acc.addRun(c.zz32().toLong, len)
      r += 1
    }
  }

  def aggRleLong(c: Cursor, acc: NumAgg): Unit = {
    val runs = c.uvarint().toInt
    var r = 0
    while (r < runs) {
      val len = c.uvarint()
      acc.addRun(c.zz64(), len)
      r += 1
    }
  }

  def aggDeltaInt(c: Cursor, numValues: Int, acc: NumAgg): Unit = {
    if (numValues == 0) return
    var v = c.i32()
    acc.add(v.toLong)
    val n = c.uvarint().toInt
    var i = 0
    while (i < n) { v += c.zz32(); acc.add(v.toLong); i += 1 }
  }

  def aggDeltaLong(c: Cursor, numValues: Int, acc: NumAgg): Unit = {
    if (numValues == 0) return
    var v = c.i64()
    acc.add(v)
    val n = c.uvarint().toInt
    var i = 0
    while (i < n) { v += c.zz64(); acc.add(v); i += 1 }
  }

  def aggPlainInt(c: Cursor, numValues: Int, acc: NumAgg): Unit = {
    var i = 0
    while (i < numValues) { acc.add(c.i32().toLong); i += 1 }
  }

  def aggPlainLong(c: Cursor, numValues: Int, acc: NumAgg): Unit = {
    var i = 0
    while (i < numValues) { acc.add(c.i64()); i += 1 }
  }

  /** Double twin of [[NumAgg]] for v2 TDouble chunks. */
  final class DblAgg {
    var count: Long = 0L
    var sum: Double = 0d
    var min: Double = Double.PositiveInfinity
    var max: Double = Double.NegativeInfinity
    @inline def add(v: Double): Unit = {
      count += 1; sum += v
      if (v < min) min = v
      if (v > max) max = v
    }
  }

  def aggPlainDouble(c: Cursor, numValues: Int, acc: DblAgg): Unit = {
    var i = 0
    while (i < numValues) { acc.add(java.lang.Double.longBitsToDouble(c.i64())); i += 1 }
  }

  /** Int128 twin of [[NumAgg]] for v2 TDecimalWide chunks: values are
    * two's-complement (hi, lo) lane pairs in the wide unscaled domain.
    * The sum accumulates in 128 bits (unsigned-lo carry into hi); a
    * possible 128-bit wrap is excluded at EMISSION by the
    * count·max|value| bound (ColeAggGuards.checkWideSumBound), mirroring
    * the int64 decimal discipline.
    */
  final class WideAgg {
    var count: Long = 0L
    var sumHi: Long = 0L
    var sumLo: Long = 0L // unsigned lane
    var minHi: Long = Long.MaxValue
    var minLo: Long = -1L // +inf sentinel: largest int128
    var maxHi: Long = Long.MinValue
    var maxLo: Long = 0L // -inf sentinel: smallest int128
    @inline def add(hi: Long, lo: Long): Unit = {
      count += 1
      val nl = sumLo + lo
      // unsigned overflow of the lo lane carries into hi
      if (java.lang.Long.compareUnsigned(nl, sumLo) < 0) sumHi += 1
      sumLo = nl
      sumHi += hi
      if (ColeFormat.cmp128(hi, lo, minHi, minLo) < 0) { minHi = hi; minLo = lo }
      if (ColeFormat.cmp128(hi, lo, maxHi, maxLo) > 0) { maxHi = hi; maxLo = lo }
    }
  }
}
