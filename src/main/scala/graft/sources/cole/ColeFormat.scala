package graft.sources.cole

import graft.sources.cole.ColeCodec.{Cursor, Out}

/** In-memory model + metadata serde of the COLE file format
  * (reference: docs/FORMAT.md; header/footer/metadata layout
  * reference: src/format.cpp:183-233).
  *
  * Layout: [COLE header 8B][row groups: column chunks: pages][metadata]
  * [FOOT magic u32][metadata offset u64].
  */
object ColeFormat {
  val FileMagic = 0x454c4f43 // "COLE"
  val FooterMagic = 0x464f4f54 // "FOOT"
  val VersionMajor = 1
  val VersionMinor = 0

  /** Format v2 (this engine's opt-in extension; the reference defines only
    * v1, format.h:21-23): adds DOUBLE, TIMESTAMP(_NTZ) and FLOAT_VECTOR
    * column types, per-page null bitmaps, and per-page body CRC32s. v1
    * files remain byte-identical to the reference layout; a v2 file
    * differs only in the header's version major, a u32 null count + u32
    * body crc appended to every page header, a u32 metadata CRC32
    * between the metadata block and the FOOT footer, and (when a page
    * has nulls) a validity bitmap prefixed to the page body. The
    * reference's own stats block already reserves null_count
    * (format.h:44) — v2 makes it real.
    */
  val Version2 = 2

  sealed abstract class ColeType(val id: Int)
  case object TInt32 extends ColeType(0)
  case object TInt64 extends ColeType(1)
  case object TString extends ColeType(2)
  /** v2 only: IEEE-754 double, PLAIN pages. */
  case object TDouble extends ColeType(3)
  /** v2 only: microseconds since epoch as int64 — every int64 encoding
    * (PLAIN/RLE/DELTA) applies; DELTA shines on the usual
    * sorted-by-event-time layout.
    */
  case object TTimestamp extends ColeType(4)
  /** v2 only: wall-clock (no-timezone) microseconds as int64 — parquet's
    * isAdjustedToUTC=false flavor, which Spark surfaces as TimestampNTZ.
    */
  case object TTimestampNtz extends ColeType(5)
  /** v2 only: variable-length float32 vector (the embedding column type),
    * PLAIN pages laid out like PLAIN strings — [element offsets u32 x
    * (n+1)][float32 LE data] — so per-row dimensions need no metadata and
    * a fixed-dim corpus pays only 4 bytes/row of offset overhead.
    */
  case object TFloatVec extends ColeType(6)
  /** v2 only: exact decimal, precision ≤ 18, stored as the UNSCALED int64
    * — the whole int64 machinery (PLAIN/RLE/DELTA encodings, page stats,
    * sweep aggregation, predicate skipping) applies verbatim in the
    * unscaled domain, because for a fixed scale the unscaled order IS the
    * value order. This is what closes the engine's exact-money loop: the
    * oracle discipline (SURVEY §4) does all money math in decimal, and
    * the native format can now store it without a lossy double hop.
    * Precision and scale ride in the column metadata (2 extra bytes).
    */
  final case class TDecimal(precision: Int, scale: Int) extends ColeType(7) {
    require(precision >= 1 && precision <= 18 && scale >= 0 && scale <= precision,
      s"COLE DECIMAL needs 1<=precision<=18, 0<=scale<=precision; got ($precision,$scale)")
  }
  /** v2 only: exact decimal, precision 19..38, stored as the UNSCALED
    * two's-complement int128 in two i64 lanes per value — PLAIN pages lay
    * out [hi i64][lo i64] per row, little-endian each, so a page is one
    * contiguous 16-byte-stride sweep. Stats and predicate pushdown run in
    * the wide unscaled domain (signed-128 compare: hi signed, lo
    * unsigned), because for a fixed scale the unscaled order is the value
    * order exactly as in the int64 decimal lane. This closes the
    * DECIMAL(38,x) ledger-aggregate gap: wide money columns round-trip
    * natively instead of falling back to parquet.
    */
  final case class TDecimalWide(precision: Int, scale: Int) extends ColeType(8) {
    require(precision >= 19 && precision <= 38 && scale >= 0 && scale <= precision,
      s"COLE WIDE DECIMAL needs 19<=precision<=38, 0<=scale<=precision; " +
        s"got ($precision,$scale) — use DECIMAL (type 7) below precision 19")
  }
  /** v2 only: opaque variable-length bytes (the multimodal payload
    * column type — image/audio/video blobs with typed metadata beside
    * them). Pages reuse the PLAIN-strings layout verbatim ([offsets u32
    * x (n+1)][bytes]; DICTIONARY works byte-wise too) — the layout never
    * assumed UTF-8, only the Spark-facing type does. No value stats, no
    * predicate claims, no aggregate pushdown: bytes are payload, not
    * keys.
    */
  case object TBinary extends ColeType(9)
  def typeOf(id: Int): ColeType = id match {
    case 0 => TInt32
    case 1 => TInt64
    case 2 => TString
    case 3 => TDouble
    case 4 => TTimestamp
    case 5 => TTimestampNtz
    case 6 => TFloatVec
    case 9 => TBinary
    case 7 | 8 => throw new ColeFormatException(
      "DECIMAL column types carry precision/scale: only readMetadata decodes them")
    case other => throw new ColeFormatException(s"Unknown column type id: $other")
  }

  /** True for types only format v2 can carry. */
  def requiresV2(t: ColeType): Boolean =
    t == TDouble || t == TTimestamp || t == TTimestampNtz || t == TFloatVec ||
      t == TBinary ||
      t.isInstanceOf[TDecimal] || t.isInstanceOf[TDecimalWide]

  /** Types stored as int64 values (sharing every int64 encode/agg path).
    * NOT TDecimalWide: its values are two-lane int128s with their own
    * decode/stat/predicate machinery.
    */
  def isLongBacked(t: ColeType): Boolean =
    t == TInt64 || t == TTimestamp || t == TTimestampNtz || t.isInstanceOf[TDecimal]

  /** Types stored as two i64 lanes per value (the int128 family). */
  def isWide(t: ColeType): Boolean = t.isInstanceOf[TDecimalWide]

  /** Signed-128 comparison of (hi,lo) lane pairs: hi compares signed, lo
    * unsigned — the two's-complement int128 order, which for a fixed
    * scale IS the wide decimal value order.
    */
  def cmp128(aHi: Long, aLo: Long, bHi: Long, bLo: Long): Int = {
    val h = java.lang.Long.compare(aHi, bHi)
    if (h != 0) h else java.lang.Long.compareUnsigned(aLo, bLo)
  }

  private val Two64 = java.math.BigInteger.ONE.shiftLeft(64)

  /** Two's-complement (hi,lo) lanes of a BigInteger that fits in 128
    * bits. DECIMAL(38) unscaled values always do: 10^38 < 2^127.
    */
  def wideFromBigInteger(bi: java.math.BigInteger): (Long, Long) = {
    if (bi.bitLength > 127) throw new ColeFormatException(
      s"unscaled decimal $bi exceeds 128 bits")
    (bi.shiftRight(64).longValue, bi.longValue)
  }

  def wideToBigInteger(hi: Long, lo: Long): java.math.BigInteger = {
    val loB = if (lo >= 0) java.math.BigInteger.valueOf(lo)
      else java.math.BigInteger.valueOf(lo).add(Two64)
    java.math.BigInteger.valueOf(hi).shiftLeft(64).add(loB)
  }

  sealed abstract class Enc(val id: Int)
  case object Plain extends Enc(0)
  case object Rle extends Enc(1)
  case object Delta extends Enc(2)
  case object Dict extends Enc(3)
  def encOf(id: Int): Enc = id match {
    case 0 => Plain
    case 1 => Rle
    case 2 => Delta
    case 3 => Dict
    case other => throw new ColeFormatException(s"Unknown encoding id: $other")
  }

  /** minD/maxD are the v2 double-column stats; integral columns
    * (including v2 timestamps, stored as micros) use minInt/maxInt; wide
    * decimal columns carry (hi,lo) int128 bounds in minW/maxW.
    */
  final case class PageStats(minInt: Option[Long], maxInt: Option[Long], nullCount: Int,
      minD: Option[Double] = None, maxD: Option[Double] = None,
      minW: Option[(Long, Long)] = None, maxW: Option[(Long, Long)] = None)
  /** nullCount: v2 pages carry it in the header (0 for every v1 page);
    * when positive, the page body starts with a validity bitmap
    * (ceil(numValues/8) bytes, bit set = value present) and the encoded
    * values cover only the numValues - nullCount present rows.
    *
    * crc: v2 pages carry a CRC32 of the page body AS STORED (after any
    * compression) and every v2 read verifies it before decoding — at
    * large scale, a flipped bit or torn write must fail loudly, never
    * decode into plausible-looking values. v1 cannot carry the field
    * (byte-compat); its pages read unverified, as the reference does.
    */
  final case class PageHeader(uncompressedSize: Int, compressedSize: Int,
      numValues: Int, encoding: Enc, stats: PageStats, nullCount: Int = 0,
      crc: Int = 0)
  final case class ColumnChunkMeta(fileOffset: Long, totalSize: Long,
      pages: Seq[PageHeader])
  final case class RowGroupMeta(numRows: Int, chunks: Seq[ColumnChunkMeta])
  final case class ColeColumn(name: String, colType: ColeType, encoding: Enc)
  /** Magic of the OPTIONAL v2 metadata-tail extension carrying per-column
    * NDV upper bounds ("DICT"). v1 footers never carry it (byte-compat
    * with the reference layout); a v2 reader detects it by remaining
    * metadata bytes + magic, so pre-extension v2 files parse unchanged.
    */
  val NdvExtMagic = 0x54434944

  /** Magic of the OPTIONAL v2 metadata-tail extension carrying per-chunk
    * integral SUMs ("SUMS"). Written after the NDV tail (both optional,
    * each detected by magic). Sums are the wrapped (mod 2^64) sums of
    * each chunk's PRESENT values — exactly what the page sweep
    * accumulates, in any order, because Long addition is associative mod
    * 2^64 — so a footer-answered SUM is bit-identical to the sweep and
    * an unfiltered global aggregate can answer from the driver's footer
    * cache without opening a single data file.
    */
  val SumExtMagic = 0x534d5553

  /** Magic of the OPTIONAL v2 metadata-tail extension carrying per-chunk
    * STRING bounds ("STRB"). Written after the SUMS tail (all three
    * tails optional, each detected by magic). Bounds are the EXACT
    * byte-wise (unsigned, = Spark UTF8String order) min/max of each
    * chunk's present string values — exact VALUES, not prefixes, so a
    * footer-answered string MIN/MAX is the query's answer, bit-identical
    * to the page sweep; a chunk whose extreme exceeds the length cap (or
    * has no present values) records ABSENT and the fold falls back.
    */
  val StrExtMagic = 0x42525453

  /** Per-chunk string bounds above this byte length are not recorded —
    * footers stay metadata-sized; the sweep still answers those columns.
    */
  val StrBoundMaxLen = 256

  final case class FileMeta(columns: Seq[ColeColumn], rowGroups: Seq[RowGroupMeta],
      totalRows: Long, version: Int = 1,
      /** Per-column distinct-count upper bounds, aligned to `columns`
        * (-1 = not derivable); written by the v2 writer from its own
        * dictionary sizes, so the CBO's string NDV is METADATA-ONLY —
        * zero positioned reads (ColeNdv's page probe remains the
        * fallback for files predating the extension). Empty = absent.
        */
      ndvBounds: Seq[Long] = Seq.empty,
      /** colIdx → per-row-group wrapped present-value sums (v2 writer,
        * TInt32 and long-backed columns). Empty = file predates the
        * extension; readers fall back to the page sweep.
        */
      chunkSums: Map[Int, Array[Long]] = Map.empty,
      /** colIdx → per-row-group EXACT string (min, max) byte pairs for
        * TString columns (v2 writer, STRB tail); null entry = bounds
        * absent for that chunk (no present values, or an extreme beyond
        * [[StrBoundMaxLen]]). Empty map = file predates the extension.
        */
      chunkStrBounds: Map[Int, Array[(Array[Byte], Array[Byte])]] =
        Map.empty) {

    /** The footer-recorded sum of one chunk's present values (wrapped,
      * identical to what aggChunk's sweep would accumulate); None for
      * files predating the SUMS extension or non-integral columns.
      */
    def chunkSum(rgIdx: Int, colIdx: Int): Option[Long] =
      chunkSums.get(colIdx).map(_(rgIdx))

    /** Exact string (min, max) of one chunk's present values from the
      * STRB tail; None for pre-extension files or undeclared chunks.
      */
    def statsMinMaxS(rgIdx: Int, colIdx: Int): Option[(Array[Byte], Array[Byte])] =
      chunkStrBounds.get(colIdx).flatMap(a => Option(a(rgIdx)))
    /** Min/max for one chunk from page stats alone; None when any page
      * lacks stats. Metadata-only, so planning can stat-prune straight
      * from the footer cache without opening the file.
      */
    def statsMinMax(rgIdx: Int, colIdx: Int): Option[(Long, Long)] = {
      val pages = rowGroups(rgIdx).chunks(colIdx).pages
      val perPage = pages.map(ph => ph.stats.minInt.zip(ph.stats.maxInt))
      if (pages.isEmpty || perPage.exists(_.isEmpty)) None
      else Some((perPage.flatten.map(_._1).min, perPage.flatten.map(_._2).max))
    }

    /** Double twin of [[statsMinMax]] (v2 TDouble chunks). */
    def statsMinMaxD(rgIdx: Int, colIdx: Int): Option[(Double, Double)] = {
      val pages = rowGroups(rgIdx).chunks(colIdx).pages
      val perPage = pages.map(ph => ph.stats.minD.zip(ph.stats.maxD))
      if (pages.isEmpty || perPage.exists(_.isEmpty)) None
      else Some((perPage.flatten.map(_._1).min, perPage.flatten.map(_._2).max))
    }

    /** Int128 twin of [[statsMinMax]] (v2 TDecimalWide chunks): ((minHi,
      * minLo), (maxHi, maxLo)) in the wide unscaled domain.
      */
    def statsMinMaxW(rgIdx: Int, colIdx: Int)
        : Option[((Long, Long), (Long, Long))] = {
      val pages = rowGroups(rgIdx).chunks(colIdx).pages
      val perPage = pages.map(ph => ph.stats.minW.zip(ph.stats.maxW))
      if (pages.isEmpty || perPage.exists(_.isEmpty)) None
      else Some((
        perPage.flatten.map(_._1).minBy(identity)(Ordering.fromLessThan(
          (a, b) => cmp128(a._1, a._2, b._1, b._2) < 0)),
        perPage.flatten.map(_._2).maxBy(identity)(Ordering.fromLessThan(
          (a, b) => cmp128(a._1, a._2, b._1, b._2) < 0))))
    }

    /** True when any page of this column carries nulls — drives schema
      * nullability and disables aggregate pushdown (whose count/sum
      * contracts assume dense chunks).
      */
    def columnHasNulls(colIdx: Int): Boolean =
      rowGroups.exists(_.chunks(colIdx).pages.exists(_.nullCount > 0))

    def anyNulls: Boolean = columns.indices.exists(columnHasNulls)

    /** NULL count of one chunk, from footer page stats alone — what makes
      * a pushed COUNT(col) over a null-bearing table metadata-only
      * (count = rows − nulls, no page read).
      */
    def chunkNullCount(rgIdx: Int, colIdx: Int): Long =
      rowGroups(rgIdx).chunks(colIdx).pages.iterator.map(_.nullCount.toLong).sum
  }

  final class ColeFormatException(msg: String) extends RuntimeException(msg)

  // ---- page header serde (variable size; stats only when min/max present)
  // v1 layout is byte-identical to the reference; v2 appends one u32 null
  // count and, for TDouble columns, stores the stats min/max as raw IEEE
  // bits in the same i64 slots.

  def writePageHeader(out: Out, ph: PageHeader, version: Int = 1,
      isDouble: Boolean = false, isWide: Boolean = false): Unit = {
    out.u32(ph.uncompressedSize)
    out.u32(ph.compressedSize)
    out.u32(ph.numValues)
    out.u8(ph.encoding.id)
    val hasStats =
      if (isWide) ph.stats.minW.isDefined || ph.stats.maxW.isDefined
      else if (isDouble) ph.stats.minD.isDefined || ph.stats.maxD.isDefined
      else ph.stats.minInt.isDefined || ph.stats.maxInt.isDefined
    out.u8(if (hasStats) 1 else 0)
    if (hasStats) {
      if (isWide) { // each bound is two i64 lanes: hi then lo
        out.u8(if (ph.stats.minW.isDefined) 1 else 0)
        ph.stats.minW.foreach { case (hi, lo) => out.i64(hi); out.i64(lo) }
        out.u8(if (ph.stats.maxW.isDefined) 1 else 0)
        ph.stats.maxW.foreach { case (hi, lo) => out.i64(hi); out.i64(lo) }
      } else if (isDouble) {
        out.u8(if (ph.stats.minD.isDefined) 1 else 0)
        ph.stats.minD.foreach(d => out.i64(java.lang.Double.doubleToRawLongBits(d)))
        out.u8(if (ph.stats.maxD.isDefined) 1 else 0)
        ph.stats.maxD.foreach(d => out.i64(java.lang.Double.doubleToRawLongBits(d)))
      } else {
        out.u8(if (ph.stats.minInt.isDefined) 1 else 0)
        ph.stats.minInt.foreach(out.i64)
        out.u8(if (ph.stats.maxInt.isDefined) 1 else 0)
        ph.stats.maxInt.foreach(out.i64)
      }
      out.u32(ph.stats.nullCount)
    }
    if (version >= Version2) { out.u32(ph.nullCount); out.u32(ph.crc) }
  }

  def readPageHeader(c: Cursor, version: Int = 1,
      isDouble: Boolean = false, isWide: Boolean = false): PageHeader = {
    val unc = c.u32()
    val comp = c.u32()
    val n = c.u32()
    val enc = encOf(c.u8())
    val stats =
      if (c.u8() == 1) {
        if (isWide) {
          val mn = if (c.u8() == 1) Some((c.i64(), c.i64())) else None
          val mx = if (c.u8() == 1) Some((c.i64(), c.i64())) else None
          PageStats(None, None, c.u32(), None, None, mn, mx)
        } else if (isDouble) {
          val mn = if (c.u8() == 1)
            Some(java.lang.Double.longBitsToDouble(c.i64())) else None
          val mx = if (c.u8() == 1)
            Some(java.lang.Double.longBitsToDouble(c.i64())) else None
          PageStats(None, None, c.u32(), mn, mx)
        } else {
          val mn = if (c.u8() == 1) Some(c.i64()) else None
          val mx = if (c.u8() == 1) Some(c.i64()) else None
          PageStats(mn, mx, c.u32())
        }
      } else PageStats(None, None, 0)
    val nullCount = if (version >= Version2) c.u32() else 0
    val crc = if (version >= Version2) c.u32() else 0
    PageHeader(unc, comp, n, enc, stats, nullCount, crc)
  }

  /** CRC32 of a stored page body (what v2 headers carry and reads verify). */
  def bodyCrc(buf: Array[Byte], off: Int, len: Int): Int = {
    val crc = new java.util.zip.CRC32()
    crc.update(buf, off, len)
    crc.getValue.toInt
  }

  // ---- file metadata serde

  def writeMetadata(out: Out, meta: FileMeta): Unit = {
    meta.columns.foreach { col =>
      if (meta.version < Version2 && requiresV2(col.colType))
        throw new ColeFormatException(
          s"column '${col.name}' is ${col.colType}: only format v2 carries it")
    }
    out.u32(meta.columns.size)
    meta.columns.foreach { col =>
      val nameBytes = col.name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.u32(nameBytes.length)
      out.raw(nameBytes)
      out.u8(col.colType.id)
      out.u8(col.encoding.id)
      col.colType match { // DECIMALs self-describe their precision/scale
        case TDecimal(p, s) => out.u8(p); out.u8(s)
        case TDecimalWide(p, s) => out.u8(p); out.u8(s)
        case _ => ()
      }
    }
    out.u32(meta.rowGroups.size)
    meta.rowGroups.foreach { rg =>
      out.u32(rg.numRows)
      out.u32(rg.chunks.size)
      rg.chunks.zipWithIndex.foreach { case (cc, ci) =>
        out.i64(cc.fileOffset)
        out.i64(cc.totalSize)
        out.u32(cc.pages.size)
        cc.pages.foreach(writePageHeader(out, _, meta.version,
          meta.columns(ci).colType == TDouble, isWide(meta.columns(ci).colType)))
      }
    }
    // the COLE format stores total_rows as uint32 (reference format.h:89);
    // fail loudly rather than wrap silently — at scale, write more part
    // files (the DSv2 writer emits one per task), not bigger ones.
    if (meta.totalRows > 0xffffffffL)
      throw new ColeFormatException(
        s"COLE total_rows is uint32; ${meta.totalRows} rows exceed one file's capacity")
    out.u32(meta.totalRows.toInt)
    // v2 metadata-tail extension: per-column NDV upper bounds. Appended
    // AFTER the reference-shaped block, detected by magic — v1 stays
    // byte-identical to the reference, pre-extension v2 files (no tail)
    // parse unchanged.
    if (meta.version >= Version2 && meta.ndvBounds.nonEmpty) {
      require(meta.ndvBounds.size == meta.columns.size,
        "ndvBounds must align to columns")
      out.u32(NdvExtMagic)
      out.u32(meta.ndvBounds.size)
      meta.ndvBounds.foreach(out.i64)
    }
    // second optional tail: per-chunk integral sums, sorted by column
    // index (deterministic bytes — the metadata CRC covers this block)
    if (meta.version >= Version2 && meta.chunkSums.nonEmpty) {
      out.u32(SumExtMagic)
      out.u32(meta.chunkSums.size)
      meta.chunkSums.toSeq.sortBy(_._1).foreach { case (ci, sums) =>
        require(sums.length == meta.rowGroups.size,
          "chunkSums must align to row groups")
        out.u32(ci)
        sums.foreach(out.i64)
      }
    }
    // third optional tail: exact per-chunk string bounds, sorted by
    // column index; per row group a presence flag then min/max bytes
    if (meta.version >= Version2 && meta.chunkStrBounds.nonEmpty) {
      out.u32(StrExtMagic)
      out.u32(meta.chunkStrBounds.size)
      meta.chunkStrBounds.toSeq.sortBy(_._1).foreach { case (ci, bounds) =>
        require(bounds.length == meta.rowGroups.size,
          "chunkStrBounds must align to row groups")
        out.u32(ci)
        bounds.foreach {
          case null => out.u8(0)
          case (mn, mx) =>
            out.u8(1)
            out.u32(mn.length); out.raw(mn)
            out.u32(mx.length); out.raw(mx)
        }
      }
    }
  }

  /** `endPos`: end of the metadata block inside the cursor's buffer when
    * known (the v2 reader slices [metadata][crc]) — what bounds the
    * optional tail-extension probe; -1 = no extensions read.
    */
  def readMetadata(c: Cursor, version: Int = 1, endPos: Int = -1): FileMeta = {
    val nCols = c.u32()
    val cols = Seq.fill(nCols) {
      val nameLen = c.u32()
      val name = new String(c.bytes(nameLen), java.nio.charset.StandardCharsets.UTF_8)
      val tid = c.u8()
      val enc = encOf(c.u8())
      val tpe =
        if (tid == 7) TDecimal(c.u8(), c.u8())
        else if (tid == 8) TDecimalWide(c.u8(), c.u8())
        else typeOf(tid)
      ColeColumn(name, tpe, enc)
    }
    cols.foreach { col =>
      if (version < Version2 && requiresV2(col.colType))
        throw new ColeFormatException(
          s"v1 file declares a ${col.colType} column ('${col.name}'): corrupt metadata")
    }
    val nRgs = c.u32()
    val rgs = Seq.fill(nRgs) {
      val numRows = c.u32()
      val nChunks = c.u32()
      var ci = -1
      val chunks = Seq.fill(nChunks) {
        ci += 1
        val off = c.i64()
        val size = c.i64()
        val nPages = c.u32()
        ColumnChunkMeta(off, size, Seq.fill(nPages)(
          readPageHeader(c, version, cols(ci).colType == TDouble,
            isWide(cols(ci).colType))))
      }
      RowGroupMeta(numRows, chunks)
    }
    val totalRows = (c.u32().toLong) & 0xffffffffL
    val ndv: Seq[Long] =
      if (version >= Version2 && endPos >= 0 && endPos - c.pos >= 8 && {
        val save = c.pos; val m = c.u32(); c.pos = save; m == NdvExtMagic
      }) {
        c.u32() // magic
        val n = c.u32()
        require(n == nCols, s"NDV extension declares $n columns, file has $nCols")
        Seq.fill(n)(c.i64())
      } else Seq.empty
    val sums: Map[Int, Array[Long]] =
      if (version >= Version2 && endPos >= 0 && endPos - c.pos >= 8 && {
        val save = c.pos; val m = c.u32(); c.pos = save; m == SumExtMagic
      }) {
        c.u32() // magic
        val n = c.u32()
        Seq.fill(n) {
          val ci = c.u32()
          require(ci < nCols, s"SUMS extension names column $ci of $nCols")
          ci -> Array.fill(nRgs)(c.i64())
        }.toMap
      } else Map.empty
    val strBounds: Map[Int, Array[(Array[Byte], Array[Byte])]] =
      if (version >= Version2 && endPos >= 0 && endPos - c.pos >= 8 && {
        val save = c.pos; val m = c.u32(); c.pos = save; m == StrExtMagic
      }) {
        c.u32() // magic
        val n = c.u32()
        Seq.fill(n) {
          val ci = c.u32()
          require(ci < nCols, s"STRB extension names column $ci of $nCols")
          ci -> Array.fill(nRgs) {
            if (c.u8() == 0) null
            else {
              val mn = c.bytes(c.u32())
              val mx = c.bytes(c.u32())
              (mn, mx)
            }
          }
        }.toMap
      } else Map.empty
    FileMeta(cols, rgs, totalRows, version, ndv, sums, strBounds)
  }
}
