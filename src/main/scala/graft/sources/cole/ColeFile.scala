package graft.sources.cole

import java.io.BufferedOutputStream

import org.apache.hadoop.conf.Configuration

import graft.sources.cole.ColeCodec._
import graft.sources.cole.ColeFormat._

/** Decoded column chunk: exactly one of the arrays is non-null. */
final case class ColumnData(ints: Array[Int], longs: Array[Long], strings: Array[Array[Byte]])

/** Single-file reader: footer → metadata → per-chunk decode.
  * (Reading algorithm per reference docs/FORMAT.md "Reading Algorithm".)
  *
  * All access goes through the Hadoop FileSystem API (positioned
  * `readFully`, never seek state), so the same reader serves local files,
  * `file://` URIs, and distributed stores resolved from the Hadoop conf.
  */
final class ColeFileReader(path: String, conf: Configuration) extends AutoCloseable {
  /** Driver/CLI convenience: resolve through the active session's conf. */
  def this(path: String) = this(path, ColeIO.driverConf())

  private val (fs, hPath) = ColeIO.resolve(path, conf)
  private val fileLen = fs.getFileStatus(hPath).getLen
  private val in = { ColeIO.opens.incrementAndGet(); fs.open(hPath) }

  val meta: FileMeta = {
    if (fileLen < 20) throw new ColeFormatException(s"$path: too small to be a COLE file")
    // header check
    val header = readAt(0, 8)
    val hc = new Cursor(header, 0)
    if (hc.u32() != FileMagic) throw new ColeFormatException(s"$path: bad file magic")
    hc.u16(); hc.u16() // version major/minor
    // footer: [FOOT u32][metadata offset u64]
    val footer = readAt(fileLen - 12, 12)
    val fc = new Cursor(footer, 0)
    if (fc.u32() != FooterMagic) throw new ColeFormatException(s"$path: bad footer magic")
    val metaOffset = fc.i64()
    if (metaOffset < 8 || metaOffset >= fileLen - 12)
      throw new ColeFormatException(s"$path: metadata offset out of range")
    val metaBytes = readAt(metaOffset, (fileLen - 12 - metaOffset).toInt)
    readMetadata(new Cursor(metaBytes, 0))
  }

  private def readAt(offset: Long, len: Int): Array[Byte] = {
    val buf = new Array[Byte](len)
    in.readFully(offset, buf, 0, len)
    buf
  }

  /** Cursor over one page's decoded body. Sizes equal = stored (the only
    * layout the reference writes); differing = raw-DEFLATE page from this
    * writer's opt-in compression.
    */
  private def pageCursor(c: Cursor, ph: PageHeader): Cursor =
    if (ph.compressedSize == ph.uncompressedSize) new Cursor(c.buf, c.pos)
    else new Cursor(
      ColeCodec.inflate(c.buf, c.pos, ph.compressedSize, ph.uncompressedSize), 0)

  /** Read and decode one column chunk of one row group. */
  def readChunk(rgIdx: Int, colIdx: Int): ColumnData = {
    val rg = meta.rowGroups(rgIdx)
    val cc = rg.chunks(colIdx)
    val col = meta.columns(colIdx)
    val raw = readAt(cc.fileOffset, cc.totalSize.toInt)
    val c = new Cursor(raw, 0)
    // chunk = sequence of [page header][page data]; decode and concatenate
    val intParts = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    val longParts = scala.collection.mutable.ArrayBuffer[Array[Long]]()
    val strParts = scala.collection.mutable.ArrayBuffer[Array[Array[Byte]]]()
    cc.pages.foreach { _ =>
      val ph = readPageHeader(c)
      val pageData = pageCursor(c, ph)
      col.colType match {
        case TInt32 => intParts += decodeIntPage(pageData, ph)
        case TInt64 => longParts += decodeLongPage(pageData, ph)
        case TString => strParts += decodeStringPage(pageData, ph)
      }
      c.pos += ph.compressedSize
    }
    col.colType match {
      case TInt32 => ColumnData(intParts.flatten.toArray, null, null)
      case TInt64 => ColumnData(null, longParts.flatten.toArray, null)
      case TString => ColumnData(null, null, strParts.flatten.toArray)
    }
  }

  private def decodeIntPage(c: Cursor, ph: PageHeader): Array[Int] = ph.encoding match {
    case Plain => decodePlainInt(c, ph.numValues)
    case Rle => decodeRleInt(c, ph.numValues)
    case Delta => decodeDeltaInt(c, ph.numValues)
    case Dict => throw new ColeFormatException("DICTIONARY not valid for INT32")
  }

  private def decodeLongPage(c: Cursor, ph: PageHeader): Array[Long] = ph.encoding match {
    case Plain => decodePlainLong(c, ph.numValues)
    case Rle => decodeRleLong(c, ph.numValues)
    case Delta => decodeDeltaLong(c, ph.numValues)
    case Dict => throw new ColeFormatException("DICTIONARY not valid for INT64")
  }

  private def decodeStringPage(c: Cursor, ph: PageHeader): Array[Array[Byte]] = ph.encoding match {
    case Plain => decodePlainStrings(c, ph.numValues)
    case Dict => decodeDictStrings(c, ph.numValues)
    case other => throw new ColeFormatException(s"$other not valid for STRING")
  }

  /** One-pass numeric aggregate (count/sum/min/max) over a chunk without
    * materializing value arrays — the aggregate-pushdown read path. RLE
    * pages contribute per run, so a heavily-runny column aggregates in
    * far less than decode time.
    */
  def aggChunk(rgIdx: Int, colIdx: Int): ColeCodec.NumAgg = {
    val rg = meta.rowGroups(rgIdx)
    val cc = rg.chunks(colIdx)
    val colType = meta.columns(colIdx).colType
    require(colType == TInt32 || colType == TInt64,
      s"aggChunk requires a numeric column; '${meta.columns(colIdx).name}' is $colType")
    val raw = readAt(cc.fileOffset, cc.totalSize.toInt)
    val c = new Cursor(raw, 0)
    val acc = new ColeCodec.NumAgg
    cc.pages.foreach { _ =>
      val ph = readPageHeader(c)
      val pageData = pageCursor(c, ph)
      (colType, ph.encoding) match {
        case (TInt32, Plain) => aggPlainInt(pageData, ph.numValues, acc)
        case (TInt32, Rle) => aggRleInt(pageData, acc)
        case (TInt32, Delta) => aggDeltaInt(pageData, ph.numValues, acc)
        case (TInt64, Plain) => aggPlainLong(pageData, ph.numValues, acc)
        case (TInt64, Rle) => aggRleLong(pageData, acc)
        case (TInt64, Delta) => aggDeltaLong(pageData, ph.numValues, acc)
        case (t, e) => throw new ColeFormatException(s"$e not valid for $t")
      }
      c.pos += ph.compressedSize
    }
    acc
  }

  /** Min/max for a chunk from page stats alone (no page read); None when
    * any page lacks stats.
    */
  def statsMinMax(rgIdx: Int, colIdx: Int): Option[(Long, Long)] =
    meta.statsMinMax(rgIdx, colIdx)

  /** Dictionary view of an all-DICTIONARY string chunk: (entries, per-row
    * ids), with multi-page chunks merged by offsetting ids into one
    * concatenated entry table. Returns null when any page is PLAIN — the
    * caller falls back to materialized strings.
    */
  def readStringChunkDict(rgIdx: Int, colIdx: Int): (Array[Array[Byte]], Array[Int]) = {
    val rg = meta.rowGroups(rgIdx)
    val cc = rg.chunks(colIdx)
    if (meta.columns(colIdx).colType != TString) return null
    if (!cc.pages.forall(_.encoding == Dict)) return null
    val raw = readAt(cc.fileOffset, cc.totalSize.toInt)
    val c = new Cursor(raw, 0)
    val entries = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val idParts = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    cc.pages.foreach { _ =>
      val ph = readPageHeader(c)
      val (dict, ids) = decodeDictRaw(pageCursor(c, ph), ph.numValues)
      val base = entries.size
      entries ++= dict
      idParts += (if (base == 0) ids else ids.map(_ + base))
      c.pos += ph.compressedSize
    }
    (entries.toArray, idParts.flatten.toArray)
  }

  override def close(): Unit = in.close()
}

object ColeFileWriter {
  /** Hadoop-conf key carrying the opt-in page compression codec from the
    * write options down to every (possibly executor-side) file writer —
    * the conf already travels the whole write path, so no signature in
    * between needs to know.
    */
  val CompressKey = "graft.cole.compress"
}

/** Single-file writer: buffers one row group of columns, flushes pages +
  * accumulates metadata, writes footer on close.
  */
final class ColeFileWriter(path: String, columns: Seq[ColeColumn],
    conf: Configuration) extends AutoCloseable {

  /** Opt-in page compression ("deflate"); default writes remain
    * byte-identical to the reference layout (sizes equal = stored).
    */
  private val compress =
    conf != null && conf.get(ColeFileWriter.CompressKey, "none") == "deflate"
  /** Driver/CLI convenience: resolve through the active session's conf. */
  def this(path: String, columns: Seq[ColeColumn]) =
    this(path, columns, ColeIO.driverConf())

  private val stream = {
    val (fs, hPath) = ColeIO.resolve(path, conf)
    ColeIO.opens.incrementAndGet()
    fs.create(hPath, true)
  }
  private val out = new BufferedOutputStream(stream, 1 << 16)
  private var position = 0L
  private val rowGroups = scala.collection.mutable.ArrayBuffer[RowGroupMeta]()
  private var totalRows = 0L
  private var closed = false

  writeHeader()

  private def writeHeader(): Unit = {
    val o = new Out(8)
    o.u32(FileMagic); o.u16(VersionMajor); o.u16(VersionMinor)
    emit(o.toBytes)
  }

  private def emit(b: Array[Byte]): Unit = { out.write(b); position += b.length }

  /** Write one row group from fully-buffered column data (one page per
    * chunk, mirroring the reference writer's layout). Encoding may be
    * chosen per chunk — readers dispatch on the page header's encoding.
    */
  def writeRowGroup(cols: Seq[ColumnData], numRows: Int,
      encodings: Seq[Enc] = null): Unit = {
    require(cols.size == columns.size, "column count mismatch")
    val encs = if (encodings == null) columns.map(_.encoding) else encodings
    val chunkMetas = columns.indices.map { i =>
      val col = columns(i).copy(encoding = encs(i))
      val data = cols(i)
      val (encoded, stats) = col.colType match {
        case TInt32 =>
          val vals = data.ints
          val bytes = col.encoding match {
            case Plain => encodePlainInt(vals)
            case Rle => encodeRleInt(vals)
            case Delta => encodeDeltaInt(vals)
            case Dict => throw new ColeFormatException("DICTIONARY not valid for INT32")
          }
          val st = if (vals.isEmpty) PageStats(None, None, 0)
            else PageStats(Some(vals.min.toLong), Some(vals.max.toLong), 0)
          (bytes, st)
        case TInt64 =>
          val vals = data.longs
          val bytes = col.encoding match {
            case Plain => encodePlainLong(vals)
            case Rle => encodeRleLong(vals)
            case Delta => encodeDeltaLong(vals)
            case Dict => throw new ColeFormatException("DICTIONARY not valid for INT64")
          }
          val st = if (vals.isEmpty) PageStats(None, None, 0)
            else PageStats(Some(vals.min), Some(vals.max), 0)
          (bytes, st)
        case TString =>
          val vals = data.strings
          val bytes = col.encoding match {
            case Plain => encodePlainStrings(vals)
            case Dict => encodeDictStrings(vals)
            case other => throw new ColeFormatException(s"$other not valid for STRING")
          }
          (bytes, PageStats(None, None, 0))
      }
      val body = if (compress) ColeCodec.deflate(encoded) else encoded
      val ph = PageHeader(encoded.length, body.length, numRows, col.encoding, stats)
      val offset = position
      val hdr = new Out()
      writePageHeader(hdr, ph)
      emit(hdr.toBytes)
      emit(body)
      ColumnChunkMeta(offset, position - offset, Seq(ph))
    }
    rowGroups += RowGroupMeta(numRows, chunkMetas)
    totalRows += numRows
  }

  override def close(): Unit = {
    if (closed) return
    closed = true
    val metaOffset = position
    val o = new Out()
    writeMetadata(o, FileMeta(columns, rowGroups.toSeq, totalRows))
    o.u32(FooterMagic)
    o.i64(metaOffset)
    emit(o.toBytes)
    out.flush()
    stream.close()
  }
}
