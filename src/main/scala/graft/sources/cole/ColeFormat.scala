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

  sealed abstract class ColeType(val id: Int)
  case object TInt32 extends ColeType(0)
  case object TInt64 extends ColeType(1)
  case object TString extends ColeType(2)
  def typeOf(id: Int): ColeType = id match {
    case 0 => TInt32
    case 1 => TInt64
    case 2 => TString
    case other => throw new ColeFormatException(s"Unknown column type id: $other")
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

  final case class PageStats(minInt: Option[Long], maxInt: Option[Long], nullCount: Int)
  final case class PageHeader(uncompressedSize: Int, compressedSize: Int,
      numValues: Int, encoding: Enc, stats: PageStats)
  final case class ColumnChunkMeta(fileOffset: Long, totalSize: Long,
      pages: Seq[PageHeader])
  final case class RowGroupMeta(numRows: Int, chunks: Seq[ColumnChunkMeta])
  final case class ColeColumn(name: String, colType: ColeType, encoding: Enc)
  final case class FileMeta(columns: Seq[ColeColumn], rowGroups: Seq[RowGroupMeta],
      totalRows: Long) {
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
  }

  final class ColeFormatException(msg: String) extends RuntimeException(msg)

  // ---- page header serde (variable size; stats only when min/max present)

  def writePageHeader(out: Out, ph: PageHeader): Unit = {
    out.u32(ph.uncompressedSize)
    out.u32(ph.compressedSize)
    out.u32(ph.numValues)
    out.u8(ph.encoding.id)
    val hasStats = ph.stats.minInt.isDefined || ph.stats.maxInt.isDefined
    out.u8(if (hasStats) 1 else 0)
    if (hasStats) {
      out.u8(if (ph.stats.minInt.isDefined) 1 else 0)
      ph.stats.minInt.foreach(out.i64)
      out.u8(if (ph.stats.maxInt.isDefined) 1 else 0)
      ph.stats.maxInt.foreach(out.i64)
      out.u32(ph.stats.nullCount)
    }
  }

  def readPageHeader(c: Cursor): PageHeader = {
    val unc = c.u32()
    val comp = c.u32()
    val n = c.u32()
    val enc = encOf(c.u8())
    val stats =
      if (c.u8() == 1) {
        val mn = if (c.u8() == 1) Some(c.i64()) else None
        val mx = if (c.u8() == 1) Some(c.i64()) else None
        PageStats(mn, mx, c.u32())
      } else PageStats(None, None, 0)
    PageHeader(unc, comp, n, enc, stats)
  }

  // ---- file metadata serde

  def writeMetadata(out: Out, meta: FileMeta): Unit = {
    out.u32(meta.columns.size)
    meta.columns.foreach { col =>
      val nameBytes = col.name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.u32(nameBytes.length)
      out.raw(nameBytes)
      out.u8(col.colType.id)
      out.u8(col.encoding.id)
    }
    out.u32(meta.rowGroups.size)
    meta.rowGroups.foreach { rg =>
      out.u32(rg.numRows)
      out.u32(rg.chunks.size)
      rg.chunks.foreach { cc =>
        out.i64(cc.fileOffset)
        out.i64(cc.totalSize)
        out.u32(cc.pages.size)
        cc.pages.foreach(writePageHeader(out, _))
      }
    }
    // the COLE format stores total_rows as uint32 (reference format.h:89);
    // fail loudly rather than wrap silently — at scale, write more part
    // files (the DSv2 writer emits one per task), not bigger ones.
    if (meta.totalRows > 0xffffffffL)
      throw new ColeFormatException(
        s"COLE total_rows is uint32; ${meta.totalRows} rows exceed one file's capacity")
    out.u32(meta.totalRows.toInt)
  }

  def readMetadata(c: Cursor): FileMeta = {
    val nCols = c.u32()
    val cols = Seq.fill(nCols) {
      val nameLen = c.u32()
      val name = new String(c.bytes(nameLen), java.nio.charset.StandardCharsets.UTF_8)
      ColeColumn(name, typeOf(c.u8()), encOf(c.u8()))
    }
    val nRgs = c.u32()
    val rgs = Seq.fill(nRgs) {
      val numRows = c.u32()
      val nChunks = c.u32()
      val chunks = Seq.fill(nChunks) {
        val off = c.i64()
        val size = c.i64()
        val nPages = c.u32()
        ColumnChunkMeta(off, size, Seq.fill(nPages)(readPageHeader(c)))
      }
      RowGroupMeta(numRows, chunks)
    }
    FileMeta(cols, rgs, (c.u32().toLong) & 0xffffffffL)
  }
}
