package graft.sources.cole

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration

import graft.sources.cole.ColeFormat._

/** String-column NDV bounds for the CBO, from DICTIONARY page headers
  * (r12 — closes "CBO has no string NDV").
  *
  * A DICTIONARY page body starts with its entry count
  * (`[dict_size u32]([len u32][bytes])* [ids]`, ColeCodec): the sum of
  * `dict_size` over a column's pages is a SOUND upper bound on its
  * distinct count — every distinct value appears in at least one page's
  * dictionary — and for the low-cardinality string keys dictionary
  * encoding targets (brands, types, flags), it is orders of magnitude
  * tighter than the row count the CBO would otherwise assume. Reading it
  * costs one 4-byte positioned read per page, cached per file
  * incarnation, and runs only under `spark.sql.cbo.enabled` (the lazy
  * colStats fold). The bound is still never GUESSED: a column with any
  * non-dictionary or compressed page reports nothing, exactly the r11
  * discipline.
  */
object ColeNdv {

  /** Dictionary-count probe reads that actually hit the filesystem —
    * spec-visible: repeated planning must not grow this.
    */
  val probeReads = new AtomicLong(0)

  private val cache = new LruCache[String, Option[Long]](16384)

  /** Sum of per-page dictionary entry counts for column `colIdx` of one
    * file — None when any page of the column is not an UNCOMPRESSED
    * DICTIONARY page (no sound bound is derivable from metadata then).
    */
  def dictNdvUpperBound(info: ColeMetaCache.FileInfo, colIdx: Int,
      conf: Configuration): Option[Long] = {
    // v2 footers carry the writer's own dictionary entry counts (r13):
    // the bound answers from the cached footer, ZERO positioned reads —
    // the page probe below remains the fallback for pre-extension files
    val footerBound = info.meta.ndvBounds.lift(colIdx).filter(_ >= 0L)
    if (footerBound.isDefined) return footerBound
    cache.getOrElseUpdate(s"${info.path}|${info.len}|${info.mtime}|$colIdx") {
      val meta = info.meta
      val colType = meta.columns(colIdx).colType
      // the header-skip re-serialization below is only exact when fed the
      // column's REAL type flags; additionally gate to TString — the only
      // type this bound is defined for — so a future non-string caller
      // gets a sound None, not silently wrong offsets (ADVICE r12)
      val eligible = colType == TString &&
        meta.rowGroups.forall(_.chunks(colIdx).pages.forall(ph =>
          ph.encoding == Dict && ph.compressedSize == ph.uncompressedSize))
      if (!eligible) None
      else {
        probeReads.incrementAndGet()
        val (fs, p) = ColeIO.resolve(info.path, conf)
        val in = fs.open(p)
        try {
          var sum = 0L
          val buf = new Array[Byte](4)
          meta.rowGroups.foreach { rg =>
            val cc = rg.chunks(colIdx)
            var off = cc.fileOffset
            cc.pages.foreach { ph =>
              // the data stream embeds each page's header before its
              // body (reference layout); the footer carries the SAME
              // header, so re-serializing it gives the exact skip
              val hdr = {
                val o = new ColeCodec.Out()
                writePageHeader(o, ph, meta.version,
                  colType == TDouble, isWide(colType))
                o.toBytes.length
              }
              // v2 null-bearing pages prefix a validity bitmap to the
              // body; the dict count follows it
              val bitmap =
                if (ph.nullCount > 0) (ph.numValues + 7) / 8 else 0
              in.readFully(off + hdr + bitmap, buf, 0, 4)
              sum += ((buf(0) & 0xffL)) | ((buf(1) & 0xffL) << 8) |
                ((buf(2) & 0xffL) << 16) | ((buf(3) & 0xffL) << 24)
              off += hdr + ph.compressedSize
            }
          }
          Some(sum)
        } finally in.close()
      }
    }
  }
}
