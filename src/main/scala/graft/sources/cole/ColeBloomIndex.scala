package graft.sources.cole

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import graft.functions.Hashing
import graft.sources.cole.ColeCodec.{Cursor, Out}
import graft.sources.cole.ColeFormat.ColeFormatException

/** Optional Bloom sidecar index (`<file>.col.bloomidx`): planning-time
  * row-group skipping for string point lookups.
  *
  * Page stats prune numeric predicates and dictionaries prune low-
  * cardinality string chunks — but a HIGH-cardinality string column
  * (doc ids, URLs) encodes PLAIN, carries no stats, and every row group
  * survives planning for an equality probe. The sidecar stores one
  * geometry-sized bloom per (string column, row group) built over the
  * chunk's distinct values, so `col = 'x'` (and IN) drops every row
  * group the filter provably cannot match BEFORE an executor opens a
  * byte — the secondary-index shape that turns a 100 TB point lookup
  * from a full scan into a handful of row groups.
  *
  * The sidecar is advisory and self-invalidating: it records the data
  * file's length, and a mismatch (rewritten/compacted file) makes the
  * reader ignore it. False positives only cost a read; false negatives
  * cannot occur. Data files remain byte-identical to the reference
  * layout — the index is a separate file the reference tooling never
  * sees.
  */
object ColeBloomIndex {

  val Magic = 0x58444942 // "BIDX", little-endian
  val Version = 1
  val DefaultBits = 1 << 14 // 2 KB/rowgroup/column; ~10 bits/key at 1.6k distinct
  val DefaultHashes = 5

  /** Planning-time skips — spec-visible evidence the index engages. */
  val skippedRowGroups = new AtomicLong(0)

  final case class Index(numHashes: Int, numBits: Int,
      cols: Map[String, Array[Array[Long]]]) // column -> per-row-group words

  // keyed by "path@len": a rewritten file changes length and misses
  private val cache = new ConcurrentHashMap[String, Option[Index]]()

  def sidecarPath(colFile: String): String = colFile + ".bloomidx"

  private def positions(bytes: Array[Byte], numHashes: Int, numBits: Int): Array[Int] = {
    val a = Hashing.fnv1a64(bytes)
    val b = Hashing.mix64(a)
    val m = numBits.toLong
    val am = java.lang.Math.floorMod(a, m)
    val bm = java.lang.Math.floorMod(b, m)
    Array.tabulate(numHashes)(i =>
      java.lang.Math.floorMod(am + i.toLong * bm, m).toInt)
  }

  private def set(words: Array[Long], p: Int): Unit =
    words(p >>> 6) |= 1L << (p & 63)

  private def test(words: Array[Long], p: Int): Boolean =
    (words(p >>> 6) & (1L << (p & 63))) != 0L

  private def mightContain(words: Array[Long], bytes: Array[Byte],
      numHashes: Int, numBits: Int): Boolean =
    positions(bytes, numHashes, numBits).forall(test(words, _))

  /** Build (or rebuild) sidecars for `cols` over every data file of
    * `table`. Returns the number of files indexed. Blooms are built over
    * each chunk's DISTINCT values (the dictionary view when present), so
    * build cost tracks cardinality, not row count.
    */
  def build(table: String, cols: Seq[String], conf: Configuration,
      numBits: Int = DefaultBits, numHashes: Int = DefaultHashes): Int = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    val files = ColeIO.listPartitioned(table, conf)
    var indexed = 0
    files.foreach { case (st, _) =>
      val file = st.getPath.toString
      val reader = new ColeFileReader(file, conf)
      try {
        val meta = reader.meta
        val nameToIdx = meta.columns.map(_.name).zipWithIndex.toMap
        val present = cols.filter(c => nameToIdx.get(c)
          .exists(i => meta.columns(i).colType == ColeFormat.TString))
        if (present.nonEmpty) {
          val perCol = present.map { c =>
            val ci = nameToIdx(c)
            c -> meta.rowGroups.indices.map { rg =>
              val words = new Array[Long](numBits / 64)
              val dict = reader.readStringChunkDict(rg, ci)
              val vals = if (dict != null) dict._1 else reader.readChunk(rg, ci).strings
              vals.foreach(v =>
                positions(v, numHashes, numBits).foreach(set(words, _)))
              words
            }.toArray
          }
          val o = new Out()
          o.u32(Magic); o.u16(Version); o.u16(numHashes); o.u32(numBits)
          o.i64(st.getLen)
          o.u32(perCol.size)
          perCol.foreach { case (name, per) =>
            val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            o.u32(nb.length); o.raw(nb)
            o.u32(per.length)
            per.foreach(words => words.foreach(o.i64))
          }
          val (fs, _) = ColeIO.resolve(file, conf)
          val out = fs.create(new HPath(sidecarPath(file)), true)
          try out.write(o.toBytes) finally out.close()
          cache.remove(s"$file@${st.getLen}")
          indexed += 1
        }
      } finally reader.close()
    }
    indexed
  }

  private def load(colFile: String, expectLen: Long,
      conf: Configuration): Option[Index] =
    cache.computeIfAbsent(s"$colFile@$expectLen", { _ =>
      try {
        val (fs, _) = ColeIO.resolve(colFile, conf)
        val p = new HPath(sidecarPath(colFile))
        if (!fs.exists(p)) None
        else {
          val len = fs.getFileStatus(p).getLen
          val in = fs.open(p)
          val buf = try {
            val b = new Array[Byte](len.toInt); in.readFully(0, b, 0, b.length); b
          } finally in.close()
          val c = new Cursor(buf, 0)
          if (c.u32() != Magic || c.u16() != Version)
            throw new ColeFormatException(s"${sidecarPath(colFile)}: bad magic/version")
          val nh = c.u16(); val nb = c.u32()
          val indexedLen = c.i64()
          if (indexedLen != expectLen) None // stale: data file rewritten
          else {
            val nCols = c.u32()
            val cols = (0 until nCols).map { _ =>
              val name = new String(c.bytes(c.u32()),
                java.nio.charset.StandardCharsets.UTF_8)
              val nRg = c.u32()
              name -> Array.fill(nRg)(Array.fill(nb / 64)(c.i64()))
            }.toMap
            Some(Index(nh, nb, cols))
          }
        }
      } catch { case _: Exception => None } // advisory: never fail a scan
    })

  /** True when the sidecar PROVES no row of this row group can satisfy
    * some claimed string equality/membership predicate.
    */
  def skips(colFile: String, fileLen: Long, rgIdx: Int,
      preds: Array[ColePredicate], conf: Configuration): Boolean = {
    if (!preds.exists(p => p.op == "eqs" || p.op == "ins")) return false
    load(colFile, fileLen, conf) match {
      case Some(idx) =>
        val skip = preds.exists { p =>
          idx.cols.get(p.column).exists { per =>
            rgIdx < per.length && (p.op match {
              case "eqs" =>
                !mightContain(per(rgIdx), p.strValue, idx.numHashes, idx.numBits)
              case "ins" =>
                p.strValues.forall(v =>
                  !mightContain(per(rgIdx), v, idx.numHashes, idx.numBits))
              case _ => false
            })
          }
        }
        if (skip) skippedRowGroups.incrementAndGet()
        skip
      case None => false
    }
  }
}
