package graft.sources.cole

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
  /** v2: header carries a content fingerprint of the data file's footer
    * region, verified at load — (length, mtime) alone misses a same-length
    * rewrite within one mtime tick on coarse-granularity filesystems
    * (1s on HDFS), which would leave a stale sidecar trusted and silently
    * skip row groups that now contain the probed value.
    */
  val Version = 2
  /** Bits per distinct value: ~1% fp with 5 hashes — blooms are sized
    * PER ROW GROUP from the chunk's actual cardinality, so a compacted
    * 64k-row group gets a proportionally larger (still KB-scale) bloom
    * instead of an overloaded fixed one.
    */
  val BitsPerKey = 10
  val MinBits = 1 << 10
  val DefaultHashes = 5

  /** Planning-time skips — spec-visible evidence the index engages. */
  val skippedRowGroups = new AtomicLong(0)

  // column -> per row group (numBits, bitset words)
  final case class Index(numHashes: Int,
      cols: Map[String, Array[(Int, Array[Long])]])

  // keyed by "path@len@mtime": a rewritten file misses (same contract as
  // ColeMetaCache); LRU-bounded too — blooms for dropped/rewritten files
  // must not accumulate on a long-lived driver
  private val MaxEntries = 1024
  private val cache = new LruCache[String, Option[Index]](MaxEntries)

  def sidecarPath(colFile: String): String = colFile + ".bloomidx"

  /** Drop a cached sidecar so the next probe re-loads (and re-verifies
    * the content fingerprint). The stat-keyed cache cannot see a
    * same-length same-mtime rewrite on its own.
    */
  private[cole] def invalidate(colFile: String, len: Long, mtime: Long): Unit =
    cache.remove(s"$colFile@$len@$mtime")

  private[cole] def positions(bytes: Array[Byte], numHashes: Int, numBits: Int): Array[Int] = {
    val a = Hashing.fnv1a64(bytes)
    val b = Hashing.mix64(a)
    val m = numBits.toLong
    val am = java.lang.Math.floorMod(a, m)
    // step reduced into [1, m-1]: a step of 0 (b ≡ 0 mod m) would land
    // every probe on one bit, collapsing the filter to 1 effective hash
    // for those keys (fp-rate only — never false negatives)
    val bm = java.lang.Math.floorMod(b, m - 1) + 1
    Array.tabulate(numHashes)(i =>
      java.lang.Math.floorMod(am + i.toLong * bm, m).toInt)
  }

  private[cole] def set(words: Array[Long], p: Int): Unit =
    words(p >>> 6) |= 1L << (p & 63)

  private def test(words: Array[Long], p: Int): Boolean =
    (words(p >>> 6) & (1L << (p & 63))) != 0L

  private[cole] def mightContain(words: Array[Long], bytes: Array[Byte],
      numHashes: Int, numBits: Int): Boolean =
    positions(bytes, numHashes, numBits).forall(test(words, _))

  /** Content fingerprint of a data file: FNV-1a over its tail (footer +
    * metadata region, ≤4 KiB). One small positioned read; any rewrite
    * moves row-group offsets/stats in the footer, so the fingerprint
    * changes even when length and mtime do not.
    */
  private[cole] def contentFingerprint(colFile: String, conf: Configuration): Long = {
    val (fs, p) = ColeIO.resolve(colFile, conf)
    val st = fs.getFileStatus(p)
    val n = math.min(st.getLen, 4096L).toInt
    val b = new Array[Byte](n)
    val in = fs.open(p)
    try in.readFully(st.getLen - n, b, 0, n) finally in.close()
    Hashing.fnv1a64(b)
  }

  private def sizeFor(nDistinct: Int): Int = {
    val want = math.max(MinBits, nDistinct.toLong * BitsPerKey)
    var b = 64L
    while (b < want) b <<= 1
    b.toInt
  }

  /** Build (or rebuild) sidecars for `cols` over every data file of
    * `table`. Returns the number of files indexed. Blooms are built over
    * each chunk's DISTINCT values (the dictionary view when present), so
    * build cost tracks cardinality, not row count. Sidecars are written
    * to a dotted temp name and renamed in, so readers never observe a
    * torn index.
    */
  def build(table: String, cols: Seq[String], conf: Configuration,
      numHashes: Int = DefaultHashes): Int = {
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
              val dict = reader.readStringChunkDict(rg, ci)
              val vals = if (dict != null) dict._1 else reader.readChunk(rg, ci).strings
              val numBits = sizeFor(vals.length)
              val words = new Array[Long](numBits / 64)
              // v2 nullable chunks materialize null slots as null entries;
              // NULL never equals a probe value, so it contributes no bits
              vals.foreach(v => if (v != null)
                positions(v, numHashes, numBits).foreach(set(words, _)))
              (numBits, words)
            }.toArray
          }
          val o = new Out()
          o.u32(Magic); o.u16(Version); o.u16(numHashes)
          o.i64(st.getLen)
          o.i64(st.getModificationTime)
          o.i64(contentFingerprint(file, conf))
          o.u32(perCol.size)
          perCol.foreach { case (name, per) =>
            val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            o.u32(nb.length); o.raw(nb)
            o.u32(per.length)
            per.foreach { case (numBits, words) =>
              o.u32(numBits); words.foreach(o.i64)
            }
          }
          val (fs, _) = ColeIO.resolve(file, conf)
          val tmp = new HPath(sidecarPath(file) + s".tmp-${System.nanoTime()}")
          val out = fs.create(tmp, true)
          try out.write(o.toBytes) finally out.close()
          fs.delete(new HPath(sidecarPath(file)), false)
          require(fs.rename(tmp, new HPath(sidecarPath(file))),
            s"sidecar rename failed for $file")
          cache.remove(s"$file@${st.getLen}@${st.getModificationTime}")
          indexed += 1
        }
      } finally reader.close()
    }
    indexed
  }

  /** Columns a data file's sidecar indexes (empty when none/unreadable) —
    * lets maintenance ops (compaction) rebuild equivalent indexes after a
    * rewrite. Reads the header regardless of staleness: the question is
    * what WAS indexed, not whether it is still valid.
    */
  def indexedColumns(colFile: String, conf: Configuration): Seq[String] =
    try {
      val (fs, _) = ColeIO.resolve(colFile, conf)
      val p = new HPath(sidecarPath(colFile))
      if (!fs.exists(p)) Seq.empty
      else {
        val len = fs.getFileStatus(p).getLen
        val in = fs.open(p)
        val buf = try {
          val b = new Array[Byte](len.toInt); in.readFully(0, b, 0, b.length); b
        } finally in.close()
        val c = new Cursor(buf, 0)
        if (c.u32() != Magic || c.u16() != Version) Seq.empty
        else {
          c.u16() // numHashes
          c.i64(); c.i64(); c.i64() // data-file length + mtime + fingerprint (irrelevant here)
          val nCols = c.u32()
          (0 until nCols).map { _ =>
            val name = new String(c.bytes(c.u32()),
              java.nio.charset.StandardCharsets.UTF_8)
            val nRg = c.u32()
            (0 until nRg).foreach { _ =>
              val nb = c.u32()
              c.pos += (nb / 64) * 8 // skip the words
            }
            name
          }
        }
      }
    } catch { case _: Exception => Seq.empty }

  private def load(colFile: String, expectLen: Long, expectMtime: Long,
      conf: Configuration): Option[Index] = {
    cache.getOrElseUpdate(s"$colFile@$expectLen@$expectMtime") {
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
          val nh = c.u16()
          val indexedLen = c.i64()
          val indexedMtime = c.i64()
          val indexedFp = c.i64()
          // stale when length or mtime moved — and even when both match,
          // the footer fingerprint must agree: a same-length rewrite
          // within one mtime tick (coarse-granularity filesystems) is
          // only visible in content
          if (indexedLen != expectLen || indexedMtime != expectMtime ||
              indexedFp != contentFingerprint(colFile, conf)) None
          else {
            val nCols = c.u32()
            val cols = (0 until nCols).map { _ =>
              val name = new String(c.bytes(c.u32()),
                java.nio.charset.StandardCharsets.UTF_8)
              val nRg = c.u32()
              name -> Array.fill(nRg) {
                val nb = c.u32()
                if (nb <= 0 || nb % 64 != 0)
                  throw new ColeFormatException(
                    s"${sidecarPath(colFile)}: invalid bloom geometry $nb")
                (nb, Array.fill(nb / 64)(c.i64()))
              }
            }.toMap
            Some(Index(nh, cols))
          }
        }
      } catch { case _: Exception => None } // advisory: never fail a scan
    }
  }

  /** True when the sidecar PROVES no row of this row group can satisfy
    * some claimed string equality/membership predicate.
    */
  def skips(colFile: String, fileLen: Long, fileMtime: Long, rgIdx: Int,
      preds: Array[ColePredicate], conf: Configuration): Boolean = try {
    if (!preds.exists(p => p.op == "eqs" || p.op == "ins")) return false
    load(colFile, fileLen, fileMtime, conf) match {
      case Some(idx) =>
        val skip = preds.exists { p =>
          idx.cols.get(p.column).exists { per =>
            rgIdx < per.length && {
              val (numBits, words) = per(rgIdx)
              p.op match {
                case "eqs" =>
                  !mightContain(words, p.strValue, idx.numHashes, numBits)
                case "ins" =>
                  p.strValues.forall(v =>
                    !mightContain(words, v, idx.numHashes, numBits))
                case _ => false
              }
            }
          }
        }
        if (skip) skippedRowGroups.incrementAndGet()
        skip
      case None => false
    }
  } catch { case _: Exception => false } // advisory: never fail planning
}
