package graft.sources.cole

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for COLE tables — the maintenance op every
  * streaming sink needs: each epoch commits its own part files, so a
  * long-running `writeStream.format("cole")` accumulates thousands of
  * tiny files whose per-file planning / open / footer costs eventually
  * dominate scans. `compact` rewrites each leaf directory (the table
  * root, or every `key=value` partition directory) into
  * ceil(bytes / targetBytes) files, preserving the partition layout.
  *
  * Visibility: compacted output is first written to a dotted
  * `.compact-*` scratch directory — invisible to readers, whose listing
  * matches only `*.col` under `key=value` paths — then renamed into
  * place before the old files are deleted. Readers concurrent with the
  * swap can see a batch twice (rename-in before delete-old), never a
  * partial file: run it as an offline maintenance pass, like OPTIMIZE
  * on any log-less table format.
  *
  * Reading back through the connector (not byte concatenation) is
  * deliberate: it re-packs row groups to `rowGroupSize`, re-chooses
  * encodings per chunk, and optionally applies page compression — so
  * compaction doubles as re-layout.
  */
object ColeCompact {

  final case class Stats(dirs: Int, compactedDirs: Int, filesBefore: Int,
      filesAfter: Int, bytesBefore: Long, bytesAfter: Long)

  def compact(spark: SparkSession, table: String,
      targetBytes: Long = 128L << 20, rowGroupSize: Int = 65536,
      compress: Option[String] = None): Stats = {
    val conf = ColeIO.driverConf()
    val (fs, _) = ColeIO.resolve(table, conf)
    val files = ColeIO.listPartitioned(table, conf)
    val byDir = files.groupBy(_._1.getPath.getParent).toSeq
      .sortBy(_._1.toString)
    var (compacted, filesAfter, bytesAfter) = (0, 0, 0L)
    byDir.foreach { case (dir, sts) =>
      val bytes = sts.map(_._1.getLen).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (sts.size <= nOut) {
        filesAfter += sts.size; bytesAfter += bytes
      } else {
        val stamp = java.lang.Long.toHexString(System.nanoTime())
        val tmp = new HPath(dir, s".compact-$stamp")
        var w = spark.read.format("cole").load(dir.toString)
          .coalesce(nOut)
          .write.format("cole").mode("overwrite")
          .option("rowGroupSize", rowGroupSize.toString)
        compress.foreach(c => w = w.option("compress", c))
        w.save(tmp.toString)
        val outs = fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".col"))
        outs.zipWithIndex.foreach { case (s, i) =>
          require(fs.rename(s.getPath, new HPath(dir, s"compact-$stamp-$i.col")),
            s"rename failed for ${s.getPath}")
        }
        // carry bloom sidecars across the rewrite: note which columns the
        // old files indexed, drop the now-orphaned sidecars with their
        // data files, and rebuild over the compacted layout
        val indexedCols = sts.flatMap(s =>
          ColeBloomIndex.indexedColumns(s._1.getPath.toString, conf)).distinct
        sts.foreach { s =>
          fs.delete(s._1.getPath, false)
          fs.delete(new HPath(ColeBloomIndex.sidecarPath(s._1.getPath.toString)), false)
        }
        fs.delete(tmp, true)
        if (indexedCols.nonEmpty)
          ColeBloomIndex.build(dir.toString, indexedCols, conf)
        compacted += 1
        filesAfter += outs.length
        bytesAfter += outs.map(_.getLen).sum
      }
    }
    Stats(byDir.size, compacted, files.size, filesAfter,
      files.map(_._1.getLen).sum, bytesAfter)
  }
}
