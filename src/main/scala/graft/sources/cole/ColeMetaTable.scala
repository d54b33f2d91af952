package graft.sources.cole

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Read-only metadata tables resolved by [[ColeCatalog]] under
  * Iceberg-style `$`-suffixed identifiers:
  *
  *   - `` cole.ns.`t$history` `` — the version log: one row per commit
  *     (version, timestamp, operation, files added/removed). Requires
  *     versioning; resolves empty-schema-safe either way.
  *   - `` cole.ns.`t$files` `` — the live file inventory: one row per
  *     data file (path, partition, size, rows, row groups).
  *
  * Warehouse introspection as plain SQL — "what changed last night?" and
  * "how fragmented is this table?" compose with joins and aggregates
  * instead of needing an API. Rows are computed on the DRIVER at scan
  * time from the same cached metadata planning already holds (the
  * version log / footer cache) and shipped as one partition — these
  * tables are commit-count / file-count sized, never data-sized.
  */
class ColeMetaTable(path: String, kind: String, conf: Configuration)
    extends Table with SupportsRead {

  override def name(): String = s"cole:$path$$$kind"

  override def schema(): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("files_added", IntegerType, nullable = false),
      StructField("files_removed", IntegerType, nullable = false),
      // retention visibility for CDC consumers: versions at or below the
      // expiry horizon are no longer guaranteed reconstructible — the
      // earliest un-expired version is `MIN(version) WHERE NOT expired`,
      // the safe floor for a new stream's startingVersion
      StructField("expired", BooleanType, nullable = false),
      // FOLD-debt provenance (r17, verdict ask #6): true when this
      // commit's added files (those still live) lack a fold tail (SUMS,
      // or STRB for string columns) — the nightly
      // `compact_debt(fold_debt => true)` trigger is now a WHERE clause
      // on $history instead of a $files sweep
      StructField("adds_fold_debt", BooleanType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("partition", StringType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("row_groups", IntegerType, nullable = false),
      // merge-on-read visibility: rows vectored away (0 = no vector) and
      // the LIVE count after subtraction — "how much latent rewrite debt
      // does this table carry?" is a SQL aggregate away
      StructField("deleted_rows", LongType, nullable = false),
      StructField("live_rows", LongType, nullable = false),
      // FOLD debt (r16): the file's footer lacks the v2 SUMS tail, so
      // its presence forfeits the metadata-only aggregate path for the
      // whole table (the fold is all-or-nothing per query) —
      // `compact_debt(fold_debt => true)` migrates exactly these
      StructField("sums_missing", BooleanType, nullable = false),
      // r17: same debt for the STRB tail — a string-column file without
      // exact per-chunk string bounds forfeits metadata-only string
      // MIN/MAX; false for files with no string columns
      StructField("strb_missing", BooleanType, nullable = false)))
    // the per-PARTITION rollup of $files: layout health at directory
    // grain — "which days are fragmented / carry vector debt / are
    // oversized?" for identity, bucket, and temporal layouts alike
    case "partitions" => StructType(Seq(
      StructField("partition", StringType, nullable = false),
      StructField("files", IntegerType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("deleted_rows", LongType, nullable = false),
      StructField("live_rows", LongType, nullable = false),
      // count of pre-SUMS files in the directory (fold debt, r16)
      StructField("sums_missing", IntegerType, nullable = false),
      // count of string-column files without STRB bounds (r17)
      StructField("strb_missing", IntegerType, nullable = false)))
    // named refs (r14): tags and branches — "what's pinned, what's
    // staged?" as SQL; `staged_files` counts a branch's unpublished files
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false),
      StructField("head", LongType, nullable = false),
      StructField("staged_files", IntegerType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown COLE metadata table '$$${other}' (history|files|partitions|refs)")
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ColeMetaTableScan(path, kind, schema(), conf)
}

class ColeMetaTableScan(path: String, kind: String, tschema: StructType,
    conf: Configuration) extends Scan with Batch {

  override def readSchema(): StructType = tschema
  override def toBatch: Batch = this
  override def description(): String = s"ColeMetaTableScan $path$$$kind"

  // driver-side: KB-scale metadata, one partition
  override def planInputPartitions(): Array[InputPartition] = {
    val rows: Array[Array[Any]] = kind match {
      case "history" =>
        if (!ColeVersions.enabled(path, conf)) Array.empty
        else {
          val horizon = ColeVersions.expiryHorizon(path, conf)
          // live files carrying fold debt, by path — a commit whose adds
          // are all compacted away (or debt-free) reads false
          // normalize debt files to table-root-RELATIVE paths (the form
          // commit records store in `adds`): bare-basename matching
          // aliased equally-named files across partition directories.
          // Files outside the root (a clone's foreign files) cannot have
          // been added by a local commit and drop out.
          val (hfs, _) = ColeIO.resolve(path, conf)
          val debtRels: Set[String] = ColeMetaCache.infos(path, conf)
            .collect { case i if i.meta.chunkSums.isEmpty ||
              (i.meta.columns.exists(_.colType == ColeFormat.TString) &&
                i.meta.chunkStrBounds.isEmpty) => i.path }
            .flatMap(p => scala.util.Try(
              ColeVersions.relOf(hfs, path, p)).toOption).toSet
          ColeVersions.records(path, conf).map(r =>
            Array[Any](r.version, r.ts * 1000L, r.op,
              r.adds.size, r.removes.size, r.version <= horizon,
              r.adds.exists(debtRels.contains))).toArray
        }
      case "files" =>
        val (dfs, _) = ColeIO.resolve(path, conf)
        val dvCount = dvCounter(dfs)
        ColeMetaCache.infos(path, conf).map { i =>
          val part = i.partValues.map { case (k, v) => s"$k=$v" }.mkString("/")
          val dv = dvCount(i)
          Array[Any](i.path, part, i.len, i.meta.totalRows,
            i.meta.rowGroups.size, dv, i.meta.totalRows - dv,
            i.meta.chunkSums.isEmpty,
            i.meta.columns.exists(_.colType == ColeFormat.TString) &&
              i.meta.chunkStrBounds.isEmpty)
        }.toArray
      case "partitions" =>
        val (dfs, _) = ColeIO.resolve(path, conf)
        val dvCount = dvCounter(dfs)
        ColeMetaCache.infos(path, conf)
          .groupBy(_.partValues.map { case (k, v) => s"$k=$v" }.mkString("/"))
          .toArray.sortBy(_._1).map { case (part, is) =>
            val rows = is.map(_.meta.totalRows).sum
            val dv = is.map(dvCount).sum
            Array[Any](part, is.size, is.map(_.len).sum, rows, dv, rows - dv,
              is.count(_.meta.chunkSums.isEmpty),
              is.count(i => i.meta.columns.exists(_.colType == ColeFormat.TString) &&
                i.meta.chunkStrBounds.isEmpty))
          }
      case "refs" =>
        val tags = ColeRefs.tags(path, conf).toSeq.sorted.map { case (n, v) =>
          Array[Any](n, "tag", v, v, 0)
        }
        val branches = ColeRefs.branches(path, conf).map { b =>
          Array[Any](b.name, "branch", b.fork, b.head, b.stagedFiles)
        }
        // zero-copy clone pins: which external clones hold my history
        val clones = ColeRefs.clonePins(path, conf).toSeq.sorted
          .map { case (n, v) => Array[Any](n, "clone", v, v, 0) }
        (tags ++ branches ++ clones).toArray
    }
    Array(ColeMetaRows(rows))
  }

  /** Deleted-row count of one file from its adjacent .dv sidecar —
    * except a clone's FOREIGN files, whose adjacent sidecars are the
    * SOURCE's live state (written after the pin, they do not apply to
    * this table's snapshot; ADVICE r13): those report 0.
    */
  private def dvCounter(dfs: org.apache.hadoop.fs.FileSystem)
      : ColeMetaCache.FileInfo => Long = {
    val foreign: String => Boolean =
      if (ColeClone.read(path, conf).isEmpty) _ => false
      else ColeClone.isForeign(path, _, conf)
    i => if (foreign(i.path)) 0L
      else ColeDv.read(dfs, i.path, i.len, i.mtime)
        .map(_.length.toLong).getOrElse(0L)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ColeMetaReaderFactory(tschema)
}

final case class ColeMetaRows(rows: Array[Array[Any]]) extends InputPartition

/** Driver-computed row set as a LocalScan — the result surface of
  * `CALL cole.system.*` procedures (Spark requires procedure output to
  * be a local scan; these are stats-row sized).
  */
class ColeLocalScan(tschema: StructType, rawRows: Array[Array[Any]])
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = tschema
  override def rows(): Array[InternalRow] = rawRows.map(r =>
    InternalRow.fromSeq(r.toSeq.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    }))
}

class ColeMetaReaderFactory(tschema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[ColeMetaRows].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow.fromSeq(
        rows(i).toSeq.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        })
      override def close(): Unit = ()
    }
}
