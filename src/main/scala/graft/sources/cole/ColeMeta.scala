package graft.sources.cole

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.cole.ColeFormat._

/** Spark twin of the reference CLI's `scan` command (reference:
  * src/cli.cpp `scanFile`): COLE file metadata — schema, row groups,
  * per-page encodings and min/max/null statistics — surfaced as a
  * queryable DataFrame instead of printed text, so storage introspection
  * composes with the rest of the engine ("which pages would this
  * predicate skip?" is a WHERE clause).
  */
object ColeMeta {

  final case class PageRow(
      file: String,
      row_group: Int,
      column: String,
      col_type: String,
      encoding: String,
      page: Int,
      num_values: Int,
      uncompressed_size: Int,
      min_int: Option[Long],
      max_int: Option[Long],
      null_count: Int,
      min_double: Option[Double],
      max_double: Option[Double])

  private def typeName(t: ColeType): String = t match {
    case TInt32 => "INT32"
    case TInt64 => "INT64"
    case TString => "STRING"
    case TDouble => "DOUBLE"
    case TTimestamp => "TIMESTAMP"
    case TTimestampNtz => "TIMESTAMP_NTZ"
    case TFloatVec => "FLOAT_VECTOR"
    case TBinary => "BINARY"
    case TDecimal(p, s) => s"DECIMAL($p,$s)"
    case TDecimalWide(p, s) => s"DECIMAL($p,$s)" // wide lane, same SQL face
  }

  private def encName(e: Enc): String = e match {
    case Plain => "PLAIN"
    case Rle => "RLE"
    case Delta => "DELTA"
    case Dict => "DICTIONARY"
  }

  /** One row per page: the full physical layout of a `.col` table. */
  def describe(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rows = ColeUtil.listFiles(path).flatMap { file =>
      val reader = new ColeFileReader(file)
      try {
        val meta = reader.meta
        meta.rowGroups.zipWithIndex.flatMap { case (rg, rgIdx) =>
          rg.chunks.zip(meta.columns).flatMap { case (chunk, colMeta) =>
            chunk.pages.zipWithIndex.map { case (ph, pIdx) =>
              PageRow(file, rgIdx, colMeta.name, typeName(colMeta.colType),
                encName(ph.encoding), pIdx, ph.numValues, ph.uncompressedSize,
                ph.stats.minInt, ph.stats.maxInt, ph.stats.nullCount,
                ph.stats.minD, ph.stats.maxD)
            }
          }
        }
      } finally reader.close()
    }
    rows.toDF()
  }

  /** File-level summary (the reference scan's header block). */
  def summary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    ColeUtil.listFiles(path).map { file =>
      val reader = new ColeFileReader(file)
      try {
        val m = reader.meta
        (file, m.totalRows, m.rowGroups.size,
          m.columns.map(c => s"${c.name}:${typeName(c.colType)}").mkString(","))
      } finally reader.close()
    }.toDF("file", "total_rows", "n_row_groups", "schema")
  }
}
