package graft.sources.cole

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.connector.catalog.ColumnDefaultValue
import org.apache.spark.sql.types._

/** Column DEFAULT values — ANSI `DEFAULT` for COLE tables.
  *
  * Two halves, following Spark's own split:
  *
  *   - '''CURRENT default''' (INSERT-side): what an INSERT that omits the
  *     column writes. Stored as `CURRENT_DEFAULT` StructField metadata in
  *     the `_tablespec` schema; because [[ColeCatalog]] declares
  *     `SUPPORT_COLUMN_DEFAULT_VALUE`, Spark's analyzer resolves
  *     `INSERT INTO t (a) ...` and the `DEFAULT` keyword against it — the
  *     connector never sees a missing column on the write path.
  *   - '''EXISTS default''' (read-side): what rows written BEFORE the
  *     column existed read back. Set once, at `ALTER TABLE ADD COLUMN ...
  *     DEFAULT`, to the then-current default FOLDED TO A LITERAL, and
  *     immutable afterwards (`ALTER COLUMN SET DEFAULT` changes only the
  *     current default — the standard Delta/Iceberg-v3 "initial default"
  *     semantics). The scan fills it where the NULL backfill for
  *     schema-evolved columns would otherwise emit NULL.
  *
  * Filling happens in the shared readers, so every surface that reads
  * pre-evolution files — batch scans, streaming, the change feed, the
  * row-level DML group scan — serves the same value. Pushdown stays
  * exact by *declining*, never by evaluating wrong: claimed filters and
  * aggregate pushdown withdraw on a defaulted column that is absent from
  * at least one planned file (the absent-column fast paths assume
  * all-NULL); files that all carry the column keep full pushdown.
  * Compaction rewrites materialize the default and the declines lift.
  */
object ColeDefaults {

  /** Spark's ResolveDefaultColumns metadata keys (public convention —
    * the analyzer reads CURRENT_DEFAULT from the table schema).
    */
  val CurrentKey = "CURRENT_DEFAULT"
  val ExistsKey = "EXISTS_DEFAULT"

  /** Default values are literals of the atomic COLE lanes. Vector and
    * binary columns stay loud — a constant payload default is a trap.
    */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | DoubleType |
        TimestampType | TimestampNTZType => true
    case d: DecimalType => d.precision <= 38 && d.scale >= 0
    case _ => false
  }

  /** Parse + fold + cast a default SQL expression to the column type.
    * Loud on non-constant or non-castable SQL — a DDL that only fails at
    * first read is a trap. Returns the CATALYST value (null allowed: an
    * explicit `DEFAULT NULL` is just the no-op default).
    *
    * Two disciplines (ADVICE r13):
    *   - the cast folds with Spark's SESSION timezone (what the analyzer
    *     uses for INSERT-side defaults), never the JVM default — a
    *     timestamp default must fill the same instant on every surface;
    *   - the cast is ANSI: a castable-but-invalid default (`DEFAULT
    *     'abc'` on BIGINT) fails AT DECLARATION instead of silently
    *     folding to NULL and persisting a wrong EXISTS default.
    */
  def eval(sql: String, dt: DataType): Any = {
    val expr =
      try CatalystSqlParser.parseExpression(sql)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"DEFAULT expression does not parse: $sql", e)
      }
    // UnresolvedFunction (CURRENT_TIMESTAMP etc.) throws from .foldable —
    // fold it into the same loud, actionable rejection
    val constant = try expr.foldable catch { case _: Exception => false }
    require(constant, s"DEFAULT must be a constant expression: $sql " +
      "(function-valued defaults like CURRENT_TIMESTAMP are not supported)")
    val v = expr.eval(InternalRow.empty)
    require(Cast.canCast(expr.dataType, dt),
      s"DEFAULT $sql (${expr.dataType.simpleString}) cannot cast to " +
        dt.simpleString)
    val tz = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    val cast = Cast(Literal.create(v, expr.dataType), dt, Some(tz),
      org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
    try cast.eval(InternalRow.empty)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"DEFAULT $sql does not convert to ${dt.simpleString}: " +
          e.getMessage, e)
    }
  }

  /** Canonical literal SQL of an evaluated default — what EXISTS_DEFAULT
    * persists, so read-side evaluation is a literal parse, not a re-fold
    * of arbitrary SQL. Timestamp values persist with an EXPLICIT UTC
    * offset (ISO-8601 `Z`): executors re-evaluate this SQL, and a
    * zone-free rendering would re-parse against whatever timezone that
    * JVM resolves — the same instant must come back everywhere.
    */
  def literalSql(value: Any, dt: DataType): String = dt match {
    case TimestampType if value != null =>
      val inst = java.time.Instant.EPOCH.plus(value.asInstanceOf[Long],
        java.time.temporal.ChronoUnit.MICROS)
      s"TIMESTAMP '$inst'"
    case _ => Literal(value, dt).sql
  }

  /** Field metadata for `ADD COLUMN ... DEFAULT` / CREATE TABLE defaults:
    * CURRENT_DEFAULT = the user's SQL (re-shown by DESCRIBE, applied to
    * future INSERTs), EXISTS_DEFAULT = the folded literal (immutable,
    * applied to pre-existing rows). Validates by evaluating.
    */
  def withDefault(f: StructField, dv: ColumnDefaultValue): StructField = {
    require(supported(f.dataType),
      s"DEFAULT is supported on INT/BIGINT/STRING/DOUBLE/TIMESTAMP/DECIMAL " +
        s"columns; '${f.name}' is ${f.dataType.simpleString}")
    val sql = Option(dv.getSql).getOrElse {
      // expression-built defaults carry the folded literal only
      val lit = dv.getValue
      literalSql(lit.value, lit.dataType)
    }
    val folded = eval(sql, f.dataType)
    val existsSql = literalSql(folded, f.dataType)
    val m = new MetadataBuilder().withMetadata(f.metadata)
      .putString(CurrentKey, sql)
      .putString(ExistsKey, existsSql)
      .build()
    f.copy(metadata = m)
  }

  /** Update only the CURRENT default (SET/DROP DEFAULT): the exists
    * default — what pre-existing rows read — never changes after the add.
    */
  def withCurrentDefault(f: StructField, sql: Option[String]): StructField = {
    val b = new MetadataBuilder().withMetadata(f.metadata)
    sql match {
      case Some(s) if s.trim.nonEmpty =>
        require(supported(f.dataType),
          s"DEFAULT is supported on INT/BIGINT/STRING/DOUBLE/TIMESTAMP/" +
            s"DECIMAL columns; '${f.name}' is ${f.dataType.simpleString}")
        eval(s, f.dataType) // validate now, loudly
        b.putString(CurrentKey, s)
      case _ => b.remove(CurrentKey)
    }
    f.copy(metadata = b.build())
  }

  def existsDefaultSql(f: StructField): Option[String] =
    if (f.metadata.contains(ExistsKey)) Some(f.metadata.getString(ExistsKey))
    else None

  def hasDefaultKeys(f: StructField): Boolean =
    f.metadata.contains(CurrentKey) || f.metadata.contains(ExistsKey)

  // tablespec reads ride the planning hot path — cache on (mtime, len)
  // like the rename map does
  private val cache = new LruCache[String, (Long, Long, Map[String, (String, DataType)])](4096)

  /** current column name → (exists-default literal SQL, column type) for
    * every defaulted column the `_tablespec` declares. Empty for tables
    * without a spec (pure path writes never declare defaults).
    */
  def existsDefaults(table: String,
      conf: Configuration): Map[String, (String, DataType)] = {
    val (fs, p) = ColeIO.resolve(s"$table/${ColeCatalog.TableSpecFile}", conf)
    val st = try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None => Map.empty
      case Some(status) =>
        val key = fs.makeQualified(p).toString
        cache.get(key) match {
          case Some((m1, l1, m)) if m1 == status.getModificationTime &&
              l1 == status.getLen => m
          case _ =>
            val m = ColeCatalog.readTableSpec(table, conf) match {
              case None => Map.empty[String, (String, DataType)]
              case Some((schema, _)) =>
                schema.fields.flatMap(f =>
                  existsDefaultSql(f).map(s => f.name -> (s, f.dataType))).toMap
            }
            cache.put(key, (status.getModificationTime, status.getLen, m))
            m
        }
    }
  }

  /** Exists-defaulted columns among `cols` that are ABSENT from at least
    * one of `infos`' footers (rename-aware): where the absent-column
    * fast paths (all-NULL credit, whole-file predicate drop) would be
    * WRONG — shared by the scan builder's pushdown declines and the
    * metadata-DELETE routing.
    */
  def missingFromSomeFile(table: String, conf: Configuration,
      infos: Seq[ColeMetaCache.FileInfo],
      cols: Set[String]): Set[String] = {
    val defs = existsDefaults(table, conf).keySet & cols
    if (defs.isEmpty) Set.empty
    else defs.filter { c =>
      infos.exists { i =>
        val stored = i.renamed.getOrElse(c, c)
        !i.meta.columns.exists(_.name == stored)
      }
    }
  }

  /** Re-attach default metadata to a PRUNED required schema by name —
    * Spark's column pruning may rebuild fields without connector
    * metadata, and path-based loads never had it. Driver-side, once per
    * reader factory.
    */
  def attach(required: StructType, table: String,
      conf: Configuration): StructType = {
    val defs = existsDefaults(table, conf)
    if (defs.isEmpty) required
    else StructType(required.fields.map { f =>
      defs.get(f.name) match {
        case Some((sql, _)) if !f.metadata.contains(ExistsKey) =>
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(ExistsKey, sql).build())
        case _ => f
      }
    })
  }

  /** Per-required-field evaluated exists defaults for the readers: null =
    * no default (NULL backfill, the pre-defaults behavior). Evaluated
    * once per reader from the literal SQL the DDL canonicalized.
    */
  def rowValues(required: StructType): Array[Any] =
    required.fields.map { f =>
      existsDefaultSql(f) match {
        case Some(sql) => eval(sql, f.dataType)
        case None => null
      }
    }
}
