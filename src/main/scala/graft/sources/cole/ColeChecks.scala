package graft.sources.cole

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BindReferences, EqualNullSafe, Expression, Literal, PlanExpression, Predicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.write.DataWriter
import org.apache.spark.sql.types.StructType

/** CHECK constraints on COLE tables — declarative row-level data
  * quality enforced at EVERY write.
  *
  * Declared as table properties with the `check.` prefix
  * (`TBLPROPERTIES ('check.qty_pos' = 'quantity > 0')` at CREATE, or
  * `ALTER TABLE t SET TBLPROPERTIES (...)` later — adding one to a
  * populated table first validates every existing row and rejects if
  * any violates, so a declared constraint is a TRUSTED invariant, not
  * an aspiration). Persisted in the `_checks` sidecar (name TAB
  * expression per line), so path-based writes enforce them too — the
  * sidecar travels with the data, not the catalog entry.
  *
  * Enforcement is SQL CHECK semantics: a row violates iff the
  * expression evaluates to exactly FALSE — NULL (unknown) passes, as in
  * ANSI SQL and Delta's CHECK constraints. Every write path funnels
  * through [[ColeWriterFactory]] (appends, overwrites, streaming
  * appends, copy-on-write rewrites, merge-on-read delta files), so one
  * wrapper covers INSERT, UPDATE, MERGE and the streaming sink alike; a
  * violating row fails the job loudly (constraint name + expression +
  * offending row) BEFORE anything commits — V2 write aborts roll back
  * cleanly, the table is untouched.
  *
  * Scale shape: compilation (parse → analyze → bind) happens once per
  * write on the driver; executors evaluate a bound, interpreted
  * predicate per row — constraint expressions are tiny (comparisons,
  * null tests, string predicates), and tables without constraints pay
  * exactly nothing (the factory wraps only when checks exist).
  */
object ColeChecks {
  /** Sidecar file: `name\texpression` per line, UTF-8. */
  val SidecarFile = "_checks"

  /** Table-property prefix carrying a constraint declaration. */
  val PropPrefix = "check."

  private def sidecar(table: String): String = s"$table/$SidecarFile"

  /** Declared constraints of a table, (name, expression SQL) pairs in
    * declaration order; empty without a sidecar.
    */
  def read(table: String, conf: Configuration): Seq[(String, String)] = {
    val (fs, p) = ColeIO.resolve(sidecar(table), conf)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    txt.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"unreadable $SidecarFile line at $table: '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }
  }

  /** Persist the full constraint set (drops the sidecar when empty). */
  def write(table: String, conf: Configuration,
      checks: Seq[(String, String)]): Unit = {
    val (fs, p) = ColeIO.resolve(sidecar(table), conf)
    if (checks.isEmpty) { fs.delete(p, false); return }
    checks.foreach { case (n, sql) =>
      require(!n.contains('\t') && !n.contains('\n') && n.nonEmpty,
        s"constraint name '$n' must be non-empty without tabs/newlines")
      require(!sql.contains('\n'), s"constraint '$n': expression must be " +
        "a single line")
    }
    val out = fs.create(p, true)
    try out.write(checks.map { case (n, s) => s"$n\t$s" }.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Driver-side compile of constraint declarations against the WRITE
    * schema: parse, analyze (name resolution, implicit casts, the
    * boolean-condition check), reject what a constraint must not be
    * (non-deterministic, subqueries), and bind attribute references to
    * row positions so executors evaluate without a session.
    */
  def compile(schema: StructType,
      checks: Seq[(String, String)]): Array[CompiledCheck] = {
    if (checks.isEmpty) return Array.empty
    val spark = SparkSession.active
    val rel = LocalRelation(DataTypeUtils.toAttributes(schema))
    checks.map { case (name, sql) =>
      val parsed = try spark.sessionState.sqlParser.parseExpression(sql)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"CHECK constraint '$name' does not parse: $sql", e)
      }
      val analyzed = try {
        val plan = spark.sessionState.analyzer.execute(Filter(parsed, rel))
        spark.sessionState.analyzer.checkAnalysis(plan)
        plan
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"CHECK constraint '$name' does not resolve against schema " +
            s"${schema.simpleString}: $sql", e)
      }
      val cond = analyzed.asInstanceOf[Filter].condition
      require(cond.deterministic,
        s"CHECK constraint '$name' must be deterministic: $sql")
      require(cond.find(_.isInstanceOf[PlanExpression[_]]).isEmpty,
        s"CHECK constraint '$name' must not contain a subquery: $sql")
      CompiledCheck(name, sql, BindReferences.bindReference(cond, rel.output))
    }.toArray
  }

  /** Read + compile a table's constraints for a write over `schema` —
    * the one call every write path makes on the driver.
    */
  def forWrite(table: String, conf: Configuration,
      schema: StructType): Array[CompiledCheck] =
    compile(schema, read(table, conf))

  /** Enforcing decorator around a row writer; identity when no checks. */
  def wrap(w: DataWriter[InternalRow], checks: Array[CompiledCheck],
      schema: StructType): DataWriter[InternalRow] =
    if (checks.isEmpty) w
    else new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        var i = 0
        while (i < checks.length) { checks(i).validate(row, schema); i += 1 }
        w.write(row)
      }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
        w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
}

/** One compiled constraint: `bound` is position-bound to the write
  * schema and ships to executors serialized; the interpreted predicate
  * rebuilds lazily per task. Violation iff the expression is exactly
  * FALSE (`expr <=> false`) — NULL passes, SQL's CHECK semantics.
  */
final case class CompiledCheck(name: String, sql: String, bound: Expression) {
  @transient private lazy val violated =
    Predicate.createInterpreted(EqualNullSafe(bound, Literal(false)))

  def validate(row: InternalRow, schema: StructType): Unit =
    if (violated.eval(row)) throw new IllegalArgumentException(
      s"CHECK constraint '$name' violated: ($sql) is false for row " +
        render(row, schema) + " — nothing was committed")

  private def render(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val v = if (row.isNullAt(i)) "null" else row.get(i, f.dataType)
      s"${f.name}=$v"
    }.mkString("[", ", ", "]")
}
