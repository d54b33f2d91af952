package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 has an entry in [[queries]]; those with a
  * DuckDB-expressible twin also appear in [[oracleSql]] and are
  * hash-checked by the driver at sf=0.01.
  */
object SparkEntry {

  private def suites: Seq[Q] =
    CoreSuite.queries ++ RelationalSuite.queries ++ ExtendedSuite.queries ++ ExtendedSuite.curation ++
      ColeSuite.queries ++ PipelineSuite.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse Scala triple-quote indentation into single-line SQL. */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
