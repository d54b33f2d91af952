package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions
import graft.functions.{sketches, Text}
import graft.Tables

/** GraftExtensions: the sketch expressions registered as SQL functions
  * must exist and agree exactly with the Column-API entry points.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would silently reuse another suite's extension-less
    // session; clear the singletons so this builder really applies
    // GraftExtensions (the SparkContext itself is still shared).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("TopKPerKey planner strategy is injected by the extensions") {
    assert(spark.sessionState.planner.extraPlanningStrategies
      .exists(_.isInstanceOf[graft.plans.TopKPerKeyStrategy]))
  }

  test("query names are unique across suites (no silent Map shadowing)") {
    import graft.queries._
    val all = CoreSuite.queries ++ RelationalSuite.queries ++
      ExtendedSuite.queries ++ ExtendedSuite.curation ++
      ColeSuite.queries ++ PipelineSuite.queries
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys.toSeq
    assert(dupes.isEmpty, s"duplicate query keys: $dupes")
    assert(graft.SparkEntry.queries.size === all.size)
  }

  test("all graft_* functions are registered in the SQL catalog") {
    val names = spark.catalog.listFunctions().collect().map(_.name).toSet
    for (f <- GraftExtensions.registrations.map(_._1.funcName))
      assert(names.contains(f), s"$f missing from function registry")
  }

  test("SQL graft_simhash64/graft_shingle_hashes match the Column API") {
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      """SELECT doc_id,
           graft_simhash64(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')) AS sh,
           size(graft_shingle_hashes(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' '), 3)) AS nsh
         FROM docs_ext""").collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    val viaCol = Tables.documents(spark, sfDir)
      .select(col("doc_id"), sketches.simhash64(Text.tokens(col("text"))).as("sh"),
        size(Text.shingleHashes(col("text"), 3)).as("nsh"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    assert(viaSql == viaCol)
  }

  test("SQL graft_cosine_sim and graft_minhash_sig evaluate correctly") {
    val row = spark.sql(
      """SELECT graft_cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                                 array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
                size(graft_minhash_sig(array(1L, 2L, 3L), 64)) AS n""").head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getInt(1) == 64)
  }
}
