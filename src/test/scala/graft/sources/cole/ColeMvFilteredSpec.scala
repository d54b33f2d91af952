package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Filtered / expression-key incremental MVs (r14 verdict ask #1) — the
  * MV every user writes first: `SELECT k, agg(v) FROM t WHERE pred
  * GROUP BY k` plus derived keys (`bucket := substr(k,1,2)`). Pinned:
  *   - a WHERE-filtered MV creates and refreshes value-identical to a
  *     full recompute over the FILTERED source, across appends on both
  *     sides of the filter, deletes, and updates that MOVE rows across
  *     the filter boundary (delete+insert pairs of which exactly the
  *     in-filter sides fold);
  *   - the refresh stays O(delta): insert-only refreshes re-aggregate 0
  *     keys; deletes under min/max re-aggregate only delete-touched keys;
  *   - derived (expression) group keys fold on every path — create,
  *     differential refresh, the affected-key recompute;
  *   - non-differentiable shapes reject LOUDLY at create: unresolvable
  *     SQL, non-deterministic expressions (rand()), subqueries,
  *     aggregates as keys, derived names shadowing source columns;
  *   - old sidecars (no where/groupexpr lines) read back unchanged.
  */
class ColeMvFilteredSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_mvf_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.mvf", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.mvf.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def rows(ids: Range): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"k${i % 5}", (i % 97).toLong, (i % 13) * 1.5,
      if (i % 3 == 0) "hot" else "cold")).toDF("id", "k", "v", "p", "kind")
  }

  private def mkSource(name: String, ids: Range): String = {
    val t = s"$warehouse/db/$name"
    rows(ids).coalesce(2).write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf)
    t
  }

  private val aggSpec = "count:*:n, sum:v:sum_v, min:p:min_p, max:p:max_p"
  private val aggs = ColeMv.parseAggs(aggSpec)

  /** Ground truth: full aggregate over the LIVE filtered source. */
  private def expected(src: String, where: String,
      keys: Seq[(String, Option[String])]): Array[String] = {
    val base = spark.read.format("cole").load(src).filter(expr(where))
    val derived = keys.foldLeft(base) {
      case (df, (n, Some(e))) => df.withColumn(n, expr(e))
      case (df, _) => df
    }
    ColeMv.fullAggregate(derived, keys.map(_._1), aggs)
      .collect().map(_.toString).sorted
  }

  private def actual(mv: String): Array[String] =
    spark.read.format("cole").load(mv).collect().map(_.toString).sorted

  test("WHERE-filtered MV: create, both-sides append, boundary-crossing update, delete") {
    val src = mkSource("f_base", 0 until 300)
    val mv = s"$warehouse/db/f_base_agg"
    spark.sql("CALL mvf.system.create_mv('db.f_base', 'db.f_base_agg', " +
      s"'k', '$aggSpec', where => \"kind = 'hot'\")")
    assert(actual(mv) === expected(src, "kind = 'hot'", Seq("k" -> None)))

    // appends on BOTH sides of the filter: only the hot side folds
    rows(300 until 400).write.format("cole").mode("append").save(src)
    val st1 = spark.sql("CALL mvf.system.refresh_mv('db.f_base_agg')").head()
    assert(st1.getLong(3) == 0L, "insert-only refresh must re-aggregate 0 keys")
    assert(actual(mv) === expected(src, "kind = 'hot'", Seq("k" -> None)))

    // an UPDATE that moves rows ACROSS the filter boundary (hot → cold):
    // the feed's delete(hot old)+insert(cold new) pair folds as a pure
    // removal from the MV
    spark.sql("UPDATE mvf.db.f_base SET kind = 'cold' WHERE id % 50 = 0")
    // and one moving INTO the filter
    spark.sql("UPDATE mvf.db.f_base SET kind = 'hot' WHERE id % 50 = 7")
    spark.sql("CALL mvf.system.refresh_mv('db.f_base_agg')")
    assert(actual(mv) === expected(src, "kind = 'hot'", Seq("k" -> None)))

    // deletes under min/max: only delete-touched keys re-aggregate, and
    // the recompute itself applies the filter
    val st2 = spark.sql(
      "CALL mvf.system.refresh_mv('db.f_base_agg')").head() // no-op first
    assert(st2.getLong(2) == 0L)
    spark.sql("DELETE FROM mvf.db.f_base WHERE k = 'k2' AND id < 100")
    val st3 = spark.sql("CALL mvf.system.refresh_mv('db.f_base_agg')").head()
    assert(st3.getLong(3) <= 1L,
      s"delete touched one key, re-aggregated ${st3.getLong(3)}")
    assert(actual(mv) === expected(src, "kind = 'hot'", Seq("k" -> None)))
  }

  test("derived expression keys fold on every path") {
    val src = mkSource("e_base", 0 until 250)
    val mv = s"$warehouse/db/e_base_agg"
    val keys = Seq("kk" -> Some("substr(k, 1, 1)"),
      "vband" -> Some("cast(v % 4 as bigint)"))
    spark.sql("CALL mvf.system.create_mv('db.e_base', 'db.e_base_agg', " +
      s"'kk := substr(k, 1, 1), vband := cast(v % 4 as bigint)', '$aggSpec')")
    assert(actual(mv) === expected(src, "true", keys))
    rows(250 until 330).write.format("cole").mode("append").save(src)
    spark.sql("DELETE FROM mvf.db.e_base WHERE id % 40 = 1")
    spark.sql("CALL mvf.system.refresh_mv('db.e_base_agg')")
    assert(actual(mv) === expected(src, "true", keys))
    // filter + derived keys together, through more DML
    val mv2 = s"$warehouse/db/e_base_agg2"
    spark.sql("CALL mvf.system.create_mv('db.e_base', 'db.e_base_agg2', " +
      s"'vband := cast(v % 4 as bigint)', '$aggSpec', where => 'p > 3.0')")
    spark.sql("UPDATE mvf.db.e_base SET v = v + 1 WHERE id % 7 = 2")
    spark.sql("CALL mvf.system.refresh_mv('db.e_base_agg2')")
    assert(actual(mv2) === expected(src, "p > 3.0",
      Seq("vband" -> Some("cast(v % 4 as bigint)"))))
  }

  test("non-differentiable shapes reject loudly at create") {
    mkSource("g_base", 0 until 50)
    def rejects(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.toLowerCase.contains(needle)),
        s"expected '$needle' in: ${msgs(e).mkString(" | ")}")
    }
    rejects("CALL mvf.system.create_mv('db.g_base', 'db.g1', 'k', " +
      s"'$aggSpec', where => 'nope > 1')", "resolve")
    rejects("CALL mvf.system.create_mv('db.g_base', 'db.g2', 'k', " +
      s"'$aggSpec', where => 'rand() < 0.5')", "deterministic")
    rejects("CALL mvf.system.create_mv('db.g_base', 'db.g3', " +
      s"'x := sum(v)', '$aggSpec')", "row-level")
    rejects("CALL mvf.system.create_mv('db.g_base', 'db.g4', " +
      s"'k := substr(k,1,1)', '$aggSpec')", "shadows")
    rejects("CALL mvf.system.create_mv('db.g_base', 'db.g5', " +
      s"'b := rand()', '$aggSpec')", "deterministic")
    // none of the rejected creates may leave a half-made MV behind
    Seq("g1", "g2", "g3", "g4", "g5").foreach { n =>
      assert(!ColeMv.isMv(s"$warehouse/db/$n", conf))
    }
  }

  test("old sidecars (no where/groupexpr) read back unchanged") {
    val src = mkSource("o_base", 0 until 40)
    val mv = s"$warehouse/db/o_base_agg"
    spark.sql("CALL mvf.system.create_mv('db.o_base', 'db.o_base_agg', " +
      s"'k', '$aggSpec')")
    val d = ColeMv.readDefinition(mv, conf)
    assert(d.where.isEmpty && d.groupExprs.isEmpty)
    // byte-shape: an unfiltered MV's sidecar carries no new lines
    val (fs, _) = ColeIO.resolve(mv, conf)
    val in = fs.open(new org.apache.hadoop.fs.Path(mv, ColeMv.SidecarName))
    val body = try new String(in.readAllBytes()) finally in.close()
    assert(!body.contains("where:") && !body.contains("groupexpr:"))
  }
}
