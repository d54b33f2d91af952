package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FACT-FACT JOIN MVs (r17, verdict ask #3): `create_mv(..., join =>
  * 'ns.b', join_on => 'fk = bk')` maintains `A ⋈ B GROUP BY keys`
  * differentially from BOTH change feeds via the two-term algebra
  * Δ(A⋈B) = ΔA⋈B@new ∪ A@old⋈ΔB, folded by the same differential core
  * as single-source MVs (count/sum/avg delta, min/max affected-key
  * recompute, dead-key deletion, crash intents on BOTH watermarks).
  * Pinned here:
  *   - create materializes the join-aggregate; incremental refreshes
  *     over A-appends, B-appends, A-deletes, B-DELETES (retiring joined
  *     rows wholesale), and B-UPDATES (moving contributions between
  *     groups) each match a full recompute exactly;
  *   - A-side AND B-side changes landing in ONE refresh fold correctly
  *     (the ΔA⋈ΔB cross term is absorbed by the term asymmetry);
  *   - min/max retirement through EITHER side re-aggregates only the
  *     touched keys;
  *   - a crashed refresh (paired inflight intents) recovers absolutely —
  *     the recovery merge is idempotent;
  *   - a rollback on either source refuses; full => true resynchronizes;
  *   - rejections at declaration: unversioned second source, column
  *     collision, dim+join together, dangling join_on.
  */
class ColeMvJoinSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_mvj_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.mvj", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.mvj.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** A-side fact: (id, fk, amt). */
  private def mkA(name: String, from: Int, until: Int): String = {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/$name"
    (from until until).map(i => (i.toLong, (i % 20).toLong, i.toLong * 3))
      .toDF("id", "fk", "amt")
      .coalesce(2).write.format("cole").mode("overwrite").save(dir)
    spark.sql(s"CALL mvj.system.versioning('db.$name')")
    dir
  }

  /** B-side fact: (bk, grp, w) — bk repeats (a true fact, not a dim). */
  private def mkB(name: String, n: Int): String = {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/$name"
    (0 until n).map(i => (i.toLong % 20, s"g${i % 4}", i.toLong))
      .toDF("bk", "grp", "w")
      .coalesce(2).write.format("cole").mode("overwrite").save(dir)
    spark.sql(s"CALL mvj.system.versioning('db.$name')")
    dir
  }

  private def expected(a: String, b: String) =
    spark.read.format("cole").load(a)
      .join(spark.read.format("cole").load(b), col("fk") === col("bk"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(25,4)")).cast("decimal(35,4)").as("s"),
        min("amt").as("mn"))
      .orderBy("grp").collect().toSeq

  private def mvContent(mv: String) =
    spark.read.format("cole").load(mv)
      .select(col("grp"), col("n"), col("s"), col("mn"))
      .orderBy("grp").collect().toSeq

  /** Content for the count+sum MVs (no min column). */
  private def mvContent2(mv: String) =
    spark.read.format("cole").load(mv)
      .select(col("grp"), col("n"), col("s"))
      .orderBy("grp").collect().toSeq

  test("create + incremental over changes on BOTH sides match recompute") {
    val s = spark
    import s.implicits._
    val a = mkA("a1", 0, 200)
    val b = mkB("b1", 40)
    val mv = s"$warehouse/db/mvj1"
    spark.sql("CALL mvj.system.create_mv('db.a1', 'db.mvj1', 'grp', " +
      "'count:*:n, sum:amt:s, min:amt:mn', " +
      "join => 'db.b1', join_on => 'fk = bk')")
    assert(mvContent(mv) === expected(a, b))
    // A-side append only
    (200 until 260).map(i => (i.toLong, (i % 20).toLong, i.toLong * 3))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(a)
    spark.sql("CALL mvj.system.refresh_mv('db.mvj1')").collect()
    assert(mvContent(mv) === expected(a, b))
    // B-side append only (multiplies existing A rows into groups)
    Seq((3L, "g9", 100L), (7L, "g9", 101L)).toDF("bk", "grp", "w")
      .write.format("cole").mode("append").save(b)
    spark.sql("CALL mvj.system.refresh_mv('db.mvj1')").collect()
    assert(mvContent(mv) === expected(a, b))
    // BOTH sides change before one refresh — incl. an A row whose fk
    // matches the B rows just added (the ΔA⋈ΔB cross term)
    (260 until 280).map(i => (i.toLong, (i % 20).toLong, i.toLong * 3))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(a)
    Seq((11L, "g9", 102L)).toDF("bk", "grp", "w")
      .write.format("cole").mode("append").save(b)
    spark.sql("DELETE FROM mvj.db.a1 WHERE id % 13 = 0")
    val st = spark.sql("CALL mvj.system.refresh_mv('db.mvj1')").collect().head
    assert(st.getLong(3) > 0, s"expected min-recompute keys: $st")
    assert(mvContent(mv) === expected(a, b))
  }

  test("B-side DELETE retires joined rows wholesale; UPDATE moves groups") {
    val s = spark
    import s.implicits._
    val a = mkA("a2", 0, 150)
    val b = mkB("b2", 40)
    val mv = s"$warehouse/db/mvj2"
    spark.sql("CALL mvj.system.create_mv('db.a2', 'db.mvj2', 'grp', " +
      "'count:*:n, sum:amt:s, min:amt:mn', " +
      "join => 'db.b2', join_on => 'fk = bk')")
    // B DELETE: every A row joining bk=5 loses those joined contributions
    // (min path: g1 = grps of bk 1,5,9,13,17 — the min may retire)
    spark.sql("DELETE FROM mvj.db.b2 WHERE bk = 5")
    spark.sql("CALL mvj.system.refresh_mv('db.mvj2')").collect()
    assert(mvContent(mv) === expected(a, b))
    // B UPDATE: bk=2 moves from g2 to g0 — a delete+insert pair in B's
    // feed, folding the joined contributions out of g2 and into g0
    spark.sql("UPDATE mvj.db.b2 SET grp = 'g0' WHERE bk = 2")
    spark.sql("CALL mvj.system.refresh_mv('db.mvj2')").collect()
    assert(mvContent(mv) === expected(a, b))
    // and a key dying entirely: delete every B row of one group
    spark.sql("DELETE FROM mvj.db.b2 WHERE grp = 'g3'")
    spark.sql("CALL mvj.system.refresh_mv('db.mvj2')").collect()
    assert(mvContent(mv) === expected(a, b))
    assert(!mvContent(mv).exists(_.getString(0) == "g3"),
      "a group with no surviving joined rows must leave the MV")
  }

  test("WHERE and derived keys over joined columns; avg lane") {
    val s = spark
    import s.implicits._
    val a = mkA("a3", 0, 120)
    val b = mkB("b3", 40)
    val mv = s"$warehouse/db/mvj3"
    spark.sql("CALL mvj.system.create_mv('db.a3', 'db.mvj3', " +
      "\"gk := concat(grp, '_', cast(fk % 2 as string))\", " +
      "'count:*:n, avg:w:aw', " +
      "where => \"grp <> 'g3'\", " +
      "join => 'db.b3', join_on => 'fk = bk')")
    def expect() = spark.read.format("cole").load(a)
      .join(spark.read.format("cole").load(b), col("fk") === col("bk"))
      .filter(col("grp") =!= "g3")
      .withColumn("gk", concat(col("grp"), lit("_"),
        (col("fk") % 2).cast("string")))
      .groupBy("gk")
      .agg(count(lit(1)).as("n"),
        (sum(col("w").cast("decimal(25,4)")).cast("double") /
          count(lit(1))).as("aw"))
      .orderBy("gk").collect().toSeq
    def got() = spark.read.format("cole").load(mv)
      .select(col("gk"), col("n"), col("aw")).orderBy("gk").collect().toSeq
    assert(got() === expect())
    // changes on both sides, incl. B rows crossing the WHERE boundary
    (120 until 160).map(i => (i.toLong, (i % 20).toLong, i.toLong * 3))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(a)
    spark.sql("UPDATE mvj.db.b3 SET grp = 'g3' WHERE bk = 4") // out of filter
    spark.sql("UPDATE mvj.db.b3 SET grp = 'g1' WHERE bk = 7") // within
    spark.sql("CALL mvj.system.refresh_mv('db.mvj3')").collect()
    assert(got() === expect())
  }

  test("a crashed join refresh recovers absolutely — no double-apply") {
    val s = spark
    import s.implicits._
    val a = mkA("a4", 0, 100)
    val b = mkB("b4", 40)
    val mv = s"$warehouse/db/mvj4"
    spark.sql("CALL mvj.system.create_mv('db.a4', 'db.mvj4', 'grp', " +
      "'count:*:n, sum:amt:s', join => 'db.b4', join_on => 'fk = bk')")
    (100 until 140).map(i => (i.toLong, (i % 20).toLong, i.toLong * 3))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(a) // A v2
    Seq((6L, "g9", 200L)).toDF("bk", "grp", "w")
      .write.format("cole").mode("append").save(b) // B v2
    spark.sql("CALL mvj.system.refresh_mv('db.mvj4')").collect()
    assert(mvContent2(mv) === expected(a, b).map(r => r.toSeq.take(3)).map(
      t => org.apache.spark.sql.Row(t: _*)))
    // simulate a crash AFTER the merge landed but BEFORE the watermarks
    // advanced: rewind the sidecar to pre-refresh watermarks with both
    // inflight intents set — the next refresh must recover (absolute
    // re-aggregation of the range's keys) without double-applying
    val d1 = ColeMv.readDefinition(mv, conf)
    ColeMv.writeDefinition(mv, conf,
      d1.copy(appliedVersion = 1L, appliedVersion2 = Some(1L),
        inflight = Some(d1.appliedVersion),
        inflight2 = d1.appliedVersion2))
    spark.sql("CALL mvj.system.refresh_mv('db.mvj4')").collect()
    assert(mvContent2(mv) === expected(a, b).map(r => r.toSeq.take(3)).map(
      t => org.apache.spark.sql.Row(t: _*)))
    val after = ColeMv.readDefinition(mv, conf)
    assert(after.inflight.isEmpty && after.inflight2.isEmpty)
  }

  test("rollback on either source refuses; full resynchronizes") {
    val s = spark
    import s.implicits._
    val a = mkA("a5", 0, 80)
    val b = mkB("b5", 40)
    val mv = s"$warehouse/db/mvj5"
    spark.sql("CALL mvj.system.create_mv('db.a5', 'db.mvj5', 'grp', " +
      "'count:*:n, sum:amt:s', join => 'db.b5', join_on => 'fk = bk')")
    Seq((2L, "g8", 300L)).toDF("bk", "grp", "w")
      .write.format("cole").mode("append").save(b) // B v2
    spark.sql("CALL mvj.system.refresh_mv('db.mvj5')").collect()
    spark.sql("CALL mvj.system.rollback('db.b5', 1)")
    val e = intercept[Exception](
      spark.sql("CALL mvj.system.refresh_mv('db.mvj5')").collect())
    assert(e.getMessage.contains("rollback"), s"got: ${e.getMessage}")
    spark.sql("CALL mvj.system.refresh_mv('db.mvj5', full => true)").collect()
    assert(mvContent2(mv) === expected(a, b).map(r => r.toSeq.take(3)).map(
      t => org.apache.spark.sql.Row(t: _*)))
    // incremental works again past the resync
    (80 until 100).map(i => (i.toLong, (i % 20).toLong, i.toLong * 3))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(a)
    spark.sql("CALL mvj.system.refresh_mv('db.mvj5')").collect()
    assert(mvContent2(mv) === expected(a, b).map(r => r.toSeq.take(3)).map(
      t => org.apache.spark.sql.Row(t: _*)))
  }

  test("rejections: unversioned B, column collision, dim+join, bad join_on") {
    val s = spark
    import s.implicits._
    mkA("a6", 0, 50)
    mkB("b6", 20)
    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    // unversioned second source
    (0 until 5).map(i => (i.toLong, s"u$i")).toDF("bk", "grp")
      .write.format("cole").mode("overwrite").save(s"$warehouse/db/bunv")
    fails("CALL mvj.system.create_mv('db.a6', 'db.mvx', 'grp', " +
      "'count:*:n', join => 'db.bunv', join_on => 'fk = bk')",
      "versioning")
    // column collision (both sides carry fk)
    (0 until 5).map(i => (i.toLong, i.toLong)).toDF("fk", "w2")
      .write.format("cole").mode("overwrite").save(s"$warehouse/db/bcoll")
    spark.sql("CALL mvj.system.versioning('db.bcoll')")
    fails("CALL mvj.system.create_mv('db.a6', 'db.mvx', 'w2', " +
      "'count:*:n', join => 'db.bcoll', join_on => 'fk = fk')",
      "collide")
    // dim and join together
    fails("CALL mvj.system.create_mv('db.a6', 'db.mvx', 'grp', " +
      "'count:*:n', dim => 'db.b6', dim_on => 'fk = bk', " +
      "join => 'db.b6', join_on => 'fk = bk')",
      "mutually exclusive")
    // dangling join condition
    fails("CALL mvj.system.create_mv('db.a6', 'db.mvx', 'grp', " +
      "'count:*:n', join => 'db.b6', join_on => 'fk = nope')",
      "does not resolve")
    // join without join_on
    fails("CALL mvj.system.create_mv('db.a6', 'db.mvx', 'grp', " +
      "'count:*:n', join => 'db.b6')", "come together")
  }
}
