package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static dimension joins for incremental MVs (r16, verdict ask
  * #8): `create_mv(..., dim => 'ns.d', dim_on => 'fk = pk')` LEFT-joins
  * ONE broadcast-sized dimension onto every source/feed row before the
  * WHERE/keys/fold — the common star-schema rollup (`fact ⋈ dim GROUP BY
  * dim.attr`) with the differential math still single-source. Pinned:
  *   - create materializes the join-aggregate; incremental refresh over
  *     fact appends AND deletes (min recompute path included) matches a
  *     full recompute exactly;
  *   - a CHANGED dim refuses the incremental refresh loudly (the
  *     fingerprint check — folding deletes under a different enrichment
  *     would corrupt state) and `full => true` resynchronizes under the
  *     new dim;
  *   - fact-fact shapes reject at create: the source as its own dim,
  *     and any dim beyond the broadcast byte cap;
  *   - dim/source column collisions and dangling dim_on reject at create.
  */
class ColeMvDimSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_mvd_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.mvd", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.mvd.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def mkDim(name: String, n: Int = 10): String = {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/$name"
    (0 until n).map(i => (i.toLong, s"grp${i % 3}")).toDF("d_key", "d_grp")
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    dir
  }

  private def mkFact(name: String, from: Int, until: Int): String = {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/$name"
    (from until until).map(i => (i.toLong, (i % 10).toLong, i.toLong * 2))
      .toDF("id", "fk", "amt")
      .coalesce(2).write.format("cole").mode("overwrite").save(dir)
    spark.sql(s"CALL mvd.system.versioning('db.$name')")
    dir
  }

  private def expected(fact: String, dim: String) =
    spark.read.format("cole").load(fact).alias("f")
      .join(spark.read.format("cole").load(dim).alias("d"),
        col("fk") === col("d_key"), "left")
      .groupBy("d_grp")
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(25,4)")).cast("decimal(35,4)").as("s"),
        min("amt").as("mn"))
      .orderBy("d_grp")
      .collect().toSeq

  private def mvContent(mv: String) =
    spark.read.format("cole").load(mv)
      .select(col("d_grp"), col("n"), col("s"), col("mn"))
      .orderBy("d_grp").collect().toSeq

  test("create + incremental refresh over appends and deletes match recompute") {
    val s = spark
    import s.implicits._
    val fact = mkFact("f1", 0, 200)
    val dim = mkDim("d1")
    val mv = s"$warehouse/db/mv1"
    spark.sql("CALL mvd.system.create_mv('db.f1', 'db.mv1', 'd_grp', " +
      "'count:*:n, sum:amt:s, min:amt:mn', " +
      "dim => 'db.d1', dim_on => 'fk = d_key')")
    assert(mvContent(mv) === expected(fact, dim))
    // fact append + delete (min path forces per-key recompute — which
    // must re-enrich through the dim)
    (200 until 260).map(i => (i.toLong, (i % 10).toLong, i.toLong * 2))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(fact)
    spark.sql("DELETE FROM mvd.db.f1 WHERE id % 7 = 0")
    val st = spark.sql("CALL mvd.system.refresh_mv('db.mv1')").collect().head
    assert(st.getLong(3) > 0, s"expected min-recompute keys: $st")
    assert(mvContent(mv) === expected(fact, dim))
  }

  test("a changed dim refuses incremental refresh; full resynchronizes") {
    val s = spark
    import s.implicits._
    val fact = mkFact("f2", 0, 100)
    val dim = mkDim("d2")
    val mv = s"$warehouse/db/mv2"
    spark.sql("CALL mvd.system.create_mv('db.f2', 'db.mv2', 'd_grp', " +
      "'count:*:n, sum:amt:s, min:amt:mn', " +
      "dim => 'db.d2', dim_on => 'fk = d_key')")
    // re-map the dim: every key's group changes
    (0 until 10).map(i => (i.toLong, s"grp${(i + 1) % 3}"))
      .toDF("d_key", "d_grp")
      .coalesce(1).write.format("cole").mode("overwrite").save(dim)
    (100 until 120).map(i => (i.toLong, (i % 10).toLong, i.toLong * 2))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(fact)
    val e = intercept[Exception](
      spark.sql("CALL mvd.system.refresh_mv('db.mv2')").collect())
    assert(e.getMessage.contains("dimension") &&
      e.getMessage.contains("full => true"), s"got: ${e.getMessage}")
    spark.sql("CALL mvd.system.refresh_mv('db.mv2', full => true)").collect()
    assert(mvContent(mv) === expected(fact, dim))
    // and the incremental path works again under the new fingerprint
    (120 until 140).map(i => (i.toLong, (i % 10).toLong, i.toLong * 2))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(fact)
    spark.sql("CALL mvd.system.refresh_mv('db.mv2')").collect()
    assert(mvContent(mv) === expected(fact, dim))
  }

  test("dim + WHERE + derived key compose: enrichment precedes both") {
    val s = spark
    import s.implicits._
    val fact = mkFact("f4", 0, 150)
    mkDim("d4")
    val mv = s"$warehouse/db/mv4"
    // the WHERE and the derived key BOTH reference the dim column —
    // only legal because enrichment runs first on every path
    spark.sql("CALL mvd.system.create_mv('db.f4', 'db.mv4', " +
      "\"dk := substr(d_grp, 1, 4)\", 'count:*:n, sum:amt:s', " +
      "where => \"d_grp <> 'grp2'\", " +
      "dim => 'db.d4', dim_on => 'fk = d_key')")
    def expect() = spark.read.format("cole").load(fact)
      .join(spark.read.format("cole").load(s"$warehouse/db/d4"),
        col("fk") === col("d_key"), "left")
      .filter(col("d_grp") =!= "grp2")
      .withColumn("dk", substring(col("d_grp"), 1, 4))
      .groupBy("dk")
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(25,4)")).cast("decimal(35,4)").as("s"))
      .orderBy("dk").collect().toSeq
    def got() = spark.read.format("cole").load(mv)
      .select(col("dk"), col("n"), col("s")).orderBy("dk").collect().toSeq
    assert(got() === expect())
    (150 until 200).map(i => (i.toLong, (i % 10).toLong, i.toLong * 2))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(fact)
    spark.sql("DELETE FROM mvd.db.f4 WHERE id % 9 = 0")
    spark.sql("CALL mvd.system.refresh_mv('db.mv4')").collect()
    assert(got() === expect())
  }

  test("a VERSIONED dim edit syncs incrementally at O(affected keys)") {
    val s = spark
    import s.implicits._
    val fact = mkFact("f5", 0, 200)
    val dim = mkDim("d5")
    spark.sql("CALL mvd.system.versioning('db.d5')")
    val mv = s"$warehouse/db/mv5"
    spark.sql("CALL mvd.system.create_mv('db.f5', 'db.mv5', 'd_grp', " +
      "'count:*:n, sum:amt:s, min:amt:mn', " +
      "dim => 'db.d5', dim_on => 'fk = d_key')")
    assert(mvContent(mv) === expected(fact, dim))
    // dim UPDATE moving two keys to a brand-new group: the refresh must
    // NOT refuse, must NOT full-rebuild, and must touch exactly the two
    // affected MV keys (old group 'grp2' + new group 'grpX')
    spark.sql("UPDATE mvd.db.d5 SET d_grp = 'grpX' WHERE d_key IN (2, 5)")
    val st = spark.sql("CALL mvd.system.refresh_mv('db.mv5')").collect().head
    assert(st.getLong(3) == 2L,
      s"dim update of 2 keys must recompute exactly 2 MV keys: $st")
    assert(mvContent(mv) === expected(fact, dim))
    // dim DELETE: affected facts fall back to NULL enrichment (LEFT
    // join) — old key 'grp1' re-aggregates, the NULL group absorbs
    spark.sql("DELETE FROM mvd.db.d5 WHERE d_key = 7")
    val st2 = spark.sql("CALL mvd.system.refresh_mv('db.mv5')").collect().head
    assert(st2.getLong(3) == 2L,
      s"dim delete of 1 key must recompute its old + NULL keys: $st2")
    assert(mvContent(mv) === expected(fact, dim))
    // composition: a dim edit AND fact changes land in ONE refresh — the
    // dim sync runs first at the fact's applied watermark, then the fact
    // feed folds under the new enrichment
    spark.sql("UPDATE mvd.db.d5 SET d_grp = 'grpY' WHERE d_key = 1")
    (200 until 240).map(i => (i.toLong, (i % 10).toLong, i.toLong * 2))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(fact)
    spark.sql("DELETE FROM mvd.db.f5 WHERE id % 11 = 0")
    spark.sql("CALL mvd.system.refresh_mv('db.mv5')").collect()
    assert(mvContent(mv) === expected(fact, dim))
    // and a subsequent plain incremental refresh still works (the
    // fingerprint advanced to the dim's new version)
    (240 until 250).map(i => (i.toLong, (i % 10).toLong, i.toLong * 2))
      .toDF("id", "fk", "amt")
      .write.format("cole").mode("append").save(fact)
    spark.sql("CALL mvd.system.refresh_mv('db.mv5')").collect()
    assert(mvContent(mv) === expected(fact, dim))
  }

  test("a dim edit re-enriches across WHERE and derived keys") {
    val s = spark
    import s.implicits._
    val fact = mkFact("f6", 0, 120)
    mkDim("d6")
    spark.sql("CALL mvd.system.versioning('db.d6')")
    val mv = s"$warehouse/db/mv6"
    // WHERE and derived key BOTH read the dim column: a dim edit can
    // move facts across the filter boundary AND between derived keys
    spark.sql("CALL mvd.system.create_mv('db.f6', 'db.mv6', " +
      "\"dk := substr(d_grp, 1, 4)\", 'count:*:n, sum:amt:s', " +
      "where => \"d_grp <> 'grp2'\", " +
      "dim => 'db.d6', dim_on => 'fk = d_key')")
    def expect() = spark.read.format("cole").load(fact)
      .join(spark.read.format("cole").load(s"$warehouse/db/d6"),
        col("fk") === col("d_key"), "left")
      .filter(col("d_grp") =!= "grp2")
      .withColumn("dk", substring(col("d_grp"), 1, 4))
      .groupBy("dk")
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(25,4)")).cast("decimal(35,4)").as("s"))
      .orderBy("dk").collect().toSeq
    def got() = spark.read.format("cole").load(mv)
      .select(col("dk"), col("n"), col("s")).orderBy("dk").collect().toSeq
    assert(got() === expect())
    // INTO the filter: grp2 rows (filtered out) become grp9 (kept)
    spark.sql("UPDATE mvd.db.d6 SET d_grp = 'grp9' WHERE d_key = 2")
    spark.sql("CALL mvd.system.refresh_mv('db.mv6')").collect()
    assert(got() === expect())
    // OUT of the filter: a kept group becomes the excluded grp2
    spark.sql("UPDATE mvd.db.d6 SET d_grp = 'grp2' WHERE d_key = 4")
    spark.sql("CALL mvd.system.refresh_mv('db.mv6')").collect()
    assert(got() === expect())
  }

  test("a rolled-back dim refuses the delta and full resynchronizes") {
    val s = spark
    import s.implicits._
    val fact = mkFact("f7", 0, 60)
    val dim = mkDim("d7")
    spark.sql("CALL mvd.system.versioning('db.d7')")
    val mv = s"$warehouse/db/mv7"
    spark.sql("CALL mvd.system.create_mv('db.f7', 'db.mv7', 'd_grp', " +
      "'count:*:n, sum:amt:s', dim => 'db.d7', dim_on => 'fk = d_key')")
    spark.sql("UPDATE mvd.db.d7 SET d_grp = 'grpZ' WHERE d_key = 3") // v2
    spark.sql("CALL mvd.system.refresh_mv('db.mv7')").collect() // fp -> v2
    spark.sql("CALL mvd.system.rollback('db.d7', 1)")
    val e = intercept[Exception](
      spark.sql("CALL mvd.system.refresh_mv('db.mv7')").collect())
    assert(e.getMessage.contains("dimension") &&
      e.getMessage.contains("full => true"), s"got: ${e.getMessage}")
    spark.sql("CALL mvd.system.refresh_mv('db.mv7', full => true)").collect()
    val got = spark.read.format("cole").load(mv)
      .select(col("d_grp"), col("n"), col("s")).orderBy("d_grp")
      .collect().toSeq
    val want = spark.read.format("cole").load(fact)
      .join(spark.read.format("cole").load(dim),
        col("fk") === col("d_key"), "left")
      .groupBy("d_grp")
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(25,4)")).cast("decimal(35,4)").as("s"))
      .orderBy("d_grp").collect().toSeq
    assert(got === want)
  }

  test("multiple dims compose; a delta on ONE dim syncs only its keys") {
    val s = spark
    import s.implicits._
    val fact = s"$warehouse/db/f8"
    (0 until 180).map(i => (i.toLong, (i % 10).toLong, (i % 7).toLong,
      i.toLong * 2)).toDF("id", "fk", "fk2", "amt")
      .coalesce(2).write.format("cole").mode("overwrite").save(fact)
    spark.sql("CALL mvd.system.versioning('db.f8')")
    val dimA = s"$warehouse/db/d8a"
    (0 until 10).map(i => (i.toLong, s"a${i % 3}")).toDF("d_key", "d_grp")
      .coalesce(1).write.format("cole").mode("overwrite").save(dimA)
    spark.sql("CALL mvd.system.versioning('db.d8a')")
    val dimB = s"$warehouse/db/d8b"
    (0 until 7).map(i => (i.toLong, s"b${i % 2}")).toDF("e_key", "e_grp")
      .coalesce(1).write.format("cole").mode("overwrite").save(dimB)
    spark.sql("CALL mvd.system.versioning('db.d8b')")
    val mv = s"$warehouse/db/mv8"
    spark.sql("CALL mvd.system.create_mv('db.f8', 'db.mv8', " +
      "'d_grp, e_grp', 'count:*:n, sum:amt:s', " +
      "dim => 'db.d8a,db.d8b', dim_on => 'fk = d_key; fk2 = e_key')")
    def expect() = spark.read.format("cole").load(fact)
      .join(spark.read.format("cole").load(dimA),
        col("fk") === col("d_key"), "left")
      .join(spark.read.format("cole").load(dimB),
        col("fk2") === col("e_key"), "left")
      .groupBy("d_grp", "e_grp")
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(25,4)")).cast("decimal(35,4)").as("s"))
      .orderBy("d_grp", "e_grp").collect().toSeq
    def got() = spark.read.format("cole").load(mv)
      .select(col("d_grp"), col("e_grp"), col("n"), col("s"))
      .orderBy("d_grp", "e_grp").collect().toSeq
    assert(got() === expect())
    // SECOND dim edit only: one e_key moves b-groups — the sync touches
    // only the (d_grp × moved e-group) keys, never rebuilding
    spark.sql("UPDATE mvd.db.d8b SET e_grp = 'bX' WHERE e_key = 3")
    val st = spark.sql("CALL mvd.system.refresh_mv('db.mv8')").collect().head
    assert(st.getLong(3) > 0 && st.getLong(3) <= 6,
      s"one e_key's move must recompute only old+new (d_grp, e_grp) " +
        s"key pairs: $st")
    assert(got() === expect())
    // FIRST dim edit + fact changes in one refresh
    spark.sql("UPDATE mvd.db.d8a SET d_grp = 'aY' WHERE d_key IN (1, 4)")
    (180 until 220).map(i => (i.toLong, (i % 10).toLong, (i % 7).toLong,
      i.toLong * 2)).toDF("id", "fk", "fk2", "amt")
      .write.format("cole").mode("append").save(fact)
    spark.sql("DELETE FROM mvd.db.f8 WHERE id % 17 = 0")
    spark.sql("CALL mvd.system.refresh_mv('db.mv8')").collect()
    assert(got() === expect())
    // BOTH dims edited before one refresh: the syncs run sequentially,
    // each under the other's consistent pinned state
    spark.sql("UPDATE mvd.db.d8a SET d_grp = 'aZ' WHERE d_key = 7")
    spark.sql("UPDATE mvd.db.d8b SET e_grp = 'bZ' WHERE e_key = 5")
    spark.sql("CALL mvd.system.refresh_mv('db.mv8')").collect()
    assert(got() === expect())
    // a second dim whose columns collide with the first rejects at create
    val e = intercept[Exception](spark.sql(
      "CALL mvd.system.create_mv('db.f8', 'db.mv8x', 'd_grp', " +
        "'count:*:n', dim => 'db.d8a,db.d8a', " +
        "dim_on => 'fk = d_key; fk2 = d_key')"))
    assert(e.getMessage.contains("duplicate dim") ||
      e.getMessage.contains("collide"), s"got: ${e.getMessage}")
  }

  test("fact-fact shapes and malformed dims reject at create") {
    val s = spark
    import s.implicits._
    mkFact("f3", 0, 50)
    mkDim("d3")
    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    // the source as its own dim = a self-join fact-fact shape
    fails("CALL mvd.system.create_mv('db.f3', 'db.mvx', 'fk', " +
      "'count:*:n', dim => 'db.f3', dim_on => 'fk = id')",
      "fact-fact")
    // byte cap: shrink it below the dim's size → "that's a fact"
    spark.sparkContext.hadoopConfiguration.setLong(ColeMv.DimMaxBytesKey, 1L)
    try fails("CALL mvd.system.create_mv('db.f3', 'db.mvx', 'd_grp', " +
      "'count:*:n', dim => 'db.d3', dim_on => 'fk = d_key')",
      "broadcast cap")
    finally spark.sparkContext.hadoopConfiguration.unset(ColeMv.DimMaxBytesKey)
    // column collision
    (0 until 5).map(i => (i.toLong, i.toLong)).toDF("fk", "extra")
      .write.format("cole").mode("overwrite")
      .save(s"$warehouse/db/dcoll")
    fails("CALL mvd.system.create_mv('db.f3', 'db.mvx', 'extra', " +
      "'count:*:n', dim => 'db.dcoll', dim_on => 'id = fk')",
      "collide")
    // dangling join condition
    fails("CALL mvd.system.create_mv('db.f3', 'db.mvx', 'd_grp', " +
      "'count:*:n', dim => 'db.d3', dim_on => 'fk = nope')",
      "does not resolve")
    // dim without dim_on
    fails("CALL mvd.system.create_mv('db.f3', 'db.mvx', 'd_grp', " +
      "'count:*:n', dim => 'db.d3')", "come together")
  }
}
