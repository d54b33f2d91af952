package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `cole` warehouse catalog as a SQL surface: CREATE / INSERT /
  * SELECT / SHOW / RENAME / DROP against `.col` tables, including
  * bucket-transform DDL — the no-metastore contract (the directory tree
  * IS the catalog state) that lets 1000 executors share it with no
  * service in the loop.
  */
class ColeCatalogSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_catalog_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.cwh", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cwh.warehouse", warehouse)
    s
  }

  test("CREATE TABLE resolves while empty, then INSERT + SELECT") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cwh.db")
    spark.sql("CREATE TABLE cwh.db.t (id BIGINT, tag STRING, v DOUBLE)")
    assert(spark.table("cwh.db.t").count() === 0, "empty table must scan as 0 rows")
    spark.sql("INSERT INTO cwh.db.t VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'a', 3.5)")
    val got = spark.sql("SELECT tag, SUM(v) AS s FROM cwh.db.t GROUP BY tag ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === Seq(("a", 5.0), ("b", 2.5)))
    // footers took over as source of truth; second INSERT appends
    spark.sql("INSERT INTO cwh.db.t VALUES (4, 'b', 4.0)")
    assert(spark.table("cwh.db.t").count() === 4)
  }

  test("CREATE TABLE PARTITIONED BY (bucket(n, col)) routes inserts") {
    spark.sql("CREATE TABLE cwh.db.bt (k BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    assert(ColeBucket.readSpec(s"$warehouse/db/bt", ColeIO.driverConf())
      === Some((4, Seq("k"))))
    val s = spark
    import s.implicits._
    (0 until 2000).map(i => (i.toLong, i * 0.5)).toDF("k", "w")
      .writeTo("cwh.db.bt").append()
    assert(spark.table("cwh.db.bt").count() === 2000)
    for (b <- 0 until 4) {
      val ks = spark.read.format("cole").load(s"$warehouse/db/bt/_bucket=$b")
        .select("k").collect().map(_.getLong(0))
      assert(ks.nonEmpty)
      ks.foreach(k => assert(ColeBucket.bucketOf(k, 4) === b))
    }
  }

  test("CTAS lands data and resolves immediately") {
    val s = spark
    import s.implicits._
    (0 until 100).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE cwh.db.ct AS SELECT * FROM ctas_src")
    assert(spark.table("cwh.db.ct").count() === 100)
  }

  test("SHOW TABLES, RENAME, DROP") {
    spark.sql("CREATE TABLE cwh.db.sh (x INT)")
    val listed = spark.sql("SHOW TABLES IN cwh.db").collect().map(_.getString(1)).toSet
    assert(listed.contains("sh"))
    spark.sql("INSERT INTO cwh.db.sh VALUES (7)")
    spark.sql("ALTER TABLE cwh.db.sh RENAME TO db.sh2")
    assert(spark.table("cwh.db.sh2").collect().map(_.getInt(0)).toSeq === Seq(7))
    assert(!spark.catalog.tableExists("cwh.db.sh"))
    spark.sql("DROP TABLE cwh.db.sh2")
    assert(!spark.catalog.tableExists("cwh.db.sh2"))
  }

  test("TRUNCATE TABLE empties but keeps the table resolvable and refillable") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE cwh.db.tr (id BIGINT, p INT) PARTITIONED BY (bucket(4, id))")
    (0 until 200).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .writeTo("cwh.db.tr").append()
    assert(spark.table("cwh.db.tr").count() === 200)
    spark.sql("TRUNCATE TABLE cwh.db.tr")
    assert(spark.table("cwh.db.tr").count() === 0, "truncated table must scan empty")
    // layout contract survives: a refill still routes by the bucket spec
    (0 until 50).map(i => (i.toLong, 9)).toDF("id", "p")
      .writeTo("cwh.db.tr").append()
    assert(spark.table("cwh.db.tr").count() === 50)
    for (b <- 0 until 4) {
      val d = new java.io.File(s"$warehouse/db/tr/_bucket=$b")
      if (d.isDirectory)
        spark.read.format("cole").load(d.toString).select("id").collect()
          .map(_.getLong(0)).foreach(k => assert(ColeBucket.bucketOf(k, 4) === b))
    }
  }

  test("duplicate CREATE fails; IF NOT EXISTS is quiet") {
    spark.sql("CREATE TABLE cwh.db.dup (x INT)")
    val e = intercept[Exception](spark.sql("CREATE TABLE cwh.db.dup (x INT)"))
    assert(e.getMessage.toLowerCase.contains("already exists"))
    spark.sql("CREATE TABLE IF NOT EXISTS cwh.db.dup (x INT)") // no throw
  }

  test("catalog DDL table joins path-written bucketed table with zero Exchange") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE cwh.db.j1 (k BIGINT, a DOUBLE) PARTITIONED BY (bucket(4, k))")
    (0 until 5000).map(i => (i.toLong, i * 1.0)).toDF("k", "a")
      .writeTo("cwh.db.j1").append()
    (0 until 5000 by 2).map(i => (i.toLong, s"z$i")).toDF("k", "z")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k")
      .save(s"$warehouse/db/j2")
    val olds = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("cwh.db.j1").join(spark.table("cwh.db.j2"), "k")
      j.collect()
      def countEx(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (if (p.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) 1 else 0) +
          p.children.map(countEx).sum + (p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              countEx(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              countEx(q.plan)
            case _ => 0
          })
      assert(countEx(j.queryExecution.executedPlan) === 0,
        s"DDL-created and path-written bucketed tables must SPJ:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 2500)
    } finally olds match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("append with a mismatched bucketBy fails loudly (layout is immutable)") {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/bl"
    (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(dir)
    // appending with a DIFFERENT bucket count or column must not silently
    // rewrite the sidecar while old files keep 4-way routing
    for (bad <- Seq("8:k", "4:v")) {
      val e = intercept[Exception] {
        Seq((1000L, 1.0)).toDF("k", "v")
          .write.format("cole").mode("append").option("bucketBy", bad).save(dir)
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("keep its layout")), e.getMessage)
    }
    // a MATCHING explicit option appends fine
    Seq((1000L, 1.0)).toDF("k", "v")
      .write.format("cole").mode("append").option("bucketBy", "4:k").save(dir)
    assert(spark.read.format("cole").load(dir).count() === 101)
    // truncate/overwrite may legitimately re-layout
    (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .write.format("cole").mode("overwrite").option("bucketBy", "8:k").save(dir)
    assert(ColeBucket.readSpec(dir, ColeIO.driverConf()) === Some((8, Seq("k"))))
  }

  test("createTable normalizes partition columns to the end of the schema") {
    // a mid-schema partition column must resolve at the SAME position in
    // the empty and populated states (positional INSERT safety)
    spark.sql("CREATE TABLE cwh.db.norm (a BIGINT, p STRING, b DOUBLE) " +
      "PARTITIONED BY (p)")
    val emptyOrder = spark.table("cwh.db.norm").schema.fieldNames.toSeq
    assert(emptyOrder === Seq("a", "b", "p"),
      s"partition columns must normalize to the end, got $emptyOrder")
    spark.sql("INSERT INTO cwh.db.norm VALUES (1, 2.5, 'x')")
    val popOrder = spark.table("cwh.db.norm").schema.fieldNames.toSeq
    assert(popOrder === emptyOrder,
      s"column order must not change once data lands: $emptyOrder -> $popOrder")
    val r = spark.table("cwh.db.norm").collect().head
    assert((r.getLong(0), r.getDouble(1), r.getString(2)) === ((1L, 2.5, "x")))
  }

  test("identity + bucket partitioning rejected at CREATE, not first write") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE cwh.db.combo (k BIGINT, p STRING, v DOUBLE) " +
        "PARTITIONED BY (p, bucket(4, k))")
    }
    assert(e.getMessage.contains("not both"), e.getMessage)
  }

  test("ALTER TABLE ADD COLUMN: resolves immediately, NULL-backfills, accepts inserts") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cwh.db")
    (0L until 100L).map(i => (i, s"t$i")).toDF("id", "tag")
      .createOrReplaceTempView("alter_src")
    spark.sql("CREATE TABLE cwh.db.alt AS SELECT * FROM alter_src")
    spark.sql("ALTER TABLE cwh.db.alt ADD COLUMN score DOUBLE")
    // resolves with the new column; existing rows NULL-backfill
    val t = spark.table("cwh.db.alt")
    assert(t.schema.fieldNames.toSeq === Seq("id", "tag", "score"))
    assert(t.filter(col("score").isNull).count() === 100)
    // inserts at the new arity land, mixed reads stay exact
    spark.sql("INSERT INTO cwh.db.alt VALUES (100, 't100', 9.5)")
    val back = spark.table("cwh.db.alt")
    assert(back.count() === 101)
    assert(back.agg(sum("score")).head.getDouble(0) === 9.5)
    // a claimed filter on the added column prunes pre-evolution files whole
    assert(back.filter(col("score") > 1.0).count() === 1)
    // renames are metadata-only since r9 (ColeRenameColumnSpec pins the
    // semantics); non-widening type changes stay loud (r14 allows the
    // lane-widening subset — ColeMergeEvolveSpec pins it)
    spark.sql("ALTER TABLE cwh.db.alt RENAME COLUMN tag TO label")
    assert(spark.table("cwh.db.alt").schema.fieldNames.toSeq ===
      Seq("id", "label", "score"))
    val e = intercept[Exception](
      spark.sql("ALTER TABLE cwh.db.alt ALTER COLUMN id TYPE STRING"))
    assert(e.getMessage.contains("widen"), e.getMessage)
    // non-nullable adds are rejected (cannot backfill)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE cwh.db.alt ADD COLUMN req INT NOT NULL"))
    assert(e2.getMessage.contains("nullable"), e2.getMessage)
  }

  test("ALTER TABLE ADD COLUMN on a partitioned table keeps partition columns last") {
    val s = spark
    import s.implicits._
    (0 until 60).map(i => (i.toLong, s"p${i % 3}", i * 1.0)).toDF("id", "part", "v")
      .createOrReplaceTempView("alter_part_src")
    spark.sql("CREATE TABLE cwh.db.altp (id BIGINT, v DOUBLE, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO cwh.db.altp SELECT id, v, part FROM alter_part_src")
    spark.sql("ALTER TABLE cwh.db.altp ADD COLUMN note STRING")
    val t = spark.table("cwh.db.altp")
    assert(t.schema.fieldNames.toSeq === Seq("id", "v", "note", "part"),
      "added column must sit before the partition columns")
    spark.sql("INSERT INTO cwh.db.altp VALUES (999, 5.0, 'hello', 'p9')")
    val got = spark.table("cwh.db.altp")
    assert(got.count() === 61)
    assert(got.filter(col("note") === "hello")
      .select("part").head.getString(0) === "p9")
    assert(got.filter(col("part") === "p0").count() === 20)
  }

  test("ALTER TABLE DROP COLUMN: metadata-only, stale values cannot resurrect") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cwh.db")
    (0L until 50L).map(i => (i, s"t$i", i * 2.0)).toDF("id", "tag", "score")
      .createOrReplaceTempView("drop_src")
    spark.sql("CREATE TABLE cwh.db.dropt AS SELECT * FROM drop_src")
    val dir = s"$warehouse/db/dropt"
    val before = ColeIO.listStatus(dir, ColeIO.driverConf())
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))

    spark.sql("ALTER TABLE cwh.db.dropt DROP COLUMN tag")
    // the column left the schema; no data file was rewritten
    val t = spark.table("cwh.db.dropt")
    assert(t.schema.fieldNames.toSeq === Seq("id", "score"))
    assert(t.count() === 50)
    assert(t.agg(sum("id")).head.getLong(0) === (0L until 50L).sum)
    val after = ColeIO.listStatus(dir, ColeIO.driverConf())
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
    assert(after === before, "DROP COLUMN must not touch data files")
    // SELECT of the dropped name fails like any unknown column
    intercept[Exception](spark.sql("SELECT tag FROM cwh.db.dropt").collect())
    // inserts at the new arity land
    spark.sql("INSERT INTO cwh.db.dropt VALUES (99, 3.5)")
    assert(spark.table("cwh.db.dropt").count() === 51)
    // re-ADDing the dropped name is rejected: old footers still store it
    val e = intercept[Exception](
      spark.sql("ALTER TABLE cwh.db.dropt ADD COLUMN tag STRING"))
    assert(e.getMessage.contains("previously dropped"), e.getMessage)
    // ... and a path-based append cannot smuggle it back either
    val e2 = intercept[Exception] {
      Seq((1L, "x", 1.0)).toDF("id", "tag", "score")
        .write.format("cole").mode("append").save(dir)
    }
    assert(e2.getMessage.contains("was dropped"), e2.getMessage)
    // layout-load-bearing columns are protected
    spark.sql("CREATE TABLE cwh.db.dropb (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO cwh.db.dropb VALUES (1, 1.0)")
    val e3 = intercept[Exception](
      spark.sql("ALTER TABLE cwh.db.dropb DROP COLUMN k"))
    assert(e3.getMessage.contains("bucket column"), e3.getMessage)
  }

  test("SHOW NAMESPACES IN an existing namespace returns its (empty) children") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cwh.shownstest")
    assert(spark.sql("SHOW NAMESPACES IN cwh.shownstest").collect().isEmpty)
    val e = intercept[Exception] {
      spark.sql("SHOW NAMESPACES IN cwh.no_such_ns_xyz").collect()
    }
    assert(e.getMessage.toLowerCase.matches("(?s).*(namespace|schema).*"), e.getMessage)
  }
}
