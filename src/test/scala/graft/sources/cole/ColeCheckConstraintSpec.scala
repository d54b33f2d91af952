package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CHECK constraints (r11): declarative row-level invariants enforced
  * at every write path.
  *
  *   - declared via `check.<name>` TBLPROPERTIES at CREATE or ALTER,
  *     persisted in the `_checks` sidecar (path-based writes enforce
  *     them too — the sidecar travels with the data);
  *   - SQL semantics: a row violates iff the expression is exactly
  *     FALSE; NULL (unknown) passes;
  *   - adding a constraint to a populated table validates every
  *     existing row first (Delta's ADD CONSTRAINT discipline);
  *   - enforcement covers INSERT, UPDATE/MERGE (copy-on-write AND
  *     merge-on-read), and the streaming sink; violations fail loudly
  *     BEFORE commit — aborts roll back, the table is untouched;
  *   - DROP/RENAME COLUMN cannot orphan a constraint.
  */
class ColeCheckConstraintSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_chk_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.chk", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.chk.warehouse", warehouse)
    s
  }

  private def chain(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    while (t != null) { sb.append(t.getMessage).append(" | "); t = t.getCause }
    sb.toString
  }

  private def rows(t: String): Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    s.table(t).as[(Long, Long)].collect().toSeq.sorted
  }

  test("CREATE with a check: valid inserts pass, violations fail loudly and commit nothing") {
    val s = spark
    s.sql("CREATE TABLE chk.db.orders (k BIGINT, qty BIGINT) USING cole " +
      "TBLPROPERTIES ('check.qty_pos' = 'qty > 0')")
    s.sql("INSERT INTO chk.db.orders VALUES (1, 5), (2, 7)")
    assert(rows("chk.db.orders") == Seq((1L, 5L), (2L, 7L)))
    val e = intercept[Exception] {
      s.sql("INSERT INTO chk.db.orders VALUES (3, 4), (4, -1)")
    }
    assert(chain(e).contains("CHECK constraint 'qty_pos'"), chain(e))
    assert(chain(e).contains("qty > 0"), chain(e))
    // the whole statement rolled back — the valid row did NOT land
    assert(rows("chk.db.orders") == Seq((1L, 5L), (2L, 7L)))
  }

  test("NULL passes: CHECK is three-valued, unknown is not a violation") {
    val s = spark
    // DOUBLE column: the writer auto-picks format v2, which carries NULLs
    s.sql("CREATE TABLE chk.db.nullable (k BIGINT, qty DOUBLE) USING cole " +
      "TBLPROPERTIES ('check.qty_pos' = 'qty > 0')")
    s.sql("INSERT INTO chk.db.nullable VALUES (1, NULL), (2, 3.0)")
    assert(spark.table("chk.db.nullable").count() == 2)
  }

  test("a constraint that does not parse, resolve, or type as boolean is rejected at CREATE") {
    val s = spark
    val bad1 = intercept[Exception] {
      s.sql("CREATE TABLE chk.db.bad1 (k BIGINT) USING cole " +
        "TBLPROPERTIES ('check.oops' = 'k >')")
    }
    assert(chain(bad1).contains("does not parse"), chain(bad1))
    val bad2 = intercept[Exception] {
      s.sql("CREATE TABLE chk.db.bad2 (k BIGINT) USING cole " +
        "TBLPROPERTIES ('check.oops' = 'no_such_col > 0')")
    }
    assert(chain(bad2).contains("does not resolve"), chain(bad2))
    val bad3 = intercept[Exception] {
      s.sql("CREATE TABLE chk.db.bad3 (k BIGINT) USING cole " +
        "TBLPROPERTIES ('check.oops' = 'k + 1')")
    }
    assert(chain(bad3).toLowerCase.contains("boolean") ||
      chain(bad3).contains("does not resolve"), chain(bad3))
  }

  test("ALTER SET validates existing rows; UNSET removes enforcement") {
    val s = spark
    s.sql("CREATE TABLE chk.db.later (k BIGINT, qty BIGINT) USING cole")
    s.sql("INSERT INTO chk.db.later VALUES (1, 5), (2, -2)")
    // violating data on disk: the ADD must reject and name the count
    val e = intercept[Exception] {
      s.sql("ALTER TABLE chk.db.later SET TBLPROPERTIES ('check.qty_pos' = 'qty > 0')")
    }
    assert(chain(e).contains("1 existing rows violate"), chain(e))
    // clean the data, re-add: accepted and enforced from then on
    s.sql("DELETE FROM chk.db.later WHERE qty < 0")
    s.sql("ALTER TABLE chk.db.later SET TBLPROPERTIES ('check.qty_pos' = 'qty > 0')")
    val e2 = intercept[Exception] {
      s.sql("INSERT INTO chk.db.later VALUES (3, -3)")
    }
    assert(chain(e2).contains("CHECK constraint 'qty_pos'"), chain(e2))
    // DESCRIBE surfaces what every write enforces
    val props = s.sql("DESCRIBE TABLE EXTENDED chk.db.later")
      .collect().map(_.toString).mkString("\n")
    assert(props.contains("check.qty_pos"), props)
    // UNSET: enforcement stops — (1,5) survived the delete, (4,-4) lands
    s.sql("ALTER TABLE chk.db.later UNSET TBLPROPERTIES ('check.qty_pos')")
    s.sql("INSERT INTO chk.db.later VALUES (4, -4)")
    assert(rows("chk.db.later") == Seq((1L, 5L), (4L, -4L)))
    // unknown name still loud
    val e3 = intercept[Exception] {
      s.sql("ALTER TABLE chk.db.later UNSET TBLPROPERTIES ('check.nope')")
    }
    assert(chain(e3).contains("no CHECK constraint named 'nope'"), chain(e3))
  }

  test("copy-on-write UPDATE and MERGE enforce checks; a violating rewrite leaves the table untouched") {
    val s = spark
    s.sql("CREATE TABLE chk.db.cow (k BIGINT, qty BIGINT) USING cole " +
      "TBLPROPERTIES ('check.qty_pos' = 'qty > 0')")
    s.sql("INSERT INTO chk.db.cow VALUES (1, 5), (2, 7), (3, 9)")
    val e = intercept[Exception] {
      s.sql("UPDATE chk.db.cow SET qty = qty - 100 WHERE k = 2")
    }
    assert(chain(e).contains("CHECK constraint 'qty_pos'"), chain(e))
    assert(rows("chk.db.cow") == Seq((1L, 5L), (2L, 7L), (3L, 9L)))
    s.sql("UPDATE chk.db.cow SET qty = qty + 1 WHERE k = 2")
    assert(rows("chk.db.cow") == Seq((1L, 5L), (2L, 8L), (3L, 9L)))
  }

  test("merge-on-read (vector mode) delta writes enforce checks too") {
    val s = spark
    s.sql("CREATE TABLE chk.db.mor (k BIGINT, qty BIGINT) USING cole " +
      "TBLPROPERTIES ('check.qty_pos' = 'qty > 0', 'versioned' = 'true')")
    s.sql("INSERT INTO chk.db.mor VALUES (1, 5), (2, 7)")
    s.sql("CALL chk.system.delete_mode('db.mor', 'vector')")
    val e = intercept[Exception] {
      s.sql("UPDATE chk.db.mor SET qty = -1 WHERE k = 1")
    }
    assert(chain(e).contains("CHECK constraint 'qty_pos'"), chain(e))
    assert(rows("chk.db.mor") == Seq((1L, 5L), (2L, 7L)))
    s.sql("UPDATE chk.db.mor SET qty = 6 WHERE k = 1")
    assert(rows("chk.db.mor") == Seq((1L, 6L), (2L, 7L)))
  }

  test("the streaming sink enforces checks: a violating epoch fails before anything lands") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/streamed"
    Seq((1L, 5L)).toDF("k", "qty").write.format("cole").mode("overwrite").save(t)
    ColeChecks.write(t, ColeIO.driverConf(), Seq(("qty_pos", "qty > 0")))
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)](s)
    val q = mem.toDF().toDF("k", "qty").writeStream.format("cole")
      .option("checkpointLocation",
        Files.createTempDirectory("cole_chk_cp").toString)
      .start(t)
    try {
      mem.addData((2L, 3L))
      q.processAllAvailable()
      assert(spark.read.format("cole").load(t).count() == 2)
      mem.addData((3L, -1L))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(chain(e).contains("CHECK constraint 'qty_pos'") ||
        chain(q.exception.map(ex => ex: Throwable).getOrElse(e))
          .contains("CHECK constraint 'qty_pos'"))
    } finally q.stop()
    // the violating epoch committed nothing
    assert(spark.read.format("cole").load(t).count() == 2)
  }

  test("path-based appends enforce the sidecar without any catalog") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pathbased"
    Seq((1L, 5L)).toDF("k", "qty").write.format("cole").mode("overwrite").save(t)
    ColeChecks.write(t, ColeIO.driverConf(), Seq(("qty_pos", "qty > 0")))
    val e = intercept[Exception] {
      Seq((2L, -7L)).toDF("k", "qty").write.format("cole").mode("append").save(t)
    }
    assert(chain(e).contains("CHECK constraint 'qty_pos'"), chain(e))
    assert(spark.read.format("cole").load(t).count() == 1)
  }

  test("DROP/RENAME COLUMN cannot orphan a constraint") {
    val s = spark
    s.sql("CREATE TABLE chk.db.orphan (k BIGINT, qty BIGINT, note STRING) USING cole " +
      "TBLPROPERTIES ('check.qty_pos' = 'qty > 0')")
    s.sql("INSERT INTO chk.db.orphan VALUES (1, 5, 'a')")
    val e = intercept[Exception] {
      s.sql("ALTER TABLE chk.db.orphan DROP COLUMN qty")
    }
    assert(chain(e).contains("CHECK constraint 'qty_pos'"), chain(e))
    val e2 = intercept[Exception] {
      s.sql("ALTER TABLE chk.db.orphan RENAME COLUMN qty TO amount")
    }
    assert(chain(e2).contains("CHECK constraint 'qty_pos'"), chain(e2))
    // unrelated columns still alter freely
    s.sql("ALTER TABLE chk.db.orphan DROP COLUMN note")
    // after dropping the constraint, the column goes too
    s.sql("ALTER TABLE chk.db.orphan UNSET TBLPROPERTIES ('check.qty_pos')")
    s.sql("ALTER TABLE chk.db.orphan DROP COLUMN qty")
    assert(s.table("chk.db.orphan").schema.fieldNames.toSeq == Seq("k"))
  }
}
