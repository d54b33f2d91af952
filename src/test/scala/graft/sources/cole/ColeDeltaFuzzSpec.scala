package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for merge-on-read DML: seeded random sequences of
  * UPDATE / DELETE (convertible and not) / MERGE run against a
  * VECTOR-mode table and a COPY-mode twin of identical content; after
  * every statement both must agree row-for-row, and compaction of the
  * vectored table must converge to the same content. Layouts cover
  * flat, hive-partitioned and hash-bucketed tables, so row-id
  * generation, vector accumulation, and the delta writer's layout
  * routing are exercised under the same randomness as the copy path.
  */
class ColeDeltaFuzzSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_dfz_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.dfz", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.dfz.warehouse", warehouse)
    s
  }

  test("random DML sequences: merge-on-read == copy-on-write, every layout") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7, 29); layout <- Seq("flat", "part", "bucket")) {
      val rnd = new scala.util.Random(seed * 131 + layout.hashCode)
      val n = 3000 + rnd.nextInt(3000)
      val base = (0 until n).map { i =>
        (i.toLong, (i % (2 + rnd.nextInt(5))).toLong, rnd.nextInt(500).toLong,
          s"p${i % 4}")
      }.toDF("id", "grp", "v", "tag")
      val vName = s"z_${layout}_${seed}_v"
      val cName = s"z_${layout}_${seed}_c"
      for ((name, vector) <- Seq((vName, true), (cName, false))) {
        val w0 = base.coalesce(3).write.format("cole").mode("overwrite")
        val w = layout match {
          case "part" => w0.partitionBy("tag")
          case "bucket" => w0.option("bucketBy", "4:id")
          case _ => w0
        }
        w.save(s"$warehouse/db/$name")
        if (vector)
          spark.sql(s"CALL dfz.system.delete_mode('db.$name', 'vector')")
      }

      (1 to 5).foreach { step =>
        // draw the statement parameters ONCE, apply to both tables
        val lo = rnd.nextInt(n).toLong
        val hi = lo + 1 + rnd.nextInt(n / 3).toLong
        val kind = rnd.nextInt(4)
        val mergeKeys = Seq.range(lo, math.min(hi, lo + 200), 13L)
        def stmt(table: String): Unit = kind match {
          case 0 => // convertible DELETE
            spark.sql(s"DELETE FROM dfz.db.$table " +
              s"WHERE id >= $lo AND id < $hi AND v < 200")
          case 1 => // NON-convertible DELETE (delta path on the vector table)
            spark.sql(s"DELETE FROM dfz.db.$table " +
              s"WHERE id >= $lo AND id < $hi AND v % 7 = 3")
          case 2 => // UPDATE
            spark.sql(s"UPDATE dfz.db.$table SET v = v + 1000, grp = grp + 1 " +
              s"WHERE id >= $lo AND id < $hi AND v % 2 = 0")
          case 3 => // MERGE: conditional update + insert at fresh keys
            val src = s"dfz_src_${table}_$step"
            mergeKeys.map(k => (k, k + 77L)).toDF("k", "nv")
              .createOrReplaceTempView(src)
            spark.sql(
              s"""MERGE INTO dfz.db.$table t USING $src s ON t.id = s.k
                 |WHEN MATCHED AND t.v < 900 THEN UPDATE SET v = s.nv
                 |WHEN NOT MATCHED THEN INSERT (id, grp, v, tag)
                 |  VALUES (s.k + 1000000, 0, s.nv, 'p0')
                 |""".stripMargin)
        }
        if (kind != 3 || mergeKeys.nonEmpty) {
          stmt(vName)
          stmt(cName)
        }
        val a = spark.table(s"dfz.db.$vName").collect().map(_.toSeq).toSet
        val b = spark.table(s"dfz.db.$cName").collect().map(_.toSeq).toSet
        assert(a === b,
          s"MOR divergence (seed=$seed layout=$layout step=$step kind=$kind): " +
            s"${(a diff b).take(3)} extra, ${(b diff a).take(3)} missing")
      }
      // compaction of the vectored table converges to the same content
      ColeCompact.compact(s, s"$warehouse/db/$vName", 512L << 20)
      val a = spark.table(s"dfz.db.$vName").collect().map(_.toSeq).toSet
      val b = spark.table(s"dfz.db.$cName").collect().map(_.toSeq).toSet
      assert(a === b, s"post-compaction divergence (seed=$seed layout=$layout)")
    }
  }
}
