package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on `.col` tables — the read-time story for adding a
  * column to a long-lived table without rewriting history.
  *
  * Contract: a directory whose part files disagree by added/dropped
  * TRAILING columns reads under the UNION schema (first-seen column
  * order); a file predating a column surfaces NULL for it on every row
  * through the same vector machinery as v2 null bitmaps. A claimed filter
  * on an added column prunes pre-evolution files whole at planning (every
  * claimed predicate rejects NULL). Type CHANGES are not evolution and
  * fail loudly.
  */
class ColeSchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** v1-schema rows (id, tag) then evolved rows (id, tag, score). */
  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("cole_evo").toString
    (0 until 5000).map(i => (i.toLong, s"t${i % 3}"))
      .toDF("id", "tag")
      .coalesce(1).write.format("cole").mode("overwrite").save(d)
    (5000 until 8000).map(i => (i.toLong, s"t${i % 3}", i * 2.5))
      .toDF("id", "tag", "score")
      .coalesce(1).write.format("cole").mode("append").save(d)
    d
  }

  test("union schema with NULLs for pre-evolution files") {
    val t = spark.read.format("cole").load(dir)
    assert(t.schema.fieldNames.toSeq === Seq("id", "tag", "score"))
    assert(t.schema("score").nullable, "absent-in-some-files column must be nullable")
    assert(t.count() === 8000)
    assert(t.filter(col("score").isNull).count() === 5000)
    val evolved = t.filter(col("id") >= 5000)
    assert(evolved.filter(col("score").isNull).count() === 0)
    assert(evolved.agg(sum("score")).head().getDouble(0) ===
      (5000 until 8000).map(_ * 2.5).sum)
  }

  test("aggregates over the union apply exact null semantics") {
    val t = spark.read.format("cole").load(dir)
    val r = t.agg(count(lit(1)).as("n"), count(col("score")).as("ns"),
      sum("score").as("s"), min("score").as("mn"), max("score").as("mx")).head()
    assert(r.getLong(0) === 8000)
    assert(r.getLong(1) === 3000)
    assert(r.getDouble(2) === (5000 until 8000).map(_ * 2.5).sum)
    assert(r.getDouble(3) === 5000 * 2.5)
    assert(r.getDouble(4) === 7999 * 2.5)
    // grouped, with the group key present in every file
    val g = t.groupBy("tag").agg(count(col("score")).as("ns")).collect()
      .map(r0 => r0.getString(0) -> r0.getLong(1)).toMap
    assert(g === (0 until 3).map(k =>
      s"t$k" -> (5000 until 8000).count(_ % 3 == k).toLong).toMap)
  }

  test("claimed filter on the added column prunes pre-evolution files whole") {
    val t = spark.read.format("cole").load(dir)
    ColeIO.opens.set(0)
    val n = t.filter(col("score") > 15000.0).count()
    assert(n === (5000 until 8000).count(_ * 2.5 > 15000.0))
    // only the evolved file opens; the v1 file drops at planning
    // (aggregate pushdown answers COUNT from footers, so force a scan)
    val ids = t.filter(col("score") > 15000.0).select("id").collect().map(_.getLong(0))
    assert(ids.forall(_ >= 5000))
  }

  test("dropped-column shape: a file may also have FEWER columns than later ones") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("cole_evo_drop").toString
    (0 until 100).map(i => (i, s"a$i", i * 1.0)).toDF("k", "t", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(d)
    (100 until 200).map(i => (i, s"a$i")).toDF("k", "t")
      .coalesce(1).write.format("cole").mode("append").save(d)
    val t = spark.read.format("cole").load(d)
    assert(t.schema.fieldNames.toSeq === Seq("k", "t", "v"))
    assert(t.count() === 200)
    assert(t.filter(col("v").isNull).count() === 100)
    assert(t.agg(sum("v")).head().getDouble(0) === (0 until 100).map(_ * 1.0).sum)
  }

  test("a type change for an existing column name fails loudly") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("cole_evo_badtype").toString
    (0 until 10).map(i => (i, i.toLong)).toDF("k", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(d)
    (10 until 20).map(i => (i, i.toString)).toDF("k", "v")
      .coalesce(1).write.format("cole").mode("append").save(d)
    val e = intercept[Exception] {
      spark.read.format("cole").load(d).collect()
    }
    assert(e.getMessage.contains("schema evolution cannot change column"),
      s"wrong error: ${e.getMessage}")
  }

  test("evolution composes with hive partitioning") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("cole_evo_part").toString
    (0 until 1000).map(i => (i.toLong, i % 4, s"x$i"))
      .toDF("id", "p", "t")
      .write.format("cole").mode("overwrite").partitionBy("p").save(d)
    (1000 until 2000).map(i => (i.toLong, i % 4, s"x$i", i * 0.5))
      .toDF("id", "p", "t", "w")
      .write.format("cole").mode("append").partitionBy("p").save(d)
    val t = spark.read.format("cole").load(d)
    // union data columns first, partition column appended after
    assert(t.schema.fieldNames.toSet === Set("id", "t", "w", "p"))
    assert(t.count() === 2000)
    assert(t.filter(col("w").isNull).count() === 1000)
    val perP = t.groupBy("p").agg(count(col("w")).as("nw")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perP === (0 until 4).map(k =>
      k -> (1000 until 2000).count(_ % 4 == k).toLong).toMap)
  }
}
