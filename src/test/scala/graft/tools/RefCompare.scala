package graft.tools

import graft.Engine
import org.apache.spark.sql.functions._

/** Head-to-head vs the reference engine's own benchmark: point this at the
  * `benchmark_data.col` its bench suite writes (1M rows) and run the same
  * four operations through the COLE connector.
  * `sbt "Test/runMain graft.tools.RefCompare /tmp/refbuild/benchmark_data.col"`
  */
object RefCompare {
  def main(args: Array[String]): Unit = {
    val file = if (args.nonEmpty) args(0) else "/tmp/refbuild/benchmark_data.col"
    val spark = Engine.session("local[32]")
    val mb = new java.io.File(file).length() / 1e6
    def df = spark.read.format("cole").load(file)
    def bench(label: String, warm: Int = 2)(f: => Any): Unit = {
      (1 to warm).foreach(_ => f)
      // best-of-3: single measurements swing on GC pauses
      val ms = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min
      println(f"[refcmp] $label%-28s ${ms}%8.1f ms  ${mb / (ms / 1000)}%8.1f MB/s")
    }
    println(f"[refcmp] file: $file ($mb%.1f MB)")
    bench("full scan (all cols)")(df.agg(sum("id"), sum("value"), sum("score"),
      count("region")).head())
    bench("filtered scan value>50000")(df.filter(col("value") > 50000)
      .agg(sum("id"), sum("value"), sum("score"), count("region")).head())
    bench("aggregation SUM(value)")(df.agg(sum("value")).head())
    bench("group by region")(df.groupBy("region")
      .agg(count(lit(1)), sum("value")).head())
    spark.stop()
  }
}

/** Same four operations at 20M rows (Spark's per-query floor amortized).
  * `sbt "Test/runMain graft.tools.RefCompareScaled"`
  */
object RefCompareScaled {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft_refcmp_20m"
    val spark = Engine.session("local[32]")
    if (!new java.io.File(dir).exists())
      graft.Cli.write(spark, dir, 20000000L, seed = 42L)
    val mb = new java.io.File(dir).listFiles().map(_.length()).sum / 1e6
    def df = spark.read.format("cole").load(dir)
    def bench(label: String, warm: Int = 2)(f: => Any): Unit = {
      (1 to warm).foreach(_ => f)
      // best-of-3: single measurements swing on GC pauses
      val ms = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min
      println(f"[refcmp] $label%-28s ${ms}%8.1f ms  ${mb / (ms / 1000)}%8.1f MB/s")
    }
    println(f"[refcmp] dir: $dir ($mb%.1f MB, ${df.count()} rows)")
    bench("full scan (all cols)")(df.agg(sum("id"), sum("value"), sum("category"),
      count("region"), count("status")).head())
    bench("filtered scan value>5000")(df.filter(col("value") > 5000)
      .agg(sum("id"), sum("value"), count("region")).head())
    bench("aggregation SUM(value)")(df.agg(sum("value")).head())
    bench("group by region")(df.groupBy("region")
      .agg(count(lit(1)), sum("value")).head())
    // the same four ops over the ENGINE-NATIVE v2 layout (CRC-verified
    // pages + the SUMS footer tail): what a user of THIS engine gets on
    // tables it writes for itself — v1 above stays the byte-compatible
    // apples-to-apples row. SUM answers from the metadata fold here.
    val dir2 = dir + "_v2"
    if (!new java.io.File(dir2).exists())
      spark.read.format("cole").load(dir).write.format("cole")
        .option("formatVersion", "2").mode("overwrite").save(dir2)
    val mb2 = new java.io.File(dir2).listFiles().map(_.length()).sum / 1e6
    def df2 = spark.read.format("cole").load(dir2)
    def bench2(label: String, warm: Int = 2)(f: => Any): Unit = {
      (1 to warm).foreach(_ => f)
      val ms = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min
      println(f"[refcmp] $label%-28s ${ms}%8.1f ms  ${mb2 / (ms / 1000)}%8.1f MB/s")
    }
    println(f"[refcmp] v2 dir: $dir2 ($mb2%.1f MB)")
    bench2("v2 full scan (all cols)")(df2.agg(sum("id"), sum("value"),
      sum("category"), count("region"), count("status")).head())
    bench2("v2 filtered value>5000")(df2.filter(col("value") > 5000)
      .agg(sum("id"), sum("value"), count("region")).head())
    bench2("v2 SUM(value) [fold]")(df2.agg(sum("value")).head())
    bench2("v2 group by region")(df2.groupBy("region")
      .agg(count(lit(1)), sum("value")).head())
    spark.stop()
  }
}

/** Stress scale: 100M rows (~1.6 GB). `Test/runMain graft.tools.RefCompareStress` */
object RefCompareStress {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft_refcmp_100m"
    val spark = Engine.session("local[32]")
    val t0 = System.nanoTime()
    if (!new java.io.File(dir).exists())
      graft.Cli.write(spark, dir, 100000000L, seed = 42L)
    println(f"[refcmp] write: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val mb = new java.io.File(dir).listFiles().map(_.length()).sum / 1e6
    def df = spark.read.format("cole").load(dir)
    def bench(label: String)(f: => Any): Unit = {
      f // warm
      // best-of-3: single measurements swing >2x on GC pauses at this heap churn
      val ms = (1 to 3).map { _ =>
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6
      }.min
      println(f"[refcmp] $label%-28s ${ms}%8.1f ms  ${mb / (ms / 1000)}%8.1f MB/s")
    }
    println(f"[refcmp] dir: $dir ($mb%.1f MB, ${df.count()} rows)")
    bench("full scan (all cols)")(df.agg(sum("id"), sum("value"), sum("category"),
      count("region"), count("status")).head())
    bench("filtered scan value>5000")(df.filter(col("value") > 5000)
      .agg(sum("id"), sum("value"), count("region")).head())
    bench("aggregation SUM(value)")(df.agg(sum("value")).head())
    bench("group by region")(df.groupBy("region")
      .agg(count(lit(1)), sum("value")).head())
    spark.stop()
  }
}
