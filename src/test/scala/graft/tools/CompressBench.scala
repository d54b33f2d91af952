package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, Tables}

/** The compression trade, measured: write lineitem as stored and as
  * deflate `.col`, report on-disk bytes and scan/agg wall time over both.
  * At 100 TB the dominant cost is bytes moved — this prints exactly what
  * a deployment buys (size) and pays (decode CPU) by flipping the option.
  * `sbt "Test/runMain graft.tools.CompressBench [sfDir]"`
  */
object CompressBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session("local[32]")
    val stored = "/tmp/graft_compress_bench/stored"
    val defl = "/tmp/graft_compress_bench/deflate"
    val src = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey",
      "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus")
    src.sortWithinPartitions("l_orderkey")
      .write.format("cole").mode("overwrite").save(stored)
    src.sortWithinPartitions("l_orderkey")
      .write.format("cole").mode("overwrite")
      .option("compress", "deflate").save(defl)
    def dirSize(d: String): Long =
      Files.walk(Paths.get(d)).filter(Files.isRegularFile(_))
        .mapToLong(Files.size(_)).sum()
    val (szS, szD) = (dirSize(stored), dirSize(defl))
    println(f"[compress] stored ${szS / 1e6}%8.2f MB   deflate ${szD / 1e6}%8.2f MB   ratio ${szS.toDouble / szD}%.2fx")
    def bench(label: String, d: String)(f: String => Any): Unit = {
      (1 to 2).foreach(_ => f(d))
      val ms = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(d); (System.nanoTime() - t0) / 1e6
      }.min
      println(f"[compress] $label%-34s ${ms}%8.1f ms")
    }
    for ((tag, d) <- Seq(("stored", stored), ("deflate", defl))) {
      bench(s"$tag full scan", d)(p => spark.read.format("cole").load(p)
        .agg(sum("l_orderkey"), count(lit(1))).head())
      bench(s"$tag filtered scan", d)(p => spark.read.format("cole").load(p)
        .filter(col("l_partkey") < 400)
        .agg(sum("l_orderkey"), count(lit(1))).head())
      bench(s"$tag grouped agg", d)(p => spark.read.format("cole").load(p)
        .groupBy("l_returnflag").agg(sum("l_suppkey"), count(lit(1))).head())
    }
    spark.stop()
  }
}
