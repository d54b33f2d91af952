package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Scratch attribution harness for the optimization round: splits the
  * steady-state cost of the hot DML/CDC bench keys into phases (fixture
  * assumed already cached by a prior bench/Prof run — run those first).
  * `sbt "Test/runMain graft.tools.Attr <case> [runs] [sfDir]"`.
  */
object Attr {
  def time[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[attr] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "merge"
    val runs = if (args.length > 1) args(1).toInt else 4
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val s = Engine.session("local[32]")
    val wh = "/tmp/graft_cole/warehouse"
    s.conf.set("spark.sql.catalog.cole", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cole.warehouse", wh)
    // same fingerprint the suite mints
    val fpField = Class.forName("graft.queries.ColeSuite$")
    val mod = fpField.getField("MODULE$").get(null)
    val m = fpField.getDeclaredMethod("writerFingerprint")
    m.setAccessible(true)
    val fp = m.invoke(mod).asInstanceOf[String]
    val sfx = d.replaceAll("[^a-zA-Z0-9]", "_")

    which match {
      case "merge" =>
        // job-level attribution: print every job's wall time + first stage
        s.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              t0.put(js.jobId, System.nanoTime())
            }
            override def onJobEnd(
                je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val dt = (System.nanoTime() -
                t0.getOrDefault(je.jobId, System.nanoTime())) / 1e9
              println(f"[attr]   job ${je.jobId}%3d  $dt%7.3f s")
            }
          })
        val ns = s"v${fp}_mrg_$sfx"
        // fixture must exist (run the bench key once first via Prof)
        Tables.orders(s, d).select(col("o_orderkey").as("k"))
          .filter(col("o_orderkey") % 20 === 3)
          .withColumn("ln", lit(1))
          .createOrReplaceTempView("graft_merge_src")
        for (i <- 1 to runs) {
          println(s"[attr] --- run $i")
          time("merge-stmt") {
            s.sql(
              s"""MERGE INTO cole.$ns.li t USING graft_merge_src src
                 |ON t.l_orderkey = src.k AND t.l_linenumber = src.ln
                 |WHEN MATCHED AND t.l_returnflag NOT IN ('U', 'M') THEN
                 |  UPDATE SET qty_c = t.qty_c + 5000, l_returnflag = 'U'
                 |WHEN NOT MATCHED THEN
                 |  INSERT (l_orderkey, l_linenumber, l_returnflag, qty_c)
                 |  VALUES (src.k, src.ln, 'M', 0)""".stripMargin)
          }
          time("readout") {
            s.table(s"cole.$ns.li")
              .groupBy("l_returnflag")
              .agg(count(lit(1)).as("n"), sum("qty_c").as("sum_qty_c"),
                sum("l_orderkey").as("sum_key"))
              .orderBy("l_returnflag").count()
          }
        }
      case "cfd" =>
        val ns = s"v${fp}_cfd_$sfx"
        val dir = s"$wh/$ns/li"
        for (i <- 1 to runs) {
          println(s"[attr] --- run $i")
          val feed = time("feed-plan") {
            graft.sources.cole.ColeChangeFeed.read(s, dir, 1L, 3L)
          }
          time("feed-count") { feed.count() }
          time("feed-agg") {
            feed.groupBy(col("_change_type").as("change_type"),
              col("_commit_version").as("commit_version"), col("l_returnflag"))
              .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sum_key"),
                sum("l_linenumber").as("sum_line"))
              .orderBy("commit_version", "change_type", "l_returnflag").count()
          }
        }
      case "delete" =>
        val ns = s"v${fp}_del_$sfx"
        for (i <- 1 to runs) {
          println(s"[attr] --- run $i")
          time("delete-stmt") {
            s.sql(s"DELETE FROM cole.$ns.li " +
              "WHERE l_returnflag = 'R' AND l_orderkey < 10000")
          }
          time("readout") {
            s.table(s"cole.$ns.li").groupBy("l_returnflag")
              .agg(count(lit(1)).as("n"),
                sum("l_linenumber").as("sum_line"),
                min("l_orderkey").as("mn_key"), max("l_orderkey").as("mx_key"))
              .orderBy("l_returnflag").count()
          }
        }
      case "cdfsplit" =>
        // split the cdf_stream_pairs batch body: scan-only vs pair(no
        // sink) vs pair+parquet-sink — three stream runs, same fixture
        val ns = s"v${fp}_csp_$sfx"
        val dir = s"$wh/$ns/li"
        def streamWith(tag: String)(body: org.apache.spark.sql.DataFrame => Unit): Unit = {
          val cp = java.nio.file.Files
            .createTempDirectory("graft_cdfsplit_cp").toString
          time(tag) {
            val q = s.readStream.format("cole").option("changeFeed", "true")
              .option("startingVersion", "2").load(dir)
              .writeStream.foreachBatch {
                (b: org.apache.spark.sql.DataFrame, _: Long) => body(b); ()
              }
              .option("checkpointLocation", cp).start()
            try q.processAllAvailable() finally q.stop()
          }
        }
        for (i <- 1 to runs) {
          println(s"[attr] --- run $i")
          streamWith("scan-only(count)") { b => b.count(); () }
          streamWith("scan+pair(count)") { b =>
            graft.sources.cole.ColeCdfStream
              .pairUpdates(b, Seq("l_orderkey", "l_linenumber")).count(); ()
          }
          val out = java.nio.file.Files
            .createTempDirectory("graft_cdfsplit_out").toString
          streamWith("scan+pair+sink") { b =>
            graft.sources.cole.ColeCdfStream
              .pairUpdates(b, Seq("l_orderkey", "l_linenumber"))
              .write.mode("append").parquet(out); ()
          }
          streamWith("empty-batch(noop body)") { _ => () }
        }
      case "cdfpairs" =>
        val ns = s"v${fp}_csp_$sfx"
        val dir = s"$wh/$ns/li"
        for (i <- 1 to runs) {
          println(s"[attr] --- run $i")
          val out = java.nio.file.Files
            .createTempDirectory("graft_cdf_spairs_out").toString
          val cp = java.nio.file.Files
            .createTempDirectory("graft_cdf_spairs_cp").toString
          var nb = 0
          time("stream") {
            val q = s.readStream.format("cole").option("changeFeed", "true")
              .option("startingVersion", "2").load(dir)
              .writeStream.foreachBatch {
                (b: org.apache.spark.sql.DataFrame, _: Long) =>
                  nb += 1
                  time(s"  batch$nb-pair+sink") {
                    graft.sources.cole.ColeCdfStream
                      .pairUpdates(b, Seq("l_orderkey", "l_linenumber"))
                      .write.mode("append").parquet(out)
                  }
                  ()
              }
              .option("checkpointLocation", cp).start()
            try q.processAllAvailable() finally q.stop()
          }
          println(s"[attr] batches=$nb")
          time("readback") {
            s.read.parquet(out)
              .groupBy(col("_change_type").as("change_type"))
              .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sum_key"),
                sum("qty_c").as("sum_qty_c"))
              .orderBy("change_type").count()
          }
        }
      case "spj" =>
        // cole_spj_composite split: scan-only cost of each side vs the
        // zero-Exchange join+agg (VERDICT r17 ask #6) — plus footer-read
        // and file-open counters to check meta reuse across buckets
        val ns = s"v${fp}_spjc_$sfx"
        val a = s.table(s"cole.$ns.liqty")
        val b = s.table(s"cole.$ns.liprice")
        for (i <- 1 to runs) {
          println(s"[attr] --- run $i")
          val f0 = graft.sources.cole.ColeMetaCache.footerReads.get()
          val o0 = graft.sources.cole.ColeIO.opens.get()
          time("scan-a(noop)") {
            a.write.format("noop").mode("overwrite").save()
          }
          time("scan-b(noop)") {
            b.write.format("noop").mode("overwrite").save()
          }
          time("join+agg") {
            a.join(b, graft.sources.cole.ColeBucket.synthKeyJoinCond(
                a, b, "_ck", Seq("l_orderkey", "l_linenumber")))
              .groupBy(b("l_returnflag"))
              .agg(count(lit(1)).as("n"),
                sum(col("qty_c")).as("sum_qty_c"),
                sum(col("price_c")).as("sum_price_c"),
                min(a("l_orderkey")).as("mn_key"))
              .orderBy("l_returnflag").count()
          }
          println(s"[attr] footerReads=" +
            s"${graft.sources.cole.ColeMetaCache.footerReads.get() - f0} " +
            s"opens=${graft.sources.cole.ColeIO.opens.get() - o0}")
          time("join+agg(SPJ via merge hint)") {
            a.hint("merge")
              .join(b, graft.sources.cole.ColeBucket.synthKeyJoinCond(
                a, b, "_ck", Seq("l_orderkey", "l_linenumber")))
              .groupBy(b("l_returnflag"))
              .agg(count(lit(1)).as("n"),
                sum(col("qty_c")).as("sum_qty_c"),
                sum(col("price_c")).as("sum_price_c"),
                min(a("l_orderkey")).as("mn_key"))
              .orderBy("l_returnflag").count()
          }
        }
      case "dedup" =>
        // job-count attribution for Dedup.clusters: the r18 observe-based
        // convergence count must show ONE job per propagation round
        // (checkpoint materialization) instead of checkpoint + count
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        s.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet(); ()
            }
          })
        val fn = SparkEntry.queries("dedup_clusters")
        for (i <- 1 to runs) {
          jobs.set(0)
          time(s"dedup_clusters run $i") { fn(s, d).count() }
          Thread.sleep(300) // listener delivery is async — settle first
          println(s"[attr] jobs=${jobs.get()}")
        }
      case "explainmerge" =>
        val ns = s"v${fp}_mrg_$sfx"
        Tables.orders(s, d).select(col("o_orderkey").as("k"))
          .filter(col("o_orderkey") % 20 === 3)
          .withColumn("ln", lit(1))
          .createOrReplaceTempView("graft_merge_src")
        val df = s.sql(
          s"""EXPLAIN FORMATTED MERGE INTO cole.$ns.li t USING graft_merge_src src
             |ON t.l_orderkey = src.k AND t.l_linenumber = src.ln
             |WHEN MATCHED AND t.l_returnflag NOT IN ('U', 'M') THEN
             |  UPDATE SET qty_c = t.qty_c + 5000, l_returnflag = 'U'
             |WHEN NOT MATCHED THEN
             |  INSERT (l_orderkey, l_linenumber, l_returnflag, qty_c)
             |  VALUES (src.k, src.ln, 'M', 0)""".stripMargin)
        df.collect().foreach(r => println("[attr-plan] " +
          r.getString(0).replace("\n", "\n[attr-plan] ")))
      case other => sys.error(s"unknown case $other")
    }
    s.stop()
  }
}
