package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.cole.ColeMeta

/** The reference engine's CLI surface (reference: src/cli.cpp), re-hosted
  * on Spark — a reference user's exact entry points keep working:
  *
  * {{{
  * write <output.col> <num_rows> [seed]   synthetic table, same shape/schema
  * scan  <input.col>                      file metadata + page stats
  * query <input.col> [--select c1,c2] [--where col op value]...
  *                   [--agg func col] [--groupby col]
  * }}}
  *
  * ops: eq ne lt le gt ge; funcs: count sum min max — the reference's
  * exact grammar. Queries compile to DataFrame plans over the COLE DSv2
  * connector, so pushdown/pruning/page skipping apply identically to CLI
  * use and library use.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val spark = Engine.session()
    try args(0) match {
      case "write" =>
        val seed = if (args.length > 3) args(3).toLong else 42L
        write(spark, args(1), args(2).toLong, seed)
        println(s"Generated ${args(2)} rows in ${args(1)}")
      case "scan" =>
        scanText(spark, args(1)).foreach(println)
      case "query" =>
        val df = buildQuery(spark, args(1), args.drop(2))
        df.show(df.schema.length max 20, truncate = false)
      // ---- engine-own maintenance surface (beyond the reference CLI):
      // the table-ops a warehouse operator runs from cron
      case "versioning" =>
        val v = graft.sources.cole.ColeVersions.enable(args(1),
          graft.sources.cole.ColeIO.driverConf())
        println(s"versioning enabled on ${args(1)} at v$v")
      case "history" =>
        graft.sources.cole.ColeVersions
          .records(args(1), graft.sources.cole.ColeIO.driverConf())
          .foreach { r =>
            println(f"v${r.version}%-6d ${new java.sql.Timestamp(r.ts)}  " +
              f"${r.op}%-10s +${r.adds.size}%-5d -${r.removes.size}%d")
          }
      case "rollback" =>
        val v = graft.sources.cole.ColeVersions.rollback(args(1),
          graft.sources.cole.ColeIO.driverConf(), args(2).toLong)
        println(s"rolled ${args(1)} back to v${args(2)} as new v$v")
      case "audit" =>
        val (missing, unexpected) = graft.sources.cole.ColeVersions
          .audit(args(1), graft.sources.cole.ColeIO.driverConf())
        missing.foreach(m => println(s"MISSING (in log, not on disk): $m"))
        unexpected.foreach(u => println(s"UNTRACKED (on disk, not in log): $u"))
        if (missing.isEmpty && unexpected.isEmpty) println("clean")
        else sys.exit(1)
      case "vacuum" =>
        val conf = graft.sources.cole.ColeIO.driverConf()
        val ttlMs = (if (args.length > 2) args(2).toLong else 168L) * 3600_000L
        val crash = graft.sources.cole.ColeCompact.vacuum(args(1), conf, ttlMs)
        val retired =
          if (graft.sources.cole.ColeVersions.enabled(args(1), conf))
            graft.sources.cole.ColeVersions.vacuumRetired(args(1), conf, ttlMs)
          else 0
        println(s"removed $crash crash leftovers, expired $retired retired files")
      case "compact" =>
        val target = (if (args.length > 2) args(2).toLong else 128L) << 20
        val st = graft.sources.cole.ColeCompact.compact(spark, args(1), target)
        println(s"compacted ${st.compactedDirs}/${st.dirs} dirs: " +
          s"${st.filesBefore} -> ${st.filesAfter} files, " +
          s"${st.bytesBefore} -> ${st.bytesAfter} bytes")
      case "compact-debt" =>
        val target = (if (args.length > 2) args(2).toLong else 128L) << 20
        val pct = if (args.length > 3) args(3).toDouble / 100.0 else 0.1
        val minSmall = if (args.length > 4) args(4).toInt else 4
        val fold = args.length > 5 && (args(5) == "fold" || args(5) == "true")
        val st = graft.sources.cole.ColeCompact.compactDebt(spark, args(1),
          target, pct, minSmall, foldDebt = fold)
        println(s"compacted ${st.compactedDirs}/${st.dirs} debtor dirs: " +
          s"${st.filesBefore} -> ${st.filesAfter} files, " +
          s"${st.bytesBefore} -> ${st.bytesAfter} bytes")
      case "zorder" =>
        val target = (if (args.length > 4) args(4).toLong else 128L) << 20
        val st = graft.sources.cole.ColeCompact.zorder(spark, args(1),
          args(2), args(3), target)
        println(s"z-ordered ${st.compactedDirs}/${st.dirs} dirs on " +
          s"(${args(2)}, ${args(3)}): ${st.filesBefore} -> ${st.filesAfter} files")
      case "bloom-index" =>
        val n = graft.sources.cole.ColeBloomIndex.build(args(1),
          args(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          graft.sources.cole.ColeIO.driverConf())
        println(s"indexed $n files on [${args(2)}]")
      case "delete-mode" =>
        graft.sources.cole.ColeDv.setMode(args(1),
          graft.sources.cole.ColeIO.driverConf(), args(2))
        println(s"delete_mode(${args(1)}) = ${args(2)}")
      case "repair" =>
        val q = graft.sources.cole.ColeVersions.repairTorn(args(1),
          graft.sources.cole.ColeIO.driverConf())
        if (q.isEmpty) println("no torn version records")
        else q.foreach(r => println(s"quarantined $r"))
      case "materialize-cdf" =>
        val conf = graft.sources.cole.ColeIO.driverConf()
        val versions =
          if (args.length > 2) Seq(args(2).toLong)
          else graft.sources.cole.ColeVersions.records(args(1), conf)
            .filter(r => r.removes.nonEmpty && r.op != "compact" &&
              r.op != "rollback").map(_.version)
        val n = versions.count(
          graft.sources.cole.ColeChangeFeed.materialize(spark, args(1), _))
        println(s"materialized change data of $n commit(s)")
      case "checkpoint" =>
        val v = graft.sources.cole.ColeVersions.checkpoint(args(1),
          graft.sources.cole.ColeIO.driverConf())
        println(s"checkpointed ${args(1)} at v$v")
      case "evolve-bucket" =>
        val conf = graft.sources.cole.ColeIO.driverConf()
        val (n, cols) = graft.sources.cole.ColeBucket.parseOption(args(2))
        val synth = if (args.length > 3) Some(args(3)) else None
        val eras = synth match {
          case Some(s) => graft.sources.cole.ColeBucket.evolve(
            args(1), conf, n, Seq(s), Some(s -> cols))
          case None => graft.sources.cole.ColeBucket.evolve(
            args(1), conf, n, cols)
        }
        println(eras.map(e => s"${e.n}:${e.cols.mkString(",")}")
          .mkString(" -> "))
      case "evolve-partition" =>
        val conf = graft.sources.cole.ColeIO.driverConf()
        val cols = if (args.length > 2)
          args(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        else Seq.empty
        val eras = graft.sources.cole.ColePartEvolve.evolve(args(1), conf, cols)
        println(eras.map(e => s"[${e.cols.mkString(",")}]").mkString(" -> "))
      case "rebucket" =>
        val st = graft.sources.cole.ColeRebucket.rebucket(spark, args(1))
        println(s"rebucketed ${st.filesRewritten} old-era file(s) into " +
          s"${st.filesOut} (${st.rows} rows); ${st.filesKept} already active")
      case "tag" =>
        val conf = graft.sources.cole.ColeIO.driverConf()
        val v = graft.sources.cole.ColeRefs.createTag(args(1), conf, args(2),
          if (args.length > 3) Some(args(3).toLong) else None)
        println(s"tagged ${args(1)} v$v as '${args(2)}'")
      case "drop-tag" =>
        val existed = graft.sources.cole.ColeRefs.dropTag(args(1),
          graft.sources.cole.ColeIO.driverConf(), args(2))
        println(if (existed) s"dropped tag '${args(2)}'"
          else s"no tag '${args(2)}'")
      case "branch" =>
        val fork = graft.sources.cole.ColeRefs.createBranch(args(1),
          graft.sources.cole.ColeIO.driverConf(), args(2),
          if (args.length > 3) Some(args(3).toLong) else None)
        println(s"branched ${args(1)} at v$fork as '${args(2)}'")
      case "drop-branch" =>
        val existed = graft.sources.cole.ColeRefs.dropBranch(args(1),
          graft.sources.cole.ColeIO.driverConf(), args(2))
        println(if (existed) s"dropped branch '${args(2)}' and its staging"
          else s"no branch '${args(2)}'")
      case "publish" =>
        val (n, v) = graft.sources.cole.ColeRefs.fastForward(args(1),
          graft.sources.cole.ColeIO.driverConf(), args(2),
          allowDiverged = args.length > 3 && args(3) == "--allow-diverged")
        println(s"published $n file(s) of branch '${args(2)}' as v$v")
      case "refs" =>
        val conf = graft.sources.cole.ColeIO.driverConf()
        graft.sources.cole.ColeRefs.tags(args(1), conf).toSeq.sorted
          .foreach { case (n, v) => println(f"tag    $n%-24s v$v") }
        graft.sources.cole.ColeRefs.branches(args(1), conf).foreach { b =>
          println(f"branch ${b.name}%-24s fork v${b.fork} head v${b.head} " +
            s"(${b.stagedFiles} staged file(s))")
        }
      case "clone" =>
        val version =
          if (args.length > 3 && args(3) != "--deep") Some(args(3).toLong)
          else None
        val deep = args.contains("--deep")
        val (v, n) = graft.sources.cole.ColeClone.clone(args(1), args(2),
          version, deep, graft.sources.cole.ColeIO.driverConf())
        println(s"cloned ${args(1)} @ v$v into ${args(2)} " +
          s"(${if (deep) s"$n file(s) copied" else s"$n foreign file(s), zero-copy"})")
      case "localize" =>
        val n = graft.sources.cole.ColeClone.localize(args(1),
          graft.sources.cole.ColeIO.driverConf())
        println(s"localized ${args(1)}: $n file(s) copied in")
      case "remove-orphans" =>
        val hours = if (args.length > 2) args(2).toLong else 72L
        val dry = args.length > 3 && args(3) == "--dry-run"
        val orphans = graft.sources.cole.ColeOrphans.removeOrphans(args(1),
          graft.sources.cole.ColeIO.driverConf(), hours * 3600_000L, dry)
        orphans.foreach(o => println(s"${o.path}\t${o.sizeBytes}"))
        println(s"${if (dry) "would remove" else "removed"} " +
          s"${orphans.size} orphan(s)")
      case other =>
        System.err.println(s"Unknown command: $other"); usage(); sys.exit(2)
    } finally spark.stop()
  }

  private def usage(): Unit = System.err.println(
    """Usage: graft.Cli <command> [options]
      |  write <output.col> <num_rows> [seed]
      |  scan <input.col>
      |  query <input.col> [--select c1,c2,..] [--where col op value]...
      |        [--agg func col] [--groupby col]
      |  versioning <table>              enable snapshot versioning
      |  history <table>                 version log (one line per commit)
      |  repair <table>                  quarantine torn version records
      |  zorder <table> <colA> <colB> [target_mb]   re-cluster in place
      |  bloom-index <table> <c1,c2,..>  build string point-lookup sidecars
      |  delete-mode <table> vector|copy merge-on-read DML toggle
      |  rollback <table> <version>     restore as a NEW commit
      |  audit <table>                   version log vs directory drift
      |  vacuum <table> [ttl_hours]      crash leftovers + expired retired files
      |  compact <table> [target_mb]     small-file compaction
      |  compact-debt <table> [target_mb] [min_deleted_pct] [min_small_files] [fold]
      |                                  rewrite only directories over a
      |                                  vector-debt or small-file threshold;
      |                                  'fold' also migrates pre-SUMS (v1)
      |                                  stragglers so aggregates fold
      |  materialize-cdf <table> [version]
      |                                  persist change-data images of
      |                                  copy-on-write commits (all, or one)
      |  checkpoint <table>              fold the version log (cold reads
      |                                  then cost checkpoint + tail)
      |  evolve-bucket <table> <n:cols> [synthCol]
      |                                  re-declare the hash layout, zero
      |                                  rewrites (new era)
      |  evolve-partition <table> [cols] re-declare the identity hive
      |                                  partition columns, zero rewrites
      |                                  (omit cols to drop partitioning)
      |  rebucket <table>                rewrite old bucket eras into the
      |                                  active layout (SPJ returns)
      |  tag <table> <name> [version]    pin a version under an immutable
      |                                  name (VERSION AS OF 'name')
      |  drop-tag <table> <name>         release the name + retention pin
      |  branch <table> <name> [version] fork a write-audit-publish branch
      |  drop-branch <table> <name>      discard a branch and its staging
      |  publish <table> <name> [--allow-diverged]
      |                                  fast-forward a branch onto main
      |  clone <src> <dst> [version] [--deep]
      |                                  zero-copy snapshot clone (pins the
      |                                  version; --deep copies bytes too)
      |  localize <table>                copy a clone's foreign bytes in,
      |                                  release the pin (full DML returns)
      |  refs <table>                    list tags and branches
      |  remove-orphans <table> [hours] [--dry-run]
      |                                  age-guarded crash-leftover sweep""".stripMargin)

  /** Synthetic table with the reference generator's shape (reference:
    * src/cli.cpp createSyntheticSchema/generateSyntheticData): id INT64
    * ascending, value INT64 uniform 0..10000, category INT32 1..5, region
    * / status low-cardinality strings.
    *
    * A `.col` FILE target reproduces the reference CLI byte-for-byte in
    * values: the same mt19937(seed) stream, distribution draws, row-group
    * size (10000) and per-column encodings ([[writeRefStream]]) — `write`
    * output diffs clean across engines. A directory target takes the
    * distributed path (splitmix-style hash per row, each task derives
    * rows from the row index): an inherently sequential mt19937 stream
    * cannot be generated in parallel, which is what a 100 TB write needs.
    */
  def write(spark: SparkSession, path: String, numRows: Long, seed: Long): Unit = {
    val (cfs, cp) = graft.sources.cole.ColeIO.resolve(path,
      graft.sources.cole.ColeIO.driverConf())
    if (path.endsWith(".col") && !(cfs.exists(cp) && cfs.getFileStatus(cp).isDirectory)) {
      writeRefStream(path, numRows, seed)
      return
    }
    val regions = array(lit("north"), lit("south"), lit("east"), lit("west"))
    val statuses = array(lit("active"), lit("pending"), lit("closed"))
    def h(salt: Int): Column =
      abs(xxhash64(col("id"), lit(seed), lit(salt)))
    spark.range(numRows)
      .select(
        col("id"),
        (h(1) % 10001).as("value"),
        (h(2) % 5 + 1).cast("int").as("category"),
        element_at(regions, (h(3) % 4 + 1).cast("int")).as("region"),
        element_at(statuses, (h(4) % 3 + 1).cast("int")).as("status"))
      .write.format("cole").mode("overwrite").save(path)
  }

  /** The reference generator's exact stream into one `.col` file:
    * mt19937(seed), draws in row order (value, category, region, status),
    * 10000-row groups, encodings PLAIN/DELTA/RLE/DICT/DICT (reference:
    * src/cli.cpp:29-62, 64-118).
    */
  def writeRefStream(path: String, numRows: Long, seed: Long): Unit = {
    import graft.sources.cole._
    import graft.sources.cole.ColeFormat._
    val regions = Array("north", "south", "east", "west")
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val statuses = Array("active", "pending", "closed")
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val cols = Seq(
      ColeColumn("id", TInt64, Plain), ColeColumn("value", TInt64, Delta),
      ColeColumn("category", TInt32, Rle), ColeColumn("region", TString, Dict),
      ColeColumn("status", TString, Dict))
    val rng = new Mt19937(seed)
    val writer = new ColeFileWriter(path, cols)
    try {
      var written = 0L
      while (written < numRows) {
        val n = math.min(10000L, numRows - written).toInt
        val ids = new Array[Long](n)
        val values = new Array[Long](n)
        val cats = new Array[Int](n)
        val regs = new Array[Array[Byte]](n)
        val stats = new Array[Array[Byte]](n)
        var i = 0
        while (i < n) {
          ids(i) = written + i
          values(i) = rng.uniformInt(0, 10000)
          cats(i) = rng.uniformInt(1, 5).toInt
          regs(i) = regions(rng.uniformInt(0, 3).toInt)
          stats(i) = statuses(rng.uniformInt(0, 2).toInt)
          i += 1
        }
        writer.writeRowGroup(Seq(
          ColumnData(null, ids, null), ColumnData(null, values, null),
          ColumnData(cats, null, null), ColumnData(null, null, regs),
          ColumnData(null, null, stats)), n)
        written += n
      }
    } finally writer.close()
  }

  /** The `scan` report, as printable lines (reference: cli.cpp scanFile). */
  def scanText(spark: SparkSession, path: String): Seq[String] = {
    val summary = ColeMeta.summary(spark, path).collect()
    val pages = ColeMeta.describe(spark, path).collect()
    summary.flatMap { s =>
      Seq(s"File: ${s.getString(0)}",
        s"Total rows: ${s.getLong(1)}",
        s"Row groups: ${s.getInt(2)}",
        s"Schema: ${s.getString(3)}") ++
        pages.filter(_.getString(0) == s.getString(0)).map { p =>
          val stats = (p.get(8), p.get(9)) match {
            case (mn: Long, mx: Long) => s", min=$mn, max=$mx"
            case _ => ""
          }
          s"  rg=${p.getInt(1)} col=${p.getString(2)} (${p.getString(3)}, " +
            s"${p.getString(4)}) page=${p.getInt(5)} values=${p.getInt(6)}" + stats
        }
    }.toSeq
  }

  /** `query` flags → a DataFrame plan (exposed for tests). */
  def buildQuery(spark: SparkSession, path: String, opts: Array[String]): DataFrame = {
    var df = spark.read.format("cole").load(path)
    var agg: Option[(String, String)] = None
    var groupBy: Option[String] = None
    var i = 0
    while (i < opts.length) {
      opts(i) match {
        case "--select" =>
          df = df.select(opts(i + 1).split(',').map(c => col(c.trim)).toIndexedSeq: _*)
          i += 2
        case "--where" =>
          val (c, op, v) = (col(opts(i + 1)), opts(i + 2), opts(i + 3).toLong)
          df = df.filter(op match {
            case "eq" => c === v
            case "ne" => c =!= v
            case "lt" => c < v
            case "le" => c <= v
            case "gt" => c > v
            case "ge" => c >= v
            case other => throw new IllegalArgumentException(s"Invalid comparison operator: $other")
          })
          i += 4
        case "--agg" =>
          agg = Some((opts(i + 1), opts(i + 2))); i += 3
        case "--groupby" =>
          groupBy = Some(opts(i + 1)); i += 2
        case other =>
          throw new IllegalArgumentException(s"Unknown option: $other")
      }
    }
    def aggCols(fn: String, c: String) = fn match {
      case "count" => Seq(count(lit(1)).as("count"))
      case "sum" => Seq(count(lit(1)).as("count"), sum(col(c)).as("sum"))
      case "min" => Seq(count(lit(1)).as("count"), min(col(c)).as("min"))
      case "max" => Seq(count(lit(1)).as("count"), max(col(c)).as("max"))
      case other => throw new IllegalArgumentException(s"Invalid aggregation function: $other")
    }
    (groupBy, agg) match {
      case (Some(g), fa) =>
        // reference group-by always reports count + sum of the agg column
        val sumCol = fa.map(_._2)
        val aggs = count(lit(1)).as("count") +:
          sumCol.map(c => sum(col(c)).as("sum")).toSeq
        df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*).orderBy(col(g))
      case (None, Some((fn, c))) =>
        df.agg(aggCols(fn, c).head, aggCols(fn, c).tail: _*)
      case (None, None) => df
    }
  }
}
