package graft.sources.cole

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max, when}

/** Row-level change feed over a versioned COLE table: the CDC surface
  * that serves EVERY commit kind — including row-level DML — as
  * `_change_type ∈ (insert, delete)` rows with a `_commit_version`
  * column, where the plain `changesFrom` insert feed must refuse. With
  * a `pairKey` armed it upgrades to the Delta-CDF four-type shape:
  * updates pair as `update_preimage` / `update_postimage` by key.
  *
  * Per in-range commit record:
  *   - row-preserving commits (`compact`) contribute nothing;
  *   - pure-add commits (append, baseline, streaming epochs) emit their
  *     added files' rows as inserts — no diff work at all;
  *   - merge-on-read commits (vector DELETE, delta UPDATE/MERGE; r10)
  *     are DELTA-EXACT with no diff join: the deleted rows ARE the
  *     commit's pinned vector ordinals minus the previous version's,
  *     read back by `_cole_pos`; new image files are plain inserts;
  *   - removing commits (UPDATE / DELETE / MERGE / overwrite / truncate)
  *     emit the multiset diff of the rows in the REPLACED files (their
  *     retired incarnations, named by the commit record) against the
  *     rows in the REPLACEMENT files: removed-but-not-rewritten rows as
  *     deletes, rewritten-or-new rows as inserts. An updated row appears
  *     as a delete (old image) plus an insert (new image) — the
  *     reconstruction contract `T(v-1) minus deletes plus inserts =
  *     T(v)` holds per commit;
  *   - `rollback` still refuses loudly: its files restore OLDER content
  *     whose semantic delta spans the whole rolled-over range — a CDC
  *     consumer must resynchronize, not treat it as a delta.
  *
  * Scale shape: each commit's diff touches ONLY the files that commit
  * named (delta-sized, not table-sized) and runs as one `exceptAll`
  * shuffle over those rows — the same cost class as Delta Lake's CDF
  * reconstruction for tables without materialized change files. Retired
  * bytes back the old images, so the feed stays readable until
  * `vacuumRetired` expires them (then it fails loudly, never silently
  * shorts the delta).
  */
object ColeChangeFeed {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** Slices for the ordinal-probe parallelize: ~16k (path, ordinal)
    * pairs per slice keeps every task binary a few hundred KB (measured
    * ~25 B/pair serialized) — bounded per task regardless of delta
    * size, spec-pinned.
    */
  def probeSlices(nPairs: Int): Int = math.max(1, 1 + nPairs / 16384)

  /** The option [[ColeDataSource]] accepts for an exact-file-set read:
    * URL-encoded `rel|phys` pairs joined by ','. Internal — minted here,
    * consumed by the scan builder; delta-sized (the files of one
    * commit), never a full listing.
    */
  val FeedFilesOption = "feedFiles"

  def encodeFiles(files: Seq[(String, String)]): String =
    files.map { case (rel, phys) =>
      URLEncoder.encode(rel, StandardCharsets.UTF_8) + "|" +
        URLEncoder.encode(phys, StandardCharsets.UTF_8)
    }.mkString(",")

  def decodeFiles(s: String): Seq[(String, String)] =
    s.split(',').toSeq.filter(_.nonEmpty).map { p =>
      val i = p.indexOf('|')
      (URLDecoder.decode(p.substring(0, i), StandardCharsets.UTF_8),
        URLDecoder.decode(p.substring(i + 1), StandardCharsets.UTF_8))
    }

  /** Companion option to [[FeedFilesOption]]: per-file row-group
    * restriction (`rel|i1;i2,…`) for ordinal-addressed reads — the scan
    * then plans ONLY the groups a merge-on-read delta's ordinals touch,
    * so serving a handful of deleted rows opens a handful of row groups
    * instead of decoding the whole vectored file set. Internal, KB-scale
    * (group indices, never ordinals).
    */
  val FeedRowGroupsOption = "feedRowGroups"

  def encodeRowGroups(m: Map[String, Seq[Int]]): String =
    m.toSeq.sortBy(_._1).map { case (rel, idxs) =>
      URLEncoder.encode(rel, StandardCharsets.UTF_8) + "|" +
        idxs.mkString(";")
    }.mkString(",")

  def decodeRowGroups(s: String): Map[String, Seq[Int]] =
    s.split(',').toSeq.filter(_.nonEmpty).map { p =>
      val i = p.indexOf('|')
      val idxs = p.substring(i + 1)
      (URLDecoder.decode(p.substring(0, i), StandardCharsets.UTF_8),
        if (idxs.isEmpty) Seq.empty[Int]
        else idxs.split(';').toSeq.map(_.toInt))
    }.toMap

  /** Conf key: when `true`, every removing (copy-on-write) DML commit
    * MATERIALIZES its change data — the delete/insert images land as
    * COLE files under `_cole_versions/cdf/v<version>/` at commit time,
    * so feed reads (and the streaming CDF source, which cannot run a
    * diff join inside partition planning) serve them as plain file
    * scans with zero `exceptAll` work. The same trade Delta Lake's
    * `delta.enableChangeDataFeed` makes: pay O(delta) extra write bytes
    * once, read the delta for free forever.
    */
  val MaterializeKey = "graft.cole.cdf.materialize"

  /** Feed reads served from materialized change files instead of a live
    * diff — spec-visible.
    */
  val materializedServes = new java.util.concurrent.atomic.AtomicLong(0)

  private def cdfDir(table: String, version: Long): HPath =
    new HPath(new HPath(new HPath(table, ColeVersions.DirName), "cdf"),
      f"v$version%012d")

  private def cdfMarker(dir: HPath): HPath = new HPath(dir, "_done")

  /** Whether commit `version`'s change data is materialized (complete —
    * the `_done` marker is written last).
    */
  def isMaterialized(table: String, conf: Configuration, version: Long): Boolean = {
    val (fs, _) = ColeIO.resolve(table, conf)
    fs.exists(cdfMarker(cdfDir(table, version)))
  }

  /** The materialized (side → data files) of commit `version`: sides
    * with zero rows were never written and are absent. Fails loudly on
    * an incomplete materialization (no marker).
    */
  private[cole] def materializedFiles(table: String, conf: Configuration,
      version: Long): Map[String, Seq[(String, String)]] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    val dir = cdfDir(table, version)
    require(fs.exists(cdfMarker(dir)),
      s"change data of $table v$version is not materialized")
    Seq("del", "ins").flatMap { side =>
      val d = new HPath(dir, side)
      if (!fs.exists(d)) None
      else Some(side -> fs.listStatus(d).toSeq
        .filter(st => st.getPath.getName.endsWith(".col"))
        .map(st => (st.getPath.getName,
          fs.makeQualified(st.getPath).toString)))
    }.toMap
  }

  /** Materialize commit `version`'s change data: compute the commit's
    * delete/insert images ONCE and persist them as COLE files under
    * `_cole_versions/cdf/v<version>/{del,ins}/`, marker written last
    * (a crash mid-write leaves no marker; readers fall back to the live
    * diff and a retry overwrites cleanly). Only removing (copy-on-write)
    * commits have anything to materialize — pure-add and merge-on-read
    * commits are already delta-exact from the record itself; those and
    * `compact`/`rollback` return false untouched. Idempotent.
    */
  def materialize(spark: SparkSession, table: String, version: Long): Boolean = {
    val conf = ColeIO.driverConf()
    val recs = ColeVersions.records(table, conf)
    val r = recs.find(_.version == version).getOrElse(
      throw new IllegalArgumentException(
        s"version $version does not exist on $table"))
    if (r.removes.isEmpty || r.op == "compact" || r.op == "rollback")
      return false
    val (fs, _) = ColeIO.resolve(table, conf)
    val dir = cdfDir(table, version)
    if (fs.exists(cdfMarker(dir))) return true
    fs.delete(dir, true) // torn previous attempt (no marker): restart clean
    val (del, ins) = cowImages(spark, table, conf, recs, r)
    def side(name: String, df: Option[DataFrame]): Unit = df.foreach { d =>
      d.write.format("cole").mode("overwrite")
        .save(new HPath(dir, name).toString)
    }
    side("del", del)
    side("ins", ins)
    val out = fs.create(cdfMarker(dir), true)
    try out.write("done".getBytes(StandardCharsets.UTF_8)) finally out.close()
    true
  }

  /** Exact-file-set read through the table's scan machinery (delta-sized
    * by construction — one commit's files).
    */
  private def readFiles(spark: SparkSession, table: String,
      files: Seq[(String, String)],
      rgKeep: Map[String, Seq[Int]] = Map.empty): Option[DataFrame] =
    if (files.isEmpty) None
    else {
      var r = spark.read.format("cole")
        .option("path", table)
        .option(FeedFilesOption, encodeFiles(files))
      if (rgKeep.nonEmpty)
        r = r.option(FeedRowGroupsOption, encodeRowGroups(rgKeep))
      Some(r.load())
    }

  /** Physical-today path of rel's incarnation as of `version` (live
    * unless removed since; then the retired path of the FIRST removal
    * after `version`).
    */
  private[cole] def resolveRel(table: String, conf: Configuration,
      recs: Seq[ColeVersions.Record], rel: String, version: Long): String = {
    val (fs, _) = ColeIO.resolve(table, conf)
    recs.flatMap(x => x.removes.collect {
      case (`rel`, t) if x.version > version => (x.version, t) })
      .sortBy(_._1).headOption match {
      case Some((_, retiredRel)) =>
        fs.makeQualified(new HPath(
          new HPath(table, ColeVersions.DirName), retiredRel)).toString
      case None => fs.makeQualified(new HPath(table, rel)).toString
    }
  }

  /** Rows of the given files AT (`keep = true`) or EXCLUDING
    * (`keep = false`) per-file PHYSICAL ordinals, as ONE scan plus ONE
    * join on `(_cole_file, _cole_pos)` — O(1) plan branches however
    * many files the commit touched. A FeedFiles read is physical by
    * design, so `_cole_pos` addresses stored rows exactly.
    *
    * The ordinal probe is PARALLELIZED, never a plan-embedded literal:
    * a LocalRelation of a large delete's ordinals (sf1 measured: 1.2 M
    * rows ≈ 7.4 MiB) would ship inside EVERY task binary of every stage
    * above it, and the per-file-DataFrame shape this replaces multiplied
    * that by the file count (32 files × per-file broadcast exchange =
    * a plan the driver spent minutes just serializing). Here the probe
    * rows live in their own RDD partitions and the join strategy is
    * AQE's choice: small deltas broadcast, large ones shuffle — both
    * delta-sized.
    */
  private def rowsAtOrdinalsOf(spark: SparkSession, table: String,
      files: Seq[(String, String, Array[Int])],
      keep: Boolean): Option[DataFrame] =
    if (files.isEmpty) None
    else {
      // keep = true serves a DELTA (the commit's freshly deleted rows):
      // restrict the scan to the row groups the ordinals touch — a
      // vector DELETE of k rows then opens O(k) groups, not the whole
      // vectored file set. keep = false MASKS a delta out of a full
      // file read; no groups can be dropped there.
      val rgKeep: Map[String, Seq[Int]] =
        if (!keep) Map.empty
        else {
          val conf = ColeIO.driverConf()
          val metaOf = ColeVersions.infosFor(table, conf,
            files.map(f => f._1 -> f._2), "change feed ordinal read")
            .map(i => i.path -> i.meta).toMap
          files.map { case (rel, phys, ords) =>
            val local = ColeDv.localize(metaOf(phys), ords.sorted)
            rel -> local.indices.filter(local(_) != null)
          }.toMap
        }
      readFiles(spark, table, files.map(f => f._1 -> f._2), rgKeep)
    }.map { df =>
      import spark.implicits._
      val sel = df.select((df.columns.map(col) :+
        col(ColeUtil.FileMetaCol) :+ col(ColeUtil.PosMetaCol)): _*)
      val pairs = files.flatMap { case (_, phys, ords) =>
        ords.iterator.map(o => (phys, o.toLong)) }
      // a ParallelCollectionRDD ships each slice's rows INSIDE the task
      // binary — slice by PAYLOAD, not core count, or a large delta rides
      // one multi-MB task (r11's "task of very large size" warning,
      // attributed r12: 60k pairs in one slice ≈ 1.4 MiB). Capped slices
      // keep every task's closure KB-scale; the extra tasks are
      // row-count-proportional map work, exactly what should scale out.
      val probe = spark.sparkContext
        .parallelize(pairs, probeSlices(pairs.length))
        .toDF("_dv_file", "_dv_ord")
      sel.join(probe,
          sel(ColeUtil.FileMetaCol) === probe("_dv_file") &&
            sel(ColeUtil.PosMetaCol) === probe("_dv_ord"),
          if (keep) "leftsemi" else "left_anti")
        .drop(ColeUtil.FileMetaCol).drop(ColeUtil.PosMetaCol)
    }

  /** Pinned-vector ordinals of rel as of `version` (empty when none);
    * fails loudly when the pinned sidecar was vacuumed.
    */
  private[cole] def dvOrdsAt(table: String, conf: Configuration,
      version: Long, rel: String): Array[Int] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    ColeVersions.dvAsOf(table, conf, version).get(rel) match {
      case None | Some(ColeVersions.DvCleared) => Array.empty[Int]
      case Some(dvRel) =>
        val p = ColeVersions.dvPath(table, dvRel)
        if (!fs.exists(p)) throw new IllegalStateException(
          s"pinned deletion vector $dvRel of $table/$rel is gone " +
            "(vacuumed?): the change feed range is no longer " +
            "reconstructible")
        ColeDv.parsePinned(fs, p)._3
    }
  }

  /** Fresh deletion-vector ordinals of one MOR commit: the commit's
    * pinned vector minus the previous version's — the EXACT delete set,
    * no diff join. Shared by the batch feed and the streaming source.
    */
  private[cole] def freshDvOrdinals(table: String, conf: Configuration,
      r: ColeVersions.Record): Seq[(String, Array[Int])] =
    r.dvs.flatMap { case (rel, dvRel) =>
      if (dvRel == ColeVersions.DvCleared) None
      else {
        val prev = dvOrdsAt(table, conf, r.version - 1, rel).toSet
        Some(rel -> dvOrdsAt(table, conf, r.version, rel).filterNot(prev))
      }
    }

  /** One removing (copy-on-write) commit's (delete images, insert
    * images): the multiset diff of the replaced files' rows (old
    * incarnations at their retired paths, earlier-version vector
    * ordinals masked) against the replacement files' rows.
    */
  private def cowImages(spark: SparkSession, table: String,
      conf: Configuration, recs: Seq[ColeVersions.Record],
      r: ColeVersions.Record): (Option[DataFrame], Option[DataFrame]) = {
    val adds = ColeVersions.resolveAdds(table, conf, recs, r)
    // old images live at the retired paths the record names. A replaced
    // file that carried a deletion vector at v-1 masks those ordinals —
    // its physical rows include rows deleted in EARLIER versions, which
    // are not part of THIS commit's delta
    val oldFiles = r.removes.map { case (rel, retiredRel) =>
      val (fs, _) = ColeIO.resolve(table, conf)
      (rel, fs.makeQualified(new HPath(
        new HPath(table, ColeVersions.DirName), retiredRel)).toString)
    }
    val withPrev = oldFiles.map { case (rel, phys) =>
      (rel, phys, dvOrdsAt(table, conf, r.version - 1, rel)) }
    val (oldVectored, oldPlain) = withPrev.partition(_._3.nonEmpty)
    val oldMasked = rowsAtOrdinalsOf(spark, table, oldVectored, keep = false)
    val oldDf = (readFiles(spark, table,
        oldPlain.map(f => f._1 -> f._2)).toSeq ++ oldMasked.toSeq)
      .reduceLeftOption(_.unionByName(_))
    val newDf = readFiles(spark, table, adds)
    // align on the common column set by NAME (schema evolution can
    // differ across the boundary); the diff is exact multiset
    val cols: Seq[String] = (oldDf, newDf) match {
      case (Some(o), Some(n)) => o.columns.toSeq.filter(n.columns.toSet)
      case (Some(o), None) => o.columns.toSeq
      case (None, Some(n)) => n.columns.toSeq
      case (None, None) => Seq.empty
    }
    def proj(df: DataFrame): DataFrame = df.select(cols.map(col): _*)
    val deletes = (oldDf, newDf) match {
      case (Some(o), Some(n)) => Some(proj(o).exceptAll(proj(n)))
      case (Some(o), None) => Some(proj(o))
      case _ => None
    }
    val inserts = (oldDf, newDf) match {
      case (Some(o), Some(n)) => Some(proj(n).exceptAll(proj(o)))
      case (None, Some(n)) => Some(proj(n))
      case _ => None
    }
    (deletes, inserts)
  }

  /** The change rows of commits in `(fromExclusive, toInclusive]`.
    * Output schema: the table's live data columns plus
    * `_change_type` (string) and `_commit_version` (long).
    *
    * `pairKey` (r10): a PRIMARY-KEY column list that upgrades the feed
    * to the Delta-CDF four-type shape — within each commit, a delete and
    * an insert sharing the key pair as `update_preimage` /
    * `update_postimage`; unmatched rows stay `delete` / `insert`. Works
    * uniformly over copy-on-write diffs and merge-on-read ordinal
    * deltas. The key must be row-unique per version (a real primary
    * key): duplicate keys pair many-to-many and the feed rejects none of
    * it — same contract as key-based CDC reconstruction anywhere.
    */
  def read(spark: SparkSession, table: String, fromExclusive: Long,
      toInclusive: Long, pairKey: Seq[String] = Nil): DataFrame = {
    val conf = ColeIO.driverConf()
    val recs = ColeVersions.records(table, conf)
    require(fromExclusive <= toInclusive,
      s"changesFrom ($fromExclusive) must be <= changesTo ($toInclusive)")
    // retention guard: refuse expired ranges up front with the earliest
    // un-expired version, not a missing-file error mid-diff
    val horizon = ColeVersions.expiryHorizon(table, conf)
    require(fromExclusive >= horizon,
      s"change feed range ($fromExclusive, $toInclusive] of $table " +
        s"starts at or below the expiry horizon v$horizon and is no " +
        s"longer reconstructible: the earliest un-expired version is " +
        s"v${horizon + 1} — resynchronize from a snapshot (versionAsOf) " +
        "and read changes from there")
    require(fromExclusive == 0 || recs.exists(_.version == fromExclusive),
      s"version $fromExclusive does not exist on $table")
    require(recs.exists(_.version == toInclusive),
      s"version $toInclusive does not exist on $table")
    val inRange = recs.filter(r =>
      r.version > fromExclusive && r.version <= toInclusive)
    val rollbacks = inRange.filter(_.op == "rollback")
    require(rollbacks.isEmpty,
      s"change feed range ($fromExclusive, $toInclusive] of $table contains " +
        s"rollback commits ${rollbacks.map(r => s"v${r.version}").mkString(", ")}: " +
        "a rollback restores older content whose delta spans the whole " +
        "rolled-over range — resynchronize from a snapshot instead")

    // label one commit's raw delete/insert sides, pairing updates by key
    // when a pairKey is armed: a delete and an insert sharing the key
    // within the SAME commit are the two images of an UPDATE
    def emit(version: Long, del: Option[DataFrame],
        ins: Option[DataFrame]): Seq[DataFrame] = {
      def tag(df: DataFrame, t: String): DataFrame = df
        .withColumn(ChangeTypeCol, lit(t))
        .withColumn(CommitVersionCol, lit(version))
      (del, ins) match {
        case (Some(d), Some(i)) if pairKey.nonEmpty =>
          pairKey.foreach(k => require(
            d.columns.contains(k) && i.columns.contains(k),
            s"pairKey column '$k' is not in the change feed's column set"))
          // keys present on BOTH sides of this commit = updated rows.
          // ONE window pass over the unioned sides (r17): the former
          // intersect + four semi/anti joins re-executed each side's
          // scan three times and shuffled five times; a key-partitioned
          // window labels every row in one shuffle with identical
          // semantics (window partitioning groups NULL keys together,
          // exactly like intersect's null-safe equality).
          val side = "_cole_cdf_side"
          val u = d.withColumn(side, lit("d"))
            .unionByName(i.withColumn(side, lit("i")))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(pairKey.map(col): _*)
          val hasD = max(when(col(side) === "d", 1).otherwise(0)).over(w)
          val hasI = max(when(col(side) === "i", 1).otherwise(0)).over(w)
          val ct = when(col(side) === "d",
              when(hasI === 1, "update_preimage").otherwise("delete"))
            .otherwise(
              when(hasD === 1, "update_postimage").otherwise("insert"))
          Seq(u.withColumn(ChangeTypeCol, ct)
            .withColumn(CommitVersionCol, lit(version))
            .drop(side))
        case _ =>
          del.map(tag(_, "delete")).toSeq ++ ins.map(tag(_, "insert")).toSeq
      }
    }

    val parts: Seq[DataFrame] = inRange.filterNot(_.op == "compact").flatMap { r =>
      val adds = ColeVersions.resolveAdds(table, conf, recs, r)
      if (r.removes.isEmpty && r.dvs.isEmpty) {
        // pure-add commit: every added row is an insert, no diff needed
        // (and no pairing — nothing was deleted)
        readFiles(spark, table, adds).map(df => df
          .withColumn(ChangeTypeCol, lit("insert"))
          .withColumn(CommitVersionCol, lit(r.version)))
      } else if (r.removes.isEmpty) {
        // merge-on-read commit (vector DELETE / delta UPDATE / MERGE):
        // the DELETE side is EXACT from the pinned ordinals — this
        // commit's vector minus the previous version's — served by one
        // scan over the vectored files + one ordinal join; new image
        // files (if any) are plain inserts
        val withOrds = freshDvOrdinals(table, conf, r)
          .filter(_._2.nonEmpty).map { case (rel, fresh) =>
            (rel, resolveRel(table, conf, recs, rel, r.version), fresh) }
        val deletes = rowsAtOrdinalsOf(spark, table, withOrds, keep = true)
        emit(r.version, deletes, readFiles(spark, table, adds))
      } else if (isMaterialized(table, conf, r.version)) {
        // materialized removing commit: the images are already on disk —
        // plain delta-sized file scans, zero diff work
        materializedServes.incrementAndGet()
        val sides = materializedFiles(table, conf, r.version)
        emit(r.version,
          sides.get("del").flatMap(readFiles(spark, table, _)),
          sides.get("ins").flatMap(readFiles(spark, table, _)))
      } else {
        val (deletes, inserts) = cowImages(spark, table, conf, recs, r)
        emit(r.version, deletes, inserts)
      }
    }
    parts.reduceLeftOption { (a, b) =>
      a.unionByName(b, allowMissingColumns = true)
    }.getOrElse {
      val live = spark.read.format("cole").option("path", table).load()
      live.limit(0)
        .withColumn(ChangeTypeCol, lit("insert"))
        .withColumn(CommitVersionCol, lit(0L))
    }
  }
}
