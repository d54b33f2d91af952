package graft.sources.cole

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

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

    def readFiles(files: Seq[(String, String)]): Option[DataFrame] =
      if (files.isEmpty) None
      else Some(spark.read.format("cole")
        .option("path", table)
        .option(FeedFilesOption, encodeFiles(files))
        .load())

    // physical-today path of rel's incarnation as of `version` (live
    // unless removed since; then the retired path of the FIRST removal
    // after `version`)
    def resolveRel(rel: String, version: Long): String = {
      val (fs, _) = ColeIO.resolve(table, conf)
      recs.flatMap(x => x.removes.collect {
        case (`rel`, t) if x.version > version => (x.version, t) })
        .sortBy(_._1).headOption match {
        case Some((_, retiredRel)) =>
          fs.makeQualified(new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(table, ColeVersions.DirName),
            retiredRel)).toString
        case None => fs.makeQualified(
          new org.apache.hadoop.fs.Path(table, rel)).toString
      }
    }

    // the rows of `rel` at the given PHYSICAL ordinals — a FeedFiles
    // read is physical by design, so `_cole_pos` addresses stored rows
    // exactly; the ordinal set is delta-sized (one commit's deletes) and
    // broadcast-joins, never a literal IN list
    def rowsAtOrdinals(rel: String, phys: String,
        ords: Array[Int]): Option[DataFrame] =
      if (ords.isEmpty) None
      else readFiles(Seq(rel -> phys)).map { df =>
        import spark.implicits._
        val sel = df.select((df.columns.map(col) :+
          col(ColeUtil.PosMetaCol)): _*)
        val probe = ords.map(_.toLong).toSeq.toDF("_dv_ord")
        sel.join(org.apache.spark.sql.functions.broadcast(probe),
            sel(ColeUtil.PosMetaCol) === probe("_dv_ord"), "leftsemi")
          .drop(ColeUtil.PosMetaCol)
      }

    // pinned-vector ordinals of rel as of `version` (empty when none)
    def dvOrdsAt(version: Long, rel: String): Array[Int] = {
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
          // keys present on BOTH sides of this commit = updated rows
          val both = d.select(pairKey.map(col): _*)
            .intersect(i.select(pairKey.map(col): _*))
          Seq(tag(d.join(both, pairKey, "leftsemi"), "update_preimage"),
            tag(d.join(both, pairKey, "left_anti"), "delete"),
            tag(i.join(both, pairKey, "leftsemi"), "update_postimage"),
            tag(i.join(both, pairKey, "left_anti"), "insert"))
        case _ =>
          del.map(tag(_, "delete")).toSeq ++ ins.map(tag(_, "insert")).toSeq
      }
    }

    val parts: Seq[DataFrame] = inRange.filterNot(_.op == "compact").flatMap { r =>
      val adds = ColeVersions.resolveAdds(table, conf, recs, r)
      if (r.removes.isEmpty && r.dvs.isEmpty) {
        // pure-add commit: every added row is an insert, no diff needed
        // (and no pairing — nothing was deleted)
        readFiles(adds).map(df => df
          .withColumn(ChangeTypeCol, lit("insert"))
          .withColumn(CommitVersionCol, lit(r.version)))
      } else if (r.removes.isEmpty) {
        // merge-on-read commit (vector DELETE / delta UPDATE / MERGE):
        // the DELETE side is EXACT from the pinned ordinals — this
        // commit's vector minus the previous version's — no diff join at
        // all; new image files (if any) are plain inserts
        val deletes = r.dvs.flatMap { case (rel, dvRel) =>
          if (dvRel == ColeVersions.DvCleared) None
          else {
            val prev = dvOrdsAt(r.version - 1, rel).toSet
            val fresh = dvOrdsAt(r.version, rel).filterNot(prev)
            rowsAtOrdinals(rel, resolveRel(rel, r.version), fresh)
          }
        }.reduceLeftOption(_.unionByName(_, allowMissingColumns = true))
        emit(r.version, deletes, readFiles(adds))
      } else {
        // removing commit: old images live at the retired paths the
        // record names; diff against the replacement rows. A replaced
        // file that carried a deletion vector at v-1 masks those
        // ordinals — its physical rows include rows deleted in EARLIER
        // versions, which are not part of THIS commit's delta
        val oldFiles = r.removes.map { case (rel, retiredRel) =>
          val (fs, _) = ColeIO.resolve(table, conf)
          (rel, fs.makeQualified(new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(table, ColeVersions.DirName),
            retiredRel)).toString)
        }
        val (oldVectored, oldPlain) = oldFiles.partition { case (rel, _) =>
          dvOrdsAt(r.version - 1, rel).nonEmpty }
        val oldMasked: Seq[DataFrame] = oldVectored.flatMap { case (rel, phys) =>
          readFiles(Seq(rel -> phys)).map { df =>
            import spark.implicits._
            val prev = dvOrdsAt(r.version - 1, rel)
            val sel = df.select((df.columns.map(col) :+
              col(ColeUtil.PosMetaCol)): _*)
            val probe = prev.map(_.toLong).toSeq.toDF("_dv_ord")
            sel.join(org.apache.spark.sql.functions.broadcast(probe),
                sel(ColeUtil.PosMetaCol) === probe("_dv_ord"), "left_anti")
              .drop(ColeUtil.PosMetaCol)
          }
        }
        val oldDf = (readFiles(oldPlain).toSeq ++ oldMasked)
          .reduceLeftOption(_.unionByName(_))
        val newDf = readFiles(adds)
        // align on the common column set by NAME (schema evolution can
        // differ across the boundary); the diff is exact multiset
        val cols: Seq[String] = (oldDf, newDf) match {
          case (Some(o), Some(n)) =>
            o.columns.toSeq.filter(n.columns.toSet)
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
