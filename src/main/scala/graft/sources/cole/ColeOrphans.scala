package graft.sources.cole

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Orphan-file cleanup — the maintenance verb for crash leftovers
  * (`CALL cole.system.remove_orphan_files`): data files under the table
  * root that NO reachable state references (a write job that died after
  * landing files but before its commit record; an abandoned dotted
  * in-progress file whose task never renamed it; a sidecar whose data
  * file was removed outside the normal paths), Iceberg's
  * remove_orphan_files / Delta's VACUUM-of-untracked contract.
  *
  * Safety model:
  *
  *   - AGE-GUARDED: only files older than the horizon (default 72h) are
  *     candidates — an in-flight job's just-written files are never
  *     eligible, no matter how the scan interleaves with it.
  *   - The version log decides liveness on versioned tables: a file is
  *     kept iff its table-relative path is in the CURRENT fold (retired
  *     incarnations live under `_cole_versions/`, which — like every
  *     `_`-prefixed path — the scan never enters: retention is
  *     [[ColeVersions.vacuumRetired]]'s job, branches/refs/claims have
  *     their own lifecycles).
  *   - On UNVERSIONED tables the listing IS the live set, so only
  *     non-`.col` junk (dead dotted temps, stray sidecars) can be
  *     orphaned.
  *   - Sidecars (deletion vector / bloom) of LIVE files are kept.
  *   - Dry-run mode lists what WOULD go, byte-for-byte the same scan.
  *
  * At 100 TB: one recursive listing of the data tree (the same cost as
  * any cold planning pass), no data reads — candidates are decided on
  * (path, mtime) alone.
  */
object ColeOrphans {

  final case class Orphan(path: String, sizeBytes: Long)

  /** Scan (and unless `dryRun`, delete) orphans older than `olderThanMs`.
    * Returns the orphans found, sorted by path.
    */
  def removeOrphans(table: String, conf: Configuration, olderThanMs: Long,
      dryRun: Boolean): Seq[Orphan] = {
    require(olderThanMs > 0, "older_than must be positive: the age guard " +
      "is what keeps an in-flight write's files safe")
    val (fs, root) = ColeIO.resolve(table, conf)
    if (!fs.exists(root)) return Seq.empty
    val cutoff = System.currentTimeMillis() - olderThanMs
    val rootQ = fs.makeQualified(root).toString

    // live rels: the version fold when versioned (files a lost commit
    // landed are NOT live — exactly the orphans), the listing otherwise
    val live: Set[String] =
      if (ColeVersions.enabled(table, conf))
        ColeVersions.snapshotAt(table, conf,
          ColeVersions.currentVersion(table, conf)).map(_._1).toSet
      else
        ColeIO.listPartitioned(table, conf)
          .map { case (st, _) => ColeVersions.relOf(fs, table, st.getPath.toString) }
          .toSet
    // live files keep their sidecars (vector, bloom) — compare on rel
    val keepSidecars: Set[String] = live.flatMap { rel =>
      val abs = s"$rootQ/$rel"
      Seq(ColeDv.sidecarPath(abs), ColeBloomIndex.sidecarPath(abs))
        .map(_.stripPrefix(rootQ + "/"))
    }

    val found = scala.collection.mutable.ArrayBuffer.empty[Orphan]
    val dirs = scala.collection.mutable.ArrayBuffer.empty[String]
    // newest mtime anywhere under `st` (incl. the dir itself): the age
    // gate for removing a dotted scratch tree WHOLE — a live maintenance
    // job keeps landing files in its scratch, so its newest stays fresh
    def newestMtime(st: org.apache.hadoop.fs.FileStatus): Long =
      if (!st.isDirectory) st.getModificationTime
      else (st.getModificationTime +:
        fs.listStatus(st.getPath).map(newestMtime).toSeq).max
    def walk(dir: HPath): Unit = fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) {
        if (name.startsWith(".")) {
          // dotted directories are maintenance scratch (.compact-*,
          // .rebucket-*): invisible to every reader, so an ABANDONED one
          // (crashed job) is pure debris — removable whole once nothing
          // under it is younger than the horizon
          if (newestMtime(st) < cutoff) {
            val rel = fs.makeQualified(st.getPath).toString
              .stripPrefix(rootQ + "/")
            def treeSize(s: org.apache.hadoop.fs.FileStatus): Long =
              if (!s.isDirectory) s.getLen
              else fs.listStatus(s.getPath).map(treeSize).sum
            found += Orphan(rel, treeSize(st))
            dirs += rel
          }
        }
        // `_`-prefixed trees are the connector's own state (version log,
        // claims, refs) with their own lifecycles — never scanned
        else if (!name.startsWith("_")) walk(st.getPath)
      } else if (!name.startsWith("_")) {
        // `_`-prefixed FILES at any level are sidecars-of-the-layout
        // (_bucketspec, _temporalspec, _checks, _tablespec…) — kept
        val rel = fs.makeQualified(st.getPath).toString.stripPrefix(rootQ + "/")
        val referenced = live.contains(rel) || keepSidecars.contains(rel)
        if (!referenced && st.getModificationTime < cutoff)
          found += Orphan(rel, st.getLen)
      }
    }
    walk(root)
    val sorted = found.sortBy(_.path).toSeq
    if (!dryRun) sorted.foreach(o =>
      fs.delete(new HPath(root, o.path), dirs.contains(o.path)))
    sorted
  }
}
