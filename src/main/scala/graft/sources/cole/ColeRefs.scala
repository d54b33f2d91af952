package graft.sources.cole

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Named refs over the version log — TAGS (immutable named versions)
  * and BRANCHES (writable forks for write-audit-publish), the Iceberg
  * refs / Delta WAP capability on top of [[ColeVersions]].
  *
  *   - A TAG pins a version under a name: `VERSION AS OF 'release-1'`
  *     (SQL through the catalog) or `versionAsOf=release-1` (read
  *     option) resolve it; retention ([[ColeVersions.vacuumRetired]])
  *     never expires at or above the oldest ref, so a tagged snapshot
  *     stays reconstructible until its tag is dropped.
  *   - A BRANCH is an append-only writable fork: data written with the
  *     `branch=<name>` option (or the `graft.cole.write.branch` session
  *     conf — the WAP pattern: point a whole ingest job at the branch
  *     without touching its sinks) lands INVISIBLY under
  *     `_cole_versions/branchdata/<name>/` with the table's exact
  *     layout (partitions / buckets / temporal units / sort), and a
  *     branch read serves main-as-of-fork plus the branch's appends.
  *     `CALL cole.system.fast_forward` publishes: the staged files
  *     RENAME to their live paths (metadata moves, no data copy) and
  *     ONE main commit records them — audit queries ran against the
  *     exact bytes that go live.
  *
  * Branches are append-only BY DESIGN here: the WAP use case is
  * validating new data before exposure, and appends publish as pure
  * renames with no conflict surface. Row-level DML / overwrite /
  * truncate on a branch reject loudly (mutate main, or publish first) —
  * an honest boundary rather than a silently-different merge semantics.
  *
  * Storage layout (all under the version log, so plain readers and the
  * orphan scan never see it):
  *
  *   _cole_versions/_refs/tag/<name>       version:<v>      (immutable)
  *   _cole_versions/_refs/branch/<name>    fork:<v>         (immutable)
  *   _cole_versions/_refs/branchlog/<name>/v<seq>           (CAS log)
  *   _cole_versions/branchdata/<name>/<table-relative path> (staged)
  *
  * Branch record sequence numbers continue the MAIN numbering from the
  * fork (fork+1, fork+2, ...), so "branch head" is a version in the
  * same space a tag or time travel uses. Records are exclusive-create
  * CAS like main commits ([[ColeCommitPrimitives]] — conditional PUT on
  * object stores); concurrent branch appends serialize the same way
  * main appends do.
  *
  * At 100 TB: a branch stages only its NEW bytes (main files are
  * referenced through the fork snapshot, never copied), publish is one
  * rename per staged file plus one KB-scale record, and a branch read
  * plans like a time-travel read — footer-stat skipping, column
  * pruning, filter pushdown all intact (bucket/SPJ claims are withdrawn
  * on branch reads: audit-sized queries, conservative by construction).
  */
object ColeRefs {

  /** Session conf: route every versioned COLE append in the session to
    * this branch — the write-audit-publish switch (Iceberg's
    * `spark.wap.branch`). Explicit `branch` write options win.
    */
  val WapBranchConfKey = "graft.cole.write.branch"

  private val RefsName = "_refs"
  private val BranchDataName = "branchdata"

  private def vdir(table: String): HPath = new HPath(table, ColeVersions.DirName)
  private def refsDir(table: String): HPath = new HPath(vdir(table), RefsName)
  private def tagPath(table: String, name: String): HPath =
    new HPath(new HPath(refsDir(table), "tag"), name)
  private def branchPath(table: String, name: String): HPath =
    new HPath(new HPath(refsDir(table), "branch"), name)
  private def branchLogDir(table: String, name: String): HPath =
    new HPath(new HPath(refsDir(table), "branchlog"), name)

  /** Table-relative rel of the branch-publish mutex ([[ColeClaims]]
    * marker path) — publish/drop and every branch commit serialize on
    * it, so a publish can never race a straggling append into losing
    * its files with the branch directory.
    */
  private def branchClaimRel(name: String): String = s"$RefsName/branch/$name"

  /** Staging root of a branch: table-relative layout paths mirror under
    * it 1:1, so publish is `rename(branchdata/<name>/<rel>, <rel>)`.
    */
  def branchDataRoot(table: String, name: String): String =
    new HPath(new HPath(vdir(table), BranchDataName), name).toString

  /** Ref names share a namespace with SQL `VERSION AS OF` strings, so a
    * purely numeric name is rejected — it would shadow a version number.
    */
  def validateName(name: String): Unit = {
    require(name.nonEmpty &&
      name.forall(c => c.isLetterOrDigit || "._-".contains(c)),
      s"ref name '$name' must be non-empty [A-Za-z0-9._-]")
    require(!name.startsWith("."),
      s"ref name '$name' must not start with '.' — dotted names are " +
        "reserved for the publish recovery markers")
    require(name.toLongOption.isEmpty,
      s"ref name '$name' is purely numeric — it would be ambiguous with " +
        "a version number in VERSION AS OF")
  }

  private def writeRef(fs: FileSystem, conf: Configuration, p: HPath,
      key: String, v: Long, what: String): Unit = {
    fs.mkdirs(p.getParent)
    val body = (s"$key:$v\nts:${System.currentTimeMillis()}\nend")
      .getBytes(StandardCharsets.UTF_8)
    val out =
      try ColeCommitPrimitives.of(conf).exclusiveCreate(fs, p)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new IllegalArgumentException(s"$what already exists")
      }
    var ok = false
    try { out.write(body); ok = true } finally {
      out.close()
      // our own torn ref must not block every future create under TTL-less
      // ref semantics — delete it before propagating
      if (!ok) try fs.delete(p, false) catch { case _: Exception => () }
    }
  }

  private def readRef(fs: FileSystem, p: HPath, key: String): Option[Long] = {
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val lines = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      .split('\n').toSeq finally in.close()
    if (!lines.lastOption.contains("end")) None // torn create: not a ref
    else lines.collectFirst {
      case l if l.startsWith(key + ":") => l.drop(key.length + 1).toLong
    }
  }

  private def listRefs(fs: FileSystem, dir: HPath, key: String,
      includeDotted: Boolean = false): Map[String, Long] = {
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).iterator.filter(_.isFile)
      // dotted entries are publish recovery markers, not refs — listed
      // only where their retention pin matters
      .filter(st => includeDotted || !st.getPath.getName.startsWith("."))
      .flatMap { st =>
        readRef(fs, st.getPath, key).map(st.getPath.getName -> _)
      }.toMap
  }

  // ---------------------------------------------------------------- tags

  /** Tag `version` (default: the current one) under `name`. Immutable:
    * re-tagging an existing name is an error (drop it first). Returns
    * the tagged version.
    */
  def createTag(table: String, conf: Configuration, name: String,
      version: Option[Long] = None): Long = {
    validateName(name)
    val (fs, _) = ColeIO.resolve(table, conf)
    require(fs.exists(vdir(table)),
      s"refs need versioning, which is not enabled on $table")
    val v = version.getOrElse(ColeVersions.currentVersion(table, conf))
    // the tag must point at a reconstructible version — loud here, not at
    // first read
    ColeVersions.snapshotAt(table, conf, v)
    writeRef(fs, conf, tagPath(table, name), "version", v, s"tag '$name'")
    v
  }

  /** Drop a tag; returns whether it existed. Dropping releases its
    * retention pin — the versions it protected become expirable.
    */
  def dropTag(table: String, conf: Configuration, name: String): Boolean = {
    val (fs, _) = ColeIO.resolve(table, conf)
    fs.delete(tagPath(table, name), false)
  }

  /** All tags: name → version. */
  def tags(table: String, conf: Configuration): Map[String, Long] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    listRefs(fs, new HPath(refsDir(table), "tag"), "version")
  }

  // --------------------------------------------------------- clone pins

  private def clonePath(table: String, name: String): HPath =
    new HPath(new HPath(refsDir(table), "clone"), name)

  /** Pin `version` for a zero-copy clone ([[ColeClone]]): exactly a tag
    * under `_refs/clone/` — `expire_versions` caps at the oldest ref, so
    * the clone's file set stays reconstructible until the pin drops
    * (localize, or dropping the clone table). Visible in `$refs` as type
    * 'clone', but never resolvable by `VERSION AS OF`.
    */
  def createClonePin(table: String, conf: Configuration, name: String,
      version: Long): Unit = {
    validateName(name)
    val (fs, _) = ColeIO.resolve(table, conf)
    require(fs.exists(vdir(table)),
      s"refs need versioning, which is not enabled on $table")
    ColeVersions.snapshotAt(table, conf, version) // reconstructible, or loud
    writeRef(fs, conf, clonePath(table, name), "version", version,
      s"clone pin '$name'")
  }

  /** Release a clone pin; returns whether it existed. */
  def dropClonePin(table: String, conf: Configuration, name: String): Boolean = {
    val (fs, _) = ColeIO.resolve(table, conf)
    fs.delete(clonePath(table, name), false)
  }

  /** All clone pins: name → pinned version. */
  def clonePins(table: String, conf: Configuration): Map[String, Long] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    listRefs(fs, new HPath(refsDir(table), "clone"), "version")
  }

  // ------------------------------------------------------------ branches

  final case class Branch(name: String, fork: Long, head: Long,
      stagedFiles: Int)

  /** Create a branch forked at `from` (default: the current version).
    * Returns the fork version.
    */
  def createBranch(table: String, conf: Configuration, name: String,
      from: Option[Long] = None): Long = {
    validateName(name)
    val (fs, _) = ColeIO.resolve(table, conf)
    require(fs.exists(vdir(table)),
      s"refs need versioning, which is not enabled on $table")
    val fork = from.getOrElse(ColeVersions.currentVersion(table, conf))
    require(fork >= 1, s"cannot branch an empty log (version $fork); " +
      "commit something first")
    ColeVersions.snapshotAt(table, conf, fork) // reconstructible, or loud
    writeRef(fs, conf, branchPath(table, name), "fork", fork, s"branch '$name'")
    fork
  }

  /** Does `name` exist as a branch of `table`? (Non-throwing — the
    * WAP-conf READ route falls back to main when the branch doesn't
    * exist on a table, so one session conf can drive a multi-table job
    * where only some tables are branched.)
    */
  def branchExists(table: String, conf: Configuration,
      name: String): Boolean = {
    val (fs, _) = ColeIO.resolve(table, conf)
    readRef(fs, branchPath(table, name), "fork").isDefined
  }

  /** Fork version of a live branch — loud when it doesn't exist. */
  def branchFork(table: String, conf: Configuration, name: String): Long = {
    val (fs, _) = ColeIO.resolve(table, conf)
    readRef(fs, branchPath(table, name), "fork").getOrElse(
      throw new IllegalArgumentException(
        s"branch '$name' does not exist on $table (create it with " +
          "CALL <catalog>.system.create_branch)"))
  }

  /** All branches with their staging state. */
  def branches(table: String, conf: Configuration): Seq[Branch] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    listRefs(fs, new HPath(refsDir(table), "branch"), "fork").toSeq.sorted
      .map { case (name, fork) =>
        val recs = branchRecords(fs, table, name, fork)
        Branch(name, fork, fork + recs.size, foldRecords(recs)._1.size)
      }
  }

  private def branchRecName(seq: Long): String = f"v$seq%012d"

  /** One complete branch record: staged-path `adds`, branch-local
    * `removes` of earlier staged files (a branch DML replaced them), and
    * `masks` — table-relative rels of FORK (main-owned) files the branch's
    * row-level DML replaced. A masked file is hidden from branch reads
    * and RETIRED by the publish commit; the branch never touches main's
    * bytes (mask-don't-retire, the clone-DML pattern's third use).
    */
  final case class BranchRec(seq: Long, adds: Seq[String],
      removes: Seq[String], masks: Seq[String])

  /** Complete branch records in order. An in-flight tail record (no
    * terminal line) is ignored; a torn interior one is loud — the same
    * discipline as the main log.
    */
  private def branchRecords(fs: FileSystem, table: String, name: String,
      fork: Long): Seq[BranchRec] = {
    val dir = branchLogDir(table, name)
    if (!fs.exists(dir)) return Seq.empty
    val parsed = fs.listStatus(dir).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (!n.startsWith("v")) None
      else n.drop(1).toLongOption.map { seq =>
        val in = fs.open(st.getPath)
        val lines = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          .split('\n').toSeq finally in.close()
        (seq, lines.lastOption.contains("end"),
          BranchRec(seq,
            lines.filter(_.startsWith("add:")).map(_.drop(4)),
            lines.filter(_.startsWith("remove:")).map(_.drop(7)),
            lines.filter(_.startsWith("mask:")).map(_.drop(5))))
      }
    }.toSeq.sortBy(_._1)
    val lastComplete = parsed.filter(_._2).map(_._1).maxOption.getOrElse(0L)
    parsed.foreach { case (seq, complete, _) =>
      require(complete || seq > lastComplete,
        s"torn branch record v$seq on branch '$name' of $table " +
          "(crash during commit?); drop and recreate the branch")
    }
    parsed.filter(_._2).map(_._3)
  }

  /** The branch's LIVE staged rels (adds minus later removes, in commit
    * order) and its accumulated fork-file masks.
    */
  private def foldRecords(recs: Seq[BranchRec])
      : (Seq[String], Set[String]) = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    recs.foreach { r =>
      r.removes.foreach(live -= _)
      live ++= r.adds
    }
    (live.toSeq, recs.flatMap(_.masks).toSet)
  }

  /** Fork-file rels this branch's row-level DML has masked. */
  def branchMasks(table: String, conf: Configuration,
      name: String): Set[String] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    foldRecords(branchRecords(fs, table, name,
      branchFork(table, conf, name)))._2
  }

  /** Table-relative rel of the branch claim — exposed for the row-level
    * commit, which holds it across its re-check + renames + record.
    */
  def branchClaimRelOf(name: String): String = branchClaimRel(name)


  /** Commit one branch append: CAS the next record onto the branch log.
    * Serialized against publish/drop via the branch claim — an append
    * can never land its record after a publish already collected the
    * branch (its files would vanish with the branch directory).
    * `adds` are table-relative (equal to staging-root-relative) paths.
    * Returns the branch head after the commit.
    */
  def commitBranchAppend(table: String, conf: Configuration, name: String,
      adds: Seq[String]): Long = {
    val (fs, _) = ColeIO.resolve(table, conf)
    val claim = ColeClaims.acquire(fs, conf, table,
      Seq(branchClaimRel(name)), s"branch-append:$name")
    try {
      val fork = branchFork(table, conf, name) // re-check under the claim
      commitBranchRecord(fs, conf, table, name, fork, "append",
        adds, Seq.empty, Seq.empty)
    } finally claim.release()
  }

  /** Commit one branch row-level DML record: `adds` (new staged files),
    * `removes` (replaced branch-staged rels) and `masks` (replaced
    * fork-owned rels). CALLER MUST HOLD the branch claim — the DML
    * commit holds it across its whole re-check + rename + record window.
    *
    * On a versioned CLONE, masks may name SOURCE-owned rels; the record
    * keeps them undistinguished on purpose — publish resolves
    * foreignness through the live clone pointer at retire time
    * (fastForward's copy-retire lane), so a localize between the DML and
    * the publish graduates the mask to an ordinary local retirement
    * with no record rewrite.
    */
  def commitBranchDml(table: String, conf: Configuration, name: String,
      adds: Seq[String], removes: Seq[String], masks: Seq[String]): Long = {
    val (fs, _) = ColeIO.resolve(table, conf)
    val fork = branchFork(table, conf, name)
    commitBranchRecord(fs, conf, table, name, fork,
      "rowlevel", adds, removes, masks)
  }

  /** CAS the next record onto the branch log (no claim here — every
    * caller already serializes on the branch claim).
    */
  private def commitBranchRecord(fs: FileSystem, conf: Configuration,
      table: String, name: String, fork: Long, op: String,
      adds: Seq[String], removes: Seq[String], masks: Seq[String]): Long = {
    {
      val dir = branchLogDir(table, name)
      fs.mkdirs(dir)
      val body = (Seq(s"ts:${System.currentTimeMillis()}", s"op:$op") ++
        adds.map("add:" + _) ++ removes.map("remove:" + _) ++
        masks.map("mask:" + _) :+ "end").mkString("\n")
        .getBytes(StandardCharsets.UTF_8)
      var attempt = 0
      while (attempt < 1000) {
        val seq = fork + branchRecords(fs, table, name, fork).size + 1
        val p = new HPath(dir, branchRecName(seq))
        var created = false
        try {
          val out = ColeCommitPrimitives.of(conf).exclusiveCreate(fs, p)
          created = true
          try out.write(body) finally out.close()
          return seq
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            // we hold the branch claim, so the occupant is not a live
            // concurrent append: a COMPLETE record means our seq read
            // raced a cache boundary (recount and retry); a torn one is
            // a dead append's partial write (its claim TTL-broke) —
            // safe to clear and reuse the slot
            val in = fs.open(p)
            val complete = try new String(in.readAllBytes(),
              StandardCharsets.UTF_8).split('\n').lastOption.contains("end")
            finally in.close()
            if (!complete) fs.delete(p, false)
            attempt += 1
          case e: java.io.IOException =>
            if (created) {
              try fs.delete(p, false) catch { case _: Exception => () }
              attempt += 1
            } else throw e
        }
      }
      throw new IllegalStateException(
        s"could not commit branch record on '$name' of $table " +
          "after 1000 attempts")
    }
  }

  /** The branch's file set: main as of the fork (retired-path resolution
    * included — a file main rewrote since the fork reads from its
    * retired bytes) MINUS the branch's DML masks, plus the branch's live
    * staged files.
    */
  def branchFiles(table: String, conf: Configuration,
      name: String): (ColeVersions.SnapshotState, Seq[(String, String)]) = {
    val (fs, _) = ColeIO.resolve(table, conf)
    val fork = branchFork(table, conf, name)
    val st = ColeVersions.snapshotState(table, conf, fork)
    val root = branchDataRoot(table, name)
    val (live, masks) = foldRecords(branchRecords(fs, table, name, fork))
    val visible =
      if (masks.isEmpty) st
      else st.copy(files = st.files.filterNot { case (rel, _) => masks(rel) })
    val staged = live.map(rel => (rel,
      fs.makeQualified(new HPath(root, rel)).toString))
    (visible, staged)
  }

  /** Footer-backed infos + pinned deletion vectors of a branch read —
    * what the scan builder needs. Partition values parse from the
    * table-relative path for main and staged files alike (the staging
    * root mirrors the layout).
    */
  def branchInfos(table: String, conf: Configuration, name: String)
      : (Seq[ColeMetaCache.FileInfo], Map[String, Array[Int]]) = {
    val (st, staged) = branchFiles(table, conf, name)
    val infos = ColeVersions.infosFor(table, conf, st.files ++ staged,
      s"branch '$name'")
    (infos, ColeVersions.resolveSnapshotDvs(table, conf, st))
  }

  /** Publish the branch onto main (fast-forward): staged files RENAME to
    * their live table paths and ONE `publish` commit records them; the
    * branch is then dropped. By default main must not have advanced past
    * the fork (the audited state is exactly what goes live) — a diverged
    * main rejects loudly, listing the interfering commits;
    * `allowDiverged` publishes the appends anyway (pure adds compose
    * with any interleaved commit).
    *
    * CHECK constraints are re-validated over the staged bytes before
    * anything renames: a constraint ADDED after the branch write (whose
    * populated-table scan cannot see invisible staged files) still
    * gates publication.
    *
    * A publish that crashed mid-rename leaves its `.publishing` marker;
    * re-running fast_forward RESUMES it — the remaining staged files
    * rename, the publish commit lands exactly once (a post-commit crash
    * finds its record in the log instead of re-recording), cleanup
    * finishes. Without the resume, the renamed-but-uncommitted files are
    * invisible to fold-planned reads and the orphan sweep would
    * eventually collect them — branch data loss.
    *
    * Returns (files published, new main version).
    */
  def fastForward(table: String, conf: Configuration, name: String,
      allowDiverged: Boolean = false): (Int, Long) = {
    val (fs, _) = ColeIO.resolve(table, conf)
    val claim = ColeClaims.acquire(fs, conf, table,
      Seq(branchClaimRel(name)), s"branch-publish:$name")
    try {
      val ref = branchPath(table, name)
      val retired = new HPath(ref.getParent, s".${name}.publishing")
      val resuming = !fs.exists(ref) && fs.exists(retired)
      val fork =
        if (resuming) readRef(fs, retired, "fork").getOrElse(
          throw new IllegalStateException(
            s"torn publish marker for branch '$name' of $table — " +
              "cannot resume; audit _cole_versions/_refs"))
        else branchFork(table, conf, name)
      if (!resuming) {
        val head = ColeVersions.currentVersion(table, conf)
        if (!allowDiverged) require(head == fork,
          s"main advanced past the fork of branch '$name' " +
            s"(fork v$fork, head v$head): the audited state is no longer " +
            "what would go live — re-audit and publish with " +
            "allow_diverged => true, or drop the branch")
        // retire the REF first (under the claim): any append that
        // re-checks the branch after this fails loudly instead of landing
        // files the collection below would never see
        fs.delete(retired, false)
        require(fs.rename(ref, retired), s"branch '$name' ref rename failed")
      }
      val root = branchDataRoot(table, name)
      // tracks whether this invocation started moving files: a failure
      // BEFORE the first rename (divergence, validation) restores the
      // ref — the branch stays usable; after it, the marker stays for a
      // resuming fast_forward (restoring the ref would let appends land
      // under a half-published log)
      var renamedAny = false
      try {
        val (adds, masks) = foldRecords(branchRecords(fs, table, name, fork))
        // a branch carrying row-level DML retires MAIN files at publish:
        // that is only sound against exactly the state that was audited.
        // With a diverged main a masked file may already be rewritten or
        // retired — publishing would lose main's newer rows — so masks
        // force the strict head==fork rule regardless of allow_diverged.
        if (masks.nonEmpty && !resuming) {
          val head = ColeVersions.currentVersion(table, conf)
          require(head == fork,
            s"branch '$name' carries row-level DML (masked files) and " +
              s"main advanced past its fork (fork v$fork, head v$head): " +
              "retiring the masked files is no longer sound — re-audit " +
              "on a fresh branch or drop this one (allow_diverged does " +
              "not apply to DML branches)")
        }
        // a RESUMING DML-branch publish re-checks the same rule: the
        // crashed attempt's claim TTL-broke, so a main commit could have
        // landed in the window and a masked rel's LIVE file may now be a
        // NEWER incarnation — retiring it would lose main's rows. The
        // only main commit that may exist is the publish's own (a
        // post-commit crash), which the exactly-once lookup below finds.
        val publishedVersion: Option[Long] =
          if (!resuming) None
          else ColeVersions.records(table, conf).find(r =>
            r.version > fork && r.op == s"publish-$name" &&
              (adds.isEmpty || r.adds.toSet == adds.toSet)).map(_.version)
        if (masks.nonEmpty && resuming && publishedVersion.isEmpty) {
          val head = ColeVersions.currentVersion(table, conf)
          require(head == fork,
            s"main advanced (fork v$fork, head v$head) during a crashed " +
              s"publish of DML branch '$name': the masked files' live " +
              "incarnations are no longer the audited ones — audit " +
              "_cole_versions/_refs and the retired dir before retrying")
        }
        // validate only what's still staged: on a resume, files already
        // renamed passed validation in the original attempt (validation
        // runs before the first rename)
        val pending = adds.filter(rel => fs.exists(new HPath(root, rel)))
        validateChecks(table, conf, name,
          pending.map(rel => (rel,
            fs.makeQualified(new HPath(root, rel)).toString)))
        adds.foreach { rel =>
          val src = new HPath(root, rel)
          val dst = new HPath(table, rel)
          if (fs.exists(src)) {
            fs.mkdirs(dst.getParent)
            renamedAny = true
            require(fs.rename(src, dst), s"publish rename failed: $rel " +
              "(target exists? audit the table)")
          } else require(resuming && fs.exists(dst),
            s"staged file missing: $rel (branch '$name' of $table has " +
              "neither a staged nor a live copy — audit the table)")
        }
        // retire the masked fork files (mask-don't-retire pays off here:
        // the branch never moved main's bytes, so the publish applies
        // the audited DML as ordinary retirements). Deterministic stamp:
        // a resume finds a half-retired set and completes it instead of
        // failing on the already-moved files.
        val retireStamp = s"publish-$name-$fork"
        if (masks.nonEmpty) renamedAny = true
        // a VERSIONED CLONE's branch DML masks rels the SOURCE owns: the
        // publish cannot move those bytes. Resolve each masked rel's
        // current physical path through the pointer and COPY-retire it
        // under this table's own log — the versioned-clone main-lane
        // discipline (ColeRowLevel), so the publish commit's remove
        // references an ordinary retired path and the derived mask
        // (ColeClone.read's log fold) hides the source rel from then on.
        lazy val clonePhys: Map[String, String] =
          ColeClone.readPointerOnly(table, conf)
            .fold(Map.empty[String, String])(cs =>
              ColeClone.foreignRelOf(cs, conf).map(_.swap))
        val verRemoves = masks.toSeq.sorted.flatMap { rel =>
          val live = new HPath(table, rel)
          if (publishedVersion.isDefined) {
            // post-commit crash: retirement already happened and the
            // commit is durable — never touch live files here (a
            // post-publish commit may have re-minted a same-named rel)
            Seq(rel -> ColeVersions.retiredRelOf(retireStamp, rel))
          } else if (fs.exists(live)) {
            fs.delete(new HPath(ColeBloomIndex.sidecarPath(live.toString)),
              false)
            ColeDv.drop(fs, live.toString)
            ColeVersions.retireOrDelete(fs, table, live.toString,
              retireStamp, versioned = true)
          } else if (clonePhys.contains(rel)) {
            // foreign mask — copy, don't move. Runs on RESUME too (no
            // retiredExists skip): FileUtil.copy is not atomic and a
            // crashed attempt may have left a torn retired copy; the
            // copy is idempotent, overwrite finishes it
            Seq(ColeVersions.copyRetire(fs, table, clonePhys(rel), rel,
              retireStamp))
          } else {
            // resume: this rel was already retired by the crashed attempt
            val retiredRel = ColeVersions.retiredRelOf(retireStamp, rel)
            require(ColeVersions.retiredExists(fs, table, retireStamp, rel),
              s"masked file missing: $rel (branch '$name' of $table has " +
                "neither a live nor a retired copy — audit the table)")
            Seq(rel -> retiredRel)
          }
        }
        // exactly-once commit: a resume whose crash was post-commit found
        // the record above (matched by op AND adds — a same-named branch
        // published long ago can never satisfy it) instead of re-adding
        val v = publishedVersion
          .getOrElse(ColeVersions.commitIfEnabled(table, conf,
            s"publish-$name", adds, verRemoves).getOrElse(
            throw new IllegalStateException(s"versioning disabled on $table?")))
        // the branch is consumed: its log and (now empty) staging dir go
        fs.delete(branchLogDir(table, name), true)
        fs.delete(new HPath(root), true)
        fs.delete(retired, false)
        (adds.size, v)
      } catch {
        case e: Throwable =>
          if (!resuming && !renamedAny &&
              fs.exists(retired) && !fs.exists(ref)) fs.rename(retired, ref)
          throw e
      }
    } finally claim.release()
  }

  /** Re-validate the table's CHECK constraints over the staged files —
    * SQL three-valued semantics (violation iff exactly FALSE). Loud on
    * the first violating constraint. No-op without constraints or rows.
    */
  private def validateChecks(table: String, conf: Configuration,
      name: String, staged: Seq[(String, String)]): Unit = {
    val checks = ColeChecks.read(table, conf)
    if (checks.isEmpty || staged.isEmpty) return
    val spark = org.apache.spark.sql.SparkSession.active
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val df = spark.read.format("cole")
      .option(ColeChangeFeed.FeedFilesOption,
        ColeChangeFeed.encodeFiles(staged))
      .load(table)
    checks.foreach { case (cname, sql) =>
      val bad = df.filter(not(coalesce(expr(sql), lit(true)))).count()
      require(bad == 0,
        s"publishing branch '$name' of $table would violate CHECK " +
          s"constraint '$cname' ($sql) on $bad staged row(s) — the " +
          "constraint was declared after the branch write; fix the data " +
          "or drop the constraint")
    }
  }

  /** Drop a branch and everything it staged; returns whether it existed.
    * Serialized against in-flight appends the same way publish is.
    */
  def dropBranch(table: String, conf: Configuration, name: String): Boolean = {
    val (fs, _) = ColeIO.resolve(table, conf)
    val claim = ColeClaims.acquire(fs, conf, table,
      Seq(branchClaimRel(name)), s"branch-drop:$name")
    try {
      val existed = fs.delete(branchPath(table, name), false)
      fs.delete(branchLogDir(table, name), true)
      fs.delete(new HPath(branchDataRoot(table, name)), true)
      existed
    } finally claim.release()
  }

  // ----------------------------------------------------------- retention

  /** The retention pin of every live ref: a tag pins its version, a
    * branch its fork — [[ColeVersions.vacuumRetired]] never expires a
    * record ABOVE the oldest pin (the removals above version v are
    * exactly what keeps v's snapshot reconstructible). Empty when the
    * table has no refs.
    */
  def pinVersions(table: String, conf: Configuration): Seq[Long] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    if (!fs.exists(refsDir(table))) return Seq.empty
    // branch pins INCLUDE dotted publish markers: a crashed mid-publish
    // branch must keep its fork reconstructible until the resume
    (listRefs(fs, new HPath(refsDir(table), "tag"), "version").values ++
      listRefs(fs, new HPath(refsDir(table), "clone"), "version").values ++
      listRefs(fs, new HPath(refsDir(table), "branch"), "fork",
        includeDotted = true).values).toSeq
  }

  /** Resolve a non-numeric `VERSION AS OF` string: Right(version) for a
    * tag, Left(name) for a branch — loud with the available refs when
    * neither exists.
    */
  def resolve(table: String, conf: Configuration,
      name: String): Either[String, Long] = {
    val (fs, _) = ColeIO.resolve(table, conf)
    readRef(fs, tagPath(table, name), "version") match {
      case Some(v) => Right(v)
      case None =>
        readRef(fs, branchPath(table, name), "fork") match {
          case Some(_) => Left(name)
          case None =>
            val avail = (tags(table, conf).keys.map("tag " + _) ++
              branches(table, conf).map("branch " + _.name)).toSeq.sorted
            throw new IllegalArgumentException(
              s"no tag or branch named '$name' on $table" +
                (if (avail.isEmpty) " (the table has no refs)"
                 else s" (available: ${avail.mkString(", ")})"))
        }
    }
  }
}
