package graft.sources.cole

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path => HPath}

/** Zero-copy table CLONE — `CALL cole.system.clone('ns.src', 'ns.dst'
  * [, version][, deep])`.
  *
  * A clone materializes INSTANTLY at any table size: no data bytes move.
  * The destination holds only sidecars — the source's table spec, CHECKs
  * and layout histories, plus a `_clonesrc` pointer (source path + pinned
  * version) — and every read plans the destination's own files UNION the
  * source's file set AS OF the pinned version, resolved through the
  * source's version log exactly like a time-travel read (retired paths
  * included, so source-side DML/compaction after the clone never
  * perturbs it). The pin is a first-class ref in the SOURCE
  * (`_refs/clone/`, visible in `$refs` as type 'clone'), so
  * `expire_versions` cannot reap the pinned history while the clone
  * lives — the Delta shallow-clone dangling-file hazard is closed by
  * construction.
  *
  * The v1 write surface is append-only: new data lands as ordinary LOCAL
  * files (dev/test pipelines write their outputs immediately); row-level
  * DML / truncate / overwrite / compaction — anything that would have to
  * mutate or retire a file the SOURCE owns — rejects loudly until
  * `CALL cole.system.localize('ns.dst')` copies the remaining foreign
  * bytes in (cost ∝ foreign bytes, distributed, incremental and
  * crash-safe: a locally-present path SHADOWS its foreign twin, so a
  * re-run copies only what's missing), deletes the pointer and releases
  * the pin — after which the clone is a plain table (versioning,
  * DML, streams all available). `deep => true` clones and localizes in
  * one call. Clone sources must be versioned and vector-debt-free at the
  * pinned version (compact first — a deletion-vector pin crosses table
  * boundaries, which serving would make silently un-droppable).
  */
object ColeClone {

  val SidecarName = "_clonesrc"

  /** `masked`: source rels this clone has DELETED or REPLACED via
    * row-level DML (mask-don't-retire — the SOURCE owns the bytes, so a
    * clone's DML can never move them; it hides them instead and its
    * replacement rows land as ordinary local files). Resolution excludes
    * them; localize never copies them.
    */
  final case class CloneSrc(src: String, version: Long, pin: String,
      masked: Set[String] = Set.empty)

  private def sidecar(table: String): String = s"$table/$SidecarName"

  // consulted on EVERY metadata listing — cache on (mtime, len); absence
  // is cached too (the overwhelmingly common case costs one getFileStatus)
  private val cache = new LruCache[String, (Long, Long, CloneSrc)](4096)

  /** The clone pointer of `table`, when it still references source files.
    * `masked` unions the append-only `_clonemask/` entries (unversioned
    * clones' DML) with the VERSION-LOG-derived masks of a versioned
    * clone (r15): there a DML records its foreign replacements as
    * ordinary removes — the live masked set is "foreign rels absent from
    * the current fold", so rollback restores them with zero extra
    * machinery.
    */
  // the derived masked set costs two full log folds and read() sits on
  // hot planning paths (ColeScan/ColeAggScan dv exclusion, metadata
  // counters, canDeleteWhere) — cache it keyed on (table, clone current
  // version, pinned source version): any clone state change bumps cv
  // (commits only append), and the rel set of a PINNED source snapshot
  // is immutable, so a hit can never serve a stale mask
  private val logMaskCache =
    new LruCache[(String, Long, Long), Set[String]](4096)

  def read(table: String, conf: Configuration): Option[CloneSrc] = {
    val (fs0, _) = ColeIO.resolve(sidecar(table), conf)
    readPointer(table, conf).map { c =>
      val fileMasks = maskedRels(table, fs0)
      val logMasks: Set[String] =
        if (!ColeVersions.enabled(table, conf)) Set.empty
        else {
          val cv = ColeVersions.currentVersion(table, conf)
          if (cv < 1) Set.empty // mid-enable: the log exists, no baseline yet
          else logMaskCache.getOrElseUpdate((table, cv, c.version)) {
            val live = ColeVersions.snapshotLiveRels(table, conf, cv)
            ColeVersions.snapshotState(c.src, conf, c.version).files
              .iterator.map(_._1).filterNot(live).toSet
          }
        }
      c.copy(masked = fileMasks ++ logMasks)
    }
  }

  /** The raw pointer WITHOUT the masked-set computation — what
    * [[ColeVersions]]' own resolution hooks call (the masked set of a
    * versioned clone derives FROM the version fold; computing it there
    * would recurse).
    */
  def readPointerOnly(table: String, conf: Configuration): Option[CloneSrc] =
    readPointer(table, conf)

  private def readPointer(table: String,
      conf: Configuration): Option[CloneSrc] = {
    val (fs, p) = ColeIO.resolve(sidecar(table), conf)
    val st = try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None => None
      case Some(status) =>
        val key = fs.makeQualified(p).toString
        cache.get(key) match {
          case Some((m1, l1, c)) if m1 == status.getModificationTime &&
              l1 == status.getLen => Some(c)
          case _ =>
            val in = fs.open(p)
            val lines = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
              .split('\n').toSeq finally in.close()
            require(lines.length >= 5 && lines.head == "1" &&
                lines.lastOption.contains("end"),
              s"unreadable $SidecarName at $table")
            val c = CloneSrc(lines(1), lines(2).toLong, lines(3))
            cache.put(key, (status.getModificationTime, status.getLen, c))
            Some(c)
        }
    }
  }

  private def sidecarBody(cs: CloneSrc): String =
    (Seq("1", cs.src, cs.version.toString, cs.pin) :+ "end").mkString("\n")

  /** Mask entries live as APPEND-ONLY files under `_clonemask/`, one per
    * DML commit — the pointer file itself is immutable after clone, so a
    * reader can never catch it mid-replace (an earlier single-file
    * design rewrote the pointer per mask and a concurrent read in the
    * replace window saw "not a clone": planned foreign files then fell
    * through to the under-root assertion). Exclusive create per commit;
    * the [[MaskClaimRel]] claim already serializes writers, the
    * append-only shape just removes the read-side window entirely.
    */
  private val MaskDirName = "_clonemask"

  private val maskCache = new LruCache[String, (Long, Long, Set[String])](4096)

  private def maskedRels(table: String, fs: org.apache.hadoop.fs.FileSystem)
      : Set[String] = {
    val dir = new HPath(table, MaskDirName)
    val sts = try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException => return Set.empty }
    sts.iterator.filter(_.isFile).flatMap { st =>
      val key = fs.makeQualified(st.getPath).toString
      maskCache.get(key) match {
        case Some((m1, l1, rels)) if m1 == st.getModificationTime &&
            l1 == st.getLen => rels
        case _ =>
          val in = fs.open(st.getPath)
          val lines = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
            .split('\n').toSeq finally in.close()
          // a torn mask file (no terminal end) is an aborted commit's
          // leftover: its replacement files never became visible, so
          // ignoring it is exact
          if (!lines.lastOption.contains("end")) Set.empty[String]
          else {
            val rels = lines.dropRight(1).toSet
            maskCache.put(key, (st.getModificationTime, st.getLen, rels))
            rels
          }
      }
    }.toSet
  }

  /** Record DML-replaced/deleted source rels. Caller MUST hold the
    * [[MaskClaimRel]] claim (and the files' own claims). Loud when the
    * pointer is gone — a concurrent localize graduated the table and the
    * caller's plan is stale.
    */
  def mask(table: String, conf: Configuration, rels: Set[String]): Unit = {
    if (rels.isEmpty) return
    require(read(table, conf).isDefined,
      s"$table is not a clone — nothing to mask")
    val (fs, _) = ColeIO.resolve(table, conf)
    val dir = new HPath(table, MaskDirName)
    fs.mkdirs(dir)
    val p = new HPath(dir,
      s"m-${java.lang.Long.toHexString(System.nanoTime())}")
    // exclusivity comes from the MaskClaimRel claim + the writer-unique
    // name, but every exclusive create in a commit path routes through
    // the commit-primitives seam — object-store deployments then get one
    // consistent conditional-PUT story (r13 verdict nit)
    val out = ColeCommitPrimitives.of(conf).exclusiveCreate(fs, p)
    try out.write((rels.toSeq.sorted :+ "end").mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** True when `file` lies outside `table`'s own tree — a clone's
    * FOREIGN (source-owned) file. Belt-and-braces for read surfaces that
    * consult per-file sidecars adjacent to the physical path: a foreign
    * file's adjacent sidecars belong to the SOURCE's live state, never
    * to the clone's pinned snapshot.
    */
  def isForeign(table: String, file: String, conf: Configuration): Boolean = {
    val (fs, root) = ColeIO.resolve(table, conf)
    val prefix = fs.makeQualified(root).toString.stripSuffix("/") + "/"
    !fs.makeQualified(new HPath(file)).toString.startsWith(prefix)
  }

  /** The claim rel every mask writer (and localize) serializes on —
    * acquired ALONGSIDE the affected files' claims in one sorted
    * all-or-nothing acquisition, so the pointer's read-modify-write
    * never races.
    */
  val MaskClaimRel = SidecarName

  /** phys → src-rel over the clone's WHOLE pinned file set (mask NOT
    * applied — a commit that planned a file which a concurrent committer
    * masked in between still needs its name, to detect exactly that
    * conflict) — how a DML commit names claims and mask entries for
    * planned files that live outside the table root.
    */
  def foreignRelOf(cs: CloneSrc, conf: Configuration): Map[String, String] =
    ColeVersions.snapshotState(cs.src, conf, cs.version).files
      .map { case (rel, phys) => phys -> rel }.toMap

  /** Loud guard for operations a clone-with-foreign-files cannot honor. */
  def requireLocal(table: String, conf: Configuration, op: String): Unit =
    read(table, conf).foreach { cs =>
      throw new IllegalStateException(
        s"$op is not supported on a zero-copy clone that still references " +
          s"source files (${cs.src} @ v${cs.version}) — run " +
          "CALL <catalog>.system.localize('<ns.table>') first, or clone " +
          "with deep => true")
    }

  /** The foreign half of the clone's file set: the source's files as of
    * the pinned version, resolved at their CURRENT physical paths
    * (retired included), minus any rel the destination already holds
    * locally (localize shadowing). Partition values come from the
    * ORIGINAL relative paths; the DESTINATION's rename map applies (the
    * clone's spec was copied at clone time and evolves independently).
    */
  def foreignInfos(table: String, cs: CloneSrc, localRels: Set[String],
      conf: Configuration): Seq[ColeMetaCache.FileInfo] = {
    val files = ColeVersions.snapshotState(cs.src, conf, cs.version).files
      .filterNot { case (rel, _) => localRels(rel) || cs.masked(rel) }
    val resolved = files.map { case (rel, phys) =>
      val parts = rel.split('/').dropRight(1).toSeq.flatMap { seg =>
        seg.split("=", 2) match {
          case Array(k, v) if k.nonEmpty => Some(k -> ColeIO.unescape(v))
          case _ => None
        }
      }
      (phys, parts)
    }
    try ColeMetaCache.applyRenames(ColeMetaCache.infosAt(resolved, conf),
      ColeCatalog.renames(table, conf))
    catch {
      case e: java.io.FileNotFoundException =>
        throw new IllegalStateException(
          s"clone source ${cs.src} @ v${cs.version} is no longer readable: " +
            s"${e.getMessage} — was the pin '${cs.pin}' force-dropped and " +
            "the version expired?", e)
    }
  }

  /** CALL cole.system.clone: pin, copy sidecars, activate. Returns
    * (pinned version, foreign file count).
    */
  def clone(src: String, dst: String, version: Option[Long],
      deep: Boolean, conf: Configuration): (Long, Int) = {
    require(ColeVersions.enabled(src, conf),
      s"clone needs a versioned source — enable versioning on $src first " +
        "(a clone pins a snapshot; an unversioned table has none)")
    val (fs, dstP) = ColeIO.resolve(dst, conf)
    require(!fs.exists(dstP) || (fs.listStatus(dstP).isEmpty),
      s"clone destination $dst already exists")
    val v = version.getOrElse(ColeVersions.currentVersion(src, conf))
    val state = ColeVersions.snapshotState(src, conf, v)
    require(state.dvRels.isEmpty,
      s"clone source $src carries deletion vectors at v$v — run " +
        "CALL <catalog>.system.compact to materialize them first (a " +
        "cross-table vector pin would make the source's debt un-droppable)")
    // pin FIRST: from here the snapshot cannot expire; a crash before the
    // pointer lands leaves only a droppable pin, never a broken clone
    val pin = s"clone-${dst.replaceAll("[^A-Za-z0-9._-]", "_")
      .takeRight(80)}-${java.lang.Long.toHexString(System.nanoTime())}"
    ColeRefs.createClonePin(src, conf, pin, v)
    fs.mkdirs(dstP)
    // the pointer is the activation switch — written before the layout
    // sidecars, so a crash mid-copy leaves a READABLE clone (layout
    // claims absent = conservative), never a visible empty table
    val out = fs.create(new HPath(dst, SidecarName), false)
    try out.write(sidecarBody(CloneSrc(src, v, pin))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // sidecars: layout histories as-of the pin (commit-record snapshots);
    // spec/checks verbatim — they resolve and evolve independently now
    state.spec.foreach(writeRaw(fs, dst, ColeBucket.SpecFile, _))
    state.tspec.foreach(writeRaw(fs, dst, ColeTemporal.SpecFile, _))
    copyIfExists(fs, src, dst, ColeChecks.SidecarFile)
    copyIfExists(fs, src, dst, ColeCatalog.TableSpecFile)
    // identity partition-spec history (verbatim, like checks/tablespec):
    // without it a clone of a mixed-era source is UNREADABLE — the
    // mixed-layout corruption check only exempts declared-evolution
    // columns, and the declaration must travel with the file set
    copyIfExists(fs, src, dst, ColePartEvolve.SpecFile)
    val n = state.files.size
    if (deep) localize(dst, conf)
    (v, n)
  }

  private def writeRaw(fs: org.apache.hadoop.fs.FileSystem, table: String,
      name: String, content: String): Unit = {
    val out = fs.create(new HPath(table, name), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def copyIfExists(fs: org.apache.hadoop.fs.FileSystem, src: String,
      dst: String, name: String): Unit = {
    val s = new HPath(src, name)
    if (fs.exists(s))
      require(FileUtil.copy(fs, s, fs, new HPath(dst, name), false, true,
        fs.getConf), s"clone sidecar copy failed: $s")
  }

  /** Copy the remaining foreign bytes in and graduate to a plain table.
    * Distributed (one task per file), incremental (locally-present rels
    * shadow foreign twins — a re-run after a crash copies only what's
    * missing) and atomic per file (dotted temp + rename). Returns the
    * number of files copied.
    */
  def localize(table: String, conf: Configuration): Int = {
    val cs0 = read(table, conf).getOrElse(return 0) // already local: no-op
    val (fs, root) = ColeIO.resolve(table, conf)
    // serialize with DML mask writers: a rel masked between our listing
    // and our copy would be RESURRECTED by the copy (its replacement
    // rows already landed locally) — hold the pointer claim for the
    // whole copy-and-delete window
    val claims = ColeClaims.acquire(fs, conf, table, Seq(MaskClaimRel),
      "localize")
    try {
    val cs = read(table, conf).getOrElse(return 0)
    val localRels = ColeIO.listPartitioned(table, conf)
      .map { case (st, _) => ColeVersions.relOf(fs, table, st.getPath.toString) }
      .toSet
    val todo = ColeVersions.snapshotState(cs.src, conf, cs.version).files
      .filterNot { case (rel, _) => localRels(rel) || cs.masked(rel) }
    val rootStr = fs.makeQualified(root).toString
    if (todo.nonEmpty) {
      val spark = org.apache.spark.sql.SparkSession.active
      val hconf = new ColeHadoopConf(conf)
      spark.sparkContext.parallelize(todo, math.min(todo.size, 64))
        .foreach { case (rel, phys) =>
          val c = hconf.value
          val (tfs, from) = ColeIO.resolve(phys, c)
          val dest = new HPath(s"$rootStr/$rel")
          tfs.mkdirs(dest.getParent)
          val tmp = new HPath(dest.getParent,
            s".${dest.getName}.localize-${java.lang.Long.toHexString(System.nanoTime())}")
          require(FileUtil.copy(tfs, from, tfs, tmp, false, true, c),
            s"localize copy failed: $phys")
          if (!tfs.rename(tmp, dest)) {
            tfs.delete(tmp, false) // a concurrent localize won this file
            require(tfs.exists(dest), s"localize rename failed: $dest")
          }
          // NOT carrying the source's bloom sidecar: it pins the indexed
          // file's (len, mtime, fingerprint) and the copy resets mtime,
          // so a carried index could never validate — dead weight. While
          // files are still FOREIGN the source's sidecars validate and
          // skip as usual; re-run bloom_index after localize.
        }
    }
    // graduation: pointer gone FIRST (the table is purely local from
    // that instant), then the mask entries (cosmetic once the pointer
    // is gone), then the pin
    fs.delete(new HPath(table, SidecarName), false)
    fs.delete(new HPath(table, MaskDirName), true)
    ColeRefs.dropClonePin(cs.src, conf, cs.pin)
    todo.size
    } finally claims.release()
  }

  /** DROP TABLE of a clone releases its source pin. */
  def onDrop(table: String, conf: Configuration): Unit =
    read(table, conf).foreach { cs =>
      try ColeRefs.dropClonePin(cs.src, conf, cs.pin)
      catch { case _: Exception => () } // source itself may be gone
    }
}
