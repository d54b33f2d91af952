package graft.sources.cole

import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Cross-process commit claims for row-level DML — the fine-grained
  * replacement for the r11 per-table JVM lock.
  *
  * A row-level commit (copy-on-write replace, merge-on-read delta,
  * vector DELETE) is check-then-mutate over a specific set of AFFECTED
  * files: verify each is still the (len, mtime) the scan planned, then
  * swap/extend, then record. Two committers whose affected sets overlap
  * must not interleave that sequence — r11 serialized them with a
  * per-table monitor, which only exists inside ONE driver JVM; across
  * separate driver processes (the real multi-writer case) both could
  * pass the check before either renamed, duplicating every replaced row.
  *
  * Claims make the mutual exclusion a property of STORAGE, not the JVM:
  * before the check, the committer atomically creates one marker per
  * affected file under `<table>/_cole_claims/<rel>.claim` (in sorted
  * order) and deletes them after the record lands. Exactly one creator
  * per path wins. The create-if-absent primitive is the SAME seam the
  * version-record CAS uses ([[ColeCommitPrimitives]], r13): on HDFS-class
  * stores the default `create(overwrite=false)` is namenode-atomic; on
  * local filesystems we use `O_CREAT|O_EXCL` via java.nio (Hadoop's local
  * `create(overwrite=false)` is check-then-act); and on object stores the
  * configured coordinator (`graft.cole.commit.primitives`, e.g.
  * [[ConditionalPutCommitPrimitives]] / a real S3 conditional-PUT
  * subclass) gives claims the identical one-winner-per-path guarantee as
  * version records — previously (r12) claims used the raw filesystem
  * create everywhere, which on S3A silently degraded the cross-process
  * DML protection to the very race it exists to prevent. Consequences:
  *
  *   - '''File-DISJOINT committers never contend''': their claim sets
  *     are different paths, so N concurrent sharded MERGEs all commit
  *     unassisted — no table-wide lock, no manual re-runs, across any
  *     number of processes (ColeDmlRaceSpec).
  *   - '''Overlapping committers serialize''': the loser's acquisition
  *     parks (bounded backoff, release-all between attempts so reversed
  *     acquisition orders cannot deadlock) until the winner's claims
  *     drop, then its own (len, mtime) check sees the winner's renames
  *     and rejects loudly with the table untouched — the same
  *     serializable outcome as before, now process-safe, and the loser
  *     never half-mutates (r11's cross-process failure mode was a loud
  *     reject AFTER partial renames).
  *
  * This is the claims-first answer to Delta's optimistic
  * re-classify-and-retry: a ReplaceData job's replacement rows are
  * computed from the planned bytes, so a commit that lost the race can
  * never salvage them — the retry the user cares about (disjoint writers
  * proceeding unassisted) is exactly what per-file claims give without
  * recomputing anything, and a genuine read-write conflict is a loud
  * reject in both protocols.
  *
  * Crash safety — TTL + heartbeat (r13): a LIVE holder refreshes its
  * markers' mtimes on a background tick (`claim.heartbeatMs`, default
  * ttl/3), so a commit that runs long — a data-proportional compaction
  * rewrite, a stalled executor — NEVER ages past the TTL; only a holder
  * whose process actually died stops beating, and any later committer
  * then breaks the orphaned marker once it is older than
  * `graft.cole.claim.ttlMs` (default 10 min). Breaking is itself
  * serialized: a breaker must first win a `<marker>.break` lock (same
  * atomic create), then RE-CHECK under that lock that the marker is the
  * same stale file it observed (unchanged mtime, still past TTL) before
  * deleting — so a breaker that lost the race can never delete the
  * winner's freshly re-created marker (the r12 delete-then-create race,
  * ADVICE r12). The markers are transient metadata under an underscore
  * directory no listing ever walks.
  */
object ColeClaims {

  val DirName = "_cole_claims"

  /** Staleness horizon for crash-orphaned markers. */
  val TtlKey = "graft.cole.claim.ttlMs"
  val DefaultTtlMs: Long = 10 * 60 * 1000L

  /** Heartbeat period for live holders; default ttl/3. `0` disables. */
  val HeartbeatKey = "graft.cole.claim.heartbeatMs"

  /** Bound on how long an acquisition parks behind a live holder before
    * rejecting loudly (an overlapping commit normally clears in
    * milliseconds; hitting this means a stuck committer inside TTL).
    */
  val WaitKey = "graft.cole.claim.waitMs"
  val DefaultWaitMs: Long = 120 * 1000L

  /** Claim markers currently broken as stale — spec-visible. */
  val staleBreaks = new java.util.concurrent.atomic.AtomicLong(0)

  /** One shared daemon tick for every live holder in this process —
    * heartbeats are a few setTimes calls per period, not worth a thread
    * per commit.
    */
  private lazy val heartbeats =
    Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "cole-claim-heartbeat"); t.setDaemon(true); t
    })

  final class Acquired private[ColeClaims] (fs: FileSystem,
      markers: Seq[HPath], heartbeatMs: Long) {
    @volatile private var released = false
    private val beat: Option[ScheduledFuture[_]] =
      if (markers.isEmpty || heartbeatMs <= 0) None
      else Some(heartbeats.scheduleWithFixedDelay(() => touch(),
        heartbeatMs, heartbeatMs, TimeUnit.MILLISECONDS))
    private def touch(): Unit = if (!released) markers.foreach { p =>
      try {
        // setTimes is the cheap beat — but Hadoop's FileSystem default
        // (and S3A) implements it as a NO-OP. VERIFY the mtime actually
        // advanced; where it did not, beat through an overwritten `.hb`
        // sidecar instead — its PUT time carries liveness, and
        // [[liveMtime]] folds it into every staleness observation. The
        // sidecar has exactly one writer (marker exclusivity).
        val before = fs.getFileStatus(p).getModificationTime
        val now = System.currentTimeMillis()
        try fs.setTimes(p, now, -1) catch { case _: Exception => () }
        val after = fs.getFileStatus(p).getModificationTime
        if (after <= before && now - before >= heartbeatMs) {
          val out = fs.create(hbPath(p), true)
          try out.write(now.toString.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      } catch { case _: Exception => () }
    }
    def release(): Unit = {
      released = true
      beat.foreach(_.cancel(false))
      markers.foreach { p =>
        try fs.delete(p, false) catch { case _: Exception => () }
        try fs.delete(hbPath(p), false) catch { case _: Exception => () }
      }
    }
    /** TEST SEAM: stop heartbeating but leave the markers behind —
      * faithfully simulates the holder's PROCESS dying (a dead process
      * has no heartbeat), which same-JVM specs cannot otherwise express.
      */
    private[cole] def abandon(): Unit = {
      released = true
      beat.foreach(_.cancel(false))
    }
  }

  private def markerOf(table: String, rel: String): HPath =
    new HPath(new HPath(table, DirName), rel + ".claim")

  private def hbPath(p: HPath): HPath =
    new HPath(p.getParent, p.getName + ".hb")

  /** Liveness mtime of a marker: its own mtime, or its heartbeat
    * sidecar's when newer (stores whose setTimes is a no-op — S3A —
    * beat through the sidecar instead). Throws FileNotFoundException
    * when the MARKER is gone, like a bare stat.
    */
  private def liveMtime(fs: FileSystem, p: HPath): Long = {
    val base = fs.getFileStatus(p).getModificationTime
    try math.max(base, fs.getFileStatus(hbPath(p)).getModificationTime)
    catch { case _: java.io.FileNotFoundException => base }
  }

  /** Atomic create-if-absent through the commit-primitives seam: true =
    * this committer owns the marker. Local FS with default primitives
    * takes `O_CREAT|O_EXCL` via java.nio (the raw local
    * `create(overwrite=false)` is check-then-act); everything else —
    * HDFS-class atomic creates AND configured object-store coordinators —
    * goes through [[ColeCommitPrimitives.exclusiveCreate]], the same
    * one-winner-per-path guarantee version records get.
    */
  private def tryCreate(fs: FileSystem, conf: Configuration, p: HPath,
      body: Array[Byte]): Boolean = {
    fs.mkdirs(p.getParent)
    val prim = ColeCommitPrimitives.of(conf)
    if (prim.getClass == classOf[FsCommitPrimitives] &&
        fs.getUri.getScheme == "file") {
      val f = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.createFile(f)
        java.nio.file.Files.write(f, body)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      // whether the marker became visible: direct-create primitives make
      // it visible at exclusiveCreate return; publish-at-close ones only
      // at a successful close. Decides whose orphan to clean on failure.
      var visible = false
      try {
        val out = prim.exclusiveCreate(fs, p)
        visible = !prim.publishAtClose
        out.write(body)
        out.close()
        visible = true
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          // create succeeded but write/close failed: p is OUR orphan —
          // delete it instead of letting fs.exists misclassify the error
          // as "lost the race" and the marker block every claimant until
          // TTL (ADVICE r12). Publish-at-close losers never made p
          // visible, and their dotted staging is invisible to claimants.
          if (visible) {
            try fs.delete(p, false) catch { case _: Exception => () }
          }
          throw e
      }
    }
  }

  /** Break a stale marker under a `<marker>.break` lock. Returns true if
    * the path is now free to re-claim (we deleted the stale marker, or it
    * vanished); false if someone else holds the break lock or the marker
    * turned out live on the locked re-check.
    *
    * The re-check under the lock is the serialization point that closes
    * the r12 TOCTOU: a breaker only deletes the marker if its mtime still
    * equals the stale observation — a marker freshly re-created by the
    * winning breaker (or refreshed by a heartbeat) has a new mtime and is
    * left alone. The break lock itself can only orphan if a breaker dies
    * inside a milliseconds-wide stat+delete window; it is reaped by the
    * same TTL.
    */
  private def breakStale(fs: FileSystem, conf: Configuration, p: HPath,
      observedMtime: Long, ttl: Long, body: Array[Byte]): Boolean = {
    val lock = new HPath(p.getParent, p.getName + ".break")
    if (tryCreate(fs, conf, lock, body)) {
      try {
        // 0 = marker vanished (released normally), 1 = still the stale
        // file we observed, 2 = live (re-created/heartbeated since)
        val verdict =
          try {
            val mt = liveMtime(fs, p)
            if (mt == observedMtime &&
              System.currentTimeMillis() - mt > ttl) 1
            else 2
          } catch { case _: java.io.FileNotFoundException => 0 }
        if (verdict == 1) {
          staleBreaks.incrementAndGet()
          try fs.delete(p, false) catch { case _: Exception => () }
          try fs.delete(hbPath(p), false) catch { case _: Exception => () }
        }
        verdict != 2
      } finally {
        try fs.delete(lock, false) catch { case _: Exception => () }
      }
    } else {
      // another breaker is mid-break — or died mid-break and orphaned the
      // lock; reap a lock past TTL and let the next loop retry
      val lockStale =
        try System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > ttl
        catch { case _: java.io.FileNotFoundException => false }
      if (lockStale) {
        try fs.delete(lock, false) catch { case _: Exception => () }
      }
      false
    }
  }

  /** Claim every `rel` of `table` (all-or-nothing). Markers are acquired
    * in sorted order and ALL released before any backoff sleep, so two
    * committers claiming overlapping sets in any order make progress
    * instead of deadlocking. Throws after `claim.waitMs` of contention.
    * The returned claims heartbeat until released.
    */
  def acquire(fs: FileSystem, conf: Configuration, table: String,
      rels: Seq[String], what: String): Acquired = {
    val ttl = conf.getLong(TtlKey, DefaultTtlMs)
    val hb = conf.getLong(HeartbeatKey, math.max(1L, ttl / 3))
    val sorted = rels.distinct.sorted.map(markerOf(table, _))
    if (sorted.isEmpty) return new Acquired(fs, Seq.empty, 0L)
    val waitMs = conf.getLong(WaitKey, DefaultWaitMs)
    val body = (s"op:$what\npid:${ProcessHandle.current().pid()}\n" +
      s"ts:${System.currentTimeMillis()}\n").getBytes(StandardCharsets.UTF_8)
    val deadline = System.nanoTime() + waitMs * 1000000L
    var backoff = 5L
    while (true) {
      val held = scala.collection.mutable.ArrayBuffer.empty[HPath]
      var blocked: HPath = null
      val it = sorted.iterator
      while (blocked == null && it.hasNext) {
        val p = it.next()
        if (tryCreate(fs, conf, p, body)) held += p
        else {
          val observed: Option[Long] =
            try Some(liveMtime(fs, p))
            catch { case _: java.io.FileNotFoundException => None }
          observed match {
            case None => // holder released between our create and stat
              if (tryCreate(fs, conf, p, body)) held += p else blocked = p
            case Some(mt)
                if System.currentTimeMillis() - mt > ttl =>
              // crash-orphaned (a live holder's heartbeat would have
              // refreshed mt): break it under the break lock, then
              // re-claim — at most one breaker's create wins
              if (breakStale(fs, conf, p, mt, ttl, body) &&
                  tryCreate(fs, conf, p, body)) held += p
              else blocked = p
            case _ => blocked = p
          }
        }
      }
      if (blocked == null) return new Acquired(fs, held.toSeq, hb)
      held.foreach(p => try fs.delete(p, false) catch { case _: Exception => () })
      if (System.nanoTime() > deadline) throw new IllegalStateException(
        s"could not claim the affected files of $table within ${waitMs}ms: " +
          s"$blocked is held by a concurrent committer. If its owner " +
          s"crashed, the claim self-expires after ${ttl}ms " +
          s"($TtlKey); retry after the other $what-class commit finishes")
      Thread.sleep(backoff)
      backoff = math.min(backoff * 2, 200L)
    }
    throw new IllegalStateException("unreachable")
  }
}
