package graft.sources.cole

import java.nio.charset.StandardCharsets

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
  * per path wins — `O_CREAT|O_EXCL` via java.nio on local filesystems
  * (Hadoop's local `create(overwrite=false)` is check-then-act, the same
  * hole the version-record CAS plugs with [[ConditionalPutCommitPrimitives]]),
  * the namenode/service-atomic `create(overwrite=false)` elsewhere.
  * Consequences:
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
  * Crash safety: a committer that dies holding claims leaves markers
  * behind; any later committer breaks a marker older than
  * `graft.cole.claim.ttlMs` (default 10 min — size it above the longest
  * metadata commit, which is seconds). The markers are transient
  * metadata under an underscore directory no listing ever walks.
  */
object ColeClaims {

  val DirName = "_cole_claims"

  /** Staleness horizon for crash-orphaned markers. */
  val TtlKey = "graft.cole.claim.ttlMs"
  val DefaultTtlMs: Long = 10 * 60 * 1000L

  /** Bound on how long an acquisition parks behind a live holder before
    * rejecting loudly (an overlapping commit normally clears in
    * milliseconds; hitting this means a stuck committer inside TTL).
    */
  val WaitKey = "graft.cole.claim.waitMs"
  val DefaultWaitMs: Long = 120 * 1000L

  /** Claim markers currently broken as stale — spec-visible. */
  val staleBreaks = new java.util.concurrent.atomic.AtomicLong(0)

  final class Acquired private[ColeClaims] (fs: FileSystem,
      markers: Seq[HPath]) {
    def release(): Unit = markers.foreach { p =>
      try fs.delete(p, false) catch { case _: Exception => () }
    }
  }

  private def markerOf(table: String, rel: String): HPath =
    new HPath(new HPath(table, DirName), rel + ".claim")

  /** Atomic create-if-absent: true = this committer owns the marker. */
  private def tryCreate(fs: FileSystem, p: HPath, body: Array[Byte]): Boolean = {
    fs.mkdirs(p.getParent)
    if (fs.getUri.getScheme == "file") {
      // O_CREAT|O_EXCL — atomic across processes; Hadoop's local
      // create(overwrite=false) merely checks then creates
      val f = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.createFile(f)
        java.nio.file.Files.write(f, body)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(p) => false
      }
    }
  }

  /** Claim every `rel` of `table` (all-or-nothing). Markers are acquired
    * in sorted order and ALL released before any backoff sleep, so two
    * committers claiming overlapping sets in any order make progress
    * instead of deadlocking. Throws after `claim.waitMs` of contention.
    */
  def acquire(fs: FileSystem, conf: Configuration, table: String,
      rels: Seq[String], what: String): Acquired = {
    val sorted = rels.distinct.sorted.map(markerOf(table, _))
    if (sorted.isEmpty) return new Acquired(fs, Seq.empty)
    val ttl = conf.getLong(TtlKey, DefaultTtlMs)
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
        if (tryCreate(fs, p, body)) held += p
        else {
          // crash-orphaned marker: break it once past the TTL. Two
          // breakers can race on the delete — at most one wins the
          // re-create, the other just loops.
          val stale =
            try System.currentTimeMillis() -
              fs.getFileStatus(p).getModificationTime > ttl
            catch { case _: java.io.FileNotFoundException => true }
          if (stale) {
            staleBreaks.incrementAndGet()
            try fs.delete(p, false) catch { case _: Exception => () }
            if (tryCreate(fs, p, body)) held += p else blocked = p
          } else blocked = p
        }
      }
      if (blocked == null) return new Acquired(fs, held.toSeq)
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
