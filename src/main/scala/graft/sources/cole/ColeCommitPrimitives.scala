package graft.sources.cole

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path => HPath}

/** The ONE storage primitive the COLE commit protocol depends on, as a
  * swappable seam: an object-store backend is a configuration, not a
  * rewrite of [[ColeVersions]].
  *
  * == Commit-protocol contract (per backend) ==
  *
  * The version log's concurrency control is a CAS on the next record
  * sequence number, implemented as `exclusiveCreate(v<seq>)`: of two
  * committers racing on the same number, exactly one create succeeds and
  * the loser observes [[org.apache.hadoop.fs.FileAlreadyExistsException]]
  * and retries with the next number. Everything else in the protocol is
  * either idempotent (retire renames target unique stamped paths; record
  * bodies are immutable once the terminal `end` line is written) or
  * recoverable (a partial record below the tail is quarantined by
  * [[ColeVersions.repairTorn]]).
  *
  *  - '''HDFS / ABFS / GCS''': `create(overwrite = false)` is atomic at
  *    the namenode/service — the default primitives are correct as-is.
  *  - '''Local FS''': `create(overwrite = false)` is check-then-act, so
  *    same-JVM committers additionally serialize on
  *    [[ColeVersions]]'s per-table lock (built in); cross-PROCESS
  *    local-FS committers are outside the default contract.
  *  - '''S3 and other non-atomic-create stores''': plug a coordinator
  *    here — conditional PUT (If-None-Match), a DynamoDB-style lock, or
  *    a catalog service — via `graft.cole.commit.primitives=<class>`.
  *    The implementation must guarantee: at most one success per path,
  *    losers raise `FileAlreadyExistsException`.
  *
  * Retire/unretire renames need only non-overwriting rename to a unique
  * destination (no atomicity across files); object stores that copy+
  * delete satisfy it because destinations are never contended.
  */
trait ColeCommitPrimitives {
  /** Atomically create `path` for writing iff it does not exist.
    * MUST throw [[org.apache.hadoop.fs.FileAlreadyExistsException]]
    * when the path already exists (the CAS-loser signal).
    */
  def exclusiveCreate(fs: FileSystem, path: HPath): FSDataOutputStream
}

/** Default primitives: the filesystem's own `create(overwrite=false)`. */
final class FsCommitPrimitives extends ColeCommitPrimitives {
  override def exclusiveCreate(fs: FileSystem, path: HPath): FSDataOutputStream =
    fs.create(path, false)
}

object ColeCommitPrimitives {
  val ConfKey = "graft.cole.commit.primitives"

  @volatile private var cached: (String, ColeCommitPrimitives) =
    ("", new FsCommitPrimitives)

  /** Primitives for `conf` — the configured class, or the FS default. */
  def of(conf: Configuration): ColeCommitPrimitives = {
    val cls = conf.get(ConfKey, "")
    val c = cached
    if (c._1 == cls) c._2
    else {
      val built =
        if (cls.isEmpty) new FsCommitPrimitives
        else Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[ColeCommitPrimitives]
      cached = (cls, built)
      built
    }
  }

  /** Primitives when only a FileSystem is at hand (its conf applies). */
  def of(fs: FileSystem): ColeCommitPrimitives = of(fs.getConf)
}
