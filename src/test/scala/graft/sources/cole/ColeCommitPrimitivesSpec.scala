package graft.sources.cole

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A commit coordinator that counts its CAS invocations — stands in for
  * an object-store backend (conditional PUT / lock service). Must be a
  * top-level class with a no-arg constructor (loaded by name from conf).
  */
class CountingCommitPrimitives extends ColeCommitPrimitives {
  override def exclusiveCreate(fs: FileSystem, path: HPath): FSDataOutputStream = {
    CountingCommitPrimitives.calls.incrementAndGet()
    fs.create(path, false)
  }
}
object CountingCommitPrimitives {
  val calls = new AtomicInteger(0)
}

/** The commit-primitive seam (ColeCommitPrimitives): the version log's
  * ONE concurrency primitive — exclusive create as CAS — is pluggable
  * via `graft.cole.commit.primitives`, so an object-store backend is a
  * configuration, not a rewrite. Default behavior must be byte-identical
  * to the filesystem's own create.
  */
class ColeCommitPrimitivesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a configured coordinator carries every version-record CAS") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_seam").toString
    (0 until 50).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(dir)
    val conf = new Configuration(ColeIO.driverConf())
    conf.set(ColeCommitPrimitives.ConfKey,
      classOf[CountingCommitPrimitives].getName)
    val before = CountingCommitPrimitives.calls.get()
    ColeVersions.enable(dir, conf) // baseline record = 1 CAS
    assert(CountingCommitPrimitives.calls.get() === before + 1)
    assert(ColeVersions.commitIfEnabled(dir, conf, "append",
      Seq("x.col"), Seq.empty).contains(2L))
    assert(CountingCommitPrimitives.calls.get() === before + 2)
    // records written through the seam read back exactly
    val recs = ColeVersions.records(dir, conf)
    assert(recs.map(_.op) === Seq("baseline", "append"))
  }

  test("default primitives: unconfigured conf uses the filesystem create") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_seam_def").toString
    (0 until 20).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(dir)
    val before = CountingCommitPrimitives.calls.get()
    ColeVersions.enable(dir, ColeIO.driverConf())
    assert(CountingCommitPrimitives.calls.get() === before,
      "default conf must not route through a previously-configured class")
    assert(ColeVersions.currentVersion(dir, ColeIO.driverConf()) === 1L)
  }
}
