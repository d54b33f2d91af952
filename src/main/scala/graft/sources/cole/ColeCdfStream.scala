package graft.sources.cole

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `readStream.format("cole").option("changeFeed", "true")` — the
  * STREAMING row-level change feed: every commit of a versioned table
  * arrives as `_change_type` / `_commit_version`-tagged rows, exactly
  * the batch feed's ([[ColeChangeFeed.read]]) semantics served
  * incrementally. This is the serve-side answer to the vector-mode
  * tailing refusal: deletion vectors delete rows from files the plain
  * insert stream already served, which an insert-only stream cannot
  * express — but a CDC stream CAN: the deleted rows are the commit's
  * pinned ordinals, emitted as `delete` rows (the same delta-exact
  * no-diff read as the batch feed).
  *
  * Offsets are commit VERSIONS — constant-size, like the insert
  * source's file-log sequence. Per commit kind:
  *   - pure-add commits: added files scan as `insert` partitions;
  *   - merge-on-read commits (vector DELETE, delta UPDATE/MERGE): fresh
  *     pinned-vector ordinals select `delete` rows from the (physical)
  *     file read, added image files scan as inserts;
  *   - copy-on-write removing commits (UPDATE/DELETE/MERGE/overwrite/
  *     truncate) serve their MATERIALIZED change files
  *     ([[ColeChangeFeed.materialize]]) — a micro-batch plans file
  *     partitions, it cannot run the old-vs-new `exceptAll` diff, so an
  *     un-materialized removing commit refuses loudly with the two ways
  *     out (materialize_cdf backfill, or arm
  *     `graft.cole.cdf.materialize` so DML commits write them);
  *   - `compact` is row-preserving: contributes nothing;
  *   - `rollback` refuses loudly (resynchronize), as in the batch feed.
  *
  * Scale shape: per-trigger planning is O(commits in range), each
  * commit contributing only its OWN files (delta-sized, never a table
  * listing); `maxCommitsPerTrigger` paces a backlog. Readers are the
  * same row readers as batch scans, plus an O(log d) sorted-ordinal
  * membership probe per row on delete partitions.
  */
object ColeCdfStream {
  /** Read option that turns a cole stream (or errors a batch read
    * toward the batch API) into the change-data feed.
    */
  val OptionKey = "changeFeed"

  /** First commit version to serve (inclusive); default 1 — the full
    * history, matching `ColeChangeFeed.read(spark, t, 0, current)`.
    *
    * THE NEW-CONSUMER BOOTSTRAP RECIPE: never stream a large table's
    * full history. Batch-load the snapshot, then stream only what
    * follows —
    * {{{
    * val N    = ColeVersions.currentVersion(table, conf)
    * val snap = spark.read.format("cole")
    *   .option("versionAsOf", N.toString).load(table)   // bounded scan
    * val feed = spark.readStream.format("cole")
    *   .option("changeFeed", "true")
    *   .option("startingVersion", (N + 1).toString).load(table)
    * }}}
    * The seam is GAP-FREE and OVERLAP-FREE (spec-pinned in
    * ColeCdfStreamSpec: snapshot ∪ streamed inserts minus streamed
    * deletes equals the live table, and no streamed commit is ≤ N) —
    * commits are atomic version records, the snapshot resolves exactly
    * versions [1, N], and the stream serves exactly (N, ∞).
    */
  val StartingVersionKey = "startingVersion"

  /** Commits per micro-batch cap — the CDF twin of the insert source's
    * `maxFilesPerTrigger` backlog pacing.
    */
  val MaxCommitsKey = "maxCommitsPerTrigger"

  /** Named-consumer registration: when set, every committed micro-batch
    * advances this consumer's low-watermark in the table's version log
    * (`ColeVersions.registerConsumer`), and `expire_versions` then never
    * expires a version above the slowest registered consumer — the
    * retention floor tracks actual consumer progress instead of a
    * hand-sized `keep_last_versions`. Decommissioned pipelines must
    * `CALL cole.system.unregister_cdf_consumer('ns.t', 'id')` or they
    * pin retention forever; `CALL cole.system.cdf_consumers('ns.t')`
    * lists registrations.
    */
  val ConsumerIdKey = "consumerId"

  /** The two CDF columns appended after the table's data columns. */
  def cdfFields: Seq[StructField] = Seq(
    StructField(ColeChangeFeed.ChangeTypeCol, StringType, nullable = false),
    StructField(ColeChangeFeed.CommitVersionCol, LongType, nullable = false))

  def stripCdfFields(schema: StructType): StructType = {
    val names = cdfFields.map(_.name).toSet
    StructType(schema.fields.filterNot(f => names.contains(f.name)))
  }

  /** Row groups planned into merge-on-read DELETE partitions across the
    * JVM — spec-visible: a commit that deleted rows from k of a file's
    * row groups must plan O(k) groups, not the whole file (O(delta)
    * serving, not O(file)).
    */
  val deleteRowGroupsPlanned = new java.util.concurrent.atomic.AtomicLong(0)

  /** Per-task ordinal budget for merge-on-read delete partitions: the
    * slice rides the task binary (and Spark may GROUP several input
    * partitions into one task), so partitions split at ~48k ordinals —
    * with delta-varint packing that is ~50-100 KB per partition,
    * bounded regardless of delta size.
    */
  val OrdinalsPerTask = 49152

  /** Delta-varint pack of a SORTED ordinal slice: dense delete patterns
    * encode at ~1-2 bytes/ordinal vs 8 raw — a whole-table 10% delete's
    * per-partition slice drops from ~150 KB to ~20 KB, keeping task
    * binaries small even when Spark coalesces input partitions.
    */
  def packOrdinals(sorted: Array[Long]): Array[Byte] = {
    val out = new ColeCodec.Out(sorted.length + 8)
    out.uvarint(sorted.length.toLong)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      out.uvarint(sorted(i) - prev); prev = sorted(i); i += 1
    }
    out.toBytes
  }

  def unpackOrdinals(packed: Array[Byte]): Array[Long] = {
    val c = new ColeCodec.Cursor(packed, 0)
    val n = c.uvarint().toInt
    val out = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) { prev += c.uvarint(); out(i) = prev; i += 1 }
    out
  }

  /** Pair a CDF micro-batch's delete/insert rows into the Delta-CDF
    * four-type shape — the streaming twin of the batch feed's `pairKey`:
    * within each `_commit_version`, a delete and an insert sharing the
    * key become `update_preimage` / `update_postimage`; unmatched rows
    * keep their type. Offsets are commit versions, so a micro-batch
    * always holds WHOLE commits and per-batch pairing is exact — use it
    * inside `foreachBatch` (intersect/self-join are not streamable
    * operators, so the pairing cannot run inside the continuous plan):
    *
    * {{{
    * readStream.format("cole").option("changeFeed", "true").load(t)
    *   .writeStream.foreachBatch { (b, _) =>
    *     val paired = ColeCdfStream.pairUpdates(b, Seq("id"))
    *     ... // upsert/audit from the four-type rows
    *   }.start()
    * }}}
    *
    * Same key contract as the batch feed: `pairKey` must be row-unique
    * per version (a real primary key). Rows already typed as update
    * images pass through untouched, so the transform is idempotent.
    */
  def pairUpdates(df: org.apache.spark.sql.DataFrame,
      pairKey: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(pairKey.nonEmpty, "pairUpdates needs at least one key column")
    pairKey.foreach(k => require(df.columns.contains(k),
      s"pairKey column '$k' is not in the change feed's column set"))
    import org.apache.spark.sql.functions.{max, when}
    val keyCols = ColeChangeFeed.CommitVersionCol +: pairKey
    // keys present on BOTH sides of the same commit = updated rows — the
    // batch feed's per-commit pairing, with the commit version as part
    // of the key so one batch can carry many commits. ONE window pass
    // (r17, same rewrite as the batch feed): the former intersect + four
    // semi/anti joins re-executed the batch multiple times; a
    // key-partitioned window labels every row in one shuffle (window
    // partitioning groups NULL keys together, exactly like intersect's
    // null-safe equality). Rows already typed as update images pass
    // through untouched — the transform stays idempotent.
    val tc = col(ColeChangeFeed.ChangeTypeCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val hasD = max(when(tc === "delete", 1).otherwise(0)).over(w)
    val hasI = max(when(tc === "insert", 1).otherwise(0)).over(w)
    val ct = when(tc === "delete",
        when(hasI === 1, "update_preimage").otherwise("delete"))
      .when(tc === "insert",
        when(hasD === 1, "update_postimage").otherwise("insert"))
      .otherwise(tc)
    df.withColumn(ColeChangeFeed.ChangeTypeCol, ct)
  }

  /** One-call CDF-to-table replication — the composition every
    * downstream consumer of the four-type feed was hand-writing
    * (Delta's `applyChanges` / DLT recipe): inside `foreachBatch`,
    *
    * {{{
    * spark.readStream.format("cole").option("changeFeed", "true").load(src)
    *   .writeStream.foreachBatch { (b, _) =>
    *     ColeCdfStream.applyChanges(b, "cole.db.target", Seq("id")); ()
    *   }.option("checkpointLocation", cp).start()
    * }}}
    *
    * keeps `target` an exact replica of the feed's source: per batch it
    * pairs updates ([[pairUpdates]] — so a within-commit delete+insert
    * of one key collapses to its postimage), keeps each key's LATEST
    * action (max `_commit_version`; offsets are commit versions, so a
    * batch holds whole commits and the collapse is exact), and MERGEs —
    * matched deletes delete, matched images update, unmatched non-delete
    * images insert.
    *
    * EXACTLY-ONCE under micro-batch replay rides a `_commit_version`
    * low-watermark persisted in the target table's directory
    * (`_cole_applied/<applyId>`, advanced monotonically AFTER the MERGE
    * lands): a batch replayed from the checkpoint after a restart
    * re-arrives with versions at or below the watermark and filters to
    * nothing. A crash BETWEEN the MERGE and the watermark advance
    * replays a batch whose re-MERGE is a row-for-row no-op (same keys to
    * the same images; deletes of already-absent keys match nothing) —
    * both windows converge to the same target bytes, spec-pinned in
    * ColeApplyChangesSpec.
    *
    * `target` must be a COLE catalog table (`cat.ns.t` — MERGE INTO
    * needs the catalog, and the watermark lives beside the table's
    * data). Returns the new watermark (unchanged when the batch held
    * nothing fresh). Key contract as [[pairUpdates]]: `pairKey` is a
    * real primary key of the source.
    */
  def applyChanges(batch: org.apache.spark.sql.DataFrame, target: String,
      pairKey: Seq[String], applyId: String = "default"): Long = {
    import org.apache.spark.sql.functions.{col, max, row_number}
    val spark = batch.sparkSession
    require(pairKey.nonEmpty, "applyChanges needs at least one key column")
    validateApplyId(applyId) // BEFORE any path is built from it — a
    // malformed id must be rejected before the watermark read, not after
    // the MERGE already executed (ADVICE r12)
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(target)
    require(parts.length >= 2, s"'$target' must be catalog-qualified " +
      "(cat.ns.table): MERGE INTO resolves through the catalog")
    val conf = ColeIO.driverConf()
    val path = spark.conf.getOption(s"spark.sql.catalog.${parts.head}.warehouse")
      .map(wh => (wh +: parts.tail).mkString("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"catalog '${parts.head}' has no warehouse setting — is it a " +
          "cole catalog? applyChanges stores its watermark beside the " +
          "target table"))
    val wm = appliedWatermark(path, conf, applyId)
    val fresh = batch.filter(col(ColeChangeFeed.CommitVersionCol) > wm)
    val maxRow = fresh.agg(max(col(ColeChangeFeed.CommitVersionCol))).head()
    if (maxRow.isNullAt(0)) return wm // fully below the watermark (replay)
    val maxV = maxRow.getLong(0)
    val dataCols = batch.columns.filterNot(c =>
      c == ColeChangeFeed.ChangeTypeCol || c == ColeChangeFeed.CommitVersionCol)
    // latest action per key: pairing first, so a within-commit
    // delete+insert is one postimage row and (key, version) is unique
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pairKey.map(col): _*)
      .orderBy(col(ColeChangeFeed.CommitVersionCol).desc)
    val latest = pairUpdates(fresh, pairKey)
      .filter(col(ColeChangeFeed.ChangeTypeCol) =!= "update_preimage")
      .withColumn("_cole_rn", row_number().over(w))
      .filter(col("_cole_rn") === 1).drop("_cole_rn")
    val view = "cole_apply_" +
      java.lang.Long.toHexString(System.nanoTime())
    latest.createOrReplaceTempView(view)
    try {
      val onCond = pairKey.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
      val setList = dataCols.map(c => s"t.`$c` = s.`$c`").mkString(", ")
      val ct = s"s.`${ColeChangeFeed.ChangeTypeCol}`"
      spark.sql(
        s"""MERGE INTO $target t USING $view s ON $onCond
           |WHEN MATCHED AND $ct = 'delete' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET $setList
           |WHEN NOT MATCHED AND $ct <> 'delete' THEN
           |  INSERT (${dataCols.map(c => s"`$c`").mkString(", ")})
           |  VALUES (${dataCols.map(c => s"s.`$c`").mkString(", ")})""".stripMargin)
    } finally spark.catalog.dropTempView(view)
    writeApplied(path, conf, applyId, maxV)
    maxV
  }

  private val AppliedDir = "_cole_applied"

  /** Highest `_commit_version` durably applied into `table` under
    * `applyId`; 0 = nothing applied yet.
    */
  private def validateApplyId(applyId: String): Unit =
    require(applyId.nonEmpty &&
      applyId.forall(c => c.isLetterOrDigit || "._-".contains(c)),
      s"applyId '$applyId' must be non-empty [A-Za-z0-9._-]")

  def appliedWatermark(table: String, conf: Configuration,
      applyId: String): Long = {
    validateApplyId(applyId) // this builds a path from the id
    val (fs, _) = ColeIO.resolve(table, conf)
    val p = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(table, AppliedDir), applyId)
    if (!fs.exists(p)) return 0L
    val in = fs.open(p)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    finally in.close()
  }

  private def writeApplied(table: String, conf: Configuration,
      applyId: String, version: Long): Unit = {
    validateApplyId(applyId)
    val (fs, _) = ColeIO.resolve(table, conf)
    if (version <= appliedWatermark(table, conf, applyId)) return // monotonic
    val dir = new org.apache.hadoop.fs.Path(table, AppliedDir)
    fs.mkdirs(dir)
    val p = new org.apache.hadoop.fs.Path(dir, applyId)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$applyId.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      require(fs.rename(tmp, p), s"applied-watermark write failed for $applyId")
    }
  }
}

/** Offset of the CDF source: the last served commit version. */
final case class ColeCdfOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** One streamed change partition: an ordinary [[ColeInputPartition]]
  * (packed row groups of ONE commit-named file) plus the change label.
  * `keepPacked` (delta-varint of sorted file-wide physical positions —
  * see [[ColeCdfStream.packOrdinals]]) restricts a merge-on-read delete
  * partition to exactly the commit's freshly deleted rows; null serves
  * every row.
  */
final case class ColeCdfPartition(inner: ColeInputPartition,
    changeType: String, version: Long,
    keepPacked: Array[Byte]) extends InputPartition

class ColeCdfReaderFactory(dataSchema: StructType, hconf: ColeHadoopConf)
    extends PartitionReaderFactory {

  // inner rows carry the data columns plus `_cole_pos` (last), so delete
  // partitions can address the commit's ordinals on PHYSICAL rows
  private val innerSchema =
    StructType(dataSchema.fields :+ StructField(ColeUtil.PosMetaCol, LongType))
  private val inner = new ColeReaderFactory(innerSchema, hconf)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val cp = partition.asInstanceOf[ColeCdfPartition]
    val delegate = inner.createReader(cp.inner)
    val width = dataSchema.length
    val types = dataSchema.fields.map(_.dataType)
    val changeType = UTF8String.fromString(cp.changeType)
    // unpack once per reader: the packed form exists for the task
    // binary, the probe wants a plain sorted array
    val keepOrdinals: Array[Long] =
      if (cp.keepPacked == null) null
      else ColeCdfStream.unpackOrdinals(cp.keepPacked)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (delegate.next()) {
          val in = delegate.get()
          if (keepOrdinals == null ||
              java.util.Arrays.binarySearch(keepOrdinals, in.getLong(width)) >= 0) {
            // copy defensively: the delegate may reuse its row buffer
            val safe = in.copy()
            val vals = new Array[Any](width + 2)
            var i = 0
            while (i < width) { vals(i) = safe.get(i, types(i)); i += 1 }
            vals(width) = changeType
            vals(width + 1) = cp.version
            row = new GenericInternalRow(vals)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = delegate.close()
    }
  }
}

/** The streaming-only Scan the table hands Spark when the `changeFeed`
  * option is armed. Batch reads route to the batch API (which also
  * serves update pairing) rather than half-implementing it here.
  */
class ColeCdfScan(dataSchema: StructType, path: String, conf: Configuration)
    extends Scan {

  override def readSchema(): StructType =
    StructType(dataSchema.fields ++ ColeCdfStream.cdfFields)

  override def description(): String = s"ColeCdfScan path=$path"

  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    throw new UnsupportedOperationException(
      "changeFeed=true is a STREAMING read option (readStream). For a " +
        "batch change feed use ColeChangeFeed.read(spark, table, from, " +
        "to) — it additionally supports update pairing via pairKey")

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val starting = Option(conf.get(ColeCdfStreamConf.StartKey)).map(_.toLong)
    val maxCommits = conf.getLong(ColeCdfStreamConf.MaxKey, Long.MaxValue)
    val consumerId = Option(conf.get(ColeCdfStreamConf.ConsumerKey))
    new ColeCdfMicroBatchStream(dataSchema, path, conf, starting, maxCommits,
      consumerId)
  }
}

/** Option plumbing: the scan builder threads read options to the stream
  * through the conf, the same zero-signature route the insert source's
  * `maxFilesPerTrigger` takes.
  */
object ColeCdfStreamConf {
  val StartKey = "graft.cole.cdf.startingVersion"
  val MaxKey = "graft.cole.cdf.maxCommitsPerTrigger"
  val ConsumerKey = "graft.cole.cdf.consumerId"
  /** How long a materialize-armed stream waits for a COW commit's change
    * files before giving up on them (the committer evidently died
    * between its record and its images — the loud backfill error then
    * names the fix).
    */
  val MaterializeGraceKey = "graft.cole.cdf.materialize.graceMs"
  val DefaultMaterializeGraceMs = 600000L

  /** Injectable clock for the materialize-grace decision — specs pin the
    * defer and the grace-expiry admit DETERMINISTICALLY instead of
    * racing wall time (the r13 verdict's deflake ask). Production code
    * never touches this.
    */
  @volatile var clock: () => Long = () => System.currentTimeMillis()
}

class ColeCdfMicroBatchStream(dataSchema: StructType, path: String,
    conf: Configuration, startingVersion: Option[Long], maxCommits: Long,
    consumerId: Option[String] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  require(maxCommits > 0, "maxCommitsPerTrigger must be positive")

  /** `Trigger.AvailableNow`: the run drains up to the version that was
    * current when the query STARTED, then terminates — commits landing
    * mid-run wait for the next scheduled run, the trigger's contract.
    */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(ColeVersions.currentVersion(path, conf))

  override def reportLatestOffset(): Offset =
    ColeCdfOffset(availableNowCap.getOrElse(
      ColeVersions.currentVersion(path, conf)))

  override def initialOffset(): Offset = {
    require(ColeVersions.enabled(path, conf),
      s"cannot stream the change feed of $path: versioning is not " +
        "enabled (CALL cole.system.versioning('ns.t') first — the feed " +
        "is reconstructed from commit records)")
    val cur = ColeVersions.currentVersion(path, conf)
    val fromExclusive = startingVersion match {
      case Some(v) =>
        require(v >= 1 && v <= cur + 1,
          s"startingVersion $v out of range [1, ${cur + 1}] on $path")
        v - 1
      case None => 0L
    }
    // retention guard: a range at or below the expiry horizon is no
    // longer guaranteed reconstructible — refuse UP FRONT with the safe
    // floor, instead of a mid-stream missing-file error. Maintenance
    // sets the floor side: expire_versions' keep_last_versions keeps a
    // lagging consumer's unread range alive.
    val horizon = ColeVersions.expiryHorizon(path, conf)
    require(fromExclusive >= horizon,
      s"startingVersion ${fromExclusive + 1} of $path is expired " +
        s"(expiry horizon v$horizon): the earliest un-expired version " +
        s"is v${horizon + 1}. Bootstrap with a versionAsOf batch load + " +
        s"startingVersion=${horizon + 1}, and size expire_versions' " +
        "keep_last_versions floor to consumer lag")
    ColeCdfOffset(fromExclusive)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) — this source paces by commit count")

  // consecutive polls that saw a transiently-torn log (see latestOffset)
  private var tornPolls = 0
  private val TornPollGrace = 50

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ColeCdfOffset].version
    // the offset ceiling comes from the COMPLETE records, never from the
    // raw sequence listing: a commit's record file is listable the moment
    // its exclusive create lands, BEFORE its body (and terminal `end`)
    // is written — a poll in that window would otherwise advance the
    // offset past a commit recordsFrom cannot yet see, skipping the
    // materialize-armed defer below (and, on an unlucky unarmed poll,
    // tripping planInputPartitions' dense-continuity require on a batch
    // whose only record is still in flight). Same listing cost as
    // maxSeq; new records parse once into the cache that planning reads
    // anyway.
    // a record below a COMPLETE one that is still being written (two
    // disjoint committers: A created its record, B committed a later
    // one before A's body flushed) parses as "torn" for the microseconds
    // of A's write — an idle POLL must not kill the stream over it.
    // Tolerate it boundedly: hold the offset and re-probe next trigger;
    // a GENUINELY torn log keeps failing and surfaces loudly after the
    // grace (and immediately at planning, whose loudness is unchanged).
    val recs =
      try ColeVersions.recordsFrom(path, conf, s)
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("torn") =>
          tornPolls += 1
          if (tornPolls > TornPollGrace) throw e
          return start
      }
    tornPolls = 0
    val newest = recs.lastOption.map(_.version).getOrElse(s)
    val cur = availableNowCap.fold(newest)(math.min(_, newest))
    // saturating: the uncapped default is Long.MaxValue and s + it wraps
    val capped =
      if (maxCommits > Long.MaxValue - s) Long.MaxValue else s + maxCommits
    var end = math.max(s, math.min(cur, capped))
    // materialize-armed defer (r14): with `graft.cole.cdf.materialize`
    // the committer writes a removing commit's change files right AFTER
    // its record becomes visible — a poll landing in that window must
    // WAIT for the images (cap the batch just below the commit and pick
    // it up next trigger), not die planning a diff it can't run. The
    // grace bounds the wait: a commit still image-less past it was left
    // by a dead committer — admit it and let planning raise the loud
    // backfill error that names the fix. Unarmed streams keep the
    // immediate loud behavior (no declared intent to wait on).
    if (end > s &&
        conf.getBoolean(ColeChangeFeed.MaterializeKey, false)) {
      val grace = conf.getLong(ColeCdfStreamConf.MaterializeGraceKey,
        ColeCdfStreamConf.DefaultMaterializeGraceMs)
      val now = ColeCdfStreamConf.clock()
      val pending = recs
        .filter(r => r.version > s && r.version <= end)
        .sortBy(_.version)
        .find(r => r.removes.nonEmpty && r.op != "compact" &&
          r.op != "rollback" && now - r.ts < grace &&
          !ColeChangeFeed.isMaterialized(path, conf, r.version))
      pending.foreach(r => end = r.version - 1)
    }
    ColeCdfOffset(end)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ColeCdfOffset].version
    val e = end.asInstanceOf[ColeCdfOffset].version
    if (e <= s) return Array.empty
    // tail-bounded: the batch only needs records above its start offset —
    // resolveAdds looks at LATER removals only, so a cold restart of a
    // long-lived table's stream never re-parses the checkpointed prefix
    val recs = ColeVersions.recordsFrom(path, conf, s)
    val inRange = recs.filter(r => r.version > s && r.version <= e)
    // dense-sequence continuity (r13): a stream restarted from a
    // checkpoint BELOW the log's prune floor (expire_versions prune_log
    // while it was down, no consumer watermark registered) must refuse
    // loudly — serving only the surviving records would silently skip
    // the pruned commits' rows. initialOffset's horizon guard covers
    // fresh starts; this covers checkpoint resumes. Quarantined torn
    // records count as present-but-empty (their deltas never committed;
    // listed only when the dense count fails — torn gaps are rare).
    val torn =
      if (inRange.size == e - s) 0
      else ColeVersions.quarantinedSeqs(path, conf)
        .count(q => q > s && q <= e)
    require(inRange.size + torn == e - s,
      s"change feed commits ($s, $e] of $path are no longer all present " +
        s"(${inRange.size} records + $torn quarantined of ${e - s}; log " +
        "pruned/expired while the stream was down — register a " +
        "consumerId to pin retention): resynchronize from a snapshot " +
        "(versionAsOf) and restart with startingVersion above the " +
        "expiry horizon")
    inRange.flatMap(r => commitPartitions(recs, r)).toArray
  }

  /** Plan one file set through the ordinary scan machinery (packed
    * row-group partitions, schema evolution, physical rows — feed reads
    * never apply live vectors).
    */
  private def innerParts(files: Seq[(String, String)],
      what: String): Seq[ColeInputPartition] =
    if (files.isEmpty) Seq.empty
    else innerPartsOf(ColeVersions.infosFor(path, conf, files, what))

  private def innerPartsOf(
      infos: Seq[ColeMetaCache.FileInfo]): Seq[ColeInputPartition] = {
    val partCols = ColeMetaCache.partitionSchema(infos,
        ColePartEvolve.evolvedCols(path, conf)).map(_._1)
      .filterNot(ColeTemporal.isLayoutKey).toSet
    val required =
      StructType(dataSchema.fields :+ StructField(ColeUtil.PosMetaCol, LongType))
    new ColeScan(dataSchema, required, path, conf, Array.empty,
      partCols = dataSchema.fieldNames.filter(partCols).toSet,
      snapshot = Some(ColeSnapshot(infos)))
      .planInputPartitions().map(_.asInstanceOf[ColeInputPartition]).toSeq
  }

  /** Delete partitions of one merge-on-read commit, O(delta) on both
    * axes: row groups containing NO fresh ordinal are dropped from the
    * plan (their [base, base+numRows) ranges are known at planning — a
    * commit that deleted rows from k of a file's groups opens k groups,
    * not the file), and each surviving partition ships only ITS OWN
    * groups' ordinal slice — never the commit's file-wide vector, whose
    * per-partition task-serialized copies were exactly the plan-weight
    * shape the batch feed's probe-join comment warns about (sf1
    * measured ~1.2 M ordinals ≈ 7-10 MB, times every partition).
    */
  private def morDeleteParts(rel: String, phys: String, fresh: Array[Int],
      version: Long, what: String): Seq[InputPartition] = {
    val infos = ColeVersions.infosFor(path, conf, Seq(rel -> phys), what)
    val meta = infos.head.meta
    val local = ColeDv.localize(meta, fresh.sorted)
    val bases = new Array[Long](meta.rowGroups.length)
    var acc = 0L
    var g = 0
    while (g < bases.length) {
      bases(g) = acc; acc += meta.rowGroups(g).numRows; g += 1
    }
    innerPartsOf(infos).flatMap { p =>
      val kept = p.rowGroups.indices.filter(i => local(p.rowGroups(i)) != null)
      if (kept.isEmpty) Seq.empty
      else {
        // the ordinal slice ships INSIDE the task binary — bound it per
        // partition (r12): chunk the kept groups so no task carries more
        // than ~48k ordinals (~384 KB of longs); a whole-table 10%
        // delete at sf1 otherwise packed ~200k ordinals ≈ 1.6 MB into
        // one task ("task of very large size"). Extra partitions are
        // row-group-proportional scan work — exactly what scales out.
        val runs = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer.empty[Int])
        var acc = 0
        kept.foreach { i =>
          val n = local(p.rowGroups(i)).length
          if (acc + n > ColeCdfStream.OrdinalsPerTask && runs.last.nonEmpty) {
            runs += scala.collection.mutable.ArrayBuffer.empty[Int]
            acc = 0
          }
          runs.last += i
          acc += n
        }
        runs.filter(_.nonEmpty).map { run =>
          val pruned = p.copy(
            rowGroups = run.map(p.rowGroups).toArray,
            rowCounts = run.map(p.rowCounts).toArray,
            deleted = if (p.deleted == null) null
              else run.map(p.deleted).toArray)
          // groups ascend within a partition and ordinals ascend within
          // a group, so the concatenated slice stays sorted for the
          // reader's binary search
          val slice = run.iterator.flatMap { i =>
            val rg = p.rowGroups(i)
            local(rg).iterator.map(bases(rg) + _.toLong)
          }.toArray
          ColeCdfStream.deleteRowGroupsPlanned.addAndGet(pruned.rowGroups.length)
          ColeCdfPartition(pruned, "delete", version,
            ColeCdfStream.packOrdinals(slice))
        }.toSeq
      }
    }
  }

  private def commitPartitions(recs: Seq[ColeVersions.Record],
      r: ColeVersions.Record): Seq[InputPartition] = r.op match {
    case "compact" => Seq.empty // row-preserving
    case "rollback" => throw new IllegalStateException(
      s"change feed stream of $path hit rollback commit v${r.version}: " +
        "a rollback restores older content whose delta spans the whole " +
        "rolled-over range — resynchronize from a snapshot (restart the " +
        s"stream with startingVersion=${r.version + 1} after reloading)")
    case _ =>
      val adds = ColeVersions.resolveAdds(path, conf, recs, r)
      def inserts(files: Seq[(String, String)], what: String): Seq[InputPartition] =
        innerParts(files, what).map(ColeCdfPartition(_, "insert", r.version, null))
      if (r.removes.isEmpty && r.dvs.isEmpty) {
        inserts(adds, s"cdf stream v${r.version} of $path")
      } else if (r.removes.isEmpty) {
        // merge-on-read: delete rows are EXACTLY the commit's fresh
        // pinned ordinals — no diff, just an ordinal-selected file read,
        // pruned to the row groups the ordinals actually touch
        val dels = ColeChangeFeed.freshDvOrdinals(path, conf, r)
          .filter(_._2.nonEmpty).flatMap { case (rel, fresh) =>
            val phys = ColeChangeFeed.resolveRel(path, conf, recs, rel, r.version)
            morDeleteParts(rel, phys, fresh, r.version,
              s"cdf stream v${r.version} of $path")
          }
        dels ++ inserts(adds, s"cdf stream v${r.version} of $path")
      } else if (ColeChangeFeed.isMaterialized(path, conf, r.version)) {
        // copy-on-write removing commit, images already on disk: plain
        // delta-sized file scans, zero diff work
        ColeChangeFeed.materializedServes.incrementAndGet()
        val sides = ColeChangeFeed.materializedFiles(path, conf, r.version)
        val what = s"materialized cdf v${r.version} of $path"
        innerParts(sides.getOrElse("del", Seq.empty), what)
          .map(ColeCdfPartition(_, "delete", r.version, null)) ++
          innerParts(sides.getOrElse("ins", Seq.empty), what)
            .map(ColeCdfPartition(_, "insert", r.version, null))
      } else {
        throw new IllegalStateException(
          s"change feed stream of $path hit copy-on-write commit " +
            s"v${r.version} (op '${r.op}') whose change data is not " +
            "materialized: a micro-batch plans file partitions and " +
            "cannot run the old-vs-new diff join. Backfill with CALL " +
            s"cole.system.materialize_cdf('ns.t', ${r.version}), or arm " +
            s"${ColeChangeFeed.MaterializeKey}=true so DML commits " +
            "write change files — or consume the batch feed " +
            "(ColeChangeFeed.read)")
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // exists-defaults fill absent columns of pre-evolution files in the
    // feed too — a CDF consumer sees the same values a batch read serves
    new ColeCdfReaderFactory(ColeDefaults.attach(dataSchema, path, conf),
      new ColeHadoopConf(conf))

  override def deserializeOffset(json: String): Offset =
    ColeCdfOffset(json.trim.toLong)

  /** Spark calls this once a micro-batch is durably committed to the
    * sink — the exact moment `end` becomes this consumer's safe
    * low-watermark. A named consumer advances its registration here, so
    * retention (`expire_versions`) tracks real progress; anonymous
    * streams rely on `keep_last_versions` sizing instead. Note the
    * micro-batch protocol delivers this when the NEXT batch is
    * constructed, so the registered watermark trails the in-flight
    * batch by one — conservative in the safe direction (retention pins
    * slightly MORE than strictly needed, never less).
    */
  override def commit(end: Offset): Unit =
    consumerId.foreach(id => ColeVersions.registerConsumer(
      path, conf, id, end.asInstanceOf[ColeCdfOffset].version))

  override def stop(): Unit = ()
}
