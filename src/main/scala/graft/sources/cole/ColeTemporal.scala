package graft.sources.cole

import java.nio.charset.StandardCharsets
import java.time.LocalDate

import org.apache.hadoop.conf.Configuration

/** Temporal partition transforms — `PARTITIONED BY (days(ts))` — the
  * time-series warehouse layout (Iceberg's years/months/days/hours
  * family) on COLE tables.
  *
  * The partition key is DERIVED, not stored: writers compute each row's
  * unit ordinal from the timestamp column (UTC) and route it to a
  * `_t_<fn>_<col>=<ordinal>/` directory; the source column stays a
  * normal data column in the files, and the derived directory key —
  * like the bucket layout's `_bucket` — is pure layout, excluded from
  * the table schema. Ordinals are plain longs (epoch days / epoch
  * hours / `year*12+month-1` / year), so the existing numeric
  * partition-pruning machinery evaluates them unchanged.
  *
  * Read-side pruning is a PREDICATE TRANSLATION: a claimed comparison
  * on the source column implies a comparison on its unit ordinal
  * (`ord` is monotone, so `ts >= X ⇒ ord(ts) >= ord(X)`), and the
  * derived predicate joins the partition-predicate set that prunes
  * whole directories at planning — a `WHERE ts BETWEEN a AND b` over a
  * 100 TB years-long table plans only the touched days' directories,
  * no footer reads elsewhere. Translation is strictly conservative
  * (over-approximate): the original predicate still runs through stats
  * skipping and row-exact selection, so boundary rows are exact.
  *
  * The layout self-describes through the `_temporalspec` sidecar
  * (written at CREATE, or by the first write carrying the
  * `partitionByTemporal=<fn>:<col>` option); appends pick it up
  * automatically and a conflicting re-declaration is rejected — same
  * discipline as `_bucketspec`.
  */
object ColeTemporal {

  val SpecFile = "_temporalspec"

  /** Write option for path-based tables: `partitionByTemporal=days:ts`. */
  val OptionKey = "partitionByTemporal"

  val Fns: Seq[String] = Seq("years", "months", "days", "hours")

  private val MicrosPerDay = 86_400_000_000L
  private val MicrosPerHour = 3_600_000_000L

  /** One temporal transform: unit function + source timestamp column. */
  final case class Spec(fn: String, src: String) extends Serializable {
    require(Fns.contains(fn),
      s"temporal transform must be one of ${Fns.mkString("/")}, got '$fn'")

    /** The reserved derived directory key, e.g. `_t_days_ts`. */
    val dirKey: String = s"_t_${fn}_$src"

    /** Unit ordinal of a timestamp (micros since epoch, UTC). */
    def ordinal(micros: Long): Long = {
      val epochDay = Math.floorDiv(micros, MicrosPerDay)
      fn match {
        case "hours" => Math.floorDiv(micros, MicrosPerHour)
        case "days" => epochDay
        case "months" =>
          val d = LocalDate.ofEpochDay(epochDay)
          d.getYear * 12L + (d.getMonthValue - 1)
        case "years" => LocalDate.ofEpochDay(epochDay).getYear.toLong
      }
    }
  }

  def isDerivedKey(name: String): Boolean = name.startsWith("_t_")

  /** Directory keys that are pure LAYOUT — the bucket hash and temporal
    * ordinals — and therefore excluded from every surfaced schema (the
    * data they derive from is stored in the files themselves).
    */
  def isLayoutKey(name: String): Boolean =
    name == ColeBucket.DirKey || isDerivedKey(name)

  def parseOption(v: String): Spec = {
    val i = v.indexOf(':')
    require(i > 0 && i < v.length - 1,
      s"$OptionKey takes <fn>:<column> (e.g. days:ts), got '$v'")
    Spec(v.substring(0, i), v.substring(i + 1))
  }

  def writeSpec(table: String, conf: Configuration, spec: Spec): Unit = {
    val (fs, p) = ColeIO.resolve(s"$table/$SpecFile", conf)
    val out = fs.create(p, true)
    try out.write(s"1\n${spec.fn}:${spec.src}\n"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readSpec(table: String, conf: Configuration): Option[Spec] = {
    val (fs, p) = ColeIO.resolve(s"$table/$SpecFile", conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val lines = txt.split('\n')
    require(lines.length >= 2 && lines(0) == "1",
      s"unreadable $SpecFile at $table")
    Some(parseOption(lines(1).trim))
  }

  /** Derived partition predicates implied by claimed predicates on the
    * source column — conservative by construction (`ordinal` is
    * monotone non-decreasing in the timestamp):
    * `=`→`=`, `>`/`>=`→`>=`, `<`/`<=`→`<=`, IN→IN, same-column OR→OR;
    * everything else declines (no pruning, never a wrong prune). The
    * ORIGINAL predicates stay in the data set — stats skipping and
    * row-exact selection make the boundary exact.
    */
  def derivePartPreds(preds: Seq[ColePredicate],
      spec: Option[Spec]): Seq[ColePredicate] =
    spec.fold(Seq.empty[ColePredicate])(s =>
      preds.flatMap(p => translate(p, s)))

  private def translate(p: ColePredicate, s: Spec): Option[ColePredicate] = {
    if (p.column != s.src) return None
    p.op match {
      case "eq" => Some(ColePredicate(s.dirKey, "eq", s.ordinal(p.value)))
      case "gt" | "ge" => Some(ColePredicate(s.dirKey, "ge", s.ordinal(p.value)))
      case "lt" | "le" => Some(ColePredicate(s.dirKey, "le", s.ordinal(p.value)))
      case "in" => Some(ColePredicate(s.dirKey, "in", 0L,
        values = p.values.map(s.ordinal).distinct))
      case "or" =>
        val ts = p.orChildren.map(translate(_, s))
        if (ts.forall(_.isDefined))
          Some(ColePredicate(s.dirKey, "or", 0L, orChildren = ts.map(_.get)))
        else None
      case _ => None
    }
  }
}
