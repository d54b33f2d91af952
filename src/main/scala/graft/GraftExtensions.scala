package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** Session extension wiring graft's native expressions into the SQL
  * function registry, so every sketch operator is first-class in
  * `spark.sql(...)` — not just the Scala Column API:
  *
  * {{{
  * spark.sql("SELECT graft_simhash64(split(text, ' ')) FROM docs")
  * }}}
  *
  * Activate via `.withExtensions(new GraftExtensions)` (Engine.session
  * does) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    // operation-level auto-retry for overlapping COLE row-level DML:
    // a conflict abort re-plans the same statement against the fresh
    // snapshot (bounded) instead of surfacing the manual re-run
    ext.injectPlannerStrategy(_ =>
      new graft.sources.cole.ColeDmlRetryStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    (FunctionIdentifier("graft_cosine_sim"),
      info("graft_cosine_sim", "graft_cosine_sim(a, b) - cosine similarity of two float vectors"),
      { case Seq(a, b) => CosineSim(a, b) }),

    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(hashes[, numPerms[, seed]]) - MinHash signature of an array<long>"),
      {
        case Seq(h)       => MinHashSig(h, 128, 42L)
        case Seq(h, n)    => MinHashSig(h, intArg(n, "numPerms"), 42L)
        case Seq(h, n, s) => MinHashSig(h, intArg(n, "numPerms"), longArg(s, "seed"))
      }),

    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of an array<string>"),
      { case Seq(t) => SimHash64(t) }),

    (FunctionIdentifier("graft_hyperplane_sketch"),
      info("graft_hyperplane_sketch",
        "graft_hyperplane_sketch(vec[, seed]) - 64 packed SRP sign bits of a float vector"),
      {
        case Seq(v)    => HyperplaneSketch(v, 7L)
        case Seq(v, s) => HyperplaneSketch(v, longArg(s, "seed"))
      }),

    (FunctionIdentifier("graft_band_hashes"),
      info("graft_band_hashes",
        "graft_band_hashes(sig, numBands, rowsPerBand) - LSH band keys of a signature"),
      { case Seq(sig, b, r) =>
        BandHashes(sig, intArg(b, "numBands"), intArg(r, "rowsPerBand")) }),

    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(tokens, k) - distinct k-gram rolling shingle hashes"),
      { case Seq(t, k) => ShingleHashes(t, intArg(k, "k")) })
  )
}
