package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketching operators Spark lacks.
  *
  * Each computes a whole per-row sketch in ONE pass over the row's array —
  * not one UDF call per permutation/plane — so a 128-perm MinHash is a
  * single projection, and the shuffle that follows carries only the
  * signature. All implement `doGenCode` (delegating to the static kernels
  * in [[SketchRuntime]]), so they stay inside whole-stage codegen rather
  * than forcing the interpreted fallback path. (Operators modeled on the
  * MinHash/SimHash/SRP literature; the reference engine has no sketches —
  * these are the LLM-pipeline extension mandated for this build.)
  */
object sketches {
  /** Cosine similarity of two float vectors, accumulated in double. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** MinHash signature (array<long>, length numPerms) of an array<long> of
    * element hashes.
    */
  def minhash_sig(hashes: Column, numPerms: Int = 128, seed: Long = 42L): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), numPerms, seed))

  /** 64-bit SimHash of an array<string> of tokens. */
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** 64 sign bits of random-hyperplane (Rademacher) projections of a float
    * vector, packed into a long: the building block for SRP-LSH banding.
    */
  def hyperplane_sketch(vec: Column, seed: Long = 7L): Column =
    GraftBridge.column(HyperplaneSketch(GraftBridge.expression(vec), seed))

  /** LSH band keys: hash each `rowsPerBand`-long slice of a signature to
    * one long, returning array<long> of length numBands — one pass over
    * the signature, no per-element string materialization.
    */
  def band_hashes(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    GraftBridge.column(BandHashes(GraftBridge.expression(sig), numBands, rowsPerBand))

  /** PQ codes (array<int>, length m) of a float vector against a flat
    * driver-built codebook — see [[SketchRuntime.pqEncode]].
    */
  def pq_encode(vec: Column, codebook: Array[Double], m: Int, ksub: Int,
      subLen: Int): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebook, m, ksub, subLen))

  /** PQ asymmetric-distance LUT (array<double>, length m·ksub) of a query
    * vector against the same codebook — see [[SketchRuntime.pqLut]].
    */
  def pq_lut(vec: Column, codebook: Array[Double], m: Int, ksub: Int,
      subLen: Int): Column =
    GraftBridge.column(PqLut(GraftBridge.expression(vec), codebook, m, ksub, subLen))

  /** ADC distance of a packed PQ code array against a per-query LUT
    * (array<double>, length m·ksub) — see [[SketchRuntime.pqAdc]].
    */
  def pq_adc(codes: Column, lut: Column, ksub: Int): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(codes), GraftBridge.expression(lut), ksub))

  /** The `nProbe` nearest IVF cell ids (array<long>, best-first) of a
    * float vector against a flat driver-collected centroid array — the
    * coarse quantizer as one codegen'd projection; see
    * [[SketchRuntime.ivfAssign]].
    */
  def ivf_assign(vec: Column, centroids: Array[Double], cellIds: Array[Long],
      dim: Int, nProbe: Int): Column =
    GraftBridge.column(IvfAssign(GraftBridge.expression(vec), centroids, cellIds, dim, nProbe))

  /** Distinct k-token shingle hashes from a token array — the rolling-hash
    * twin of hashing each " "-joined k-gram string, in one pass with no
    * string allocation (the interpreted slice→concat→hash HOF chain was
    * the dominant cost of the whole MinHash pipeline).
    */
  def shingle_hashes(tokens: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), k))

  /** Word k-grams of a single-space-separated string (array<string>,
    * zero-copy buffer slices) — equals
    * `transform(sequence(1, size(split(s," "))-k+1), i => concat_ws(" ",
    * slice(split(s," "), i, k)))` in one pass with no token array or
    * per-gram copies; see [[SketchRuntime.spaceNgrams]].
    */
  def space_ngrams(text: Column, k: Int): Column =
    GraftBridge.column(SpaceNgrams(GraftBridge.expression(text), k))
}

private[functions] object SketchCodegen {
  val runtime = "graft.functions.SketchRuntime"
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchRuntime.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${SketchCodegen.runtime}.cosineSim($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class MinHashSig(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.minhashSig(input.asInstanceOf[ArrayData], numPerms, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${SketchCodegen.runtime}.minhashSig($c, $numPerms, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${SketchCodegen.runtime}.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class HyperplaneSketch(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.hyperplaneSketch(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${SketchCodegen.runtime}.hyperplaneSketch($c, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class BandHashes(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.bandHashes(input.asInstanceOf[ArrayData], numBands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${SketchCodegen.runtime}.bandHashes($c, $numBands, $rowsPerBand)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PqEncode(child: Expression, codebook: Array[Double], m: Int,
    ksub: Int, subLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.pqEncode(input.asInstanceOf[ArrayData], codebook, m, ksub, subLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev,
      c => s"${SketchCodegen.runtime}.pqEncode($c, $cbRef, $m, $ksub, $subLen)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PqLut(child: Expression, codebook: Array[Double], m: Int,
    ksub: Int, subLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.pqLut(input.asInstanceOf[ArrayData], codebook, m, ksub, subLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev,
      c => s"${SketchCodegen.runtime}.pqLut($c, $cbRef, $m, $ksub, $subLen)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any, lut: Any): Any =
    SketchRuntime.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"${SketchCodegen.runtime}.pqAdc($c, $l, $ksub)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class IvfAssign(child: Expression, centroids: Array[Double],
    cellIds: Array[Long], dim: Int, nProbe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.ivfAssign(input.asInstanceOf[ArrayData], centroids, cellIds, dim, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
    val idRef = ctx.addReferenceObj("ivfCellIds", cellIds, "long[]")
    defineCodeGen(ctx, ev,
      c => s"${SketchCodegen.runtime}.ivfAssign($c, $ctRef, $idRef, $dim, $nProbe)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${SketchCodegen.runtime}.shingleHashes($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SpaceNgrams(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.spaceNgrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${SketchCodegen.runtime}.spaceNgrams($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
