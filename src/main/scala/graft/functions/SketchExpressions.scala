package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

import Hashing._

/** Native Catalyst expressions for the sketching operators Spark lacks.
  *
  * Each computes a whole per-row sketch in ONE pass over the row's array —
  * not one UDF call per permutation/plane — so a 128-perm MinHash is a
  * single projection, and the shuffle that follows carries only the
  * signature. (Operators modeled on the MinHash/SimHash/SRP literature;
  * the reference engine has no sketches — these are the LLM-pipeline
  * extension mandated for this build.)
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
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    require(x.length == y.length, s"dim mismatch: ${x.length} vs ${y.length}")
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < x.length) {
      dot += x(i).toDouble * y(i)
      nx += x(i).toDouble * x(i)
      ny += y(i).toDouble * y(i)
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class MinHashSig(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val saltArr: Array[Long] = salts(seed, numPerms)

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData].toLongArray()
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var j = 0
      while (j < numPerms) {
        val v = mix64(h ^ saltArr(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = fnv1a64(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class HyperplaneSketch(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData].toFloatArray()
    val signs = HyperplaneSketch.planes(seed, x.length)
    var out = 0L
    var p = 0
    while (p < 64) {
      val w = signs(p)
      var dot = 0.0
      var i = 0
      while (i < x.length) { dot += (if (w(i)) x(i) else -x(i)); i += 1 }
      if (dot > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneSketch {
  // Rademacher plane signs, memoized per (seed, dim) per executor JVM.
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Long, Int), Array[Array[Boolean]]]()
  def planes(seed: Long, dim: Int): Array[Array[Boolean]] =
    cache.computeIfAbsent((seed, dim), { case (s, d) =>
      Array.tabulate(64)(p => Array.tabulate(d)(i => (mix64(s + p * 65537L + i) & 1L) == 1L))
    })
}
