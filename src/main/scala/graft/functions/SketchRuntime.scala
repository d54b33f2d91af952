package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import Hashing._

/** Row-level kernels behind the sketch expressions.
  *
  * Each is a static-forwarder method callable from generated code
  * (`graft.functions.SketchRuntime.minhashSig(...)`), so the expressions
  * implement real `doGenCode` instead of CodegenFallback: they stay inside
  * whole-stage codegen spans and the hot loops are ordinary compiled
  * bytecode the JIT optimizes immediately — the interpreted-expression
  * path cost ~2s of per-JVM warmup before C2 caught up.
  */
object SketchRuntime {

  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
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

  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), Array[Long]]()

  def minhashSig(input: ArrayData, numPerms: Int, seed: Long): ArrayData = {
    val saltArr = saltCache.computeIfAbsent((seed, numPerms),
      { case (s, n) => salts(s, n) })
    val hashes = input.toLongArray()
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

  def simhash64(arr: ArrayData): Long = {
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

  // Rademacher plane signs, memoized per (seed, dim) per executor JVM.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), Array[Array[Boolean]]]()

  def hyperplaneSketch(input: ArrayData, seed: Long): Long = {
    val x = input.toFloatArray()
    val signs = planeCache.computeIfAbsent((seed, x.length), { case (s, d) =>
      Array.tabulate(64)(p => Array.tabulate(d)(i => (mix64(s + p * 65537L + i) & 1L) == 1L))
    })
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

  def bandHashes(input: ArrayData, numBands: Int, rowsPerBand: Int): ArrayData = {
    val sig = input.toLongArray()
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = mix64(0x9e3779b97f4a7c15L + b)
      var j = b * rowsPerBand
      val end = math.min(j + rowsPerBand, sig.length)
      while (j < end) { h = mix64(h ^ sig(j)); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = fnv1a64(toks.getUTF8String(i).getBytes); i += 1 }
    val nWin = if (n < k) 1 else n - k + 1
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var h = 0x51_7c_c1_b7_27_22_0a_95L
      var j = w
      val end = math.min(w + k, n)
      while (j < end) { h = mix64(h ^ th(j)); j += 1 }
      out(w) = h
      w += 1
    }
    // distinct via sort+compact: bounded allocation, no boxing.
    java.util.Arrays.sort(out)
    var uniq = 0
    var r = 0
    while (r < nWin) {
      if (r == 0 || out(r) != out(r - 1)) { out(uniq) = out(r); uniq += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  /** Word k-grams of a single-space-separated string as ZERO-COPY slices
    * of the input's byte buffer. Gram i is the contiguous bytes from
    * token i's start to token i+k-1's end, which equals
    * `concat_ws(" ", slice(split(s, " "), i+1, k))` for EVERY input —
    * split's parts are exactly the byte runs between 0x20 separators and
    * concat_ws re-inserts the same single spaces the slice spans. One
    * byte scan, no token array, no per-gram slice/concat copies (0x20
    * never occurs inside a multi-byte UTF-8 sequence, so byte scanning
    * is codepoint-safe; the slices share the parent's buffer the same
    * way UnsafeRow string reads do — downstream operators copy on
    * buffering). Returns max(tokens - k + 1, 0) grams; fewer than k
    * tokens yields an empty array, which `explode` then drops — the
    * callers' former `size(tokens) >= k` guard, for free.
    */
  def spaceNgrams(text: UTF8String, k: Int): ArrayData = {
    val n = text.numBytes()
    var spaces = 0
    var i = 0
    while (i < n) { if (text.getByte(i) == 0x20) spaces += 1; i += 1 }
    val nToks = spaces + 1
    val nGrams = nToks - k + 1
    if (nGrams <= 0) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](nToks) // byte start of token t
    val ends = new Array[Int](nToks) // byte end (exclusive) of token t
    var t = 0
    i = 0
    while (i < n) {
      if (text.getByte(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val out = new Array[Any](nGrams)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var g = 0
    while (g < nGrams) {
      val s0 = starts(g)
      out(g) = UTF8String.fromAddress(base, off + s0, ends(g + k - 1) - s0)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode: the m nearest-centroid codes of a float vector against a
    * flat codebook laid out [(sub*ksub + code)*subLen + d]. The vector is
    * unit-normalized in-kernel (L2 argmin on unit vectors tracks cosine),
    * and every (sub, code) distance is one tight primitive loop — the
    * whole m-byte code is ONE projection per row.
    */
  def pqEncode(vec: ArrayData, cb: Array[Double], m: Int, ksub: Int,
      subLen: Int): ArrayData = {
    val x = vec.toFloatArray()
    var n2 = 0.0
    var i = 0
    while (i < x.length) { n2 += x(i).toDouble * x(i); i += 1 }
    val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val start = s * subLen
      val len = math.min(subLen, x.length - start)
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * subLen
        var d = 0.0
        var j = 0
        while (j < len) {
          val diff = x(start + j) * inv - cb(base + j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC score of one corpus vector against one query: sum over subspaces
    * of the query LUT entry for that subspace's code — m packed-array
    * lookups, no explode, no per-pair aggregation. Fixed s=0..m-1 order,
    * so the sum is deterministic.
    */
  def pqAdc(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var d = 0.0
    var s = 0
    while (s < m) {
      d += lut.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    d
  }

  /** IVF coarse assignment: the `nProbe` nearest cells of a float vector
    * against a flat centroid array laid out [cell*dim + d] with parallel
    * cell ids, ordered by (cosine desc, cell id asc) — the whole coarse
    * quantizer as ONE shuffle-free projection per row. Cosine accumulates
    * per element in double exactly like [[cosineSim]], so assignment is
    * bit-identical to scoring each (vector, centroid) pair with it.
    */
  def ivfAssign(vec: ArrayData, cents: Array[Double], cellIds: Array[Long],
      dim: Int, nProbe: Int): ArrayData = {
    val x = vec.toFloatArray()
    require(x.length == dim, s"dim mismatch: ${x.length} vs $dim")
    val nCells = cellIds.length
    val sims = new Array[Double](nCells)
    var nx = 0.0
    var i = 0
    while (i < x.length) { nx += x(i).toDouble * x(i); i += 1 }
    var c = 0
    while (c < nCells) {
      val base = c * dim
      var dot = 0.0
      var ny = 0.0
      var j = 0
      while (j < dim) {
        dot += x(j).toDouble * cents(base + j)
        ny += cents(base + j) * cents(base + j)
        j += 1
      }
      sims(c) = if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
      c += 1
    }
    val k = math.min(nProbe, nCells)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](nCells)
    var p = 0
    while (p < k) {
      var best = -1
      c = 0
      while (c < nCells) {
        if (!taken(c) && (best < 0 || sims(c) > sims(best) ||
            (sims(c) == sims(best) && cellIds(c) < cellIds(best)))) best = c
        c += 1
      }
      taken(best) = true
      out(p) = cellIds(best)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** PQ query LUT: squared L2 from each of the query's m unit-normalized
    * subvectors to every centroid, flat array [(sub*ksub + code)] — the
    * asymmetric-distance table the ADC join broadcasts.
    */
  def pqLut(vec: ArrayData, cb: Array[Double], m: Int, ksub: Int,
      subLen: Int): ArrayData = {
    val x = vec.toFloatArray()
    var n2 = 0.0
    var i = 0
    while (i < x.length) { n2 += x(i).toDouble * x(i); i += 1 }
    val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val start = s * subLen
      val len = math.min(subLen, x.length - start)
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * subLen
        var d = 0.0
        var j = 0
        while (j < len) {
          val diff = x(start + j) * inv - cb(base + j)
          d += diff * diff
          j += 1
        }
        out(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}
