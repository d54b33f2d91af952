package graft.sources.cole

import java.nio.file.Files

import org.scalacheck.{Arbitrary, Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cole.ColeFormat._

/** Property fuzz of format v2 through the REAL file writer/reader: random
  * row groups of every column type under random null masks (including
  * all-null pages, empty row groups, masks crossing the bitmap's 8-row
  * byte boundary), with and without page DEFLATE, with every legal
  * encoding — must round-trip value- and null-exactly.
  */
class ColeV2PropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  /** (values as longs/doubles/strings-bytes/float-vectors, null mask). */
  private case class Cols(n: Int, ints: Array[Int], longs: Array[Long],
      dbls: Array[Double], strs: Array[Array[Byte]], vecs: Array[Array[Float]],
      nInt: Array[Boolean], nLong: Array[Boolean], nDbl: Array[Boolean],
      nStr: Array[Boolean], nVec: Array[Boolean])

  private val genFloat: Gen[Float] = Gen.oneOf(
    Arbitrary.arbitrary[Float],
    Gen.const(0.0f), Gen.const(-0.0f), Gen.const(Float.MinPositiveValue),
    Gen.const(Float.NaN), Gen.const(Float.NegativeInfinity))

  private val genCols: Gen[Cols] = for {
    n <- Gen.choose(0, 120)
    ints <- Gen.listOfN(n, Arbitrary.arbitrary[Int])
    longs <- Gen.listOfN(n, Arbitrary.arbitrary[Long])
    dbls <- Gen.listOfN(n, Gen.oneOf(
      Arbitrary.arbitrary[Double],
      Gen.const(0.0), Gen.const(-0.0), Gen.const(Double.MinPositiveValue),
      Gen.const(Double.NaN), Gen.const(Double.PositiveInfinity)))
    strs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(_.getBytes("UTF-8")),
      Gen.oneOf("a", "bb", "ccc").map(_.getBytes("UTF-8"))))
    // ragged vectors, empties included
    vecs <- Gen.listOfN(n, Gen.choose(0, 9).flatMap(d =>
      Gen.listOfN(d, genFloat).map(_.toArray)))
    // per-column masks: dense, sparse, heavy, and ALL-null shapes
    masks <- Gen.listOfN(5, Gen.oneOf(
      Gen.const(Array.fill(n)(false)),
      Gen.const(Array.fill(n)(true)),
      Gen.listOfN(n, Gen.frequency(4 -> false, 1 -> true)).map(_.toArray),
      Gen.listOfN(n, Gen.frequency(1 -> false, 3 -> true)).map(_.toArray)))
  } yield Cols(n, ints.toArray, longs.toArray, dbls.toArray, strs.toArray,
    vecs.toArray, masks(0), masks(1), masks(2), masks(3), masks(4))

  private def sameDouble(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)

  private def roundTrip(c: Cols, compress: Boolean, strEnc: Enc,
      longEnc: Enc): Boolean = {
    val dir = Files.createTempDirectory("cole_v2_prop").toFile
    val file = new java.io.File(dir, "t.col").getPath
    val cols = Seq(
      ColeColumn("i", TInt32, Plain),
      ColeColumn("l", TInt64, longEnc),
      ColeColumn("d", TDouble, Plain),
      ColeColumn("s", TString, strEnc),
      ColeColumn("t", TTimestamp, longEnc),
      ColeColumn("v", TFloatVec, Plain))
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set(ColeFileWriter.VersionKey, "2")
    if (compress) conf.set(ColeFileWriter.CompressKey, "deflate")
    val w = new ColeFileWriter(file, cols, conf)
    try {
      // two row groups over the same data crosses a group boundary
      for (_ <- 0 until 2)
        w.writeRowGroup(Seq(
          ColumnData(c.ints, null, null, null, if (c.nInt.exists(identity)) c.nInt else null),
          ColumnData(null, c.longs, null, null, if (c.nLong.exists(identity)) c.nLong else null),
          ColumnData(null, null, null, c.dbls, if (c.nDbl.exists(identity)) c.nDbl else null),
          ColumnData(null, null, c.strs, null, if (c.nStr.exists(identity)) c.nStr else null),
          ColumnData(null, c.longs, null, null, if (c.nLong.exists(identity)) c.nLong else null),
          ColumnData(null, null, null, null,
            if (c.nVec.exists(identity)) c.nVec else null, c.vecs)),
          c.n)
    } finally w.close()
    val r = new ColeFileReader(file, conf)
    try {
      val meta = r.meta
      if (meta.version != Version2) return false
      if (meta.totalRows != 2L * c.n) return false
      (0 until 2).forall { rg =>
        val (ic, lc, dc, sc, tc) = (r.readChunk(rg, 0), r.readChunk(rg, 1),
          r.readChunk(rg, 2), r.readChunk(rg, 3), r.readChunk(rg, 4))
        val vc = r.readChunk(rg, 5)
        def nullsOk(cd: ColumnData, mask: Array[Boolean]): Boolean =
          (0 until c.n).forall { i =>
            val isNull = cd.nulls != null && cd.nulls(i)
            isNull == mask(i)
          }
        def sameVec(a: Array[Float], b: Array[Float]): Boolean =
          a.length == b.length && a.indices.forall(j =>
            java.lang.Float.floatToIntBits(a(j)) == java.lang.Float.floatToIntBits(b(j)))
        nullsOk(ic, c.nInt) && nullsOk(lc, c.nLong) && nullsOk(dc, c.nDbl) &&
          nullsOk(sc, c.nStr) && nullsOk(tc, c.nLong) && nullsOk(vc, c.nVec) &&
          (0 until c.n).forall { i =>
            (c.nInt(i) || ic.ints(i) == c.ints(i)) &&
              (c.nLong(i) || (lc.longs(i) == c.longs(i) && tc.longs(i) == c.longs(i))) &&
              (c.nDbl(i) || sameDouble(dc.doubles(i), c.dbls(i))) &&
              (c.nStr(i) || java.util.Arrays.equals(sc.strings(i), c.strs(i))) &&
              (c.nVec(i) || sameVec(vc.vecs(i), c.vecs(i)))
          }
      }
    } finally {
      r.close()
      new java.io.File(file).delete(); dir.delete()
    }
  }

  test("v2 roundtrip: arbitrary values x null masks x encodings, stored pages") {
    check(Prop.forAll(genCols) { c => roundTrip(c, compress = false, Dict, Rle) })
    check(Prop.forAll(genCols) { c => roundTrip(c, compress = false, Plain, Delta) })
  }

  test("v2 roundtrip: DEFLATE pages cover the validity bitmap too") {
    check(Prop.forAll(genCols) { c => roundTrip(c, compress = true, Dict, Plain) })
  }

  test("v2 stats: min/max describe only the PRESENT values; all-null pages carry none") {
    check(Prop.forAll(genCols) { c =>
      val dir = Files.createTempDirectory("cole_v2_stats").toFile
      val file = new java.io.File(dir, "t.col").getPath
      val conf = new org.apache.hadoop.conf.Configuration()
      conf.set(ColeFileWriter.VersionKey, "2")
      val w = new ColeFileWriter(file,
        Seq(ColeColumn("l", TInt64, Plain), ColeColumn("d", TDouble, Plain)), conf)
      try w.writeRowGroup(Seq(
        ColumnData(null, c.longs, null, null, if (c.nLong.exists(identity)) c.nLong else null),
        ColumnData(null, null, null, c.dbls, if (c.nDbl.exists(identity)) c.nDbl else null)), c.n)
      finally w.close()
      val r = new ColeFileReader(file, conf)
      try {
        val presentL = c.longs.zip(c.nLong).collect { case (v, false) => v }
        val presentD = c.dbls.zip(c.nDbl).collect { case (v, false) => v }
        val stL = r.meta.statsMinMax(0, 0)
        val stD = r.meta.statsMinMaxD(0, 1)
        val lOk =
          if (presentL.isEmpty) stL.isEmpty
          else stL.contains((presentL.min, presentL.max))
        // double stats use IEEE compare: NaN-bearing pages may order
        // oddly but must still bound every present non-NaN value
        val dOk = presentD.isEmpty || stD.isEmpty || {
          val (mn, mx) = stD.get
          presentD.filterNot(_.isNaN).forall(v => !(v < mn) && !(v > mx))
        }
        lOk && dOk
      } finally {
        r.close()
        new java.io.File(file).delete(); dir.delete()
      }
    })
  }
}
