package graft.sources.cole

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cole.ColeCodec._

class ColeCodecSpec extends AnyFunSuite {

  private def cursor(b: Array[Byte]) = new Cursor(b, 0)

  test("uvarint boundary values") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 0x7fffffffL, 0xffffffffL)) {
      val o = new Out(); o.uvarint(v)
      assert(cursor(o.toBytes).uvarint() === v)
    }
    // spec example: 300 encodes as [0xAC, 0x02]
    val o = new Out(); o.uvarint(300)
    assert(o.toBytes.map(_ & 0xff).toSeq === Seq(0xac, 0x02))
  }

  test("zigzag int32/int64 extremes") {
    for (v <- Seq(0, 1, -1, 63, -64, Int.MaxValue, Int.MinValue)) {
      val o = new Out(); o.zz32(v)
      assert(cursor(o.toBytes).zz32() === v)
    }
    for (v <- Seq(0L, -1L, Long.MaxValue, Long.MinValue)) {
      val o = new Out(); o.zz64(v)
      assert(cursor(o.toBytes).zz64() === v)
    }
  }

  test("RLE int roundtrip, runs compress") {
    val vals = Array.fill(1000)(7) ++ Array(1, 2, 2, 3) ++ Array.fill(500)(-9)
    val enc = encodeRleInt(vals)
    assert(enc.length < vals.length) // long runs collapse
    assert(decodeRleInt(cursor(enc), vals.length).toSeq === vals.toSeq)
  }

  test("RLE long roundtrip") {
    val vals = Array[Long](Long.MinValue, Long.MinValue, 0L, Long.MaxValue)
    assert(decodeRleLong(cursor(encodeRleLong(vals)), 4).toSeq === vals.toSeq)
  }

  test("delta int/long roundtrip with negative deltas") {
    val ints = Array(100, 50, -3, Int.MaxValue, Int.MinValue, 0)
    assert(decodeDeltaInt(cursor(encodeDeltaInt(ints)), ints.length).toSeq === ints.toSeq)
    val longs = Array(0L, -1000000000000L, 999L, Long.MaxValue)
    assert(decodeDeltaLong(cursor(encodeDeltaLong(longs)), longs.length).toSeq === longs.toSeq)
  }

  test("plain strings roundtrip incl empty and unicode") {
    val vals = Array("", "hello", "héllo wörld", "日本語", "x" * 10000)
      .map(_.getBytes("UTF-8"))
    val dec = decodePlainStrings(cursor(encodePlainStrings(vals)), vals.length)
    assert(dec.map(new String(_, "UTF-8")).toSeq === vals.map(new String(_, "UTF-8")).toSeq)
  }

  test("dictionary strings roundtrip, low cardinality compresses") {
    // grouped values -> RLE'd dictionary indices collapse to 4 runs
    val vals = Array.tabulate(5000)(i => s"cat-${i / 1250}").map(_.getBytes("UTF-8"))
    val enc = encodeDictStrings(vals)
    assert(enc.length < 200) // 4 dict entries + 4 RLE runs
    val dec = decodeDictStrings(cursor(enc), vals.length)
    assert(dec.map(new String(_, "UTF-8")).toSeq === vals.map(new String(_, "UTF-8")).toSeq)
  }

  test("property: RLE/delta roundtrip random ints (seeded)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = rng.nextInt(2000)
      val a = Array.fill(n)(if (rng.nextBoolean()) rng.nextInt() else rng.nextInt(5))
      assert(decodeRleInt(cursor(encodeRleInt(a)), a.length).toSeq === a.toSeq)
      if (a.nonEmpty)
        assert(decodeDeltaInt(cursor(encodeDeltaInt(a)), a.length).toSeq === a.toSeq)
      val b = Array.fill(n)(rng.nextLong())
      assert(decodeRleLong(cursor(encodeRleLong(b)), b.length).toSeq === b.toSeq)
      if (b.nonEmpty)
        assert(decodeDeltaLong(cursor(encodeDeltaLong(b)), b.length).toSeq === b.toSeq)
    }
  }
}
