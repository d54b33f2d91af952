package graft.sources.cole

import org.scalacheck.{Arbitrary, Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cole.ColeCodec._

/** Property-based round-trips for every COLE encoding: arbitrary values —
  * including run-heavy, sorted-delta-friendly, and low-cardinality shapes
  * the encodings exploit — must decode byte-exactly.
  */
class ColeCodecPropSpec extends AnyFunSuite {

  private def cursor(b: Array[Byte]) = new Cursor(b, 0)

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge
    * in the offline dependency set).
    */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val runHeavyInts: Gen[Array[Int]] =
    Gen.listOf(for {
      v <- Arbitrary.arbitrary[Int]
      n <- Gen.choose(1, 50)
    } yield List.fill(n)(v)).map(_.flatten.toArray)

  private val anyLongs: Gen[Array[Long]] =
    Gen.listOf(Arbitrary.arbitrary[Long]).map(_.toArray)

  private val sortedInts: Gen[Array[Int]] =
    Gen.listOf(Arbitrary.arbitrary[Int]).map(_.sorted.toArray)

  private val byteStrings: Gen[Array[Array[Byte]]] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.getBytes("UTF-8")),            // high-cardinality
      Gen.oneOf("a", "bb", "ccc").map(_.getBytes("UTF-8")) // dictionary-friendly
    )).map(_.toArray)

  test("uvarint/zigzag round-trip any long") {
    check(Prop.forAll { (v: Long) =>
      val o = new Out(); o.uvarint(v); o.zz64(v)
      val c = cursor(o.toBytes)
      c.uvarint() == v && c.zz64() == v
    })
  }

  test("RLE int/long round-trips arbitrary and run-heavy input") {
    check(Prop.forAll(runHeavyInts) { vals =>
      decodeRleInt(cursor(encodeRleInt(vals)), vals.length).toSeq == vals.toSeq
    })
    check(Prop.forAll(anyLongs) { vals =>
      decodeRleLong(cursor(encodeRleLong(vals)), vals.length).toSeq == vals.toSeq
    })
  }

  test("DELTA int/long round-trips arbitrary and sorted input") {
    check(Prop.forAll(sortedInts) { vals =>
      decodeDeltaInt(cursor(encodeDeltaInt(vals)), vals.length).toSeq == vals.toSeq
    })
    check(Prop.forAll(anyLongs) { vals =>
      decodeDeltaLong(cursor(encodeDeltaLong(vals)), vals.length).toSeq == vals.toSeq
    })
  }

  test("PLAIN int/long/string round-trips") {
    check(Prop.forAll { (ints: Array[Int], longs: Array[Long]) =>
      decodePlainInt(cursor(encodePlainInt(ints)), ints.length).toSeq == ints.toSeq &&
        decodePlainLong(cursor(encodePlainLong(longs)), longs.length).toSeq == longs.toSeq
    })
    check(Prop.forAll(byteStrings) { strs =>
      decodePlainStrings(cursor(encodePlainStrings(strs)), strs.length)
        .map(_.toSeq).toSeq == strs.map(_.toSeq).toSeq
    })
  }

  test("page headers round-trip with arbitrary stats shapes") {
    import graft.sources.cole.ColeFormat._
    val encodings = Seq(Plain, Rle, Delta, Dict)
    val statsGen: Gen[PageStats] = for {
      mn <- Gen.option(Arbitrary.arbitrary[Long])
      mx <- Gen.option(Arbitrary.arbitrary[Long])
      nulls <- Gen.choose(0, Int.MaxValue)
    } yield PageStats(mn, mx, nulls)
    val phGen: Gen[PageHeader] = for {
      unc <- Gen.choose(0, Int.MaxValue)
      comp <- Gen.choose(0, Int.MaxValue)
      n <- Gen.choose(0, Int.MaxValue)
      e <- Gen.oneOf(encodings)
      st <- statsGen
    } yield PageHeader(unc, comp, n, e, st)
    check(Prop.forAll(phGen) { ph =>
      val o = new Out(); writePageHeader(o, ph)
      val back = readPageHeader(cursor(o.toBytes))
      // one-sided stats write as present; absent-both reads as zero nulls
      val norm =
        if (ph.stats.minInt.isEmpty && ph.stats.maxInt.isEmpty)
          ph.copy(stats = PageStats(None, None, 0))
        else ph
      back == norm
    })
  }

  test("DICTIONARY strings round-trip; repeats compress below plain") {
    check(Prop.forAll(byteStrings) { strs =>
      decodeDictStrings(cursor(encodeDictStrings(strs)), strs.length)
        .map(_.toSeq).toSeq == strs.map(_.toSeq).toSeq
    })
    val repetitive = Array.fill(10000)("payload".getBytes("UTF-8"))
    assert(encodeDictStrings(repetitive).length < encodePlainStrings(repetitive).length / 10)
  }

  test("deflate/inflate round-trips arbitrary page bodies") {
    val bodies: Gen[Array[Byte]] = Gen.oneOf(
      Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray), // incompressible-ish
      Gen.choose(0, 8192).map(n => Array.tabulate[Byte](n)(i => (i / 64).toByte)))
    check(Prop.forAll(bodies) { raw =>
      val packed = ColeCodec.deflate(raw)
      packed.length <= raw.length &&
        ((packed eq raw) || // stored fallback: returned as-is
          ColeCodec.inflate(packed, 0, packed.length, raw.length).toSeq == raw.toSeq)
    })
  }

  test("sidecar bloom: inserted keys always probe true (no false negatives)") {
    val keys: Gen[List[Array[Byte]]] =
      Gen.nonEmptyListOf(Gen.oneOf(
        Gen.alphaNumStr.map(_.getBytes("UTF-8")),
        Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)))
    check(Prop.forAll(keys, Gen.oneOf(1 << 10, 1 << 12, 1 << 14)) { (ks, numBits) =>
      val words = new Array[Long](numBits / 64)
      ks.foreach(k => ColeBloomIndex.positions(k, 5, numBits)
        .foreach(ColeBloomIndex.set(words, _)))
      ks.forall(k => ColeBloomIndex.mightContain(words, k, 5, numBits))
    })
  }

  test("sidecar bloom: fp rate stays useful at the self-sizing budget") {
    // 10 bits/key (the build-time sizing) with 5 hashes → ~1% fp theory;
    // measure over disjoint probe keys and allow 5x slack
    val numBits = 1 << 14
    val words = new Array[Long](numBits / 64)
    val members = (0 until numBits / 10).map(i => s"member_$i".getBytes("UTF-8"))
    members.foreach(k => ColeBloomIndex.positions(k, 5, numBits)
      .foreach(ColeBloomIndex.set(words, _)))
    val probes = (0 until 20000).map(i => s"outsider_$i".getBytes("UTF-8"))
    val fp = probes.count(k => ColeBloomIndex.mightContain(words, k, 5, numBits))
    assert(fp < 20000 * 0.05, s"fp rate ${fp / 20000.0} too high for planning use")
  }
}
