package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mt19937 + libstdc++ uniform_int downscaling vs ground truth captured
  * from the system toolchain (g++/libstdc++, the reference's build
  * environment): raw engine draws and the generator's interleaved
  * (value, category, region, status) stream at seed 42.
  */
class RefStreamSpec extends AnyFunSuite {

  test("raw mt19937 draws match std::mt19937(42)") {
    val rng = new Mt19937(42)
    assert(Seq.fill(5)(rng.nextUInt()) ===
      Seq(1608637542L, 3421126067L, 4083286876L, 787846414L, 3143890026L))
  }

  test("interleaved distribution stream matches the reference generator") {
    // C++: value_dist(0,10000), category_dist(1,5), region_dist(0,3),
    // status_dist(0,2) drawn in row order from one engine
    val rng = new Mt19937(42)
    val rows = Seq.fill(8)((rng.uniformInt(0, 10000), rng.uniformInt(1, 5),
      rng.uniformInt(0, 3), rng.uniformInt(0, 2)))
    assert(rows === Seq(
      (3745L, 4L, 3L, 0L), (7320L, 4L, 2L, 1L), (1560L, 3L, 0L, 0L),
      (580L, 3L, 3L, 1L), (6011L, 1L, 2L, 1L), (205L, 1L, 3L, 2L),
      (8325L, 5L, 0L, 0L), (1818L, 5L, 0L, 1L)))
  }
}
