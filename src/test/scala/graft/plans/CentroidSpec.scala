package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** RingKernel.centroidFix goldens: exact shoelace centroid, floor
  * quantization, orientation independence, degenerate rejection.
  */
class CentroidSpec extends AnyFunSuite {
  private def cent(xs: Seq[Long], ys: Seq[Long]): (Long, Long) = {
    val r = RingKernel.centroidFix(
      new GenericArrayData(xs.toArray), new GenericArrayData(ys.toArray))
    (r.getLong(0), r.getLong(1))
  }

  test("unit square centroid is its center") {
    assert(cent(Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L)) === ((5L, 5L)))
  }

  test("orientation independence: CW and CCW rings agree") {
    val xs = Seq(3L, 41L, 29L, -7L); val ys = Seq(-5L, 2L, 37L, 18L)
    assert(cent(xs, ys) === cent(xs.reverse, ys.reverse))
  }

  test("floor quantization: triangle with non-integer centroid") {
    // (0,0),(1,0),(0,1): centroid (1/3, 1/3) -> floor 0; shifted by -1
    // in x: centroid (-2/3, 1/3) -> floor (-1, 0), not truncation toward 0
    assert(cent(Seq(0L, 1L, 0L), Seq(0L, 0L, 1L)) === ((0L, 0L)))
    assert(cent(Seq(-1L, 0L, -1L), Seq(0L, 0L, 1L)) === ((-1L, 0L)))
  }

  test("translation equivariance on a world-scale ring (BigInt path)") {
    val xs = Seq(0L, 1700000000L, 1500000000L, -900000000L)
    val ys = Seq(-800000000L, 0L, 850000000L, 600000000L)
    val (cx, cy) = cent(xs, ys)
    val dx = 100000007L; val dy = -70000003L
    assert(cent(xs.map(_ + dx), ys.map(_ + dy)) === ((cx + dx, cy + dy)))
  }

  test("degenerate zero-area ring rejected") {
    intercept[IllegalArgumentException] {
      cent(Seq(0L, 5L, 10L), Seq(0L, 5L, 10L))
    }
  }
}
