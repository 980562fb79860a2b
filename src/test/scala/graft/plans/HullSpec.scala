package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** RingKernel.hullStats vs an independent monotone-chain hull. */
class HullSpec extends AnyFunSuite {
  private def stats(xs: Seq[Long], ys: Seq[Long]): (Long, Long) = {
    val r = RingKernel.hullStats(
      new GenericArrayData(xs.toArray), new GenericArrayData(ys.toArray))
    (r.getLong(0), r.getLong(1))
  }

  /** Andrew's monotone chain (strict turns, collinear points dropped):
    * returns (area2, vertexCount) for comparison.
    */
  private def chainHull(pts: Seq[(Long, Long)]): (Long, Long) = {
    val p = pts.distinct.sorted
    if (p.length < 3) return (0L, math.min(p.length, 2).toLong)
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): BigInt =
      BigInt(a._1 - o._1) * (b._2 - o._2) - BigInt(a._2 - o._2) * (b._1 - o._1)
    def half(s: Seq[(Long, Long)]): List[(Long, Long)] =
      s.foldLeft(List.empty[(Long, Long)]) { (acc, pt) =>
        var st = acc
        while (st.length >= 2 && cross(st(1), st.head, pt).signum <= 0) st = st.tail
        pt :: st
      }.reverse
    val lower = half(p).dropRight(1)
    val upper = half(p.reverse).dropRight(1)
    val hull = lower ++ upper
    if (hull.length < 3) return (0L, 2L) // all collinear
    var a2 = BigInt(0)
    hull.indices.foreach { i =>
      val (ax, ay) = hull(i); val (bx, by) = hull((i + 1) % hull.length)
      a2 += BigInt(ax) * by - BigInt(bx) * ay
    }
    (a2.abs.longValue, hull.length.toLong)
  }

  test("golden: square with interior point") {
    assert(stats(Seq(0L, 10L, 10L, 0L, 5L), Seq(0L, 0L, 10L, 10L, 5L)) ===
      ((200L, 4L)))
  }

  test("golden: collinear midpoint on an edge is not a hull vertex") {
    assert(stats(Seq(0L, 5L, 10L, 10L, 0L), Seq(0L, 0L, 0L, 10L, 10L)) ===
      ((200L, 4L)))
  }

  test("golden: fully collinear chain has area 0, two extreme vertices") {
    assert(stats(Seq(0L, 3L, 7L, 10L), Seq(0L, 3L, 7L, 10L)) === ((0L, 2L)))
  }

  test("golden: duplicates collapse before the hull") {
    assert(stats(Seq(0L, 0L, 10L, 10L, 0L), Seq(0L, 0L, 0L, 10L, 10L)) ===
      ((200L, 4L)))
  }

  test("matches monotone-chain hull on seeded random point sets") {
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val n = 3 + rnd.nextInt(9)
      val pts = Seq.fill(n)(
        (rnd.between(-20L, 21L), rnd.between(-20L, 21L)))
      val (a2, nv) = stats(pts.map(_._1), pts.map(_._2))
      val (ca2, cnv) = chainHull(pts)
      assert((a2, nv) === ((ca2, cnv)), s"pts=$pts")
    }
  }

  test("matches monotone-chain hull on world-scale way-like points") {
    val rnd = new scala.util.Random(13)
    (0 until 100).foreach { _ =>
      val bx = rnd.between(-1700000000L, 1700000001L)
      val by = rnd.between(-800000000L, 800000001L)
      val pts = Seq.fill(7)(
        (bx + rnd.between(-10000000L, 10000001L),
         by + rnd.between(-10000000L, 10000001L)))
      val (a2, nv) = stats(pts.map(_._1), pts.map(_._2))
      val (ca2, cnv) = chainHull(pts)
      assert((a2, nv) === ((ca2, cnv)))
    }
  }
}
