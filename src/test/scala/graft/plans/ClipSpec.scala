package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Exact Liang-Barsky segment-to-rect clip kernel invariants. */
class ClipSpec extends AnyFunSuite {

  private def clip(seg: (Long, Long, Long, Long),
                   rect: (Long, Long, Long, Long)): (Long, Long, Long, Long) = {
    val r = ClipKernel.clipSegRect(
      new GenericArrayData(Array(seg._1, seg._2, seg._3, seg._4)),
      new GenericArrayData(Array(rect._1, rect._2, rect._3, rect._4)))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("golden cases: diagonal, axis-aligned, fully inside, corner touch") {
    // diagonal through unit-100 rect: enters at x=0 (t=1/3), exits x=100
    assert(clip((-50, -50, 250, 250), (0, 0, 100, 100)) === ((0L, 0L, 100L, 100L)))
    // horizontal through: y unchanged, x clamped to rect
    assert(clip((-10, 40, 300, 40), (0, 0, 100, 100)) === ((0L, 40L, 100L, 40L)))
    // vertical through
    assert(clip((70, -5, 70, 500), (0, 0, 100, 100)) === ((70L, 0L, 70L, 100L)))
    // fully inside: endpoints unchanged
    assert(clip((10, 20, 90, 80), (0, 0, 100, 100)) === ((10L, 20L, 90L, 80L)))
    // touches a corner only: degenerate point at the corner
    assert(clip((100, 100, 200, 200), (0, 0, 100, 100)) === ((100L, 100L, 100L, 100L)))
    // non-integer entry floors: from (-3,-1) to (9,5), slope 1/2, enters
    // x=0 at exact y=0.5 -> floors to 0
    assert(clip((-3, -1, 9, 5), (0, 0, 100, 100)) === ((0L, 0L, 9L, 5L)))
  }

  test("seeded invariants: clipped endpoints in rect, inside segments unchanged, t-ordered") {
    var x = 0x9E3779B97F4A7C15L
    def nxt(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    val rect = (-5000L, -3000L, 7000L, 4000L)
    var checked = 0
    (1 to 2000).foreach { _ =>
      val x0 = nxt() % 20000; val y0 = nxt() % 20000
      val x1 = x0 + nxt() % 15000; val y1 = y0 + nxt() % 15000
      // only segments the cover would pair with this rect (bbox overlap +
      // line straddle) have a defined clip
      val bbox = math.max(x0, x1) >= rect._1 && math.min(x0, x1) <= rect._3 &&
        math.max(y0, y1) >= rect._2 && math.min(y0, y1) <= rect._4
      val dx = x1 - x0; val dy = y1 - y0
      def side(px: Long, py: Long) = BigInt(dx) * (py - y0) - BigInt(dy) * (px - x0)
      val sides = Seq(side(rect._1, rect._2), side(rect._3, rect._2),
        side(rect._1, rect._4), side(rect._3, rect._4))
      if (bbox && sides.min <= 0 && sides.max >= 0) {
        checked += 1
        val (cx0, cy0, cx1, cy1) = clip((x0, y0, x1, y1), rect)
        // within the rect (floor-quantization cannot escape it)
        Seq(cx0, cx1).foreach(c => assert(c >= rect._1 && c <= rect._3))
        Seq(cy0, cy1).foreach(c => assert(c >= rect._2 && c <= rect._4))
        // fully-inside segments come back unchanged
        val inside = x0 >= rect._1 && x0 <= rect._3 && x1 >= rect._1 && x1 <= rect._3 &&
          y0 >= rect._2 && y0 <= rect._4 && y1 >= rect._2 && y1 <= rect._4
        if (inside) assert((cx0, cy0, cx1, cy1) === ((x0, y0, x1, y1)))
        // entry precedes exit along the segment direction
        assert(BigInt(dx) * (cx1 - cx0) + BigInt(dy) * (cy1 - cy0) >= 0)
        // clipped points stay within 1 quantum of the supporting line:
        // |cross| <= |dx| + |dy| (exact point is on the line, each coord
        // moved < 1 by the floor)
        def crossOf(px: Long, py: Long) = (BigInt(dx) * (py - y0) - BigInt(dy) * (px - x0)).abs
        val tol = BigInt(math.abs(dx)) + BigInt(math.abs(dy))
        assert(crossOf(cx0, cy0) <= tol)
        assert(crossOf(cx1, cy1) <= tol)
      }
    }
    assert(checked > 200, s"seed produced too few in-cover segments: $checked")
  }
}
