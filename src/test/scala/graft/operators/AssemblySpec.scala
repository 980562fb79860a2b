package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AssemblyOps.{Area, MemberWay}

/** Pure unit tests of the per-relation assembly kernel (no Spark).
  * Semantics mirror reference/include/osmium/multipolygon/builder.hpp —
  * greedy ring growth with inversion, containment-parity inner/outer,
  * outer-CW/inner-CCW final orientation, area-id scheme (osm/area.hpp:71-84).
  */
class AssemblySpec extends AnyFunSuite {

  // node refs derived from positions (consistent ids for equal positions),
  // so ref-based ring matching behaves like the fixtures' shared node ids
  private def refsOf(pts: Seq[(Long, Long)]): Array[Long] =
    pts.map(p => p._1 * 1000003L + p._2 + 7L).toArray

  private def mw(rel: Long, pos: Int, way: Long, pts: (Long, Long)*): MemberWay =
    MemberWay(rel, pos, way, refsOf(pts),
      pts.map(_._1).toArray, pts.map(_._2).toArray, Map.empty, Map.empty)

  private def mwT(rel: Long, pos: Int, way: Long, tags: Map[String, String],
                  relTags: Map[String, String], pts: (Long, Long)*): MemberWay =
    MemberWay(rel, pos, way, refsOf(pts),
      pts.map(_._1).toArray, pts.map(_._2).toArray, tags, relTags)

  test("two open ways close into one outer ring; area id = 2*rel + sgn") {
    val ways = Array(
      mw(7, 0, 70, (0, 0), (10, 0), (10, 10)),
      mw(7, 1, 71, (10, 10), (0, 10), (0, 0)))
    val out = AssemblyOps.assembleOne(7, ways).toArray
    assert(out.length === 1)
    val a = out.head
    assert(a.areaId === 15)
    assert(a.origId === 7)
    assert(!a.fromWay)
    assert(a.status === "ok")
    assert(a.nOuter === 1 && a.nInner === 0)
    // outer ring CW (CCW build order reversed); C++ %.10g prints 1e-06
    assert(a.wkt === "MULTIPOLYGON(((0 1e-06,1e-06 1e-06,1e-06 0,0 0,0 1e-06)))")
  }

  test("reversed member way is inverted during ring growth") {
    val ways = Array(
      mw(1, 0, 10, (0, 0), (10, 0), (10, 10)),
      mw(1, 1, 11, (0, 0), (0, 10), (10, 10))) // same ring, reversed direction
    val out = AssemblyOps.assembleOne(1, ways).toArray
    assert(out.head.status === "ok")
    assert(out.head.nOuter === 1)
  }

  test("closed inner way becomes a hole (containment parity)") {
    val ways = Array(
      mw(3, 0, 30, (0, 0), (100, 0), (100, 100)),
      mw(3, 1, 31, (100, 100), (0, 100), (0, 0)),
      mw(3, 2, 32, (40, 40), (60, 40), (60, 60), (40, 60), (40, 40)))
    val a = AssemblyOps.assembleOne(3, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 1 && a.nInner === 1)
  }

  test("two disjoint outer rings -> one area, two polygons") {
    val ways = Array(
      mw(4, 0, 40, (0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
      mw(4, 1, 41, (100, 100), (110, 100), (110, 110), (100, 110), (100, 100)))
    val a = AssemblyOps.assembleOne(4, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 2 && a.nInner === 0)
    assert(a.wkt.startsWith("MULTIPOLYGON((("))
    assert(a.wkt.contains(")),((")) // two polygons
  }

  test("dangling ends without repair -> error row, no area") {
    val ways = Array(mw(5, 0, 50, (0, 0), (10, 0), (10, 10)))
    val a = AssemblyOps.assembleOne(5, ways, attemptRepair = false).toArray.head
    assert(a.status === "DanglingEnds")
    assert(a.wkt === null)
  }

  test("dangling ends WITH repair: pseudo-way closes the gap (builder.hpp:550-637)") {
    val ways = Array(mw(5, 0, 50, (0, 0), (10, 0), (10, 10)))
    val a = AssemblyOps.assembleOne(5, ways, attemptRepair = true).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 1)
    assert(a.wkt != null) // triangle closed by the repair segment
  }

  test("repair pairs closest dangling ends across two broken rings") {
    // two C-shaped open ways far apart; each repairs to its own ring,
    // not to the other's ends (closest-pair semantics)
    val ways = Array(
      mw(9, 0, 90, (0, 0), (10, 0), (10, 10), (0, 10)),
      mw(9, 1, 91, (1000, 1000), (1010, 1000), (1010, 1010), (1000, 1010)))
    val a = AssemblyOps.assembleOne(9, ways, attemptRepair = true).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 2)
  }

  test("tag logic: untagged relation inherits single outer way's tags") {
    val ways = Array(mwT(10, 0, 100, Map("landuse" -> "meadow"),
      Map("type" -> "multipolygon"),
      (0, 0), (10, 0), (10, 10), (0, 10), (0, 0)))
    val a = AssemblyOps.assembleOne(10, ways).toArray.head
    assert(a.status === "ok")
    assert(a.tags("landuse") === "meadow")
    assert(a.tags("type") === "multipolygon") // ignore-keys untouched
  }

  test("tag logic: tagged relation with multi-way outer keeps its own tags") {
    val rel = Map("type" -> "multipolygon", "landuse" -> "forest")
    val ways = Array(
      mwT(11, 0, 110, Map.empty, rel, (0, 0), (10, 0), (10, 10)),
      mwT(11, 1, 111, Map("landuse" -> "meadow"), rel, (10, 10), (0, 10), (0, 0)))
    val a = AssemblyOps.assembleOne(11, ways).toArray.head
    assert(a.tags("landuse") === "forest")
  }

  test("tagged one-way inner ring emits an extra area (builder.hpp:758-780)") {
    val rel = Map("type" -> "multipolygon", "landuse" -> "forest")
    val ways = Array(
      mwT(12, 0, 120, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mwT(12, 1, 121, Map("natural" -> "water"), rel,
        (40, 40), (60, 40), (60, 60), (40, 60), (40, 40)))
    val out = AssemblyOps.assembleOne(12, ways).toArray
    assert(out.length === 2)
    val extra = out.find(_.fromWay).get
    assert(extra.areaId === 242) // way 121 * 2
    assert(extra.tags === Map("natural" -> "water"))
    val main = out.find(!_.fromWay).get
    assert(main.nInner === 1)
  }

  test("one-way inner ring with same tags as area emits NO extra area") {
    val rel = Map("type" -> "multipolygon", "natural" -> "water")
    val ways = Array(
      mwT(13, 0, 130, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mwT(13, 1, 131, Map("natural" -> "water"), rel,
        (40, 40), (60, 40), (60, 60), (40, 60), (40, 40)))
    val out = AssemblyOps.assembleOne(13, ways).toArray
    assert(out.length === 1)
  }

  test("un-salvageable self-intersecting ring is dropped -> NoRings") {
    // bow-tie: 0,0 -> 10,10 -> 10,0 -> 0,10 -> 0,0 (builder ring_is_complete
    // returns no RingInfo; a relation with no surviving rings errors)
    val ways = Array(mw(6, 0, 60, (0, 0), (10, 10), (10, 0), (0, 10), (0, 0)))
    assert(AssemblyOps.assembleOne(6, ways, attemptRepair = false)
      .toArray.head.status === "NoRings")
    assert(AssemblyOps.assembleOne(6, ways, attemptRepair = true)
      .toArray.head.status === "NoRings")
  }

  test("pinched ring salvaged by the binary-search cut (builder.hpp:342-422)") {
    // 11-point closed ring where index 3 == index 7 (the comment's example:
    // a loop hanging off the main ring); repair cuts out the loop
    val pts = Seq[(Long, Long)](
      (0, 0), (10, 0), (20, 0), (20, 10), (30, 10), (30, 20), (20, 20),
      (20, 10), (10, 20), (0, 20), (0, 0))
    val ways = Array(mw(14, 0, 140, pts: _*))
    assert(AssemblyOps.assembleOne(14, ways, attemptRepair = false)
      .toArray.head.status === "NoRings")
    val repaired = AssemblyOps.assembleOne(14, ways, attemptRepair = true).toArray.head
    assert(repaired.status === "ok")
    assert(repaired.nOuter === 1)
    assert(repaired.wkt != null)
  }

  test("nested ring parity: ring inside a hole is an outer ring again") {
    val ways = Array(
      mw(8, 0, 80, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mw(8, 1, 81, (20, 20), (80, 20), (80, 80), (20, 80), (20, 20)),
      mw(8, 2, 82, (40, 40), (60, 40), (60, 60), (40, 60), (40, 40)))
    val a = AssemblyOps.assembleOne(8, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 2 && a.nInner === 1)
  }

  test("hole escaping the outer ring -> polygon invalid -> InvalidRing") {
    val rel = Map("type" -> "multipolygon")
    val ways = Array(
      mwT(16, 0, 160, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      // "hole" sticking out of the outer ring's right edge
      mwT(16, 1, 161, Map.empty, rel, (80, 40), (120, 40), (120, 60), (80, 60), (80, 40)))
    val a = AssemblyOps.assembleOne(16, ways).toArray
    // parity: the half-outside ring's first vertex (80,40) is inside the
    // square -> classified inner -> escapes -> invalid polygon
    assert(a.head.status === "InvalidRing")
  }

  test("hole touching the outer boundary at a point stays valid") {
    val rel = Map("type" -> "multipolygon")
    val ways = Array(
      mwT(17, 0, 170, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mwT(17, 1, 171, Map.empty, rel, (0, 50), (40, 30), (40, 70), (0, 50)))
    val a = AssemblyOps.assembleOne(17, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nInner === 1)
  }

  test("touching inner rings sharing an edge merge into one hole (builder.hpp:804-866)") {
    val ways = Array(
      mw(20, 0, 200, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mw(20, 1, 201, (20, 20), (40, 20), (40, 40), (20, 40), (20, 20)),
      mw(20, 2, 202, (40, 20), (60, 20), (60, 40), (40, 40), (40, 20)))
    val a = AssemblyOps.assembleOne(20, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 1 && a.nInner === 1) // the two holes merged
    // merged hole = union outline: x spans 20..60 in the WKT
    assert(a.wkt.contains("6e-06"))
  }

  test("inner rings sharing only a corner point stay separate holes") {
    val ways = Array(
      mw(21, 0, 210, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mw(21, 1, 211, (20, 20), (40, 20), (40, 40), (20, 40), (20, 20)),
      mw(21, 2, 212, (40, 40), (60, 40), (60, 60), (40, 60), (40, 40)))
    val a = AssemblyOps.assembleOne(21, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 1 && a.nInner === 2) // point touch: GEOS (MULTI)POINT, no merge
  }

  test("a chain of three edge-touching inner rings merges fully (recursive restart)") {
    val ways = Array(
      mw(22, 0, 220, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mw(22, 1, 221, (20, 20), (40, 20), (40, 40), (20, 40), (20, 20)),
      mw(22, 2, 222, (40, 20), (60, 20), (60, 40), (40, 40), (40, 20)),
      mw(22, 3, 223, (60, 20), (80, 20), (80, 40), (60, 40), (60, 20)))
    val a = AssemblyOps.assembleOne(22, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nOuter === 1 && a.nInner === 1)
  }

  test("hole touching the outer boundary at TWO points disconnects the interior -> InvalidRing") {
    val rel = Map("type" -> "multipolygon")
    val ways = Array(
      mwT(23, 0, 230, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      // hole spanning the square, vertices on both the left and right edges
      mwT(23, 1, 231, Map.empty, rel, (0, 50), (50, 30), (100, 50), (50, 70), (0, 50)))
    assert(AssemblyOps.assembleOne(23, ways).toArray.head.status === "InvalidRing")
  }

  test("holes and shell all meeting at ONE point keep a connected interior") {
    val rel = Map("type" -> "multipolygon")
    val ways = Array(
      mwT(24, 0, 240, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      mwT(24, 1, 241, Map.empty, rel, (50, 50), (30, 40), (30, 60), (50, 50)),
      mwT(24, 2, 242, Map.empty, rel, (50, 50), (70, 40), (70, 60), (50, 50)))
    val a = AssemblyOps.assembleOne(24, ways).toArray.head
    assert(a.status === "ok")
    assert(a.nInner === 2)
  }

  test("chain of point-touching holes closing on the shell -> disconnected -> InvalidRing") {
    val rel = Map("type" -> "multipolygon")
    val ways = Array(
      mwT(25, 0, 250, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      // hole A touches the left edge and hole B; hole B touches the right edge
      mwT(25, 1, 251, Map.empty, rel, (0, 50), (50, 30), (50, 50), (0, 50)),
      mwT(25, 2, 252, Map.empty, rel, (50, 50), (100, 50), (50, 70), (50, 50)))
    assert(AssemblyOps.assembleOne(25, ways).toArray.head.status === "InvalidRing")
  }

  test("hole edge collinear-overlapping the shell edge -> InvalidRing") {
    val rel = Map("type" -> "multipolygon")
    val ways = Array(
      mwT(26, 0, 260, Map.empty, rel, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      // hole's left edge lies along a stretch of the shell's left edge
      mwT(26, 1, 261, Map.empty, rel, (0, 40), (30, 40), (30, 60), (0, 60), (0, 40)))
    assert(AssemblyOps.assembleOne(26, ways).toArray.head.status === "InvalidRing")
  }

  test("area timestamp bumps to the newest member way (builder.hpp:652-655)") {
    val ways = Array(
      mw(15, 0, 150, (0, 0), (10, 0), (10, 10)).copy(tsMicros = 100L, relTsMicros = 50L),
      mw(15, 1, 151, (10, 10), (0, 10), (0, 0)).copy(tsMicros = 300L, relTsMicros = 50L))
    val a = AssemblyOps.assembleOne(15, ways).toArray.head
    assert(a.tsMicros === 300L)
    // relation newer than all members: keeps the relation's timestamp
    val ways2 = ways.map(w => w.copy(relTsMicros = 999L))
    assert(AssemblyOps.assembleOne(15, ways2).toArray.head.tsMicros === 999L)
  }

  test("property: random split/reverse/shuffle of a polygon+hole round-trips through assembly") {
    // seeded loops (no scalacheck bridge in the offline cache): random
    // convex-ish lattice polygons with one hole, outer ring split into
    // 2..4 ways at random cut points, ways randomly reversed, member
    // order shuffled — assembleOne must reconstruct one ok area with one
    // hole and the exact outer vertex set
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      val w = 20 + rnd.nextInt(60); val h = 20 + rnd.nextInt(60)
      val ox = 5 * (rnd.nextInt(20) - 10); val oy = 5 * (rnd.nextInt(20) - 10)
      // outer ring: rectangle with an extra collinear-free notch vertex
      val outer = Seq[(Long, Long)](
        (ox, oy), (ox + w, oy), (ox + w, oy + h / 2 + 1 + rnd.nextInt(3)),
        (ox + w, oy + h), (ox, oy + h)).distinct
      val closed = outer :+ outer.head
      // split into 2..4 consecutive runs (each at least one edge)
      val nCuts = 2 + rnd.nextInt(math.min(3, closed.length - 2))
      val cutPoints = (rnd.shuffle((1 until closed.length - 1).toList).take(nCuts - 1)).sorted
      val bounds = (0 +: cutPoints) :+ (closed.length - 1)
      var ways = bounds.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
        val pts = closed.slice(a, b + 1)
        (i, if (rnd.nextBoolean()) pts.reverse else pts)
      }.toSeq
      ways = rnd.shuffle(ways)
      // hole strictly inside
      val q = 4
      val hole = Seq[(Long, Long)](
        (ox + q, oy + q), (ox + q + 6, oy + q), (ox + q + 6, oy + q + 6), (ox + q, oy + q + 6),
        (ox + q, oy + q))
      val rel = 1000L + trial
      val memberWays = ways.zipWithIndex.map { case ((wid, pts), pos) =>
        mw(rel, pos, 100L * rel + wid, pts: _*)
      } :+ mw(rel, 99, 100L * rel + 99, hole: _*)
      val out = AssemblyOps.assembleOne(rel, memberWays.toArray).toArray
      assert(out.length === 1, s"trial $trial: ${out.mkString}")
      val a = out.head
      assert(a.status === "ok", s"trial $trial: $a ways=$ways")
      assert(a.nOuter === 1 && a.nInner === 1, s"trial $trial")
      // outer vertex set survives (WKT contains every outer vertex coord)
      outer.foreach { case (x, y) =>
        val fx = graft.core.Wkt.fmtG(x / 1e7)
        assert(a.wkt.contains(fx), s"trial $trial missing x=$x ($fx) in ${a.wkt}")
      }
    }
  }

  test("negative relation id keeps the id bijection") {
    val ways = Array(mw(-3, 0, 90, (0, 0), (10, 0), (10, 10), (0, 10), (0, 0)))
    val a = AssemblyOps.assembleOne(-3, ways).toArray.head
    assert(a.areaId === -7) // -3*2 + sgn(-3)
    assert(a.origId === -3)
  }
}
