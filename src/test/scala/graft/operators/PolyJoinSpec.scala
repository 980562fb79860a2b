package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Planar
import graft.sources.Synth

/** Polygon-polygon overlay join: exact separating-axis kernel goldens and
  * the distributed anchor-cell join against two independent expectations
  * (kernel brute force AND the homothetic-hexagon Minkowski closed form).
  */
class PolyJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // unit square CCW, translated/scaled
  private def square(cx: Long, cy: Long, half: Long): (Array[Long], Array[Long]) =
    (Array(cx + half, cx + half, cx - half, cx - half),
     Array(cy - half, cy + half, cy + half, cy - half))

  private def hits(a: (Array[Long], Array[Long]), b: (Array[Long], Array[Long])): Boolean =
    Planar.convexIntersects(a._1, a._2, b._1, b._2)

  test("convexIntersects: disjoint / overlap / touch / containment goldens") {
    val base = square(0, 0, 10)
    assert(!hits(base, square(25, 0, 10)), "gap on x axis")
    assert(!hits(base, square(25, 25, 10)), "diagonal gap (vertex-vertex axis)")
    assert(hits(base, square(15, 0, 10)), "overlapping")
    assert(hits(base, square(20, 0, 10)), "edge contact (closed semantics)")
    assert(hits(base, square(20, 20, 10)), "single-vertex contact (closed)")
    assert(hits(base, square(2, 1, 3)), "B inside A (no separating edge)")
    assert(hits(square(2, 1, 3), base), "A inside B (argument order)")
    assert(hits(base, base), "identical")
    // triangle vs square: mixed vertex counts, strict separation just past touch
    val tri = (Array(11L, 21L, 11L), Array(0L, 0L, 10L))
    assert(!hits(base, tri), "triangle 1 unit past the edge")
    val triTouch = (Array(10L, 20L, 10L), Array(0L, 0L, 10L))
    assert(hits(base, triTouch), "triangle edge on the square edge")
  }

  test("polyIntersectJoin matches kernel brute force AND the Minkowski closed form") {
    val n = 2000 // the corpus's lattice structure yields zero pairs below ~delta 3101·Δ
    val a = Synth.hexCorpus(spark, n)
    val b = Synth.hexCorpus(spark, n, n.toLong)
    val res = SpatialOps.polyIntersectJoin(a, b)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ah = a.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray))
    val bh = b.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray))
    // bbox prefilter (disjoint bboxes => disjoint polygons) keeps the 4M-pair
    // brute force off the BigInt kernel's hot path
    val brute = (for {
      (ai, axs, ays) <- ah
      (bi, bxs, bys) <- bh
      if axs.min <= bxs.max && axs.max >= bxs.min &&
         ays.min <= bys.max && ays.max >= bys.min
      if Planar.convexIntersects(axs, ays, bxs, bys)
    } yield (ai, bi)).toSet
    assert(got === brute)
    assert(got.nonEmpty, "corpus produced no intersecting pairs — test is vacuous")

    // independent expectation: the hexagons are exact homothets, so
    // A ∩ B ≠ ∅ ⟺ center delta in the Minkowski sum hexagon
    def params(id: Long): (Long, Long, Long, Long) = {
      val cx = (id * 2654435761L) % 3400000000L - 1700000000L
      val cy = (id * 2246822519L) % 1100000000L - 550000000L
      val m = id % 13
      (cx, cy, 2000000L + m * 500000L, 1732000L + m * 433000L)
    }
    val mink = (for {
      ai <- (0L until n.toLong).iterator; bi <- (n.toLong until 2L * n).iterator
      (acx, acy, ar, as_) = params(ai)
      (bcx, bcy, br, bs) = params(bi)
      dx = bcx - acx; dy = bcy - acy; rr = ar + br; ss = as_ + bs
      if math.abs(dy) <= ss &&
        math.abs(2 * ss * dx + rr * dy) <= 2 * ss * rr &&
        math.abs(2 * ss * dx - rr * dy) <= 2 * ss * rr
    } yield (ai, bi)).toSet
    assert(got === mink)
  }

  test("segIntersectsRing: endpoint / crossing / touch / miss goldens") {
    val (sqx, sqy) = square(0, 0, 10)
    def seg(x0: Long, y0: Long, x1: Long, y1: Long): Boolean =
      Planar.segIntersectsRing(x0, y0, x1, y1, sqx, sqy)
    assert(seg(0, 0, 2, 2), "fully inside")
    assert(seg(-20, 0, 20, 0), "through-and-through (both endpoints outside)")
    assert(seg(5, 5, 30, 5), "one endpoint inside")
    assert(seg(10, -30, 10, 30), "collinear along the boundary edge")
    assert(seg(0, 20, 20, 0), "diagonal touching the corner (10,10)")
    assert(!seg(1, 20, 21, 0), "diagonal just past the corner")
    assert(!seg(12, 0, 30, 0), "pointing at the square but stopping short")
    assert(seg(10, 0, 30, 0), "endpoint exactly on the boundary")
    assert(!seg(0, 20, 5, 25), "disjoint above")
  }

  test("wayPolyJoin matches kernel brute force on a scattered segment corpus") {
    val s = spark; import s.implicits._
    val nHex = 400
    val polys = Synth.hexCorpus(spark, nHex)
    // deterministic scatter: anchor near hexagon (i % nHex)'s center so a
    // healthy fraction of segments actually reach a polygon
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def hexCenter(id: Long): (Long, Long) =
      ((id * 2654435761L) % 3400000000L - 1700000000L,
       (id * 2246822519L) % 1100000000L - 550000000L)
    val segRows = (0L until 2000L).map { i =>
      val (cx, cy) = hexCenter((i / 4) % nHex) // all 4 segments of a way share the anchor
      val x0 = cx + math.floorMod(mix(4 * i), 40000000L) - 20000000L
      val y0 = cy + math.floorMod(mix(4 * i + 1), 30000000L) - 15000000L
      val x1 = x0 + math.floorMod(mix(4 * i + 2), 20000000L) - 10000000L
      val y1 = y0 + math.floorMod(mix(4 * i + 3), 20000000L) - 10000000L
      (i / 4, i % 4, x0, y0, x1, y1) // 4 segments per way
    }
    val segs = segRows.toDF("way_id", "seq", "x0", "y0", "x1", "y1")
    val got = SpatialOps.wayPolyJoin(segs, polys, 8, 20000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hexes = polys.collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray))
    val expect = (for {
      (wid, _, x0, y0, x1, y1) <- segRows
      (pid, xs, ys) <- hexes
      if math.min(x0, x1) <= xs.max && math.max(x0, x1) >= xs.min &&
         math.min(y0, y1) <= ys.max && math.max(y0, y1) >= ys.min
      if Planar.segIntersectsRing(x0, y0, x1, y1, xs, ys)
    } yield (wid, pid)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expect)
    assert(got.nonEmpty, "no way touched any polygon — test is vacuous")
    assert(got.values.exists(_ > 1), "no way with multiple hit segments — dedup untested")
  }

  test("dissolve matches a driver-side union-find over the Minkowski edge set") {
    val n = 3500 // smallest corpus whose id lattice self-overlaps (first pairs at ~3200)
    val polys = Synth.hexCorpus(spark, n)
    val got = SpatialOps.dissolve(polys).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap

    // independent expectation: Minkowski closed form for edges, classic
    // union-find for components, closed-form area/bbox for the rollup
    def params(id: Long): (Long, Long, Long, Long, Long) = {
      val cx = (id * 2654435761L) % 3400000000L - 1700000000L
      val cy = (id * 2246822519L) % 1100000000L - 550000000L
      val m = id % 13
      (cx, cy, 2000000L + m * 500000L, 1000000L + m * 250000L,
        1732000L + m * 433000L)
    }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (a <- 0 until n; b <- a + 1 until n) {
      val (acx, acy, ar, _, as_) = params(a)
      val (bcx, bcy, br, _, bs) = params(b)
      val dx = bcx - acx; val dy = bcy - acy
      val rr = ar + br; val ss = as_ + bs
      if (math.abs(dy) <= ss &&
          math.abs(2 * ss * dx + rr * dy) <= 2 * ss * rr &&
          math.abs(2 * ss * dx - rr * dy) <= 2 * ss * rr) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expect = (0 until n).groupBy(find).map { case (root, ids) =>
      val rows = ids.map { i =>
        val (cx, cy, r, h, s) = params(i.toLong)
        (4 * s * (r + h), cx - r, cy - s, cx + r, cy + s)
      }
      root.toLong -> ((ids.size.toLong, rows.map(_._1).sum,
        rows.map(_._2).min, rows.map(_._3).min,
        rows.map(_._4).max, rows.map(_._5).max))
    }
    assert(got === expect)
    assert(expect.values.exists(_._1 > 1), "no merged component — test is vacuous")
  }

  test("polyIntersectJoin scale posture: shuffle join, no broadcast, no cartesian") {
    val res = SpatialOps.polyIntersectJoin(
      Synth.hexCorpus(spark, 500), Synth.hexCorpus(spark, 500, 500L))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(25).mkString("\n"))
    assert(!plan.contains("BroadcastHashJoin"), "polygon corpus must not be broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "overlay join must stay an equi-join on the cover cell")
  }
}
