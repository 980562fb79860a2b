package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpatialOps.waysCrossJoin geometry goldens: inclusive intersection
  * semantics, collinear handling, multi-cell dedup.
  */
class WaysCrossSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** (way_id, seq, x0, y0, x1, y1) rows -> DataFrame. */
  private def segs(rows: (Long, Long, Long, Long, Long, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("way_id", "seq", "x0", "y0", "x1", "y1")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    SpatialOps.waysCrossJoin(df, df, 8, 20000000L, selfJoin = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("proper crossing detected once despite shared cells") {
    // X shape at the origin; both segments touch the 4 cells around it
    val d = segs(
      (1L, 1L, -1000000L, -1000000L, 1000000L, 1000000L),
      (2L, 1L, -1000000L, 1000000L, 1000000L, -1000000L))
    assert(pairs(d) === Set((1L, 2L, 1L)))
  }

  test("endpoint touch counts (inclusive semantics)") {
    val d = segs(
      (1L, 1L, 0L, 0L, 1000000L, 0L),
      (2L, 1L, 1000000L, 0L, 2000000L, 900000L))
    assert(pairs(d) === Set((1L, 2L, 1L)))
  }

  test("T-touch (endpoint interior to the other segment) counts") {
    val d = segs(
      (1L, 1L, -1000000L, 0L, 1000000L, 0L),
      (2L, 1L, 0L, 0L, 0L, 900000L))
    assert(pairs(d) === Set((1L, 2L, 1L)))
  }

  test("collinear overlap counts; collinear disjoint does not") {
    val d = segs(
      (1L, 1L, 0L, 0L, 1000000L, 0L),
      (2L, 1L, 500000L, 0L, 1500000L, 0L),   // overlaps way 1
      (3L, 1L, 2000000L, 0L, 3000000L, 0L))  // same line, disjoint
    assert(pairs(d) === Set((1L, 2L, 1L)))
  }

  test("near-miss parallel segments do not count") {
    val d = segs(
      (1L, 1L, 0L, 0L, 1000000L, 0L),
      (2L, 1L, 0L, 1L, 1000000L, 1L))
    assert(pairs(d) === Set.empty[(Long, Long, Long)])
  }

  test("n_crossings counts distinct segment pairs") {
    // way 1: two parallel horizontal segments; way 2: one vertical segment
    // crossing both -> 2 crossings for the (1,2) pair
    val d = segs(
      (1L, 1L, -1000000L, 0L, 1000000L, 0L),
      (1L, 2L, -1000000L, 500000L, 1000000L, 500000L),
      (2L, 1L, 0L, -200000L, 0L, 700000L))
    assert(pairs(d) === Set((1L, 2L, 2L)))
  }

  test("span contract: over-long segments are dropped, not wrapped") {
    val d = segs(
      (1L, 1L, -30000000L, 0L, 30000000L, 0L), // 6e7 span > 2e7 contract
      (2L, 1L, 0L, -1000000L, 0L, 1000000L))
    assert(pairs(d) === Set.empty[(Long, Long, Long)])
  }

  test("A-vs-B mode keeps both orders out and never pairs a way with itself") {
    val a = segs((1L, 1L, -1000000L, -1000000L, 1000000L, 1000000L))
    val b = segs(
      (1L, 1L, -1000000L, -1000000L, 1000000L, 1000000L), // same id: excluded
      (9L, 1L, -1000000L, 1000000L, 1000000L, -1000000L))
    val got = SpatialOps.waysCrossJoin(a, b, 8, 20000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 9L, 1L)))
  }

  test("segIntersectionFix kernel: rational point, floor semantics, degenerate cases") {
    import graft.core.Planar.segIntersectionFix
    // X at the origin: exact integer point
    assert(segIntersectionFix(-10, -10, 10, 10, -10, 10, 10, -10).toSeq === Seq(0L, 0L))
    // non-integer rational: A = (0,0)-(3,3), B = (0,2)-(2,0) cross at (1, 1)
    assert(segIntersectionFix(0, 0, 3, 3, 0, 2, 2, 0).toSeq === Seq(1L, 1L))
    // floor (not truncation) on a negative rational: A = (-3,-3)-(0,0),
    // B = (-3,0)-(0,-3) cross at (-3/2, -3/2) -> floor = -2
    assert(segIntersectionFix(-3, -3, 0, 0, -3, 0, 0, -3).toSeq === Seq(-2L, -2L))
    // endpoint touch: t = 1 boundary included
    assert(segIntersectionFix(0, 0, 5, 0, 5, 0, 5, 9).toSeq === Seq(5L, 0L))
    // parallel / collinear-overlap / disjoint -> empty
    assert(segIntersectionFix(0, 0, 10, 0, 0, 5, 10, 5).isEmpty, "parallel")
    assert(segIntersectionFix(0, 0, 10, 0, 5, 0, 15, 0).isEmpty, "collinear overlap")
    assert(segIntersectionFix(0, 0, 10, 0, 20, 1, 30, 9).isEmpty, "disjoint (den != 0)")
    // world-magnitude coords stay exact (numerator ~ 1.4e24)
    val p = segIntersectionFix(1699999999L, 899999999L, 1700000001L, 900000001L,
      1699999999L, 900000001L, 1700000001L, 899999999L)
    assert(p.toSeq === Seq(1700000000L, 900000000L))
  }

  test("planarize emits the exact crossing point once despite shared cells") {
    // X shape centered at (500000, 250000): crossing at a rational point
    val d = segs(
      (1L, 1L, -1000000L, -1000000L, 2000000L, 1500000L),
      (2L, 1L, -1000000L, 1500000L, 2000000L, -1000000L))
    val got = SpatialOps.planarize(d, d, 8, 20000000L, selfJoin = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // intersection of y = (5x+5e6)/6 - ... : solve directly — lines
    // y = (5/6)(x + 1e6) - 1e6 and y = -(5/6)(x + 1e6) + 15e5 meet at
    // x = 5e5, y = 25e4
    assert(got === Set((1L, 1L, 2L, 1L, 500000L, 250000L)))
  }

  test("planarize excludes collinear overlap and matches brute force on a scatter") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val cx = rnd.nextInt(4000000) - 2000000
      val cy = rnd.nextInt(4000000) - 2000000
      (i.toLong, 1L, cx.toLong, cy.toLong,
        (cx + rnd.nextInt(3000000) - 1500000).toLong,
        (cy + rnd.nextInt(3000000) - 1500000).toLong)
    }
    val d = segs(rows: _*)
    val got = SpatialOps.planarize(d, d, 8, 20000000L, selfJoin = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val brute = (for {
      (wa, sa, ax0, ay0, ax1, ay1) <- rows
      (wb, sb, bx0, by0, bx1, by1) <- rows
      if wa < wb
      p = graft.core.Planar.segIntersectionFix(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
      if p.nonEmpty
    } yield (wa, sa, wb, sb, p(0), p(1))).toSet
    assert(got === brute)
    assert(got.nonEmpty, "scatter produced no crossings — test is vacuous")
  }
}
