package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpatialOps.snapToWays distance-branch goldens (endpoint vs interior
  * projection, inclusive boundary, zero-length segments, cell dedup).
  */
class SnapSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def pts(rows: (Long, Long, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("pid", "x", "y")
  }
  private def segs(rows: (Long, Long, Long, Long, Long, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("way_id", "seq", "x0", "y0", "x1", "y1")
  }

  private def snap(p: DataFrame, sg: DataFrame, r: Long): Set[(Long, Long, Long)] =
    SpatialOps.snapToWays(p, sg, r, 8, 20000000L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  private lazy val horiz = segs((1L, 1L, 0L, 0L, 1000000L, 0L))

  test("interior projection: perpendicular distance, inclusive at r") {
    val p = pts((1L, 500000L, 999L), (2L, 500000L, 1000L), (3L, 500000L, 1001L))
    assert(snap(p, horiz, 1000L) ===
      Set((1L, 1L, 1L), (2L, 1L, 1L)))
  }

  test("endpoint branch: distance past the end is euclidean to the endpoint") {
    // (1000600, 800): beyond x1 by 600, offset 800 -> dist 1000 (inclusive);
    // (1000601, 800) -> sqrt(601^2+800^2) > 1000
    val p = pts((1L, 1000600L, 800L), (2L, 1000601L, 800L))
    assert(snap(p, horiz, 1000L) === Set((1L, 1L, 1L)))
  }

  test("zero-length segment degrades to point distance") {
    val d = segs((7L, 1L, 5000L, 5000L, 5000L, 5000L))
    val p = pts((1L, 5600L, 5800L), (2L, 5601L, 5800L))
    assert(snap(p, d, 1000L) === Set((1L, 7L, 1L)))
  }

  test("n_segs counts distinct in-range segments of the way") {
    val d = segs(
      (1L, 1L, 0L, 0L, 1000000L, 0L),
      (1L, 2L, 0L, 500L, 1000000L, 500L),
      (1L, 3L, 0L, 900000L, 1000000L, 900000L))
    val p = pts((1L, 500000L, 250L))
    assert(snap(p, d, 1000L) === Set((1L, 1L, 2L)))
  }

  test("cell-boundary hit is found once (expanded cover + distinct)") {
    // a segment and point straddling cell boundaries at level 8
    // (cell width 14,062,500 fix in x): place near the boundary
    val d = segs((1L, 1L, 14060000L, 0L, 14070000L, 0L))
    val p = pts((1L, 14062500L, 900L))
    assert(snap(p, d, 1000L) === Set((1L, 1L, 1L)))
  }

  test("matches a brute-force distance check on seeded random data") {
    val rnd = new scala.util.Random(99)
    val sgRows = (1 to 60).map { i =>
      val bx = rnd.between(-50000000L, 50000000L)
      val by = rnd.between(-50000000L, 50000000L)
      (i.toLong, 1L, bx, by,
        bx + rnd.between(-2000000L, 2000001L), by + rnd.between(-2000000L, 2000001L))
    }
    val pRows = (1 to 200).map { i =>
      (i.toLong, rnd.between(-52000000L, 52000000L), rnd.between(-52000000L, 52000000L))
    }
    val r = 800000L
    val got = snap(pts(pRows: _*), segs(sgRows: _*), r)
    // brute force oracle
    def d2seg(px: Long, py: Long, s: (Long, Long, Long, Long, Long, Long)): BigInt = {
      val (_, _, x0, y0, x1, y1) = s
      val dx = x1 - x0; val dy = y1 - y0
      val dt = BigInt(px - x0) * dx + BigInt(py - y0) * dy
      val len2 = BigInt(dx) * dx + BigInt(dy) * dy
      if (dt.signum <= 0 || len2 == 0)
        BigInt(px - x0) * (px - x0) + BigInt(py - y0) * (py - y0)
      else if (dt >= len2)
        BigInt(px - x1) * (px - x1) + BigInt(py - y1) * (py - y1)
      else {
        // compare cross^2/len2 against nothing here; return scaled value
        // via ceil-free rational: flag in-range directly below instead
        val cross = BigInt(dx) * (py - y0) - BigInt(dy) * (px - x0)
        // encode "cross^2 <= r^2 len2" as a distance proxy: use -1/+1
        if (cross * cross <= BigInt(r) * r * len2) BigInt(-1) else BigInt(Long.MaxValue)
      }
    }
    val want = (for {
      (pid, px, py) <- pRows
      s <- sgRows
      d2 = d2seg(px, py, s)
      if d2 == BigInt(-1) || (d2 != BigInt(Long.MaxValue) && d2 <= BigInt(r) * r)
    } yield (pid, s._1)).groupBy(identity).map { case ((pid, w), g) =>
      (pid, w, g.size.toLong)
    }.toSet
    assert(got === want)
  }
}
