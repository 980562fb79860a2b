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
}
