package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Zonal statistics: hand-placed points against a polygon whose
  * level-3 raster footprint is a single known cell.
  */
class ZonalSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("per-zone cell count / total / max over a known footprint") {
    val s = spark; import s.implicits._
    // level-3 grid (8x8 over the world): cell (4,4) spans lon [0, 45°),
    // lat [0, 22.5°) with center (22.5°, 11.25°). The square below
    // contains ONLY that cell's center.
    val sq = Seq((7L,
      Seq(0L, 450000000L, 450000000L, 0L),
      Seq(0L, 0L, 225000000L, 225000000L))).toDF("poly_id", "xs", "ys")
    // 3 points inside cell (4,4), 2 points in cell (0,0) (outside zone)
    val pts = Seq(
      (1L, 100000000L, 100000000L), (2L, 200000000L, 50000000L),
      (3L, 300000000L, 150000000L),
      (4L, -1700000000L, -800000000L), (5L, -1750000000L, -850000000L))
      .toDF("pid", "lon_fix", "lat_fix")
    val cells = SpatialOps.rasterizePolygons(sq, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(cells === Set((4L, 4L)), s"zone footprint: $cells")
    val got = SpatialOps.zonalStats(sq, pts, 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(7L -> (1L, 3L, 3L)))
  }
}
