package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Raster dilation: neighborhood stamp, core flag, and grid-edge clipping. */
class DilateSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("interior cell stamps its full square; corner cell clips; cores flagged") {
    val s = spark; import s.implicits._
    val cells = Seq((10L, 10L), (0L, 0L)).toDF("bx", "by")
    val got = SpatialOps.dilateRaster(cells, radius = 1, level = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    val interior = (for (dx <- -1 to 1; dy <- -1 to 1)
      yield (10L + dx, 10L + dy)).toSet
    val corner = Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
    assert(got.keySet === interior ++ corner)
    assert(got.filter(_._2).keySet === Set((10L, 10L), (0L, 0L)),
      "exactly the occupied cells carry core = true")
  }

  test("erosion keeps exactly the interior of a solid block") {
    val s = spark; import s.implicits._
    // solid 5x5 block at (8..12, 8..12): radius-1 erosion -> 3x3 core
    val block = (for (x <- 8L to 12L; y <- 8L to 12L) yield (x, y))
      .toDF("bx", "by")
    val got = SpatialOps.erodeRaster(block, radius = 1, level = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (x <- 9L to 11L; y <- 9L to 11L) yield (x, y)).toSet
    assert(got === want)
    // opening (erode then dilate) of a solid block is the block itself
    val opened = SpatialOps.dilateRaster(
      SpatialOps.erodeRaster(block, 1, 5)
        .withColumnRenamed("cell_x", "bx").withColumnRenamed("cell_y", "by"),
      1, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(opened === (for (x <- 8L to 12L; y <- 8L to 12L)
      yield (x, y)).toSet, "opening must restore the solid block")
  }

  test("scale-posture plans: dilate/erode one exchange, no join; zonal equi-joins only") {
    val s = spark; import s.implicits._
    val cells = (for (x <- 0L until 20L; y <- 0L until 20L) yield (x, y))
      .toDF("bx", "by")
    for ((name, p) <- Seq(
        "dilate" -> SpatialOps.dilateRaster(cells, 2, 7),
        "erode" -> SpatialOps.erodeRaster(cells, 2, 7))) {
      val t = p.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(t).size === 1, s"$name plan:\n$t")
      assert(!t.contains("Join"), s"$name must not join:\n$t")
    }
    val polys = graft.sources.Synth.hexCorpus(spark, 5)
    val pts = (0L until 100L).map(i =>
      (i, i * 36000000L - 1800000000L, i * 17000000L - 850000000L))
      .toDF("pid", "lon_fix", "lat_fix")
    val zt = SpatialOps.zonalStats(polys, pts, 7)
      .queryExecution.executedPlan.toString
    assert(!zt.contains("CartesianProduct") &&
      !zt.contains("BroadcastNestedLoop"), s"zonal plan:\n$zt")
  }
}
