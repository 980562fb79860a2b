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
}
