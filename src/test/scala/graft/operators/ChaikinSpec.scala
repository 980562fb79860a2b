package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Chaikin smoothing: hand-computed cut points, FLOOR (not truncating)
  * division on negative coordinates, and the short-way pass-through.
  */
class ChaikinSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def run(xs: Seq[Long], ys: Seq[Long], rounds: Int): Seq[(Long, Long)] = {
    val s = spark; import s.implicits._
    SpatialOps.chaikinSmooth(
      Seq((1L, xs, ys)).toDF("way_id", "xs", "ys"), rounds)
      .orderBy("idx").collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
  }

  test("one round cuts each edge at exact quarter points") {
    assert(run(Seq(0L, 4L, 8L), Seq(0L, 8L, 0L), 1) ===
      Seq((0L, 0L), (1L, 2L), (3L, 6L), (5L, 6L), (7L, 2L), (8L, 0L)))
  }

  test("negative coordinates use floor division (not truncation)") {
    // (3*(-2) + (-1))/4 = -1.75 -> FLOOR -2 (truncation would give -1)
    assert(run(Seq(-2L, -1L), Seq(0L, 4L), 1) ===
      Seq((-2L, 0L), (-2L, 1L), (-2L, 3L), (-1L, 4L)))
  }

  test("single-point ways pass through unchanged") {
    assert(run(Seq(5L), Seq(7L), 2) === Seq((5L, 7L)))
  }
}
