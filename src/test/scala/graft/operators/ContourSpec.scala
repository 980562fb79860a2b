package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Marching squares: the single-cell diamond, contour closure (every
  * endpoint meets exactly two segments), and the saddle convention.
  */
class ContourSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def segs(cells: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val s = spark; import s.implicits._
    SpatialOps.marchingSquares(cells.toDF("bx", "by"))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
  }

  test("a single occupied cell contours as a closed 4-segment diamond") {
    val got = segs(Seq((5L, 5L)))
    assert(got.size === 4)
    // closure: every endpoint is shared by exactly two segments
    val ends = got.flatMap(t => Seq((t._1, t._2), (t._3, t._4)))
    assert(ends.groupBy(identity).forall(_._2.size == 2),
      s"open contour: $got")
    // the diamond's vertices are the four edge midpoints around the
    // sample, which sits at (10, 10) in doubled coordinates
    assert(ends.toSet === Set((10L, 9L), (11L, 10L), (10L, 11L), (9L, 10L)))
  }

  test("contours around any mask are closed (checkerboard incl. saddles)") {
    val cells = for (x <- 0L until 6L; y <- 0L until 6L
                     if (x + y) % 2 == 0) yield (x, y)
    val got = segs(cells)
    val ends = got.flatMap(t => Seq((t._1, t._2), (t._3, t._4)))
    assert(ends.groupBy(identity).forall(_._2.size == 2),
      "saddle convention must keep contours closed")
  }
}
