package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpatialOps.splitAntimeridian vs a sequential splitter. */
class AntimeridianSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val E = 1800000000L

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

  private def refSplit(s: (Long, Long, Long, Long, Long)): Set[(Long, Long, Long, Long, Long, Long)] = {
    val (id, x1, y1, x2, y2) = s
    if (math.abs(x2 - x1) <= E) Set((id, 0L, x1, y1, x2, y2))
    else {
      val (ax, ay, bx, by) = if (x1 < x2) (x2, y2, x1, y1) else (x1, y1, x2, y2)
      val ys = ay + (by - ay) * (E - ax) / ((bx + 2 * E) - ax) // Java / truncates
      Set((id, 1L, ax, ay, E, ys), (id, 2L, -E, ys, bx, by))
    }
  }

  test("matches a sequential splitter; split latitude between endpoints") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(173)
    val segs = Seq.tabulate(500)(i => (i.toLong,
      rnd.nextLong() % E, rnd.nextLong() % 900000000L,
      rnd.nextLong() % E, rnd.nextLong() % 900000000L))
    val got = SpatialOps.splitAntimeridian(
        segs.toDF("seg_id", "x1", "y1", "x2", "y2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === segs.flatMap(refSplit).toSet)
    // every crossing pair shares the boundary latitude, inside the y-range
    got.groupBy(_._1).filter(_._2.exists(_._2 == 1L)).foreach { case (_, g) =>
      val p1 = g.find(_._2 == 1L).get; val p2 = g.find(_._2 == 2L).get
      assert(p1._5 == E && p2._3 == -E && p1._6 == p2._4)
      val (lo, hi) = (math.min(p1._4, p2._6), math.max(p1._4, p2._6))
      assert(p1._6 >= lo && p1._6 <= hi)
    }
  }

  test("exact boundary endpoints never split; 180.0001-degree jump does") {
    val s = spark; import s.implicits._
    val segs = Seq(
      (1L, -E, 0L, 0L, 100L),            // endpoint ON the boundary: 1.8e9 span
      (2L, E - 1, 0L, -E + 1, 1000000L)) // wrapped span 2 units: crosses
    val got = SpatialOps.splitAntimeridian(
        segs.toDF("seg_id", "x1", "y1", "x2", "y2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(got === List((1L, 0L), (2L, 1L), (2L, 2L)))
  }
}
