package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpatialOps.lineOfSight vs a sequential DDA walk. */
class VisibilitySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def refLos(occ: Set[(Long, Long)],
                     p: (Long, Long, Long, Long, Long)): Long = {
    val (_, x0, y0, x1, y1) = p
    val n = math.max(math.abs(x1 - x0), math.abs(y1 - y0))
    (1L until n).count { t =>
      val cx = Math.floorDiv(2 * n * x0 + 2 * (x1 - x0) * t + n, 2 * n)
      val cy = Math.floorDiv(2 * n * y0 + 2 * (y1 - y0) * t + n, 2 * n)
      occ((cx, cy))
    }
  }

  test("matches a sequential DDA walk in all octants") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(67)
    val occ = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toSet
    // pairs covering all 8 octants plus degenerate same-cell / adjacent
    val pairs = (0L until 20L).map(k =>
      (k, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)) ++
      Seq((20L, 5L, 5L, 5L, 5L), (21L, 5L, 5L, 6L, 5L))
    val got = SpatialOps.lineOfSight(
        occ.toSeq.toDF("bx", "by"),
        pairs.toDF("pair_id", "x0", "y0", "x1", "y1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = pairs.map { p =>
      val nb = refLos(occ, p)
      p._1 -> (nb, if (nb == 0) 1L else 0L)
    }.toMap
    assert(got === want)
  }

  test("a wall blocks exactly the lines that cross it") {
    val s = spark; import s.implicits._
    val wall = (0L until 20L).map(y => (10L, y)) // vertical wall x=10
    val pairs = Seq((0L, 0L, 5L, 20L, 5L),   // crosses the wall
      (1L, 0L, 5L, 9L, 5L),                  // stops short
      (2L, 11L, 2L, 19L, 18L))               // entirely east of it
    val got = SpatialOps.lineOfSight(wall.toDF("bx", "by"),
        pairs.toDF("pair_id", "x0", "y0", "x1", "y1"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }
}
