package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpatialOps.stayPoints vs a sequential reference segmentation. */
class StayPointsSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Sequential reference: split each entity's ts-ordered trace where the
    * step leaves the radius, keep runs >= minPts.
    */
  private def ref(rows: Seq[(Long, Long, Long, Long)], r: Long, minPts: Int)
      : Set[(Long, Long, Long, Long)] =
    rows.groupBy(_._1).iterator.flatMap { case (ent, g) =>
      val trace = g.sortBy(_._2)
      val runs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(trace.head))
      trace.sliding(2).foreach {
        case Seq((_, _, x0, y0), cur @ (_, _, x1, y1)) =>
          val d2 = BigInt(x1 - x0) * (x1 - x0) + BigInt(y1 - y0) * (y1 - y0)
          if (d2 > BigInt(r) * r) runs += scala.collection.mutable.ArrayBuffer(cur)
          else runs.last += cur
        case _ => ()
      }
      runs.filter(_.size >= minPts).map { run =>
        (ent, run.head._2, run.last._2, run.size.toLong)
      }
    }.toSet

  test("matches sequential segmentation on seeded random excursion traces") {
    val rnd = new scala.util.Random(17)
    val rows = for {
      ent <- 1L to 8L
      t <- 1L to 120L
    } yield {
      val hop = if (rnd.nextInt(6) == 0) rnd.between(5000000L, 50000000L) else 0L
      (ent, t, hop + rnd.between(-1000000L, 1000001L),
        -hop + rnd.between(-1000000L, 1000001L))
    }
    val s = spark; import s.implicits._
    val got = SpatialOps.stayPoints(
        rows.toDF("entity", "ts", "x", "y"), 3000000L, 4)
      .select("entity", "start_ts", "end_ts", "n_pings")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = ref(rows, 3000000L, 4)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("odMatrix pairs consecutive stays per entity into directed cell flows") {
    val s = spark; import s.implicits._
    // (entity, start_ts, end_ts, min_x, max_x, min_y, max_y); cell = 100
    val stays = Seq(
      (1L, 10L, 20L, 0L, 50L, 0L, 50L),        // center (25,25)  -> cell (0,0)
      (1L, 30L, 40L, 250L, 350L, 0L, 50L),     // center (300,25) -> cell (3,0)
      (1L, 50L, 60L, 250L, 350L, 0L, 50L),     // same cell again (self-flow)
      (2L, 5L, 15L, 199L, 200L, 100L, 100L),   // center floor((199+200)/2)=199 -> (1,1)
      (2L, 90L, 95L, 0L, 0L, 0L, 0L))          // -> (0,0)
    val got = SpatialOps.odMatrix(
        stays.toDF("entity", "start_ts", "end_ts",
          "min_x", "max_x", "min_y", "max_y"), 100L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got === Set(
      (0L, 0L, 3L, 0L, 1L, 10L),   // entity 1 first hop, transit 30-20
      (3L, 0L, 3L, 0L, 1L, 10L),   // entity 1 dwell-to-dwell same cell
      (1L, 1L, 0L, 0L, 1L, 75L)))  // entity 2, transit 90-15
  }

  test("boundary: a step of exactly r keeps the run (inclusive)") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, 1L, 0L, 0L), (1L, 2L, 100L, 0L), (1L, 3L, 200L, 0L), // steps = r
      (1L, 4L, 301L, 0L))                                       // step > r
    val got = SpatialOps.stayPoints(rows.toDF("entity", "ts", "x", "y"), 100L, 3)
      .select("entity", "start_ts", "end_ts", "n_pings")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set((1L, 1L, 3L, 3L)))
  }
}
