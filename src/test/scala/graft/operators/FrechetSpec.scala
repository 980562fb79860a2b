package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Planar

/** Discrete-Fréchet kernel goldens and the bbox-candidate join's parity
  * with a driver-side brute force.
  */
class FrechetSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def df2(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long =
    Planar.discreteFrechet2(a.map(_._1).toArray, a.map(_._2).toArray,
      b.map(_._1).toArray, b.map(_._2).toArray)

  test("discreteFrechet2 goldens") {
    val line = Seq((0L, 0L), (10L, 0L), (20L, 0L))
    assert(df2(line, line) === 0L, "identical tracks")
    // parallel offset by (3,4): every matched pair is exactly 25 apart
    val off = line.map { case (x, y) => (x + 3, y + 4) }
    assert(df2(line, off) === 25L)
    // single points: plain squared distance
    assert(df2(Seq((0L, 0L)), Seq((5L, 12L))) === 169L)
    // no backtracking: B visits A's end before its start, so some pair
    // must span the full length (the leash cannot rewind)
    val fwd = Seq((0L, 0L), (100L, 0L))
    val rev = Seq((100L, 0L), (0L, 0L))
    assert(df2(fwd, rev) === 100L * 100L)
    // asymmetric lengths: detour forces the leash out to the spike
    val flat = Seq((0L, 0L), (50L, 0L), (100L, 0L))
    val spike = Seq((0L, 0L), (50L, 30L), (100L, 0L))
    assert(df2(flat, spike) === 30L * 30L)
    // far pair saturates instead of overflowing
    assert(df2(Seq((-1700000000L, 0L)), Seq((1700000000L, 0L))) === Long.MaxValue)
  }

  private def dtw2(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long =
    Planar.dtw2(a.map(_._1).toArray, a.map(_._2).toArray,
      b.map(_._1).toArray, b.map(_._2).toArray)

  test("dtw2 goldens") {
    val line = Seq((0L, 0L), (10L, 0L), (20L, 0L))
    assert(dtw2(line, line) === 0L, "identical tracks")
    // parallel offset by (3,4): diagonal coupling sums 3 matched pairs of 25
    val off = line.map { case (x, y) => (x + 3, y + 4) }
    assert(dtw2(line, off) === 75L)
    // single points: plain squared distance
    assert(dtw2(Seq((0L, 0L)), Seq((5L, 12L))) === 169L)
    // spike detour: only the middle pair costs (30², rest match exactly)
    val flat = Seq((0L, 0L), (50L, 0L), (100L, 0L))
    val spike = Seq((0L, 0L), (50L, 30L), (100L, 0L))
    assert(dtw2(flat, spike) === 900L)
    // asymmetric lengths: B's single point pairs with all of A
    assert(dtw2(Seq((0L, 0L), (4L, 0L)), Seq((0L, 0L))) === 16L)
    // far pair clamps instead of wrapping
    assert(dtw2(Seq((-1700000000L, 0L), (-1700000000L, 1L)),
      Seq((1700000000L, 0L))) === Long.MaxValue / 4)
  }

  test("dtwJoin matches brute force within the budget") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val tracks = (0 until 100).map { i =>
      val cx = (i % 9) * 5000000L + rnd.nextInt(2000000)
      val cy = (i % 5) * 4000000L + rnd.nextInt(2000000)
      val n = 3 + rnd.nextInt(4)
      val pts = (0 until n).map { k =>
        (cx + k * 1000000L + rnd.nextInt(800000),
         cy + rnd.nextInt(800000).toLong)
      }
      (i.toLong, pts)
    }
    val budget = 3L * 2000000L * 2000000L
    val df = tracks.map { case (id, pts) =>
      (id, pts.map(_._1).toArray, pts.map(_._2).toArray)
    }.toDF("way_id", "xs", "ys")
    val got = SpatialOps.dtwJoin(df, df, budget, selfJoin = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, pa) <- tracks
      (ib, pb) <- tracks
      if ia < ib
      d = dtw2(pa, pb)
      if d <= budget
    } yield (ia, ib, d)).toSet
    assert(got === brute)
    assert(got.nonEmpty, "no matched pair — test is vacuous")
  }

  test("frechetJoin matches brute force and keeps only pairs within the threshold") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    // 120 tracks of 4-6 points, clustered so some pairs match
    val tracks = (0 until 120).map { i =>
      val cx = (i % 10) * 5000000L + rnd.nextInt(2000000)
      val cy = (i % 7) * 4000000L + rnd.nextInt(2000000)
      val n = 4 + rnd.nextInt(3)
      val pts = (0 until n).map { k =>
        (cx + k * 1000000L + rnd.nextInt(800000),
         cy + rnd.nextInt(800000).toLong)
      }
      (i.toLong, pts)
    }
    val thr = 2000000L
    val df = tracks.map { case (id, pts) =>
      (id, pts.map(_._1).toArray, pts.map(_._2).toArray)
    }.toDF("way_id", "xs", "ys")
    val got = SpatialOps.frechetJoin(df, df, thr, selfJoin = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, pa) <- tracks
      (ib, pb) <- tracks
      if ia < ib
      d = df2(pa, pb)
      if d <= thr * thr
    } yield (ia, ib, d)).toSet
    assert(got === brute)
    assert(got.nonEmpty, "no matched pair — test is vacuous")
  }

  test("frechetJoin scale posture: shuffle join, no broadcast, no cartesian") {
    val s = spark; import s.implicits._
    val df = (0 until 200).map { i =>
      (i.toLong, Array(i * 100000L, i * 100000L + 50000L), Array(0L, 50000L))
    }.toDF("way_id", "xs", "ys")
    val res = SpatialOps.frechetJoin(df, df, 1000000L, selfJoin = true)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(25).mkString("\n"))
    assert(!plan.contains("BroadcastHashJoin"), "track corpus must not be broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "similarity join must stay an equi-join on the cover cell")
  }
}
