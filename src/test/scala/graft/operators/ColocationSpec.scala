package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Space-time co-location join: brute-force parity (incl. cell- and
  * bucket-boundary pairs), the cover-completeness precondition, and the
  * scale posture of the physical plan.
  */
class ColocationSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private val R = 10000000L
  private val Tau = 50L
  private val Level = 7

  test("colocationJoin matches brute force on a clustered random corpus") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    // 400 observations in 12 spatial clusters — cluster pitch 3e7 keeps
    // clusters apart, within-cluster spread 1.5e7 straddles cell borders
    val obs = (0 until 400).map { i =>
      val c = rnd.nextInt(12)
      val x = (c % 4) * 30000000L - 60000000L + rnd.nextInt(15000000)
      val y = (c / 4) * 30000000L - 30000000L + rnd.nextInt(15000000)
      (i.toLong % 17L, i.toLong, x, y)
    }
    val got = SpatialOps.colocationJoin(
        obs.toDF("entity", "ts", "x", "y"), R, Tau, Level)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val contacts = for {
      a @ (ea, ta, xa, ya) <- obs
      (eb, tb, xb, yb) <- obs
      if ta < tb && tb - ta <= Tau && ea != eb
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= R * R
    } yield (math.min(ea, eb), math.max(ea, eb), d2)
    val brute = contacts.groupBy(c => (c._1, c._2))
      .map { case ((a, b), cs) => (a, b, cs.size.toLong, cs.map(_._3).min) }
      .toSet
    assert(got === brute)
    assert(got.nonEmpty, "no contact pair — test is vacuous")
  }

  test("boundary pairs across cell and bucket edges are found exactly once") {
    val s = spark; import s.implicits._
    // cell width at level 7 is 28.125e6 (x) / 14.0625e6 (y); place pairs
    // straddling an x edge, a y edge, and a tau bucket edge
    val obs = Seq(
      (1L, 200L, -1L, 0L), (2L, 201L, 1L, 0L),            // x-cell edge (x=0)
      (3L, 400L, 5L, -1L), (4L, 401L, 5L, 1L),            // y-cell edge (y=0)
      (5L, Tau - 1L, 900L, 900L), (6L, Tau + 1L, 901L, 901L), // bucket edge, Δt=2
      (7L, 700L, 0L, 0L), (8L, 700L + Tau + 1L, 0L, 0L)   // outside τ — excluded
    ).toDF("entity", "ts", "x", "y")
    val got = SpatialOps.colocationJoin(obs, R, Tau, Level)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L), (3L, 4L, 1L), (5L, 6L, 1L)))
  }

  test("cover-completeness precondition: radius above cell width is rejected") {
    val s = spark; import s.implicits._
    val obs = Seq((1L, 1L, 0L, 0L)).toDF("entity", "ts", "x", "y")
    intercept[IllegalArgumentException] {
      SpatialOps.colocationJoin(obs, radiusFix = 20000000L, tau = 10L, level = 7)
    }
  }

  test("scale posture: one shuffle equi-join, no broadcast, no cartesian") {
    val s = spark; import s.implicits._
    val obs = (0 until 300).map(i => (i.toLong % 7L, i.toLong, i * 1000L, i * 500L))
      .toDF("entity", "ts", "x", "y")
    val plan = SpatialOps.colocationJoin(obs, R, Tau, Level)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(25).mkString("\n"))
    assert(!plan.contains("BroadcastHashJoin"), "observation corpus must not be broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "contact join must stay an equi-join on the (cell, bucket) key")
  }
}
