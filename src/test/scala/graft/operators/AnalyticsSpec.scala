package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-4 analytics additions: 2-D skyline, generic
  * connected components, and the integer-exact z-score inequality. Each is
  * checked against an independent driver-side brute-force reference on
  * seeded data (no Math.random).
  */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
      .map(x => x >>> 33)

  test("skyline matches brute-force dominance on seeded points (with duplicates and same-a ties)") {
    val s = spark; import s.implicits._
    val pts = lcg(7).take(600).grouped(2)
      .map(p => (p.head % 40, p.last % 40)).toSeq // dense domain → many ties
    val got = StatsOps.skyline(pts.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().toSet

    val distinct = pts.groupBy(identity).map { case (p, g) => (p._1, p._2, g.size.toLong) }
    def dominated(p: (Long, Long)) = distinct.exists { q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2)
    }
    val want = distinct.filter(t => !dominated((t._1, t._2))).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size > 1) // non-degenerate frontier
  }

  test("connectedComponents: chain of diameter 40 + disjoint blob + isolated pair") {
    val s = spark; import s.implicits._
    // component A: chain 0-1-2-...-40 (diameter 40 → exercises the
    // pointer-jump rounds); B: star at 100; C: single edge 200-201
    val edges = (0L until 40L).map(i => (i, i + 1)) ++
      (101L to 110L).map(i => (100L, i)) ++ Seq((200L, 201L))
    val got = GraphOps.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    graft.core.CacheScope.releaseGlobal()
    assert((0L to 40L).forall(got(_) == 0L))
    assert((100L to 110L).forall(got(_) == 100L))
    assert(got(200L) == 200L && got(201L) == 200L)
    assert(got.size === 41 + 11 + 2)
  }

  test("hllMergeUp: merged child sketches are bit-identical to the direct parent sketch") {
    val s = spark; import s.implicits._
    // 2000 rows over 40 children (10 parents), hashes with collisions
    val rows = lcg(11).take(2000).map(v => (v % 40, (v / 40) % 300 + 1)).toSeq
    val df = rows.toDF("child", "h")
    val merged = SketchOps.hllMergeUp(df, "child", col("h"), c => c % 10, m = 64)
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = SketchOps.hllDistinct(
        df.withColumn("parent", col("child") % 10), "parent", col("h"), m = 64)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(merged === direct)
  }

  test("integer z-score inequality agrees with the float z-score on seeded groups") {
    val rows = lcg(99).take(300).map(v => (v % 3, 50 + (v % 211))).toSeq
    for ((_, g) <- rows.groupBy(_._1)) {
      val xs = g.map(_._2.toDouble)
      val n = xs.size
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      val sx = g.map(_._2).sum
      val sq = g.map(v => v._2 * v._2).sum
      for ((_, x) <- g) {
        val dev = n.toLong * x - sx
        val intFlag = dev * dev * (n - 1) > 4L * n * (n * sq - sx.toLong * sx)
        val floatFlag = math.abs((x - mean) / sd) > 2.0
        assert(intFlag === floatFlag, s"x=$x n=$n")
      }
    }
  }
}
