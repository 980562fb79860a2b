package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GraphOps.kTruss vs a sequential peeler. */
class KTrussSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def support(e: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val s = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for (t @ (a, b) <- e; (c, d) <- e if c == b && e((a, d)))
      Seq(t, (c, d), (a, d)).foreach(k => s(k) += 1)
    e.map(k => k -> s(k)).toMap
  }

  private def refTruss(raw: Seq[(Long, Long)], k: Int,
                       rounds: Int): Map[(Long, Long), Long] = {
    var e = raw.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      r += 1
      val keep = support(e).filter(_._2 >= k - 2).keySet
      stable = keep.size == e.size
      e = keep
    }
    support(e)
  }

  test("matches a sequential peeler on a seeded graph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(59)
    val edges = Seq.fill(700)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val got = GraphOps.kTruss(edges.toDF("src", "dst"), 4, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === refTruss(edges, 4, 6))
  }

  test("peeling cascades: a pendant triangle chain dissolves at k=4") {
    val s = spark; import s.implicits._
    // K4 on 0-3 (every edge in 2 triangles) plus a pendant triangle
    // (3,4,5) whose edges have support 1 -> peeled at k=4, K4 survives
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val edges = k4 ++ Seq((3L, 4L), (4L, 5L), (3L, 5L))
    val got = GraphOps.kTruss(edges.toDF("src", "dst"), 4, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet === k4.toSet)
    assert(got.values.forall(_ == 2L))
  }
}
