package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HITS integer power iteration: parity with an independent sequential
  * reference, and the hub/authority structure on a known graph.
  */
class HitsSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Sequential twin of GraphOps.hits: same integer half-steps. */
  private def refHits(edges: Set[(Long, Long)],
                      iters: Int): Map[Long, (Long, Long)] = {
    val S = GraphOps.RankScale
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    var h = nodes.map(_ -> S).toMap
    var a = nodes.map(_ -> S).toMap
    (1 to iters).foreach { _ =>
      val araw = nodes.map(v =>
        v -> edges.filter(_._2 == v).toSeq.map(e => h(e._1)).sum).toMap
      val qa = math.max(araw.values.max / S, 1L)
      a = araw.map { case (v, r) => v -> r / qa }
      val hraw = nodes.map(u =>
        u -> edges.filter(_._1 == u).toSeq.map(e => a(e._2)).sum).toMap
      val qh = math.max(hraw.values.max / S, 1L)
      h = hraw.map { case (u, r) => u -> r / qh }
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  test("matches the sequential integer reference on a seeded random digraph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(41)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toSet
    val got = GraphOps.hits(edges.toSeq.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === refHits(edges, 3))
  }

  test("star graph: the center is the hub, leaves are the authorities") {
    val s = spark; import s.implicits._
    val edges = (1L to 5L).map(v => (0L, v)).toDF("src", "dst")
    val got = GraphOps.hits(edges, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L)._1 > 0 && got(0L)._2 === 0L, "center: pure hub")
    (1L to 5L).foreach { v =>
      assert(got(v)._2 > 0 && got(v)._1 === 0L, s"leaf $v: pure authority")
      assert(got(0L)._1 > got(v)._1)
    }
  }
}
