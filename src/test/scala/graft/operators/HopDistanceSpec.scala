package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GraphOps.hopDistance vs a reference sequential BFS. */
class HopDistanceSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def refBfs(edges: Seq[(Long, Long)], sources: Set[Long],
                     maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    var h = 0L
    while (h < maxHops && frontier.nonEmpty) {
      h += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    dist
  }

  test("matches sequential BFS on a seeded random digraph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(600)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter(e => e._1 != e._2)
    val sources = Set(0L, 77L, 149L)
    val got = GraphOps.hopDistance(
        edges.toDF("src", "dst"), sources.toSeq.toDF("node_id"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refBfs(edges, sources, 4))
  }

  test("frontier drains early on a short chain; unreached nodes absent") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = GraphOps.hopDistance(edges, Seq(1L).toDF("node_id"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("a revisitable node keeps its first (minimum) hop count") {
    val s = spark; import s.implicits._
    // 1 -> 2 -> 4 and 1 -> 3 -> 2: node 2 reachable at hop 1 and hop 2
    val edges = Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = GraphOps.hopDistance(edges, Seq(1L).toDF("node_id"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }
}
