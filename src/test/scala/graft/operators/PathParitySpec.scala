package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GraphOps.shortestPathCounts / oddParityEdges vs sequential references. */
class PathParitySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Level-synchronous BFS returning (dist, sigma) per reached node. */
  private def refSigma(edges: Seq[(Long, Long)], sources: Set[Long],
                       maxHops: Int): Map[Long, (Long, Long)] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (s, g) => s -> g.map(_._2).distinct }
    var dist = sources.map(_ -> 0L).toMap
    var sigma = sources.map(_ -> 1L).toMap
    var frontier = sources
    var h = 0L
    while (h < maxHops && frontier.nonEmpty) {
      h += 1
      val contrib = frontier.toSeq
        .flatMap(u => adj.getOrElse(u, Nil).map(_ -> sigma(u)))
        .filterNot { case (v, _) => dist.contains(v) }
        .groupBy(_._1).map { case (v, g) => v -> g.map(_._2).sum }
      dist = dist ++ contrib.keys.map(_ -> h)
      sigma = sigma ++ contrib
      frontier = contrib.keySet
    }
    dist.map { case (n, d) => n -> (d, sigma(n)) }
  }

  test("sigma matches sequential Brandes counts on a seeded digraph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(700)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val sources = Set(0L, 55L, 119L)
    val got = GraphOps.shortestPathCounts(
        edges.toDF("src", "dst"), sources.toSeq.toDF("node_id"), 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === refSigma(edges, sources, 4))
  }

  test("diamond counts two shortest paths, longer arrivals ignored") {
    val s = spark; import s.implicits._
    // 1->{2,3}->4 (two 2-hop paths) plus a 3-hop detour 1->5->6->4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val got = GraphOps.shortestPathCounts(edges, Seq(1L).toDF("node_id"), 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(1L -> (0L, 1L), 2L -> (1L, 1L), 3L -> (1L, 1L),
      5L -> (1L, 1L), 4L -> (2L, 2L), 6L -> (2L, 1L)))
  }

  /** Sequential twin of landmarkBetweenness' integer backward pass. */
  private def refDelta(edges: Seq[(Long, Long)], sources: Set[Long],
                       maxHops: Int): Map[Long, Long] = {
    val ds = refSigma(edges, sources, maxHops)
    val e = edges.distinct
    var delta = Map.empty[Long, Long].withDefaultValue(0L)
    for (h <- maxHops - 1 to 0 by -1) {
      val lv = e.flatMap { case (v, w) =>
        (ds.get(v), ds.get(w)) match {
          case (Some((dv, sv)), Some((dw, sw))) if dv == h && dw == h + 1 =>
            Some(v -> sv * (1000000L + delta(w)) / sw)
          case _ => None
        }
      }.groupBy(_._1).map { case (v, g) => v -> g.map(_._2).sum }
      delta = delta ++ lv
    }
    ds.map { case (n, _) => n -> delta(n) }
  }

  test("betweenness matches the sequential integer Brandes pass") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(101)
    val edges = Seq.fill(800)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val sources = Set(0L, 60L, 119L)
    val want = refSigma(edges, sources, 4).map { case (n, (d, sg)) =>
      n -> (d, sg, refDelta(edges, sources, 4)(n)) }
    val got = GraphOps.landmarkBetweenness(
        edges.toDF("src", "dst"), sources.toSeq.toDF("node_id"), 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === want)
  }

  test("diamond: the two middle nodes each carry half the dependency") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.landmarkBetweenness(edges, Seq(1L).toDF("node_id"), 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // σ(4) = 2 via both middles; δ(2) = δ(3) = 1·(1e6+0)/2 = 500000;
    // δ(1) = 1·(1e6+5e5)/1 × 2 = 3000000
    assert(got === Map(1L -> (0L, 1L, 3000000L), 2L -> (1L, 1L, 500000L),
      3L -> (1L, 1L, 500000L), 4L -> (2L, 2L, 0L)))
  }

  test("odd-cycle witnesses: triangle flagged, square clean") {
    val s = spark; import s.implicits._
    // triangle 1-2-3 (odd) and square 10-11-12-13 (even, bipartite)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("src", "dst")
    val got = GraphOps.oddParityEdges(
        edges, Seq(1L, 10L).toDF("node_id"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // BFS from 1: d(1)=0 d(2)=1 d(3)=1 → witness edge (2,3); square has none
    assert(got === Set((2L, 3L)))
  }

  test("parity matches a sequential check on a seeded undirected graph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(57)
    val raw = Seq.fill(500)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter(e => e._1 != e._2)
    val und = raw.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val sym = und ++ und.map(_.swap)
    val sources = Set(0L, 99L)
    val dist = refSigma(sym, sources, 6).map { case (n, (d, _)) => n -> d }
    val want = und.filter { case (a, b) =>
      dist.contains(a) && dist.contains(b) && (dist(a) + dist(b)) % 2 == 0
    }.toSet
    val got = GraphOps.oddParityEdges(
        raw.toDF("src", "dst"), sources.toSeq.toDF("node_id"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }
}
