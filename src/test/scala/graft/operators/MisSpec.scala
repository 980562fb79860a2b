package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TextHash

/** GraphOps.lubyMis vs a sequential Luby simulation + MIS invariants. */
class MisSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Sequential twin of the distributed rounds. */
  private def refLuby(raw: Seq[(Long, Long)], rounds: Int,
                      mul: Long): Map[Long, Long] = {
    val und = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    var out = Map.empty[Long, Long]
    var r = 0L
    while (r < rounds && adj.nonEmpty) {
      r += 1
      val p = adj.keys.map(n => n -> TextHash.mixId(n * mul + r)).toMap
      val win = adj.keys.filter(n => adj(n).forall(m =>
        p(n) < p(m) || (p(n) == p(m) && n < m))).toSet
      out ++= win.map(_ -> r)
      val del = win ++ win.flatMap(adj)
      adj = adj.removedAll(del).map { case (k, v) => k -> (v -- del) }
    }
    out
  }

  test("matches the sequential simulation on a seeded graph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(900)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    val got = GraphOps.lubyMis(edges.toDF("src", "dst"), 12, 1000003L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refLuby(edges, 12, 1000003L))
  }

  /** Sequential twin of the coloring rounds (winner-only removal). */
  private def refColoring(raw: Seq[(Long, Long)], rounds: Int,
                          mul: Long): Map[Long, Long] = {
    val und = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val fullAdj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    var remaining = fullAdj.keySet
    var out = Map.empty[Long, Long]
    var r = 0L
    while (r < rounds && remaining.nonEmpty) {
      r += 1
      val p = remaining.map(n => n -> TextHash.mixId(n * mul + r)).toMap
      val win = remaining.filter(n => (fullAdj(n) & remaining).forall(m =>
        p(n) < p(m) || (p(n) == p(m) && n < m)))
      out ++= win.map(_ -> r)
      remaining --= win
    }
    out
  }

  test("coloring matches the sequential simulation and is proper") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(700)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val got = GraphOps.lubyColoring(edges.toDF("src", "dst"), 24, 999983L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refColoring(edges, 24, 999983L))
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    // proper: no edge joins two equal colors (both endpoints colored here)
    assert(und.forall { case (a, b) =>
      !got.contains(a) || !got.contains(b) || got(a) != got(b) })
  }

  test("distributed round loop matches the single-shard twin (both modes)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{least, greatest, col}
    val rnd = new scala.util.Random(71)
    val edges = Seq.fill(500)((rnd.nextInt(140).toLong, rnd.nextInt(140).toLong))
      .toDF("src", "dst")
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    for (removeNeighbors <- Seq(true, false)) {
      val viaLoop = GraphOps.lubyRoundsLoop(und, 12, 1000003L,
          removeNeighbors, new graft.core.CacheScope)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaDispatch = (if (removeNeighbors)
          GraphOps.lubyMis(edges, 12, 1000003L)
        else GraphOps.lubyColoring(edges, 12, 1000003L))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDispatch === viaLoop, s"removeNeighbors=$removeNeighbors")
    }
  }

  test("result is independent and maximal") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(47)
    val raw = Seq.fill(600)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
    val mis = GraphOps.lubyMis(raw.toDF("src", "dst"), 12, 1000003L)
      .collect().map(_.getLong(0)).toSet
    val und = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    assert(und.forall { case (a, b) => !(mis(a) && mis(b)) })  // independent
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSet
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    assert(nodes.forall(n => mis(n) || adj(n).exists(mis)))    // maximal
  }
}
