package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Distributed power-iteration loops vs their single-shard twins:
  * pageRank, personalizedPageRank, pageRankWeighted, hits. The public
  * dispatch takes the local path at spec scale, so each loop is invoked
  * directly with the same pre-shaped input and every row must match
  * bit-for-bit (the operators' exact-int64 contract).
  */
class RankParitySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def seededEdges(seed: Int, n: Int, m: Int) = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
  }

  test("pageRank loop matches the single-shard twin") {
    val edges = seededEdges(5, 90, 400)
    val simple = edges.distinct()
    val viaLoop = GraphOps.pageRankLoop(simple, 8, new graft.core.CacheScope)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaLocal = GraphOps.pageRank(edges, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaLocal === viaLoop)
  }

  test("personalizedPageRank loop matches the single-shard twin") {
    val s = spark; import s.implicits._
    val edges = seededEdges(19, 90, 400)
    val seeds = Seq(1L, 7L, 42L).toDF("node_id")
    val viaLoop = GraphOps.personalizedPageRankLoop(edges.distinct(), seeds, 8,
        new graft.core.CacheScope)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaLocal = GraphOps.personalizedPageRank(edges, seeds, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaLocal === viaLoop)
  }

  test("pageRankWeighted loop matches the single-shard twin") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(300)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong,
        1L + rnd.nextInt(9).toLong))
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // one row per edge
      .toDF("src", "dst", "w")
    val viaLoop = GraphOps.pageRankWeightedLoop(
        edges.select(col("src"), col("dst"), col("w")), 8,
        new graft.core.CacheScope)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaLocal = GraphOps.pageRankWeighted(edges, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaLocal === viaLoop)
  }

  test("hits loop matches the single-shard twin") {
    val edges = seededEdges(83, 80, 350)
    val viaLoop = GraphOps.hitsLoop(edges.distinct(), 6,
        new graft.core.CacheScope)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val viaLocal = GraphOps.hits(edges, 6)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(viaLocal === viaLoop)
  }
}
