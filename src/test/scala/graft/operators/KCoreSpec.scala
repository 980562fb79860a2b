package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** k-core peel: parity with a sequential reference, the fixed-round
  * bound contract on a slow-converging path graph, and the core
  * invariant (every member keeps ≥ k core neighbors).
  */
class KCoreSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Sequential twin: peel `rounds` times (idempotent past fixpoint),
    * then report surviving degrees unfiltered — the operator's contract.
    */
  private def refKCore(edges: Set[(Long, Long)], k: Int,
                       rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (a, g) => a -> g.map(_._2).toSet }
    var alive = adj.keySet
    (1 to rounds).foreach { _ =>
      alive = alive.filter(v => (adj(v) & alive).size >= k)
    }
    alive.map(v => v -> (adj(v) & alive).size.toLong).toMap
  }

  test("matches the sequential peel on a seeded random digraph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(59)
    val edges = (0 until 260).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).toSet
    val got = GraphOps.kCore(edges.toSeq.toDF("src", "dst"), 3, 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refKCore(edges, 3, 24))
    assert(got.nonEmpty, "empty 3-core — test is vacuous")
    assert(got.values.forall(_ >= 3), "a core member with < k core neighbors")
  }

  test("bounded rounds on a slow-converging path graph equal the fixed unroll") {
    val s = spark; import s.implicits._
    // a 40-node path peels one endpoint pair per round at k=2: far from
    // converged after 5 rounds — both sides must agree on the partial peel
    val edges = (0L until 39L).map(i => (i, i + 1)).toSet
    val got = GraphOps.kCore(edges.toSeq.toDF("src", "dst"), 2, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refKCore(edges, 2, 5))
    assert(got.nonEmpty, "partial peel emptied the path — test is vacuous")
  }

  test("triangle with a pendant: pendant peels, triangle is the 2-core") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L))
    val got = GraphOps.kCore(edges.toDF("src", "dst"), 2, 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
