package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hll

/** Link prediction: hand-checkable CN/Adamic–Adar scores, the
  * already-adjacent exclusion, and the hub cap's quadratic bound.
  */
class LinkPredictionSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("scores match the hand model; adjacent pairs are excluded") {
    val s = spark; import s.implicits._
    // 1 and 2 share pivots 10 (deg 2) and 11 (deg 3); 11 also links 3,
    // so (1,3) and (2,3) share only pivot 11 (cn=1, below minCn). Pair
    // (1,2) is NOT an edge, so it must be predicted; (11,3) IS an edge.
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L), (11L, 3L))
      .toDF("src", "dst")
    val got = GraphOps.linkPrediction(edges, minCn = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val aa = 1000000000000L / Hll.lnE6(2.0) + 1000000000000L / Hll.lnE6(3.0)
    // the graph is symmetric: 10 and 11 likewise share the two deg-2
    // pivots 1 and 2 (wedges run BOTH ways through a pivot pair)
    val aaRev = 2L * (1000000000000L / Hll.lnE6(2.0))
    assert(got === Map((1L, 2L) -> (2L, aa), (10L, 11L) -> (2L, aaRev)))
  }

  test("a pivot above the hub cap contributes nothing") {
    val s = spark; import s.implicits._
    // star: hub 100 links 0..9 (deg 10 > cap 4); plus 1,2 both link 50
    val edges = ((0L until 10L).map(i => (100L, i)) ++
      Seq((1L, 50L), (2L, 50L))).toDF("src", "dst")
    val got = GraphOps.linkPrediction(edges, minCn = 1L, hubCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // without the cap the star would emit all 45 leaf pairs; what
    // survives is the (1,2) wedge through pivot 50 and the (50,100)
    // wedges through the deg-2 pivots 1 and 2 — no pair through the hub
    assert(got === Set((1L, 2L), (50L, 100L)))
  }

  test("scale-posture plans: linkpred/ed1/containment all equi-join, never all-pairs") {
    val s = spark; import s.implicits._
    val edges = (0L until 200L).map(i => (i, (i * 7 + 1) % 200)).toDF("src", "dst")
    val lp = GraphOps.linkPrediction(edges)
      .queryExecution.executedPlan.toString
    assert(!lp.contains("CartesianProduct") &&
      !lp.contains("BroadcastNestedLoop"), s"linkpred plan:\n$lp")
    val strs = (0L until 100L).map(i => (i, s"prefix-$i")).toDF("doc_id", "s")
    val ed = DedupOps.editOnePairs(strs, "doc_id", "s")
      .queryExecution.executedPlan.toString
    assert(!ed.contains("CartesianProduct") &&
      !ed.contains("BroadcastNestedLoop"), s"ed1 plan:\n$ed")
    val corpus = (0L until 50L).map(i => (i, s"some words repeated $i here"))
      .toDF("doc_id", "text")
    val ct = DedupOps.containmentPairs(corpus, 600L)
      .queryExecution.executedPlan.toString
    assert(!ct.contains("CartesianProduct") &&
      !ct.contains("BroadcastNestedLoop"), s"containment plan:\n$ct")
  }
}
