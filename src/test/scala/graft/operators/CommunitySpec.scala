package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Label-propagation communities and clustering coefficients on a
  * barbell graph (two 4-cliques joined by one bridge edge): LPA must
  * split what connected components merge, and the coefficient must read
  * the local density exactly.
  */
class CommunitySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (ids(i), ids(j))

  test("LPA splits the barbell into its two cliques; WCC would not") {
    val s = spark; import s.implicits._
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L)).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.filterKeys(_ < 10L).values.toSet === Set(0L),
      s"left clique must all carry label 0: $got")
    assert(got.filterKeys(_ >= 10L).values.toSet === Set(10L),
      s"right clique must all carry label 10: $got")
    val wcc = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getLong(1)).toSet
    assert(wcc.size === 1, "sanity: components merge the barbell")
  }

  test("clustering coefficients are exact on a clique + pendant") {
    val s = spark; import s.implicits._
    // 4-clique {0,1,2,3} plus pendant 4-3: nodes 0,1,2 have deg 3 and
    // all 3 neighbor pairs closed (coeff 1000); node 3 has deg 4 and 3
    // of 6 pairs closed (coeff 500); node 4 has deg 1 (absent)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) :+ (4L, 3L)).toDF("src", "dst")
    val got = GraphOps.clusteringCoefficients(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got === Map(
      0L -> (3L, 3L, 1000L), 1L -> (3L, 3L, 1000L), 2L -> (3L, 3L, 1000L),
      3L -> (4L, 3L, 500L)))
  }
}
