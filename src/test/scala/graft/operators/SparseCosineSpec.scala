package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sparse-cosine pairs: exact rational cos² on hand-built token bags,
  * and the df cap dropping boilerplate tokens from the metric.
  */
class SparseCosineSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("exact cos² permille; boilerplate above the df cap leaves the metric") {
    val s = spark; import s.implicits._
    // A = {x:2, y:1}, B = {x:1, y:2}: dot 4, |A|²=|B|²=5,
    // cos² = 16/25 -> 640 pm. C shares ONLY the boilerplate token b,
    // which sits on all three keys (df 3 > cap 2) and must be dropped.
    val occ = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"), ("A", "b"),
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "b"),
      ("C", "z"), ("C", "b"))
      .toDF("key", "tok")
    val got = SimilarityOps.cosineSparsePairs(occ, thrPm = 100L, dfCap = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("A", "B") -> 640L))
  }
}
