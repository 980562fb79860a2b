package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Asymmetric shingle containment: a quoted document scores high toward
  * its container but not vice versa, and boilerplate shingles above the
  * df cap leave the metric.
  */
class ContainmentSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("a fully quoted short doc is contained in its container, not vice versa") {
    val s = spark; import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val container = "breaking news report follows here: " + quote + " end of story"
    val other = "completely unrelated text about distributed query engines"
    val corpus = Seq((1L, quote), (2L, container), (3L, other))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(corpus, thrPm = 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)), s"quote not detected in container: $got")
    assert(got((1L, 2L)) === 1000L, "every shingle of the quote is in the container")
    assert(!got.contains((2L, 1L)),
      "container must NOT count as contained in the quote")
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("shingles above the df cap are dropped from the metric") {
    val s = spark; import s.implicits._
    val boiler = "standard cookie banner text appears everywhere on site"
    // the boilerplate string is in > dfCap docs; two docs share ONLY it
    // suffixes diverge at the FIRST char so even boundary-crossing
    // shingles differ between the two tail docs
    val corpus = ((0L until 70L).map(i => (i, boiler)) ++
      Seq((100L, boiler + "alpha"), (101L, boiler + "omega")))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(corpus, thrPm = 100L, dfCap = 8)
      .collect()
    assert(got.isEmpty, s"df-capped shingles still produced pairs: ${got.length}")
  }
}
