package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Longest-prefix URL policy matching (robots semantics). */
class PolicyMatchSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("longest matching prefix wins; unruled URLs default to allowed") {
    val s = spark; import s.implicits._
    val urls = Seq(
      (1L, "a.org", "/private/data/x"), // deepest deny wins over root allow
      (2L, "a.org", "/private/pub/y"),  // deeper allow overrides deny
      (3L, "a.org", "/open/z"),         // only the root rule matches
      (4L, "b.org", "/anything"),       // host with no rules at all
      (5L, "a.org", "/priv"),           // prefix of a rule, NOT a match
      (6L, "c.org", "/private/data/x")  // rules are host-scoped
    ).toDF("url_id", "host", "path")
    val rules = Seq(
      ("a.org", "/", 1L),
      ("a.org", "/private/", 0L),
      ("a.org", "/private/pub/", 1L),
      ("c.org", "/c-only/", 0L)
    ).toDF("host", "prefix", "allow")
    val got = SearchOps.policyMatch(urls, rules)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> ("/private/", 0L),
      2L -> ("/private/pub/", 1L),
      3L -> ("/", 1L),
      4L -> ("", 1L),
      5L -> ("/", 1L),
      6L -> ("", 1L)))
  }
}
