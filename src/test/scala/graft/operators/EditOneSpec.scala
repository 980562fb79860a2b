package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Deletion-neighborhood ed-1 join: parity with a sequential Levenshtein
  * sweep on adversarial strings (transpositions, repeated chars,
  * duplicate strings, near-empty strings).
  */
class EditOneSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("matches a brute-force Levenshtein sweep on adversarial strings") {
    val s = spark; import s.implicits._
    // ab/ba: transposition (ed 2, shared variant at DIFFERENT positions);
    // aa/a: indel matching at two deletion positions (must dedupe);
    // abc family: subs and indels; xyz: isolated; dup: same string twice
    val strs = Seq("ab", "ba", "aa", "a", "abc", "abd", "bbc", "ac",
      "xyz", "dup", "dup", "b")
    val df = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "s")
    val got = DedupOps.editOnePairs(df, "doc_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    val want = (for {
      i <- strs.indices; j <- strs.indices
      if i < j && strs(i) != strs(j) && lev(strs(i), strs(j)) == 1
    } yield (i.toLong, j.toLong) ->
      (if (strs(i).length == strs(j).length) "sub" else "indel")).toMap
    assert(got === want)
    // sanity on the adversarial cases themselves
    assert(!got.contains((0L, 1L)), "ab/ba is ed 2, must not match")
    assert(got((2L, 3L)) === "indel", "aa/a must appear exactly once")
  }
}
