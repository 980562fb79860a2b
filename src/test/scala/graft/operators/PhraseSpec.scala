package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SearchOps.phraseMatch vs a sliding-window reference. */
class PhraseSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def refMatch(docs: Seq[(Long, String)],
                       phrases: Seq[(Long, Seq[String])]): Map[(Long, Long), Long] =
    (for {
      (did, text) <- docs
      toks = text.split(" ").filter(_.nonEmpty).toSeq
      (pid, ph) <- phrases
      n = toks.sliding(ph.length).count(_ == ph) if n > 0
    } yield (pid, did) -> n.toLong).toMap

  test("matches a sliding-window reference on a seeded corpus") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Seq("a", "b", "c", "d")
    val docs = (0L until 60L).map(i =>
      i -> Seq.fill(40)(vocab(rnd.nextInt(4))).mkString(" "))
    val phrases = Seq(0L -> Seq("a", "b"), 1L -> Seq("c", "a", "d"),
      2L -> Seq("a", "a"), 3L -> Seq("b"))
    val got = SearchOps.phraseMatch(
        docs.toDF("doc_id", "text"), phrases.toDF("phrase_id", "terms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === refMatch(docs, phrases))
  }

  test("overlapping matches all count; repeated-term phrase exact") {
    val s = spark; import s.implicits._
    val docs = Seq(1L -> "a a a a b a b a").toDF("doc_id", "text")
    val phrases = Seq(0L -> Seq("a", "a"), 1L -> Seq("a", "b", "a"))
      .toDF("phrase_id", "terms")
    val got = SearchOps.phraseMatch(docs, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // "a a": starts 0,1,2; "a b a": starts 3 and 5
    assert(got === Map((0L, 1L) -> 3L, (1L, 1L) -> 2L))
  }
}
