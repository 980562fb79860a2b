package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TextHash

/** DedupOps.winnowFingerprints vs a sequential winnower + the shared-
  * substring guarantee.
  */
class WinnowSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def refWinnow(text: String, n: Int,
                        w: Int): Set[(Long, Long)] = {
    val hs = TextHash.slidingNgramHashes(text, n)
    (0 to hs.length - w).flatMap { i =>
      val win = (i until i + w).map(j => (hs(j), -j.toLong))
      val (h, negP) = win.min
      Some((-negP, h))
    }.toSet
  }

  test("matches a sequential winnower on a seeded corpus") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(227)
    val vocab = ('a' to 'f').map(_.toString)
    val docs = (0L until 50L).map(i =>
      i -> Seq.fill(30 + rnd.nextInt(20))(vocab(rnd.nextInt(6))).mkString(" "))
    val got = DedupOps.winnowFingerprints(docs.toDF("doc_id", "text"), 4, 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = docs.map { case (id, t) => id -> refWinnow(t, 4, 5) }
      .filter(_._2.nonEmpty).toMap
    assert(got === want)
  }

  test("winnowPairs finds the duplicated pair and caps hot fingerprints") {
    val s = spark; import s.implicits._
    val shared = (1 to 12).map(i => s"x$i").mkString(" ")
    // docs 1,2 share a 12-token run; docs 10..89 all repeat one
    // boilerplate span so its fingerprints blow the 64-doc bucket cap
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      1L -> s"p q r s t $shared a b c d e",
      2L -> s"m n o $shared z y x w v") ++
      (10L until 90L).map(i => i -> s"h$i j$i $boiler k$i")
    val got = DedupOps.winnowPairs(docs.toDF("doc_id", "text"), 4, 5, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    // the 80-doc boilerplate cohort would be 3160 pairs uncapped; the
    // cap drops those buckets entirely
    assert(!got.exists(p => p._1 >= 10L && p._2 >= 10L))
  }

  test("shared 8-token run always shares a fingerprint (n+w-1 guarantee)") {
    val s = spark; import s.implicits._
    val shared = "x1 x2 x3 x4 x5 x6 x7 x8"
    val docs = Seq(
      1L -> s"p q r s t u v w $shared a b c d e f g h",
      2L -> s"m n o $shared z y x w v u t s r q p o n")
    val fps = DedupOps.winnowFingerprints(docs.toDF("doc_id", "text"), 4, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)
  }
}
