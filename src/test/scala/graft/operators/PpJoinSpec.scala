package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** DedupOps.ppjoinPairs vs all-pairs brute force (completeness of the
  * prefix filter is the property under test).
  */
class PpJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def brute(docs: Seq[(Long, String)],
                    thrPm: Long): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSet }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa & sb).size.toLong
      u = sa.size + sb.size - c
      if c * 1000 >= thrPm * u
    } yield (a, b, c, u)).toSet
  }

  test("finds exactly the brute-force pairs at several thresholds") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(211)
    val vocab = ('a' to 't').map(_.toString)
    val docs = (0L until 80L).map(i =>
      i -> Seq.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(20)))
        .mkString(" "))
    for (thr <- Seq(600L, 800L, 950L)) {
      val got = DedupOps.ppjoinPairs(docs.toDF("doc_id", "text"), thr)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === brute(docs, thr), s"thr=$thr")
    }
  }

  test("tiny-vocab candidates stay bounded (positional + length filters)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, explode,
      array_distinct, regexp_extract_all}
    // adversarial corpus: 31-token vocabulary → every prefix token has
    // df ≈ n/31, so the prefix join ALONE is near-quadratic; the
    // lossless length + positional filters must hold candidates far
    // below the all-pairs count while losing no true pair
    val rnd = new scala.util.Random(977)
    val vocab = (0 until 31).map(i => s"t$i")
    val docs = (0L until 200L).map(i =>
      i -> Seq.fill(5 + rnd.nextInt(21))(vocab(rnd.nextInt(31)))
        .mkString(" "))
    val thr = 850L
    val corpus = docs.toDF("doc_id", "text")
    val toks = corpus.select(col("doc_id"), explode(
        array_distinct(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))))
      .as("tok"))
    val sz = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val candN = DedupOps.ppjoinCandidates(toks, sz, thr).count()
    val allPairs = 200L * 199L / 2
    assert(candN * 5 < allPairs,
      s"candidates $candN not bounded vs all-pairs $allPairs")
    // completeness is untouched by the extra filters
    val got = DedupOps.ppjoinPairs(corpus, thr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === brute(docs, thr))
  }

  test("boundary pair exactly AT the threshold survives") {
    val s = spark; import s.implicits._
    // sets {a b c d e} vs {a b c d}: |∩|=4, union=5 → 800 pm exactly
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c d").toDF("doc_id", "text")
    val got800 = DedupOps.ppjoinPairs(docs, 800L).collect()
    assert(got800.length == 1 && got800(0).getLong(4) == 800L)
    assert(DedupOps.ppjoinPairs(docs, 801L).collect().isEmpty)
  }
}
