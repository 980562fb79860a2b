package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** LmOps.bpeTrain vs a sequential BPE trainer. */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Sequential trainer: greedy argmax + left-to-right non-overlap merge. */
  private def refBpe(docs: Seq[String],
                     rounds: Int): Seq[(Long, String, String, Long)] = {
    var vocab = docs.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toVector, g.size.toLong) }.toVector
    val out = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach(p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n)
      }
      if (counts.nonEmpty) {
        val ((x, y), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r.toLong, x, y, c))
        vocab = vocab.map { case (syms, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
              b += x + y; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), n)
        }
      }
    }
    out.toSeq
  }

  test("matches a sequential trainer through chained merges") {
    val s = spark; import s.implicits._
    val docs = Seq(
      "banana bandana banana and a man ran",
      "a banana can and a bandana fan",
      "nan nan banana anna")
    val got = LmOps.bpeTrain(docs.zipWithIndex.map(d =>
        (d._2.toLong, d._1)).toDF("doc_id", "text"), 6)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === refBpe(docs, 6))
  }

  /** Tokenize a word with an ordered merge list (greedy per merge). */
  private def refTokenize(w: String,
                          ms: Seq[(String, String)]): Vector[String] = {
    var syms = w.map(_.toString).toVector
    ms.foreach { case (x, y) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
          b += x + y; i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  test("bpeApply token counts match the sequential tokenizer") {
    val s = spark; import s.implicits._
    val docs = Seq(
      "banana bandana banana and a man ran",
      "a banana can and a bandana fan",
      "nan nan banana anna")
    val ms = refBpe(docs, 6).map(m => (m._2, m._3))
    val want = docs.zipWithIndex.map { case (text, i) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      i.toLong -> (ws.length.toLong,
        ws.map(w => refTokenize(w, ms).length.toLong).sum)
    }.toMap
    val got = LmOps.bpeApply(docs.zipWithIndex.map(d =>
        (d._2.toLong, d._1)).toDF("doc_id", "text"), 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
  }

  test("overlapping runs merge left-to-right ('aaaa' -> 'aa aa')") {
    val s = spark; import s.implicits._
    val docs = Seq((0L, "aaaa aaa")).toDF("doc_id", "text")
    val got = LmOps.bpeTrain(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // round 1: pair (a,a) count = 3 (aaaa) + 2 (aaa) = 5 → merge
    // round 2: states 'aa aa' and 'aa a' → pairs (aa,aa)=1, (aa,a)=1 → (aa,a)
    assert(got.toSeq === Seq((1L, "a", "a", 5L), (2L, "aa", "a", 1L)))
  }
}
