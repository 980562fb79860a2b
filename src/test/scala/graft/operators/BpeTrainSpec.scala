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

  test("distributed trainer loop matches the single-shard twin") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      "banana bandana banana and a man ran",
      "a banana can and a bandana fan",
      "nan nan banana anna", "abba abab baba ab")
    val ddf = docs.zipWithIndex.map(d => (d._2.toLong, d._1))
      .toDF("doc_id", "text")
    val words0 = ddf.select(explode(
        regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(col("w"), col("wc"), concat(lit(" "),
        array_join(regexp_extract_all(col("w"), lit("."), lit(0)), " "),
        lit(" ")).as("s"))
    val (mLoop, sLoop) = LmOps.bpeTrainLoop(words0, 5,
      new graft.core.CacheScope)
    val mergesLoop = mLoop.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val stateLoop = sLoop.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val mergesLocal = LmOps.bpeTrain(ddf, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(mergesLocal === mergesLoop)
    // final vocabulary state parity through the apply surface
    val applyLocal = LmOps.bpeApply(ddf, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val vocabLoop = sLoop.select(col("w"),
      size(split(trim(col("s")), " ")).cast("long").as("ntok"))
    val applyLoop = ddf.select(col("doc_id"), explode(
        regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).as("w"))
      .join(vocabLoop, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(applyLocal === applyLoop)
    assert(stateLoop.nonEmpty)
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
