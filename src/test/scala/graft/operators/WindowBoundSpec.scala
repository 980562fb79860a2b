package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the three DOCUMENTED bounded-domain global windows
  * (the WindowExec single-partition warning class): each op funnels a
  * domain-collapsing aggregate (buckets / distinct-a) or a limit (top-k)
  * into its non-partitioned window, so the rows that actually flow
  * through the global sort are bounded by the value DOMAIN, not the
  * input row count. Asserted at runtime via the executed plan's
  * WindowExec numOutputRows metric (window output = window input, 1:1).
  */
class WindowBoundSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Runs the frame and returns numOutputRows for every GLOBAL
    * (non-partitioned) WindowExec in the executed plan. Fails if none is
    * found — the assertion must not silently pass on a re-planned query.
    */
  private def globalWindowRows(df: DataFrame): Seq[Long] = {
    df.collect()
    // AQE wraps materialized stages in QueryStageExec nodes whose
    // children are hidden from plain TreeNode.collect — descend manually
    def deep(p: SparkPlan): Seq[WindowExec] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _                                        => Seq.empty
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        // a persisted upstream hides its plan (and its WindowExec
        // metrics) inside the cached relation
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(im.relation.cachedPlan)
        case _ => p.children
      }
      here ++ kids.flatMap(deep)
    }
    val ws = deep(df.queryExecution.executedPlan)
    assert(ws.nonEmpty, "no global WindowExec found in the executed plan")
    // WindowExec itself carries no row metric in Spark 4; the rows that
    // reach it are exactly the records written into the single-partition
    // shuffle (or any row-counted node) directly below it
    def inputRows(p: SparkPlan): Option[Long] = {
      val keys = Seq("numOutputRows", "shuffleRecordsWritten")
      keys.collectFirst {
        case k if p.metrics.contains(k) => p.metrics(k).value
      }.orElse {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
            Seq(r.child)
          case _ => p.children
        }
        kids.iterator.flatMap(inputRows).nextOption()
      }
    }
    ws.map { w =>
      inputRows(w.child).getOrElse(
        fail(s"no row-counted node below the global window:\n${w.child}"))
    }
  }

  test("concurrencyProfile's global window sees one row per BUCKET") {
    val s = spark; import s.implicits._
    // 20k intervals, all inside a 10-bucket calendar span
    val bucketUs = 1000000L
    val rows = Seq.tabulate(20000) { i =>
      val st = (i % 9000).toLong * 1000 // 9000 distinct instants, 9 buckets
      (st, st + 500000L)
    }
    val prof = HistoryOps.concurrencyProfile(
      rows.toDF("s_us", "e_us"), "s_us", "e_us", bucketUs)
    val span = 10L // distinct buckets touched by starts + ends
    for (n <- globalWindowRows(prof))
      assert(n <= span, s"global window saw $n rows > $span buckets")
  }

  test("skyline's global window sees one row per DISTINCT a") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    // 30k rows, a-domain of exactly 13 values
    val rows = Seq.fill(30000)((rnd.nextInt(13).toLong, rnd.nextInt(1000).toLong))
    val sky = StatsOps.skyline(rows.toDF("len", "score"), "len", "score")
    for (n <- globalWindowRows(sky))
      assert(n <= 13, s"global window saw $n rows > 13 distinct a")
  }

  test("textRank's dictionary window sees one row per VOCAB word") {
    val s = spark; import s.implicits._
    // 5k docs over a 12-word vocabulary: the id-assignment window is
    // bounded by the recurring-collocation vocabulary, not the corpus
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(23)
    val docs = Seq.tabulate(5000) { i =>
      (i.toLong, Seq.fill(8)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val tr = LmOps.textRank(docs.toDF("doc_id", "text"), 2, 2L)
    for (n <- globalWindowRows(tr))
      assert(n <= words.size, s"global window saw $n rows > vocab ${words.size}")
  }

  test("bpePairCounts' global window sees at most k rows") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val corpus = Seq.tabulate(2000)(i =>
      (i.toLong, Seq.fill(12)(words(rnd.nextInt(6))).mkString(" ")))
      .toDF("doc_id", "text")
    val k = 5
    val pc = LmOps.bpePairCounts(corpus, k)
    for (n <- globalWindowRows(pc))
      assert(n <= k, s"global window saw $n rows > k=$k")
  }
}
