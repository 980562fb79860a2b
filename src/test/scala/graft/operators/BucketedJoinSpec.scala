package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-once-at-ingest layout: LayoutOps.writeBucketed persists a
  * hash-bucketed, per-bucket-sorted managed table; every later equi-join
  * or aggregation on the bucket key must plan WITHOUT a shuffle exchange.
  * This is the catalog-level counterpart of zorderLayout's file-level
  * clustering — the two layout contracts a 100 TB corpus is stored under.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_bucket_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed tables join and aggregate with zero shuffle exchanges") {
    val s = spark; import s.implicits._
    val pages = s.range(0, 2000).select(col("id").as("page_id"),
      (col("id") % 37).as("host_id"), (col("id") * 17 % 1000).as("score"))
    val labels = s.range(0, 1500).select(col("id").as("page_id"),
      (col("id") % 5).cast("string").as("label"))

    LayoutOps.writeBucketed(pages, "pages_b", "page_id", 8)
    LayoutOps.writeBucketed(labels, "labels_b", "page_id", 8)

    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("pages_b").join(s.table("labels_b"), "page_id")
        .select(col("page_id"), col("score"), col("label"))
      val rows = joined.collect()
      // correctness: matches the in-memory join
      val expect = pages.join(labels, "page_id")
        .select(col("page_id"), col("score"), col("label")).collect()
      assert(rows.map(_.toSeq).toSet === expect.map(_.toSeq).toSet)
      assert(rows.length === 1500)
      // plan: SMJ rides the bucket layout — no shuffle on either side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // aggregation on the bucket key is exchange-free too
      val agg = s.table("pages_b").groupBy("page_id").agg(sum("score").as("t"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed agg must not shuffle:\n$aggPlan")

      // control: the same join over non-bucketed frames DOES shuffle
      val ctrl = pages.join(labels, "page_id")
      ctrl.collect()
      assert(ctrl.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS pages_b")
      s.sql("DROP TABLE IF EXISTS labels_b")
    }
  }

  test("partitioned layout prunes at metadata level and pushes data filters to the scan") {
    val s = spark
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString + "/pages"
    val pages = s.range(0, 3000).select(col("id").as("page_id"),
      when(col("id") % 3 === 0, "en").when(col("id") % 3 === 1, "de")
        .otherwise("fr").as("lang"),
      (col("id") * 13 % 997).as("score"))
    LayoutOps.writePartitioned(pages, path, "lang")

    val q = s.read.parquet(path)
      .filter(col("lang") === "en" && col("score") > 500)
      .select("page_id", "score")
    assert(q.count() === pages.filter(col("lang") === "en" && col("score") > 500).count())
    val plan = q.queryExecution.executedPlan.toString
    // lang prunes directories (PartitionFilters), never reaches the data
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    // score pushes down to the parquet reader
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(score,500)"), plan)
    // and the scan schema is pruned to the selected data columns
    assert(plan.contains("ReadSchema") && !plan.contains("extraneous"), plan)
    // only the en/ directory's files are read
    val filesRead = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(!filesRead.contains("lang=de") && !filesRead.contains("lang=fr"))
  }
}
