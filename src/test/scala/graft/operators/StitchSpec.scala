package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AssemblyOps.stitchChains: degree-2 end-to-end way merging goldens. */
class StitchSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** (way_id, x0, y0, x1, y1) rows -> DataFrame. */
  private def ways(rows: (Long, Long, Long, Long, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("way_id", "x0", "y0", "x1", "y1")
  }

  private def chains(df: DataFrame): Map[Long, Long] =
    AssemblyOps.stitchChains(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("three ways end-to-end merge into one chain") {
    val d = ways(
      (1L, 0L, 0L, 10L, 0L),
      (2L, 10L, 0L, 20L, 0L),
      (3L, 20L, 0L, 30L, 5L))
    assert(chains(d) === Map(1L -> 3L))
  }

  test("direction does not matter: reversed middle way still stitches") {
    val d = ways(
      (1L, 0L, 0L, 10L, 0L),
      (2L, 20L, 0L, 10L, 0L), // reversed
      (3L, 20L, 0L, 30L, 5L))
    assert(chains(d) === Map(1L -> 3L))
  }

  test("a junction of three way-ends breaks the chain on both sides") {
    val d = ways(
      (1L, 0L, 0L, 10L, 0L),
      (2L, 10L, 0L, 20L, 0L),
      (3L, 10L, 0L, 10L, 9L)) // spur at the shared node -> degree 3
    assert(chains(d) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a closed loop never self-stitches; isolated ways are their own chain") {
    val d = ways(
      (1L, 0L, 0L, 0L, 0L),   // loop: both ends at one node, same way
      (2L, 50L, 50L, 60L, 60L))
    assert(chains(d) === Map(1L -> 1L, 2L -> 1L))
  }

  test("two separate chains keep separate ids (min member way_id)") {
    val d = ways(
      (5L, 0L, 0L, 10L, 0L),
      (4L, 10L, 0L, 20L, 0L),
      (9L, 100L, 0L, 110L, 0L),
      (8L, 110L, 0L, 120L, 0L))
    assert(chains(d) === Map(4L -> 2L, 8L -> 2L))
  }
}
