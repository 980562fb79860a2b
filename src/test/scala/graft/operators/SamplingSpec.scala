package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SamplingOps.systematicSample: exact-k, partitioning-independence,
  * heavy-row absorption, weight proportionality.
  */
class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def df(rows: Seq[(Long, Long)], parts: Int): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "w").repartition(parts)
  }

  /** Single-threaded reference: prefix sums in id order, slot rule. */
  private def ref(rows: Seq[(Long, Long)], k: Long): Set[Long] = {
    val sorted = rows.sortBy(_._1)
    val total = sorted.map(_._2).sum
    var cum = 0L
    sorted.flatMap { case (id, w) =>
      val lo = cum; cum += w
      if (BigInt(cum) * k / total > BigInt(lo) * k / total) Some(id) else None
    }.toSet
  }

  private def run(rows: Seq[(Long, Long)], k: Long, parts: Int): Set[Long] =
    SamplingOps.systematicSample(df(rows, parts), "id", "w", k)
      .collect().map(_.getLong(0)).toSet

  test("weightedSampleGrouped: per-group A-Res matches driver replication") {
    val s2 = spark; import s2.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0L until 300L).map(i =>
      ("g" + (i % 4), i, 1L + rnd.nextInt(40).toLong))
    val got = SamplingOps.weightedSampleGrouped(
        rows.toDF("grp", "id", "w"), "grp", "id", "w", 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    def key(id: Long, w: Long): Long = {
      val u = (graft.core.TextHash.mixId(id) % 1048576L) + 1L
      graft.core.Hll.lnE6(1048576.0 / u.toDouble) * 1000000L / w
    }
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map { case (_, id, w) => (id, w, key(id, w)) }
        .sortBy(t => (t._3, t._1)).take(10).zipWithIndex
        .map { case ((id, w, rk), i) => (g, id, w, rk, i + 1L) }
    }.toSet
    assert(got === want)
    // every group contributes exactly min(10, |group|) rows
    assert(got.groupBy(_._1).forall(_._2.size == 10))
  }

  test("exact k selected on random positive weights, matches reference") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 400L).map(i => (i, 1L + rnd.nextInt(50).toLong))
    val got = run(rows, 37, 8)
    assert(got.size === 37)
    assert(got === ref(rows, 37))
  }

  test("selection is independent of input partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((1L to 300L).map(i => (i, 1L + rnd.nextInt(9).toLong)))
    val a = run(rows, 29, 1)
    val b = run(rows, 29, 7)
    val c = run(rows, 29, 32)
    assert(a === b)
    assert(b === c)
    assert(a.size === 29)
  }

  test("a row heavier than W/k absorbs slots: sample smaller than k, row kept") {
    // one row carries half the total weight
    val rows = (1L to 99L).map(i => (i, 1L)) :+ (100L, 99L)
    val got = run(rows, 10, 4)
    assert(got.contains(100L))
    assert(got.size < 10)
    assert(got === ref(rows, 10))
  }

  test("zero-weight rows are never selected") {
    val rows = (1L to 50L).map(i => (i, if (i % 2 == 0) 3L else 0L))
    val got = run(rows, 13, 4)
    assert(got.forall(_ % 2 == 0))
    assert(got === ref(rows, 13))
  }

  test("heavy rows are proportionally more likely across many ids") {
    val rows = (1L to 1000L).map(i => (i, if (i <= 100) 20L else 1L))
    // heavy block holds 2000/2900 of the mass -> of 29 slots, ~20 land there
    val got = run(rows, 29, 8)
    val heavy = got.count(_ <= 100)
    assert(heavy >= 18 && heavy <= 22, s"heavy=$heavy")
    assert(got === ref(rows, 29))
  }
}
