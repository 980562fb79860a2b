package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HistoryOps.concurrencyProfile vs a sequential sweep reference. */
class ConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def refSweep(iv: Seq[(Long, Option[Long])]): Map[Long, Long] = {
    val deltas = iv.map(i => i._1 -> 1L) ++
      iv.flatMap(i => i._2.map(_ -> -1L))
    val byT = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    byT.scanLeft((0L, 0L)) { case ((_, acc), (t, d)) => (t, acc + d) }
      .drop(1).toMap
  }

  test("matches a sequential sweep across bucket boundaries") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(83)
    // starts scattered over 40 buckets of width 100; ~10% open-ended
    val iv = Seq.fill(800) {
      val st = rnd.nextInt(4000).toLong
      val end = if (rnd.nextInt(10) == 0) None
                else Some(st + 1 + rnd.nextInt(900))
      (st, end)
    }
    val df = iv.map(i => (i._1, i._2.map(java.lang.Long.valueOf).orNull))
      .toDF("s_us", "e_us")
    val got = HistoryOps.concurrencyProfile(df, "s_us", "e_us", 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refSweep(iv))
  }

  test("instant where an interval ends as another starts nets to zero") {
    val s = spark; import s.implicits._
    val df = Seq((0L, Some(10L)), (10L, Some(20L)))
      .map(i => (i._1, i._2.map(java.lang.Long.valueOf).orNull))
      .toDF("s_us", "e_us")
    val got = HistoryOps.concurrencyProfile(df, "s_us", "e_us", 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 10L -> 1L, 20L -> 0L))
  }
}
