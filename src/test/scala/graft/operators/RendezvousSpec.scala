package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Rendezvous hashing: the minimal-movement invariant (dropping the last
  * shard reassigns ONLY its keys) and assignment balance sanity.
  */
class RendezvousSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("dropping the last shard moves only that shard's keys") {
    val s = spark; import s.implicits._
    val keys = (0L until 2000L).toDF("k")
    def assign(n: Int): Map[Long, Long] =
      IdOps.rendezvousAssign(keys, "k", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val with16 = assign(16)
    val with15 = assign(15)
    val movedFrom15 = with16.filter { case (k, sh) =>
      sh == 15L // keys that lived on the dropped shard
    }.keySet
    for ((k, sh) <- with16) {
      if (sh != 15L)
        assert(with15(k) === sh, s"key $k moved off surviving shard $sh")
      else
        assert(with15(k) !== 15L)
    }
    // balance sanity: no shard is empty and none holds > 3x the mean
    val sizes = with16.values.groupBy(identity).map(_._2.size)
    assert(sizes.size === 16 && sizes.min > 0 && sizes.max < 3 * 2000 / 16,
      s"imbalanced: $sizes")
    assert(movedFrom15.nonEmpty, "sanity: shard 15 held some keys")
  }
}
