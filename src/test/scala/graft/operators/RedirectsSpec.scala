package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CrawlOps.resolveRedirects vs a sequential chain walker. */
class RedirectsSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** Walk with visited-set cycle detection. */
  private def refResolve(f: Map[Long, Long]): Map[Long, (Option[Long], Long)] =
    f.keys.map { s =>
      var cur = s
      var seen = Set.empty[Long]
      while (f.contains(cur) && !seen(cur)) { seen += cur; cur = f(cur) }
      s -> (if (f.contains(cur)) (None, 1L) else (Some(cur), 0L))
    }.toMap

  test("matches a sequential walker on a seeded functional graph") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(91)
    // ~2/3 of nodes redirect somewhere random — long chains AND cycles
    val f = (0L until 300L).filter(_ % 3 != 2)
      .map(i => i -> rnd.nextInt(300).toLong).toMap
    val got = CrawlOps.resolveRedirects(f.toSeq.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2))).toMap
    assert(got === refResolve(f))
  }

  test("distributed doubling loop matches the single-shard walker") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(53)
    val f = (0L until 250L).filter(_ % 4 != 3)
      .map(i => i -> rnd.nextInt(250).toLong).toMap
    val edges = f.toSeq.toDF("src", "dst")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2))).toMap
    val viaLoop = rowsOf(CrawlOps.resolveRedirectsLoop(
      edges, f.size.toLong, new graft.core.CacheScope))
    val viaLocal = rowsOf(CrawlOps.resolveRedirects(edges))
    assert(viaLocal === viaLoop)
  }

  test("long chain resolves; self-loop and 2-cycle flagged") {
    val s = spark; import s.implicits._
    // chain 0→1→…→40 (terminal), self-loop 100→100, 2-cycle 200↔201
    val f = (0L until 40L).map(i => i -> (i + 1)) ++
      Seq(100L -> 100L, 200L -> 201L, 201L -> 200L)
    val got = CrawlOps.resolveRedirects(f.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2))).toMap
    assert((0L until 40L).forall(i => got(i) == (Some(40L), 0L)))
    assert(got(100L) == (None, 1L) && got(200L) == (None, 1L) &&
      got(201L) == (None, 1L))
  }
}
