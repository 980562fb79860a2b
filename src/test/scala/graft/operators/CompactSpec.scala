package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpatialOps.compactCells vs a sequential bottom-up reference. */
class CompactSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def refCompact(cells: Set[(Long, Long)],
                         level: Int): Set[(Long, Long, Long)] = {
    var cur = cells
    var out = Set.empty[(Long, Long, Long)]
    for (lv <- level to 1 by -1) {
      val full = cur.groupBy(c => (c._1 / 2, c._2 / 2))
        .filter(_._2.size == 4).keySet
      out ++= cur.filterNot(c => full((c._1 / 2, c._2 / 2)))
        .map(c => (lv.toLong, c._1, c._2))
      cur = full
    }
    out ++ cur.map(c => (0L, c._1, c._2))
  }

  /** Expand a compacted cell back to its level-`level` descendants. */
  private def expand(lv: Long, bx: Long, by: Long,
                     level: Int): Set[(Long, Long)] = {
    val f = 1L << (level - lv.toInt)
    (for (i <- 0L until f; j <- 0L until f)
      yield (bx * f + i, by * f + j)).toSet
  }

  test("matches the sequential reference on a seeded cell set") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(71)
    // dense 32x32 region with holes → multi-level promotions
    val cells = (for (x <- 0L until 32; y <- 0L until 32
                      if rnd.nextInt(10) > 0) yield (x, y)).toSet
    val got = SpatialOps.compactCells(cells.toSeq.toDF("bx", "by"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === refCompact(cells, 5))
  }

  test("a full grid compacts to the single root cell") {
    val s = spark; import s.implicits._
    val cells = (for (x <- 0L until 8; y <- 0L until 8) yield (x, y))
    val got = SpatialOps.compactCells(cells.toDF("bx", "by"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L, 0L)))
  }

  test("keyed compaction treats each group independently") {
    val s = spark; import s.implicits._
    // group 1: full 4x4 block -> one level-1 promotion chain to a single
    // level-... cell; group 2: same coords minus one cell -> partial
    val full = for (x <- 0L until 4; y <- 0L until 4) yield (1L, x, y)
    val holed = full.filterNot(c => c._2 == 3 && c._3 == 3).map(c => (2L, c._2, c._3))
    val got = SpatialOps.compactCells(
        (full ++ holed).toDF("gid", "bx", "by"), 2, keys = Seq("gid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val g1 = got.filter(_._2 == 1L)
    val g2 = got.filter(_._2 == 2L)
    assert(g1 === Set((0L, 1L, 0L, 0L))) // full block -> the root cell
    // holed group: 3 complete level-1 siblings + 3 loose level-2 cells
    assert(g2 === Set((1L, 2L, 0L, 0L), (1L, 2L, 1L, 0L), (1L, 2L, 0L, 1L),
      (2L, 2L, 2L, 3L), (2L, 2L, 3L, 2L), (2L, 2L, 2L, 2L)))
  }

  test("distributed rounds match the grouped one-shuffle twin") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(97)
    // keyed: several groups with dense-and-holed footprints
    val keyed = (for (g <- 1L to 5L; x <- 0L until 16; y <- 0L until 16
                      if rnd.nextInt(12) > 0) yield (g, x, y))
    val kdf = keyed.toDF("gid", "bx", "by")
    val viaRounds = SpatialOps.compactCellsRounds(
        kdf.distinct(), 4, keys = Seq("gid"), new graft.core.CacheScope)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val viaGrouped = SpatialOps.compactCells(kdf, 4, keys = Seq("gid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaGrouped === viaRounds)
    // unkeyed: single-set twin
    val flat = keyed.filter(_._1 == 3L).map(c => (c._2, c._3)).toDF("bx", "by")
    val fRounds = SpatialOps.compactCellsRounds(
        flat.distinct(), 4, Nil, new graft.core.CacheScope)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fGrouped = SpatialOps.compactCells(flat, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fGrouped === fRounds)
  }

  test("cover invariants: exact union, disjoint, no complete sibling group") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(29)
    val cells = Seq.fill(300)((rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
      .toSet
    val rows = SpatialOps.compactCells(cells.toSeq.toDF("bx", "by"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expanded = rows.map(c => expand(c._1, c._2, c._3, 6))
    assert(expanded.map(_.size).sum === expanded.reduce(_ ++ _).size) // disjoint
    assert(expanded.reduce(_ ++ _) === cells)                         // exact
    rows.groupBy(c => (c._1, c._2 / 2, c._3 / 2)).foreach { case (_, g) =>
      assert(g.length < 4) // no surviving complete 2x2 group at any level
    }
  }
}
