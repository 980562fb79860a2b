package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpatialOps.polygonAdjacency (single edge-key join formulation) vs a
  * brute-force reference over the raw cell list: per unordered polygon
  * pair, n_border = Σ over geometric 4-adjacent cell edges (u,v) of
  * |polys(u)| × |polys(v)| cross combinations with distinct polys
  * (folded by least/greatest), n_shared = per-cell p<q coverage pairs —
  * exactly the contract of the former three-self-join formulation.
  */
class PolygonAdjacencySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("edge-key join matches the brute-force contact matrix") {
    val s = spark; import s.implicits._
    // overlapping footprints, multi-coverage cells, a diagonal-only pair
    // (must NOT count), same-poly adjacency (must NOT count)
    val cells = Seq(
      (1L, 0L, 0L), (1L, 1L, 0L),             // poly 1: two cells
      (2L, 2L, 0L), (2L, 0L, 1L),             // poly 2: borders 1 twice
      (3L, 1L, 0L), (3L, 1L, 1L),             // poly 3: shares (1,0) with 1
      (4L, 3L, 1L))                           // poly 4: diagonal to 2 only
    val got = SpatialOps.polygonAdjacency(
        cells.toDF("poly_id", "cell_x", "cell_y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // brute force
    val byCell = cells.groupBy(c => (c._2, c._3)).view
      .mapValues(_.map(_._1).distinct).toMap
    val borders = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    val shared = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for {
      ((x, y), ps) <- byCell
      (dx, dy) <- Seq((1L, 0L), (0L, 1L))
      qs <- byCell.get((x + dx, y + dy)).toSeq
      p <- ps; q <- qs if p != q
    } borders((math.min(p, q), math.max(p, q))) += 1L
    for {
      (_, ps) <- byCell
      p <- ps; q <- ps if p < q
    } shared((p, q)) += 1L
    val want = (borders.keySet ++ shared.keySet).map(k =>
      k -> (borders(k), shared(k))).toMap
    assert(got === want)
    // the diagonal-only pair must be absent entirely
    assert(!got.contains((2L, 4L)))
  }
}
