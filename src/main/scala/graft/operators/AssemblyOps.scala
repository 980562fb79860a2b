package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Planar, Wkt}

/** Entity assembly — the reference's signature computation re-expressed
  * Spark-first.
  *
  *  - CoordinatesForWays (handler/coordinates_for_ways.hpp:38-84): the
  *    node-location join = posexplode → equi-join → ordered re-collect.
  *  - Relation member assembly (relations/assembler.hpp:127-521): the
  *    2-pass sorted-lookup join = explode members → join ways → groupBy
  *    relation.
  *  - Multipolygon ring building (multipolygon/builder.hpp:182-974): a
  *    deterministic per-relation computation → typed flatMapGroups. Ring
  *    growth follows the builder's greedy endpoint matching with way
  *    inversion (complete_ring :484-526), inner/outer classification is
  *    containment parity (:694-752), final orientation outer-CW/inner-CCW
  *    (:885-892), area ids follow osm/area.hpp:71-84 (way → id*2,
  *    relation → id*2 + sgn(id)).
  */
object AssemblyOps {

  case class MemberWay(relId: Long, memberPos: Int, wayId: Long,
                       xs: Array[Long], ys: Array[Long])
  case class Area(areaId: Long, origId: Long, fromWay: Boolean,
                  nOuter: Int, nInner: Int, status: String, wkt: String)

  /** Node-location join: ways(way_id, refs array<long>) ⋈ nodes(id, x, y)
    * → ways with coordinate arrays, member order preserved via posexplode.
    * Canonical equi-join of the engine; Catalyst picks broadcast vs SMJ by
    * stats (the analog of the reference's user-selected byid stores).
    */
  def coordinatesForWays(ways: DataFrame, nodes: DataFrame): DataFrame =
    ways.select(col("way_id"), posexplode(col("refs")).as(Seq("pos", "ref")))
      .join(nodes, col("ref") === nodes("id"))
      .groupBy("way_id")
      .agg(
        sort_array(collect_list(struct(col("pos"), col("x"), col("y")))).as("pts"))
      .select(col("way_id"),
        col("pts.x").as("xs"),
        col("pts.y").as("ys"))

  /** Ways referenced by no relation (left-anti join — the reference's
    * way_not_in_any_relation callback, relations/assembler.hpp:424-427).
    */
  def waysNotInAnyRelation(ways: DataFrame, relMembers: DataFrame): DataFrame =
    ways.join(relMembers.select(col("way_id")).distinct(), Seq("way_id"), "left_anti")

  /** Closed standalone ways with >= 4 nodes become areas directly
    * (multipolygon/assembler.hpp:88-95), area_id = way_id * 2.
    */
  def areasFromClosedWays(spark: SparkSession, ways: DataFrame): Dataset[Area] = {
    import spark.implicits._
    ways.filter(size(col("xs")) >= 4 &&
        element_at(col("xs"), 1) === element_at(col("xs"), -1) &&
        element_at(col("ys"), 1) === element_at(col("ys"), -1))
      .select(col("way_id"), col("xs"), col("ys"))
      .as[(Long, Array[Long], Array[Long])]
      .map { case (wayId, xs, ys) =>
        val (ox, oy) = Planar.open(xs, ys)
        if (!Planar.isSimpleRing(ox, oy))
          Area(wayId * 2, wayId, fromWay = true, 0, 0, "InvalidRing", null)
        else {
          // outer ring must be CW in the final geometry (builder.hpp:885-892)
          val (cx, cy) = if (Planar.isCCW(ox, oy)) (ox.reverse, oy.reverse) else (ox, oy)
          val wkt = Wkt.multiPolygon(Seq(Seq((closeI(cx), closeI(cy)))))
          Area(wayId * 2, wayId, fromWay = true, 1, 0, "ok", wkt)
        }
      }
  }

  /** Assemble multipolygon areas from relation members: groupBy relation →
    * per-group deterministic ring building. Embarrassingly parallel across
    * relations; one shuffle on rel_id.
    */
  def assembleAreas(spark: SparkSession, members: Dataset[MemberWay]): Dataset[Area] = {
    import spark.implicits._
    members.groupByKey(_.relId).flatMapGroups { (relId, it) =>
      val ways = it.toArray.sortBy(_.memberPos)
      assembleOne(relId, ways)
    }
  }

  /** Deterministic single-relation assembly (pure function — unit-testable
    * without Spark). Mirrors Builder::build (builder.hpp:308-324) minus the
    * repair modes (round-1 scope; errors reported as status rows, matching
    * the error taxonomy at builder.hpp:59-87).
    */
  def assembleOne(relId: Long, ways: Array[MemberWay]): Iterator[Area] = {
    val areaId = relId * 2 + java.lang.Long.signum(relId)
    if (ways.isEmpty)
      return Iterator(Area(areaId, relId, fromWay = false, 0, 0, "NoRings", null))

    // greedy ring growth with endpoint matching + way inversion
    // (complete_ring, builder.hpp:484-526); scan order = member order.
    val used = new Array[Boolean](ways.length)
    val rings = scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Array[Long])]
    var dangling = false
    var i = 0
    while (i < ways.length && !dangling) {
      if (!used(i)) {
        used(i) = true
        var xs = ways(i).xs.toBuffer
        var ys = ways(i).ys.toBuffer
        var closed = xs.length >= 4 && xs.head == xs.last && ys.head == ys.last
        var progress = true
        while (!closed && progress) {
          progress = false
          var j = 0
          while (j < ways.length && !progress) {
            if (!used(j)) {
              val w = ways(j)
              if (w.xs.head == xs.last && w.ys.head == ys.last) {
                xs ++= w.xs.drop(1); ys ++= w.ys.drop(1); used(j) = true; progress = true
              } else if (w.xs.last == xs.last && w.ys.last == ys.last) {
                xs ++= w.xs.reverse.drop(1); ys ++= w.ys.reverse.drop(1); used(j) = true; progress = true
              }
            }
            j += 1
          }
          closed = xs.length >= 4 && xs.head == xs.last && ys.head == ys.last
        }
        if (closed) rings += ((xs.toArray, ys.toArray))
        else dangling = true
      }
      i += 1
    }
    if (dangling || rings.isEmpty)
      return Iterator(Area(areaId, relId, fromWay = false, 0, 0,
        if (dangling) "DanglingEnds" else "NoRings", null))

    val open = rings.map { case (xs, ys) => Planar.open(xs, ys) }
    if (open.exists { case (xs, ys) => !Planar.isSimpleRing(xs, ys) })
      return Iterator(Area(areaId, relId, fromWay = false, 0, 0, "InvalidRing", null))

    // inner/outer by containment parity (builder.hpp:694-752): a ring
    // contained in an even number of other rings is an outer ring.
    val n = open.length
    val containedBy = Array.tabulate(n) { a =>
      (0 until n).filter(b => b != a &&
        Planar.pointInRing(open(a)._1(0), open(a)._2(0), open(b)._1, open(b)._2) &&
        ringAreaAbs(open(b)) > ringAreaAbs(open(a))).toArray
    }
    val isInner = containedBy.map(_.length % 2 == 1)

    // group each inner ring under its smallest containing outer ring
    val outers = (0 until n).filter(!isInner(_))
    val polys = outers.map { o =>
      val holes = (0 until n).filter(a => isInner(a) && containedBy(a).contains(o) &&
        // direct containment: no other outer between them
        !outers.exists(o2 => o2 != o && containedBy(a).contains(o2) &&
          containedBy(o2).contains(o)))
      // orientation: outer CW, holes CCW (builder.hpp:885-892)
      val (oxs, oys) = orient(open(o), ccw = false)
      val rs = Seq((closeI(oxs), closeI(oys))) ++ holes.map { h =>
        val (hx, hy) = orient(open(h), ccw = true)
        (closeI(hx), closeI(hy))
      }
      rs
    }
    val wkt = Wkt.multiPolygon(polys)
    Iterator(Area(areaId, relId, fromWay = false, outers.length,
      isInner.count(identity), "ok", wkt))
  }

  private def ringAreaAbs(r: (Array[Long], Array[Long])): BigInt =
    Planar.signedArea2(r._1, r._2).abs

  private def orient(r: (Array[Long], Array[Long]), ccw: Boolean): (Array[Long], Array[Long]) =
    if (Planar.isCCW(r._1, r._2) == ccw) r else (r._1.reverse, r._2.reverse)

  private def closeI(a: Array[Long]): Array[Int] = {
    val c = a :+ a(0)
    c.map(_.toInt)
  }
}
