package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic OSM-style entity synthesis (nodes/ways/relations) for the
  * assembly pipeline — the conformance-plane input. Pure arithmetic, no
  * randomness; shapes exercise the reference's assembly semantics:
  * split outer rings, reversed member ways, holes, dangling-end errors,
  * closed standalone ways (multipolygon/assembler.hpp:60-95 selection
  * rules).
  *
  * Per group g (relation id g+1):
  *  - outer square (side 4e6 fix = 0.4°) split into two 3-point ways
  *  - g % 3 == 1: the second way is reversed (tests inversion)
  *  - g % 4 == 2: a closed inner-hole way is added (role inner)
  *  - g % 12 == 7: TWO adjacent inner holes sharing an edge (shared node
  *    refs) → the touching-inner-rings merge collapses them to one hole
  *  - g % 17 == 5: the second outer way is OMITTED → DanglingEnds error
  *  - g % 6 == 0: additionally a standalone closed way (id 100000+g+1) that
  *    is in no relation → becomes an area directly (area_id = way_id*2)
  */
object OsmSynth {
  case class Node(id: Long, x: Long, y: Long)
  case class Way(way_id: Long, refs: Array[Long], closed: Boolean,
                 tags: Map[String, String])
  case class Rel(rel_id: Long, tags: Map[String, String])
  case class RelMember(rel_id: Long, member_pos: Int, way_id: Long, role: String)

  val Side = 4000000L

  def baseX(g: Int): Long = (g % 40).toLong * 10000000L - 200000000L
  def baseY(g: Int): Long = (g / 40).toLong * 10000000L - 200000000L

  def generate(numGroups: Int): (Seq[Node], Seq[Way], Seq[Rel], Seq[RelMember]) = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    val ways = scala.collection.mutable.ArrayBuffer.empty[Way]
    val rels = scala.collection.mutable.ArrayBuffer.empty[Rel]
    val members = scala.collection.mutable.ArrayBuffer.empty[RelMember]

    for (g <- 0 until numGroups) {
      val relId = g + 1L
      val nid = 1000L * relId
      // relation tags: type marker always; landuse only on even groups so
      // odd groups exercise the untagged-relation tag-merge path
      rels += Rel(relId, Map("type" -> "multipolygon") ++
        (if (g % 2 == 0) Map("landuse" -> "forest") else Map.empty))
      val bx = baseX(g); val by = baseY(g)
      // outer square corners c0..c3 (CCW)
      val corners = Array((bx, by), (bx + Side, by), (bx + Side, by + Side), (bx, by + Side))
      corners.zipWithIndex.foreach { case ((x, y), i) => nodes += Node(nid + i, x, y) }
      // way A: c0-c1-c2 ; way B: c2-c3-c0
      val wayA = 10L * relId
      val wayB = 10L * relId + 1
      ways += Way(wayA, Array(nid, nid + 1, nid + 2), closed = false, Map.empty)
      val refsB = Array(nid + 2, nid + 3, nid)
      // g%5==1: tagged outer way (merged into the area iff relation untagged)
      ways += Way(wayB, if (g % 3 == 1) refsB.reverse else refsB, closed = false,
        if (g % 5 == 1) Map("landuse" -> "meadow") else Map.empty)
      members += RelMember(relId, 0, wayA, "outer")
      if (g % 17 != 5) members += RelMember(relId, 1, wayB, "outer")
      // hole: quarter-size closed way in the center
      if (g % 4 == 2) {
        val q = Side / 4
        val h = Array((bx + q, by + q), (bx + 3 * q, by + q), (bx + 3 * q, by + 3 * q), (bx + q, by + 3 * q))
        h.zipWithIndex.foreach { case ((x, y), i) => nodes += Node(nid + 10 + i, x, y) }
        val wayH = 10L * relId + 2
        // g%8==2: tagged hole -> extra one-way-inner-ring area emitted
        ways += Way(wayH, Array(nid + 10, nid + 11, nid + 12, nid + 13, nid + 10),
          closed = true,
          if (g % 8 == 2) Map("natural" -> "water") else Map.empty)
        members += RelMember(relId, 2, wayH, "inner")
      }
      // two adjacent holes sharing an edge (same shared node ids n31/n32,
      // as real OSM data would) — exercises builder.hpp:804-866
      if (g % 12 == 7) {
        val q = Side / 4
        val pts = Array(
          (bx + q, by + q), (bx + 2 * q, by + q), (bx + 2 * q, by + 2 * q),
          (bx + q, by + 2 * q), (bx + 3 * q, by + q), (bx + 3 * q, by + 2 * q))
        pts.zipWithIndex.foreach { case ((x, y), i) => nodes += Node(nid + 30 + i, x, y) }
        val holeL = 10L * relId + 2
        val holeR = 10L * relId + 3
        ways += Way(holeL,
          Array(nid + 30, nid + 31, nid + 32, nid + 33, nid + 30), closed = true, Map.empty)
        ways += Way(holeR,
          Array(nid + 31, nid + 34, nid + 35, nid + 32, nid + 31), closed = true, Map.empty)
        members += RelMember(relId, 2, holeL, "inner")
        members += RelMember(relId, 3, holeR, "inner")
      }
      // standalone closed way, in no relation
      if (g % 6 == 0) {
        val sx = bx + 2 * Side; val sy = by
        val s = Array((sx, sy), (sx + Side, sy), (sx + Side, sy + Side), (sx, sy + Side))
        s.zipWithIndex.foreach { case ((x, y), i) => nodes += Node(nid + 20 + i, x, y) }
        ways += Way(100000L + relId,
          Array(nid + 20, nid + 21, nid + 22, nid + 23, nid + 20), closed = true,
          Map("building" -> "yes"))
      }
    }
    (nodes.toSeq, ways.toSeq, rels.toSeq, members.toSeq)
  }

  def frames(spark: SparkSession, numGroups: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val (nodes, ways, rels, members) = generate(numGroups)
    (nodes.toDF(), ways.toDF(), rels.toDF(), members.toDF())
  }
}
