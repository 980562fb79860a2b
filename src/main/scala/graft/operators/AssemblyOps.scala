package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Haversine, FixedPoint, Planar, Wkt}

/** Entity assembly — the reference's signature computation re-expressed
  * Spark-first.
  *
  *  - CoordinatesForWays (handler/coordinates_for_ways.hpp:38-84): the
  *    node-location join = posexplode → equi-join → ordered re-collect.
  *  - Relation member assembly (relations/assembler.hpp:127-521): the
  *    2-pass sorted-lookup join = explode members → join ways → groupBy
  *    relation.
  *  - Multipolygon ring building (multipolygon/builder.hpp:182-974): a
  *    deterministic per-relation computation → typed flatMapGroups:
  *      · recursive backtracking ring growth with way inversion, matched
  *        by node ref (complete_ring :484-526, make_one_ring :533-549)
  *      · dangling-end repair: sort-and-cancel end nodes, connect closest
  *        pairs with pseudo-ways, re-run ring building (:550-637,684-687)
  *      · inner/outer classification by containment parity (:694-752)
  *      · tag logic: ignore {type,created_by,source,note} (:202-208),
  *        same_tags/untagged/merge_tags (:216-285), one-way inner rings
  *        with own tags emit EXTRA areas (:758-780), outer-way tags merged
  *        when the relation is untagged or single-ring-single-way
  *        (:922-945)
  *      · final orientation outer-CW/inner-CCW (:885-892)
  *      · area ids follow osm/area.hpp:71-84 (way → id*2, relation →
  *        id*2 + sgn(id)); errors surface as status rows matching the
  *        taxonomy at builder.hpp:59-87.
  *      · non-simple rings salvaged by the binary-search cut
  *        (create_non_intersecting_linear_ring :342-422, Planar.salvageRing)
  *        when repairing; un-salvageable rings dropped (ring_is_complete
  *        :449-479 returns null)
  *    Ring matching is by node REF with full recursive backtracking, as in
  *    the reference. Remaining deviation (documented): polygon validity is
  *    ring-simplicity (no GEOS isValid equivalent).
  */
object AssemblyOps {

  case class MemberWay(relId: Long, memberPos: Int, wayId: Long,
                       refs: Array[Long], xs: Array[Long], ys: Array[Long],
                       tags: Map[String, String], relTags: Map[String, String],
                       tsMicros: Long = 0L, relTsMicros: Long = 0L)
  case class Area(areaId: Long, origId: Long, fromWay: Boolean,
                  nOuter: Int, nInner: Int, status: String, wkt: String,
                  tags: Map[String, String], tsMicros: Long = 0L)

  /** builder.hpp:202-208 */
  private val IgnoredTagKeys = Set("type", "created_by", "source", "note")

  private def significant(tags: Map[String, String]): Map[String, String] =
    tags.view.filterKeys(k => !IgnoredTagKeys.contains(k)).toMap

  private def untagged(tags: Map[String, String]): Boolean = significant(tags).isEmpty

  private def sameTags(a: Map[String, String], b: Map[String, String]): Boolean =
    significant(a) == significant(b)

  // -------------------------------------------------------------------------

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

  /** Referential-integrity report — the `osmium check-refs -r` analog
    * (the reference's missing-member accounting: relations/assembler
    * counts members that never resolve and reports them instead of
    * assembling). Every (mtype, ref) member pointing at a nonexistent
    * entity is a dangling reference; the report aggregates them per
    * member type with the count of distinct relations impacted.
    *
    * Scale posture: one unioned (type, id) entity projection, ONE
    * left-anti shuffle-hash join on (mtype, ref) — no per-type passes,
    * no broadcast assumption (at 10¹² rows both sides are large), then
    * a 3-group aggregate. countDistinct's expand is over the tiny
    * anti-join survivors, not the corpus.
    *
    * Inputs: members(rel_id, member_pos, mtype in 'n'/'w'/'r', ref);
    * entity tables as (id, ...). Output (mtype, n_missing, n_rels) — one
    * row per type ALWAYS, zeros when clean (a clean corpus reports
    * "0 missing", not an empty frame).
    */
  def checkRefs(members: DataFrame, nodes: DataFrame, ways: DataFrame,
                rels: DataFrame): DataFrame = {
    val sess = members.sparkSession
    import sess.implicits._
    val entities = nodes.select(lit("n").as("mtype"), col("id").as("ref"))
      .unionByName(ways.select(lit("w").as("mtype"), col("id").as("ref")))
      .unionByName(rels.select(lit("r").as("mtype"), col("id").as("ref")))
    val dangling = members.join(entities, Seq("mtype", "ref"), "left_anti")
      .groupBy("mtype")
      .agg(count(lit(1)).as("m"), countDistinct(col("rel_id")).as("r"))
    Seq("n", "w", "r").toDF("mtype").join(dangling, Seq("mtype"), "left")
      .select(col("mtype"), coalesce(col("m"), lit(0L)).as("n_missing"),
        coalesce(col("r"), lit(0L)).as("n_rels"))
  }

  /** Generic Relations::Assembler for node/way/relation members
    * (relations/assembler.hpp:365-470 HandlerPass2 + relation_info.hpp:45-123):
    * typed members resolve against their entity tables (the equal_range
    * lookup becomes a per-type left equi-join), carrying each found
    * member's payload into the relation. complete_relation fires only when
    * need_members reaches 0, i.e. every kept member resolved — incomplete
    * relations never reach the output, exactly as in the reference.
    *
    * Inputs: members(rel_id, member_pos, mtype in 'n'/'w'/'r', ref); each
    * entity table as (id, payload). The N/W/R template flags become
    * keep-member booleans. Output per complete relation: member counts per
    * type, the ORDERED member list, and the payload sum (evidence the
    * member data actually attached).
    *
    * Member ORDER is semantic, not incidental — a route relation's member
    * sequence IS the route (the reference threads member_pos through
    * assembly for exactly this reason, relations/relation_info.hpp:45-123)
    * — so the output carries members as
    * array<struct<member_pos, mtype, ref, payload>> sorted by member_pos.
    * The sort happens per-group inside the one rel_id shuffle the
    * aggregation already pays (sort_array over collect_list); no extra
    * shuffle, no window.
    */
  def assembleGeneric(members: DataFrame,
                      nodes: DataFrame, ways: DataFrame, rels: DataFrame,
                      wantN: Boolean = true, wantW: Boolean = true,
                      wantR: Boolean = true): DataFrame = {
    val ents = Seq(("n", wantN, nodes), ("w", wantW, ways), ("r", wantR, rels))
    val resolved = ents.collect { case (t, true, e) =>
      members.filter(col("mtype") === t)
        .join(e.select(col("id").as("ref"), col("payload"), lit(1).as("__found")),
          Seq("ref"), "left")
        .select(col("rel_id"), col("member_pos"), col("mtype"), col("ref"),
          col("payload"), col("__found"))
    }.reduce(_ unionByName _)
    // resolution is keyed on the join MATCH (__found), not on the payload —
    // an entity with a legitimately null payload still resolves its member
    resolved.groupBy("rel_id").agg(
        count(lit(1)).as("n_members"),
        count(col("__found")).as("n_resolved"),
        sum(when(col("mtype") === "n" && col("__found").isNotNull, 1L).otherwise(0L)).as("n_nodes"),
        sum(when(col("mtype") === "w" && col("__found").isNotNull, 1L).otherwise(0L)).as("n_ways"),
        sum(when(col("mtype") === "r" && col("__found").isNotNull, 1L).otherwise(0L)).as("n_rels"),
        sort_array(collect_list(struct(col("member_pos"), col("mtype"),
          col("ref"), col("payload")))).as("members"),
        sum(col("payload")).as("payload_sum"))
      .filter(col("n_members") === col("n_resolved"))
      .drop("n_resolved")
  }

  /** Per-type not-in-any-relation callbacks (assembler.hpp:198-230:
    * node_/way_/relation_not_in_any_relation) as a left-anti join of the
    * entity table against the kept members of that type.
    */
  def entitiesNotInAnyRelation(entities: DataFrame, members: DataFrame,
                               mtype: String): DataFrame =
    entities.join(
      members.filter(col("mtype") === mtype).select(col("ref").as("id")).distinct(),
      Seq("id"), "left_anti")

  /** Way stitching: merge ways that meet end-to-end at degree-2 nodes
    * into maximal chains — the NETWORK-wide generalization of the ring
    * builder's way joining (multipolygon/builder.hpp:484-549 joins member
    * ways by matching end node refs inside one relation; this operator
    * does it across the whole way table). A node stitches iff EXACTLY two
    * way-ends meet there and they belong to two DIFFERENT ways (a
    * junction of 3+ ends breaks the chain on both sides; a closed loop's
    * own two ends never self-stitch). Chains = connected components of
    * the stitch edges (adaptive pointer jumping, O(3+log d) rounds);
    * untouched ways are their own chain.
    *
    * Shape: one hash shuffle groups way-ends by node coordinate, the
    * component loop shuffles on way ids only (two longs per edge), and
    * the final rollup is ONE shuffle on chain_id — nothing ever
    * broadcasts or collects the way table. Input: (way_id, x0, y0, x1,
    * y1) endpoint coords. Output: (chain_id = min member way_id, n_ways).
    */
  def stitchChains(ways: DataFrame): DataFrame = {
    val ends = ways.select(col("way_id"), col("x0").as("nx"), col("y0").as("ny"))
      .unionByName(ways.select(col("way_id"), col("x1").as("nx"), col("y1").as("ny")))
    val edges = ends.groupBy("nx", "ny")
      .agg(count(lit(1)).as("deg"),
        min(col("way_id")).as("src"), max(col("way_id")).as("dst"))
      .filter(col("deg") === 2 && col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val comp = GraphOps.connectedComponents(edges)
    ways.join(comp, ways("way_id") === comp("node_id"), "left")
      .select(coalesce(col("component"), col("way_id")).as("chain_id"))
      .groupBy("chain_id").agg(count(lit(1)).as("n_ways"))
  }

  /** Closed standalone ways with >= 4 nodes become areas directly
    * (multipolygon/assembler.hpp:88-95), area_id = way_id * 2.
    * Input: (way_id, xs, ys, tags).
    */
  def areasFromClosedWays(spark: SparkSession, ways: DataFrame): Dataset[Area] = {
    import spark.implicits._
    ways.filter(size(col("xs")) >= 4 &&
        element_at(col("xs"), 1) === element_at(col("xs"), -1) &&
        element_at(col("ys"), 1) === element_at(col("ys"), -1))
      .select(col("way_id"), col("xs"), col("ys"), col("tags"))
      .as[(Long, Array[Long], Array[Long], Map[String, String])]
      .map { case (wayId, xs, ys, tags) =>
        val (ox, oy) = Planar.open(xs, ys)
        if (!Planar.isSimpleRing(ox, oy))
          Area(wayId * 2, wayId, fromWay = true, 0, 0, "InvalidRing", null, tags)
        else {
          // outer ring must be CW in the final geometry (builder.hpp:885-892)
          val (cx, cy) = if (Planar.isCCW(ox, oy)) (ox.reverse, oy.reverse) else (ox, oy)
          val wkt = Wkt.multiPolygon(Seq(Seq((closeI(cx), closeI(cy)))))
          Area(wayId * 2, wayId, fromWay = true, 1, 0, "ok", wkt, tags)
        }
      }
  }

  /** Assemble multipolygon areas from relation members: groupBy relation →
    * per-group deterministic ring building. Embarrassingly parallel across
    * relations; one shuffle on rel_id.
    */
  def assembleAreas(spark: SparkSession, members: Dataset[MemberWay],
                    attemptRepair: Boolean = true): Dataset[Area] = {
    import spark.implicits._
    members.groupByKey(_.relId).flatMapGroups { (relId, it) =>
      val ways = it.toArray.sortBy(_.memberPos)
      assembleOne(relId, ways, attemptRepair)
    }
  }

  // ---- per-relation kernel (pure; unit-testable without Spark) -------------

  private case class WayBuf(wayId: Long, refs: Array[Long],
                            xs: Array[Long], ys: Array[Long],
                            tags: Map[String, String], pseudo: Boolean)
  private case class RingBuf(xs: Array[Long], ys: Array[Long], ways: Seq[WayBuf])

  def assembleOne(relId: Long, memberWays: Array[MemberWay],
                  attemptRepair: Boolean = true): Iterator[Area] = {
    val areaId = relId * 2 + java.lang.Long.signum(relId)
    val relTags = memberWays.headOption.map(_.relTags).getOrElse(Map.empty)
    // area timestamp starts at the relation's and is bumped to the newest
    // member way's (assemble_ways, builder.hpp:652-655)
    val areaTs = (memberWays.headOption.map(_.relTsMicros).getOrElse(0L) +:
      memberWays.map(_.tsMicros).toSeq).max
    def err(status: String) =
      Iterator(Area(areaId, relId, fromWay = false, 0, 0, status, null, relTags, areaTs))

    if (memberWays.isEmpty) return err("NoRings")

    // assemble_ways (builder.hpp:644-660): skip empty ways; dedup by way id
    // when repairing
    val seen = scala.collection.mutable.Set.empty[Long]
    val ways = scala.collection.mutable.ArrayBuffer.empty[WayBuf]
    memberWays.foreach { w =>
      if (w.xs.nonEmpty && (!attemptRepair || !seen.contains(w.wayId))) {
        seen += w.wayId
        ways += WayBuf(w.wayId, w.refs, w.xs, w.ys, w.tags, pseudo = false)
      }
    }
    if (ways.isEmpty) return err("NoRings")

    // ring growth state (WayInfo used/invert/sequence, builder.hpp:92-130):
    // used = -1 unused, -2 failed ring start, >=0 ring index
    val used = scala.collection.mutable.ArrayBuffer.fill(ways.length)(-1)
    val invert = scala.collection.mutable.ArrayBuffer.fill(ways.length)(false)
    val sequence = scala.collection.mutable.ArrayBuffer.fill(ways.length)(0)
    val rings = scala.collection.mutable.ArrayBuffer.empty[RingBuf]

    /** ring_is_complete (:449-479): assemble coordinates from the ring's
      * ways in sequence order (inverted as flagged, consecutive duplicates
      * dropped), validate simplicity, salvage when repairing; None (=null
      * RingInfo) makes the caller backtrack.
      */
    def ringIsComplete(ringcount: Int): Option[RingBuf] = {
      val members = ways.indices.filter(used(_) == ringcount).sortBy(sequence(_))
      val xs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val ys = scala.collection.mutable.ArrayBuffer.empty[Long]
      members.foreach { i =>
        val w = ways(i)
        val rangeIdx = if (invert(i)) w.xs.indices.reverse else w.xs.indices
        rangeIdx.foreach { k =>
          if (xs.isEmpty || xs.last != w.xs(k) || ys.last != w.ys(k)) {
            xs += w.xs(k); ys += w.ys(k)
          }
        }
      }
      if (xs.length < 4) return None
      val ring = RingBuf(xs.toArray, ys.toArray, members.map(ways(_)))
      val (ox, oy) = Planar.open(ring.xs, ring.ys)
      if (ox.length >= 3 && Planar.isSimpleRing(ox, oy)) Some(ring)
      else if (attemptRepair)
        Planar.salvageRing(ring.xs, ring.ys)
          .map { case (rx, ry) => ring.copy(xs = rx, ys = ry) }
      else None
    }

    /** complete_ring (:484-526): recursive backtracking extension by node
      * REF equality, inverting ways as needed; geometric failure at
      * closure backtracks into other combinations.
      */
    def completeRing(first: Long, last: Long, ringcount: Int, seqNo: Int): Option[RingBuf] = {
      if (first == last) return ringIsComplete(ringcount)
      var i = 0
      while (i < ways.length) {
        if (used(i) < 0) {
          val oldUsed = used(i)
          val w = ways(i)
          if (w.refs.head == last) {
            used(i) = ringcount; sequence(i) = seqNo; invert(i) = false
            val r = completeRing(first, w.refs.last, ringcount, seqNo + 1)
            if (r.isDefined) return r
            used(i) = oldUsed
          } else if (w.refs.last == last) {
            used(i) = ringcount; sequence(i) = seqNo; invert(i) = true
            val r = completeRing(first, w.refs.head, ringcount, seqNo + 1)
            if (r.isDefined) return r
            used(i) = oldUsed
          }
        }
        i += 1
      }
      None
    }

    /** make_one_ring (:533-549): start from the first unused way; a failed
      * start is marked -2 and ring building stops for this pass.
      */
    def makeOneRing(): Boolean = {
      var i = 0
      while (i < ways.length) {
        if (used(i) == -1) {
          used(i) = rings.length; sequence(i) = 0; invert(i) = false
          completeRing(ways(i).refs.head, ways(i).refs.last, rings.length, 1) match {
            case Some(r) => rings += r; return true
            case None => used(i) = -2; return false
          }
        }
        i += 1
      }
      false
    }

    while (makeOneRing()) {}

    // find_and_repair_holes_in_rings (:550-637): end nodes of all unused
    // ways (state reset to -1), sorted by node REF, adjacent equal refs
    // cancel; leftovers are dangling and get connected to their
    // haversine-closest partner by pseudo-ways.
    val unusedIdx = ways.indices.filter(used(_) < 0)
    if (unusedIdx.nonEmpty) {
      unusedIdx.foreach(used(_) = -1)
      case class End(ref: Long, x: Long, y: Long)
      val endNodes = unusedIdx.flatMap { i =>
        val w = ways(i)
        Seq(End(w.refs.head, w.xs.head, w.ys.head),
          End(w.refs.last, w.xs.last, w.ys.last))
      }.sortBy(_.ref)
      val dangling = scala.collection.mutable.ArrayBuffer.empty[End]
      var i = 0
      while (i < endNodes.length) {
        if (i + 1 < endNodes.length && endNodes(i).ref == endNodes(i + 1).ref) i += 2
        else { dangling += endNodes(i); i += 1 }
      }
      if (dangling.nonEmpty) {
        if (!attemptRepair) return err("DanglingEnds")
        def hav(a: End, b: End): Double =
          Haversine.distance(
            FixedPoint.fixToDouble(a.x.toInt), FixedPoint.fixToDouble(a.y.toInt),
            FixedPoint.fixToDouble(b.x.toInt), FixedPoint.fixToDouble(b.y.toInt))
        while (dangling.nonEmpty) {
          val wn = dangling.remove(dangling.length - 1)
          var closest = 0
          var minD = hav(wn, dangling(0))
          var k = 1
          while (k < dangling.length) {
            val d = hav(wn, dangling(k))
            if (d < minD) { minD = d; closest = k }
            k += 1
          }
          val c = dangling.remove(closest)
          ways += WayBuf(-1L, Array(c.ref, wn.ref), Array(c.x, wn.x),
            Array(c.y, wn.y), Map.empty, pseudo = true)
          used += -1; invert += false; sequence += 0
        }
      }
      // re-run ring building with the repair bits (:684-687)
      while (makeOneRing()) {}
    }
    if (rings.isEmpty) return err("NoRings")

    val open = rings.map(r => Planar.open(r.xs, r.ys))

    // inner/outer by containment parity (:694-752)
    val n = open.length
    val containedBy = Array.tabulate(n) { a =>
      (0 until n).filter(b => b != a &&
        Planar.pointInRing(open(a)._1(0), open(a)._2(0), open(b)._1, open(b)._2) &&
        ringAreaAbs(open(b)) > ringAreaAbs(open(a))).toArray
    }
    val isInner = containedBy.map(_.length % 2 == 1)
    val outers = (0 until n).filter(!isInner(_))
    // direct parent of an inner ring = smallest containing ring
    val parentOf = Array.tabulate(n) { a =>
      if (!isInner(a) || containedBy(a).isEmpty) -1
      else containedBy(a).minBy(b => ringAreaAbs(open(b)))
    }

    val extraAreas = scala.collection.mutable.ArrayBuffer.empty[Area]
    var areaTags = relTags

    // handle_one_way_inner_rings (:758-780): a tagged single-way inner ring
    // with tags differing from the area (and from a single-way parent ring)
    // emits its own area
    (0 until n).filter(isInner).foreach { a =>
      val realWays = rings(a).ways.filterNot(_.pseudo)
      if (rings(a).ways.size == 1 && realWays.size == 1 && !untagged(realWays.head.tags)) {
        val w = realWays.head
        val parentSingle = parentOf(a) >= 0 && rings(parentOf(a)).ways.size == 1 &&
          rings(parentOf(a)).ways.filterNot(_.pseudo).headOption
            .exists(pw => sameTags(w.tags, pw.tags))
        if (!sameTags(w.tags, areaTags) && !parentSingle) {
          val (cx, cy) = orient(open(a), ccw = false)
          extraAreas += Area(w.wayId * 2, w.wayId, fromWay = true, 1, 0, "ok",
            Wkt.multiPolygon(Seq(Seq((closeI(cx), closeI(cy))))), w.tags, areaTs)
        }
      }
    }

    // per-outer-ring polygon + tag merge (:885-945); polygon-level
    // validity mirrors the GEOS isValid gate at builder.hpp:912-931 —
    // an invalid polygon aborts the area with InvalidRing (extra areas
    // emitted by handle_one_way_inner_rings survive, as in the reference
    // where m_areas already holds them when the throw unwinds)
    val outerRingCount = outers.length
    var nHoles = 0
    val polys = outers.map { o =>
      // check_touching_inner_rings (builder.hpp:880-883 call site, :804-866
      // body): runs per outer ring on its direct inner rings, before the
      // holes are attached
      val holeSlots = scala.collection.mutable.ArrayBuffer.from(
        (0 until n).filter(a => isInner(a) && parentOf(a) == o)
          .map(a => Option(open(a))))
      mergeTouchingInnerRings(holeSlots)
      val holes = holeSlots.flatten.toSeq
      if (!Planar.polygonValid(open(o), holes))
        return extraAreas.iterator ++ err("InvalidRing")
      nHoles += holes.length
      rings(o).ways.filterNot(_.pseudo).foreach { w =>
        if (untagged(w.tags)) ()                      // way not tagged — ok
        else if (sameTags(areaTags, w.tags)) ()       // same as area — ok
        else if (untagged(areaTags))                  // relation untagged — take way tags
          areaTags = areaTags ++ significant(w.tags).filterNot(kv => areaTags.contains(kv._1))
        else if (outerRingCount == 1 && rings(o).ways.size == 1)
          areaTags = areaTags ++ significant(w.tags).filterNot(kv => areaTags.contains(kv._1))
      }
      val (oxs, oys) = orient(open(o), ccw = false)
      Seq((closeI(oxs), closeI(oys))) ++ holes.map { h =>
        val (hx, hy) = orient(h, ccw = true)
        (closeI(hx), closeI(hy))
      }
    }
    if (polys.isEmpty) return extraAreas.iterator ++ err("NoRings")

    val wkt = Wkt.multiPolygon(polys)
    extraAreas.iterator ++ Iterator(
      Area(areaId, relId, fromWay = false, outerRingCount,
        nHoles, "ok", wkt, areaTags, areaTs))
  }

  /** check_touching_inner_rings scan semantics (builder.hpp:804-866):
    * examine pairs (j, k>j) of surviving rings; on a Merged outcome the
    * pair collapses into slot j and the scan RESTARTS (the reference
    * recurses then returns); an Unmergeable outcome (single-linestring
    * touch whose symmetric difference did not polygonize into one ring)
    * stops all further merging, as the reference returns from inside the
    * polygonizer branch; NotTouching pairs are skipped.
    */
  private def mergeTouchingInnerRings(
      rs: scala.collection.mutable.ArrayBuffer[Option[(Array[Long], Array[Long])]]): Unit = {
    var restart = true
    while (restart) {
      restart = false
      var j = 0
      while (j < rs.length && !restart) {
        if (rs(j).isDefined) {
          var k = j + 1
          while (k < rs.length && !restart) {
            if (rs(k).isDefined) {
              val a = rs(j).get; val b = rs(k).get
              Planar.mergeTouchingRings(a._1, a._2, b._1, b._2) match {
                case Planar.Merged(xs, ys) =>
                  rs(j) = Some((xs, ys)); rs(k) = None; restart = true
                case Planar.Unmergeable => return
                case Planar.NotTouching => ()
              }
            }
            k += 1
          }
        }
        j += 1
      }
    }
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
