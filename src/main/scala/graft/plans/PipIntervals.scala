package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

import graft.core.{CellId, Planar}

/** Sorted-interval cell-list point-in-polygon index — the S2-idiomatic
  * strategy the north rule names verbatim ("broadcast sorted-interval cell
  * lists + exact ray-casting refinement"), as an alternative physical plan
  * to the broadcast cell-cover JOIN of
  * [[graft.operators.SpatialOps.pipJoinConvex]].
  *
  * Build (driver, polygon side is small-by-construction — admin polygons):
  * an ADAPTIVE multi-level cover per polygon — coarse cells fully inside
  * the polygon stay coarse and are marked FULL; boundary cells refine down
  * to `maxLevel` and are marked PARTIAL. Every cover cell becomes its
  * MaxLevel descendant-id range [[CellId.rangeMin]]..[[CellId.rangeMax]]
  * (the property the sentinel-bit id layout exists for), and the ranges of
  * ALL polygons are swept into DISJOINT sorted elementary segments, each
  * carrying the list of (polygon, full?) refs that cover it.
  *
  * Probe (executor, the 10^12-row point side): ONE binary search of the
  * point's MaxLevel cell id over the broadcast segment starts, then per
  * candidate either accept immediately (FULL cell — the interior fast path
  * that skips the ray cast for the bulk of a large polygon's area) or
  * refine with the exact boundary-inclusive ray cast
  * ([[Planar.pointInPolygon]], the same kernel as every other PIP path, so
  * results are bit-identical). The operator is a pure MAP stage: no join,
  * no shuffle of the point side at all — strictly fewer moving parts than
  * the broadcast-hash-join plan, and the right physical strategy when the
  * polygon set fits comfortably in a broadcast (reference capability:
  * PreparedPolygon::contains at
  * reference/include/osmium/multipolygon/builder.hpp:707-711).
  */
object PipIntervalKernel {

  /** Broadcast payload: disjoint sorted segments of MaxLevel cell-id space.
    * `payloads(i)` holds refs `polyId << 1 | (full ? 1 : 0)` sorted by
    * polyId; `polys` is the exact ring geometry for PARTIAL refinement.
    */
  final class Index(val starts: Array[Long], val ends: Array[Long],
                    val payloads: Array[Array[Int]],
                    val polys: Map[Int, Array[(Array[Long], Array[Long])]])
    extends Serializable {
    def segmentCount: Int = starts.length
    def fullRefs: Int = payloads.iterator.map(_.count(r => (r & 1) == 1)).sum
  }

  private val Empty = new GenericArrayData(Array.empty[Int])

  /** All polygons containing point (x, y), sorted ascending — FULL cells
    * accept without touching geometry; PARTIAL cells run the exact kernel.
    */
  def hits(idxRef: AnyRef, x: Long, y: Long): GenericArrayData = {
    val idx = idxRef.asInstanceOf[Index]
    val id = CellId.fromFix(x, y, CellId.MaxLevel)
    var i = java.util.Arrays.binarySearch(idx.starts, id)
    if (i < 0) i = -i - 2 // greatest segment with start <= id
    if (i < 0 || id > idx.ends(i)) return Empty
    val refs = idx.payloads(i)
    var n = 0
    val buf = new Array[Int](refs.length)
    var k = 0
    while (k < refs.length) {
      val r = refs(k)
      val pid = r >> 1
      if ((r & 1) == 1 || Planar.pointInPolygon(x, y, idx.polys(pid))) {
        buf(n) = pid; n += 1
      }
      k += 1
    }
    if (n == 0) Empty
    else new GenericArrayData(java.util.Arrays.copyOf(buf, n))
  }

  def unwrap(bc: AnyRef): AnyRef = bc.asInstanceOf[Broadcast[Index]].value

  // ---- driver-side index construction --------------------------------------

  /** Exact inclusive fix-coordinate rect of cell (cx, cy) at `lvl`:
    * lo(c) = ceil(c·span / 2^lvl) − half (the smallest coordinate binning
    * into c); the top cell absorbs the clamped domain edge. Mirrors the
    * distributed formulation in SpatialOps.segmentCellCover.
    */
  private def cellRect(cx: Long, cy: Long, lvl: Int): (Long, Long, Long, Long) = {
    val n = 1L << lvl
    def lo(c: Long, span: Long, half: Long): Long = ((c * span + n - 1) >> lvl) - half
    val x0 = lo(cx, 3600000000L, 1800000000L)
    val x1 = if (cx == n - 1) 1800000000L else lo(cx + 1, 3600000000L, 1800000000L) - 1
    val y0 = lo(cy, 1800000000L, 900000000L)
    val y1 = if (cy == n - 1) 900000000L else lo(cy + 1, 1800000000L, 900000000L) - 1
    (x0, y0, x1, y1)
  }

  /** Does ring segment (ax,ay)-(bx,by) intersect the closed rect? Exact:
    * bbox overlap AND the supporting line does not leave all four corners
    * strictly on one side (the SAT axis segmentCellCover uses, BigInt here
    * because driver-side cells can be continent-sized).
    */
  private def segHitsRect(ax: Long, ay: Long, bx: Long, by: Long,
                          x0: Long, y0: Long, x1: Long, y1: Long): Boolean = {
    if (math.max(ax, bx) < x0 || math.min(ax, bx) > x1 ||
        math.max(ay, by) < y0 || math.min(ay, by) > y1) return false
    val dx = BigInt(bx) - ax
    val dy = BigInt(by) - ay
    def side(px: Long, py: Long): BigInt = dx * (BigInt(py) - ay) - dy * (BigInt(px) - ax)
    val s = Array(side(x0, y0), side(x1, y0), side(x0, y1), side(x1, y1))
    s.min <= 0 && s.max >= 0
  }

  /** Exact cell-vs-polygon classification. 1 = FULL (rect entirely inside),
    * 0 = PARTIAL (boundary crosses, or polygon inside rect), -1 = disjoint.
    * A rect with no boundary segment touching it is entirely on one side of
    * the (closed) boundary curve set: one corner decides which.
    */
  private def classify(rect: (Long, Long, Long, Long),
                       rings: Array[(Array[Long], Array[Long])]): Int = {
    val (x0, y0, x1, y1) = rect
    var i = 0
    while (i < rings.length) {
      val (xs, ys) = rings(i)
      val n = if (xs.length > 1 && xs.head == xs.last && ys.head == ys.last)
        xs.length - 1 else xs.length
      var j = 0
      while (j < n) {
        val k = (j + 1) % n
        if (segHitsRect(xs(j), ys(j), xs(k), ys(k), x0, y0, x1, y1)) return 0
        // a ring wholly inside the rect never crosses its boundary: catch it
        // by vertex containment (checked per vertex, cheap at driver scale)
        if (xs(j) >= x0 && xs(j) <= x1 && ys(j) >= y0 && ys(j) <= y1) return 0
        j += 1
      }
      i += 1
    }
    if (Planar.pointInPolygon(x0, y0, rings)) 1 else -1
  }

  /** Adaptive cover of one polygon: recurse PARTIAL cells from `minLevel`
    * to `maxLevel`; FULL cells stop coarse. Emits (cell, full).
    */
  private def adaptiveCover(rings: Array[(Array[Long], Array[Long])],
                            minLevel: Int, maxLevel: Int): Seq[(Long, Boolean)] = {
    val xs = rings.flatMap(_._1); val ys = rings.flatMap(_._2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    def walk(cell: Long): Unit = {
      val lvl = CellId.level(cell)
      classify(cellRect(CellId.x(cell), CellId.y(cell), lvl), rings) match {
        case 1 => out += ((cell, true))
        case 0 =>
          if (lvl >= maxLevel) out += ((cell, false))
          else CellId.children(cell).foreach(walk)
        case _ => ()
      }
    }
    CellId.coverBBox(xs.min, ys.min, xs.max, ys.max, minLevel).foreach(walk)
    out.toSeq
  }

  /** Build the disjoint sorted-interval index over a polygon map. */
  def build(polys: Map[Int, Array[(Array[Long], Array[Long])]],
            minLevel: Int, maxLevel: Int): Index = {
    // (rangeMin, rangeMax, ref) per cover cell, all polygons
    val cells = polys.toSeq.sortBy(_._1).flatMap { case (pid, rings) =>
      adaptiveCover(rings, minLevel, maxLevel).map { case (cell, full) =>
        (CellId.rangeMin(cell), CellId.rangeMax(cell),
          (pid << 1) | (if (full) 1 else 0))
      }
    }
    // sweep into disjoint elementary segments carrying the active ref set
    val events = cells.flatMap { case (lo, hi, ref) =>
      Seq((lo, true, ref), (hi + 1, false, ref)) // hi = rangeMax < 2^62, +1 safe
    }.sortBy(e => (e._1, e._2))
    val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ends = scala.collection.mutable.ArrayBuffer.empty[Long]
    val pays = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    val active = scala.collection.mutable.SortedSet.empty[Int]
    var prev = Long.MinValue
    events.foreach { case (pos, isStart, ref) =>
      if (pos != prev && active.nonEmpty && prev != Long.MinValue) {
        starts += prev; ends += pos - 1; pays += active.toArray
      }
      if (pos != prev) prev = pos
      if (isStart) active += ref else active -= ref
    }
    new Index(starts.toArray, ends.toArray, pays.toArray, polys)
  }
}

/** `pip_interval_hits(lon_fix, lat_fix)` → array<int> of containing polygon
  * ids, against a broadcast [[PipIntervalKernel.Index]]. Native codegen so
  * the whole probe (binary search + ray cast) stays inside the scan's
  * whole-stage-codegen span; the expression tree carries only the O(1)
  * broadcast handle (same posture as [[PointInPolygonSet]]).
  */
case class PipIntervalHits(left: Expression, right: Expression,
                           idxBc: Broadcast[PipIntervalKernel.Index])
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pip_interval_hits"

  override def nullSafeEval(x: Any, y: Any): Any =
    PipIntervalKernel.hits(idxBc.value, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pipIdxBc", idxBc, "java.lang.Object")
    val cached = ctx.addMutableState("java.lang.Object", "pipIdx", v => s"$v = null;")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""if ($cached == null) { $cached = graft.plans.PipIntervalKernel.unwrap($bcRef); }
         |${ev.value} = graft.plans.PipIntervalKernel.hits($cached, $x, $y);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PipIntervalHits {
  def apply(spark: SparkSession, x: Column, y: Column,
            idx: PipIntervalKernel.Index): Column =
    GraftColumnBridge.column(PipIntervalHits(
      GraftColumnBridge.expression(x),
      GraftColumnBridge.expression(y),
      spark.sparkContext.broadcast(idx)))
}
