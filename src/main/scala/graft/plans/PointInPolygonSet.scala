package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.core.Planar

/** Static kernel entry for generated code (plain JVM-callable shape). */
object PipKernel {
  type Polys = Map[Int, Array[(Array[Long], Array[Long])]]

  def contains(polys: AnyRef, polyId: Int, x: Long, y: Long): Boolean =
    polys.asInstanceOf[Polys].get(polyId) match {
      case Some(rings) => Planar.pointInPolygon(x, y, rings)
      case None => false
    }
}

/** Native Catalyst expression for the exact ray-cast point-in-polygon
  * refinement: `pointInPolygonSet(poly_id, lon_fix, lat_fix)` against an
  * embedded polygon set (rings with holes, even-odd parity — the engine
  * counterpart of PreparedPolygon::contains at
  * reference/include/osmium/multipolygon/builder.hpp:707-711).
  *
  * Implements doGenCode so the predicate stays inside whole-stage codegen
  * (a Scala UDF here would break the codegen span around the broadcast
  * cell-cover join). The polygon set rides along as a codegen reference
  * object — the same pattern Spark uses for, e.g., compiled regex objects.
  */
case class PointInPolygonSet(first: Expression, second: Expression, third: Expression,
                             polys: PipKernel.Polys)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon_set"

  override def nullSafeEval(polyId: Any, x: Any, y: Any): Any =
    PipKernel.contains(polys, polyId.asInstanceOf[Int],
      x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val polysRef = ctx.addReferenceObj("polys", polys, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, (polyId, x, y) =>
      s"${ev.value} = graft.plans.PipKernel.contains($polysRef, $polyId, $x, $y);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInPolygonSet {
  def apply(polyId: Column, x: Column, y: Column, polys: PipKernel.Polys): Column =
    GraftColumnBridge.column(PointInPolygonSet(
      GraftColumnBridge.expression(polyId),
      GraftColumnBridge.expression(x),
      GraftColumnBridge.expression(y), polys))
}
