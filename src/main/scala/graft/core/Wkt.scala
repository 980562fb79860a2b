package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** WKT / (E)WKB writers matching the reference byte-for-byte:
  * reference/include/osmium/geometry/geometry.hpp:37,46-65,146-171 (EWKB
  * SRID flag 0x20000000, SRID 4326, little-endian) and the
  * `setprecision(10)` WKT number formatting of point.hpp:70-75,
  * linestring.hpp:60-72, polygon.hpp:64-72. Golden strings:
  * reference/test/t/geometry/test_{point,linestring,polygon}_geometry.cpp.
  */
object Wkt {
  val SridFlag: Int = 0x20000000
  val Srid: Int = 4326

  /** C++ `ostream << setprecision(10) << v` equivalent (%.10g). */
  def fmtG(v: Double, sig: Int = 10): String = {
    if (v == 0.0) return "0"
    if (v.isNaN) return "nan"
    if (v.isInfinite) return if (v > 0) "inf" else "-inf"
    val bd = new java.math.BigDecimal(v)
      .round(new java.math.MathContext(sig))
      .stripTrailingZeros()
    val adjExp = bd.precision - bd.scale - 1
    if (adjExp < -5 || adjExp >= sig) {
      val mant = bd.movePointLeft(adjExp)
      val sign = if (adjExp < 0) "-" else "+"
      s"${mant.toPlainString}e$sign${f"${math.abs(adjExp)}%02d"}"
    } else bd.toPlainString
  }

  private def coord(lonFix: Int, latFix: Int): String =
    s"${fmtG(FixedPoint.fixToDouble(lonFix))} ${fmtG(FixedPoint.fixToDouble(latFix))}"

  private def srid(ewkt: Boolean): String = if (ewkt) s"SRID=$Srid;" else ""

  def point(lonFix: Int, latFix: Int, ewkt: Boolean = false): String =
    s"${srid(ewkt)}POINT(${coord(lonFix, latFix)})"

  def lineString(lon: Array[Int], lat: Array[Int], ewkt: Boolean = false): String =
    s"${srid(ewkt)}LINESTRING(${coords(lon, lat)})"

  def polygon(rings: Seq[(Array[Int], Array[Int])], ewkt: Boolean = false): String =
    s"${srid(ewkt)}POLYGON(${rings.map(r => s"(${coords(r._1, r._2)})").mkString(",")})"

  def multiPolygon(polys: Seq[Seq[(Array[Int], Array[Int])]], ewkt: Boolean = false): String =
    s"${srid(ewkt)}MULTIPOLYGON(${polys.map(p =>
      s"(${p.map(r => s"(${coords(r._1, r._2)})").mkString(",")})").mkString(",")})"

  private def coords(lon: Array[Int], lat: Array[Int]): String =
    lon.indices.map(i => coord(lon(i), lat(i))).mkString(",")

  // ---- WKB ----------------------------------------------------------------

  private def header(buf: ByteBuffer, geomType: Int, ewkb: Boolean): Unit = {
    buf.put(1.toByte) // little endian
    if (ewkb) { buf.putInt(geomType | SridFlag); buf.putInt(Srid) }
    else buf.putInt(geomType)
  }

  private def alloc(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  def pointWkb(lonFix: Int, latFix: Int, ewkb: Boolean = false): Array[Byte] = {
    val buf = alloc(1 + 4 + (if (ewkb) 4 else 0) + 16)
    header(buf, 1, ewkb)
    buf.putDouble(FixedPoint.fixToDouble(lonFix))
    buf.putDouble(FixedPoint.fixToDouble(latFix))
    buf.array()
  }

  def lineStringWkb(lon: Array[Int], lat: Array[Int], ewkb: Boolean = false): Array[Byte] = {
    val buf = alloc(1 + 4 + (if (ewkb) 4 else 0) + 4 + 16 * lon.length)
    header(buf, 2, ewkb)
    buf.putInt(lon.length)
    var i = 0
    while (i < lon.length) {
      buf.putDouble(FixedPoint.fixToDouble(lon(i)))
      buf.putDouble(FixedPoint.fixToDouble(lat(i)))
      i += 1
    }
    buf.array()
  }

  def polygonWkb(rings: Seq[(Array[Int], Array[Int])], ewkb: Boolean = false): Array[Byte] = {
    val nPts = rings.map(_._1.length).sum
    val buf = alloc(1 + 4 + (if (ewkb) 4 else 0) + 4 + 4 * rings.size + 16 * nPts)
    header(buf, 3, ewkb)
    buf.putInt(rings.size)
    rings.foreach { case (lon, lat) =>
      buf.putInt(lon.length)
      var i = 0
      while (i < lon.length) {
        buf.putDouble(FixedPoint.fixToDouble(lon(i)))
        buf.putDouble(FixedPoint.fixToDouble(lat(i)))
        i += 1
      }
    }
    buf.array()
  }

  def toHex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
}
