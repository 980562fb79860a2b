package graft.core

/** Pure-Scala geodesy/planar kernel (no Spark deps) — the numeric core the
  * Catalyst expressions and aggregators delegate to.
  *
  * Semantics follow the reference engine (joto/osmium):
  *  - fixed-point coordinates: reference/include/osmium/osm/position.hpp:35-45
  *  - haversine constants:     reference/include/osmium/geometry/haversine.hpp:43-57
  *  - equirectangular binning: reference/examples/nodedensity.cpp:47-54
  *  - orientation / PIP / simplicity mirror the geometry predicates used by
  *    reference/include/osmium/multipolygon/builder.hpp (GEOS there; own
  *    planar kernel here).
  */
object FixedPoint {
  /** reference/include/osmium/osm/position.hpp:35 */
  val CoordinatePrecision: Double = 10000000.0
  /** Sentinel for undefined positions (position.hpp:67). */
  val Invalid: Int = Int.MaxValue

  /** position.hpp:39-41 — round() = half away from zero. */
  def doubleToFix(c: Double): Int = Math.round(c * CoordinatePrecision) match {
    case r if r > Int.MaxValue => Int.MaxValue
    case r if r < Int.MinValue => Int.MinValue
    case r => r.toInt
  }
  // NB: Math.round is half-up (toward +inf) while C round() is half away
  // from zero; they differ only for negative exact .5 ulps of 1e-7 degrees,
  // which cannot be produced by parsing decimal coordinate strings ≤7dp.
  def doubleToFixExact(c: Double): Int = {
    val scaled = c * CoordinatePrecision
    val r = if (scaled >= 0) Math.floor(scaled + 0.5) else Math.ceil(scaled - 0.5)
    r.toInt
  }

  /** position.hpp:43-45 */
  def fixToDouble(c: Int): Double = c / CoordinatePrecision
}

object Haversine {
  /** reference/include/osmium/geometry/haversine.hpp:43-46 */
  val EarthRadiusInMeters: Double = 6372797.560856
  val DegToRad: Double = 0.017453292519943295769236907684886

  /** Great-circle distance in meters (haversine.hpp:48-57). */
  def distance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val lonh = Math.sin((lon1 - lon2) * DegToRad * 0.5)
    val lath = Math.sin((lat1 - lat2) * DegToRad * 0.5)
    val tmp = Math.cos(lat1 * DegToRad) * Math.cos(lat2 * DegToRad)
    2.0 * EarthRadiusInMeters *
      Math.asin(Math.sqrt(lath * lath + tmp * lonh * lonh))
  }

  /** Way-length fold over a coordinate sequence (haversine.hpp:63-75). */
  def length(lonLat: Array[(Double, Double)]): Double = {
    var sum = 0.0
    var i = 1
    while (i < lonLat.length) {
      sum += distance(lonLat(i - 1)._1, lonLat(i - 1)._2, lonLat(i)._1, lonLat(i)._2)
      i += 1
    }
    sum
  }
}

/** Web-mercator z/x/y tiles + the reference's equirectangular bin
  * (nodedensity.cpp:47-54 generalized).
  */
object Tiles {
  val MaxMercatorLat = 85.05112877980659

  /** Web-mercator tile x at zoom z for lon in degrees. */
  def tileX(z: Int, lon: Double): Int = {
    val n = 1L << z
    val x = ((lon + 180.0) / 360.0 * n).toLong
    clamp(x, n).toInt
  }

  /** Web-mercator tile y at zoom z for lat in degrees (clamped). */
  def tileY(z: Int, lat: Double): Int = {
    val n = 1L << z
    val latC = Math.max(-MaxMercatorLat, Math.min(MaxMercatorLat, lat))
    val latR = Math.toRadians(latC)
    val y = ((1.0 - Math.log(Math.tan(latR) + 1.0 / Math.cos(latR)) / Math.PI) / 2.0 * n).toLong
    clamp(y, n).toInt
  }

  /** Equirectangular bin of the reference's node-density raster:
    * x=(180+lon)*f, y=(90-lat)*f with clamping (nodedensity.cpp:47-57).
    */
  def equirectBin(lon: Double, lat: Double, factor: Double, width: Int, height: Int): (Int, Int) = {
    val x = clamp(((180.0 + lon) * factor).toLong, width).toInt
    val y = clamp(((90.0 - lat) * factor).toLong, height).toInt
    (x, y)
  }

  private def clamp(v: Long, n: Long): Long = if (v < 0) 0 else if (v >= n) n - 1 else v
}
