package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, LambdaFunction, Literal, UnresolvedNamedLambdaVariable}

/** SparkSessionExtensions registration — exposes the engine's native
  * expressions to SQL users:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT shingle_minhash(text, 256, 10, 12) FROM docs")
  *
  * (or via spark.sql.extensions=graft.plans.GraftExtensions in
  * spark-submit conf, or into an already-built session via
  * [[org.apache.spark.sql.GraftRegistryBridge.install]]). Int parameters
  * arrive as foldable literals. The function list lives on the companion
  * so both registration paths share one source of truth.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  private def strArg(e: Expression, name: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$name expects a literal string, got $other")
  }

  // Column-composed catalog functions (TagStrings / URL normalization)
  // register as the UNRESOLVED trees the SQL parser itself would build
  // for the equivalent composition — the analyzer resolves the nested
  // builtins and lambda variables like any parsed query, so SQL users
  // get the exact codegen'd composition the Scala surface has (the
  // Column->Expression bridge can't be used here: it yields opaque
  // ColumnNode wrappers the analyzer never resolves).
  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)
  private def str(s: String): Expression =
    Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)
  private def lam(body: Expression => Expression): Expression = {
    val v = UnresolvedNamedLambdaVariable(Seq("e"))
    LambdaFunction(body(v), Seq(v))
  }
  private def escaped(c: Expression, escape: String): Expression =
    escape.distinct.sortBy(ch => if (ch == '\\') 0 else 1).foldLeft(c) {
      (acc, ch) => fn("replace", acc, str(ch.toString), str("\\" + ch))
    }
  // TagStrings.tagsToString as a parser-shaped tree
  private def tagsToString(tags: Expression, escape: String, prefix: String,
                           infix: String, suffix: String, join: String): Expression =
    fn("concat_ws", str(join),
      fn("transform", fn("array_sort", fn("map_entries", tags)), lam(e =>
        fn("concat", str(prefix),
          escaped(UnresolvedExtractValue(e, str("key")), escape),
          str(infix),
          escaped(UnresolvedExtractValue(e, str("value")), escape),
          str(suffix)))))

  /** (identifier, info, builder) triples — the injectFunction tuple shape,
    * also consumable by FunctionRegistry.registerFunction.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashArray].getName, "shingle_hashes"),
      (args: Seq[Expression]) =>
        ShingleHashArray(args(0), intArg(args(1), "cap"), intArg(args(2), "len"))),

    (new FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (args: Seq[Expression]) =>
        ShingleMinHash(args(0), intArg(args(1), "cap"),
          intArg(args(2), "len"), intArg(args(3), "k"))),

    (new FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      (args: Seq[Expression]) => SimHash16(args(0))),

    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),

    (new FunctionIdentifier("vec_lsh_buckets"),
      new ExpressionInfo(classOf[VecLshBuckets].getName, "vec_lsh_buckets"),
      (args: Seq[Expression]) =>
        VecLshBuckets(args(0), intArg(args(1), "tables"), intArg(args(2), "bits"))),

    (new FunctionIdentifier("tags_kv"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "tags_kv"),
      (args: Seq[Expression]) =>
        tagsToString(args(0), "", "", "=", "", strArg(args(1), "join"))),

    (new FunctionIdentifier("tags_hstore"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "tags_hstore"),
      (args: Seq[Expression]) =>
        tagsToString(args(0), "\\\"", "\"", "\"=>\"", "\"", ",")),

    (new FunctionIdentifier("url_norm_host"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "url_norm_host"),
      (args: Seq[Expression]) => fn("lower", fn("regexp_extract", args(0),
        str(graft.functions.Fns.UrlHostRegex), Literal(1)))),

    // ---- geometry catalog (the reference's JS toWKT/geometry surface,
    // wrapper/geometry.hpp:81-213, as SQL functions over native exprs) ----

    (new FunctionIdentifier("point_wkt"),
      new ExpressionInfo(classOf[PointWkt].getName, "point_wkt"),
      (args: Seq[Expression]) => PointWkt(args(0), args(1))),

    (new FunctionIdentifier("ring_area2"),
      new ExpressionInfo(classOf[RingArea2].getName, "ring_area2"),
      (args: Seq[Expression]) => RingArea2(args(0), args(1))),

    (new FunctionIdentifier("point_in_rings"),
      new ExpressionInfo(classOf[PointInRings].getName, "point_in_rings"),
      (args: Seq[Expression]) =>
        PointInRings(args(0), args(1), args(2), args(3))),

    (new FunctionIdentifier("simplify_polyline"),
      new ExpressionInfo(classOf[SimplifyPolyline].getName, "simplify_polyline"),
      (args: Seq[Expression]) =>
        SimplifyPolyline(args(0), intArg(args(1), "tol_fix").toLong)),

    (new FunctionIdentifier("clip_seg_rect"),
      new ExpressionInfo(classOf[ClipSegRect].getName, "clip_seg_rect"),
      (args: Seq[Expression]) => ClipSegRect(args(0), args(1))),

    (new FunctionIdentifier("ln_e6"),
      new ExpressionInfo(classOf[LnE6].getName, "ln_e6"),
      (args: Seq[Expression]) => LnE6(args(0))),

    (new FunctionIdentifier("haversine_m"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "haversine_m"),
      (args: Seq[Expression]) => haversineTree(args(0), args(1), args(2), args(3))),

    (new FunctionIdentifier("geohash"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "geohash"),
      (args: Seq[Expression]) =>
        geohashTree(args(0), args(1), intArg(args(2), "precision"))),

    (new FunctionIdentifier("convex_intersects"),
      new ExpressionInfo(classOf[ConvexIntersects].getName, "convex_intersects"),
      (args: Seq[Expression]) =>
        ConvexIntersects(args(0), args(1), args(2), args(3))),

    (new FunctionIdentifier("seg_intersects_ring"),
      new ExpressionInfo(classOf[SegIntersectsRing].getName, "seg_intersects_ring"),
      (args: Seq[Expression]) => SegIntersectsRing(args(0), args(1), args(2))))

  /** [[graft.operators.SpatialOps.geohashCol]] as a parser-shaped tree —
    * the same exact-integer bins and bit interleave, each base32 char one
    * substring into the alphabet literal. The bin subtrees repeat per bit
    * term; whole-stage codegen's subexpression elimination collapses the
    * deterministic duplicates.
    */
  private def geohashTree(lonFix: Expression, latFix: Expression,
                          precision: Int): Expression = {
    require(precision >= 1 && precision <= 8, "geohash precision 1..8")
    import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Concat, Divide, Least, Multiply, Pmod, ShiftRight, Substring, Subtract}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    // Fns.idiv's exact-division shape: ((a - pmod(a, span)) / span)::long
    def bin(v: Expression, shift: Long, span: Long, level: Int): Expression = {
      val a = Multiply(Add(v, Literal(shift)), Literal(1L << level))
      val q = Cast(Divide(Subtract(a, Pmod(a, Literal(span))), Literal(span)), LongType)
      Least(Seq(q, Literal((1L << level) - 1)))
    }
    val lonb = bin(lonFix, 1800000000L, 3600000000L, lonBits)
    val latb = bin(latFix, 900000000L, 1800000000L, latBits)
    val chars = (0 until precision).map { k =>
      val digit = (0 until 5).map { j =>
        val g = 5 * k + j
        val src = if (g % 2 == 0) ShiftRight(lonb, Literal(lonBits - 1 - g / 2))
                  else ShiftRight(latb, Literal(latBits - 1 - (g - 1) / 2))
        Multiply(BitwiseAnd(src, Literal(1L)), Literal(1L << (4 - j)))
      }.reduceLeft[Expression](Add(_, _))
      Substring(str(graft.operators.SpatialOps.GeohashAlphabet),
        Cast(Add(digit, Literal(1L)), IntegerType), Literal(1))
    }
    Concat(chars)
  }

  /** [[graft.functions.Fns.haversineMeters]] as a parser-shaped tree with
    * IDENTICAL operator association (left-assoc multiplies), so the SQL
    * surface produces bit-identical meters.
    */
  private def haversineTree(lon1: Expression, lat1: Expression,
                            lon2: Expression, lat2: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Multiply, Subtract}
    val deg = Literal(0.017453292519943295769236907684886)
    val half = Literal(0.5)
    val lonh = fn("sin", Multiply(Multiply(Subtract(lon1, lon2), deg), half))
    val lath = fn("sin", Multiply(Multiply(Subtract(lat1, lat2), deg), half))
    val tmp = Multiply(fn("cos", Multiply(lat1, deg)), fn("cos", Multiply(lat2, deg)))
    // null-propagating clamp (CASE, not least) — see Fns.haversineMeters
    val h = Add(Multiply(lath, lath), Multiply(Multiply(tmp, lonh), lonh))
    val clamped = org.apache.spark.sql.catalyst.expressions.CaseWhen(
      Seq((org.apache.spark.sql.catalyst.expressions.GreaterThan(h, Literal(1.0)),
        Literal(1.0))), Some(h))
    Multiply(Multiply(Literal(2.0), Literal(6372797.560856)),
      fn("asin", fn("sqrt", clamped)))
  }
}
