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
        str(graft.functions.Fns.UrlHostRegex), Literal(1)))))
}
