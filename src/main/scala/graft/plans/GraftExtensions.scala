package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration — exposes the engine's native
  * expressions to SQL users:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT shingle_minhash(text, 256, 10, 12) FROM docs")
  *
  * (or via spark.sql.extensions=graft.plans.GraftExtensions in
  * spark-submit conf). Int parameters arrive as foldable literals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashArray].getName, "shingle_hashes"),
      (args: Seq[Expression]) =>
        ShingleHashArray(args(0), intArg(args(1), "cap"), intArg(args(2), "len"))))

    ext.injectFunction((
      new FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (args: Seq[Expression]) =>
        ShingleMinHash(args(0), intArg(args(1), "cap"),
          intArg(args(2), "len"), intArg(args(3), "k"))))

    ext.injectFunction((
      new FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      (args: Seq[Expression]) => SimHash16(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("vec_lsh_buckets"),
      new ExpressionInfo(classOf[VecLshBuckets].getName, "vec_lsh_buckets"),
      (args: Seq[Expression]) =>
        VecLshBuckets(args(0), intArg(args(1), "tables"), intArg(args(2), "bits"))))
  }
}
