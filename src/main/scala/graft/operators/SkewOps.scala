package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (north rule: "salted repartitioning on hot H3 cells").
  *
  * Hot spatial cells (cities) can hold orders of magnitude more rows than
  * the median cell; a single-level groupBy(cell) then puts a whole city in
  * one task. Two-level salted aggregation bounds any task's share of a hot
  * key at 1/saltFactor. AQE's skew-join handling covers the join case;
  * this covers aggregations, where AQE does not split keys.
  */
object SkewOps {

  /** Deterministic salt in [0, saltFactor) derived from arbitrary columns
    * (xxhash64 — stable across runs, unlike rand()).
    */
  def salt(saltFactor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor.toLong))

  /** Two-level count-by-key: partial counts per (key, salt), then final
    * combine per key. Same result as groupBy(key).count() with hot keys
    * split saltFactor ways in the first (wide) exchange.
    */
  def saltedCount(df: DataFrame, keyCol: String, saltCols: Seq[String],
                  saltFactor: Int): DataFrame =
    df.withColumn("__salt", salt(saltFactor, saltCols.map(col): _*))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("cnt"))

  /** Salted sum — same two-level scheme for an arbitrary long-typed sum. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                saltCols: Seq[String], saltFactor: Int): DataFrame =
    df.withColumn("__salt", salt(saltFactor, saltCols.map(col): _*))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("total"))
}
