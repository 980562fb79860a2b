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

  /** Row-fanning salt in [0, saltFactor): derived from the per-row
    * monotonic id, NOT from the grouping key — a salt that is a function of
    * the key would map every row of a hot key to the same salt and the
    * two-level split would be a no-op. The id cycles through all
    * saltFactor values within each input partition, so a hot key fans out
    * to up to saltFactor partial groups. The salt is aggregated away, so
    * the (nondeterministic-tagged) id never affects output values.
    */
  def salt(saltFactor: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong))

  /** Two-level count-by-key: partial counts per (key, salt), then final
    * combine per key. Same result as groupBy(key).count() with hot keys
    * split saltFactor ways in the first (wide) exchange.
    */
  def saltedCount(df: DataFrame, keyCol: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", salt(saltFactor))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("cnt"))

  /** Salted sum — same two-level scheme for an arbitrary long-typed sum. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                saltFactor: Int): DataFrame =
    df.withColumn("__salt", salt(saltFactor))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("total"))
}
