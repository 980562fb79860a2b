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

  /** Partition-fanning salt in [0, saltFactor): derived from the physical
    * input partition id, NOT from the grouping key — a salt that is a
    * function of the key would map every row of a hot key to the same
    * salt and the two-level split would be a no-op. A hot key spread over
    * P input partitions fans out to min(P, saltFactor) partial groups,
    * which is exactly the skew scenario (a hot key confined to one input
    * partition is that partition's problem, not the reducer's).
    *
    * Why not a per-row counter: monotonically_increasing_id assigns
    * DIFFERENT values when a stage is recomputed after a task loss, so a
    * retried map task could split the same row into a different partial
    * than the copy a reducer already fetched — double counting. The
    * partition id is a pure function of the (deterministic) lineage, so
    * recomputation reproduces identical partials.
    */
  def salt(saltFactor: Int): Column =
    pmod(xxhash64(spark_partition_id()), lit(saltFactor.toLong))

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
