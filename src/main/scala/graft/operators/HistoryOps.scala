package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** History/versioned-stream operators — the reference's ordered-stream
  * handlers re-expressed as window functions and merge semantics.
  */
object HistoryOps {

  /** EndTime (reference/include/osmium/handler/endtime.hpp:36-131): each
    * version's endtime = next same-key version's timestamp.
    * lead() over (partition by key order by version, tieBreak...).
    * Pass tie-break columns whenever (key, orderCol) is not unique —
    * otherwise the lead() assignment is nondeterministic across runs.
    */
  def endTime(df: DataFrame, keyCol: String, orderCol: String, tsCol: String,
              tieBreakCols: String*): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(orderCol) +: tieBreakCols.map(col)): _*)
    df.withColumn("endtime", lead(col(tsCol), 1).over(w))
  }

  /** RangeFromHistory (handler/range_from_history.hpp:38-72): keep a
    * version iff (endtime is null or endtime >= from) and timestamp <= to.
    */
  def rangeFromHistory(withEnd: DataFrame, tsCol: String,
                       fromMicros: Long, toMicros: Long): DataFrame =
    withEnd.filter(
      unix_micros(col(tsCol).cast("timestamp")) <= toMicros &&
      (col("endtime").isNull ||
        unix_micros(col("endtime").cast("timestamp")) >= fromMicros))

  /** ObjectStore::ApplyHandler merge (storage/objectstore.hpp:171-251):
    * ordered union of a base stream and a change stream, keeping the
    * highest version per key — unionByName + row_number window.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame,
                  keyCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc)
    base.unionByName(changes)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
