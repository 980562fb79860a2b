package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Data-layout maintenance planning — the table-service side of a
  * 100 TB lake (the read-side counterpart, z-order clustering, is
  * [[SpatialOps.zorderLayout]]). Planning is pure metadata work: inputs
  * are file LISTINGS (id, partition key, size), never data, so the plans
  * cost one window over each partition's listing.
  */
object LayoutOps {

  /** Small-file compaction plan: assign each file to a compaction group
    * by GREEDY IN-ORDER packing — files are taken in `file_id` order
    * within their partition and grouped by which target-width window of
    * the byte prefix-sum they start in (group = cum_bytes_before /
    * target). Every group holds < target + max_file_bytes, and the
    * cumulative bytes through any closed group reach that group's upper
    * window boundary — an individual group can hold less than target
    * only when the previous group's closing file overshot into its
    * window. In-order (not best-fit) packing is the
    * production choice on purpose: it preserves the listing order —
    * time-ordered files stay time-clustered after rewrite, and the plan
    * is a deterministic pure function of the listing.
    *
    * Scale posture: one window partitioned by `part_key` — a partition
    * dir's listing (thousands of files), never the table's row data;
    * plans for a million-file table are a few MB. Output:
    * (part_key, file_id, bytes, grp).
    */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    val before = Window.partitionBy("part_key").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("bytes").over(before), lit(0L)))
      .withColumn("grp", Fns.idiv(col("cum_before"), targetBytes))
      .select(col("part_key"), col("file_id"), col("bytes"), col("grp"))
  }
}
