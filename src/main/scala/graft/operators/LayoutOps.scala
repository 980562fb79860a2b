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

  /** Sort-key overlap statistics — the layout-health metric that triggers
    * re-clustering: for each file's key range [min_key, max_key], how
    * many OTHER files in its partition overlap it (≈ the read
    * amplification of a point lookup; a perfectly z-ordered partition
    * scores 0 everywhere). Computed with the bucketized interval join
    * ([[HistoryOps.intervalJoin]] — one shuffle on (partition, bucket),
    * pairs bounded by real overlaps) instead of the quadratic range
    * self-join a million-file listing cannot afford. Files whose span
    * exceeds `maxSpanKeys` are excluded from PAIRING (the interval
    * join's span contract — such a file is a compaction candidate by
    * itself) but still appear in the output with their own row.
    * Output: (part_key, file_id, n_overlaps).
    */
  /** Write `df` as a BUCKETED managed parquet table: rows hash-partitioned
    * into `buckets` files per partition by `key`, with per-bucket sort on
    * `key` — the layout that lets every future equi-join or aggregation on
    * `key` skip its shuffle entirely (Spark reads the bucket spec from the
    * catalog and plans a SortMergeJoin with NO Exchange on either bucketed
    * side). At 100 TB this is the difference between re-shuffling the
    * corpus per query and shuffling ONCE at ingest: the canonical layout
    * for a crawl's url-keyed master table that every downstream pipeline
    * joins against. BucketedJoinSpec asserts the exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Write `df` hive-partitioned by `key` (one directory per value) — the
    * coarse pruning axis of a crawl corpus (lang, crawl date, content
    * tier). A reader filtering on `key` must never touch the other
    * partitions' files: PartitionLayoutSpec asserts the scan plans the
    * filter as a PartitionFilter (metadata-level pruning) rather than a
    * data filter.
    */
  def writePartitioned(df: DataFrame, path: String, key: String): Unit =
    df.write.mode("overwrite").partitionBy(key).parquet(path)

  def overlapStats(files: DataFrame, bucketKeys: Long,
                   maxSpanKeys: Long): DataFrame = {
    def side(id: String) = files.select(col("file_id").as(id),
      col("part_key").as("key"),
      col("min_key").as("start_us"), col("max_key").as("end_us"))
    val pairs = HistoryOps
      .intervalJoin(side("lid"), side("rid"), bucketKeys, maxSpanKeys)
      .filter(col("lid") =!= col("rid"))
    files.join(
        pairs.groupBy(col("lid").as("file_id"))
          .agg(count(lit(1)).as("n_overlaps")),
        Seq("file_id"), "left")
      .select(col("part_key"), col("file_id"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
  }
}
