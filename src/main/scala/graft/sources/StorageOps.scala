package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Table layout for the production plane: spatial tables are written
  * partitioned by a coarse cell id so cell-predicate queries prune at the
  * directory/metadata level before any row is read — the engine-side
  * analog of the reference's two-pass phase structure (only read what the
  * query needs; SURVEY §4 "partition pruning analog"). With Iceberg this
  * becomes a partition transform on the same column; plain parquet
  * partitioning expresses the identical pruning contract in-sandbox.
  */
object StorageOps {

  /** Coarse partition cell (level 3 = 8x8 world grid → at most 64
    * directories; coarser than the query-time cover level so each
    * partition holds many query cells).
    */
  val PartitionLevel = 3

  def writePartitionedPoints(points: DataFrame, path: String): Unit =
    points
      .withColumn("part_cell", Fns.cellId(col("lon_fix"), col("lat_fix"), PartitionLevel))
      .write.mode("overwrite")
      .partitionBy("part_cell")
      .parquet(path)

  /** Read back with a cell predicate — Catalyst turns the part_cell filter
    * into PartitionFilters (no data files outside matching directories are
    * opened).
    */
  def readPointsInPartition(spark: SparkSession, path: String, partCell: Long): DataFrame =
    spark.read.parquet(path).filter(col("part_cell") === partCell)

  /** Bucketed table layout — the co-located-join side of the storage
    * contract: two tables bucketed (and sorted) by the same key into the
    * same bucket count join with NO shuffle, because each scan's output
    * partitioning already satisfies the join's required distribution. At
    * the 100 TB posture the big fact tables pre-pay their join shuffle
    * once at write time instead of on every query.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}
