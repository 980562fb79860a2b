package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable partitioned jobs with per-partition lineage + metrics
  * (north rule: "per-partition lineage and metrics persisted to a
  * checkpoint table so any stage resumes without recompute").
  *
  * Model: a job's input is split into deterministic buckets
  * (pmod(hash-key, numBuckets)); each bucket's output lands in its own
  * directory and a lineage row (bucket, rows, checksum, wall_ms, ts)
  * is appended to the checkpoint table AFTER the bucket's data commits.
  * Resume = anti-join the bucket list against the lineage table — only
  * missing buckets recompute. Works on any filesystem with atomic
  * directory commit (the same contract Iceberg formalizes with snapshot
  * metadata; expressed here against plain parquet so the sandbox can run
  * it).
  */
object CheckpointOps {

  /** Buckets already recorded in the lineage table (empty on first run). */
  def completedBuckets(spark: SparkSession, lineageDir: String): Set[Int] =
    try spark.read.parquet(lineageDir).select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    catch { case _: Throwable => Set.empty }

  /** Run `job` over every not-yet-completed bucket of `input` keyed by
    * pmod(keyCol, numBuckets). Returns the number of buckets executed.
    * Each bucket writes outDir/bucket=<b> and then its lineage row —
    * a crash between the two replays at most one bucket (idempotent
    * overwrite), never loses one.
    */
  def runResumable(spark: SparkSession, input: DataFrame, keyCol: String,
                   numBuckets: Int, outDir: String, lineageDir: String)
                  (job: DataFrame => DataFrame): Int = {
    import spark.implicits._
    val done = completedBuckets(spark, lineageDir)
    val todo = (0 until numBuckets).filterNot(done)
    todo.foreach { b =>
      val t0 = System.nanoTime()
      val bucketIn = input.filter(pmod(col(keyCol), lit(numBuckets)) === b)
      val out = job(bucketIn)
      out.write.mode("overwrite").parquet(s"$outDir/bucket=$b")
      val written = spark.read.parquet(s"$outDir/bucket=$b")
      // order-independent, overflow-free content checksum: xor of row hashes
      val stats = written
        .select(xxhash64(struct(written.columns.map(col): _*)).as("__h"))
        .agg(count(lit(1)).as("rows"),
          coalesce(expr("bit_xor(__h)"), lit(0L)).as("checksum"))
        .collect()(0)
      val wallMs = (System.nanoTime() - t0) / 1000000
      Seq((b, stats.getLong(0), stats.getLong(1), wallMs))
        .toDF("bucket", "rows", "checksum", "wall_ms")
        .write.mode("append").parquet(lineageDir)
    }
    todo.size
  }
}
