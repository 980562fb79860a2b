package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.core.CacheScope

/** Deterministic sampling operators for training-data pipelines. */
object SamplingOps {

  /** Weighted systematic sample: rows chosen proportional to an integer
    * weight with k evenly-spaced slot boundaries over the cumulative
    * weight line — the classic exact alternative to per-row Bernoulli
    * sampling (no variance in the sample size, deterministic, re-runnable
    * on both engines). A row is selected iff its weight span
    * [cumLo, cumHi) crosses a slot boundary: floor(cumHi·k/W) >
    * floor(cumLo·k/W). The sample size is exactly k unless a single row
    * outweighs W/k (it then absorbs several slots but is emitted once).
    *
    * The prefix sums are distributed: range-partition + in-partition sort
    * on `keyCol` (which must be a total order — a unique key), one
    * lightweight per-partition-total job, then a single map pass with the
    * per-partition offsets broadcast — [[IdOps.renumber]]'s zipWithIndex
    * two-job scheme generalized from counts to sums. No single-partition
    * window anywhere, so the operator survives arbitrarily large inputs.
    * Slot arithmetic is BigInt (cum·k overflows int64 around petatoken
    * totals); the DuckDB twin's HUGEINT window sum matches it exactly.
    *
    * Output: the selected rows as (keyCol, wCol), in no particular order.
    */
  def systematicSample(df: DataFrame, keyCol: String, wCol: String, k: Long,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    require(k > 0, "sample size k must be positive")
    val spark = df.sparkSession
    val sorted = scope.persist(
      df.select(col(keyCol), col(wCol).cast("long").as(wCol))
        .repartitionByRange(col(keyCol))
        .sortWithinPartitions(keyCol))
    val rdd = sorted.rdd
    val nParts = rdd.getNumPartitions
    val partTotals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach { r => val w = r.getLong(1); require(w >= 0); s += w }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val total = offsets(nParts)
    require(total > 0, "systematicSample needs positive total weight")
    val bc = spark.sparkContext.broadcast(offsets)
    val kk = BigInt(k)
    val selected = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bc.value(i)
      it.flatMap { r =>
        val w = r.getLong(1)
        val lo = cum
        cum += w
        if (BigInt(cum) * kk / total > BigInt(lo) * kk / total)
          Iterator(Row(r.get(0), w))
        else Iterator.empty
      }
    }
    val schema = StructType(Seq(
      sorted.schema.fields(0),
      StructField(wCol, LongType, nullable = false)))
    spark.createDataFrame(selected, schema)
  }
}
