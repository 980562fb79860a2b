package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.core.CacheScope

/** Deterministic sampling operators for training-data pipelines. */
object SamplingOps {

  /** Per-GROUP weighted sampling without replacement
    * (Efraimidis–Spirakis A-Res, the per-group generalization of the
    * global q_wsample cut): every row draws the RNG-free exponential
    * arrival key ⌊lnE6(1/u)·10⁶⌋ div w with u a mixId-uniform of its
    * id, and the k SMALLEST keys per group are the sample —
    * P(pick) ∝ w within each group, deterministic and re-runnable in
    * both engines (lnE6 is the fixed-IEEE-op kernel every sketch twin
    * shares).
    *
    * Scale posture: the rank-≤-k filter on a literal compiles to
    * WindowGroupLimit, so at most k rows per group per map partition
    * cross the shuffle — the same bounded plan shape as
    * [[StatsOps.sampledQuantiles]] / [[SketchOps.kmvSketch]]; no global
    * sort, no per-group state beyond k. Rows with w ≤ 0 are excluded
    * (zero weight = never picked; the division needs w > 0).
    * Input: df with `groupCol`, a unique integer `idCol`, integer
    * `wCol`. Output: (group, id, w, race_key, rn), rn ∈ [1, k].
    */
  def weightedSampleGrouped(df: DataFrame, groupCol: String, idCol: String,
                            wCol: String, k: Int): DataFrame = {
    require(k >= 1, s"weightedSampleGrouped needs k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.filter(col(wCol) > 0)
      .select(col(groupCol), col(idCol).as("id"),
        col(wCol).cast("long").as("w"),
        (graft.plans.HllExpressions.lnE6(lit(1048576.0) /
          ((graft.functions.Fns.mixId(col(idCol)) % 1048576L) + lit(1L))
            .cast("double")) * 1000000L).as("lnu"))
      .select(col(groupCol), col("id"), col("w"),
        expr("lnu div w").as("race_key"))
    val win = Window.partitionBy(groupCol).orderBy(col("race_key"), col("id"))
    keyed.withColumn("rn", row_number().over(win).cast("long"))
      .filter(col("rn") <= k)
  }

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
