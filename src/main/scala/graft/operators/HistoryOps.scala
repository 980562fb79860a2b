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

  /** As-of join: each left row picks up the payload of the LATEST right
    * row with the same key and right ts <= left ts (inclusive), or nulls
    * when no prior right row exists — the temporal lookup the reference's
    * RangeFromHistory answers per-timestamp (handler/range_from_history
    * .hpp:38-72) generalized to a stream-vs-stream join, and the operator
    * Spark has no built-in for.
    *
    * Plan: tag the sides, unionByName, ONE window pass ordered by
    * (ts, side) with right rows sorting before left rows at equal ts —
    * a single hash shuffle of both inputs on the key plus one
    * per-partition sort. No per-row range scan, no broadcast, no
    * interval explosion: at 10^12 rows this is exactly two scans + one
    * exchange, and skewed keys fall under AQE like any other window.
    * The right payload travels as one struct so `last(ignoreNulls)` skips
    * left rows but never skips a matched right row whose payload FIELDS
    * are null (field-wise last() would resurrect older values).
    *
    * Duplicate right rows at equal (key, ts) resolve DETERMINISTICALLY to
    * the max payload struct: the window sort includes `__r` as a final
    * key, so among equal-ts right rows the last (and thus matched) one is
    * the struct-lexicographic maximum — same sort, same single exchange,
    * no pre-aggregation pass. (DuckDB's native ASOF JOIN leaves the pick
    * arbitrary under such dupes; the oracle data keeps (key, ts) unique.)
    * Output: every left column, then `<prefix><tsCol>` (matched right ts)
    * and `<prefix><payload>` for each payload column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               prefix: String = "r_"): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(tsCol),
        struct(col(tsCol).as("__ts") +: payloadCols.map(col): _*).as("__r"))
      .withColumn("__side", lit(0))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payloadCols.foldLeft(matched.withColumn(prefix + tsCol, col("__m.__ts"))) {
      (d, p) => d.withColumn(prefix + p, col("__m")(p))
    }.drop("__side", "__r", "__m")
  }

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

  /** Interval overlap join — the 1-D range join Spark has no native
    * operator for, as a BUCKETIZED equi-join: each interval explodes to
    * the fixed-width time buckets it covers, sides equi-join on
    * (key, bucket), and the true-overlap predicate filters the bucket
    * collisions. Duplicate elimination is FREE (no distinct): a pair is
    * kept only in the overlap's ANCHOR bucket — the bucket containing
    * `greatest(l.start, r.start)` — which exists exactly once per
    * overlapping pair, so no shuffle-side dedup state is needed.
    *
    * Scale posture: one shuffle on (key, bucket); per-row fanout is
    * span/bucketUs, bounded by the span contract `maxSpanUs` (same
    * posture as [[SpatialOps.segmentCellCover]] — pipelines split longer
    * intervals upstream; out-of-contract rows are dropped, not wrong).
    * Pick bucketUs near the typical interval span: too small inflates the
    * explode, too large inflates the bucket-collision candidate set.
    * Overlap is CLOSED (touching endpoints count, overlap_us = 0).
    *
    * Inputs: (lid|rid, key, start_us, end_us). Output:
    * (lid, rid, key, overlap_us).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   bucketUs: Long, maxSpanUs: Long): DataFrame = {
    import graft.functions.Fns.idiv
    def buckets(df: DataFrame, id: String, s: String, e: String) = df
      .filter(col("end_us") >= col("start_us") &&
        col("end_us") - col("start_us") <= maxSpanUs)
      .select(col(id), col("key"), col("start_us").as(s), col("end_us").as(e),
        explode(sequence(idiv(col("start_us"), bucketUs),
          idiv(col("end_us"), bucketUs))).as("bucket"))
    val l = buckets(left, "lid", "ls", "le")
    val r = buckets(right, "rid", "rs", "re")
    l.join(r, Seq("key", "bucket"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le") &&
        col("bucket") === idiv(greatest(col("ls"), col("rs")), bucketUs))
      .select(col("lid"), col("rid"), col("key"),
        (least(col("le"), col("re")) - greatest(col("ls"), col("rs"))).as("overlap_us"))
  }

  /** Interval-sweep CONCURRENCY profile: for every boundary instant, how
    * many intervals [start, end) are open — the classic +1/−1 delta sweep
    * (max concurrent versions of the reference's history model; max
    * concurrent sessions/crawls in the production table). An interval is
    * open at its start and closed at its end; null ends never close.
    *
    * Scale posture: the naive sweep is a GLOBAL ordered prefix sum — a
    * single-partition window at any scale. This runs it two-level: deltas
    * aggregate per instant (one hash shuffle), instants roll up to coarse
    * time buckets (`bucketUs` — bucket COUNT is bounded by the corpus'
    * calendar span, independent of row count), ONE tiny window over the
    * bucket frame computes exclusive bucket offsets, and a broadcast join
    * hands each instant its offset so the final within-bucket prefix sum
    * is a window PARTITIONED by bucket — every partition bounded by one
    * bucket's distinct instants. Output (ts_us, concurrent), one row per
    * distinct boundary instant.
    */
  def concurrencyProfile(intervals: DataFrame, startCol: String,
                         endCol: String, bucketUs: Long): DataFrame = {
    val deltas = intervals.select(col(startCol).as("ts_us"), lit(1L).as("d"))
      .unionByName(intervals.filter(col(endCol).isNotNull)
        .select(col(endCol).as("ts_us"), lit(-1L).as("d")))
      .groupBy("ts_us").agg(sum(col("d")).as("d"))
      .withColumn("bk", expr(s"ts_us div ${bucketUs}L"))
    val offsets = deltas.groupBy("bk").agg(sum(col("d")).as("bd"))
      .withColumn("off", coalesce(
        sum(col("bd")).over(Window.orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bk", "off")
    val win = Window.partitionBy("bk").orderBy("ts_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(broadcast(offsets), Seq("bk"))
      .select(col("ts_us"),
        (col("off") + sum(col("d")).over(win)).as("concurrent"))
  }
}
