package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's push-based
  * handler-chain semantics (SURVEY.md §2.10):
  *
  *  - phase barriers (the before/after callbacks) become watermark-driven
  *    state flushes;
  *  - the EndTime handler (reference/include/osmium/handler/endtime.hpp:
  *    36-131 — one-element lookahead per key) becomes a stateful
  *    flatMapGroupsWithState holding the previous version per key;
  *  - change-file application becomes a stream-static merge per batch.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts — the streaming analog of the
    * density/tile aggregation (late rows beyond the watermark dropped).
    */
  def windowedCounts(events: DataFrame, tsCol: String,
                     windowLen: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .count()
      .select(col("window.start").as("win_start"), col("event_type"), col("count"))

  /** Streaming exact dedup for an ingest pipeline: keep the first
    * occurrence of each text (keyed by sha256 + length, like the batch
    * exactDuplicates), with the dedup state bounded by a watermark —
    * duplicates arriving later than the watermark horizon are passed
    * through rather than growing state forever, the standard
    * bounded-state trade-off of streaming dedup at corpus scale.
    */
  def dedupStream(docs: DataFrame, tsCol: String, watermark: String): DataFrame =
    docs
      .withColumn("text_sha", sha2(col("text"), 256))
      .withColumn("text_len", length(col("text")).cast("long"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_sha", "text_len")

  case class Versioned(key: Long, version: Long, tsMicros: Long)
  case class EndTimed(key: Long, version: Long, tsMicros: Long, endMicros: Option[Long])

  /** Streaming EndTime: each arriving version closes the previous version
    * of the same key (emits it with endtime = new version's timestamp).
    * State = the single open version per key — exactly the reference's
    * one-element lookahead buffer. The final open version stays in state
    * (flushed only on timeout/stream end), matching the reference where
    * the last version's endtime is 0/null.
    */
  def endTimeStream(events: Dataset[Versioned]): Dataset[EndTimed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (key: Long, rows: Iterator[Versioned], state: GroupState[Versioned]) => {
        val sorted = (state.getOption.toSeq ++ rows.toSeq).sortBy(_.version)
        if (sorted.isEmpty) Iterator.empty
        else {
          state.update(sorted.last)
          sorted.sliding(2).collect {
            case Seq(prev, next) =>
              EndTimed(key, prev.version, prev.tsMicros, Some(next.tsMicros))
          }
        }
      })
  }
}
