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

  /** Streaming tile density — the watermarked twin of the batch
    * SpatialOps.tileDensity (web-mercator z/x/y assignment with uint16
    * saturating counts): per event-time window, per tile. This covers the
    * north-rule spatial aggregation in streaming form — a live ingest of
    * geo-tagged pages keeps per-tile densities current without a batch
    * rescan; state is one count per (window, tile) inside the watermark
    * horizon, and late rows beyond it are dropped (bounded state).
    */
  def tileDensityStream(points: DataFrame, tsCol: String, z: Int,
                        windowLen: String, watermark: String): DataFrame =
    points.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        graft.functions.Fns.tileX(z, graft.functions.Fns.fixToDeg(col("lon_fix"))).as("tx"),
        graft.functions.Fns.tileY(z, graft.functions.Fns.fixToDeg(col("lat_fix"))).as("ty"))
      .agg(least(count(lit(1)), lit(65535L)).as("cnt"))
      .select(col("window.start").as("win_start"), col("tx"), col("ty"), col("cnt"))

  /** Streaming point-in-polygon counts — the watermarked twin of the
    * batch PIP join + per-polygon rollup (the other north-rule spatial
    * aggregation in streaming form): the broadcast cell-cover join and
    * native ray-cast refinement are STATELESS against the static polygon
    * side, so they run per micro-batch unchanged, and only the tiny
    * (window, poly_id) counts are stateful inside the watermark horizon.
    */
  def pipCountsStream(points: DataFrame, tsCol: String,
                      windowLen: String, watermark: String): DataFrame =
    graft.operators.SpatialOps
      .pipJoinConvexTagged(points.sparkSession,
        points.withWatermark(tsCol, watermark), carryCols = Seq(col(tsCol)))
      .groupBy(window(col(tsCol), windowLen), col("poly_id"))
      .count()
      .select(col("window.start").as("win_start"), col("poly_id"), col("count"))

  /** Streaming geodesic radius join — the stream-static twin of the batch
    * SpatialOps.withinRadiusGeo: every streamed point is matched to the
    * static query centers within `radiusMeters` great-circle distance
    * (rounded-mm inclusive, identical refinement Column). The query
    * side's wrapped cell cover is the SAME radius-derived construction
    * as the batch join (shared radiusCover), computed once per plan; each
    * micro-batch then runs one narrow cell equi-join + haversine refine.
    * The join is STATELESS (static right side), so no watermark is
    * required and late points still match exactly — the geofencing /
    * "alert when a page geotag lands near X" serving shape.
    */
  def radiusJoinStream(points: DataFrame, queries: DataFrame,
                       radiusMeters: Double): DataFrame = {
    val (qcellsRaw, level) = graft.operators.SpatialOps.radiusCover(queries, radiusMeters)
    // the static cover (explode + dropDuplicates) would otherwise re-run
    // every micro-batch; it stays cached for the stream's lifetime (the
    // caller unpersists via the returned plan's lineage or session stop)
    val qcells = qcellsRaw.persist()
    points
      .withColumn("cell", graft.functions.Fns.cellId(col("lon_fix"), col("lat_fix"), level))
      .join(qcells, "cell")
      .filter(col("pid") =!= col("qid"))
      .withColumn("dist_e3", graft.operators.SpatialOps.geoDistE3(
        col("lon_fix"), col("lat_fix"), col("qx"), col("qy")))
      .filter(col("dist_e3") <= lit(math.round(radiusMeters * 1000.0)))
      .select(col("qid"), col("pid"), col("dist_e3"))
  }

  /** Streaming point-to-way snap — the stream-static twin of
    * [[graft.operators.SpatialOps.snapToWays]]: live points (pid, x, y)
    * matched to the static way segments within `radiusFix` (exact planar
    * point-to-segment distance, identical refinement Columns). The static
    * side's radius-expanded cell cover ([[graft.operators.SpatialOps
    * .snapSegCover]]) is built once and persisted for the stream's
    * lifetime; each micro-batch is then one narrow cell equi-join + exact
    * refinement. A point lives in exactly one cell, so per-batch hits are
    * already unique and the join is STATELESS — no watermark, no state
    * store; the live map-matching shape (GPS ping → road candidates on
    * ingest). Emits (pid, way_id, seq) per in-range segment; per-way
    * aggregation is the consumer's downstream choice.
    */
  def snapStream(points: DataFrame, segs: DataFrame, radiusFix: Long,
                 level: Int, maxSpanFix: Long): DataFrame = {
    val cover = graft.operators.SpatialOps
      .snapSegCover(segs, radiusFix, level, maxSpanFix).persist()
    graft.operators.SpatialOps.snapCandidates(points, cover, radiusFix, level)
  }

  /** Streaming point-in-interval join: live events (lid, key, ts_us)
    * against a STATIC interval table (rid, key, start_us, end_us) —
    * the streaming face of [[graft.operators.HistoryOps.intervalJoin]]
    * (events matched to maintenance windows / campaign periods on
    * ingest). Same bucket scheme as the batch operator: the static side
    * explodes once into its covered buckets (cached for the stream's
    * lifetime, like radiusJoinStream's cover); each event maps
    * STATELESSLY to its single bucket and equi-joins on (key, bucket) —
    * no watermark, no state store, so a micro-batch costs one
    * broadcast/shuffle join regardless of stream history. A point lives
    * in exactly one bucket, so no anchor dedup is needed.
    */
  def intervalJoinStream(events: DataFrame, intervals: DataFrame,
                         bucketUs: Long, maxSpanUs: Long): DataFrame = {
    import graft.functions.Fns.idiv
    val cover = intervals
      .filter(col("end_us") >= col("start_us") &&
        col("end_us") - col("start_us") <= maxSpanUs)
      .select(col("rid"), col("key"), col("start_us").as("rs"), col("end_us").as("re"),
        explode(sequence(idiv(col("start_us"), bucketUs),
          idiv(col("end_us"), bucketUs))).as("bucket"))
      .persist()
    events
      .withColumn("bucket", idiv(col("ts_us"), bucketUs))
      .join(cover, Seq("key", "bucket"))
      .filter(col("rs") <= col("ts_us") && col("ts_us") <= col("re"))
      .select(col("lid"), col("rid"), col("key"), col("ts_us"))
  }

  /** Streaming benchmark decontamination: each live document scores
    * STATELESSLY in its own micro-batch against the static benchmark's
    * sliding n-gram hash set, broadcast once as a sorted array (the
    * benchmark is an eval suite — driver-side collection is the same
    * documented small-side contract as PointInPolygonSet's polygon map).
    * Per-row native CountInSortedSet: no join, no state store, no
    * watermark — output schema equals the batch
    * [[graft.operators.DedupOps.decontaminate]].
    */
  def decontamStream(docs: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    import graft.plans.TextHashExpressions
    val hs = benchmark.select(explode(
        TextHashExpressions.slidingNgramHashes(col("text"), n)).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    val bc = docs.sparkSession.sparkContext.broadcast(hs)
    val pm = col("n_hits") * 1000L
    docs.select(col("doc_id"),
        TextHashExpressions.slidingNgramHashes(col("text"), n).as("hs"))
      .withColumn("n_ngrams", size(col("hs")).cast("long"))
      .filter(col("n_ngrams") > 0)
      .withColumn("n_hits", TextHashExpressions.countInSortedSet(col("hs"), bc))
      .withColumn("contam_pm",
        ((pm - pmod(pm, col("n_ngrams"))) / col("n_ngrams")).cast("long"))
      .select(col("doc_id"), col("n_ngrams"), col("n_hits"), col("contam_pm"))
  }

  /** Streaming LM quality scoring: the bigram model trains ONCE on the
    * static reference split (two count aggregations collected into
    * sorted parallel arrays — the shipped model, same driver-side
    * small-side contract as decontamStream's benchmark set) and each
    * live doc scores statelessly in its own micro-batch via the
    * broadcast-probing LmNllSum expression. Identical per-position
    * arithmetic to [[graft.operators.LmOps.lmScore]] (spec-proven
    * parity); schema equal too.
    */
  def lmScoreStream(docs: DataFrame, train: DataFrame): DataFrame = {
    import graft.plans.{LmKernel, TextHashExpressions}
    def counts(n: Int) = train.select(explode(
        TextHashExpressions.slidingNgramHashes(col("text"), n)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val (u, b) = (counts(1), counts(2))
    val model = LmKernel.Model(u.map(_._1), u.map(_._2),
      b.map(_._1), b.map(_._2), u.length.toLong)
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.select(col("doc_id"),
        TextHashExpressions.slidingNgramHashes(col("text"), 1).as("ua"),
        TextHashExpressions.slidingNgramHashes(col("text"), 2).as("ba"))
      .withColumn("n_bigrams", size(col("ba")).cast("long"))
      .filter(col("n_bigrams") > 0)
      .withColumn("se", TextHashExpressions.lmNllSum(col("ua"), col("ba"), bc))
      .select(col("doc_id"), col("n_bigrams"),
        ((col("se") - pmod(col("se"), col("n_bigrams"))) / col("n_bigrams"))
          .cast("long").as("nll_e6"))
  }

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

  case class LshBucketState(ids: Vector[Long], saturated: Boolean)
  case class LshCandidate(docA: Long, docB: Long)

  /** Streaming MinHash-LSH near-duplicate candidates for an ingest
    * pipeline: each arriving doc is banded exactly like the batch operator
    * (DedupOps.bandedRows — same signatures, same band keys), and a
    * stateful pass keyed by (band, band_key) emits a candidate pair for
    * every already-seen doc in the same bucket. Output pairs are
    * normalized (docA < docB) and may repeat across bands/batches —
    * downstream dedups (exactly like the batch self-join's distinct).
    *
    * Mega-bucket semantics, streaming-adapted: a bucket whose population
    * exceeds `maxBucket` stops emitting and DROPS its id list (state for
    * a degenerate bucket is O(1) forever, the streaming analog of the
    * batch cap — already-emitted pairs cannot be retracted, so the two
    * forms agree exactly on corpora whose buckets stay within the cap,
    * and both refuse the O(s²) blowup beyond it). State per live bucket
    * is at most maxBucket ids.
    *
    * TOTAL state is one entry per distinct live (band, band_key): a
    * perpetual ingest creates buckets indefinitely, so long-running
    * deployments pass `stateTtlMs` — a bucket idle that long is evicted
    * (processing-time timeout), trading recall against docs older than
    * the horizon for bounded state, exactly dedupStream's watermark
    * trade-off. The default (0 = keep forever) matches the batch
    * operator's semantics for bounded replays.
    */
  def lshCandidateStream(docs: DataFrame,
                         maxBucket: Int = graft.operators.DedupOps.MaxBandBucket,
                         stateTtlMs: Long = 0L): Dataset[LshCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    graft.operators.DedupOps.bandedRows(docs)
      .select(col("doc_id").cast("long"), col("band").cast("int"),
        col("band_key").cast("long"))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, key) => (band, key) }
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
         state: GroupState[LshBucketState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(LshBucketState(Vector.empty, saturated = false))
            val out =
              if (st.saturated) { rows.foreach(_ => ()); Iterator.empty[LshCandidate] }
              else {
                // batch-internal order is nondeterministic — sort for stable output
                val incoming = rows.map(_._1).toArray.sorted
                var ids = st.ids
                var saturated = false
                val b = Vector.newBuilder[LshCandidate]
                incoming.foreach { id =>
                  if (!saturated && !ids.contains(id)) {
                    if (ids.length >= maxBucket) saturated = true
                    else {
                      ids.foreach(prev => b += LshCandidate(math.min(prev, id), math.max(prev, id)))
                      ids = ids :+ id
                    }
                  }
                }
                state.update(
                  if (saturated) LshBucketState(Vector.empty, saturated = true)
                  else LshBucketState(ids, saturated = false))
                b.result().iterator
              }
            if (stateTtlMs > 0 && state.exists) state.setTimeoutDuration(stateTtlMs)
            out
          }
        })
  }

  /** Per-token PPJoin bucket state: (doc_id, sz, rn) triples seen so far
    * on this prefix token; saturated buckets drop to a sentinel (the
    * MaxBandBucket pattern — a boilerplate-degenerate token stops
    * generating candidates instead of going quadratic).
    */
  case class PpjoinTokState(rows: Vector[(Long, Long, Long)], saturated: Boolean)
  case class PpjoinCandidate(docA: Long, docB: Long)

  /** Streaming twin of the batch PPJoin CANDIDATE stage
    * (DedupOps.ppjoinCandidates): ingests prefix rows (tok, doc_id, sz,
    * rn) — produced map-side from the corpus-global rarity dictionary,
    * the slowly-changing artifact a production stream broadcasts — and
    * emits candidate pairs per prefix token with BOTH lossless companion
    * filters applied in-state (length-ratio prune and PPJoin's positional
    * overlap upper bound), exactly the batch join's predicates. A pair
    * sharing several prefix tokens may be emitted once per token (the
    * batch stage ends in `.distinct()`); dedup downstream — the exact
    * verify join is idempotent per pair.
    *
    * State per token = the (doc_id, sz, rn) triples seen, capped at
    * `maxBucket` with saturation (same contract as [[lshCandidateStream]]
    * — the streaming analog of the batch MaxBandBucket bound, here the
    * STRUCTURAL cap on a degenerate vocabulary where every prefix token
    * has df ≈ n/V). Optional TTL ages idle tokens out.
    *
    * RECALL ASYMMETRY vs batch (explicit, not a bug): the batch candidate
    * stage has NO bucket cap — its boundedness comes from the lossless
    * prefix filters — so once a token saturates here, ALL its future
    * candidates are dropped, and a true pair whose ONLY shared prefix
    * token saturated is silently lost. Batch parity therefore holds only
    * below saturation; deployments must size `maxBucket` to the observed
    * per-token prefix df (on real text prefix tokens are rare by
    * construction — saturation itself is the signal that the rarity
    * dictionary is stale).
    */
  def ppjoinCandidateStream(prefix: DataFrame, thrPm: Long,
                            maxBucket: Int = graft.operators.DedupOps.MaxBandBucket,
                            stateTtlMs: Long = 0L): Dataset[PpjoinCandidate] = {
    val spark = prefix.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    prefix
      .select(col("tok").cast("string"), col("doc_id").cast("long"),
        col("sz").cast("long"), col("rn").cast("long"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (_: String, rows: Iterator[(String, Long, Long, Long)],
         state: GroupState[PpjoinTokState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(PpjoinTokState(Vector.empty, saturated = false))
            val out =
              if (st.saturated) { rows.foreach(_ => ()); Iterator.empty[PpjoinCandidate] }
              else {
                // batch-internal order is nondeterministic — sort for stable output
                val incoming = rows.map(r => (r._2, r._3, r._4)).toArray.sortBy(_._1)
                var kept = st.rows
                var saturated = false
                val b = Vector.newBuilder[PpjoinCandidate]
                incoming.foreach { case (id, sz, rn) =>
                  if (!saturated && !kept.exists(_._1 == id)) {
                    if (kept.length >= maxBucket) saturated = true
                    else {
                      kept.foreach { case (pid, psz, prn) =>
                        val lenOk = math.min(sz, psz) * 1000L >=
                          thrPm * math.max(sz, psz)
                        // positional filter: overlap ≤ common prefix before
                        // the match + the match + the shorter tail after it
                        val ubound = math.min(rn, prn) +
                          math.min(sz - rn, psz - prn)
                        val posOk = ubound * (1000L + thrPm) >= thrPm * (sz + psz)
                        if (pid != id && lenOk && posOk)
                          b += PpjoinCandidate(math.min(pid, id), math.max(pid, id))
                      }
                      kept = kept :+ ((id, sz, rn))
                    }
                  }
                }
                state.update(
                  if (saturated) PpjoinTokState(Vector.empty, saturated = true)
                  else PpjoinTokState(kept, saturated = false))
                b.result().iterator
              }
            if (stateTtlMs > 0 && state.exists) state.setTimeoutDuration(stateTtlMs)
            out
          }
        })
  }

  case class SessionEvent(userId: Long, ts: java.sql.Timestamp)

  /** Change-event shape for [[tileDeltaStream]] (coords null on delete). */
  case class TileChange(op: String, pid: Long,
                        new_lon_fix: java.lang.Long, new_lat_fix: java.lang.Long)
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class SessionsState(open: Seq[OpenSession])
  case class ClosedSession(userId: Long, startUs: Long, endUs: Long, nEvents: Long)

  /** Streaming gap sessionization — the streaming twin of the batch
    * q_sessions operator (lag-gap + running sum): a session closes when
    * `gapMinutes` pass with no event for the key. State per key = the
    * OPEN session intervals (plural: a late-but-in-watermark event may
    * start, extend backwards, or BRIDGE sessions, so a single-interval
    * state would silently mis-merge out-of-order input); each invocation
    * sweep-merges state intervals with the batch's events and finalizes
    * every interval whose end + gap is behind the watermark — a session
    * is emitted only once nothing can still touch it, via a same-key
    * batch or via EVENT-TIME TIMEOUT for idle keys. Event times are
    * carried at microsecond precision (matching the batch twin's
    * unix_micros); state is bounded by key cardinality times the handful
    * of in-flight intervals inside the watermark horizon.
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapMinutes: Int,
                       watermark: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionsState]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prior = state.getOption.map(_.open).getOrElse(Seq.empty)
          val incoming = rows.map { e =>
            val us = (e.ts.getTime / 1000L) * 1000000L + (e.ts.getNanos / 1000L)
            OpenSession(us, us, 1)
          }.toSeq
          val merged = (prior ++ incoming).sortBy(s => (s.startUs, s.endUs))
            .foldLeft(List.empty[OpenSession]) {
              case (cur :: rest, s) if s.startUs - cur.endUs <= gapUs =>
                OpenSession(cur.startUs, math.max(cur.endUs, s.endUs),
                  cur.n + s.n) :: rest
              case (acc, s) => s :: acc
            }.reverse
          // strictly behind the watermark: Spark still ADMITS events whose
          // event time equals the watermark, and a boundary-timed event at
          // gap exactly == threshold merges (<= rule) into a session that
          // a <= finalize would already have emitted — duplicate output in
          // Append mode. < keeps such a session open one more beat.
          val (done, open) = merged.partition(_.endUs + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionsState(open))
            // ms-floor can land exactly on the watermark -> clamp forward
            state.setTimeoutTimestamp(math.max(
              open.map(_.endUs + gapUs).min / 1000L,
              state.getCurrentWatermarkMs() + 1L))
          }
          done.iterator.map(s => ClosedSession(key, s.startUs, s.endUs, s.n))
        })
  }

  /** Streaming change application — the .osc apply loop as a live
    * pipeline: each micro-batch of change rows merges into a durable
    * parquet snapshot via the SAME ObjectStore semantics as the batch
    * operator (HistoryOps.mergeUpsert: highest version per key wins),
    * so after any prefix of the stream the snapshot equals the batch
    * merge of the same rows. foreachBatch is the right surface — the
    * merge needs the CURRENT snapshot as a join side, which no stateful
    * streaming operator exposes; the read-merge-overwrite round trip is
    * what table formats (Iceberg MERGE INTO) package as one atomic
    * commit, expressed here against plain parquet via a temp-dir swap:
    * the merge fully materializes into `.tmp` (reading the live snapshot)
    * BEFORE the delete+rename, so a crash mid-write leaves the live
    * snapshot untouched, and a crash between delete and rename leaves
    * the complete `.tmp` for recovery — never a half-written live dir.
    * Returns the started StreamingQuery.
    */
  def applyChangesStream(changes: DataFrame, snapshotDir: String,
                         keyCol: String, versionCol: String,
                         checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val merged =
          try {
            val base = spark.read.parquet(snapshotDir)
            graft.operators.HistoryOps.mergeUpsert(base, batch.toDF(), keyCol, versionCol)
          } catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getMessage.contains("PATH_NOT_FOUND") ||
                   e.getMessage.toLowerCase.contains("path does not exist") =>
              // first batch: the change set IS the snapshot (dedup within)
              graft.operators.HistoryOps.mergeUpsert(
                batch.toDF().limit(0), batch.toDF(), keyCol, versionCol)
          }
        val tmp = snapshotDir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = new org.apache.hadoop.fs.Path(snapshotDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(snapshotDir), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(snapshotDir))
        ()
      }
      .start()

  /** Streaming incremental tile maintenance — the live face of
    * [[graft.operators.SpatialOps.applyTileDeltas]]: every micro-batch of
    * changes (op ∈ create/modify/delete, pid, new_lon_fix, new_lat_fix)
    * merges its sparse per-cell delta into a DURABLE tile histogram AND
    * applies itself to the durable point snapshot, keeping the two in
    * sync (a later batch's modify needs the earlier batch's new position
    * as its "old"). Per batch the work is |batch| rows + one pid join
    * against the snapshot — the whole corpus is never rescanned; both
    * tables commit via the tmp-swap pattern shared with
    * [[applyChangesStream]].
    *
    * Replay safety: foreachBatch is at-least-once and the histogram delta
    * is NOT naturally idempotent (unlike the snapshot's anti-join+union,
    * which is), so every histogram row carries the `applied_batch` id and
    * a replayed batch ≤ that id skips the histogram merge. Ordering puts
    * the histogram rename FIRST: a crash between the two renames replays
    * into "hist already has the batch (guard skips), snapshot re-applies
    * idempotently" — never a double count. A missing histogram bootstraps
    * from the snapshot.
    */
  def tileDeltaStream(changes: DataFrame, snapshotDir: String, histDir: String,
                      level: Int, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyTileDeltaBatch(batch.toDF(), batchId, snapshotDir, histDir, level)
      }
      .start()

  /** One micro-batch of [[tileDeltaStream]] — package-visible so the
    * replay-idempotency spec can drive it directly.
    */
  private[graft] def applyTileDeltaBatch(batchDf: DataFrame, batchId: Long,
                                         snapshotDir: String, histDir: String,
                                         level: Int): Unit = {
    val spark = batchDf.sparkSession
    import graft.functions.Fns
    val base = spark.read.parquet(snapshotDir)
    val hist =
      try spark.read.parquet(histDir)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.toLowerCase.contains("path does not exist") =>
          base.groupBy(Fns.cellX(col("lon_fix"), level).as("bx"),
              Fns.cellY(col("lat_fix"), level).as("by"))
            .agg(count(lit(1)).as("cnt"))
            .withColumn("applied_batch", lit(-1L))
      }
    val b = batchDf.persist()
    try {
      val fs = new org.apache.hadoop.fs.Path(snapshotDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def swap(df: DataFrame, dir: String): Unit = {
        val tmp = dir + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(dir))
      }
      val appliedRow = hist.agg(max(col("applied_batch"))).head()
      val applied = if (appliedRow.isNullAt(0)) -1L else appliedRow.getLong(0)
      if (applied < batchId) {
        swap(graft.operators.SpatialOps
            .applyTileDeltas(base, hist.select("bx", "by", "cnt"), b, level)
            .withColumn("applied_batch", lit(batchId)),
          histDir)
      }
      val newRows = b.filter(col("op").isin("modify", "create"))
        .select(col("pid"), col("new_lon_fix").as("lon_fix"),
          col("new_lat_fix").as("lat_fix"))
      swap(base.join(b.select("pid"), Seq("pid"), "left_anti")
        .unionByName(newRows), snapshotDir)
    } finally { b.unpersist(); () }
  }

  /** Streaming Count-Min sketch — the live face of SketchOps.cmsSketch,
    * value-identical by construction: the same mixId counter positions,
    * kept current by a plain streaming aggregation in Update mode. State
    * is bounded at d·w counters NO MATTER the key cardinality of the
    * stream — the property that makes CMS the right heavy-hitter pass
    * for an unbounded ingest where exact per-key state would grow
    * forever. After any prefix of the stream the emitted counters equal
    * the batch sketch over the same rows (parity spec).
    */
  def cmsStream(hashes: DataFrame, hashCol: String,
                w: Int = graft.operators.SketchOps.CmsW,
                d: Int = graft.operators.SketchOps.CmsD): DataFrame =
    hashes.select(posexplode(array((0 until d).map(j =>
        graft.functions.Fns.mixId(col(hashCol) + lit(j * graft.operators.SketchOps.CmsSeed)) % w): _*))
        .as(Seq("row_j", "col_w")))
      .groupBy("row_j", "col_w").agg(count(lit(1)).as("cnt"))

  case class HllState(regs: Array[Byte])
  case class HllEstimate(group: String, nRegs: Long, regSum: Long, estE3: Long)

  /** Incremental HyperLogLog per group — the streaming face of
    * SketchOps.hllDistinct, value-identical by construction: the state is
    * the 64-byte register array, and rank/estimate come from the SAME
    * core kernel (graft.core.Hll) the batch operator and the DuckDB
    * oracle constants derive from, so after any prefix of the stream the
    * emitted sketch equals the batch operator run on the same rows.
    * Update-mode output: every batch re-emits the groups it touched.
    * Hash contract per Hll: NONNEGATIVE values — floorMod guards the
    * register index so an out-of-contract negative hash degrades (like
    * the batch form) instead of killing the streaming query.
    */
  def hllStream(hashes: Dataset[(String, Long)]): Dataset[HllEstimate] = {
    import hashes.sparkSession.implicits._
    import graft.core.Hll
    hashes.groupByKey(_._1).mapGroupsWithState(
      GroupStateTimeout.NoTimeout())(
      (group: String, rows: Iterator[(String, Long)], state: GroupState[HllState]) => {
        val regs = state.getOption.map(_.regs).getOrElse(new Array[Byte](Hll.M))
        rows.foreach { case (_, h) =>
          val reg = java.lang.Math.floorMod(h, Hll.M.toLong).toInt
          val rho = Hll.rho(h)
          if (rho > regs(reg)) regs(reg) = rho.toByte
        }
        state.update(HllState(regs))
        var nRegs = 0L
        var regSum = 0L
        regs.foreach { r =>
          if (r > 0) { nRegs += 1; regSum += 1L << (Hll.RhoCap - r) }
          else regSum += Hll.Scale
        }
        HllEstimate(group, nRegs, regSum, Hll.estE3(regSum, nRegs.toInt, Hll.M))
      })
  }

  case class GeoObs(entity: Long, ts: Long, polys: Seq[Int])
  case class GeofenceState(inside: Set[Int])
  case class GeofenceEvent(entity: Long, ts: Long, polyId: Int, kind: String)

  /** Streaming geofence transitions — the live face of
    * [[graft.operators.SpatialOps.geofenceTransitions]]. Input: one row
    * per observation carrying the polygons containing it (from a
    * stateless broadcast PIP stage, so the only STATE here is the
    * membership delta). Per-entity state = the polygon set it was inside
    * at its last observation — bounded by CONCURRENT membership (a
    * handful of polygons), never by track history. Events are the set
    * differences against that state, so batch and stream emit the same
    * enter/exit rows; the first observation of an entity emits nothing
    * (no prior state), matching the batch operator. Observations must
    * arrive ts-ordered per entity ACROSS micro-batches (a live track is;
    * an out-of-order feed needs an upstream watermark sort) — rows
    * within a batch are sorted here.
    */
  def geofenceStream(obs: Dataset[GeoObs]): Dataset[GeofenceEvent] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.entity).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (entity: Long, rows: Iterator[GeoObs], state: GroupState[GeofenceState]) => {
        var inside: Option[Set[Int]] = state.getOption.map(_.inside)
        val out = scala.collection.mutable.ArrayBuffer[GeofenceEvent]()
        rows.toSeq.sortBy(_.ts).foreach { o =>
          val now = o.polys.toSet
          inside.foreach { prev =>
            (now -- prev).toSeq.sorted.foreach(p =>
              out += GeofenceEvent(entity, o.ts, p, "enter"))
            (prev -- now).toSeq.sorted.foreach(p =>
              out += GeofenceEvent(entity, o.ts, p, "exit"))
          }
          inside = Some(now)
        }
        inside.foreach(s => state.update(GeofenceState(s)))
        out.iterator
      })
  }

  case class Versioned(key: Long, version: Long, tsMicros: Long)
  case class EndTimed(key: Long, version: Long, tsMicros: Long, endMicros: Option[Long])

  /** Streaming EndTime: each arriving version closes the previous version
    * of the same key (emits it with endtime = new version's timestamp).
    * State = the single open version per key — exactly the reference's
    * one-element lookahead buffer. The final open version stays in state
    * (flushed only on timeout/stream end), matching the reference where
    * the last version's endtime is 0/null.
    */
  case class MmCandRow(entity: Long, tidx: Long, cx: Long, cy: Long,
                       way: Long, emis: Long)
  case class MmState(nObs: Long, lastTidx: Long,
                     frontier: Seq[(Long, Long, Long, Long)])
  case class MmBest(entity: Long, nObs: Long, bestCost: Long)

  /** Online Viterbi map matching — the streaming twin of
    * [[graft.operators.SpatialOps.hmmMapMatch]]: per entity the state is
    * the DP FRONTIER (current level's (cx, cy, way, cost) candidates,
    * K-bounded by the caller's top-K candidate generation — 4·8·K bytes
    * per live track, not the track history), so a GPS stream is matched
    * incrementally with exactly the batch recurrence. Each micro-batch
    * folds its new tidx levels in ascending order and emits the running
    * (entity, nObs, bestCost); the row with the highest nObs equals the
    * batch DP on the same prefix — the parity the spec pins. Candidate
    * rows for an already-folded tidx (late data) are dropped by the
    * `lastTidx` guard — the documented in-order contract, same class as
    * dedupStream's watermark horizon.
    */
  def mapMatchStream(cands: Dataset[MmCandRow],
                     switchPenalty: Long): Dataset[MmBest] = {
    import cands.sparkSession.implicits._
    cands.groupByKey(_.entity).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (entity: Long, rows: Iterator[MmCandRow], state: GroupState[MmState]) => {
        val st = state.getOption.getOrElse(MmState(0L, Long.MinValue, Seq.empty))
        val levels = rows.toSeq.filter(_.tidx > st.lastTidx)
          .groupBy(_.tidx).toSeq.sortBy(_._1)
        if (levels.isEmpty) Iterator.empty
        else {
          var frontier = st.frontier
          for ((_, lvl) <- levels) {
            frontier =
              if (frontier.isEmpty) lvl.map(c => (c.cx, c.cy, c.way, c.emis))
              else lvl.map { c =>
                val best = frontier.iterator.map { p =>
                  val dx = c.cx - p._1; val dy = c.cy - p._2
                  p._4 + dx * dx + dy * dy +
                    (if (c.way == p._3) 0L else switchPenalty)
                }.min
                (c.cx, c.cy, c.way, best + c.emis)
              }
          }
          val nObs = st.nObs + levels.size
          state.update(MmState(nObs, levels.last._1, frontier))
          Iterator.single(MmBest(entity, nObs, frontier.map(_._4).min))
        }
      })
  }

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
