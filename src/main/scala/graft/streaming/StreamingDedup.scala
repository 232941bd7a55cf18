package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming deduplication — the incremental form of `Dedup.exact`
  * (SURVEY.md §2.8 extension; the reference has no streaming surface).
  *
  * A training-data ingest pipeline dedups AS documents arrive, not in a
  * nightly batch over the accumulated corpus. Two shapes:
  *
  *  - [[exactClusters]]: stateful aggregation keyed by the normalized-text
  *    fingerprint — per cluster, the canonical (min) id and the copy
  *    count, continuously maintained. State is one small row per DISTINCT
  *    document; on bounded input the final table equals the batch
  *    `GROUP BY fingerprint` answer exactly (the q60 oracle).
  *  - [[firstSeen]]: pass-through dedup — emit a document only the first
  *    time its fingerprint appears. With an event-time column the state
  *    store expires entries past the watermark
  *    (`dropDuplicatesWithinWatermark`), so state is bounded by the
  *    distinct-keys-per-watermark-window, not by stream lifetime — the
  *    100 TB/unbounded-stream posture.
  *
  * Both key on `TextOps.fingerprint` (md5 of whitespace-normalized
  * lowercased text), the same fingerprint the batch path uses, so batch
  * and streaming dedup decisions agree document-for-document.
  */
object StreamingDedup {

  /** Continuously-maintained dedup clusters: fingerprint → (canonical
    * min id, copy count). Run with complete/update output mode. */
  def exactClusters(stream: DataFrame, idCol: String,
      textCol: String): DataFrame =
    stream
      .groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** First-seen pass-through dedup with watermark-bounded state: rows
    * whose fingerprint was already seen within the watermark horizon are
    * dropped; state for old fingerprints expires. Append mode. */
  def firstSeen(stream: DataFrame, textCol: String, eventTime: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("_fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(eventTime, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** One (band, bandValue, id, simhash, ts) row per SimHash band of an
    * arriving doc — the unit of state keying in [[firstSeenNear]]. */
  private[streaming] case class BandIn(
    band: Int, bval: Long, id: Long, sim: Long, ts: java.sql.Timestamp)

  /** Per-band first-seen verdict: `is_new` = 1 iff no fingerprint within
    * maxHamming was already in this band bucket. */
  private[streaming] case class BandVerdict(
    id: Long, ts: java.sql.Timestamp, is_new: Int)

  /** Streaming NEAR-dup first-seen verdicts — the SimHash extension of
    * [[firstSeen]], which drops only EXACT (normalized-fingerprint)
    * repeats: detect whether anything within Hamming distance
    * `maxHamming` of a document's 64-bit SimHash arrived inside the
    * watermark horizon.
    *
    * Shape (the streaming analogue of Dedup's band-bucketed LSH): split
    * the fingerprint into `nBands` bit-bands; by pigeonhole, two
    * fingerprints within Hamming `nBands − 1` (= 3 at the default 4×16
    * bits) agree EXACTLY on at least one band, so band value is a
    * complete candidate key — state keyed by (band, bandValue) via
    * `flatMapGroupsWithState` holds the full 64-bit fingerprints seen in
    * that bucket (verify-within-group computes the exact popcount, so
    * false bucket collisions never drop a doc), with event-time timeout
    * expiring buckets one horizon past their last arrival — state is
    * bounded by distinct-fingerprints-per-horizon × nBands, never stream
    * lifetime. Within a microbatch, each bucket processes rows in
    * (ts, id) order, so of two near-dup arrivals in one batch exactly
    * the (ts, id)-least survives — deterministic, matching
    * incrementalExact's min-id-wins.
    *
    * This is deliberately ONE stateful operator emitting PER-BAND
    * verdict rows (id, ts, is_new): a doc survives iff all `nBands` of
    * its verdicts say first-seen, and since every band row of a doc is
    * emitted in the SAME microbatch, that combine is a plain
    * batch-local aggregation — [[combineNearVerdicts]] inside
    * `foreachBatch` — NOT a second streaming stateful op (chaining an
    * aggregation after flatMapGroupsWithState trips Spark's global-
    * watermark correctness check, and the foreachBatch form also emits
    * survivors in their arrival batch instead of one watermark later).
    *
    * Contract: `idCol` must be integral (cast to long), `eventTime` a
    * TIMESTAMP column, `maxHamming < nBands`, and 64 divisible by
    * `nBands`. Output: nBands rows per doc — (id, ts, is_new). */
  def firstSeenNearVerdicts(stream: DataFrame, idCol: String,
      textCol: String, eventTime: String,
      watermarkDelaySeconds: Long = 600,
      maxHamming: Int = 3, nBands: Int = 4): DataFrame = {
    require(nBands >= 1 && 64 % nBands == 0 && maxHamming < nBands,
      s"need maxHamming ($maxHamming) < nBands ($nBands) dividing 64 " +
        "(pigeonhole: d bit flips can disturb at most d bands)")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val spark = stream.sparkSession
    import spark.implicits._
    val delayMs = watermarkDelaySeconds * 1000L
    val sim = graft.functions.VectorFunctions
      .simhash64(array_distinct(split(col(textCol), " ")))
    val bandRows = stream
      .select(col(idCol).cast("long").as("id"), sim.as("sim"),
        col(eventTime).as("ts"))
      .withWatermark("ts", s"$watermarkDelaySeconds seconds")
      .select(col("id"), col("sim"), col("ts"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sim"), b * width).bitwiseAND(lit(mask))
              .as("bval"))): _*)).as("bk"))
      .select(col("bk")("band").as("band"), col("bk")("bval").as("bval"),
        col("id"), col("sim"), col("ts"))
      .as[BandIn]
    val verdicts = bandRows
      .groupByKey(r => (r.band, r.bval))
      .flatMapGroupsWithState[List[Long], BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = it.toSeq.sortBy(r => (r.ts.getTime, r.id))
            var seen = state.getOption.getOrElse(Nil)
            val out = rows.map { r =>
              val dup = seen.exists(h =>
                java.lang.Long.bitCount(h ^ r.sim) <= maxHamming)
              seen = r.sim :: seen
              BandVerdict(r.id, r.ts, if (dup) 0 else 1)
            }
            state.update(seen)
            state.setTimeoutTimestamp(math.max(
              rows.map(_.ts.getTime).max + delayMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
    verdicts.toDF()
  }

  /** The COMPLETE streaming corpus-ingest loop over a persisted LSH
    * index (graft.ops.Dedup.buildLshIndex) — the production shape that
    * ties the dedup matrix together: for every arriving microbatch,
    * (1) near-dedup it against the index (Dedup.incrementalNearDups —
    * bucket-pruned join + exact-Jaccard verify, corpus never re-hashed),
    * (2) hand the (new_id, corpus_id, jaccard) matches to `onMatches`
    * (write them, quarantine them — caller's policy; the frame is
    * already checkpoint-materialized, safe to reuse), and (3) APPEND the
    * non-matched docs into the index (Dedup.appendLshIndex) so LATER
    * batches dedup against everything that came before. Returns the
    * DataStreamWriter — caller adds checkpointLocation/trigger and
    * starts it. State is the index itself: durable, shared, queryable —
    * nothing lives in stream memory, so the loop survives restarts by
    * construction (exactly-once hinges on the sink policy in
    * `onMatches` and idempotent ids, as with any foreachBatch sink). */
  def nearDedupIngest(stream: DataFrame, idCol: String, textCol: String,
      table: String, threshold: Double = 0.5, k: Int = 32,
      bands: Int = 16, rowsPerBand: Int = 2, buckets: Int = 16,
      onMatches: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        val matches = graft.ops.Dedup.incrementalNearDups(
          batch, table, idCol, textCol, threshold, k, bands, rowsPerBand)
        onMatches(matches)
        val dupIds = matches.select(col("new_id")).distinct()
        val keep = batch.join(dupIds,
          batch(idCol) === dupIds("new_id"), "left_anti")
        graft.ops.Dedup.appendLshIndex(keep, idCol, textCol, table,
          k, bands, rowsPerBand, buckets)
    }

  /** Batch-local combine for [[firstSeenNearVerdicts]] output, for use
    * inside `foreachBatch`: a doc survives iff ALL its band verdicts in
    * this microbatch say first-seen. Plain aggregation — every band row
    * of a doc lands in the same microbatch by construction. Output:
    * (idCol, eventTime) of surviving docs. */
  def combineNearVerdicts(verdictBatch: DataFrame, idCol: String,
      eventTime: String): DataFrame =
    verdictBatch
      .groupBy(col("id"), col("ts"))
      .agg(min(col("is_new")).as("_allnew"))
      .where(col("_allnew") === 1)
      .select(col("id").as(idCol), col("ts").as(eventTime))
}
