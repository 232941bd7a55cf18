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
      // state key: 16-byte md5 BINARY of the normalized text — exact
      // identity (this operator's contract is "drop only true repeats";
      // a 64-bit key would silently drop distinct docs on birthday
      // collisions), at half the hex form's state bytes
      .withColumn("_fp", TextOps.fingerprintBin(col(textCol)))
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
    * that bucket with their last-arrival time (verify-within-group
    * computes the exact popcount, so false bucket collisions never drop
    * a doc). Expiry is TWO-LEVEL: the event-time timeout removes a whole
    * bucket one horizon past its last arrival, and each invocation
    * prunes individual fingerprints one horizon past THEIR last arrival
    * — so a continuously-hot bucket cannot retain old fingerprints
    * forever, and state is bounded by distinct-fingerprints-per-horizon
    * × nBands, never stream lifetime. Within a microbatch, each bucket processes rows in
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
      .flatMapGroupsWithState[List[(Long, Long)], BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = it.toSeq.sortBy(r => (r.ts.getTime, r.id))
            // per-ENTRY expiry, not just per-bucket: a continuously-hot
            // bucket stays alive through its timeout, so without this
            // the fingerprint list would grow with stream lifetime and
            // suppress docs arriving many horizons after their near-dup.
            // An entry expires one horizon after its LAST arrival — the
            // same rule as the bucket timeout below, applied per
            // fingerprint (state truly bounded by
            // distinct-fingerprints-per-horizon).
            val horizon = state.getCurrentWatermarkMs() - delayMs
            var seen = state.getOption.getOrElse(Nil)
              .filter { case (_, lastMs) => lastMs >= horizon }
            val out = rows.map { r =>
              val dup = seen.exists { case (h, _) =>
                java.lang.Long.bitCount(h ^ r.sim) <= maxHamming }
              seen = (r.sim, r.ts.getTime) :: seen.filterNot(_._1 == r.sim)
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

  /** Drop every batch doc that has a SMALLER-id near-dup within the same
    * batch — the intra-batch half of the ingest loop's dedup guarantee
    * (the index join only sees docs that arrived in EARLIER batches, so
    * without this two near-dup docs landing in one microbatch both
    * survive). Pairwise rule, not cluster-min: doc b is dropped iff some
    * batch doc a < b has jaccard(a, b) ≥ threshold — every dropped doc
    * has a concrete surviving near-dup witness, and docs merely
    * TRANSITIVELY connected (a~b~c with a≁c) are judged on their own
    * pairs. Deterministic (min-id-wins, as incrementalExact). */
  private[graft] def intraBatchSurvivors(batch: DataFrame, idCol: String,
      textCol: String, threshold: Double, k: Int, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val losers = graft.ops.Dedup
      .nearDupPairs(batch, idCol, textCol, threshold, k, bands, rowsPerBand)
      .select(col("id2").as(idCol)).distinct()
    batch.join(losers, Seq(idCol), "left_anti")
  }

  /** One microbatch of the [[nearDedupIngest]] loop, REPLAY-IDEMPOTENT —
    * callable directly for batch-mode ingest and for testing the replay
    * path without a stream. Steps:
    *  1. intra-batch near-dedup ([[intraBatchSurvivors]], when
    *     `intraBatch`) — dedup within the batch before the index sees it;
    *  2. near-dedup vs the index (Dedup.incrementalNearDups), DROPPING
    *     self-matches (new_id == corpus_id): on a replayed batch the
    *     docs this run already appended match THEMSELVES at j=1.0, and
    *     filtering them (ids are unique, so a self-match can only mean
    *     replay) restores the original run's match set bit-for-bit;
    *  3. `onMatches(matches, batchId)` — give the sink the batchId so it
    *     can write to a batch-deterministic location
    *     ([[parquetMatchSink]]) and a replay OVERWRITES instead of
    *     duplicating;
    *  4. append survivors whose ids are NOT already indexed
    *     (Dedup.indexedIds — bucket-pruned probe, never a corpus scan):
    *     on replay every survivor is already there, so the append is a
    *     no-op instead of the silent index corruption the unguarded form
    *     allowed.
    * With `intraBatch` on, a replayed batch therefore reproduces its
    * match output exactly and appends nothing — idempotent end to end.
    * (With it off, two same-batch near-dups are both appended, and on
    * replay each matches the other: exact replay-stability additionally
    * needs the intra-batch step.) */
  def ingestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, table: String, threshold: Double = 0.5,
      k: Int = 32, bands: Int = 16, rowsPerBand: Int = 2,
      buckets: Int = 16, onMatches: (DataFrame, Long) => Unit,
      intraBatch: Boolean = true): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // ONE shingle pass for the whole microbatch: intra-batch dedup, the
    // index probe, and the index append all read this frame through the
    // *Sh seams (each step previously re-ran the shingle transform from
    // the raw text — at corpus scale shingling is the dominant map work
    // of the loop, and it ran 3x per microbatch). The persists also keep
    // the chain from re-executing per downstream ACTION (match sink,
    // survivor anti-join, indexed-id probe, append).
    val batchSh = batch.select(col(idCol).as("new_id"),
        graft.ops.Dedup.shinglesHashed(col(textCol)).as("_sh"))
      .persist(MEMORY_AND_DISK)
    try {
      // intra-batch canonicalization in shingle space: doc b drops iff
      // some batch doc a < b has jaccard(a, b) >= threshold (the same
      // pairwise min-id-wins rule as intraBatchSurvivors)
      val bsh = if (intraBatch) {
        val losers = graft.ops.Dedup.nearDupPairsSh(batchSh, "new_id",
            threshold, k, bands, rowsPerBand)
          .select(col("id2").as("new_id")).distinct()
        batchSh.join(losers, Seq("new_id"), "left_anti")
          .persist(MEMORY_AND_DISK)
      } else batchSh
      try {
        val matches = graft.ops.Dedup.incrementalNearDupsLazy(
            bsh, table, threshold, k, bands, rowsPerBand,
            maxPruneLiterals = 4096)
          .where(col("new_id") =!= col("corpus_id"))
          .persist(MEMORY_AND_DISK)
        try {
          onMatches(matches, batchId)
          val dupIds = matches.select(col("new_id")).distinct()
          val survivorsSh = bsh.join(dupIds, Seq("new_id"), "left_anti")
          val already = graft.ops.Dedup.indexedIds(
            survivorsSh, "new_id", table)
          val freshSh = survivorsSh.join(already,
              survivorsSh("new_id") === already("corpus_id"), "left_anti")
            .select(col("new_id").as("corpus_id"), col("_sh"))
          graft.ops.Dedup.appendLshIndexSh(freshSh, table,
            k, bands, rowsPerBand, buckets)
        } finally matches.unpersist(blocking = false)
      } finally if (bsh ne batchSh) bsh.unpersist(blocking = false)
    } finally batchSh.unpersist(blocking = false)
  }

  /** batchId-deterministic parquet sink for [[nearDedupIngest]] match
    * output: overwrite into `<dir>/batch_<id>`, so a replayed microbatch
    * REWRITES its own files instead of appending duplicates — the
    * standard idempotent-foreachBatch-sink recipe. Read the accumulated
    * matches back with `spark.read.parquet(s"$dir/batch_*")`. */
  def parquetMatchSink(dir: String): (DataFrame, Long) => Unit =
    (m, batchId) => m.write.mode("overwrite").parquet(s"$dir/batch_$batchId")

  /** The COMPLETE streaming corpus-ingest loop over a persisted LSH
    * index (graft.ops.Dedup.buildLshIndex) — the production shape that
    * ties the dedup matrix together: every arriving microbatch runs
    * [[ingestBatch]] (intra-batch dedup → index dedup → match sink →
    * guarded append), so LATER batches dedup against everything that
    * came before. Returns the DataStreamWriter — caller adds
    * checkpointLocation/trigger and starts it. State is the index
    * itself: durable, shared, queryable — nothing lives in stream
    * memory, so the loop survives restarts by construction, and because
    * [[ingestBatch]] is replay-idempotent (self-match filter + indexed-id
    * skip) a microbatch re-delivered after a crash neither duplicates
    * match rows (use [[parquetMatchSink]] or any batchId-keyed sink) nor
    * double-appends the index. */
  def nearDedupIngest(stream: DataFrame, idCol: String, textCol: String,
      table: String, threshold: Double = 0.5, k: Int = 32,
      bands: Int = 16, rowsPerBand: Int = 2, buckets: Int = 16,
      onMatches: (DataFrame, Long) => Unit,
      intraBatch: Boolean = true)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, idCol, textCol, table, threshold,
          k, bands, rowsPerBand, buckets, onMatches, intraBatch)
    }

  /** One microbatch of the [[semanticDedupIngest]] loop — the SEMANTIC
    * (embedding-cosine / SemDeDup) analogue of [[ingestBatch]], against
    * a persisted Similarity.buildIvfIndex table instead of an LSH band
    * index. Replay-idempotent by the same three guards:
    *  1. intra-batch semantic dedup (when `intraBatch`): drop every
    *     vector with a SMALLER-id same-cell twin at cosine ≥ `threshold`
    *     — the pairwise min-id-wins rule of [[intraBatchSurvivors]], so
    *     two semantic twins arriving together can't both be appended;
    *  2. same-cell index matches (Similarity.indexCellMatches — the
    *     batch's cells bucket-prune the corpus scan), DROPPING
    *     self-matches (new_id == corpus_id): a replayed vector lands in
    *     its own cell and matches itself at cosine ~1, and ids are
    *     unique, so a self-match can only mean replay;
    *  3. `onMatches(matches, batchId)` — batchId-keyed sink
    *     ([[parquetMatchSink]]) so a replay overwrites;
    *  4. append survivors NOT already indexed (Similarity.indexedVecIds
    *     — a (cell, id)-pruned probe, never a corpus scan) via
    *     appendIvfIndex.
    * With `intraBatch` on, surviving-appended pairs all sit below
    * `threshold` (a twin of a survivor was either dropped intra-batch or
    * matched the same witnesses), so a replayed batch reproduces its
    * match output exactly and appends nothing — the [[ingestBatch]]
    * replay argument, verbatim, with cosine-in-cell for Jaccard.
    *
    * Matches are SAME-CELL only (the IVF contract, as
    * Similarity.semanticDedup): a twin straddling a cell boundary is
    * missed — recall is the quantizer's nProbe=1 recall, monitored via
    * Similarity.recallAtK and repaired by rebuilding the index. */
  def semanticIngestBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, table: String, threshold: Double,
      buckets: Int = 16, onMatches: (DataFrame, Long) => Unit,
      intraBatch: Boolean = true): Unit = {
    val b0 = graft.ops.Similarity
      .assignToIndexCells(batch, table, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val b = if (intraBatch) {
        val losers = b0.as("x").join(b0.as("y"),
            col("x._cell") === col("y._cell") &&
              col("x._id") < col("y._id"))
          .where(graft.ops.Similarity.cosine(
            col("x._v"), col("y._v")) >= threshold)
          .select(col("y._id").as("_id")).distinct()
        b0.join(losers, Seq("_id"), "left_anti")
      } else b0
      // matches feeds both the sink and the survivor anti-join — persist
      // so the cell-match join runs once, not per consuming action
      val matches = graft.ops.Similarity
        .indexCellMatches(b, table, threshold)
        .where(col("new_id") =!= col("corpus_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        onMatches(matches, batchId)
        val dupIds = matches.select(col("new_id").as("_id")).distinct()
        val survivors = b.join(dupIds, Seq("_id"), "left_anti")
        val already = graft.ops.Similarity.indexedVecIds(
          survivors, "_id", table)
        val fresh = survivors.join(already,
          survivors("_id") === already("neighbor_id"), "left_anti")
        // the batch's cell assignments (nCells dot products per vector)
        // were computed once in b0 — append them as-is instead of
        // re-deriving through appendIvfIndex
        graft.ops.Similarity.appendIvfIndexAssigned(fresh, table, buckets)
      } finally matches.unpersist(blocking = false)
    } finally b0.unpersist(blocking = false)
  }

  /** The COMPLETE streaming SEMANTIC-dedup ingest loop over a persisted
    * IVF index — [[nearDedupIngest]] with embeddings in place of text:
    * every microbatch runs [[semanticIngestBatch]] (intra-batch dedup →
    * same-cell index dedup → match sink → guarded append), so later
    * batches dedup against every earlier batch's survivors. State is
    * the index itself — durable, queryable (Similarity.ivfQuery sees
    * appended vectors immediately), nothing in stream memory — and the
    * batch step's replay idempotence makes crash-redelivery safe.
    * Returns the DataStreamWriter; caller adds checkpointLocation and
    * starts it. */
  def semanticDedupIngest(stream: DataFrame, idCol: String,
      vecCol: String, table: String, threshold: Double,
      buckets: Int = 16, onMatches: (DataFrame, Long) => Unit,
      intraBatch: Boolean = true)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        semanticIngestBatch(batch, batchId, idCol, vecCol, table,
          threshold, buckets, onMatches, intraBatch)
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
