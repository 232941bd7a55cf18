package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
