package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY.md §2.8 extension): match events
  * from two live streams on a key within an event-time range — clicks to
  * the purchases that follow within the attribution window, impressions
  * to conversions, sensor pairs.
  *
  * Both sides carry watermarks, and the join condition bounds the
  * right-side event time to [left_ts, left_ts + within], so Spark can
  * prove per-side state retention: left rows expire once the right
  * watermark passes left_ts + within, right rows once the left watermark
  * passes right_ts — state is bounded by rate × (delay + within), NOT by
  * stream lifetime. On bounded input the emitted matches equal the batch
  * range join exactly (the q69 oracle). */
object StreamingJoin {

  /** Inner interval join: rows (left ⋈ right) with equal `key` and
    * `rightTs` ∈ [`leftTs`, `leftTs` + `within`]. Column names of the
    * two sides must be disjoint apart from `key` (rename before calling,
    * as relational joins require). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay).as("l")
    val r = right.withWatermark(rightTs, watermarkDelay).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
      .drop(col(s"r.$key"))
  }
}
