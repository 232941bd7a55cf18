package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators a training-data pipeline needs over behavioral
  * logs: gap-based sessionization and as-of (most-recent-prior) joins.
  *
  * Both are ONE shuffle on the key column and pure window passes after
  * that — no range-join explosion, no per-key driver loops — so they
  * scale with the number of (key, time) partitions like any windowed
  * aggregation. Skewed keys are AQE's problem, same as every window.
  */
object TimeOps {

  /** Gap-based sessionization: events of the same `keyCol` belong to one
    * session while consecutive gaps are ≤ `gapSeconds`; a larger gap
    * starts a new session. Adds `session_idx` (0-based per key, in time
    * order) — the classic lag + running-sum-of-boundaries formulation.
    * `tieCol` breaks equal-timestamp ordering deterministically. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // via TIMESTAMP: TIMESTAMP_NTZ has no direct numeric cast (identity
    // conversion under the engine's fixed UTC session timezone)
    def secs(c: Column) = c.cast("timestamp").cast("double")
    val gap = secs(col(tsCol)) - secs(lag(col(tsCol), 1).over(w))
    val newSession = when(gap.isNull || gap > gapSeconds, 1).otherwise(0)
    df.withColumn("_new", newSession)
      .withColumn("session_idx",
        (sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
          .cast("long"))
      .drop("_new")
  }

  /** Backward as-of join: for every left row, attach `payloadCols` of the
    * LATEST right row with the same `keyCol` and right ts ≤ left ts
    * (DuckDB/kdb ASOF JOIN semantics; equal timestamps match, and among
    * equal right timestamps the largest `tieCol` wins — fully
    * deterministic). Implemented as a union + one window pass with
    * last(_, ignoreNulls): the sort-merge formulation — one shuffle on
    * the key, linear in |left| + |right|, versus the O(|left|·|right|)
    * range join a naive join-then-filter would plan. */
  /** Scalable BATCH interval join (band join): match each point row to
    * every interval [lo, hi] with the same key containing its timestamp
    * — attribution windows, sensor-range enrichment, the batch analogue
    * of StreamingJoin.intervalJoin. A naive `ts BETWEEN lo AND hi` join
    * carries no equi-predicate beyond the key and degenerates per hot
    * key; this form BINS time into `binSeconds` buckets, explodes each
    * interval to the bins it touches, and equi-joins on (key, bin) with
    * the exact BETWEEN as a post-filter — a plain shuffle hash/SMJ join,
    * never a nested loop (asserted by OpsSpec). Each point lives in
    * exactly ONE bin, so no pair can match twice (no dedup pass needed).
    * The blowup factor is span/binSeconds intervals-side rows — pick
    * binSeconds near the typical span, exactly like choosing a streaming
    * watermark window. Point columns come back as `pt_<name>`; both
    * bounds are inclusive. */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
      keyCol: String, loCol: String, hiCol: String, tsCol: String,
      binSeconds: Long, payloadCols: Seq[String],
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binSeconds >= 1 && maxBinsPerInterval >= 1)
    def secs(c: Column) = c.cast("timestamp").cast("double")
    def bin(c: Column) = floor(secs(c) / lit(binSeconds.toDouble)).cast("long")
    // fail-fast bin-count guard (same contract as exactNearDups' maxRows):
    // one corrupt interval (hi in the far future, or lo/hi swapped —
    // sequence() would silently generate a DESCENDING bin list) must
    // raise a clear per-row error, not explode the whole job
    val nb = bin(col(hiCol)) - bin(col(loCol)) + lit(1L)
    val bins = when(nb.between(lit(1L), lit(maxBinsPerInterval)),
        sequence(bin(col(loCol)), bin(col(hiCol))))
      .otherwise(raise_error(format_string(
        "graft intervalJoin: interval [%s, %s] spans %s bins (allowed 1..%s)" +
          " — corrupt bounds or binSeconds too small",
        col(loCol).cast("string"), col(hiCol).cast("string"),
        nb.cast("string"), lit(maxBinsPerInterval.toString)))
        .cast("array<bigint>"))
    val li = intervals.withColumn("_ibin", explode(bins))
    val pts = points.select(
      (col(keyCol).as("_k") +: col(tsCol).as("_pts") +:
        payloadCols.map(c => col(c).as(s"pt_$c"))): _*)
      .withColumn("_pbin", bin(col("_pts")))
    li.join(pts, col(keyCol) === col("_k") && col("_ibin") === col("_pbin"))
      .where(col("_pts") >= col(loCol) && col("_pts") <= col(hiCol))
      .drop("_ibin", "_pbin", "_k")
      .withColumnRenamed("_pts", s"pt_$tsCol")
  }

  /** NEAREST as-of join: for every left row, the right row with the same
    * `keyCol` whose timestamp is CLOSEST in either direction (sensor
    * alignment, nearest-snapshot enrichment — where backward-only as-of
    * attaches a stale row when a fresher one sits just ahead). Equal
    * distance prefers the earlier (backward) row, equal timestamps
    * match, so the pick is total and deterministic.
    *
    * Same sort-merge shape as [[asofJoin]] — one union, one shuffle on
    * the key, TWO window passes over the same sort (backward
    * last-non-null, forward first-non-null), then a per-row distance
    * compare. Linear in |left| + |right|; never a range join. The right
    * timestamp rides inside the payload struct (`_ts`), so the compare
    * never mixes columns from different right rows. Output: left columns
    * + `near_ts` + `near_<payload>`. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val rStructType = org.apache.spark.sql.types.StructType(
      right.schema(tsCol).copy(name = "_ts") +:
        payloadCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      leftCols.map(col) :+ lit(1).as("_side") :+
        lit(null).cast(rStructType).as("_r"): _*)
    val r = right.select(
      leftCols.map(c => if (c == keyCol || c == tsCol || c == tieCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side") :+
        struct(col(tsCol).as("_ts") +: payloadCols.map(col): _*).as("_r"): _*)
    val wb = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col(tieCol))
      .rowsBetween(0, Window.unboundedFollowing)
    // distances compare in EXACT integer microseconds — a double
    // epoch-seconds cast quantizes at ~0.45 µs at current epoch
    // magnitudes, which could flip the "equal distance prefers earlier"
    // tie rule nondeterministically on µs-resolution data
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    l.unionByName(r)
      .withColumn("_prev", last(col("_r"), ignoreNulls = true).over(wb))
      .withColumn("_next", first(col("_r"), ignoreNulls = true).over(wf))
      .where(col("_side") === 1)
      .withColumn("_pick",
        when(col("_prev").isNull, col("_next"))
          .when(col("_next").isNull, col("_prev"))
          .when(micros(col(tsCol)) - micros(col("_prev")("_ts")) <=
            micros(col("_next")("_ts")) - micros(col(tsCol)), col("_prev"))
          .otherwise(col("_next")))
      .select(leftCols.map(col) ++
        (col("_pick")("_ts").as("near_ts") +:
          payloadCols.map(c => col("_pick")(c).as(s"near_$c"))): _*)
  }

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // the payload rides as ONE struct per right row: last(_, ignoreNulls)
    // then picks the latest right ROW atomically — per-column fills would
    // skip legitimately-NULL payload values (attaching a stale older
    // row's value) and could mix columns from different right rows
    val rStructType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      leftCols.map(col) :+ lit(1).as("_side") :+
        lit(null).cast(rStructType).as("_r"): _*)
    val r = right.select(
      leftCols.map(c => if (c == keyCol || c == tsCol || c == tieCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side") :+
        struct(payloadCols.map(col): _*).as("_r"): _*)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    // equal-timestamp right row is visible to the left row's frame
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("_r")(c).as(s"asof_$c")): _*)
  }

  /** CONVERSION FUNNEL — ordered event-sequence completion per key:
    * the earliest chain step1 < step2 < … < stepN (strict event-time
    * order, first-match semantics: each step is the EARLIEST occurrence
    * after the previous step) completed within `withinSeconds` of step
    * 1. The behavioral-analytics sibling of the FILTER funnel
    * (Funnel.report counts rows through predicate gates; this counts
    * KEYS through an ordered temporal pattern).
    *
    * One aggregation per step — min(ts) over the step's events later
    * than the (broadcast-joined) previous step time — so the plan is
    * |steps| key-partitioned aggs + joins, never a per-key sort or a
    * cross join; skewed keys are AQE's problem like any groupBy. Ties
    * at equal ts: the chain needs STRICTLY increasing timestamps
    * (same-instant events are one user action, not a sequence).
    *
    * Output: (keyCol, t_1 … t_N, converted) — t_i null once the chain
    * breaks; converted = chain complete AND t_N − t_1 ≤ window. */
  def conversionFunnel(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      withinSeconds: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    // integer microseconds: the window comparison is exact, no float
    // boundary semantics to match across engines
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val first = df.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t_1"))
    val chained = steps.tail.zipWithIndex.foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t_${i + 1}"; val cur = s"t_${i + 2}"
        val nxt = df.where(col(typeCol) === step)
          .select(col(keyCol), col(tsCol).as("_ts"))
          .join(acc.select(col(keyCol), col(prev).as("_tp")), Seq(keyCol))
          .where(col("_ts") > col("_tp"))
          .groupBy(col(keyCol)).agg(min(col("_ts")).as(cur))
        acc.join(nxt, Seq(keyCol), "left")
    }
    chained.withColumn("converted",
      col(s"t_${steps.size}").isNotNull &&
        micros(col(s"t_${steps.size}")) - micros(col("t_1")) <=
          withinSeconds * 1000000L)
  }

  /** TIME-GRID GAP-FILL (resample + forward-fill): bucket events to a
    * fixed step, materialize every key's COMPLETE grid from its first
    * to its last bucket, and carry the last observed aggregate forward
    * across empty buckets — the densification step feature pipelines
    * and activity time-series need before windowed models (a missing
    * hour is "no events, value unchanged", not an absent row).
    *
    * The grid is generated per key with `sequence()` + `explode` — a
    * narrow generator over the one-row-per-key span frame, never a
    * driver loop or a cross join against a calendar table — and the
    * fill is one `last(ignoreNulls)` running window per key. Grid size
    * is span/step rows per key: bound the step to the span scale (an
    * hourly grid over years of keys is the caller's explosion to own,
    * same contract as intervalJoin's binSeconds). Per-bucket aggregate
    * is `max(valCol)` — order-independent, so float-exact across
    * engines, unlike a sum.
    *
    * Output: (keyCol, ts_bucket, n_events, filled_max) — n_events = 0
    * on gap rows, filled_max = last non-null max at or before the
    * bucket (null until the key's first observation, which by
    * construction is its first grid row). */
  def gapFill(df0: DataFrame, keyCol: String, tsCol: String,
      valCol: String, stepSeconds: Long = 3600L): DataFrame = {
    require(stepSeconds >= 1)
    val step = s"$stepSeconds seconds"
    // non-timestamp ts inputs (string dates from JSON/CSV) normalize
    // once up front; timestamp/ntz keep their type end-to-end
    val df = df0.schema(tsCol).dataType match {
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType => df0
      case _ => df0.withColumn(tsCol, col(tsCol).cast("timestamp"))
    }
    val bucketed = df
      .withColumn("_b",
        timestamp_seconds(
          floor(col(tsCol).cast("timestamp").cast("double") /
            stepSeconds.toDouble) * stepSeconds)
          .cast(df.schema(tsCol).dataType))
      .groupBy(col(keyCol), col("_b"))
      .agg(count("*").as("n_events"),
        round(max(col(valCol)), 4).as("_mx"))
    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("_b")).as("_b0"), max(col("_b")).as("_b1"))
      .select(col(keyCol),
        explode(sequence(col("_b0"), col("_b1"),
          expr(s"INTERVAL $step"))).as("_b"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(bucketed, Seq(keyCol, "_b"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_max",
        round(last(col("_mx"), ignoreNulls = true).over(w), 4))
      .withColumnRenamed("_b", "ts_bucket")
      .drop("_mx")
  }
}
