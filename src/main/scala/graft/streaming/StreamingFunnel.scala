package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the CEP-shaped sequence detector:
  * per-key ordered-pattern matching (step1 < step2 < … < stepN, strict
  * event-time order, first-match semantics) as ONE
  * `flatMapGroupsWithState` state machine, the streaming twin of
  * TimeOps.conversionFunnel (whose |steps| batch aggregations cannot
  * chain in a streaming query — multiple stateful aggs trip Spark's
  * global-watermark check).
  *
  * State per key is the matched-step timestamp list — AT MOST |steps|
  * longs, constant-size by construction: total state = keys × |steps|,
  * never stream lifetime (the boundedness argument other streaming
  * state here needs expiry for comes free). Greedy in-ts-order advance
  * equals the batch operator's nested min chain: the first step-i event
  * strictly after t_{i−1} IS min{ts > t_{i−1}}, and an equal-timestamp
  * event can never advance under either processing order (strictness),
  * so the fold is order-deterministic.
  *
  * Events must arrive ts-ordered ACROSS microbatches for cross-batch
  * chains (within a batch they are sorted here); on bounded input —
  * the oracle harness — stream == batch exactly.
  *
  * STATE LIFETIME. Per-key state is ≤ |steps| longs, but with
  * `watermarkDelay = None` keys are never evicted: total state grows
  * with distinct keys EVER SEEN — fine for bounded/enum keys, a leak
  * for user-id-grade keys on an unbounded stream. Pass
  * `watermarkDelay = Some(d)`: the input gets `withWatermark(tsCol,
  * d)` and the state machine runs under `EventTimeTimeout`, evicting a
  * key once the watermark passes its funnel horizon — `t_1 +
  * withinSeconds` for a started chain (no later event can convert
  * inside the window after that: event time > watermark > t_1 + win),
  * `last_event + withinSeconds` for keys with no chain yet, and the
  * same for completed chains (their snapshot is already emitted; the
  * timeout emits nothing, so the last emitted row stands). Total state
  * is then bounded by keys ACTIVE within one (delay + window) span,
  * not stream lifetime. After eviction a returning key starts a FRESH
  * attempt — the documented divergence from the batch operator's
  * global first-match (the price of bounded state; size `d` ≥ the
  * longest funnel you care about). */
object StreamingFunnel {

  private[streaming] case class Ev(key: Long, ts: java.time.Instant,
      step: Int) {
    def tsMicros: Long = ts.getEpochSecond * 1000000L + ts.getNano / 1000L
  }
  private[streaming] case class Prog(key: Long, times: Seq[Long])

  /** Per-key funnel progress snapshots (Update mode): one row per key
    * per microbatch it receives events in — (keyCol, t_1 … t_N,
    * converted). Keys that never matched step 1 emit all-null times. */
  def funnelProgress(stream: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], withinSeconds: Long,
      watermarkDelay: Option[String] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val spark = stream.sparkSession
    import spark.implicits._
    val n = steps.size
    val winMicros = withinSeconds * 1000000L
    val winMillis = withinSeconds * 1000L
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    // cast BEFORE the watermark, and project the watermarked attribute
    // through un-wrapped: an Alias over a bare attribute keeps the
    // event-time metadata, an Alias over Cast(attr) strips it and the
    // EventTimeTimeout check would reject the query
    val cast = stream.withColumn(tsCol, col(tsCol).cast("timestamp"))
    val marked = watermarkDelay match {
      case Some(d) => cast.withWatermark(tsCol, d)
      case None => cast
    }
    val evs = marked.select(col(keyCol).cast("long").as("key"),
        col(tsCol).as("ts"), stepIdx.as("step"))
      .where(col("step") >= 0).as[Ev]
    val timeoutConf =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val progressed = evs.groupByKey(_.key)
      .flatMapGroupsWithState[List[Long], Prog](
        OutputMode.Update, timeoutConf) {
        (key, it, state) =>
          if (state.hasTimedOut) {
            // horizon lapsed past the watermark: the chain can never
            // convert (or already has and its row is emitted) — drop
            // the state, emit nothing; the last snapshot stands
            state.remove()
            Iterator.empty
          } else {
            // head = latest matched step's micros (list built backwards)
            var times = state.getOption.getOrElse(Nil)
            val sorted = it.toSeq.sortBy(_.tsMicros)
            sorted.foreach { e =>
              val progress = times.length
              if (progress < n && e.step == progress &&
                  times.forall(e.tsMicros > _))
                times = e.tsMicros :: times
            }
            state.update(times)
            if (watermarkDelay.isDefined) {
              // t_1 = times.last (list is built backwards); keys with
              // no chain age out a window past their last activity
              val baseMillis = times.lastOption
                .getOrElse(sorted.last.tsMicros) / 1000L
              state.setTimeoutTimestamp(math.max(
                baseMillis + winMillis + 1L,
                state.getCurrentWatermarkMs() + 1L))
            }
            Iterator(Prog(key, times.reverse))
          }
      }
    // try_element_at: a chain matched through step i has times(i);
    // shorter chains yield null, not an ANSI index error
    val withTimes = (1 to n).foldLeft(progressed.toDF()) { (df, i) =>
      df.withColumn(s"t_$i",
        timestamp_micros(try_element_at(col("times"), lit(i))))
    }
    withTimes.select(
      col("key").as(keyCol) +:
        (1 to n).map(i => col(s"t_$i")) :+
        (col(s"t_$n").isNotNull &&
          try_element_at(col("times"), lit(n)) -
            try_element_at(col("times"), lit(1)) <= winMicros)
          .as("converted"): _*)
  }
}
