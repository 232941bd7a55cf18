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
  */
object StreamingFunnel {

  private[streaming] case class Ev(key: Long, tsMicros: Long, step: Int)
  private[streaming] case class Prog(key: Long, times: Seq[Long])

  /** Per-key funnel progress snapshots (Update mode): one row per key
    * per microbatch it receives events in — (keyCol, t_1 … t_N,
    * converted). Keys that never matched step 1 emit all-null times. */
  def funnelProgress(stream: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      withinSeconds: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val spark = stream.sparkSession
    import spark.implicits._
    val n = steps.size
    val winMicros = withinSeconds * 1000000L
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    val evs = stream.select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol).cast("timestamp")).as("tsMicros"),
        stepIdx.as("step"))
      .where(col("step") >= 0).as[Ev]
    val progressed = evs.groupByKey(_.key)
      .flatMapGroupsWithState[List[Long], Prog](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          // head = latest matched step's micros (list built backwards)
          var times = state.getOption.getOrElse(Nil)
          it.toSeq.sortBy(_.tsMicros).foreach { e =>
            val progress = times.length
            if (progress < n && e.step == progress &&
                times.forall(e.tsMicros > _))
              times = e.tsMicros :: times
          }
          state.update(times)
          Iterator(Prog(key, times.reverse))
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
