package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable bounded-memory sketches for corpus statistics.
  *
  * At 100 TB an exact `COUNT(DISTINCT col)` shuffles every distinct
  * value (Skew.distinctCount spreads the reducers but still moves the
  * full distinct set). When a ±1/√k estimate is enough — cardinality
  * dashboards, join-size planning, dedup-rate monitoring — a
  * k-minimum-values (KMV) sketch answers it with k hashes of state per
  * partition and a k-row result, and two sketches union by simply
  * re-taking the k smallest hashes, so per-shard / per-day sketches
  * roll up without touching the data again (Beyer et al., "On Synopses
  * for Distinct-Value Estimation Under Multiset Operations", SIGMOD'07).
  *
  * Everything is integer/md5 arithmetic on purpose: the estimate is a
  * pure function of the k-th smallest md5, so ANY engine (the DuckDB
  * oracle included) reproduces it bit-for-bit — same portability
  * contract as Sampling.deterministicRange.
  */
object Sketches {

  /** The KMV sketch of `value`: the `k` lexicographically smallest
    * DISTINCT md5 hashes. Per-partition state is a k-capped TreeSet
    * (bounded memory regardless of partition size — the honest
    * at-scale story), then one tiny global top-k over ≤ partitions × k
    * candidate rows. Output: single column `h` (hex string), ≤ k rows. */
  def kmvSketch(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, s"kmvSketch: k must be ≥ 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // md5(NULL) is NULL — skip it, matching KmvAggregator.reduce's
    // null contract (NULL is not a distinct value; TreeSet would NPE)
    val hashes = df.select(md5(value.cast("string")).as("h"))
      .where(col("h").isNotNull).as[String]
    val local = hashes.mapPartitions { it =>
      val set = new java.util.TreeSet[String]()
      it.foreach { h =>
        if (set.size < k) set.add(h)
        // evict the max ONLY if this hash actually inserted — a
        // duplicate must not shrink the sketch
        else if (h < set.last && set.add(h)) { set.pollLast(); () }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
        .asScala
    }.toDF("h")
    // ≤ partitions × k rows reach this point; dedup + final top-k is
    // a TakeOrderedAndProject over plan-time-bounded input
    local.distinct().orderBy(col("h")).limit(k)
  }

  /** Union of KMV sketches built with the same `k`: the k smallest
    * distinct hashes of the concatenation — the estimate of the UNION's
    * cardinality, computed without revisiting either input corpus. */
  def kmvMerge(k: Int, sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .distinct().orderBy(col("h")).limit(k)

  /** [[kmvSketch]] as a typed `Aggregator` — the custom-UDAF form of
    * the same sketch, so it drops into ANY `groupBy().agg()`, batch or
    * Structured Streaming (per-group running cardinality in complete/
    * update mode, where mapPartitions cannot reach). The buffer is the
    * sketch itself (≤ k sorted hashes — bounded state per group, the
    * streaming-viability requirement), reduce inserts capped, merge
    * re-takes the k smallest of the union — associative + commutative,
    * so partial aggregation (map-side combine) applies as with any
    * algebraic agg. Input is the PRE-HASHED md5 hex (hash in the plan,
    * codegen'd, so the JVM-side agg only compares strings). */
  class KmvAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Seq[String], Seq[String]] {
    require(k >= 2)
    def zero: Seq[String] = Vector.empty
    def reduce(b: Seq[String], h: String): Seq[String] = {
      if (h == null) return b // null input (md5 of NULL): not a value
      val i = b.indexWhere(_ >= h)
      if (i < 0) { if (b.size < k) b :+ h else b } // h beyond the max
      else if (b(i) == h) b // duplicate: sketch unchanged
      else ((b.take(i) :+ h) ++ b.drop(i)).take(k)
    }
    def merge(a: Seq[String], b: Seq[String]): Seq[String] =
      (a ++ b).distinct.sorted.take(k)
    def finish(r: Seq[String]): Seq[String] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Column-level KMV agg: `df.groupBy(g).agg(kmvAgg(k, md5(v)))` →
    * per-group sketch array. */
  def kmvAgg(k: Int, hashed: Column): Column =
    udaf(new KmvAggregator(k),
      org.apache.spark.sql.Encoders.STRING).apply(hashed)

  /** [[kmvEstimate]] as a pure Column over a sketch ARRAY (the shape
    * [[kmvAgg]] emits) — per-GROUP cardinality in one expression:
    * `groupBy(g).agg(kmvAgg(k, h).as("sk")).select(kmvEstimateCol($"sk", k))`.
    * Same arithmetic as the one-row form, so the same oracle SQL
    * reproduces it per group. */
  def kmvEstimateCol(sketch: Column, k: Int): Column = {
    val scale = 4503599627370496.0 // 16^13 = 2^52
    val kActual = size(sketch)
    val num = conv(substring(element_at(sketch, kActual), 1, 13), 16, 10)
      .cast("long")
    round(
      when(kActual < k, kActual.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(scale) /
          num.cast("double")), 4)
  }

  /** Distinct-count estimate from a [[kmvSketch]]: if the sketch holds
    * fewer than k hashes it IS the distinct set (estimate exact); else
    * DV ≈ (k−1)/u where u is the k-th smallest hash read as a fraction
    * of hash space. u's numerator takes the first 13 hex digits
    * (52 bits — exactly representable in the doubles BOTH engines
    * divide with). Output one row:
    * (k_actual, kth_num, est). */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    val scale = 4503599627370496.0 // 16^13 = 2^52
    sketch.agg(count("*").as("k_actual"), max("h").as("kth"))
      .select(
        col("k_actual").cast("long").as("k_actual"),
        conv(substring(col("kth"), 1, 13), 16, 10).cast("long")
          .as("kth_num"))
      .select(
        col("k_actual"), col("kth_num"),
        round(
          when(col("k_actual") < k, col("k_actual").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(scale) /
              col("kth_num").cast("double")), 4).as("est"))
  }
}
