package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation shapes.
  *
  * Hot keys are the 100 TB failure mode partial aggregation does NOT
  * cover: algebraic aggs (sum/count/min/max) combine map-side and are
  * naturally skew-proof, but aggregates whose per-key STATE grows with
  * the data (exact distinct counts, large collects) concentrate one
  * reducer per hot key. The structural fix is to spread that state over
  * a first-stage key extension — either the value itself (exact
  * distinct) or an explicit salt — then combine in a second stage. AQE's
  * skew-join splitting handles the JOIN side of the same problem;
  * these helpers handle the aggregation side.
  */
object Skew {

  /** Exact distinct count per key without a hot-key reducer: stage 1
    * dedups on (key, value) — the shuffle spreads by value hash, so a
    * hot key's values land on MANY reducers — stage 2 counts the
    * surviving rows per key (algebraic, skew-proof). Equivalent to
    * COUNT(DISTINCT value) GROUP BY key, which single-stage execution
    * would funnel through one reducer per key. */
  def distinctCount(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    df.select((keyCols :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))

  /** EXACT top-k heavy hitters with bounded aggregation state — the
    * hot-key diagnosis primitive (feed its output to [[salted]] or AQE
    * skew hints). A plain `GROUP BY key ORDER BY n DESC LIMIT k` keeps
    * every distinct key alive through the partial-aggregate hash tables
    * and the shuffle; at 100 TB with ~all-unique keys (tokens, URLs,
    * session ids) that is a distinct-cardinality shuffle to find 20
    * rows. Here each partition instead keeps a Misra-Gries summary of
    * `m` counters (amortized O(1) per row: every decrement round pays
    * for m arrivals), and only the ≤ m-per-partition CANDIDATE keys
    * enter the exact pass — a semi-join-pruned count + TakeOrdered.
    *
    * Exactness: a key absent from EVERY partition's summary has true
    * count ≤ n/(m+1) (its MG undercount per partition is at most
    * n_p/(m+1); sum over partitions). So candidates ⊇ every key with
    * count > n/(m+1), and the exact top-k is correct whenever the k-th
    * result's count clears that bar — `checkGuarantee = true` verifies
    * it at the cost of one count() and throws instead of returning a
    * silently-unverifiable ranking. Ties broken by key — fully
    * deterministic output: (key, n), n descending. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, m: Int = 4096,
      checkGuarantee: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(m >= k, s"m ($m) must be >= k ($k) — the summary must be " +
      "able to hold every answer row")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("_k"))
      .where(col("_k").isNotNull)
    val cands = keys.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { s =>
        counts.get(s) match {
          case Some(v) => counts(s) = v + 1
          case None if counts.size < m => counts(s) = 1L
          case None => // decrement-all round; drop exhausted counters
            counts.mapValuesInPlace((_, v) => v - 1)
            counts.filterInPlace((_, v) => v > 0)
        }
      }
      counts.keysIterator
    }.toDF("_k").distinct()
    val exact = df
      .join(cands, df(keyCol).cast("string") === cands("_k"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
    if (checkGuarantee) {
      val n = keys.count()
      val bar = n.toDouble / (m + 1)
      val rows = exact.collect()
      if (rows.length == k)
        require(rows.last.getAs[Long]("n") > bar,
          f"heavyHitters($keyCol, k=$k, m=$m): k-th count " +
            f"${rows.last.getAs[Long]("n")} does not clear the MG bar " +
            f"n/(m+1) = $bar%.1f — raise m to certify this ranking")
      else
        // underfull result is certified only when the candidates really
        // were ALL the keys (otherwise a ≤-bar key could belong in it)
        require(keys.distinct().count() == rows.length,
          s"heavyHitters($keyCol, k=$k, m=$m): fewer than k certified " +
            "rows but more distinct keys exist — raise m")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), exact.schema)
    } else exact
  }

  /** Explicitly salted two-stage aggregation for associative aggregates
    * whose intermediate state is too wide to funnel per-key (e.g. large
    * collect_set states bounded per salt, or as a belt-and-braces spread
    * under extreme row-count skew). The salt is a deterministic hash of
    * `saltBy` (NOT a random number — re-runs must reproduce), so stage 1
    * groups on (key, salt) across `salts` reducers and stage 2 combines
    * the partials. `partials` aggregates stage 1; `combine` merges
    * stage-1 columns in stage 2 — both supplied by the caller so the
    * pattern stays general. */
  def salted(df: DataFrame, keyCols: Seq[String], saltBy: String,
      salts: Int, partials: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltBy)), lit(salts)))
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(combine.head, combine.tail: _*)

  /** ROBUST OUTLIER FLAGGING via exact median/MAD — the
    * quality-distribution guard for ingest monitoring (value drift,
    * broken extractors): flag rows where |x − median| > cut · MAD,
    * MAD = median(|x − median|). Median/MAD resist the very outliers
    * they hunt, unlike mean/stddev; both are EXACT corpus elements from
    * [[exactQuantiles]] (rank ⌊(n−1)/2⌋ under (value, tiebreak) order),
    * so the flags are engine-reproducible — no approx quantiles, no
    * float accumulation. Two ranked passes + one broadcast threshold
    * filter. Degenerate corpora (MAD = 0, over half the values
    * identical) flag any deviation from the median.
    * Output: input columns + `abs_dev` + `is_outlier`. */
  def madOutliers(df: DataFrame, valueCol: String, tieCol: String,
      cut: Double = 3.0): DataFrame = {
    val med = exactQuantiles(df, valueCol, tieCol, Seq(0.5))
      .select(col(valueCol).as("_med"))
    val dev = df.crossJoin(broadcast(med)) // 1-row scalar
      .withColumn("abs_dev",
        abs(col(valueCol).cast("double") - col("_med").cast("double")))
    val mad = exactQuantiles(
      dev.select(col("abs_dev"), col(tieCol)), "abs_dev", tieCol,
      Seq(0.5)).select(col("abs_dev").as("_mad"))
    dev.crossJoin(broadcast(mad))
      .withColumn("is_outlier", col("abs_dev") > lit(cut) * col("_mad"))
      .drop("_med", "_mad")
  }

  /** EXACT QUANTILES without a global sort window: the value at rank
    * ⌊(n−1)·q⌋ for each requested q (the lower-nearest-rank/"disc"
    * definition — an actual corpus value, never an interpolation).
    * percentile_approx trades error for speed; threshold decisions that
    * feed FILTERS (quality cutoffs, length caps, curriculum edges) want
    * the exact value, and `ORDER BY v LIMIT 1 OFFSET k` at 100 TB is
    * the single-reducer shape this codebase bans. Ranks come from
    * Layout.contiguousIdsBy's two-pass range-partitioned sort over
    * (value, tiebreak) — one shuffle, per-partition-bounded sorts —
    * then a broadcast semi-join keeps the |qs| requested rows.
    * Output: (q, value), one row per requested quantile. */
  def exactQuantiles(df: DataFrame, valueCol: String, tieCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val spark = df.sparkSession
    val n = df.count()
    require(n > 0, "exactQuantiles over an empty frame")
    // the same double product the SQL oracle's floor((n-1) * CAST(q AS
    // DOUBLE)) evaluates — engines agree on knife-edge ranks
    val ranks = qs.map(q => q -> math.floor((n - 1) * q).toLong)
    val ranked = Layout.contiguousIdsBy(
      df.select(col(valueCol), col(tieCol)), Seq(valueCol, tieCol))
    val want = spark.createDataFrame(ranks).toDF("q", "_rk")
    ranked.join(broadcast(want), col("row_id") === col("_rk"))
      .select(col("q"), col(valueCol))
  }
}
