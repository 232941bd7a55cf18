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
}
