package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-funnel with single-pass drop attribution — the quality-gate
  * shape of a training-data pipeline ("ingested 10B docs → length gate
  * 9.1B → language gate 7.8B → quality gate 6.2B").
  *
  * The naive funnel counts survivors after each stage: N filters → N
  * actions → N scans of progressively smaller data. At 100 TB that is
  * N full passes over the corpus for what is really ONE question per
  * row: "which stage drops this doc first?". [[labeled]] answers it in
  * one narrow, codegen-friendly pass (a single when-chain over the
  * scan, no shuffle), and [[report]] reduces the labels to the funnel
  * table with one tiny aggregation — corpus-size-independent state
  * (one counter per stage).
  *
  * Stages are boolean predicate Columns, evaluated in order; a row's
  * label is its FIRST failing stage (matching what sequential filters
  * would have dropped it at). A NULL predicate counts as a failure —
  * a gate that cannot evaluate a row must not silently pass it.
  *
  * Set-level stages (dedup, decontamination) are not row predicates
  * and compose AROUND the funnel: run them between funnel segments and
  * difference the counts, exactly as a production pipeline reports
  * them ([[Dedup.exact]], [[Dedup.contamination]]).
  */
object Funnel {

  private val Kept = "kept"

  private def checkStages(stages: Seq[(String, Column)]): Unit = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be unique")
    require(!stages.exists(_._1 == Kept), s"'$Kept' is a reserved label")
  }

  /** Input rows + `dropped_at`: the first failing stage's name, or
    * "kept". One narrow pass, no shuffle. */
  def labeled(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    checkStages(stages)
    val label = stages.foldRight(lit(Kept): Column) {
      case ((name, pred), rest) =>
        when(!coalesce(pred, lit(false)), lit(name)).otherwise(rest)
    }
    df.withColumn("dropped_at", label)
  }

  /** Rows passing EVERY stage — the surviving corpus. Equivalent to
    * chaining `.where` per stage; kept as the funnel's companion so
    * callers label and filter with the same stage list. */
  def keep(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    labeled(df, stages).where(col("dropped_at") === Kept).drop("dropped_at")

  /** The funnel table: `(stage_idx, stage, dropped, remaining)` with a
    * leading `(0, "ingest", 0, total)` row — remaining after stage i =
    * total − cumulative drops through i.
    *
    * ONE pass over the corpus, total included: the labeling
    * aggregation already counts every row (the survivors under the
    * "kept" label), so total = Σ n of its ≤ |stages|+1 groups — a
    * separate `df.count()` would scan the corpus a second time for a
    * number the first scan has. The grouped result is bounded driver
    * metadata; the cumulative arithmetic runs over it on the driver
    * and the report materializes as a local relation. */
  def report(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    checkStages(stages)
    val spark = df.sparkSession
    import spark.implicits._
    val counts = labeled(df, stages)
      .groupBy(col("dropped_at")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val cumDrops = stages.map(n => counts.getOrElse(n._1, 0L))
      .scanLeft(0L)(_ + _)
    val rows = (0, "ingest", 0L, total) +:
      stages.map(_._1).zipWithIndex.map { case (name, i) =>
        (i + 1, name, counts.getOrElse(name, 0L), total - cumDrops(i + 1))
      }
    rows.toDF("stage_idx", "stage", "dropped", "remaining")
  }
}
