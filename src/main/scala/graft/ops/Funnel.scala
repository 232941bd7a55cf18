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
    * number the first scan has. The whole table is a LAZY plan: the
    * corpus pass is the one conditional aggregation, and the
    * cumulative arithmetic (per-stage sums, remaining) runs as plain
    * expressions over that single ≤|stages|+1-column row — no driver
    * collect, no eager job at construction, so callers pay nothing
    * until they execute and Catalyst sees the full pipeline. */
  def report(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    checkStages(stages)
    // One aggregated row: a conditional count per stage + the grand
    // total, all map-side-combined inside one whole-stage-codegen pass.
    val dropped = col("dropped_at")
    // per-stage agg columns alias by POSITION (_d_0, _d_1, …), never by
    // stage name: a name is a user string (may hold '.', '`', anything)
    // and re-referencing it via col() would parse it as a nested-field
    // path — the name only ever appears as a comparison VALUE and a
    // lit() output label
    val aggs = count(lit(1)).as("_total") +:
      stages.zipWithIndex.map { case ((name, _), i) =>
        count(when(dropped === name, 1)).as(s"_d_$i")
      }
    val one = labeled(df, stages).agg(aggs.head, aggs.tail: _*)
    // Explode the single row into the |stages|+1 funnel rows with a
    // constant inline table — still one job, corpus-size-independent.
    val rowStructs = struct(lit(0).as("stage_idx"), lit("ingest").as("stage"),
        lit(0L).as("dropped"), col("_total").as("remaining")) +:
      stages.map(_._1).zipWithIndex.map { case (name, i) =>
        val cum = (0 to i).map(j => col(s"_d_$j")).reduce(_ + _)
        struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
          col(s"_d_$i").as("dropped"),
          (col("_total") - cum).as("remaining"))
      }
    one.select(explode(array(rowStructs: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"),
        col("r.dropped"), col("r.remaining"))
  }
}
