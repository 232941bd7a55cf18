package graft

import graft.ops.{Funnel, Joins, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, 10, "en"), // fails len
    (2L, 50, "de"), // passes len, fails lang
    (3L, 50, "en"), // passes all
    (4L, 5, "de"),  // fails len (attributed to len, not lang)
    (5L, 60, "en")  // passes all
  ).toDF("id", "n", "lang")

  private def stages = Seq(
    "len" -> (col("n") >= 20),
    "lang" -> (col("lang") === "en"))

  test("funnel labels each row with its FIRST failing stage") {
    val lab = Funnel.labeled(docs, stages)
      .select($"id", $"dropped_at").as[(Long, String)].collect().toMap
    assert(lab === Map(1L -> "len", 2L -> "lang", 3L -> "kept",
      4L -> "len", 5L -> "kept"))
  }

  test("funnel keep == chained where filters") {
    val kept = Funnel.keep(docs, stages).select($"id")
      .as[Long].collect().toSet
    val chained = docs.where(col("n") >= 20).where(col("lang") === "en")
      .select($"id").as[Long].collect().toSet
    assert(kept === chained)
    assert(Funnel.keep(docs, stages).columns.toSeq === docs.columns.toSeq)
  }

  test("funnel report: ingest row, per-stage drops, cumulative remaining") {
    val rep = Funnel.report(docs, stages)
      .select($"stage_idx", $"stage", $"dropped", $"remaining")
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(rep === Seq((0, "ingest", 0L, 5L), (1, "len", 2L, 3L),
      (2, "lang", 1L, 2L)))
  }

  test("funnel report: stage names holding '.', '`', and spaces work " +
      "(names are labels, never re-parsed as column paths)") {
    val rep = Funnel.report(docs, Seq(
        "min.len `chars`" -> (col("n") >= 20),
        "lang = en" -> (col("lang") === "en")))
      .select($"stage_idx", $"stage", $"dropped", $"remaining")
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(rep === Seq((0, "ingest", 0L, 5L),
      (1, "min.len `chars`", 2L, 3L), (2, "lang = en", 1L, 2L)))
  }

  test("funnel report is SINGLE-PASS: each input row evaluated exactly " +
      "once (total derives from the label counts, not a second scan)") {
    val visits = spark.sparkContext.longAccumulator("funnel-visits")
    // nondeterministic so the optimizer cannot duplicate the call
    val seen = udf { (n: Int) => visits.add(1L); n }.asNondeterministic()
    val traced = docs.withColumn("n", seen(col("n")))
    val rep = Funnel.report(traced, stages)
      .select($"stage", $"remaining").as[(String, Long)].collect().toMap
    assert(rep("lang") === 2L)
    assert(visits.value === 5L,
      s"expected one visit per row, got ${visits.value} (second scan?)")
  }

  test("funnel report is LAZY: construction runs zero Spark jobs " +
      "(each bench/pipeline execution pays exactly one corpus pass)") {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rep = Funnel.report(docs, stages) // must not collect eagerly
      // fence: one deliberate job; if construction had run any, the
      // FIFO listener bus would count them before the fence's event
      spark.sparkContext.parallelize(1 to 1).count()
      val deadline = System.currentTimeMillis + 10000
      while (jobs.get() < 1 && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(jobs.get() === 1L,
        s"report construction ran ${jobs.get() - 1} jobs, want 0")
      assert(rep.count() === 3L) // |stages| + ingest — still computes
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("funnel: a stage dropping nothing still appears, with 0") {
    val rep = Funnel.report(docs,
        stages :+ ("never" -> lit(true)))
      .select($"stage", $"dropped", $"remaining")
      .as[(String, Long, Long)].collect()
      .map { case (s, d, r) => s -> (d, r) }.toMap
    assert(rep("never") === (0L, 2L))
  }

  test("funnel: NULL predicate drops the row (gates must not pass unknowns)") {
    val df = Seq((1L, Some(30)), (2L, None)).toDF("id", "n")
    val lab = Funnel.labeled(df, Seq("len" -> (col("n") >= 20)))
      .select($"id", $"dropped_at").as[(Long, String)].collect().toMap
    assert(lab === Map(1L -> "kept", 2L -> "len"))
  }

  test("funnel rejects duplicate or reserved stage names") {
    intercept[IllegalArgumentException] {
      Funnel.labeled(docs, Seq("a" -> lit(true), "a" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      Funnel.labeled(docs, Seq("kept" -> lit(true)))
    }
  }

  test("bloomSemiJoin == exact semi-join (false positives removed)") {
    val fact = (1L to 500L).map(i => (i, i % 7)).toDF("k", "grp")
    val keys = Seq(3L, 5L, 250L, 499L, 777L).toDF("key")
    val got = Joins.bloomSemiJoin(fact, Seq("k"), keys, Seq("key"),
        expectedKeys = 10)
      .select($"k").as[Long].collect().toSet
    assert(got === Set(3L, 5L, 250L, 499L))
  }

  test("bloom prefilter: no false negatives, prunes non-matching rows") {
    val keys = (1L to 100L).map(i => i * 1000L).toDF("key")
    val bloom = Joins.keyBloom(keys, Seq("key"), expectedKeys = 100, fpp = 0.01)
    val fact = (1L to 10000L).toDF("k")
    val passed = Joins.prefilter(fact, Seq("k"), bloom)
      .as[Long].collect().toSet
    // every true match survives the probe
    assert((1L to 10L).map(_ * 1000L).toSet.subsetOf(passed))
    // and the bloom actually prunes: ≲ matches + fpp·rest, generously 5×
    assert(passed.size < 10 + 500)
  }

  test("bloomSemiJoin: null fact keys never match") {
    val fact = Seq(Some(1L), None, Some(2L)).toDF("k")
    val keys = Seq(1L, 2L).toDF("key")
    val got = Joins.bloomSemiJoin(fact, Seq("k"), keys, Seq("key"),
        expectedKeys = 2)
      .select($"k").as[Option[Long]].collect().toSet
    assert(got === Set(Some(1L), Some(2L)))
  }

  test("bloom probe filters the fact side BELOW any exchange (scan-side)") {
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    // spark.range, not a LocalRelation: ConvertToLocalRelation would
    // fold the probe filter into the local data at optimize time and
    // leave nothing to assert on
    val fact = spark.range(1, 1001).toDF("k")
    val keys = Seq(1L, 5L, 900L).toDF("key")
    val out = graft.ops.Joins.bloomSemiJoin(fact, Seq("k"), keys, Seq("key"),
      expectedKeys = 3)
    out.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val next = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: next.flatMap(flatten)
    }
    val probes = flatten(out.queryExecution.executedPlan).collect {
      case f: FilterExec if f.condition.find(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])
        .isDefined => f
    }
    assert(probes.nonEmpty, "bloom probe filter missing from the plan")
    // nothing shuffles beneath the probe: it prunes AT the scan, so
    // rows failing the bloom never enter an exchange
    assert(probes.forall(f =>
      flatten(f).drop(1).collect { case e: Exchange => e }.isEmpty))
  }

  test("curriculumBins: contiguous positions, near-equal bins, score order") {
    val df = (0L until 10L).map(i => (i, (9 - i).toDouble)).toDF("id", "score")
    val out = Sampling.curriculumBins(df, "id", "score", nBins = 4)
      .select($"id", $"curriculum_pos", $"curriculum_bin")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    // lowest score (id=9) first
    assert(out.head._1 === 9L)
    assert(out.map(_._2).toSeq === (0L until 10L).toSeq)
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    assert(sizes.values.forall(s => s == 2 || s == 3))
    // bin is monotone in position
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }

  test("curriculumBins is layout-independent (repartition invariant)") {
    val df = (0L until 50L).map(i => (i, (i % 5).toDouble)).toDF("id", "score")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.curriculumBins(d, "id", "score", nBins = 3)
        .select($"id", $"curriculum_pos", $"curriculum_bin")
        .as[(Long, Long, Long)].collect().toSet
    assert(run(df) === run(df.repartition(7)))
  }
}
