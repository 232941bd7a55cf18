package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("bucketed co-located equi-join runs with no Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val left = (1L to 200L).map(i => (i, i * 10)).toDF("k", "a")
    val right = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "b")
    Layout.saveBucketed(left, "bkt_l", s"$dir/l", 4, Seq("k"))
    Layout.saveBucketed(right, "bkt_r", s"$dir/r", 4, Seq("k"))
    // force the sort-merge path so the assertion is about partitioning,
    // not about broadcast thresholds
    val joined = spark.table("bkt_l").hint("merge")
      .join(spark.table("bkt_r"), "k")
    assert(joined.count() === 200)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // and the values actually join correctly
    val row = joined.where($"k" === 7L).select($"a", $"b").head
    assert(row.getLong(0) === 70L && row.getString(1) === "v7")
  }
}
