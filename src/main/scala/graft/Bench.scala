package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Emits ONE JSON line on stdout AND writes the same line to a file
  * (positional arg, or $SPARK_GRAFT_BENCH_OUT, default BENCH_LOCAL.json)
  * so the driver can parse it even when a launcher prefixes stdout. A
  * failing query is recorded per-name in "failed" and makes the whole run
  * exit non-zero — a regression that throws must never read as a fast
  * success.
  *
  * Each query runs `--reps N` times (default 3, or $SPARK_GRAFT_BENCH_REPS)
  * and reports the per-query MEDIAN: single runs on a shared box show
  * 2-5× spreads on unchanged code (BENCH_r05 vs BENCH_LOCAL at the same
  * commit), so per-query perf judgments need a location estimate that one
  * GC pause or page-cache miss can't move. "value" is the sum of medians;
  * "reps" records N so consumers know what they're reading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    var reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    var positional = List.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" =>
          require(i + 1 < args.length, "--reps needs a value")
          reps = args(i + 1).toInt; i += 2
        case p => positional :+= p; i += 1
      }
    }
    require(reps >= 1, s"--reps must be >= 1, got $reps")
    val outFile = positional.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse("BENCH_LOCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: first Spark action pays JVM/codegen/parquet-footer
    // startup that belongs to the session, not to whichever query happens
    // to run first. Standard throughput-benchmark practice; q01's number
    // is the operator's, not the JIT's.
    try graft.sources.Tpch.raw(spark, sfDir, "lineitem").limit(1).count()
    catch { case _: Throwable => () }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // a query that leaks a CacheManager entry must pay for it itself,
        // not squeeze every later query's execution memory; checkpoint
        // blocks are ContextCleaner-owned and the cleaner is GC-triggered —
        // on a large heap GC may not run for many queries, so nudge it, or
        // dead queries' blocks stack up in the block manager and force
        // evictions under later queries' shuffles
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      name -> median(times)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$reps,"failed":$fs,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get(outFile), line + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
