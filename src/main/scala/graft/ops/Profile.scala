package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, NumericType}

/** Corpus profiling — the dataset-card / ANALYZE-TABLE analogue, in ONE
  * scan.
  *
  * Ingesting a new 100 TB drop starts with "what is in these columns":
  * row counts, null rates, cardinalities, ranges. Spark's `ANALYZE
  * TABLE` stores engine-private stats; this emits them as a DataFrame
  * any engine can recompute — cardinality via the [[Sketches]] KMV
  * estimator (bounded state, exact below k, engine-reproducible above
  * it), numeric ranges as doubles, string ranges as strings.
  *
  * Every statistic for every column folds into a SINGLE `agg` pass —
  * one scan of the corpus regardless of column count (the per-column
  * union below is over the one aggregated ROW, not the data). */
object Profile {

  /** Per-column profile of `cols`: (column, n_rows, n_nulls, ndv_est,
    * min_num, max_num, min_str, max_str) — the num/str range pair not
    * matching the column's type is null. `k` sizes the cardinality
    * sketch (exact below k, ±1/√k above). Composes the MERGEABLE form:
    * `finalize(sketch)` over one corpus equals sketch-per-shard →
    * [[mergeDatasetCards]] → finalize, bit-for-bit (KMV's union law +
    * algebraic counts/ranges), which is how 100 TB profiles actually
    * get built — per-drop cards rolled up without rescanning. */
  def datasetCard(df: DataFrame, cols: Seq[String],
      k: Int = 256): DataFrame =
    finalizeDatasetCard(datasetCardSketch(df, cols, k), k)

  /** The mergeable per-column card: (column, n_rows, n_nulls,
    * sk: array&lt;string&gt;, min_num, max_num, min_str, max_str) — raw
    * KMV sketch instead of the finalized estimate, every field
    * algebraic (sum / k-smallest-of-union / min / max), so cards from
    * disjoint shards combine into the whole-corpus card exactly. ONE
    * agg pass over the shard regardless of column count. */
  def datasetCardSketch(df: DataFrame, cols: Seq[String],
      k: Int = 256): DataFrame = {
    require(cols.nonEmpty)
    def isNum(c: String) = df.schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }
    // NDV hash input: floating-point columns are canonicalized through
    // DECIMAL(38,9) before the string cast — Spark and DuckDB format
    // raw doubles differently in scientific-notation ranges ('1.0E7'
    // vs '10000000.0'), but both render a fixed-scale decimal as plain
    // 9-decimal notation, so the k-th smallest md5 (hence ndv_est) is
    // engine-reproducible. Values differing only beyond 1e-9 collapse
    // — a documented property of the canonical encoding, not a bug.
    def hashInput(c: String) = df.schema(c).dataType match {
      case DoubleType | FloatType =>
        col(c).cast("decimal(38,9)").cast("string")
      case _ => col(c).cast("string")
    }
    val aggs = count(lit(1)).as("_total") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        Sketches.kmvAgg(k, md5(hashInput(c))).as(s"_sk_$c")) ++
        (if (isNum(c))
          Seq(round(min(col(c)).cast("double"), 4).as(s"_mn_$c"),
            round(max(col(c)).cast("double"), 4).as(s"_mx_$c"))
        else
          Seq(min(col(c).cast("string")).as(s"_mn_$c"),
            max(col(c).cast("string")).as(s"_mx_$c")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      row.select(lit(c).as("column"),
        col("_total").as("n_rows"),
        (col("_total") - col(s"_n_$c")).as("n_nulls"),
        col(s"_sk_$c").as("sk"),
        lit(k).as("k"), // self-describing: merges validate k agreement
        (if (isNum(c)) col(s"_mn_$c")
         else lit(null).cast("double")).as("min_num"),
        (if (isNum(c)) col(s"_mx_$c")
         else lit(null).cast("double")).as("max_num"),
        (if (isNum(c)) lit(null).cast("string")
         else col(s"_mn_$c")).as("min_str"),
        (if (isNum(c)) lit(null).cast("string")
         else col(s"_mx_$c")).as("max_str"))
    }.reduce(_ unionByName _)
  }

  /** Roll up [[datasetCardSketch]] rows from any number of shards into
    * one card per column — counts sum, ranges min/max, and the merged
    * sketch is the k smallest distinct hashes of the union (KMV's
    * merge law: equals the whole-corpus sketch exactly when shards are
    * disjoint). Input size is shards × columns rows — plan-time
    * metadata, never corpus-shaped. */
  def mergeDatasetCards(cards: DataFrame, k: Int = 256): DataFrame = {
    // cheap CALL-TIME contract checks (schema-only, no job): a card
    // frame must carry the self-describing k column — and note the
    // mixed-k guard below fires at ACTION time, per column group, so
    // an all-shards-empty input merges to an empty (not failing) card
    require(cards.columns.contains("k"),
      "mergeDatasetCards: input has no 'k' column — not a " +
        "datasetCardSketch frame")
    // sketches built with different k silently under- or over-estimate
    // when mixed — the card is self-describing, so refuse loudly. The
    // check rides the SAME aggregation pass as the merge (collect_set
    // of each column's k values + a raise_error guard on the sketch),
    // so an unpersisted corpus-derived input is computed once, not
    // twice (it used to run a separate distinct().collect() first).
    val merged = cards.groupBy(col("column"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"),
        slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
          1, k).as("sk"),
        min(col("min_num")).as("min_num"),
        max(col("max_num")).as("max_num"),
        min(col("min_str")).as("min_str"),
        max(col("max_str")).as("max_str"),
        sort_array(collect_set(col("k").cast("int"))).as("_ks"))
    merged.select(col("column"), col("n_rows"), col("n_nulls"),
        when(col("_ks") === array(lit(k)), col("sk"))
          .otherwise(raise_error(concat(
            lit(s"mergeDatasetCards: expected sketches with k=$k, " +
              "found k="),
            concat_ws(",", col("_ks").cast("array<string>")),
            lit(" — rebuild the mismatched shard cards (KMV sketches " +
              "only merge at equal k)")))).as("sk"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .withColumn("k", lit(k)) // merged cards re-merge (roll-up of roll-ups)
  }

  /** Finalize a (possibly merged) sketch card into [[datasetCard]]'s
    * output schema: the raw KMV array becomes the ndv estimate. */
  def finalizeDatasetCard(card: DataFrame, k: Int = 256): DataFrame =
    card.select(col("column"), col("n_rows"), col("n_nulls"),
      Sketches.kmvEstimateCol(col("sk"), k).as("ndv_est"),
      col("min_num"), col("max_num"), col("min_str"), col("max_str"))

  /** SNAPSHOT DIFF — the release-audit question "what changed between
    * corpus v1 and v2": per-id status `added` / `removed` / `changed` /
    * `unchanged`, where change is detected on a content hash of `cols`
    * (null-safe: NULL encodes as a reserved sentinel, so a value moving
    * between NULL and non-NULL reads as changed, and column order is
    * fixed by the caller's list). ONE full-outer hash join on the id —
    * both corpora shuffle exactly once, no collect, unbounded id count;
    * downstream aggregation to the 4-row audit summary is a
    * constant-size groupBy. The hash arithmetic (md5 over
    * sentinel-joined casts) is engine-portable, so any SQL engine
    * reproduces the statuses bit-for-bit.
    *
    * CONTRACT: ids must be unique within each version — a duplicated
    * id multiplies through the join exactly as in any keyed diff
    * (run [[graft.ops.Dedup.exact]] first if a version may carry
    * duplicates). */
  def datasetDiff(old: DataFrame, cur: DataFrame, idCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    def keyed(df: DataFrame, tag: String) =
      df.select(col(idCol).as(s"_id_$tag"),
        md5(concat_ws("\u0001",
          cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as(s"_h_$tag"))
    val o = keyed(old, "o")
    val c = keyed(cur, "c")
    // SHUFFLE_HASH, not the default sort-merge: both join inputs are
    // projected to fixed-width (id, 32-char md5) rows BEFORE the join,
    // so the per-partition hash build is small and spill-safe at any
    // corpus size, and skipping the two O(n log n) sorts is what keeps
    // the diff's growth ~linear (the measured 10× exponent sat at the
    // sort's super-linear margin under sort-merge)
    o.join(c.hint("SHUFFLE_HASH"), o("_id_o") === c("_id_c"), "full_outer")
      .select(coalesce(col("_id_c"), col("_id_o")).as(idCol),
        when(col("_id_o").isNull, "added")
          .when(col("_id_c").isNull, "removed")
          .when(col("_h_o") === col("_h_c"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** DISTRIBUTED equal-width histogram — the compute side of the
    * reference's PLANNED `plot` subcommand (argparse stub cli.py:46-51,
    * dispatch `pass` cli.py:109-110; the CLI `plot` verb renders these
    * ≤ `bins` rows as ASCII on the driver). One optional min/max agg
    * (when `lo`/`hi` are not given) + one groupBy on the bin id —
    * corpus-scale-safe by construction; nulls and out-of-range values
    * drop, empty bins emit with n = 0 so the chart has a stable x-axis.
    * All arithmetic is plain IEEE double multiply/divide/floor, so any
    * engine recomputes identical (bin, lo, hi, n) rows from the same
    * bounds. A constant column (hi == lo) degenerates to one bin.
    * Output: (bin, lo, hi, n) ordered by construction 0..bins-1. */
  def histogram(df: DataFrame, valueCol: String, bins: Int,
      lo: Option[Double] = None, hi: Option[Double] = None): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val spark = df.sparkSession
    val v = col(valueCol).cast(DoubleType)
    val (lo0, hi0) = (lo, hi) match {
      case (Some(a), Some(b)) => (a, b)
      case _ =>
        val r = df.agg(min(v), max(v)).head
        if (r.isNullAt(0)) (lo.getOrElse(0.0), hi.getOrElse(1.0))
        else (lo.getOrElse(r.getDouble(0)), hi.getOrElse(r.getDouble(1)))
    }
    require(hi0 >= lo0, s"histogram: hi ($hi0) < lo ($lo0)")
    val width = if (hi0 > lo0) (hi0 - lo0) / bins else 1.0
    val bin = least(lit(bins - 1),
      floor((v - lit(lo0)) / lit(width))).cast("int")
    val counts = df
      .where(v.isNotNull && v >= lo0 && v <= hi0)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
    spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo0) + col("bin") * lit(width)).as("lo"),
        (lit(lo0) + (col("bin") + 1) * lit(width)).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
