package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Triples

/** Persisted VALUE-ORDERED projection of cardinality-one numeric
  * attributes — the ORDER BY analogue of the attribute-pruned scan, and
  * the index that makes a sort+limit pull SUB-LINEAR (the reference
  * leaves sort efficiency as its own TODO, tripl.py:730-732; the
  * technique is the classic zone-map / small-materialized-aggregates
  * design: data range-bucketed on the value with a tiny per-bucket
  * (min, max, count) manifest that turns "top k" into "which buckets
  * can hold the top k").
  *
  * Layout: one parquet table partitioned by (attr, range-bucket) — the
  * bucket of a fact is the number of build-time value quantiles below
  * it, so directories hold disjoint-ish value ranges and a top-k probe
  * PARTITION-PRUNES to the few highest buckets at planning time —
  * plus a `<table>_manifest` sidecar of per-(attr, bucket)
  * (min, max, count) rows. Probe correctness needs NO disjointness:
  * from the manifest pick a threshold t with (provably) at least k
  * facts ≥ t — walk buckets by min descending, accumulate counts to k,
  * t = the last bucket's min; every one of those rows is ≥ t — then
  * scan exactly the buckets whose max reaches t. Any value in the true
  * top k is ≥ the k-th largest ≥ t, so it lives in a scanned bucket;
  * appended buckets may OVERLAP the build ranges (they are assigned by
  * the stale manifest cuts) and the argument never notices. Thresholds
  * compare on a double shadow of the value (monotone in the native
  * long/double, so pruning can only widen the scan); the final order
  * uses the NATIVE column, exact at full 64-bit precision.
  *
  * Scale shape at 100 TB: the manifest is O(attrs × buckets) rows (a
  * broadcast-sized driver read), the probe scans O(k + bucket width)
  * rows instead of every fact of the attribute, and the build is one
  * linear pass (quantile sketch + range shuffle) paid once and
  * append-maintained after ([[append]] never rewrites or re-reads the
  * existing data — same contract as the LSH/text/IVF index family).
  *
  * SNAPSHOT CONTRACT (same as [[TripleStore.source]]): the index must
  * cover the store's current facts for its attributes — build it from
  * the store you query, [[append]] every ingested batch (NEW
  * (entity, attr) facts only between compactions — see append's upsert
  * caveat and [[compact]]'s latest-txId reconciliation), and note that
  * every TripleStore write op returns a store with the index handle
  * DROPPED (a snapshot can't see the write). A store queries it only
  * through [[TripleStore.withValueIndex]]. */
object ValueIndex {
  /** Bump when the table layout changes incompatibly — probes fail fast
    * with a rebuild message instead of silently mis-reading (the lshv2
    * lesson: a format change with no stamp strands old persisted
    * tables). */
  private val Fmt = 2 // v2: data rows carry txId (compact reconciles upserts)

  /** Build the index for `attrs` (each must be declared cardinality-one
    * with a numeric value type — long or double). One pass computes
    * per-attr value quantiles (the bucket cuts), one range-partitioned
    * write lays the data out, and the manifest aggregates from the same
    * scan. */
  def build(store: TripleStore, table: String, path: String,
      attrs: Seq[String], nBuckets: Int = 64): Unit = {
    require(attrs.nonEmpty && nBuckets >= 2)
    val spark = store.spark
    attrs.foreach { a =>
      val s = store.schemaOf(a)
      require(s.cardOne && (s.vtype == Triples.VLong || s.vtype == Triples.VDbl),
        s"valueIndex attr $a must be cardinality-one numeric " +
          s"(got card-${if (s.cardOne) "one" else "many"} ${s.vtype})")
    }
    val base = store.scanFor(attrs)
      .select(col("a"), col("e"), col("vlong"), col("vdbl"),
        coalesce(col("vdbl"), col("vlong").cast("double")).as("vnum"),
        col("txId"))
      .where(col("vnum").isNotNull)
      .persist()
    try {
      val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
      val cuts: Map[String, Seq[Double]] = base.groupBy(col("a"))
        .agg(percentile_approx(col("vnum"),
          array(probs.map(lit): _*), lit(10000)).as("cuts"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
      val data = base.withColumn("bkt", bucketOf(cuts))
      data.repartition(col("a"), col("bkt"))
        .sortWithinPartitions(col("a"), col("bkt"), col("vnum"))
        .write.mode("overwrite").option("path", path)
        .partitionBy("a", "bkt").format("parquet").saveAsTable(table)
      manifestOf(data)
        .write.mode("overwrite").option("path", path + "_manifest")
        .format("parquet").saveAsTable(table + "_manifest")
    } finally base.unpersist()
  }

  /** Append a batch store's facts for the index's attributes: the batch
    * alone is scanned, bucketed by the EXISTING manifest's cuts (per
    * attr, the per-bucket min values — an appended row between two old
    * buckets' ranges lands in one of them; the probe's threshold
    * argument tolerates the overlap), and appended to both tables. The
    * existing corpus is never read or rewritten — which also means a
    * batch that RE-asserts a card-one attr for an already-indexed
    * entity leaves the stale row beside the new one: probes in that
    * window can rank the entity by the old value (and return it twice).
    * [[compact]] reconciles (latest txId per (a, e) wins, the store's
    * own resolution rule); until then append is exact only for batches
    * asserting NEW (entity, attr) facts — the append-only norm of a
    * training-corpus ingest. */
  def append(batch: TripleStore, table: String): Unit = {
    val spark = batch.spark
    val man = readManifest(spark, table)
    val cuts: Map[String, Seq[Double]] = man.groupBy(col("a"))
      .agg(sort_array(collect_list(col("minv"))).as("cuts"))
      .collect()
      // drop the lowest bucket's min: k cut points make k+1 buckets,
      // and values below every cut belong in bucket 0
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq.drop(1)).toMap
    require(cuts.nonEmpty, s"valueIndex $table has an empty manifest")
    val base = batch.scanFor(cuts.keys.toSeq)
      .select(col("a"), col("e"), col("vlong"), col("vdbl"),
        coalesce(col("vdbl"), col("vlong").cast("double")).as("vnum"),
        col("txId"))
      .where(col("vnum").isNotNull)
      .persist()
    try {
      val data = base.withColumn("bkt", bucketOf(cuts))
      data.select(col("e"), col("vlong"), col("vdbl"), col("vnum"),
          col("txId"), col("a"), col("bkt"))
        .write.mode("append").format("parquet").insertInto(table)
      manifestOf(data)
        .write.mode("append").format("parquet")
        .insertInto(table + "_manifest")
    } finally base.unpersist()
  }

  /** Register catalog entries for an EXISTING index layout: `table`
    * over the (a, bkt)-partitioned data at `path` (partition recovery
    * included — the probe's partition pruning needs the partitions in
    * the catalog) and `table_manifest` over the sidecar at
    * `path + "_manifest"`. The catalog is per-session; a persisted
    * index reopens in a new session through this, with no data read
    * beyond one schema inference. */
  def register(spark: SparkSession, table: String, path: String): Unit =
    registerAt(spark, table, path, path + "_manifest")

  private def registerAt(spark: SparkSession, table: String,
      dataPath: String, manPath: String): Unit = {
    // same-location fast path: REFRESH instead of drop + re-create +
    // partition recovery (MSCK re-lists every (a, bkt) directory — at
    // thousands of partitions that is a real metadata scan per call).
    // Locations compare as FS-qualified URIs, not java.io.File paths —
    // the index lives on hdfs:// or s3a:// in the deployment this
    // exists for, and File(uri) throws on any non-file scheme.
    val same = try {
      spark.catalog.tableExists(table) && {
        val m = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table))
        val conf = spark.sessionState.newHadoopConf()
        def qualified(p: org.apache.hadoop.fs.Path) =
          p.getFileSystem(conf).makeQualified(p).toUri
        m.storage.locationUri.exists(u =>
          qualified(new org.apache.hadoop.fs.Path(u)) ==
            qualified(new org.apache.hadoop.fs.Path(dataPath)))
      }
    } catch { case _: Exception => false }
    if (same) {
      spark.sql(s"REFRESH TABLE $table")
      spark.sql(s"REFRESH TABLE ${table}_manifest")
      return
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val schema = spark.read.parquet(dataPath).schema
    spark.sql(s"CREATE TABLE $table (${schema.toDDL}) USING PARQUET " +
      s"PARTITIONED BY (a, bkt) LOCATION '$dataPath'")
    spark.sql(s"MSCK REPAIR TABLE $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_manifest")
    val mSchema = spark.read.parquet(manPath).schema
    spark.sql(s"CREATE TABLE ${table}_manifest (${mSchema.toDDL}) " +
      s"USING PARQUET LOCATION '$manPath'")
  }

  /** Re-cut and rewrite the index into `newPath` — the MAINTENANCE
    * VALVE for the append path. [[append]] harvests its cut points from
    * the manifest (which already holds prior appends' rows), so cuts
    * trail the data: drifted batches open fresh edge buckets past the
    * build-time ids, every append adds one file and one manifest row
    * per touched bucket (the small-file fragmentation every
    * append-maintained layout accrues), and as harvested cuts shift,
    * bucket VALUE RANGES smear across ids. Probes stay EXACT throughout
    * (the threshold argument never needed bucket disjointness) but the
    * partition-pruned scan and the manifest read widen with the
    * fragmentation. Compaction recomputes the quantile cuts over the
    * CURRENT rows and rewrites both tables — back to nBuckets tight
    * buckets, one file and one manifest row each; O(index) work,
    * index-only (the store is never re-scanned) — then swaps the
    * catalog entries to the new location, restoring the old
    * registration if the swap fails (the [[graft.ops.Layout
    * .compactBucketed]] discipline). Returns the old (data, manifest)
    * locations for [[graft.ops.Layout.vacuum]] once readers drain. */
  def compact(spark: SparkSession, table: String, newPath: String,
      nBuckets: Int = 64): (String, String) = {
    readManifest(spark, table) // fmt check before any writes
    import org.apache.spark.sql.catalyst.TableIdentifier
    def loc(t: String) = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(t)).location.toString
    val oldData = loc(table); val oldMan = loc(table + "_manifest")
    // RECONCILE UPSERTS: append never reads the existing corpus, so a
    // batch that re-asserted a card-one attr for an already-indexed
    // entity left the stale row beside the new one (probes between that
    // append and this compact see both). Keep the latest txId per
    // (a, e) — map-side-combinable max_by, vnum tie-break for
    // determinism on equal-tx duplicates — exactly the store's own
    // latest-tx-wins resolution, applied to the index's rows.
    val latest = spark.table(table)
      .groupBy(col("a"), col("e"))
      .agg(max_by(
        struct(col("vlong"), col("vdbl"), col("vnum"), col("txId")),
        struct(col("txId"), col("vnum"))).as("_m"))
      .select(col("a"), col("e"), col("_m.vlong").as("vlong"),
        col("_m.vdbl").as("vdbl"), col("_m.vnum").as("vnum"),
        col("_m.txId").as("txId"))
    val base = latest.persist()
    try {
      val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
      val cuts: Map[String, Seq[Double]] = base.groupBy(col("a"))
        .agg(percentile_approx(col("vnum"),
          array(probs.map(lit): _*), lit(10000)).as("cuts"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
      val data = base.withColumn("bkt", bucketOf(cuts))
      val tmp = table + "_compacting"
      for (s <- Seq("", "_manifest"))
        spark.sql(s"DROP TABLE IF EXISTS $tmp$s")
      data.repartition(col("a"), col("bkt"))
        .sortWithinPartitions(col("a"), col("bkt"), col("vnum"))
        .write.mode("overwrite").option("path", newPath)
        .partitionBy("a", "bkt").format("parquet").saveAsTable(tmp)
      manifestOf(data)
        .write.mode("overwrite").option("path", newPath + "_manifest")
        .format("parquet").saveAsTable(tmp + "_manifest")
      // external tables: DROP removes catalog entries only, files stay
      for (s <- Seq("", "_manifest")) spark.sql(s"DROP TABLE $tmp$s")
      for (s <- Seq("", "_manifest")) spark.sql(s"DROP TABLE $table$s")
      try register(spark, table, newPath)
      catch { case e: Throwable =>
        // never lose the live entries: restore the old locations
        registerAt(spark, table, oldData, oldMan)
        throw e
      }
      (oldData, oldMan)
    } finally base.unpersist()
  }

  /** bucket = number of this attr's cut points strictly below the value
    * (0 .. |cuts|), as one literal-map lookup + bounded HOF — no shuffle,
    * no UDF. */
  private def bucketOf(cuts: Map[String, Seq[Double]]) = {
    val cutsMap = map_from_arrays(
      array(cuts.keys.toSeq.map(lit): _*),
      array(cuts.values.toSeq.map(cs => array(cs.map(lit): _*)): _*))
    size(filter(element_at(cutsMap, col("a")),
      c => col("vnum") > c)).cast("int")
  }

  private def manifestOf(data: DataFrame): DataFrame =
    data.groupBy(col("a"), col("bkt"))
      .agg(min(col("vnum")).as("minv"), max(col("vnum")).as("maxv"),
        count(lit(1)).as("cnt"))
      .select(col("minv"), col("maxv"), col("cnt"),
        lit(Fmt).as("fmt"), col("a"), col("bkt"))

  private def readManifest(spark: SparkSession, table: String): DataFrame = {
    val man = spark.table(table + "_manifest")
    require(man.columns.contains("fmt"),
      s"valueIndex $table predates format v$Fmt — rebuild it with " +
        "ValueIndex.build (old tables carry no version stamp)")
    man
  }

  /** The top-`k` eids by `attr` through the index (descending when
    * `desc`, else ascending), restricted to `ents` when given — or None
    * when the index can't answer (attr not indexed, or `ents` so
    * selective that even the full value range holds < k matches; the
    * caller falls back to the linear scan, which also owns the
    * missing-attr null-fill).
    *
    * `ents = None` means the caller PROVED the entity set is exactly
    * this attribute's fact universe (pullMany does when the match
    * pattern is the single clause `(attr, any)` — the index holds one
    * row per entity of a card-one attr, so the semi-join is an
    * identity). Then manifest counts are exact, the first threshold is
    * decisive, and the probe is FULLY LAZY — one partition-pruned
    * TakeOrdered job when the pull executes, no counting round-trips:
    * the whole query becomes sub-linear, not just the ranking half.
    * ASCENDING is served ONLY in this universe form: every universe
    * entity has the attr by definition, so SQL's nulls-first ranking of
    * missing-attr entities (see [[TripleStore.pullMany]]) is vacuous;
    * with a general `ents` the probe declines asc — a value index
    * fundamentally cannot enumerate absent facts.
    *
    * With `ents`, driver work is bounded: the aggregated manifest (≤
    * nBuckets rows per attr) is collected once; each widening round is
    * one partition-pruned count, and the target 4×s per round, so
    * rounds ≤ log₄ of the attr's fact count even against a hostile
    * `ents`. */
  private[graft] def topKEids(spark: SparkSession, table: String,
      attr: String, nativeCol: String, ents: Option[DataFrame],
      k: Int, desc: Boolean = true): Option[DataFrame] = {
    if (!desc && ents.isDefined) return None
    val buckets = readManifest(spark, table)
      .where(col("fmt") === Fmt && col("a") === attr)
      .groupBy(col("bkt"))
      .agg(min(col("minv")).as("minv"), max(col("maxv")).as("maxv"),
        sum(col("cnt")).as("cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    if (buckets.isEmpty) {
      // distinguish "attr not indexed" (decline → fallback owns it)
      // from "indexed under an old format" (fail LOUD — a silent
      // fallback would hide that a rebuild is required; the lshv2
      // lesson)
      val stale = readManifest(spark, table)
        .where(col("a") === attr && col("fmt") =!= Fmt)
        .limit(1).count() > 0
      require(!stale, s"valueIndex $table holds pre-v$Fmt rows for " +
        s"$attr — rebuild with ValueIndex.build (v$Fmt data rows " +
        "carry txId so compact can reconcile upserts)")
      return None
    }
    // ALL driver-side value comparisons use java.lang.Double.compare —
    // the total order with NaN LARGEST, which is exactly Spark SQL's
    // ordering AND predicate semantics for NaN. Scala's IEEE operators
    // would disagree (NaN >= t is false), silently pruning the bucket
    // holding a double attr's NaN facts out of a desc scan while the
    // fallback ranks them first.
    def cmp(a: Double, b: Double) = java.lang.Double.compare(a, b)
    // walk order: best-bucket-first. Desc walks by min DESC and cuts on
    // the min (every row of a walked bucket is >= cut); asc mirrors —
    // by max ASC, cutting on the max (every row is <= cut).
    val walk =
      if (desc) buckets.sortWith((x, y) => cmp(x._2, y._2) > 0)
      else buckets.sortWith((x, y) => cmp(x._3, y._3) < 0)
    val total = buckets.map(_._4).sum
    // "no threshold" sentinels are the order's minimum/maximum: -Inf for
    // desc, NaN (Spark's largest value) for asc — both make scanPast
    // keep every bucket and every row, NaN facts included
    val noCut = if (desc) Double.NegativeInfinity else Double.NaN
    // threshold t(target): walk buckets until their counts cover the
    // target — at least `target` rows sit on the kept side of t, so the
    // true top-target all do too
    def thresholdFor(target: Long): Double = {
      var acc = 0L
      var cut = noCut
      val it = walk.iterator
      while (acc < target && it.hasNext) {
        val b = it.next(); acc += b._4; cut = if (desc) b._2 else b._3
      }
      if (acc < target) noCut else cut
    }
    // the kept side of t, partition-pruned to buckets that can reach it
    def scanPast(t: Double): DataFrame = {
      val bkts =
        if (desc) buckets.filter(b => cmp(b._3, t) >= 0).map(_._1)
        else buckets.filter(b => cmp(b._2, t) <= 0).map(_._1)
      spark.table(table)
        .where(col("a") === attr && col("bkt").isInCollection(bkts) &&
          (if (desc) col("vnum") >= t else col("vnum") <= t))
    }
    def ordered(df: DataFrame): DataFrame =
      df.orderBy(if (desc) col(nativeCol).desc else col(nativeCol).asc)
        .limit(k).select(col("e"))
    ents match {
      case None =>
        // exact counts → one decisive threshold, no actions here (if
        // the whole universe holds < k facts, the un-thresholded scan
        // IS the full answer set and limit(k) is a no-op)
        Some(ordered(scanPast(thresholdFor(math.min(k.toLong, total)))))
      case Some(es) =>
        var target = k.toLong
        while (true) {
          val cand = scanPast(thresholdFor(target))
            .join(es, Seq("e"), "left_semi")
          if (cand.count() >= k) return Some(ordered(cand))
          if (target >= total) return None
          target = math.min(total, target * 4)
        }
        None // unreachable
    }
  }
}
