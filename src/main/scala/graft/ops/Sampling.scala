package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data mixes.
  *
  * `sample(fraction)` on a Dataset is seed-dependent AND
  * partitioning-dependent — re-ingesting the corpus or changing partition
  * counts yields a different sample, which breaks train/val hygiene. The
  * content-hash predicate here is a pure function of each row's id:
  * reproducible across runs, engines (any SQL engine's md5 computes the
  * identical sample — DuckDB-verifiable), cluster layouts, and
  * re-ingests; and disjoint bucket ranges give DISJOINT splits
  * (train/val/test) with no global shuffle, no state, and no coordination
  * — the 100 TB-correct way to split a corpus.
  */
object Sampling {

  /** md5-derived bucket in [0, 256): the first two lowercase-hex chars of
    * md5(id) compared as a string (equivalent to the numeric comparison,
    * since both sides are fixed-width lowercase hex). */
  private def bucketHex(b: Int): String = f"$b%02x"

  /** Keep rows whose id hashes into buckets [lo, hi) of 256 — an exact,
    * portable (hi-lo)/256 sample. `deterministicSample(df, id, 0, 32)`
    * keeps ~1/8; `(0, 240)/(240, 248)/(248, 256)` is a disjoint
    * train/val/test split. */
  def deterministicRange(df: DataFrame, idCol: String,
      lo: Int, hi: Int): DataFrame = {
    require(0 <= lo && lo <= hi && hi <= 256, s"bad bucket range [$lo, $hi)")
    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    val cond =
      (if (lo == 0) lit(true) else h >= lit(bucketHex(lo))) &&
        (if (hi == 256) lit(true) else h < lit(bucketHex(hi)))
    df.where(cond)
  }

  /** Keep the first `buckets` of 256 hash buckets (~buckets/256 of rows). */
  def deterministicSample(df: DataFrame, idCol: String, buckets: Int): DataFrame =
    deterministicRange(df, idCol, 0, buckets)

  /** Weighted source mixing: each group samples at its OWN rate —
    * `rates` maps group value → buckets-of-256 kept (e.g. "web" → 64
    * keeps 1/4 of web, "books" → 256 keeps all books), groups absent
    * from the map keep `defaultBuckets`. The training-mix primitive:
    * up/down-weight sources deterministically, reproducibly (same
    * md5-bucket predicate as [[deterministicRange]] — any SQL engine
    * recomputes the identical mix), with no shuffle: one narrow filter
    * over the scan. */
  def weightedMix(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Int], defaultBuckets: Int = 256): DataFrame = {
    (rates.values ++ Seq(defaultBuckets)).foreach(b =>
      require(0 <= b && b <= 256, s"buckets must be in [0, 256], got $b"))
    // 256 ⇒ keep-all sentinel "zz" (> every 2-char hex; "100" would NOT
    // work — lexicographically "ff" > "100")
    def cutHex(b: Int): String = if (b >= 256) "zz" else bucketHex(b)
    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    val cut = rates.foldLeft(lit(cutHex(defaultBuckets)): Column) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(cutHex(b))).otherwise(acc)
    }
    df.where(h < cut)
  }

  /** Per-group quota (domain balancing): keep at most `quota` rows per
    * `groupCol`, chosen in md5(id) order — a deterministic pseudo-random
    * pick, NOT "first N by id" (which would bias toward old rows). The
    * training-mix operator that stops one huge domain from dominating
    * the corpus. One window over the group key (single shuffle); ties
    * impossible because id breaks them. */
  def perGroupQuota(df: DataFrame, groupCol: String, idCol: String,
      quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rq", row_number().over(w))
      .where(col("_rq") <= quota).drop("_rq")
  }

  /** EXACT-size deterministic sample: the n rows with the smallest
    * md5(id) — a uniform-ish pseudo-random pick that is a pure function
    * of ids (same n rows on any run, engine, or cluster layout, unlike
    * `df.sample` or `LIMIT n` without order). [[deterministicRange]]
    * gives an exact RATE; this gives an exact COUNT — what eval-set
    * construction ("exactly 10k held-out docs") needs. Lowered to
    * TakeOrdered (per-partition top-n + merge of n·#partitions rows —
    * no global sort materialization); ties impossible because id breaks
    * them. */
  def exactN(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 1)
    df.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(n)
  }

  /** [[exactN]] PER GROUP — "25 eval docs per language / per source",
    * the balanced-panel sampler: within every group exactly
    * min(n, |group|) rows survive, chosen by the same deterministic
    * md5 rank (layout- and engine-independent; the id tie-break makes
    * the rank total). One hash-partitioned window per group — no
    * global sort, no driver state, group count unbounded; a skewed
    * group sorts only its own partition slice. Output: input columns,
    * filtered. */
  def exactNPerGroup(df: DataFrame, idCol: String, groupCol: String,
      n: Int): DataFrame = {
    require(n >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n).drop("_rn")
  }

  /** Leakage-safe fold assignment: the fold is a function of the GROUP's
    * hash — every row of a group (all docs from one domain, all chunks of
    * one document, all works of one author) lands in the SAME fold.
    * Row-hash splits leak: near-duplicates inside a group straddle
    * train/test and inflate eval scores; hashing the group key makes the
    * folds group-disjoint by construction. `folds` maps fold name →
    * bucket width out of 256 (widths must sum to 256; achieved fractions
    * are approximate because whole groups are atomic — the coarser the
    * groups, the lumpier the split). Pure narrow map over the scan (one
    * md5 + a when-chain), no shuffle, reproducible by any SQL engine.
    * Output: input columns + `fold`. */
  def groupSplit(df: DataFrame, groupCol: String,
      folds: Seq[(String, Int)]): DataFrame = {
    require(folds.nonEmpty && folds.forall(_._2 >= 1),
      "every fold needs a positive width")
    require(folds.map(_._2).sum == 256, "fold widths must sum to 256")
    val h = substring(md5(col(groupCol).cast("string")), 1, 2)
    val his = folds.scanLeft(0) { case (acc, (_, wdt)) => acc + wdt }.tail
    val fold = folds.zip(his).init.foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        val cut = h < lit(bucketHex(hi))
        Some(acc.fold(when(cut, name))(_.when(cut, name)))
    }.fold(lit(folds.head._1))(_.otherwise(folds.last._1))
    df.withColumn("fold", fold)
  }

  /** Per-group TOKEN budget — how training mixes are actually specified
    * ("N tokens per domain", not N documents): keep each group's
    * documents, in the same unbiased md5(id) order as [[perGroupQuota]],
    * while the group's running token total BEFORE the doc is under
    * `budget` — the straddling doc stays whole (first-fit overflow by at
    * most one doc, packSequences' rule), and any non-empty group yields
    * at least one doc. One window per group key, parallel across groups
    * — never a global window; deterministic and SQL-reproducible like
    * every sampler here. Output: input columns + `n_tokens`. */
  def tokenBudget(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, budget: Long): DataFrame = {
    require(budget >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("n_tokens",
        graft.ops.TextOps.nTokens(col(textCol)).cast("long"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .where(col("_cum") - col("n_tokens") < budget)
      .drop("_cum")
  }

  /** Temperature-smoothed source mixing at α = 1/2 — the standard
    * multilingual/multi-domain rebalancing recipe (sample share ∝
    * count^α flattens the head, keeps the tail): per group, the keep
    * rate is √(c_min / c_g), so the SMALLEST group keeps everything and
    * a group 100× larger keeps ~1/10 — sampled sizes ∝ √c_g, the α = ½
    * mix. Rates quantize to md5 buckets-of-256 (floor, but never below
    * 1 bucket), then apply as the same deterministic hash cut as
    * [[weightedMix]]: reproducible across runs, engines, and layouts.
    *
    * α is fixed at 1/2 deliberately: √ is IEEE-correctly-rounded, so an
    * external SQL engine recomputes the identical bucket counts —
    * general `pow(c, α)` is libm territory where engines differ by ulps
    * and a boundary bucket flips. Scale shape: one count aggregation
    * (map-side combined) broadcast back over the scan; the filter
    * itself is a narrow map. Output: input columns (rows kept). */
  def temperatureMix(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_c"))
    val minC = counts.agg(min(col("_c"))).head.getLong(0)
    // buckets = floor(256·√(c_min/c)) clamped to [1, 256]; the hex-cut
    // comparison is the shared md5 predicate of weightedMix
    val buckets = counts.select(col(groupCol),
      least(lit(256), greatest(lit(1L),
        floor(lit(256.0) * sqrt(lit(minC.toDouble) / col("_c")))))
        .cast("int").as("_buckets"))
    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    val cut = when(col("_buckets") >= 256, lit("zz"))
      .otherwise(lpad(hex(col("_buckets")), 2, "0"))
    df.join(broadcast(buckets), Seq(groupCol))
      .where(h < lower(cut))
      .drop("_buckets")
  }

  /** Curriculum binning — order the corpus by a difficulty/quality
    * score and cut it into `nBins` contiguous phases (bin 0 = lowest
    * score first; negate the score column upstream for easiest-first
    * curricula). The schedule is a pure function of (score, id):
    * reproducible across runs and engines, ties broken by id so the
    * assignment never depends on physical layout.
    *
    * `NTILE(n) OVER (ORDER BY …)` computes this through ONE task (a
    * global window). Here the global rank comes from
    * [[Layout.contiguousIds]]'s two-pass range-partitioned sort — the
    * sort shuffle runs once, in parallel — and the bin is arithmetic
    * on the rank: `bin = pos * nBins / total` (integer division; bin
    * sizes differ by at most one, like NTILE's, cut at different
    * boundaries). One extra count() action sizes the division.
    *
    * Output: input columns + `curriculum_pos` (0-based global rank) +
    * `curriculum_bin` (0-based). */
  def curriculumBins(df: DataFrame, idCol: String, scoreCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val total = df.count()
    val key = struct(col(scoreCol), col(idCol))
    Layout.contiguousIds(df.withColumn("_currkey", key), "_currkey")
      .withColumnRenamed("row_id", "curriculum_pos")
      .withColumn("curriculum_bin",
        // `div` = exact integer division — pos * nBins stays a long
        // (no double rounding at 1e12-row ranks)
        if (total == 0L) lit(0L)
        else expr(s"curriculum_pos * $nBins div ${total}L"))
      .drop("_currkey")
  }

  /** DETERMINISTIC WEIGHTED Bernoulli sample: keep each row with
    * probability `weight / maxWeight`, decided by the row's own md5 —
    * token-proportional document sampling ("long docs count more") and
    * importance-weighted mixes, with the same (data, seed)-pure,
    * engine-reproducible contract as [[deterministicRange]]. The coin
    * is an exact INTEGER compare — hash₅₂(id) · maxWeight < w · 2⁵² —
    * no float thresholds, no libm, so any SQL engine reproduces the
    * kept set bit-for-bit. Weights must be positive integers with
    * w ≤ maxWeight (rows at maxWeight always survive). Narrow map over
    * the scan, no shuffle. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      maxWeight: Long, seed: Long = 42L): DataFrame = {
    require(maxWeight >= 1)
    val h = conv(substring(md5(concat_ws(":", lit(seed.toString),
      col(idCol).cast("string"))), 1, 13), 16, 10).cast("long")
    // 2^52 · maxWeight can overflow a long for maxWeight > 2048, so
    // compare in DECIMAL(38,0) — exact, engine-portable
    val dec = "decimal(38,0)"
    df.where(h.cast(dec) * lit(maxWeight).cast(dec) <
      col(weightCol).cast(dec) * lit(4503599627370496L).cast(dec))
  }

  /** STRATIFIED EXACT SPLIT — per-stratum train/val/test with EXACT
    * sizes: within every stratum (language, source, domain) exactly
    * ⌊n·fᵢ⌋ rows land in split i (the last named split absorbs the
    * remainder), unlike the hash-threshold samplers above whose
    * achieved fractions are binomial-approximate. Eval protocols and
    * contamination audits need the exact guarantee ("the zh val set is
    * precisely 7 docs"), and per-language balance at 100 TB means the
    * big stratum cannot funnel through one ranking task.
    *
    * Rank: each row's position in its stratum under the
    * [[shuffleDeterministic]] md5 key — unbiased, layout-independent,
    * engine-portable. The rank is computed WITHOUT a per-stratum
    * global window: rows bucket by their key's first two hex chars
    * (256 sub-ranges per stratum), per-(stratum, bucket) counts —
    * strata × 256 longs, plan-time metadata — prefix-sum into offsets
    * on the driver, and the window runs per (stratum, bucket), so the
    * largest sorted partition is ~n_stratum/256 regardless of skew
    * (same two-pass shape as Layout.contiguousIds, keyed per stratum).
    *
    * Split thresholds use the SAME double arithmetic the oracle's
    * `floor(n * CAST(f AS DOUBLE))` performs, so engines agree even
    * when n·f is knife-edge. Output: input columns + `split`.
    *
    * NULL strata are a stratum of their own (null-safe `<=>` join +
    * null-keyed entries), so the split stays disjoint-complete — no
    * silent row loss. TWO offset paths, identical results by
    * construction (same (stratum, bucket) offsets, same cumulative
    * ⌊n·f⌋ thresholds, same rank): up to `maxStrata` distinct strata
    * the offsets collect to a driver map and broadcast (strata × 256
    * longs — genuinely bounded metadata at the 4k default, ~1 M
    * entries); PAST the cap the offsets stay a DataFrame — per-stratum
    * running sums over the ≤256 bucket rows (a window whose partitions
    * never exceed 256 rows regardless of strata count) and a plain
    * shuffle join back on (stratum, bucket) — so url-host-grade
    * stratum columns run distributed instead of failing or flooding
    * the driver. The path choice costs ONE bounded eager job (a
    * collect of the counts frame capped at maxStrata·256+1 rows —
    * decisive because nGroups ≤ nStrata·256); on the small path that
    * same collect IS the offsets source, so no second action runs. */
  def stratifiedSplit(df: DataFrame, stratumCol: String, idCol: String,
      fracs: Seq[(String, Double)], seed: Long = 42L,
      maxStrata: Int = 4000): DataFrame = {
    require(fracs.size >= 2, "need at least two splits")
    require(fracs.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum ≤ 1")
    val spark = df.sparkSession
    val key = concat(
      md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))),
      lpad(col(idCol).cast("string"), 20, "0"))
    val keyed = df.withColumn("_sk", key)
      .withColumn("_bk", substring(col("_sk"), 1, 2))
      // stratum keys travel internally as the 128-bit md5 HEX of the
      // string form (null stays null, so the null stratum keeps its own
      // identity through the null-safe join); the offsets machinery
      // needs only key IDENTITY, and the gate's decisive collect below
      // is capped by ROWS, not bytes — with url-host-grade (or
      // pathological kilobyte) stratum values the raw strings could put
      // hundreds of driver-heap MB behind that cap, where the 32-char
      // digest pins it at ~35 B/row. md5 is exact identity at any
      // feasible strata count (the fingerprintBin argument); the output
      // keeps the original column untouched
      .withColumn("_stk", md5(col(stratumCol).cast("string")))
    // pass 1: per-(stratum, bucket) counts — the offset source for
    // either path AND the small/distributed gate, in ONE bounded
    // action. The gate is the DISTINCT-STRATA count (what the
    // docstring promises and what bounds both the broadcast size and
    // the driver loop below) — NOT the group count: 100k sparse strata
    // with one occupied bucket each stay under maxStrata·256 groups
    // while being 25× past the stratum cap. But since every stratum
    // occupies ≤256 buckets, nGroups ≤ nStrata·256 — so a collect
    // capped at maxStrata·256+1 rows is decisive: truncated ⇒
    // nStrata > maxStrata (distributed path), complete ⇒ the probe IS
    // the full counts collect, and the strata count is computed from
    // it driver-side. One eager job, no persist, no separate
    // countDistinct pass (a second gate action tripled q137's cost).
    val grouped = keyed.groupBy(col("_stk"), col("_bk")).count()
    locally {
      val groupCap = maxStrata * 256 + 1
      val probe = grouped.limit(groupCap).collect()
      val nStrata =
        if (probe.length >= groupCap) maxStrata.toLong + 1L
        else probe.iterator.map(r => Option(r.getString(0))).toSet.size.toLong
      val small = nStrata <= maxStrata.toLong
      val cumFracs = fracs.init.map(_._2)
      val offDf: DataFrame = if (small) {
        val counts = probe
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        // ONE grouping pass over the collected rows — a per-stratum
        // `counts.keys.filter` walk is O(strata · groups), quadratic
        // in strata, and single-threaded on the driver (measured: the
        // 70k-strata events corpus spent an hour here)
        val byStratum: Map[String, Seq[(String, Long)]] =
          counts.toSeq.map { case ((st, b), c) => st -> (b, c) }
            .groupBy(_._1)
            .map { case (st, xs) => st -> xs.map(_._2).sortBy(_._1) }
        val offsets: Map[(String, String), Long] = byStratum.flatMap {
          case (st, buckets) =>
            buckets.map(_._1)
              .zip(buckets.scanLeft(0L)((acc, bc) => acc + bc._2)
                .init)
              .map { case (b, off) => (st, b) -> off }
        }.toMap
        val nPerStratum: Map[String, Long] =
          byStratum.map { case (st, bs) => st -> bs.map(_._2).sum }
        // cumulative ⌊n·f⌋ thresholds per stratum; last split = rest
        val thresholds: Map[String, Seq[Long]] = nPerStratum.map {
          case (st, n) =>
            st -> cumFracs
              .scanLeft(0L)((acc, f) => acc + math.floor(n * f).toLong).tail
        }
        broadcast(spark.createDataFrame(offsets.toSeq.map {
          case ((st, b), off) =>
            (st, b, off, thresholds(st) :+ Long.MaxValue)
        }).toDF("_st", "_bk", "_off", "_cuts"))
      } else {
        // distributed offsets: running sum over a window whose
        // partitions are ≤256 rows (the buckets of ONE stratum) — safe
        // at any strata cardinality; thresholds are the same
        // double-multiply-floor the driver path computes, so the two
        // paths agree bit-for-bit
        val wS = Window.partitionBy(col("_stk")).orderBy(col("_bk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("_stk"))
        val cumCols = cumFracs
          .scanLeft(lit(0L): Column)((acc, f) =>
            acc + floor(col("_n") * f).cast("long")).tail
        grouped
          .withColumn("_off", sum(col("count")).over(wS) - col("count"))
          .withColumn("_n", sum(col("count")).over(wAll))
          .select(col("_stk").as("_st"), col("_bk"), col("_off"),
            array((cumCols :+ lit(Long.MaxValue)): _*).as("_cuts"))
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_stk"), col("_bk")).orderBy(col("_sk"))
      // null-safe stratum equality: a NULL stratum is a stratum, not a
      // dropped row — `===` would silently lose every null-keyed row
      val ranked = keyed
        .join(offDf,
          keyed("_stk") <=> offDf("_st") && keyed("_bk") === offDf("_bk"))
        .drop("_st").drop(offDf("_bk"))
        .withColumn("_rk", col("_off") + row_number().over(w) - 1)
      val names = fracs.map(_._1)
      val split = names.zipWithIndex.init.foldLeft(Option.empty[Column]) {
        case (acc, (name, i)) =>
          val cut = col("_rk") < element_at(col("_cuts"), i + 1)
          Some(acc.fold(when(cut, name))(_.when(cut, name)))
      }.fold(lit(names.head): Column)(_.otherwise(names.last))
      ranked.withColumn("split", split)
        .drop("_sk", "_bk", "_stk", "_off", "_cuts", "_rk")
    }
  }

  /** DETERMINISTIC GLOBAL SHUFFLE — the training-order primitive: a
    * reproducible permutation of the corpus with a contiguous position
    * column, so epoch order is a pure function of (data, seed) — stable
    * across re-ingests, partition layouts, and engines (any SQL engine's
    * md5 reproduces the identical order), the same portability contract
    * as [[deterministicRange]]. `orderBy(rand(seed))` gives none of
    * that, and `row_number() OVER (ORDER BY …)` funnels the corpus
    * through one task.
    *
    * Sort key: md5 of "seed:id" with the zero-padded id appended —
    * strictly unique whenever ids are (the hex prefix alone already
    * collides only at ~2⁻⁶⁴ per pair), satisfying
    * Layout.contiguousIds's unique-orderCol contract. The position
    * comes from contiguousIds' two-pass range-partitioned rank: the
    * sort shuffle runs once and no global window exists anywhere.
    * Negative ids would break the zero-pad tie-break's ordering; ids
    * are required non-negative (train corpora number docs, they don't
    * sign them).
    *
    * Output: input columns + `shuffle_pos` (long, 0-based, contiguous). */
  def shuffleDeterministic(df: DataFrame, idCol: String,
      seed: Long = 42L): DataFrame = {
    val key = concat(
      md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))),
      lpad(col(idCol).cast("string"), 20, "0"))
    Layout.contiguousIds(df.withColumn("_shufkey", key), "_shufkey")
      .withColumnRenamed("row_id", "shuffle_pos")
      .drop("_shufkey")
  }
}
