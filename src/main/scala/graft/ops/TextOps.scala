package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, fingerprinting.
  *
  * All operators are built from codegen'd `sql.functions` (no UDFs) so
  * they stay inside whole-stage codegen and scale linearly with input
  * splits — at 100 TB these run as narrow map stages over the document
  * scan, no shuffle at all.
  *
  * Determinism contract: every derived value is reproducible in ANSI SQL
  * (see SparkEntry.oracleSql) — important both for the correctness gate
  * and for re-runnable pipelines.
  */
object TextOps {

  /** Whitespace tokens (single-space split, empties preserved — matches
    * SQL string_split semantics exactly). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def nTokens(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation marks counted
    * separately (a cheap, deterministic proxy for tokenizer load). */
  def nSubtokens(text: Column): Column =
    nTokens(text) + length(regexp_replace(text, "[^.,;:!?]", ""))

  /** Distinct-token count (vocabulary size of the doc). */
  def nDistinctTokens(text: Column): Column = size(array_distinct(tokens(text)))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast(DoubleType) /
      length(text).cast(DoubleType)

  /** Mean token length. */
  def avgTokenLen(text: Column): Column =
    (length(text) - nTokens(text) + lit(1)).cast(DoubleType) /
      nTokens(text).cast(DoubleType)

  /** Stopword ratio against a fixed list (quality signal: natural prose
    * has ~0.3-0.5; keyword-stuffed or boilerplate text scores low). */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  def stopwordCount(text: Column, stopwords: Seq[String] = EnStopwords): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast(DoubleType) / nTokens(text).cast(DoubleType)

  /** ALL word n-grams over a PRE-TOKENIZED array column, duplicates
    * preserved (unlike `Dedup.shingles`, which is a set) — frequency
    * analysis needs the multiset. Take an already-materialized token
    * array: a raw split expression inside the transform lambda would
    * re-tokenize once PER ELEMENT (higher-order lambda bodies get no CSE
    * across iterations). Docs shorter than n words yield an empty
    * array. */
  def ngramsOfTokens(words: Column, n: Int): Column = {
    val cnt = size(words)
    when(cnt < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), cnt - lit(n)),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(words, i + lit(j + 1))): _*)))
  }


  /** Gopher-style repetition/boilerplate scores per document:
    *  - `n_words` — token count;
    *  - `dup_word_frac` — fraction of tokens that repeat an earlier one
    *    (1 − distinct/total): high values mean keyword stuffing or
    *    TEMPLATE boilerplate;
    *  - `top_bigram_frac` — fraction of the doc's word bigrams occupied
    *    by its single most frequent bigram: high values mean repeated
    *    phrases/navigation chrome (the "fraction of characters in most
    *    common n-gram" family from the Gopher quality filters, counted
    *    over n-grams).
    *
    * Shape: a FULLY NARROW map — the top-bigram multiplicity is the
    * longest equal run of the doc's SORTED bigram array (one codegen'd
    * pass, graft.functions.MaxRunLength), a pure per-row function that
    * needs no explode, no shuffle, no re-join. No driver loops, no UDFs;
    * every value reproducible in ANSI SQL. */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // tokenize ONCE into a projected column; the multi-referenced alias
    // keeps CollapseProject from inlining the split back into the lambda
    df.select(col(idCol), tokens(col(textCol)).as("_ws"))
      .select(col(idCol),
        size(col("_ws")).as("n_words"),
        size(array_distinct(col("_ws"))).as("_nd"),
        graft.functions.VectorFunctions.maxRunLength(
          sort_array(ngramsOfTokens(col("_ws"), 2))).as("_topc"))
      .select(col(idCol), col("n_words").cast(LongType).as("n_words"),
        round(lit(1.0) - col("_nd").cast(DoubleType) /
          col("n_words").cast(DoubleType), 4).as("dup_word_frac"),
        // a 1-word doc has no bigrams: _topc = 0 and n_words − 1 = 0, so
        // the 0/0 division is null → coalesce 0, exactly the left-join
        // null of the aggregate formulation this replaces
        round(coalesce(when(col("_topc") > 0, col("_topc").cast(DoubleType))
            / (col("n_words") - lit(1)).cast(DoubleType), lit(0.0)), 4)
          .as("top_bigram_frac"))
  }

  /** PII patterns, kept to syntax valid in BOTH Java regex and RE2 (no
    * backrefs/lookaround) so redaction decisions are reproducible in
    * ANSI-SQL engines — the determinism contract of this module. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII scrubbing — the redaction pass a training-data pipeline runs
    * before anything else sees the text: emails/phones/IPv4s replaced by
    * type tags, with per-doc match counts kept as audit columns. A narrow
    * codegen'd map (regexp_count + regexp_replace), no shuffle; order
    * matters (emails first, or the IP pattern would eat dotted hosts
    * inside addresses already redacted). */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"),
      regexp_count(col(textCol), lit(Ipv4Re)).as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>").as("redacted"))

  /** Corpus-wide top-k terms (vocabulary head): one explode + one
    * count-groupBy + TakeOrdered (count desc, term asc — deterministic
    * ties). The shuffle carries (term, partial count) pairs only —
    * map-side combine makes this linear in distinct terms, not tokens. */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)

  /** Rare-term statistics per document — the integer-robust cousin of
    * perplexity filtering: a term is "rare" when its share of the corpus
    * token mass is ≤ `maxShare` (relative, so the same threshold means
    * the same thing at any corpus scale), and each document reports how
    * many of its tokens are rare and the rare fraction. High rare_frac
    * flags OOV-heavy / garbled / niche documents exactly where an LM
    * perplexity filter would, without float log-sums that no SQL oracle
    * can reproduce bit-for-bit.
    *
    * Shape: one explode + term-count groupBy (map-side combined), the
    * corpus total as a scalar subquery-style 1-row cross join, a
    * term-keyed semi-join of doc tokens against the rare vocabulary
    * (NOT broadcast by construction: under Zipf the rare tail IS most of
    * the vocabulary — AQE may still choose broadcast when it fits), and
    * a doc-keyed count. */
  def rareTermStats(df: DataFrame, idCol: String, textCol: String,
      maxShare: Double): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val freq = toks.groupBy(col("term")).agg(count(lit(1)).as("_f"))
    // total token mass from the (tiny) aggregated table — NOT another
    // full corpus tokenize+scan
    val total = freq.agg(sum(col("_f")).as("_tot"))
    val rare = freq.crossJoin(total)
      .where(col("_f").cast(DoubleType) <=
        lit(maxShare) * col("_tot").cast(DoubleType))
      .select(col("term"))
    val counts = toks.join(rare, Seq("term"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("_nr"))
    df.select(col(idCol), nTokens(col(textCol)).cast(LongType).as("n_tokens"))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("_nr"), lit(0L)).as("n_rare"),
        round(coalesce(col("_nr"), lit(0L)).cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 4).as("rare_frac"))
  }

  /** Context-window chunking: split each document's token stream into
    * windows of `size` tokens advancing by `stride` (overlap =
    * size − stride) — how a corpus becomes fixed-length training
    * sequences. Pure narrow plan: one transform over a token-index
    * sequence + posexplode, no shuffle, no UDF; chunk count =
    * 1 + ⌈max(n − size, 0) / stride⌉ so every token is covered and short
    * docs yield exactly one chunk. Output: idCol, chunk_idx, chunk. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "need 1 <= stride <= chunkSize")
    // tokenize ONCE per row in its own projection — a raw split inside
    // the transform lambda would re-tokenize once per CHUNK, turning the
    // narrow map quadratic on long documents
    val toks = df.select(col(idCol), tokens(col(textCol)).as("_ws"))
    val n = size(col("_ws"))
    val nch = (ceil(greatest(n - lit(chunkSize), lit(0))
      .cast(DoubleType) / lit(stride.toDouble)) + lit(1)).cast(IntegerType)
    val chunks = transform(sequence(lit(0), nch - lit(1)),
      i => concat_ws(" ",
        slice(col("_ws"), i * lit(stride) + lit(1), lit(chunkSize))))
    toks.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx").cast(LongType).as("chunk_idx"),
        col("chunk"))
  }

  /** Sequential sequence packing: assign documents (in deterministic
    * `idCol` order) to training bins of `capacity` tokens — bin =
    * ⌊tokens-before-this-doc / capacity⌋, so a doc straddling a boundary
    * stays whole in the earlier bin (bins may overflow by one doc; the
    * shuffle-free approximation of first-fit packing, and exactly what a
    * sequential corpus writer produces).
    *
    * The global cumulative sum is computed WITHOUT a global window
    * (`sum() OVER (ORDER BY …)` with empty PARTITION BY funnels the whole
    * corpus through ONE task — the single-reducer shape this codebase
    * bans). Same two-pass idiom as [[graft.ops.Layout.contiguousIds]]:
    * range-partition by `idCol`, per-partition token TOTALS to the driver
    * (one Long per partition — plan-time metadata), broadcast the prefix
    * offsets back, assign bins in a per-partition map that reuses the
    * sort's shuffle files (`.rdd` is a lazy val on the Dataset, so the
    * sort runs once). `idCol` values must be unique for a deterministic
    * order. The `partitionCol` overload below remains the sharded-writer
    * form (per-shard bin numbering). Output: idCol, n_tokens, bin. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 1)
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol), nTokens(col(textCol)).cast(LongType).as("n_tokens"))
      .repartitionByRange(n, col(idCol))
      .sortWithinPartitions(col(idCol))
    val sums = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      while (it.hasNext) { val r = it.next(); if (!r.isNullAt(1)) s += r.getLong(1) }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add("bin", LongType)
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bc.value(i)
      it.map { r =>
        // null token count (null text) gets a null bin and does not
        // advance the cursor — matching SQL window-sum null semantics
        if (r.isNullAt(1)) Row.fromSeq(r.toSeq :+ null)
        else {
          val bin = cum / capacity // tokens-before ⇒ nonneg ⇒ floor division
          cum += r.getLong(1)
          Row.fromSeq(r.toSeq :+ bin)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Partitioned sequence packing — the 100 TB form: documents pack into
    * bins WITHIN each `partitionCol` shard (window partitioned by shard,
    * ordered by `idCol`), so the cumulative sum parallelizes across
    * shards instead of funnelling the whole corpus through one task the
    * way the global overload does. Bin ids are per-shard (the output
    * carries `partitionCol`, so (shard, bin) is the global bin key) —
    * exactly what a sharded corpus writer produces: each shard writes its
    * own files with its own local sequence numbering.
    * Output: idCol, partitionCol, n_tokens, bin. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int, partitionCol: String): DataFrame = {
    require(capacity >= 1)
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(partitionCol),
        nTokens(col(textCol)).cast(LongType).as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(partitionCol), col("n_tokens"),
        floor((col("_cum") - col("n_tokens")).cast(DoubleType) /
          lit(capacity.toDouble)).cast(LongType).as("bin"))
  }

  /** C4/RefinedWeb-style LINE-level boilerplate removal: a line that
    * appears verbatim in at least `maxDocFrac` of all documents is
    * chrome (cookie banners, "subscribe" footers, navigation), and is
    * dropped from EVERY document; remaining lines reassemble in their
    * original order. This is within-doc content removal driven by
    * corpus-wide statistics — the step between whole-doc dedup
    * (Dedup.exact) and token-level quality scores.
    *
    * Shape: one posexplode on lines; line-keyed doc-frequency groupBy
    * (map-side combined — the shuffle carries one (line, partial count)
    * per distinct line per partition); doc count as a 1-row cross join
    * (plan-time scalar, same idiom as rareTermStats); a left-anti join
    * of lines against the frequent set (NOT broadcast by assumption —
    * the frequent set is tiny by construction, AQE will broadcast it);
    * one doc-keyed groupBy to rebuild. No driver actions, every value
    * ANSI-SQL reproducible. Docs whose every line was boilerplate come
    * back as empty text, never dropped rows.
    * Output: idCol, text (cleaned), n_dropped. */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      maxDocFrac: Double): DataFrame = {
    require(maxDocFrac > 0.0 && maxDocFrac <= 1.0)
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("_ln", "_line")))
    val total = df.agg(count(lit(1)).as("_ndocs"))
    val frequent = lines.groupBy(col("_line"))
      .agg(count_distinct(col(idCol)).as("_df"))
      .crossJoin(total)
      .where(col("_df").cast(DoubleType) >=
        lit(maxDocFrac) * col("_ndocs").cast(DoubleType))
      .select(col("_line"))
    val rebuilt = lines.join(frequent, Seq("_line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("_ln"), col("_line")))),
            x => x("_line")), "\n").as("_clean"),
        count(lit(1)).as("_nkept"))
    df.select(col(idCol),
        size(split(col(textCol), "\n")).cast(LongType).as("_nlines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_clean"), lit("")).as("text"),
        (col("_nlines") - coalesce(col("_nkept"), lit(0L))).as("n_dropped"))
  }

  /** INTRA-document repeated-line dedup — the within-doc sibling of
    * [[stripBoilerplate]] (corpus-wide chrome) and Dedup.duplicateSpans
    * (cross-doc spans): scraped pages repeat nav blocks, listings and
    * footers INSIDE one document, and the C4-style cleaner keeps the
    * FIRST occurrence of each distinct line, in original order.
    *
    * Shape: one posexplode, a (doc, line) groupBy keeping the minimum
    * position, a doc-keyed rebuild — two doc-line-keyed shuffles, no
    * corpus-wide state, no driver action; a 100 GB document set and a
    * 100 TB one run the same plan. Output: idCol, text (deduped),
    * n_dropped. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("_ln", "_line")))
    val first = lines.groupBy(col(idCol), col("_line"))
      .agg(min(col("_ln")).as("_ln"))
    val rebuilt = first.groupBy(col(idCol))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("_ln"), col("_line")))),
            x => x("_line")), "\n").as("_clean"),
        count(lit(1)).as("_nkept"))
    // LEFT join + coalesce: a NULL text explodes to no lines at all, so
    // an inner join would silently drop the whole row — NULL-text docs
    // pass through with text NULL and n_dropped 0 (the stripBoilerplate
    // contract)
    df.select(col(idCol),
        size(split(col(textCol), "\n")).cast(LongType).as("_nlines"))
      .join(rebuilt, Seq(idCol), "left") // split never yields zero lines
      .select(col(idCol), col("_clean").as("text"),
        coalesce(col("_nlines") - col("_nkept"), lit(0L)).as("n_dropped"))
  }

  /** Per-document top-k keywords by tf-idf, raw-idf variant: score =
    * tf · (N / df). The idf factor is the raw rarity ratio rather than
    * its logarithm — a recognized tf-idf family member chosen here
    * because it keeps the score an EXACT IEEE rational of three integer
    * counts (libm `ln` differs across engines, breaking bit-for-bit
    * oracle reproduction; see the module determinism contract). Per-term
    * ln-idf is a monotone transform of N/df, so per-term orderings agree
    * with the classic formula; only cross-term weighting differs.
    *
    * Shape: explode → (doc, term) tf groupBy (map-side combined) →
    * term-keyed df groupBy over the ALREADY-AGGREGATED tf table (rows =
    * distinct doc-term pairs, not tokens) → term-keyed equi-join (both
    * sides shuffle on term; dfreq is vocabulary-sized, Zipf-large, so it
    * is deliberately NOT forced broadcast — AQE may still choose it) →
    * row_number window PARTITIONED BY doc. No global window, no
    * cartesian, no driver action; ranks are deterministic (score desc,
    * term asc — scores are bit-identical rationals, so ranking needs no
    * rounding). Output: idCol, rank, term, tf, tf_idf (rounded 4). */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    val ndocs = df.agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_score").desc, col("term").asc)
    tf.join(dfreq, "term").crossJoin(ndocs)
      .withColumn("_score", col("tf").cast(DoubleType) *
        (col("_n").cast(DoubleType) / col("_df").cast(DoubleType)))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"),
        col("tf").cast(LongType).as("tf"),
        round(col("_score"), 4).as("tf_idf"))
  }

  /** BM25 document ranking for a bag of query terms — the lexical-search
    * side of a data pipeline (find docs about X to audit/upsample). Exact
    * Robertson/Okapi shape for the tf-saturation part,
    * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), with the RATIONAL idf
    * core (N − df + 0.5)/(df + 0.5) kept un-logged: the classic formula
    * wraps it in ln(1 + ·), a monotone transform, so per-term rankings
    * agree; skipping libm keeps every score an exact IEEE expression the
    * SQL oracle reproduces bit-for-bit (module determinism contract).
    * Defaults k1 = 1.25 (dyadic, near the textbook 1.2) and b = 0.75
    * (dyadic and textbook) so the constants parse identically everywhere.
    *
    * Shape: the term filter lands BEFORE the tf groupBy, so only rows
    * for query terms travel (narrow filter over the token stream — at
    * 100 TB the shuffle carries one row per matching doc-term, not the
    * corpus); dfreq (≤ |terms| rows) and the 1-row corpus stats are
    * broadcast; dl joins tf on the doc key (shuffle equi-join — the
    * matching-doc set is unbounded, so NOT broadcast). Per-term scores
    * round to 4 before the per-doc sum (short sums — ≤ |terms| values —
    * so association-order noise is ~1e-13, far inside the rounding
    * grid), and the total rounds again. Top-k via TakeOrdered
    * (score desc, id asc). Output: idCol, n_matched, score. */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1)
    val dl = df.select(col(idCol), nTokens(col(textCol)).cast(LongType).as("_dl"))
    val stats = dl.agg(count(lit(1)).as("_n"), sum(col("_dl")).as("_sumdl"))
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term").isInCollection(queryTerms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("_avgdl",
        col("_sumdl").cast(DoubleType) / col("_n").cast(DoubleType))
      .withColumn("_idf",
        ((col("_n") - col("_df")).cast(DoubleType) + lit(0.5)) /
          (col("_df").cast(DoubleType) + lit(0.5)))
      .withColumn("_tscore", round(col("_idf") *
        (col("_tf").cast(DoubleType) * lit(k1 + 1.0) /
          (col("_tf").cast(DoubleType) + lit(k1) *
            (lit(1.0) - lit(b) +
              lit(b) * col("_dl").cast(DoubleType) / col("_avgdl")))), 4))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), round(sum(col("_tscore")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** PERSISTED inverted text index — the repeated-query workload
    * [[bm25Rank]] doesn't serve: tokenize the corpus ONCE into postings
    * `(term, id, dl, tf)` written BUCKETED BY term (Layout.saveBucketed)
    * plus a 1-row `<table>_stats` corpus sidecar (N, Σdl). Subsequent
    * [[bm25Query]] calls never touch raw text: their scans bucket-prune
    * to the query terms' buckets — at 100 TB a query reads |terms|
    * buckets' postings, not the corpus. Doc length rides denormalized in
    * each posting (classic search-engine layout) so scoring needs no
    * second join; per-term df is NOT persisted because the pruned scan
    * already reads exactly the rows that define it. Same catalog caveat
    * as the IVF index: bucket metadata lives in the session catalog, a
    * new session re-registers both tables over the existing parquet. */
  def buildTextIndex(df: DataFrame, idCol: String, textCol: String,
      table: String, path: String, buckets: Int = 16): Unit = {
    Layout.saveBucketed(postings(df, idCol, textCol), table, path,
      buckets, Seq("term"))
    df.select(nTokens(col(textCol)).cast(LongType).as("_dl"))
      .agg(count(lit(1)).as("n"), sum(col("_dl")).as("sumdl"))
      .write.mode("overwrite").option("path", path + "_stats")
      .format("parquet").saveAsTable(table + "_stats")
  }

  /** The postings relation `(term, id, dl, tf)` both [[buildTextIndex]]
    * and [[appendTextIndex]] write — one tokenize pass, map-side
    * combined groupBy. */
  private def postings(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("_ws"))
      .select(col(idCol), size(col("_ws")).cast(LongType).as("_dl"),
        explode(col("_ws")).as("term"))
      .groupBy(col("term"), col(idCol), col("_dl"))
      .agg(count(lit(1)).as("_tf"))

  /** INCREMENTAL maintenance of a [[buildTextIndex]] table — indexes are
    * append-maintained, not rebuild-only: tokenize ONLY the arriving
    * batch into postings, APPEND them into the term-bucketed table
    * (Spark validates the bucket spec against the catalog's, so
    * `buckets` must equal the build's — same declared-spec contract as
    * Layout.registerBucketed), and fold the batch's (doc count, token
    * sum) into the 1-row stats sidecar. The existing corpus is never
    * re-tokenized, re-shuffled, or even read (the sidecar is the only
    * read — one row). [[bm25Query]] needs no change: per-term df is
    * derived from the pruned postings scan, which now includes the new
    * rows, and avgdl comes from the updated sidecar.
    *
    * Contract: batch doc ids must be NEW to the index (run
    * Dedup.incrementalExact first) — appended postings for an existing
    * id would silently double-count its terms in every BM25 score. With
    * `checkIds` (the default) the contract is ENFORCED by a near-free
    * probe: the batch's TERMS prune the term-bucketed postings scan to
    * the batch's buckets, and the batch's ids filter inside them — a
    * re-appended document's old postings all carry terms the batch also
    * carries, so the replay/double-run failure mode is always caught
    * (an id collision between two documents with fully DISJOINT term
    * sets can evade the pruned probe; that shape double-counts nothing
    * that the pruned scan would have read and remains the caller's
    * contract). A collision throws before anything is written. */
  def appendTextIndex(batch: DataFrame, idCol: String, textCol: String,
      table: String, path: String, buckets: Int = 16,
      checkIds: Boolean = true): Unit = {
    val spark = batch.sparkSession
    if (checkIds) {
      val cap = 4096
      val ids = batch.select(col(idCol)).distinct()
      val idVals = ids.limit(cap + 1).collect().map(_.get(0))
      val termVals = batch
        .select(explode(tokens(col(textCol))).as("term")).distinct()
        .limit(cap + 1).collect().map(_.get(0))
      val scan0 = spark.table(table)
      val scan = if (termVals.length <= cap)
        scan0.where(col("term").isin(termVals: _*)) else scan0
      val probe = if (idVals.length <= cap)
        scan.where(col(idCol).isin(idVals: _*))
      else scan.join(ids, Seq(idCol), "left_semi")
      val dups = probe.select(col(idCol)).distinct().limit(5).collect()
        .map(_.get(0))
      if (dups.nonEmpty) throw new IllegalStateException(
        s"appendTextIndex($table): batch contains ids already indexed " +
          s"(e.g. ${dups.mkString(", ")}) — appending would double-count " +
          "their terms in every BM25 score; dedup the batch first or " +
          "pass checkIds=false")
    }
    postings(batch, idCol, textCol).write.mode("append")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    // fold the batch into the 1-row sidecar: both old and new values are
    // on the driver before the overwrite, so the self-referencing write
    // is safe
    val st = spark.table(table + "_stats").head()
    val bs = batch.select(nTokens(col(textCol)).cast(LongType).as("_dl"))
      .agg(count(lit(1)).as("n"), sum(col("_dl")).as("sumdl")).head()
    import spark.implicits._
    Seq((st.getLong(st.fieldIndex("n")) + bs.getLong(0),
        st.getLong(st.fieldIndex("sumdl")) + bs.getLong(1)))
      .toDF("n", "sumdl")
      .write.mode("overwrite").option("path", path + "_stats")
      .format("parquet").saveAsTable(table + "_stats")
  }

  /** BM25 over a [[buildTextIndex]] table: identical scoring arithmetic
    * to [[bm25Rank]] (same oracle reproduces both bit-for-bit), but the
    * input is the term-pruned postings scan — no tokenization, no corpus
    * pass. The 1-row stats sidecar is read on the driver (plan-time
    * metadata, same budget class as IVF centroids); the term IN-list
    * reaches the bucketed scan, which prunes to the matching buckets
    * (SelectedBucketsCount < total, asserted by LayoutSpec). */
  def bm25Query(spark: org.apache.spark.sql.SparkSession, table: String,
      idCol: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1)
    val st = spark.table(table + "_stats").head()
    val n = st.getLong(st.fieldIndex("n"))
    val sumdl = st.getLong(st.fieldIndex("sumdl"))
    val posts = spark.table(table)
      .where(col("term").isInCollection(queryTerms))
    val dfreq = posts.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    posts.join(broadcast(dfreq), "term")
      .withColumn("_avgdl",
        lit(sumdl).cast(DoubleType) / lit(n).cast(DoubleType))
      .withColumn("_idf",
        ((lit(n) - col("_df")).cast(DoubleType) + lit(0.5)) /
          (col("_df").cast(DoubleType) + lit(0.5)))
      .withColumn("_tscore", round(col("_idf") *
        (col("_tf").cast(DoubleType) * lit(k1 + 1.0) /
          (col("_tf").cast(DoubleType) + lit(k1) *
            (lit(1.0) - lit(b) +
              lit(b) * col("_dl").cast(DoubleType) / col("_avgdl")))), 4))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"),
        round(sum(col("_tscore")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** [[bm25Rank]] for a BATCH of queries over the raw corpus (no
    * index): one tokenize pass, the term UNION as the pushed-down
    * filter, (query_id, term) resolved by one broadcast join, and
    * per-query top-k windows. The index-backed sibling is
    * [[bm25QueryBatch]]; this one serves ad-hoc batches where no
    * postings table exists yet.
    * Output: (query_id, idCol, n_matched, score, rank), rank ≤ k. */
  def bm25RankBatch(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && k >= 1)
    require(queries.forall(_._2.nonEmpty), "every query needs terms")
    val spark = df.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val dl = df.select(col(idCol),
      nTokens(col(textCol)).cast(LongType).as("_dl"))
    val stats = dl.agg(count(lit(1)).as("_n"), sum(col("_dl")).as("_sumdl"))
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term").isInCollection(allTerms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    val qterms = queries
      .flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(qterms), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("_avgdl",
        col("_sumdl").cast(DoubleType) / col("_n").cast(DoubleType))
      .withColumn("_idf",
        ((col("_n") - col("_df")).cast(DoubleType) + lit(0.5)) /
          (col("_df").cast(DoubleType) + lit(0.5)))
      .withColumn("_tscore", round(col("_idf") *
        (col("_tf").cast(DoubleType) * lit(k1 + 1.0) /
          (col("_tf").cast(DoubleType) + lit(k1) *
            (lit(1.0) - lit(b) +
              lit(b) * col("_dl").cast(DoubleType) / col("_avgdl")))), 4))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_matched"),
        round(sum(col("_tscore")), 4).as("score"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** BATCHED BM25 retrieval — N queries against the persisted postings
    * index in ONE plan: the union of all query terms pushes into the
    * term-bucketed scan as a literal IN (bucket pruning works for the
    * batch exactly as for one query — SelectedBucketsCount covers the
    * union, not the corpus), per-(query, doc) scores come from one
    * broadcast join of the tiny (query_id, term) map, and per-query
    * top-k is a window over each query's own candidate set. This is
    * the production retrieval shape — an eval suite or serving batch
    * never issues queries one plan at a time.
    * Output: (query_id, idCol, n_matched, score, rank), rank ≤ k. */
  def bm25QueryBatch(spark: org.apache.spark.sql.SparkSession,
      table: String, idCol: String, queries: Seq[(Long, Seq[String])],
      k: Int, k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && k >= 1)
    require(queries.forall(_._2.nonEmpty), "every query needs terms")
    import spark.implicits._
    val st = spark.table(table + "_stats").head()
    val n = st.getLong(st.fieldIndex("n"))
    val sumdl = st.getLong(st.fieldIndex("sumdl"))
    val allTerms = queries.flatMap(_._2).distinct
    val posts = spark.table(table)
      .where(col("term").isInCollection(allTerms))
    val dfreq = posts.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    val qterms = queries
      .flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    posts.join(broadcast(dfreq), "term")
      .join(broadcast(qterms), "term")
      .withColumn("_avgdl",
        lit(sumdl).cast(DoubleType) / lit(n).cast(DoubleType))
      .withColumn("_idf",
        ((lit(n) - col("_df")).cast(DoubleType) + lit(0.5)) /
          (col("_df").cast(DoubleType) + lit(0.5)))
      .withColumn("_tscore", round(col("_idf") *
        (col("_tf").cast(DoubleType) * lit(k1 + 1.0) /
          (col("_tf").cast(DoubleType) + lit(k1) *
            (lit(1.0) - lit(b) +
              lit(b) * col("_dl").cast(DoubleType) / col("_avgdl")))), 4))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_matched"),
        round(sum(col("_tscore")), 4).as("score"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** Weighted-LEXICON quality scoring — the shape of a fastText-style
    * classifier filter without the non-reproducible model: each document
    * scores Σ count(term)·weight(term) over a weighted lexicon
    * (curated quality/spam/toxicity term lists with signed points).
    * Weights are INTEGER points on purpose: long sums are
    * association-order-free, so the score is bit-identical on any
    * engine/partitioning (a float-weighted sum would vary with shuffle
    * order — the cross-engine float-sum trap). The normalized
    * `per_token` ratio is one final rational division of two exact
    * integers, rounded only in the output.
    *
    * Plan: tokens explode, equi-join against the lexicon (a dimension
    * table — broadcast by AQE when small, a plain shuffle join when a
    * 100k-term lexicon is genuinely big), one groupBy per doc. Docs with
    * NO lexicon hit come back with zero score via the left join against
    * the input ids — filters need every doc scored, not just matches.
    * Output: idCol, n_tokens, n_hits, points, per_token. */
  def lexiconScore(df: DataFrame, idCol: String, textCol: String,
      lexicon: DataFrame, termCol: String = "term",
      weightCol: String = "weight"): DataFrame = {
    val lex = lexicon.select(col(termCol).as("_t"),
      col(weightCol).cast(LongType).as("_w"))
    val hits = df
      .select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .join(lex, Seq("_t"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), sum(col("_w")).as("points"))
    df.select(col(idCol), nTokens(col(textCol)).cast(LongType).as("n_tokens"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("points"), lit(0L)).as("points"),
        round(coalesce(col("points"), lit(0L)).cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 4).as("per_token"))
  }

  /** Top-k bigram collocations by LIFT — the association-mining side of
    * corpus analysis (multi-word expressions, template detection, tokenizer
    * merge candidates). Lift is PMI's exponent kept un-logged:
    * (c_ab · N) / (c_a · c_b) for bigram count c_ab, unigram counts
    * c_a/c_b, and corpus token total N — an exact IEEE expression of four
    * integer counts (same determinism argument as [[tfIdfTopTerms]]: libm
    * log breaks cross-engine bit-reproduction; ln is monotone, so
    * lift-ranking IS PMI-ranking). `minCount` prunes the bigram tail
    * BEFORE the unigram joins — rare-pair noise (lift explodes for
    * singletons) and join volume drop together.
    *
    * Shape: two explode+groupBy passes (tokens, bigrams — both map-side
    * combined), the bigram head filtered by minCount, then two term-keyed
    * equi-joins of the small head against the unigram table, the 1-row
    * token total broadcast, TakeOrdered for top-k (lift desc, bigram asc
    * — scores bit-identical, ranking needs no rounding). */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1)
    val toks = df.select(tokens(col(textCol)).as("_ws"))
    val uni = toks.select(explode(col("_ws")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("_c"))
    val total = uni.agg(sum(col("_c")).as("_t"))
    val big = toks.select(explode(ngramsOfTokens(col("_ws"), 2)).as("_bg"))
      .groupBy(col("_bg")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
      .select(split(col("_bg"), " ")(0).as("w1"),
        split(col("_bg"), " ")(1).as("w2"), col("c_ab"))
    big
      .join(uni.select(col("term").as("w1"), col("_c").as("_ca")), "w1")
      .join(uni.select(col("term").as("w2"), col("_c").as("_cb")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("_lift",
        (col("c_ab").cast(DoubleType) * col("_t").cast(DoubleType)) /
          (col("_ca").cast(DoubleType) * col("_cb").cast(DoubleType)))
      .orderBy(col("_lift").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .select(col("w1"), col("w2"), col("c_ab"),
        round(col("_lift"), 4).as("lift"))
  }

  /** Exact per-group token-length quantiles by the NEAREST-RANK
    * definition: for each integer percent p, the smallest length whose
    * cumulative count reaches ⌈p·n/100⌉. Integer percents + integer
    * counts mean the entire computation is integer arithmetic — the
    * rank test ⌈p·n/100⌉ ≤ cum is evaluated as p·n ≤ 100·cum, so there
    * is no division, no float, nothing for an oracle to disagree about.
    *
    * Shape — the 100 TB point of this operator: the corpus reduces to a
    * per-group LENGTH HISTOGRAM first (groupBy (group, len), map-side
    * combined), and the cumulative window runs over the histogram, whose
    * cardinality is bounded by (#groups × max doc length) — thousands of
    * rows — NOT over the corpus. A naive percentile over raw lengths
    * sorts 100 TB through one task (the exact single-reducer shape this
    * codebase bans); this form's window partitions by group over a
    * vanishing input. Output: groupCol, pct, n_tokens. */
  def lengthQuantiles(df: DataFrame, groupCol: String, textCol: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))
    val hist = df.select(col(groupCol),
        nTokens(col(textCol)).cast(LongType).as("_len"))
      .groupBy(col(groupCol), col("_len")).agg(count(lit(1)).as("_cnt"))
    val wcum = Window.partitionBy(col(groupCol)).orderBy(col("_len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(col(groupCol))
    hist.withColumn("_cum", sum(col("_cnt")).over(wcum))
      .withColumn("_n", sum(col("_cnt")).over(wall))
      .select(col(groupCol), col("_len"), col("_cum"), col("_n"),
        explode(array(percents.map(p => lit(p.toLong)): _*)).as("pct"))
      .where(col("pct") * col("_n") <= col("_cum") * lit(100L))
      .groupBy(col(groupCol), col("pct"))
      .agg(min(col("_len")).as("n_tokens"))
  }

  /** Corpus drift report — which terms' frequencies moved most between
    * two corpora (crawl-to-crawl drift, train/serve skew, pre/post-
    * filter shift). Per term the drift is the cross-multiplied
    * numerator of |c_a/n_a − c_b/n_b|:
    *
    *   drift_num(t) = |c_a(t)·n_b − c_b(t)·n_a|
    *
    * an EXACT integer (order-free sums, no float anywhere — divide by
    * n_a·n_b only if you want the probability-scale L1 contribution),
    * so rankings are reproducible bit-for-bit by any engine.
    * Long arithmetic bounds the corpora at ~3·10⁹ tokens a side
    * (c·n < 2⁶³); past that, switch the products to DECIMAL(38,0) —
    * same plan shape. One count aggregation per side (map-side
    * combined), a full-outer join on term (absent → 0), TakeOrdered
    * top-k. Output: (term, c_a, c_b, drift_num), drift descending,
    * term-tiebroken. */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int = 20): DataFrame = {
    def termCounts(df: DataFrame) = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val ca = termCounts(a)
    val cb = termCounts(b)
    def total(c: DataFrame): Long =
      Option(c.agg(sum(col("c"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    val na = total(ca)
    val nb = total(cb)
    require(na > 0 && nb > 0,
      s"vocabDrift needs non-empty corpora (n_a=$na, n_b=$nb)")
    ca.withColumnRenamed("c", "c_a")
      .join(cb.withColumnRenamed("c", "c_b"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .withColumn("drift_num",
        abs(col("c_a") * lit(nb) - col("c_b") * lit(na)))
      .orderBy(col("drift_num").desc, col("term"))
      .limit(topK)
  }

  /** Bigram-LM fluency score — the KenLM-perplexity-filter shape with a
    * corpus-trained model and NO libm: each document scores the average
    * conditional probability of its adjacent token pairs,
    * `avg_i c(w_i w_{i+1}) / c(w_i ·)`, under counts trained on the
    * corpus itself. Incoherent/shuffled text pairs rare bigrams and
    * scores low; fluent text rides the corpus's own transitions. True
    * perplexity exponentiates a log-prob sum — libm territory no
    * external engine reproduces bit-for-bit; the probability AVERAGE
    * ranks the same failure mode with every operand an exact integer
    * ratio.
    *
    * Cross-engine determinism of the float sum is ORDER-PINNED: the
    * per-doc probabilities are folded in token-position order (a
    * sort_array of (pos, p) structs + a left `aggregate` fold — one
    * association, reproducible by any engine's left fold/list_reduce in
    * the same order), never a groupBy sum whose association order is
    * partition-dependent.
    *
    * Scale shape: two count aggregations (bigram, left-context) +
    * broadcast-friendly joins back to the pair stream + one per-doc
    * groupBy — all key-partitioned; per-doc state is the doc's own
    * (pos, p) list, bounded by doc length. Output: idCol, n_bigrams,
    * avg_cond_p (rounded 6), n_rare (pairs with corpus count <
    * `minCount` — the OOV-transition tally; docs under 2 tokens score
    * 0 with 0 bigrams). */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2): DataFrame = {
    val toks = df.select(col(idCol), tokens(col(textCol)).as("_ws"))
    val pairs = toks.where(size(col("_ws")) >= 2).select(col(idCol),
        posexplode(zip_with(
          slice(col("_ws"), lit(1), size(col("_ws")) - 1),
          slice(col("_ws"), lit(2), size(col("_ws")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))))
      .select(col(idCol), col("pos"),
        col("col")("w1").as("_w1"), col("col")("w2").as("_w2"))
    val c2 = pairs.groupBy(col("_w1"), col("_w2"))
      .agg(count(lit(1)).as("_c2"))
    val c1 = pairs.groupBy(col("_w1")).agg(count(lit(1)).as("_c1"))
    val scored = pairs.join(c2, Seq("_w1", "_w2")).join(c1, Seq("_w1"))
      .withColumn("_p", col("_c2").cast(DoubleType) / col("_c1"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("_p"))))
          .as("_ps"),
        count(lit(1)).as("n_bigrams"),
        sum(when(col("_c2") < minCount, 1L).otherwise(0L)).as("n_rare"))
      .select(col(idCol), col("n_bigrams"),
        round(aggregate(col("_ps"), lit(0.0),
          (acc, x) => acc + x("_p")) / col("n_bigrams"), 6)
          .as("avg_cond_p"),
        col("n_rare"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_cond_p"), lit(0.0)).as("avg_cond_p"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
  }

  /** Composite quality score in [0,1]: length band + stopword presence +
    * repetition penalty. Deterministic, SQL-expressible. */
  def qualityScore(text: Column): Column = {
    val lenOk = when(nTokens(text).between(20, 1000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.0)
    val distinctRatio =
      nDistinctTokens(text).cast(DoubleType) / nTokens(text).cast(DoubleType)
    round((lenOk + stopOk + least(distinctRatio * lit(2), lit(1.0))) / 3.0, 4)
  }

  /** Language-ID by stopword-count ballot over fixed per-language lists —
    * the classic n-gram/function-word heuristic, deterministic and
    * SQL-reproducible. Ties broken by list order (en first). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"),
    "es" -> Seq("el", "los", "las", "es", "y", "que"))

  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = LangStopwords.map { case (lang, words) =>
      lang -> size(filter(ts, t => t.isInCollection(words)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language reaching the max score wins; all-zero → 'unk'
    scores.foldRight(lit("unk"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** BPE MERGE-PAIR COUNTING — the inner step of byte-pair-encoding
    * tokenizer training: the corpus-weighted frequency of every
    * adjacent symbol pair, whose argmax is the next merge. The classic
    * scale trick is applied structurally: pairs are counted over the
    * VOCABULARY (distinct word × its corpus frequency), not over raw
    * corpus characters — the explode touches Σ|w| characters per
    * DISTINCT word, so a 100 TB corpus with a 10M-word vocabulary
    * costs a vocab-sized shuffle per iteration, not a corpus scan
    * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
    * with Subword Units", §3: counts indexed by word type). This
    * computes iteration 1's candidates (symbols = characters); the
    * driver applies the chosen merge to the vocab and re-calls — each
    * round is one groupBy over the re-symbolized vocab.
    *
    * Output: top `k` rows (pair, n) — pair as "a|b", n the total
    * corpus occurrence count — ordered by (n desc, pair). Words
    * containing '|' are excluded (the pair-display separator must not
    * be a symbol — see [[bpeLearn]]). */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val vocab = df
      .select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= 2 && !col("w").contains("|"))
      .groupBy("w").agg(count("*").as("freq"))
    vocab
      .select(col("freq"), explode(
        transform(sequence(lit(1), length(col("w")) - 1), i =>
          concat(col("w").substr(i, lit(1)), lit("|"),
            col("w").substr(i + 1, lit(1))))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)
  }

  /** ITERATED BPE MERGE LEARNING — the full tokenizer-training loop
    * over [[bpePairCounts]]'s one step: rounds of (count all adjacent
    * symbol pairs over the vocabulary) → (select merges) → (apply them
    * to every vocab entry) → repeat, until `nMerges` merges are
    * learned. Counting is a distributed groupBy per round and merge
    * application a narrow map; only a bounded candidate pool ever
    * reaches the driver.
    *
    * `batchK` is the scale knob for the ROUND count, which at
    * production vocab sizes (30k+ merges) is the wall-clock killer —
    * one driver-synchronized Spark job per merge. With `batchK = 1`
    * this is exactly sequential BPE (top-1 pair per round). With
    * `batchK > 1` each round accepts up to `batchK` MUTUALLY
    * NON-INTERACTING merges from one pair count — the standard batched
    * approximation: candidates rank by (n desc, pair asc) within a
    * pool of the top `4·batchK + 32`, and acceptance is a greedy
    * maximal matching on the symbol-conflict graph — walk the ranking,
    * accept a pair iff neither symbol appears in an already-accepted
    * pair. Accepted merges are symbol-disjoint, so (a) their
    * applications cannot overlap — one chained replace pass applies
    * the whole batch, and (b) each accepted pair's count is its true
    * sequential-BPE count at round start (merging a disjoint pair can
    * neither create nor destroy an occurrence of another). The greedy
    * walk is pure rank-recursion over a bounded candidate list, so an
    * oracle replays it without driver state (a recursive CTE carrying
    * the used-symbol set). Learning runs on vocab entries only; the
    * base vocab is cached ONCE, each round is ONE job (the candidate
    * count), and periodic lineage truncation keeps per-round cost
    * FLAT in the round number (see [[bpeLearnCore]]) — a 30k-merge
    * vocabulary at batchK=256 is ~120 rounds, not 30k. Measured, both
    * regimes (graft.tools.BpeDeep, local[32]): 64 rounds / 1024 merges
    * in ~16 s at a 4k-word vocab (~0.25 s/round, no late-round growth
    * — the deep-run spec in OpsSpec), and the production point itself:
    * 30,000 merges at batchK=256 = 118 rounds in 742 s over a 40k-word
    * corpus — ~6.3 s/round steady-state, flat in the round number but
    * NOT in batchK: the live encode chain between truncations is up to
    * checkpointEvery·batchK replaces (~3k at 256), past the JVM's
    * 64 KB codegen method limit, so those stages run interpreted —
    * the cost is per-window-constant, which is exactly what the
    * truncation guarantees.
    *
    * Symbol sequences are encoded as strings — `" s1  s2  …  sn "`,
    * two spaces between symbols, one at each end — chosen so applying
    * a merge is a plain `replace(enc, " x  y ", " xy ")`: every symbol
    * is single-space-bounded exactly once on each side, so the pattern
    * matches precisely at symbol boundaries, left-to-right
    * non-overlapping replacement IS the greedy BPE merge order, and a
    * replacement (which never contains a double space) can never
    * manufacture a new match — meaning ANY engine's standard replace()
    * reproduces the round exactly (the oracle applies the identical
    * expression). Words containing '|' are excluded from the learning
    * vocab: '|' is the pair-display separator, and excluding it from
    * the symbol alphabet keeps every emitted "x|y" unambiguous (the
    * [[bpeEncode]] contract).
    *
    * Output: (iter, pair, n) — the learned merge table in application
    * order; n is the pair's count in the round that accepted it. */
  def bpeLearn(df: DataFrame, textCol: String, nMerges: Int,
      batchK: Int = 1): DataFrame = {
    require(nMerges >= 1 && batchK >= 1)
    bpeLearnCore(df, textCol, maxRounds = Int.MaxValue, batchK = batchK,
      totalMerges = Some(nMerges))
  }

  /** Shared learning loop of [[bpeLearn]] / [[bpeLearnRounds]]: one
    * [[bpeRound]] candidate count per round over a lazily re-merged
    * vocab, with PERIODIC LINEAGE TRUNCATION. Between checkpoints the
    * vocab is a lazy chain of replaces over the cached base (each
    * round re-applies the accumulated narrow merges — no per-round
    * materialization); every `checkpointEvery` merge-applying rounds
    * the re-symbolized vocab is `localCheckpoint`ed, so the Catalyst
    * plan never carries more than ~checkpointEvery·batchK nested
    * replace calls. Without the truncation, round r's plan holds
    * r·batchK replaces: re-analysis grows quadratically in rounds and
    * deep nesting eventually breaks whole-stage codegen (janino's
    * 64 KB method cap) — measured, a 64-round/1024-merge run spends
    * its late rounds in the analyzer, while the checkpointed loop
    * stays flat per round. Old checkpoint snapshots become
    * unreachable after the next truncation and the ContextCleaner
    * reclaims their blocks; each snapshot is vocab-sized (distinct
    * words), not corpus-sized. */
  private def bpeLearnCore(df: DataFrame, textCol: String,
      maxRounds: Int, batchK: Int, totalMerges: Option[Int],
      checkpointEvery: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def withSyms(v: DataFrame): DataFrame =
      v.withColumn("syms", split(trim(col("enc")), "  "))
    val base = df
      .select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= 2 && !col("w").contains("|"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), concat(lit(" "),
        concat_ws("  ", split(col("w"), "")), lit(" ")).as("enc"))
      .persist()
    val merges = Seq.newBuilder[(Int, String, Long)]
    try {
      var vocab = withSyms(base)
      var learned = 0
      var round = 0
      var sinceCkpt = 0
      var exhausted = false
      while (round < maxRounds && !exhausted &&
          totalMerges.forall(learned < _)) {
        round += 1
        val need = totalMerges.map(t => math.min(batchK, t - learned))
          .getOrElse(batchK)
        val batch = bpeRound(vocab, 4 * batchK + 32, need)
        // an empty round is terminal either way: the vocab is unchanged,
        // so every later round would recount the same empty candidates
        if (batch.isEmpty) exhausted = true
        else {
          merges ++= batch.zipWithIndex.map { case ((p, n), i) =>
            (learned + i + 1, p, n)
          }
          learned += batch.size
          vocab = withSyms(vocab.select(col("freq"),
            applyMerges(col("enc"), batch.map(_._1)).as("enc")))
          sinceCkpt += 1
          if (sinceCkpt >= checkpointEvery) {
            vocab = withSyms(
              vocab.select(col("freq"), col("enc")).localCheckpoint())
            sinceCkpt = 0
          }
        }
      }
    } finally base.unpersist(blocking = false)
    merges.result().toDF("iter", "pair", "n")
  }

  /** One batched-BPE round over a symbolized vocab: ONE distributed
    * pair count, then the driver's rank-local acceptance rule (see
    * [[bpeLearn]]) over the collected top-`pool` candidates. Returns
    * up to `maxAccept` (pair, n) merges in rank order. */
  private def bpeRound(vocab: DataFrame, pool: Int,
      maxAccept: Int): Seq[(String, Long)] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val cands = vocab
      .where(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1), i =>
          concat(element_at(col("syms"), i), lit("|"),
            element_at(col("syms"), i + 1)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("pair")).limit(pool)
      .as[(String, Long)].collect()
    // greedy maximal matching on the symbol-conflict graph: walk the
    // ranked candidates, accept a pair iff neither symbol appears in an
    // already-ACCEPTED pair (a rejected candidate blocks nothing) —
    // replayable without driver state as a rank-recursion carrying the
    // used-symbol set (the oracle's recursive CTE)
    val used = scala.collection.mutable.Set.empty[String]
    val accepted = Seq.newBuilder[(String, Long)]
    var nAcc = 0
    cands.foreach { case (pair, n) =>
      if (nAcc < maxAccept) {
        val Array(x, y) = pair.split("\\|", 2)
        if (!used(x) && !used(y)) {
          accepted += ((pair, n)); nAcc += 1; used += x; used += y
        }
      }
    }
    accepted.result()
  }

  /** Chained space-encoded merge application: symbol-disjoint batches
    * commute, applied in rank order for definiteness. Plain string
    * replace (not regex) — byte-for-byte the same left-to-right
    * non-overlapping scan the oracle's replace() runs. */
  private def applyMerges(enc: Column, pairs: Seq[String]): Column =
    pairs.foldLeft(enc) { case (e, pair) =>
      val Array(x, y) = pair.split("\\|", 2)
      call_function("replace", e, lit(s" $x  $y "), lit(s" $x$y "))
    }

  /** FIXED-ROUND batched BPE learning — the oracle-replayable form of
    * batched [[bpeLearn]]: exactly `rounds` rounds, each accepting up
    * to `batchK` mutually non-interacting merges under the identical
    * rank-local rule, outputting EVERY accepted merge (the merge count
    * is data-dependent; the round count is not). A static per-round
    * replay — window-ranked candidates, an anti-join acceptance filter,
    * a chained replace — reproduces this without any sequential driver
    * state, which is what makes production-scale learning testable:
    * `rounds × batchK` target merges cost `rounds + 1` Spark jobs
    * total (one candidate count per round + the one-time base-vocab
    * cache), vs one job PER MERGE sequentially. Output: (iter, pair,
    * n) in global application order. */
  def bpeLearnRounds(df: DataFrame, textCol: String, rounds: Int,
      batchK: Int): DataFrame = {
    require(rounds >= 1 && batchK >= 1)
    bpeLearnCore(df, textCol, maxRounds = rounds, batchK = batchK,
      totalMerges = None)
  }

  /** BPE ENCODE — apply a LEARNED merge list (the [[bpeLearn]] output,
    * in iteration order) to a corpus and count the resulting tokens per
    * document: the token-budget number that matters is tokens under the
    * ACTUAL tokenizer, not whitespace words ([[nTokens]]) or the
    * punctuation proxy ([[nSubtokens]]).
    *
    * Shape for scale: merges apply to the DISTINCT-WORD table, not the
    * corpus — cost ∝ |vocab| (which grows sub-linearly in corpus size),
    * then one equi-join back to the exploded words and a per-doc sum.
    * The merge list itself is driver-side (it came from bpeLearn's one
    * row per round) and folds into ONE chained codegen'd `replace`
    * expression over the encoding — N merges are N string replaces in a
    * single narrow map over the vocab, zero shuffles per merge. The
    * space-encoded merge semantics (`" x  y " → " xy "`, see
    * [[bpeLearn]]) make every replace engine-portable, so the oracle
    * replays the identical expressions.
    *
    * Words shorter than 2 chars never entered the learned vocab: a
    * 1-char word is one token by definition, an empty split artifact
    * zero. Output: (idCol, n_tokens).
    *
    * Two equivalent merge-application paths, switched on
    * `exprMergeLimit`: short merge lists fold into chained codegen'd
    * `replace` expressions; a production-sized vocabulary (30k+ merges)
    * would explode the expression tree, so past the limit a Scala UDF
    * applies the identical `String.replace` sequence per vocab entry.
    * The UDF runs over the DISTINCT-WORD table only — never the corpus
    * hot path — which is exactly the case where the functions-not-UDFs
    * rule yields: per-row cost is |merges| bounded string scans on a
    * relation that grows sub-linearly in corpus size. Java and SQL
    * `replace` share left-to-right non-overlapping semantics, so both
    * paths (and the oracle) agree byte-for-byte. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[String], exprMergeLimit: Int = 64): DataFrame = {
    // "x|y" parses unambiguously because bpeLearn excludes '|' from the
    // symbol alphabet (pipe-containing words never enter the learning
    // vocab), so a pair contains exactly one '|' — the separator
    require(merges.forall(_.count(_ == '|') == 1),
      "merges must be bpeLearn 'x|y' pairs in iteration order")
    val pairs = merges.map { p =>
      val Array(x, y) = p.split("\\|", 2); (x, y)
    }
    val words = df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val vocab = words.where(length(col("w")) >= 2).select("w").distinct()
    val encodedTokens: Column =
      if (merges.size <= exprMergeLimit) {
        val enc0 =
          concat(lit(" "), concat_ws("  ", split(col("w"), "")), lit(" "))
        val encoded = pairs.foldLeft(enc0) { case (e, (x, y)) =>
          call_function("replace", e, lit(s" $x  $y "), lit(s" $x$y "))
        }
        size(split(trim(encoded), "  ")).cast("long")
      } else {
        val bcast =
          df.sparkSession.sparkContext.broadcast(pairs.toIndexedSeq)
        val count = udf { (w: String) =>
          var enc = " " + w.split("").mkString("  ") + " "
          bcast.value.foreach { case (x, y) =>
            enc = enc.replace(s" $x  $y ", s" $x$y ")
          }
          enc.trim.split("  ").length.toLong
        }
        count(col("w"))
      }
    val wordTokens = vocab.select(col("w").as("vw"),
      encodedTokens.as("nt"))
    words.join(wordTokens, col("w") === col("vw"), "left")
      .groupBy(col(idCol))
      .agg(sum(when(length(col("w")) === 0, lit(0L))
        .when(length(col("w")) === 1, lit(1L))
        .otherwise(col("nt"))).as("n_tokens"))
  }

  /** Document fingerprint: hash of whitespace-normalized lowercase text.
    * (The rolling-hash shingle variant lives in Dedup.shingles; this is
    * the whole-doc exact-dup key.) */
  /** The normalization under [[fingerprint]] (lowercase + whitespace
    * collapse), exposed so internal keys can hash it (xxhash64 for
    * probabilistic/bucketing keys, [[fingerprintBin]] for exact
    * identity) while user-facing fingerprints keep the md5 hex form. */
  def normalized(text: Column): Column =
    lower(regexp_replace(text, "\\s+", " "))

  def fingerprint(text: Column): Column = md5(normalized(text))

  /** 16-byte BINARY form of [[fingerprint]] — the EXACT-identity key.
    * Half the bytes of the hex string with zero collision loss; at 128
    * bits, birthday collisions are negligible at any corpus size this
    * engine targets (~5e-19 expected colliding pairs at 10^10 docs),
    * so paths documented as "exact" (Dedup.exact / incrementalExact /
    * leakageAudit, StreamingDedup.firstSeen) may treat it as identity.
    * A single 64-bit xxhash64 does NOT qualify there (~3 expected
    * collisions at 10^10 docs would silently drop distinct documents);
    * xxhash64 stays the key for probabilistic stages (shingles, LSH
    * bands) whose contracts already state a collision bound. */
  def fingerprintBin(text: Column): Column = unhex(fingerprint(text))
}
