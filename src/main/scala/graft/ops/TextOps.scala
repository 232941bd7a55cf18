package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Document fingerprint: hash of whitespace-normalized lowercase text.
    * (The rolling-hash shingle variant lives in Dedup.shingles; this is
    * the whole-doc exact-dup key.) */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))
}
