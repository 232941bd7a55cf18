package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain-format sources from the reference's nestly module: FASTA
  * sequence files (S6, nestly.py:62-64) and Newick phylogenetic trees
  * (S7, nestly.py:67-83).
  */
object BioFormats {

  /** S6 — FASTA ingest, DISTRIBUTED: reading with record separator '>'
    * makes each row one record ("id desc\nSEQLINES..."), so parsing is a
    * narrow per-row transform that scales with file splits (no
    * whole-file driver reads). Output docs: {bio.seq:id, bio.seq:desc,
    * bio.seq:seq} matching the reference's
    * {'bio.seq:set': [{'bio.seq:id', 'bio.seq:seq'}]} shape. */
  def readFasta(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", ">").text(path)
    raw.where(length(trim(col("value"))) > 0)
      .select(
        split(col("value"), "\n").as("_lines"))
      .select(
        trim(element_at(col("_lines"), 1)).as("_header"),
        concat_ws("", expr("slice(_lines, 2, size(_lines) - 1)")).as("seq"))
      .select(
        regexp_extract(col("_header"), "^(\\S+)", 1).as("bio.seq:id"),
        trim(regexp_replace(col("_header"), "^\\S+\\s*", "")).as("bio.seq:desc"),
        regexp_replace(col("seq"), "\\s", "").as("bio.seq:seq"))
  }

  /** FASTA → triples via the standard doc flattener. */
  def fastaTriples(spark: SparkSession, path: String): DataFrame =
    DocIngest.flatten(readFasta(spark, path), "bio", Seq("bio.seq:id"))

  /** S7 — Newick tree parse (driver-side recursive descent — trees are
    * small metadata; the resulting triples are the distributed part, and
    * tree analytics then run on GraphX via the ref edges). Produces
    * (clade-name, parent-name, branch-length) rows; anonymous internal
    * clades get positional names. Reference shape: self-referential
    * bio.phylo.clade docs (nestly.py:67-83). */
  def parseNewick(newick: String): Seq[(String, Option[String], Option[Double])] = {
    var pos = 0
    var anon = 0
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Option[String], Option[Double])]
    val s = newick.trim.stripSuffix(";")

    // returns the clade's index in `out` — children are patched BY INDEX
    // (duplicate clade names are legal in Newick; patching by name would
    // reparent the first same-named entry anywhere in the tree)
    def parseClade(parent: Option[String]): Int = {
      var children = List.empty[Int]
      if (pos < s.length && s.charAt(pos) == '(') {
        pos += 1 // '('
        children ::= parseClade(None)
        while (pos < s.length && s.charAt(pos) == ',') {
          pos += 1; children ::= parseClade(None)
        }
        require(pos < s.length && s.charAt(pos) == ')', s"bad newick at $pos")
        pos += 1 // ')'
      }
      val sb = new StringBuilder
      while (pos < s.length && !",();".contains(s.charAt(pos))) {
        sb += s.charAt(pos); pos += 1
      }
      val (name0, len) = sb.toString.split(":", 2) match {
        case Array(n, l) => (n, Some(l.toDouble))
        case Array(n) => (n, None)
      }
      val name = if (name0.nonEmpty) name0 else { anon += 1; s"clade_$anon" }
      out += ((name, parent, len))
      val idx = out.length - 1
      // fix up children's parent (they were parsed before we knew our name)
      children.foreach { i => out(i) = (out(i)._1, Some(name), out(i)._3) }
      idx
    }
    parseClade(None)
    out.toSeq
  }

  /** Newick → triples: clade entities with bio.clade:name,
    * bio.clade:parent (ref), bio.clade:length. The parent is emitted as a
    * nested SELF-REFERENTIAL doc {bio.clade:name: parent} — entity
    * resolution unifies the child-doc stub with the parent clade's own
    * entity (same id attribute ⇒ same eid), so the parent edge is a real
    * typed ref traversable by pull/match/Entity, exactly the reference's
    * self-referential clade shape (nestly.py:67-83). */
  def newickTriples(spark: SparkSession, newick: String): DataFrame = {
    import spark.implicits._
    val docs = parseNewick(newick)
      .toDF("bio.clade:name", "_parent", "bio.clade:length")
      .withColumn("bio.clade:parent",
        when(col("_parent").isNotNull,
          struct(col("_parent").as("bio.clade:name"))))
      .drop("_parent")
    DocIngest.flatten(docs, "bio", Seq("bio.clade:name"))
  }
}
