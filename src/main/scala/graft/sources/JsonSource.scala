package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** JSON fact ingest (S1/S2/S8) and the external-transform hook (S5).
  */
object JsonSource {

  /** S1/S2 — load one or many JSON files of fact docs into triples.
    * Multi-file union is free (one scan over all paths); per-file
    * provenance is kept as a `tripl.file:source` attribute via
    * input_file_name(), preserving the reference's per-file scoping
    * signal (TripleStore.loads, tripl.py:543-553). */
  def loadFacts(spark: SparkSession, ns: String, idAttrs: Seq[String],
      paths: String*): DataFrame = {
    val docs = spark.read.json(paths: _*)
      .withColumn("tripl.file:source", input_file_name())
    DocIngest.flatten(docs, ns, idAttrs)
  }

  /** S8 — failure-capturing JSON parse: malformed records become error
    * entities `{tripl.nestly:error, tripl.nestly:file}` instead of
    * failing the load (failable_json_file, nestly.py:31-46), via
    * PERMISSIVE mode's corrupt-record column. */
  def loadFactsFailable(spark: SparkSession, ns: String,
      idAttrs: Seq[String], paths: String*): DataFrame = {
    val docs = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(paths: _*)
      .withColumn("tripl.file:source", input_file_name())
    // schema inference only materializes the corrupt-record column when at
    // least one malformed record exists — on fully-valid input the column
    // is absent and referencing it would throw UNRESOLVED_COLUMN
    if (!docs.columns.contains("_corrupt")) DocIngest.flatten(docs, ns, idAttrs)
    else {
      // the GOOD branch stays fully lazy (it reads real data columns, so
      // no corrupt-record-only restriction applies, and eagerly
      // checkpointing a whole corpus at ingest time would double storage)
      val goodT = DocIngest.flatten(
        docs.where(col("_corrupt").isNull).drop("_corrupt"), ns, idAttrs)
      // the BAD branch projects ONLY the corrupt-record column, which
      // Spark refuses on raw JSON scans (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
      // — cache just for this branch and release once the (small) error
      // entities are checkpointed
      val cached = docs.cache()
      val badT = graft.ops.CacheScope.releasing(cached) {
        DocIngest.flatten(
          cached.where(col("_corrupt").isNotNull)
            .select(col("_corrupt").as("tripl.nestly:error"),
              col("`tripl.file:source`").as("tripl.nestly:file")),
          ns, Nil)
      }
      goodT.unionByName(badT)
    }
  }

  /** S9 — build-product file lineage (nestly's `_translate_target`,
    * nestly.py:318-351): one entity per file path, identified
    * DETERMINISTICALLY by the path itself, carrying `tripl.file:path`
    * plus `tripl.file:sources` refs to the files it was derived from.
    * Cross-doc entity resolution unifies a file's source-stub with that
    * file's own entity, so the provenance graph is walkable with
    * match/pull/reachable like any ref edge. Paths under `baseDir` are
    * relativized (the reference relativizes non-absolute paths against
    * the build's output dir; a distributed ingest normalizes against an
    * explicit base instead of process CWD).
    *
    * Input: one row per produced file — (pathCol: String,
    * sourcesCol: Array[String]). */
  def fileLineage(files: DataFrame, pathCol: String, sourcesCol: String,
      baseDir: Option[String] = None): DataFrame = {
    val docs = files.select(
      relPath(col(pathCol), baseDir).as("tripl.file:path"),
      transform(col(sourcesCol),
        p => struct(relPath(p, baseDir).as("tripl.file:path")))
        .as("tripl.file:sources"))
    DocIngest.flatten(docs, "tripl.file", Seq("tripl.file:path"))
  }

  /** Path relativization shared by lineage and contents ingest: paths
    * under `baseDir` become relative (the reference relativizes against
    * the build's output dir, nestly.py:322-327). */
  private def relPath(c: org.apache.spark.sql.Column,
      baseDir: Option[String]): org.apache.spark.sql.Column = baseDir match {
    case Some(b) =>
      val prefix = if (b.endsWith("/")) b else b + "/"
      when(c.startsWith(prefix),
        c.substr(lit(prefix.length + 1), length(c))).otherwise(c)
    case None => c
  }

  /** S9+ — `tripl.file:contents` ingest (nestly.py:98-110): one entity
    * per build-product file, identified by its (relativized) path,
    * carrying the file's full text as a `tripl.file:contents` fact —
    * the reference's build-metadata harvesting of non-JSON/YAML
    * artifacts. Distributed: the text source's `wholetext` mode reads
    * each file as one row ON THE EXECUTORS (no driver file I/O), so a
    * million small build products ingest as a normal parallel scan.
    * Because the entity id is the path (same resolution rule as
    * [[fileLineage]]), contents attach to the SAME entities the
    * provenance graph references — lineage + contents compose into one
    * queryable file graph. */
  def fileContents(spark: SparkSession, baseDir: Option[String],
      paths: String*): DataFrame = {
    // input_file_name yields a percent-ENCODED URI (file:///a/my%20file):
    // strip the scheme and percent-decode so the path matches fileLineage's
    // raw paths (pre-encode literal '+' — url_decode is form-decoding and
    // would otherwise turn it into a space)
    val raw = spark.read.option("wholetext", "true").text(paths: _*)
      .withColumn("_p", url_decode(regexp_replace(
        regexp_replace(input_file_name(), "^file:(//)?", ""), "\\+", "%2B")))
    val docs = raw.select(
      relPath(col("_p"), baseDir).as("tripl.file:path"),
      col("value").as("tripl.file:contents"))
    DocIngest.flatten(docs, "tripl.file", Seq("tripl.file:path"))
  }

  /** S5 — the `--map-command` analogue (cli.py:20-23): stream every
    * partition's rows through an external command (stdin→stdout line
    * protocol), distributed via RDD.pipe — each executor runs its own
    * process, replacing the reference's driver-side multiprocessing
    * pool. The command's stdout lines come back as a Dataset[String]
    * (typically JSON to feed DocIngest). */
  def mapCommand(lines: Dataset[String], command: String): Dataset[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    spark.createDataset(lines.rdd.pipe(command))
  }
}
