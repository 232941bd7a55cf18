package graft.sources

import graft.sources.RowIngest.{RefSpec, TableSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Table specs for the driver testdata (TESTDATA.md / FIXTURES.md §4) and a
  * per-session cache of their triple encodings, so the many demo queries in
  * SparkEntry share one flattening per table instead of re-scanning.
  *
  * Ref attrs use entity-style names (`customer:nation` → nation entity),
  * while the raw fk number is also kept as a scalar (`customer:nationkey`)
  * so flat pulls stay DuckDB-comparable.
  */
object Tpch {
  private def strip(letter: String) = Some(letter + "_")

  def spec(df: DataFrame, table: String): TableSpec = table match {
    case "region" => RowIngest.specFor(df, table, Seq("r_regionkey"), Nil, strip("r"))
    case "nation" => RowIngest.specFor(df, table, Seq("n_nationkey"),
      Seq(RefSpec("n_regionkey", "nation:region", "region")), strip("n"))
    case "customer" => RowIngest.specFor(df, table, Seq("c_custkey"),
      Seq(RefSpec("c_nationkey", "customer:nation", "nation")), strip("c"))
    case "supplier" => RowIngest.specFor(df, table, Seq("s_suppkey"),
      Seq(RefSpec("s_nationkey", "supplier:nation", "nation")), strip("s"))
    case "part" => RowIngest.specFor(df, table, Seq("p_partkey"), Nil, strip("p"))
    case "orders" => RowIngest.specFor(df, table, Seq("o_orderkey"),
      Seq(RefSpec("o_custkey", "orders:customer", "customer")), strip("o"))
    // lineitem has NO unique natural key in this synthetic data (duplicate
    // (orderkey, linenumber) pairs exist); full rows ARE unique, so the
    // entity id is a content hash of all columns — the id_attrs=[all]
    // analogue of the reference's entity resolution (tripl.py:457-481).
    case "lineitem" => RowIngest.specFor(df, table, df.columns.toSeq,
      Seq(RefSpec("l_orderkey", "lineitem:order", "orders"),
        RefSpec("l_partkey", "lineitem:part", "part"),
        RefSpec("l_suppkey", "lineitem:supplier", "supplier")), strip("l"))
    case "events" => RowIngest.specFor(df, table, Seq("event_id"), Nil, None)
    case "documents" => RowIngest.specFor(df, table, Seq("doc_id"), Nil, None)
    case "embeddings" =>
      // embedding FLOAT[] is not a scalar — arrays are cardinality-many
      // sugar in the EAV model, and similarity ops read the raw table.
      RowIngest.specFor(df.drop("embedding"), table, Seq("vec_id"), Nil, None)
    case other => sys.error(s"no spec for table $other")
  }

  // weak-keyed by session: a restarted/discarded SparkSession's frames are
  // GC-reclaimable instead of pinned forever by an identityHashCode key
  // (two sessions can even share one hash). The VALUES are softly held:
  // each cached DataFrame strongly references its own SparkSession, so a
  // strong map value would keep the weak key reachable forever (the
  // WeakHashMap value→key pitfall); the SoftReference breaks that cycle —
  // a discarded session's entry is reclaimed under memory pressure.
  // Harness-side convenience cache.
  private val cache = new java.util.WeakHashMap[SparkSession,
    java.lang.ref.SoftReference[TrieMap[(String, String), DataFrame]]]()
  private def sessionCache(spark: SparkSession): TrieMap[(String, String), DataFrame] =
    cache.synchronized {
      Option(cache.get(spark)).flatMap(r => Option(r.get)) match {
        case Some(m) => m
        case None =>
          val m = TrieMap.empty[(String, String), DataFrame]
          cache.put(spark, new java.lang.ref.SoftReference(m))
          m
      }
    }

  /** Raw parquet table. `events.ts` is written as TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects — read it as a nanos long (legacy
    * conf) and convert exactly via integer division to micros. */
  def raw(spark: SparkSession, sfDir: String, table: String): DataFrame =
    sessionCache(spark).getOrElseUpdate((sfDir, "raw:" + table), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$table.parquet")
      if (table == "events")
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
            .cast("timestamp_ntz"))
      else df
    })

  /** Triple encoding of a table. Deliberately NOT persisted: the triples
    * view is a 10-20× blow-up of the base table, and the narrow flatten
    * recomputes from the columnar scan far cheaper than caching the
    * blow-up — the 100 TB-correct trade. Per-attribute pruning happens
    * via TableSource (see store()). */
  def triples(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = raw(spark, sfDir, table)
    RowIngest.tableToTriples(df, spec(df, table))
  }

  /** A TripleStore over the union of the given tables' triples, backed by
    * attribute-pruning TableSources so each operator only generates the
    * triples it reads. */
  def store(spark: SparkSession, sfDir: String, tables: String*): graft.TripleStore = {
    val ts = tables.map(triples(spark, sfDir, _)).reduce(_ unionByName _)
    val schemas = tables.map(t => spec(raw(spark, sfDir, t), t).attrSchemas)
      .reduce(_ ++ _)
    val src = graft.model.UnionTripleSource(tables.map { t =>
      val df = raw(spark, sfDir, t)
      RowIngest.TableSource(df, spec(df, t))
    })
    // single-tx ingest of distinct rows ⇒ invariants hold by construction
    new graft.TripleStore(spark, ts, schemas, preResolved = true,
      source = Some(src))
  }
}
