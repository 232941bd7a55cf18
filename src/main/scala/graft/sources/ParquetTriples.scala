package graft.sources

import graft.model.TripleSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine-native PERSISTED triple layout (SURVEY.md §1.5/§4): triples
  * stored as Parquet partitioned by attribute namespace, sorted within
  * partitions by (a, e). The reference's store IS its persistent artifact
  * (`load`/`dump`, tripl.py:536-558); this is the Spark-scale analogue —
  * a store built by expensive doc ingest can be written once and reopened
  * with attribute pruning intact.
  *
  * Why this layout at 100 TB:
  *  - partitioning by namespace gives DIRECTORY-level pruning: a query
  *    that touches `customer:*` attrs never lists, let alone reads, the
  *    `lineitem` partitions — the EAV analogue of reading one column
  *    family;
  *  - within a partition, rows are range-partitioned and sorted by
  *    (a, e), so parquet row-group min/max statistics prune to the
  *    requested attribute even inside a shared namespace, and the heavily
  *    repeated `a` strings dictionary-encode to near-zero;
  *  - the value columns are natively typed (one per vtype), so predicate
  *    pushdown on typed values reaches the scan.
  */
final case class ParquetTripleSource(spark: SparkSession, path: String)
    extends TripleSource {

  private def raw: DataFrame = spark.read.parquet(path)

  /** Pruned scan: partition filter on the namespace directory + row-group
    * filter on the attribute. Callers re-filter on `a` anyway (the
    * TripleSource contract allows supersets). */
  def scan(attrs: Option[Seq[String]]): DataFrame = attrs match {
    case Some(as) =>
      val nss = as.map(ParquetTripleSource.namespaceOf).distinct
      raw.where(col("ns").isInCollection(nss) && col("a").isInCollection(as))
        .drop("ns")
    case None => raw.drop("ns")
  }

  // NO assertsIdents override: save() persists whatever facts the store
  // held, and a store built from raw triples (the public constructor)
  // may hold no db:ident facts at all — a loaded store must keep the
  // one-row runtime probe or every lazy-ref edge would silently
  // semi-join to empty. The probe is cheap here: it scans only the
  // directory-pruned `db` namespace partition.
}

object ParquetTripleSource {
  /** Attribute namespace = the part before the first ':' (vision.md:54-56
    * 'ns:name'); attrs without a namespace partition under themselves.
    * Must agree with the `substring_index` used at write time. */
  def namespaceOf(attr: String): String = attr.takeWhile(_ != ':')
}
