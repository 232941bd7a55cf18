package graft.model

import org.apache.spark.sql.DataFrame

/** Pluggable triples relation with ATTRIBUTE PRUNING — the EAV analogue
  * of columnar scan pruning.
  *
  * The triples view of a relational table is a 10-20× row blow-up of the
  * base data; materializing all of it to answer a query that touches 3
  * attributes wastes most of the work (and at 100 TB is simply not an
  * option). Query compilers know exactly which attributes they touch, so
  * they pass them down here and a pruned source only *generates* the
  * matching triples — the filter reaches not just the parquet scan
  * (column pruning of the base table falls out automatically, since
  * un-requested attrs' source columns are never referenced) but the
  * flatten itself (no struct built, no entity-id hash computed, no
  * explode row emitted for attrs the query never reads).
  */
trait TripleSource {
  /** Triples for the given attributes (None = all). May return a
    * superset; callers re-filter on `a`.
    *
    * CONTRACT: every entity the source emits MUST self-assert
    * `db:ident` (eid as a string fact), and a pruned
    * `scan(Some(Seq("db:ident")))` must return those facts — the
    * store derives its known-eid set from that pruned scan (lazy ref
    * traversal, entity views) instead of paying the full triple
    * blow-up. All shipped ingest paths do (RowIngest metaStructs,
    * DocIngest, persisted stores); a custom source that skips it
    * would silently produce zero lazy ref edges — the store guards
    * with a one-row probe and falls back to the resolved scan, but
    * the fallback pays full triple generation, so emit db:ident. */
  def scan(attrs: Option[Seq[String]]): DataFrame

  /** True when this source GUARANTEES the db:ident contract above by
    * construction — shipped sources override it and skip the store's
    * one-row runtime probe (one blocking job per store, paid before the
    * first lazy-edge query; measurable when a harness builds a fresh
    * store per query). Leave false for custom sources: the probe then
    * guards the contract at the cost of that one job. */
  def assertsIdents: Boolean = false
}

/** Union of sources (a store over several ingested tables). */
final case class UnionTripleSource(sources: Seq[TripleSource]) extends TripleSource {
  def scan(attrs: Option[Seq[String]]): DataFrame =
    sources.map(_.scan(attrs)).reduce(_ unionByName _)
  override def assertsIdents: Boolean = sources.forall(_.assertsIdents)
}
