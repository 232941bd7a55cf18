package graft.ops

import org.apache.spark.sql.DataFrame

/** Physical-layout operators: co-located (bucketed) storage.
  *
  * At 100 TB the dominant join cost is the shuffle. Writing both sides
  * of a recurring equi-join bucketed AND sorted by the join key lets
  * Spark's bucketed-scan rule prove the partitioning requirement is
  * already met — the sort-merge join runs with NO Exchange on either
  * side (asserted by LayoutSpec's explain test). This is the batch
  * analogue of the persisted triple layout's namespace partitioning
  * (TripleStore.save): spend one layout shuffle at write time, amortize
  * it over every subsequent join.
  */
object Layout {

  /** Write `df` bucketed + sorted by `keyCols` into `buckets` buckets at
    * `path`, registered in the session catalog as `table` (bucket
    * metadata lives in the catalog — path-based parquet has nowhere to
    * record it, which is why this is saveAsTable, not save). */
  def saveBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, keyCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
