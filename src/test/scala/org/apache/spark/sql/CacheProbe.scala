package org.apache.spark.sql

/** Test-only probe into the session's CacheManager (private[sql]):
  * lets specs assert that operators release every persisted
  * intermediate (persist-lifecycle hygiene). */
object CacheProbe {
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
