package org.apache.spark.sql.graftprobe

import org.apache.spark.sql.SparkSession

/** Test-only access to the SQL CacheManager (private[sql] in Spark) so
  * PlanSpec can enforce Q's cache-ownership contract: a query fn must not
  * leave cached plans behind once its result is consumed. */
object CacheProbe {
  def sqlCacheEmpty(s: SparkSession): Boolean =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
