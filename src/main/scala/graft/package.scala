package object graft {
  /** A declared operator query: (session, sf-dir) => result.
    * The driver hash-compares the result against `oracleSql` run by DuckDB
    * over the same parquet (SURVEY §0 "verification contract").
    *
    * Cache-ownership contract: a query fn owns every plan it caches and
    * must leave `spark.sharedState.cacheManager` empty once its result has
    * been consumed — either `unpersist()` on its own exit path (when the
    * returned plan no longer references the cached one) or
    * `localCheckpoint(eager = true)` instead of `cache()` (when it does;
    * checkpoint blocks live outside the SQL cache and are reclaimed by the
    * ContextCleaner when the plan is dropped). Rationale: 95 queries run
    * in one session under Verify/Bench — leaked cache entries accumulate
    * into a GC benchmark (VERDICT r3 "what's wrong" #3). Enforced by
    * PlanSpec's cache-hygiene test.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame

  /** Stable cache key for per-session memoization (broadcast configs,
    * derived sessions): app id + session identity. Query fns are invoked
    * repeatedly with the same session under Verify/Bench — identity
    * keying lets them reuse session-scoped state without assuming any
    * particular SparkSession API for session ids. */
  def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    s.sparkContext.applicationId + "@" +
      Integer.toHexString(System.identityHashCode(s))
}
